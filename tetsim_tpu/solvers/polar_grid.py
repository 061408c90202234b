"""Structured-grid polar engine — the TPU-native scale path for box meshes.

The generic polar engine (polar.py) is *gather-bound* at large tet counts:
its corner gather (4M random rows) and incidence gather (N x valence rows)
cost ~2.5 ns/row through HBM — a 26 ms floor at 1M tets (BENCHNOTES.md),
exactly the scatter problem the reference fought with its 9-texture
particle tables (SoftbodyGPU.js:29-37).

For meshes produced by ``mesh.grid_mesh`` (nx*ny*nz cubes, each Kuhn-split
into 6 tets — the BASELINE 1M-tet workload) the connectivity is *regular*:
every tet corner sits at one of the 8 cube-corner offsets.  This engine
exploits that to ELIMINATE indirection entirely:

  * corner "gather"  -> 8 shifted-slab reads of the vertex grid
                        (static slices — contiguous, full HBM bandwidth),
  * particle scatter -> 8 accumulator slabs combined with shifted
                        static-slice adds (a stencil, like a 2x2x2 conv).

All arithmetic is component-wise over flat [C]-shaped f32 arrays (C = cube
count): TPU tiles the two minormost dims to (8,128), so trailing small axes
like [...,4,3] would pad catastrophically — structure-of-arrays is the
layout that wastes nothing.  The math itself is identical to polar.py
(Mueller extractRotation, SoftbodyGPU.js:80-185; volume-weighted Jacobi
averaging, SoftbodyGPU.js:302-320) — same formulas, same operation order
per tet, so trajectories match the generic engine to f32 accumulation
order (~1e-7/substep).

State layout: the public SimState is unchanged (pos [N,3], quats [M,4]
with the grid_mesh type-major tet order); step_frame converts to component
arrays once per frame around the substep scan.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..mesh import TetMesh
from ..params import PhysicsParams
from ..state import SimState, Controls
from .common import norm_grabs

_EXTRACT_ITERS = 9  # SoftbodyGPU.js:123
_EPS = 1e-9


# ---------------------------------------------------------------------------
# Build: derive the static stencil description from a grid_mesh
# ---------------------------------------------------------------------------


@struct.dataclass
class GridArrays:
    """Stencil-form mesh constants for a grid_mesh box.

    Everything structural is *static* (baked into the jitted program):
    corner offsets, rest shapes (72 floats), rest volume.  Only the
    per-particle fields (inv_mass gate, scatter denominator) are traced
    arrays, shaped as the vertex grid [gx,gy,gz].
    """

    # static stencil structure ------------------------------------------------
    dims: Tuple[int, int, int] = struct.field(pytree_node=False)  # cubes
    # per type t (0..5), per corner k (0..3): index into the 8 slab offsets
    corner_slab: Tuple = struct.field(pytree_node=False)  # [6][4] int
    slab_offsets: Tuple = struct.field(pytree_node=False)  # [8] (dx,dy,dz)
    rest_centered: Tuple = struct.field(pytree_node=False)  # [6][4][3] float
    rest_volume: float = struct.field(pytree_node=False)  # scalar (uniform)
    # traced per-particle fields ----------------------------------------------
    inv_mass: jnp.ndarray = None  # f32 [gx,gy,gz]
    den: jnp.ndarray = None  # f32 [gx,gy,gz] static scatter-weight sum

    @property
    def num_particles(self) -> int:
        nx, ny, nz = self.dims
        return (nx + 1) * (ny + 1) * (nz + 1)

    @property
    def num_tets(self) -> int:
        nx, ny, nz = self.dims
        return 6 * nx * ny * nz


_SLAB_OFFSETS = tuple(
    (dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
)


def build_grid_arrays(
    mesh: TetMesh,
    dims: Tuple[int, int, int],
    density: float = 1000.0,
    pinned=None,
) -> GridArrays:
    """Build the stencil description for a ``grid_mesh(nx,ny,nz)`` mesh.

    The corner offsets and rest shapes are decoded from the actual mesh
    arrays (cube 0 of each tet type) rather than re-derived, so the engine
    matches ``build_arrays`` conventions exactly — including grid_mesh's
    positive-orientation corner swap (mesh.py) and the centroid add order
    that makes exact rest a fixed point (mesh.rest_state).
    """
    nx, ny, nz = dims
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    ncubes = nx * ny * nz
    if mesh.num_tets != 6 * ncubes or mesh.num_particles != gx * gy * gz:
        raise ValueError(
            f"mesh ({mesh.num_tets} tets / {mesh.num_particles} particles) "
            f"is not a grid_mesh({nx},{ny},{nz}) "
            f"(expected {6*ncubes} / {gx*gy*gz})"
        )

    def decode(vid):
        # vid = (i*gy + j)*gz + k  (mesh.grid_mesh vertex numbering)
        k = vid % gz
        j = (vid // gz) % gy
        i = vid // (gy * gz)
        return int(i), int(j), int(k)

    slab_index = {off: s for s, off in enumerate(_SLAB_OFFSETS)}
    corner_slab = []
    rest_centered = []
    vol0 = None
    verts = mesh.verts
    for t in range(6):
        row = mesh.tets[t * ncubes]  # cube (0,0,0) of type t
        offs = [decode(int(v)) for v in row]
        if any(o not in slab_index for o in offs):
            raise ValueError("mesh tets do not follow grid_mesh cube layout")
        corner_slab.append(tuple(slab_index[o] for o in offs))
        p = verts[row].astype(np.float32)  # [4,3]
        centroid = (((p[0] + p[1]) + p[2]) + p[3]) * np.float32(0.25)
        rc = p - centroid
        rest_centered.append(tuple(tuple(float(x) for x in corner) for corner in rc))
        d = np.stack([p[1] - p[0], p[2] - p[0], p[3] - p[0]], axis=-1)
        v = float(np.linalg.det(d.astype(np.float64)) / 6.0)
        if vol0 is None:
            vol0 = v
        elif not math.isclose(v, vol0, rel_tol=1e-5):
            raise ValueError("grid_mesh tets are not uniform volume")
    w32 = float(np.float32(vol0))  # match rest_state's f64 det -> f32 vol

    # incidence count per vertex: how many tet-corner instances land there
    count = np.zeros((gx, gy, gz), np.int64)
    for t in range(6):
        for k in range(4):
            dx, dy, dz = _SLAB_OFFSETS[corner_slab[t][k]]
            count[dx : dx + nx, dy : dy + ny, dz : dz + nz] += 1
    # scatter denominator — mirrors mesh.build_incidence (f64 accumulate of
    # the f32 rest volume, then f32)
    den = (count * np.float64(w32)).astype(np.float32)

    # lumped mass (rest_state math): each tet adds V/4*density to its corners
    pm = np.float32(vol0 / 4.0 * density)
    mass = count.astype(np.float32) * pm
    inv_mass = np.where(mass > 0.0, 1.0 / mass, 0.0).astype(np.float32)
    if pinned is not None:
        flat = inv_mass.reshape(-1)
        flat[np.asarray(pinned, np.int64)] = 0.0
        inv_mass = flat.reshape(gx, gy, gz)

    return GridArrays(
        dims=(nx, ny, nz),
        corner_slab=tuple(corner_slab),
        slab_offsets=_SLAB_OFFSETS,
        rest_centered=tuple(rest_centered),
        rest_volume=w32,
        inv_mass=jnp.asarray(inv_mass),
        den=jnp.asarray(den),
    )


# ---------------------------------------------------------------------------
# Component-wise quaternion/matrix helpers (flat [C] arrays)
# ---------------------------------------------------------------------------


def _qrot_const(v, qx, qy, qz, qw):
    """Rotate the constant 3-vector v by quaternions q (xyzw components).

    Same algebra as polar.quat_rotate: v + 2*u x (u x v + w*v)."""
    vx, vy, vz = v
    tx = qy * vz - qz * vy + qw * vx
    ty = qz * vx - qx * vz + qw * vy
    tz = qx * vy - qy * vx + qw * vz
    rx = qy * tz - qz * ty
    ry = qz * tx - qx * tz
    rz = qx * ty - qy * tx
    return vx + 2.0 * rx, vy + 2.0 * ry, vz + 2.0 * rz


def _qmul(ax, ay, az, aw, bx, by, bz, bw):
    """Hamilton product a*b, xyzw (polar.quat_mul)."""
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    )


def _extract_rotation(a, iters=_EXTRACT_ITERS):
    """Mueller robust polar decomposition, component-wise.

    ``a`` is the 3x3 covariance as a [3][3] list of [C] arrays (a[r][c]).
    Starts from the identity quaternion (polar.solve_shape_match) and runs
    the fixed-trip masked-update iteration (SoftbodyGPU.js:122-139)."""
    qx = jnp.zeros_like(a[0][0])
    qy, qz = qx, qx
    qw = jnp.ones_like(a[0][0])
    for _ in range(iters):
        # rotation matrix columns from q (polar.quat_to_mat closed form)
        xx, yy, zz = qx * qx, qy * qy, qz * qz
        xy, xz, yz = qx * qy, qx * qz, qy * qz
        xw, yw, zw = qx * qw, qy * qw, qz * qw
        m = (
            (1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw)),
            (2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw)),
            (2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy)),
        )
        # omega = sum_c cross(Rcol_c, Acol_c) / (|sum_rc R.A| + eps)
        ox = sum(m[1][c] * a[2][c] - m[2][c] * a[1][c] for c in range(3))
        oy = sum(m[2][c] * a[0][c] - m[0][c] * a[2][c] for c in range(3))
        oz = sum(m[0][c] * a[1][c] - m[1][c] * a[0][c] for c in range(3))
        den = (
            jnp.abs(sum(m[r][c] * a[r][c] for r in range(3) for c in range(3)))
            + _EPS
        )
        ox, oy, oz = ox / den, oy / den, oz / den
        angle = jnp.sqrt(ox * ox + oy * oy + oz * oz)
        live = angle >= _EPS
        inv = 1.0 / jnp.where(live, angle, 1.0)
        half = angle * 0.5
        s = jnp.sin(half) * inv
        dx, dy, dz, dw = ox * s, oy * s, oz * s, jnp.cos(half)
        nqx, nqy, nqz, nqw = _qmul(dx, dy, dz, dw, qx, qy, qz, qw)
        qx = jnp.where(live, nqx, qx)
        qy = jnp.where(live, nqy, qy)
        qz = jnp.where(live, nqz, qz)
        qw = jnp.where(live, nqw, qw)
    return qx, qy, qz, qw


# ---------------------------------------------------------------------------
# The stencil substep
# ---------------------------------------------------------------------------


def _flat_geometry(g: GridArrays):
    """(nx, gyz, Lc, Nv, pad_len, offsets[8]) of the FLAT formulation.

    Layout note (the round-2 speedup, 2.99 -> see BENCHNOTES): the 3-D
    slab form made every shifted read a strided [nx,ny,nz] slice whose
    (57,57) minor dims pad to the (64,128) TPU tile — 2.5x wasted
    bandwidth and a materialized copy per corner.  Flattened C-order with
    one extra x-plane of padding, a shift by (dx,dy,dz) is a CONTIGUOUS
    slice at offset dx*gy*gz + dy*gz + dz that XLA fuses into consumers
    without materializing.  Cube-space arrays span [nx, gy, gz] (phantom
    lanes at j==ny or k==nz), masked once per accumulator slab.
    """
    nx, ny, nz = g.dims
    gy, gz = ny + 1, nz + 1
    gyz = gy * gz
    lc = nx * gyz  # cube lanes incl. phantoms
    nv = (nx + 1) * gyz  # vertices
    offs = tuple(dx * gyz + dy * gz + dz for (dx, dy, dz) in g.slab_offsets)
    return nx, gy, gz, gyz, lc, nv, offs


def _cube_valid_mask(g: GridArrays):
    """f32 [Lc] mask: 1 on real cubes, 0 on phantom (j==ny or k==nz) lanes."""
    nx, gy, gz, gyz, lc, _, _ = _flat_geometry(g)
    ny, nz = g.dims[1], g.dims[2]
    r = jax.lax.broadcasted_iota(jnp.int32, (lc, 1), 0).reshape(lc) % gyz
    j = r // gz
    k = r % gz
    return jnp.where((j < ny) & (k < nz), 1.0, 0.0).astype(jnp.float32)


def _solve(fx, fy, fz, quats, g: GridArrays, halo=None,
           iters=_EXTRACT_ITERS):
    """One Jacobi shape-matching iteration on flat padded component state.

    fx/fy/fz: [Nv + gyz] (one phantom x-plane of tail padding).
    quats: [6][4] of [Lc] (cube lanes incl. phantoms).
    ``halo``: optional callback (numx,numy,numz) -> exchanged versions
    (flat, same padded length), used by the sharded path to complete
    partial boundary-plane sums.
    """
    nx, gy, gz, gyz, lc, nv, offs = _flat_geometry(g)
    mask = _cube_valid_mask(g)

    # the 8 shifted corner views: contiguous slices, no copies after fusion
    sx = [fx[o : o + lc] for o in offs]
    sy = [fy[o : o + lc] for o in offs]
    sz = [fz[o : o + lc] for o in offs]

    zero = jnp.zeros((lc,), fx.dtype)
    accx = [zero] * 8
    accy = [zero] * 8
    accz = [zero] * 8
    w = g.rest_volume
    new_quats = []

    for t in range(6):
        ks = g.corner_slab[t]
        cx = [sx[s] for s in ks]
        cy = [sy[s] for s in ks]
        cz = [sz[s] for s in ks]
        # centroid with the canonical add order (mesh.rest_state /
        # polar.solve_shape_match): (((p0+p1)+p2)+p3) * 0.25
        ccx = (((cx[0] + cx[1]) + cx[2]) + cx[3]) * 0.25
        ccy = (((cy[0] + cy[1]) + cy[2]) + cy[3]) * 0.25
        ccz = (((cz[0] + cz[1]) + cz[2]) + cz[3]) * 0.25
        pcx = [c - ccx for c in cx]
        pcy = [c - ccy for c in cy]
        pcz = [c - ccz for c in cz]

        qx, qy, qz, qw = quats[t]
        rr = [_qrot_const(g.rest_centered[t][k], qx, qy, qz, qw) for k in range(4)]
        # covariance A[r][c] = sum_k cur_k[r] * rest_rot_k[c] (mat3.outer_sum)
        cur = (pcx, pcy, pcz)
        a = [
            [sum(cur[r][k] * rr[k][c] for k in range(4)) for c in range(3)]
            for r in range(3)
        ]
        ix, iy, iz, iw = _extract_rotation(a, iters=iters)
        qx, qy, qz, qw = _qmul(ix, iy, iz, iw, qx, qy, qz, qw)
        # the max() only bites on zero-padded PHANTOM lanes (0/0 would be
        # NaN, and NaN*mask stays NaN); real lanes have norm ~1, so this is
        # bitwise identical to polar.quat_normalize there
        norm = jnp.maximum(
            jnp.sqrt(qx * qx + qy * qy + qz * qz + qw * qw), 1e-30
        )
        qx, qy, qz, qw = qx / norm, qy / norm, qz / norm, qw / norm
        new_quats.append((qx, qy, qz, qw))

        for k in range(4):
            gx_, gy_, gz_ = _qrot_const(g.rest_centered[t][k], qx, qy, qz, qw)
            s = ks[k]
            accx[s] = accx[s] + (gx_ - pcx[k]) * w
            accy[s] = accy[s] + (gy_ - pcy[k]) * w
            accz[s] = accz[s] + (gz_ - pcz[k]) * w

    # combine the 8 accumulator slabs (inverse stencil): phantom lanes are
    # masked out, then each slab lands at its flat offset — contiguous adds
    def combine(acc):
        out = jnp.zeros_like(fx)
        for s, o in enumerate(offs):
            out = out.at[o : o + lc].add(acc[s] * mask)
        return out

    numx, numy, numz = combine(accx), combine(accy), combine(accz)
    if halo is not None:
        numx, numy, numz = halo(numx, numy, numz)
    d = jnp.maximum(g.den, _EPS)
    movable = g.inv_mass > 0.0
    fx = jnp.where(movable, fx + numx / d, fx)
    fy = jnp.where(movable, fy + numy / d, fy)
    fz = jnp.where(movable, fz + numz / d, fz)
    return fx, fy, fz, new_quats


def _substep(
    carry,
    g: GridArrays,
    params: PhysicsParams,
    dt,
    controls: Controls,
    halo=None,
    x_offset=0,
):
    px, py, pz, vx, vy, vz, quats = carry
    movable = g.inv_mass > 0.0

    # predict (common.predict semantics: gravity in prediction, pinned gate)
    vy = vy + params.gravity * dt
    vx = jnp.where(movable, vx, 0.0)
    vy = jnp.where(movable, vy, 0.0)
    vz = jnp.where(movable, vz, 0.0)
    ppx, ppy, ppz = px, py, pz
    px, py, pz = px + vx * dt, py + vy * dt, pz + vz * dt

    px, py, pz, quats = _solve(
        px, py, pz, quats, g, halo=halo, iters=params.extract_iters
    )

    # collide (common.collide semantics)
    px = jnp.clip(px, params.world_min[0], params.world_max[0])
    py = jnp.clip(py, params.world_min[1], params.world_max[1])
    pz = jnp.clip(pz, params.world_min[2], params.world_max[2])
    below = py < 0.0
    py = jnp.where(below, 0.0, py)
    k = jnp.minimum(1.0, dt * params.friction)
    px = px + jnp.where(below, (ppx - px) * k, 0.0)
    pz = pz + jnp.where(below, (ppz - pz) * k, 0.0)

    # grab overrides (common.norm_grabs: G simultaneous slots — one per
    # grabber, the reference's one-grabber-per-body scene).  x_offset
    # shifts local FLAT indices to GLOBAL particle ids on the sharded path.
    gid, gpos = norm_grabs(controls)
    n = px.shape[0]
    pid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n) + x_offset
    )
    for g in range(gid.shape[0]):
        hit = pid == gid[g]
        px = jnp.where(hit, gpos[g, 0], px)
        py = jnp.where(hit, gpos[g, 1], py)
        pz = jnp.where(hit, gpos[g, 2], pz)

    # velocity update
    vx, vy, vz = (px - ppx) / dt, (py - ppy) / dt, (pz - ppz) / dt
    return (px, py, pz, vx, vy, vz, quats), jnp.float32(0.0)


# ---------------------------------------------------------------------------
# SimState <-> flat component conversion (once per frame)
# ---------------------------------------------------------------------------


def _pad_tail(flat, pad):
    return jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])


def _flat_arrays(g: GridArrays) -> GridArrays:
    """GridArrays with inv_mass/den flattened + tail-padded for _solve."""
    _, _, _, gyz, _, nv, _ = _flat_geometry(g)
    return g.replace(
        inv_mass=_pad_tail(g.inv_mass.reshape(nv), gyz),
        den=_pad_tail(jnp.maximum(g.den, _EPS).reshape(nv), gyz),
    )


def _to_components(state: SimState, g: GridArrays):
    nx, ny, nz = g.dims
    _, gy, gz, gyz, lc, nv, _ = _flat_geometry(g)

    def flat3(a):
        return tuple(_pad_tail(a[:, c], gyz) for c in range(3))

    px, py, pz = flat3(state.pos)
    vx, vy, vz = flat3(state.vel)
    # quats: [M,4] type-major -> phantom-padded cube lanes [6][4] of [Lc]
    q = state.quats.reshape(6, nx, ny, nz, 4)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    q = q.reshape(6, lc, 4)
    quats = [tuple(q[t, :, c] for c in range(4)) for t in range(6)]
    return (px, py, pz, vx, vy, vz, quats)


def _from_components(carry, state: SimState, g: GridArrays, prev) -> SimState:
    px, py, pz, vx, vy, vz, quats = carry
    nx, ny, nz = g.dims
    _, gy, gz, _, _, nv, _ = _flat_geometry(g)

    def stack3(x, y, z):
        return jnp.stack([x[:nv], y[:nv], z[:nv]], axis=-1)

    q = jnp.stack(
        [jnp.stack(quats[t], axis=-1) for t in range(6)], axis=0
    ).reshape(6, nx, gy, gz, 4)[:, :, :ny, :nz, :].reshape(-1, 4)
    return state.replace(
        pos=stack3(px, py, pz),
        prev_pos=stack3(*prev),
        vel=stack3(vx, vy, vz),
        quats=q,
    )


def substep(state, arr: GridArrays, params, dt, controls, axis_name=None):
    """Single-substep entry matching the engine API (used by tests)."""
    del axis_name
    g = _flat_arrays(arr)
    carry = _to_components(state, arr)
    prev = carry[:3]
    carry, diag = _substep(carry, g, params, dt, controls)
    return _from_components(carry, state, arr, prev), diag


def step_frame(
    state: SimState,
    arr: GridArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
):
    """One frame = params.num_substeps stencil substeps in a single trace."""
    del axis_name  # sharding of the grid engine uses spatial halos, not psum
    dt = params.dt
    g = _flat_arrays(arr)
    carry0 = _to_components(state, arr)

    def body(carry_prev, _):
        carry, _ = carry_prev
        prev = carry[:3]
        carry, diag = _substep(carry, g, params, dt, controls)
        return (carry, prev), diag

    (carry, prev), diags = jax.lax.scan(
        body, (carry0, carry0[:3]), None, length=params.num_substeps
    )
    return _from_components(carry, state, arr, prev), diags


# ---------------------------------------------------------------------------
# Multi-chip sharding: x-axis slab decomposition with halo exchange
# ---------------------------------------------------------------------------
#
# The generic sharded polar path (parallel/sharding.py) replicates particle
# state and psums a dense [N,3] delta per substep — 2.2 MB of ICI traffic at
# 1M tets.  The grid engine shards SPATIALLY: device d owns cube layers
# [d*lx, (d+1)*lx) and vertex planes [d*lx, d*lx+lx]; the plane shared with
# each neighbor is stored by both owners.  Per substep the only
# communication is ONE vertex plane of partial numerator per neighbor
# direction (3 * gy * gz * 4 B = 39 KB at the 1M-tet config — 56x less than
# the psum design), exchanged with lax.ppermute.  Duplicated planes stay
# bitwise identical on both owners: each adds the same two partial sums
# (IEEE addition is commutative), and every other op is elementwise.


@struct.dataclass
class GridSlabState:
    """Sharded grid state: 9 stacked-slab component arrays [D*(lx+1),gy,gz]
    (sharded on axis 0) + quats [24=6*4, nx, ny, nz] (sharded on axis 1)."""

    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    ppx: jnp.ndarray
    ppy: jnp.ndarray
    ppz: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    quats: jnp.ndarray


@struct.dataclass
class GridSlabArrays:
    """Sharded per-particle constants in stacked-slab form."""

    inv_mass: jnp.ndarray  # [D*(lx+1), gy, gz]
    den: jnp.ndarray  # [D*(lx+1), gy, gz]


def _stack_slabs(a, d, lx):
    """[gx,...] -> [d*(lx+1),...]: per-device slabs with the shared boundary
    plane duplicated into both neighbors."""
    return jnp.concatenate([a[i * lx : i * lx + lx + 1] for i in range(d)], axis=0)


def _unstack_slabs(s, d, lx):
    """Inverse of _stack_slabs (keeps the first copy of each shared plane)."""
    slabs = s.reshape((d, lx + 1) + s.shape[1:])
    body = slabs[:, :lx].reshape((d * lx,) + s.shape[1:])
    return jnp.concatenate([body, slabs[d - 1, lx:]], axis=0)


def grid_prepare(state: SimState, garr: GridArrays, mesh, axis: str = "x"):
    """Convert (SimState, GridArrays) to sharded slab form on ``mesh``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = mesh.shape[axis]
    nx, ny, nz = garr.dims
    if nx % d != 0:
        raise ValueError(f"nx={nx} must divide evenly over {d} devices")
    lx = nx // d
    gx, gy, gz = nx + 1, ny + 1, nz + 1

    def slab3(flat):
        return tuple(
            _stack_slabs(flat[:, c].reshape(gx, gy, gz), d, lx) for c in range(3)
        )

    px, py, pz = slab3(state.pos)
    ppx, ppy, ppz = slab3(state.prev_pos)
    vx, vy, vz = slab3(state.vel)
    q = state.quats.reshape(6, nx, ny, nz, 4)
    quats = jnp.moveaxis(q, -1, 1).reshape(24, nx, ny, nz)

    slab_spec = NamedSharding(mesh, P(axis))
    quat_spec = NamedSharding(mesh, P(None, axis))
    put = lambda a, s: jax.device_put(a, s)
    slab_state = GridSlabState(
        px=put(px, slab_spec), py=put(py, slab_spec), pz=put(pz, slab_spec),
        ppx=put(ppx, slab_spec), ppy=put(ppy, slab_spec), ppz=put(ppz, slab_spec),
        vx=put(vx, slab_spec), vy=put(vy, slab_spec), vz=put(vz, slab_spec),
        quats=put(quats, quat_spec),
    )
    slab_arr = GridSlabArrays(
        inv_mass=put(_stack_slabs(garr.inv_mass, d, lx), slab_spec),
        den=put(_stack_slabs(garr.den, d, lx), slab_spec),
    )
    return slab_state, slab_arr


def grid_unprepare(slab: GridSlabState, garr: GridArrays, n_devices: int) -> SimState:
    """Slab form -> flat SimState."""
    nx, ny, nz = garr.dims
    lx = nx // n_devices
    n = garr.num_particles

    def flat3(x, y, z):
        return jnp.stack(
            [
                _unstack_slabs(x, n_devices, lx).reshape(n),
                _unstack_slabs(y, n_devices, lx).reshape(n),
                _unstack_slabs(z, n_devices, lx).reshape(n),
            ],
            axis=-1,
        )

    q = slab.quats.reshape(6, 4, nx, ny, nz)
    quats = jnp.moveaxis(q, 1, -1).reshape(-1, 4)
    return SimState(
        pos=flat3(slab.px, slab.py, slab.pz),
        prev_pos=flat3(slab.ppx, slab.ppy, slab.ppz),
        vel=flat3(slab.vx, slab.vy, slab.vz),
        quats=quats,
    )


def make_grid_sharded_step(mesh, garr: GridArrays, axis: str = "x"):
    """Build a jitted sharded frame step: (GridSlabState, GridSlabArrays,
    params, controls) -> (GridSlabState, diags).

    Communication per substep: 2 ppermutes of one [gy,gz] plane per
    component (6 plane-sends total; 3*gy*gz*4 B per direction)."""
    from jax.sharding import PartitionSpec as P

    d = mesh.shape[axis]
    nx, ny, nz = garr.dims
    if nx % d != 0:
        raise ValueError(f"nx={nx} must divide evenly over {d} devices")
    lx = nx // d
    local_dims = (lx, ny, nz)

    gy, gz = ny + 1, nz + 1
    gyz = gy * gz
    nv_loc = (lx + 1) * gyz  # local vertex lanes (before tail padding)

    def halo(nux, nuy, nuz):
        # flat num [nv_loc + gyz]: plane p occupies [p*gyz, (p+1)*gyz)
        def ex(num):
            fr = jax.lax.ppermute(
                num[0:gyz], axis, [(i, i - 1) for i in range(1, d)]
            )
            fl = jax.lax.ppermute(
                num[lx * gyz : nv_loc], axis,
                [(i, i + 1) for i in range(d - 1)],
            )
            return (
                num.at[lx * gyz : nv_loc].add(fr).at[0:gyz].add(fl)
            )

        return ex(nux), ex(nuy), ex(nuz)

    def shard_body(slab: GridSlabState, arr: GridSlabArrays, params, controls):
        g_local = GridArrays(
            dims=local_dims,
            corner_slab=garr.corner_slab,
            slab_offsets=garr.slab_offsets,
            rest_centered=garr.rest_centered,
            rest_volume=garr.rest_volume,
            inv_mass=_pad_tail(arr.inv_mass.reshape(nv_loc), gyz),
            den=_pad_tail(
                jnp.maximum(arr.den, _EPS).reshape(nv_loc), gyz
            ),
        )
        x_offset = jax.lax.axis_index(axis).astype(jnp.int32) * (lx * gyz)
        # quats slab [24, lx, ny, nz] -> phantom-padded flat [6][4] of [Lc]
        qs = jnp.pad(slab.quats, ((0, 0), (0, 0), (0, 1), (0, 1)))
        quats = [
            tuple(qs[t * 4 + c].reshape(-1) for c in range(4))
            for t in range(6)
        ]
        flat = lambda a: _pad_tail(a.reshape(nv_loc), gyz)
        carry0 = (
            flat(slab.px), flat(slab.py), flat(slab.pz),
            flat(slab.vx), flat(slab.vy), flat(slab.vz), quats,
        )
        dt = params.dt

        def body(carry_prev, _):
            carry, _ = carry_prev
            prev = carry[:3]
            carry, diag = _substep(
                carry, g_local, params, dt, controls,
                halo=halo, x_offset=x_offset,
            )
            return (carry, prev), diag

        (carry, prev), diags = jax.lax.scan(
            body, (carry0, carry0[:3]), None, length=params.num_substeps
        )
        px, py, pz, vx, vy, vz, quats = carry
        q = jnp.stack(
            [
                quats[t][c].reshape(lx, gy, gz)[:, :ny, :nz]
                for t in range(6)
                for c in range(4)
            ],
            axis=0,
        )
        cube = lambda a: a[:nv_loc].reshape(lx + 1, gy, gz)
        out = GridSlabState(
            px=cube(px), py=cube(py), pz=cube(pz),
            ppx=cube(prev[0]), ppy=cube(prev[1]), ppz=cube(prev[2]),
            vx=cube(vx), vy=cube(vy), vz=cube(vz), quats=q,
        )
        return out, diags

    slab_p = P(axis)
    st_specs = GridSlabState(
        px=slab_p, py=slab_p, pz=slab_p, ppx=slab_p, ppy=slab_p, ppz=slab_p,
        vx=slab_p, vy=slab_p, vz=slab_p, quats=P(None, axis),
    )
    ar_specs = GridSlabArrays(inv_mass=slab_p, den=slab_p)

    @jax.jit
    def sharded(slab, arr, params, controls):
        pm_specs = jax.tree.map(lambda _: P(), params)
        ct_specs = jax.tree.map(lambda _: P(), controls)
        fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(st_specs, ar_specs, pm_specs, ct_specs),
            out_specs=(st_specs, P()),
            check_vma=False,
        )
        return fn(slab, arr, params, controls)

    if mesh.devices.flat[0].platform != "cpu":
        return sharded

    # serialize dispatch on the CPU test backend (see parallel/sharding.py:
    # XLA-CPU's in-process communicator deadlocks under interleaved async
    # collective dispatches across virtual devices)
    def sharded_sync(slab, arr, params, controls):
        out = sharded(slab, arr, params, controls)
        jax.block_until_ready(out)
        return out

    return sharded_sync
