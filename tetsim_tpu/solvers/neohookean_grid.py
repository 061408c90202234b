"""Structured-grid Neo-Hookean Gauss-Seidel engine — the scale path for the
reference-fidelity physics (Softbody.js:91-240 math) on grid_mesh boxes.

The generic colored-GS engine (neohookean.py) is gather-bound at large tet
counts: every level pays an HBM gather of its corner rows plus an inverse
gather over all particles (~82 ms/substep at 1M tets, BENCHNOTES).  For
``mesh.grid_mesh`` boxes the connectivity is regular, so — exactly as
polar_grid does for the Jacobi engine — all indirection can be removed:

  * **Structured coloring**: color = (Kuhn type t, cube parity (i%2,j%2,k%2))
    = 48 colors.  Same-color tets live in cubes >= 2 apart in every axis, so
    they share no vertex — each color is a valid Gauss-Seidel batch, and the
    48-color sweep is a valid GS ordering of the whole mesh (the thing the
    reference declared but never implemented, SoftbodyGPU.js:589-590 /
    README.md:25).  ``grid_coloring`` exports the same coloring as a per-tet
    array so the generic engine can run the identical schedule — the parity
    test between the two engines is exact to f32 accumulation order.
  * **Parity-block layout**: vertices split into 8 sub-lattices by parity.
    Within a color, corner k of every tet lives in ONE block at ONE static
    offset — the gather becomes a contiguous flat slice (polar_grid's
    flat-shift trick, one level down), and the scatter becomes 12 static
    slice-adds (exact: same-color tets are vertex-disjoint).

State stays in parity-block component form across the whole frame (the
[N,3] SimState layout tile-pads catastrophically on TPU); step_frame
converts at the frame boundary only.
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

_EPS = 1e-9
_OFFSETS = tuple(
    (dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
)


def grid_coloring(dims: Tuple[int, int, int]) -> np.ndarray:
    """Per-tet colors for a grid_mesh(nx,ny,nz): color = t*8 + parity(cube).

    Tet order matches mesh.grid_mesh (type-major, cubes in C-order).  Any
    two same-color tets are the same Kuhn type in cubes >= 2 apart in every
    axis, hence vertex-disjoint — a valid GS coloring with 48 colors.
    """
    nx, ny, nz = dims
    ci, cj, ck = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    par = ((ci % 2) * 4 + (cj % 2) * 2 + (ck % 2)).ravel()
    return (
        np.arange(6, dtype=np.int32)[:, None] * 8 + par[None, :]
    ).reshape(-1).astype(np.int32)


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------


@struct.dataclass
class NHGridArrays:
    """Stencil-form constants for the Neo-Hookean grid engine.

    Static structure mirrors polar_grid.GridArrays (decoded from the actual
    mesh so corner order matches grid_mesh's positive-orientation swap);
    inv_rest_pose/volume are uniform per type, so they are baked as Python
    floats (compile-time constants).  The only traced field is the
    per-vertex inv_mass, pre-converted to parity-block layout.
    """

    dims: Tuple[int, int, int] = struct.field(pytree_node=False)
    corner_slab: Tuple = struct.field(pytree_node=False)  # [6][4] -> offset id
    inv_rest_pose: Tuple = struct.field(pytree_node=False)  # [6][3][3] float
    inv_rest_volume: float = struct.field(pytree_node=False)
    rest_volume: float = struct.field(pytree_node=False)
    inv_mass_blocks: jnp.ndarray = None  # f32 [8, LHp]
    inv_mass: jnp.ndarray = None  # f32 [Nv] flat (diagnostics/World)

    @property
    def num_particles(self) -> int:
        nx, ny, nz = self.dims
        return (nx + 1) * (ny + 1) * (nz + 1)

    @property
    def num_tets(self) -> int:
        nx, ny, nz = self.dims
        return 6 * nx * ny * nz


def _geometry(dims):
    """(H, LH, LHp): parity-block dims (ceil(g/2) each, uniform across the 8
    blocks), real block lanes, padded lanes (pad covers the largest corner
    offset HyHz+Hz+1 so every shifted read is one in-bounds flat slice)."""
    gx, gy, gz = dims[0] + 1, dims[1] + 1, dims[2] + 1
    h = ((gx + 1) // 2, (gy + 1) // 2, (gz + 1) // 2)
    lh = h[0] * h[1] * h[2]
    pad = h[1] * h[2] + h[2] + 1
    return h, lh, lh + pad


def build_nh_grid_arrays(
    mesh: TetMesh,
    dims: Tuple[int, int, int],
    density: float = 1000.0,
    pinned=None,
) -> NHGridArrays:
    """Decode the stencil description from a grid_mesh (same approach as
    polar_grid.build_grid_arrays: read cube 0 of each type from the real
    mesh arrays so conventions match build_arrays/rest_state exactly)."""
    nx, ny, nz = dims
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    ncubes = nx * ny * nz
    if mesh.num_tets != 6 * ncubes or mesh.num_particles != gx * gy * gz:
        raise ValueError(
            f"mesh ({mesh.num_tets} tets / {mesh.num_particles} particles) "
            f"is not a grid_mesh({nx},{ny},{nz})"
        )

    def decode(vid):
        k = vid % gz
        j = (vid // gz) % gy
        i = vid // (gy * gz)
        return int(i), int(j), int(k)

    slab_index = {off: s for s, off in enumerate(_OFFSETS)}
    corner_slab = []
    inv_rest_pose = []
    vol0 = None
    for t in range(6):
        row = mesh.tets[t * ncubes]
        offs = [decode(int(v)) for v in row]
        if any(o not in slab_index for o in offs):
            raise ValueError("mesh tets do not follow grid_mesh cube layout")
        corner_slab.append(tuple(slab_index[o] for o in offs))
        p = mesh.verts[row].astype(np.float32)
        d = np.stack([p[1] - p[0], p[2] - p[0], p[3] - p[0]], axis=-1)
        det = float(np.linalg.det(d.astype(np.float64)))
        v = det / 6.0
        if vol0 is None:
            vol0 = v
        elif not math.isclose(v, vol0, rel_tol=1e-5):
            raise ValueError("grid_mesh tets are not uniform volume")
        # f64 inverse -> f32, matching mesh.rest_state:111-113
        ir = np.linalg.inv(d.astype(np.float64)).astype(np.float32)
        inv_rest_pose.append(
            tuple(tuple(float(x) for x in r) for r in ir)
        )
    w32 = float(np.float32(vol0))
    irv = float(np.float32(1.0 / np.float32(vol0)))

    # lumped mass (rest_state math): every tet adds V/4*density to 4 corners
    count = np.zeros((gx, gy, gz), np.int64)
    for t in range(6):
        for k in range(4):
            dx, dy, dz = _OFFSETS[corner_slab[t][k]]
            count[dx : dx + nx, dy : dy + ny, dz : dz + nz] += 1
    pm = np.float32(vol0 / 4.0 * density)
    mass = count.astype(np.float32) * pm
    inv_mass = np.where(mass > 0.0, 1.0 / mass, 0.0).astype(np.float32)
    if pinned is not None:
        flat = inv_mass.reshape(-1)
        flat[np.asarray(pinned, np.int64)] = 0.0
        inv_mass = flat.reshape(gx, gy, gz)

    imb = np.asarray(
        _to_blocks_np(inv_mass.reshape(-1), dims), np.float32
    )
    return NHGridArrays(
        dims=dims,
        corner_slab=tuple(corner_slab),
        inv_rest_pose=tuple(inv_rest_pose),
        inv_rest_volume=irv,
        rest_volume=w32,
        inv_mass_blocks=jnp.asarray(imb),
        inv_mass=jnp.asarray(inv_mass.reshape(-1)),
    )


# ---------------------------------------------------------------------------
# Parity-block layout conversion
# ---------------------------------------------------------------------------


def _to_blocks_np(flat, dims):
    """NumPy mirror of _to_blocks (used at build time)."""
    gx, gy, gz = dims[0] + 1, dims[1] + 1, dims[2] + 1
    (hx, hy, hz), lh, lhp = _geometry(dims)
    a = np.zeros((2 * hx, 2 * hy, 2 * hz), np.float32)
    a[:gx, :gy, :gz] = np.asarray(flat, np.float32).reshape(gx, gy, gz)
    b = a.reshape(hx, 2, hy, 2, hz, 2).transpose(1, 3, 5, 0, 2, 4)
    out = np.zeros((8, lhp), np.float32)
    out[:, :lh] = b.reshape(8, lh)
    return out


def _to_blocks(flat, dims):
    """[Nv] component -> [8, LHp] parity blocks (tail zero-padded)."""
    gx, gy, gz = dims[0] + 1, dims[1] + 1, dims[2] + 1
    (hx, hy, hz), lh, lhp = _geometry(dims)
    a = jnp.zeros((2 * hx, 2 * hy, 2 * hz), flat.dtype)
    a = a.at[:gx, :gy, :gz].set(flat.reshape(gx, gy, gz))
    b = jnp.transpose(
        a.reshape(hx, 2, hy, 2, hz, 2), (1, 3, 5, 0, 2, 4)
    ).reshape(8, lh)
    return jnp.pad(b, ((0, 0), (0, lhp - lh)))


def _from_blocks(blocks, dims):
    """[8, LHp] parity blocks -> [Nv] flat component."""
    gx, gy, gz = dims[0] + 1, dims[1] + 1, dims[2] + 1
    (hx, hy, hz), lh, _ = _geometry(dims)
    b = blocks[:, :lh].reshape(2, 2, 2, hx, hy, hz)
    a = jnp.transpose(b, (3, 0, 4, 1, 5, 2)).reshape(2 * hx, 2 * hy, 2 * hz)
    return a[:gx, :gy, :gz].reshape(-1)


def _block_pid(dims):
    """Global particle id per block lane: int32 [8, LH] (iota arithmetic)."""
    gy, gz = dims[1] + 1, dims[2] + 1
    (hx, hy, hz), lh, _ = _geometry(dims)
    lane = jax.lax.broadcasted_iota(jnp.int32, (lh, 1), 0).reshape(lh)
    zb = lane % hz
    yb = (lane // hz) % hy
    xb = lane // (hy * hz)
    rows = []
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                i, j, k = 2 * xb + bx, 2 * yb + by, 2 * zb + bz
                pid = (i * gy + j) * gz + k
                valid = (i < dims[0] + 1) & (j < gy) & (k < gz)
                rows.append(jnp.where(valid, pid, -2))
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# The 48-color Gauss-Seidel sweep
# ---------------------------------------------------------------------------


def _color_plan(arr: NHGridArrays):
    """Static per-(type, parity) slab plan.

    For color (t, p) and corner k with cube offset d: the corner vertex of
    cube p+2A is at parity block (p+d)%2, block coord A+(p+d)//2 — a flat
    slice at offset dot((p+d)//2, strides).  Returns a list of 48 entries
    (t, parity, [(block_id, flat_offset)]*4, (cwx, cwy, cwz) cube window).
    """
    (hx, hy, hz), lh, _ = _geometry(arr.dims)
    plan = []
    for t in range(6):
        offs = [_OFFSETS[s] for s in arr.corner_slab[t]]
        for px in (0, 1):
            for py in (0, 1):
                for pz in (0, 1):
                    p = (px, py, pz)
                    corners = []
                    for d in offs:
                        v = tuple(p[i] + d[i] for i in range(3))
                        b = (v[0] % 2) * 4 + (v[1] % 2) * 2 + (v[2] % 2)
                        a = (v[0] // 2, v[1] // 2, v[2] // 2)
                        corners.append(
                            (b, a[0] * hy * hz + a[1] * hz + a[2])
                        )
                    cw = tuple(
                        (arr.dims[i] - p[i] + 1) // 2 for i in range(3)
                    )
                    plan.append((t, p, tuple(corners), cw))
    return plan


def _cube_mask(cw, dims):
    """f32 [LH] — 1 where the lane's cube window coords are in range."""
    (hx, hy, hz), lh, _ = _geometry(dims)
    lane = jax.lax.broadcasted_iota(jnp.int32, (lh, 1), 0).reshape(lh)
    az = lane % hz
    ay = (lane // hz) % hy
    ax = lane // (hy * hz)
    ok = (ax < cw[0]) & (ay < cw[1]) & (az < cw[2])
    return jnp.where(ok, 1.0, 0.0).astype(jnp.float32)


def _solve_color(p, imc, ir, irv, dt, dev_compliance, vol_compliance):
    """Project both Neo-Hookean constraints on one color's tet lanes.

    p: [4][3] of [LH] corner coordinates; imc: [4] of [LH]; ir: [3][3]
    Python floats (uniform rest pose per type); irv: Python float;
    dt/dev_compliance/vol_compliance: scalars (traced values or SMEM
    scalars when called from kernels/nh_stencil).  Component-wise mirror
    of neohookean.solve_tet_batch (Softbody.js:91-165 math) — same op
    order as kernels/gs_fused._solve_level, which is parity tested against
    the XLA engine.  Returns (updated p, det F - 1).
    """

    def edges(p):
        return [[p[k + 1][r] - p[0][r] for r in range(3)] for k in range(3)]

    def deformation(e):
        return [
            [sum(e[k][r] * ir[k][c] for k in range(3)) for c in range(3)]
            for r in range(3)
        ]

    def xpbd_apply(p, g, c_val, compliance):
        g0 = [-(g[0][r] + g[1][r] + g[2][r]) for r in range(3)]
        gall = [g0] + list(g)
        w = sum(
            (gall[i][0] ** 2 + gall[i][1] ** 2 + gall[i][2] ** 2) * imc[i]
            for i in range(4)
        )
        alpha = compliance / (dt * dt) * irv
        ok = (c_val != 0.0) & (w != 0.0)
        denom = jnp.where(ok, w + alpha, 1.0)
        dlam = jnp.where(ok, -c_val / denom, 0.0)
        return [
            [p[i][r] + dlam * imc[i] * gall[i][r] for r in range(3)]
            for i in range(4)
        ]

    gamma = vol_compliance / dev_compliance

    # deviatoric: C = ||F||_F (Softbody.js:96-131)
    e = edges(p)
    f = deformation(e)
    r_s = jnp.sqrt(sum(f[r][c] ** 2 for r in range(3) for c in range(3)))
    r_inv = jnp.where(r_s > 0.0, 1.0 / jnp.where(r_s > 0.0, r_s, 1.0), 0.0)
    g = [
        [sum(f[r][c] * ir[i][c] for c in range(3)) * r_inv for r in range(3)]
        for i in range(3)
    ]
    p = xpbd_apply(p, g, r_s, dev_compliance)

    # hydrostatic: C = det F - 1 - gamma on the *updated* positions
    # (Gauss-Seidel within the element, Softbody.js:134-165)
    e = edges(p)
    f = deformation(e)

    def col(c):
        return [f[r][c] for r in range(3)]

    def cross(a, b):
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    f0, f1, f2 = col(0), col(1), col(2)
    df = [cross(f1, f2), cross(f2, f0), cross(f0, f1)]
    det = sum(f[r][0] * df[0][r] for r in range(3))
    c_vol = det - 1.0 - gamma
    g = [
        [sum(df[c][r] * ir[i][c] for c in range(3)) for r in range(3)]
        for i in range(3)
    ]
    p = xpbd_apply(p, g, c_vol, vol_compliance)
    return p, det - 1.0


def _gs_sweep(X, Y, Z, arr: NHGridArrays, dt, params: PhysicsParams,
              exchange=None, color_scan=False):
    """The 48-color Gauss-Seidel sweep over parity-block state.

    Sequential over colors (each color reads the positions updated by all
    previous colors — functional in-place slice updates), parallel within
    a color (vertex-disjoint tets).  Returns (X, Y, Z, sum vol_err).

    ``exchange(X, Y, Z, to_px)`` (slab sharding, make_nh_sharded_step) is
    called at every cube-x-parity transition of the color plan and once
    after the sweep: a px=0 color on an even-aligned slab cut updates the
    shared vertex plane only on the RIGHT slab, a px=1 color only on the
    LEFT — so refreshing the stale copy exactly at px flips (12 one-plane
    sends per substep) reproduces the global Gauss-Seidel trajectory
    exactly; no other cross-slab dependency exists within a px group.

    ``color_scan=True`` emits the sweep as lax.scan over table-driven
    colors (one scan per exchange-free px run) instead of 48 unrolled
    bodies: the per-color constants (corner block/offset, cube window,
    rest pose) become scanned i32/f32 rows, slices become dynamic slices.
    SAME arithmetic in the same order — trajectory is bit-identical
    (tests/test_neohookean_grid.py) — but ~48x less traced/compiled code
    (the 1M-config compile drops minutes; the multi-chip dryrun needs it
    to fit the driver's budget).  Runtime default stays unrolled: static
    slices fuse better on TPU."""
    if color_scan:
        return _gs_sweep_scan(X, Y, Z, arr, dt, params, exchange)
    (hx, hy, hz), lh, _ = _geometry(arr.dims)
    vol_err = jnp.float32(0.0)
    last_px = None
    for t, p, corners, cw in _color_plan(arr):
        if exchange is not None and last_px is not None and p[0] != last_px:
            X, Y, Z = exchange(X, Y, Z, p[0])
        last_px = p[0]
        mask = _cube_mask(cw, arr.dims)
        pc = [
            [comp[b, o : o + lh] for comp in (X, Y, Z)]
            for (b, o) in corners
        ]
        imc = [arr.inv_mass_blocks[b, o : o + lh] for (b, o) in corners]
        newp, verr = _solve_color(
            pc, imc, arr.inv_rest_pose[t], arr.inv_rest_volume, dt,
            params.dev_compliance, params.vol_compliance,
        )
        for k, (b, o) in enumerate(corners):
            X = X.at[b, o : o + lh].add((newp[k][0] - pc[k][0]) * mask)
            Y = Y.at[b, o : o + lh].add((newp[k][1] - pc[k][1]) * mask)
            Z = Z.at[b, o : o + lh].add((newp[k][2] - pc[k][2]) * mask)
        vol_err = vol_err + jnp.sum(verr * mask)
    if exchange is not None:
        # the final px=1 colors updated the shared plane on the LEFT slab;
        # refresh the right copies so collide/velocity/predict stay
        # replica-consistent into the next substep
        X, Y, Z = exchange(X, Y, Z, 0)
    return X, Y, Z, vol_err


def _gs_sweep_scan(X, Y, Z, arr: NHGridArrays, dt, params: PhysicsParams,
                   exchange=None):
    """Table-driven lax.scan form of _gs_sweep (see its docstring)."""
    (hx, hy, hz), lh, _ = _geometry(arr.dims)
    plan = _color_plan(arr)

    def tables(colors):
        b = np.array([[c[0] for c in corners]
                      for _, _, corners, _ in colors], np.int32)
        o = np.array([[c[1] for c in corners]
                      for _, _, corners, _ in colors], np.int32)
        cw = np.array([list(cw) for _, _, _, cw in colors], np.int32)
        ir = np.array([arr.inv_rest_pose[t] for t, _, _, _ in colors],
                      np.float32)
        return (jnp.asarray(b), jnp.asarray(o), jnp.asarray(cw),
                jnp.asarray(ir))

    imb = arr.inv_mass_blocks

    def body(carry, tab):
        X, Y, Z, ve = carry
        bt, ot, cwt, irt = tab
        mask = _cube_mask((cwt[0], cwt[1], cwt[2]), arr.dims)

        def dsl(comp, k):
            return jax.lax.dynamic_slice(comp, (bt[k], ot[k]), (1, lh))[0]

        pc = [[dsl(comp, k) for comp in (X, Y, Z)] for k in range(4)]
        imc = [dsl(imb, k) for k in range(4)]
        ir = [[irt[i, c] for c in range(3)] for i in range(3)]
        newp, verr = _solve_color(
            pc, imc, ir, arr.inv_rest_volume, dt,
            params.dev_compliance, params.vol_compliance,
        )
        for k in range(4):
            for ci, comp in enumerate((X, Y, Z)):
                d = (newp[k][ci] - pc[k][ci]) * mask
                cur = dsl(comp, k)
                comp = jax.lax.dynamic_update_slice(
                    comp, (cur + d)[None], (bt[k], ot[k])
                )
                if ci == 0:
                    X = comp
                elif ci == 1:
                    Y = comp
                else:
                    Z = comp
        return (X, Y, Z, ve + jnp.sum(verr * mask)), None

    vol_err = jnp.float32(0.0)
    if exchange is None:
        (X, Y, Z, vol_err), _ = jax.lax.scan(
            body, (X, Y, Z, vol_err), tables(plan)
        )
        return X, Y, Z, vol_err

    # sharded: one scan per exchange-free px run (12 runs of 4 colors)
    runs = []
    for color in plan:
        px = color[1][0]
        if runs and runs[-1][0] == px:
            runs[-1][1].append(color)
        else:
            runs.append((px, [color]))
    last_px = None
    for px, colors in runs:
        if last_px is not None and px != last_px:
            X, Y, Z = exchange(X, Y, Z, px)
        last_px = px
        (X, Y, Z, vol_err), _ = jax.lax.scan(
            body, (X, Y, Z, vol_err), tables(colors)
        )
    X, Y, Z = exchange(X, Y, Z, 0)
    return X, Y, Z, vol_err


def predict_phase(imc, X, Y, Z, VX, VY, VZ, params, dt):
    """Predict (common.predict semantics: gravity in prediction, pinned
    gate).  Shape-polymorphic elementwise phase shared by the XLA engine
    ([8, LHp] blocks) and the fused kernel's sharded form ([8, rows, 128]
    planes) — the SINGLE source of these semantics outside the in-kernel
    copy (kernels/nh_stencil._make_kernel, parity-locked by tests).
    Returns (X, Y, Z, VX, VY, VZ) integrated/gated; prev = the inputs."""
    movable = imc > 0.0
    VY = VY + params.gravity * dt
    VX = jnp.where(movable, VX, 0.0)
    VY = jnp.where(movable, VY, 0.0)
    VZ = jnp.where(movable, VZ, 0.0)
    return X + VX * dt, Y + VY * dt, Z + VZ * dt, VX, VY, VZ


def collide_grab_phase(X, Y, Z, PX, PY, PZ, pid, params, dt,
                       controls: Controls):
    """Collide + grab override + velocity update (common.collide /
    apply_grab semantics) — shape-polymorphic, see predict_phase."""
    X = jnp.clip(X, params.world_min[0], params.world_max[0])
    Y = jnp.clip(Y, params.world_min[1], params.world_max[1])
    Z = jnp.clip(Z, params.world_min[2], params.world_max[2])
    below = Y < 0.0
    Y = jnp.where(below, 0.0, Y)
    k = jnp.minimum(1.0, dt * params.friction)
    X = X + jnp.where(below, (PX - X) * k, 0.0)
    Z = Z + jnp.where(below, (PZ - Z) * k, 0.0)
    gid, gpos = norm_grabs(controls)  # G simultaneous slots
    for g in range(gid.shape[0]):
        hit = pid == gid[g]
        X = jnp.where(hit, gpos[g, 0], X)
        Y = jnp.where(hit, gpos[g, 1], Y)
        Z = jnp.where(hit, gpos[g, 2], Z)
    return X, Y, Z, (X - PX) / dt, (Y - PY) / dt, (Z - PZ) / dt


def _substep_blocks(carry, arr: NHGridArrays, params, dt, controls: Controls,
                    exchange=None, x_offset=None, color_scan=False):
    X, Y, Z, VX, VY, VZ = carry
    PX, PY, PZ = X, Y, Z
    X, Y, Z, VX, VY, VZ = predict_phase(
        arr.inv_mass_blocks, X, Y, Z, VX, VY, VZ, params, dt
    )

    X, Y, Z, vol_err = _gs_sweep(X, Y, Z, arr, dt, params,
                                 exchange=exchange, color_scan=color_scan)

    pid = _block_pid(arr.dims)
    (hx, hy, hz), lh, lhp = _geometry(arr.dims)
    pid = jnp.pad(pid, ((0, 0), (0, lhp - lh)), constant_values=-2)
    if x_offset is not None:
        # slab sharding: local block pid -> global particle id (the slab's
        # first vertex plane starts x_offset vertices into the global grid)
        pid = jnp.where(pid >= 0, pid + x_offset, pid)
    X, Y, Z, VX, VY, VZ = collide_grab_phase(
        X, Y, Z, PX, PY, PZ, pid, params, dt, controls
    )
    return (X, Y, Z, VX, VY, VZ), (
        (PX, PY, PZ),
        vol_err / arr.num_tets,
    )


# ---------------------------------------------------------------------------
# Engine API
# ---------------------------------------------------------------------------


def _to_carry(state: SimState, arr: NHGridArrays):
    d = arr.dims
    return tuple(
        _to_blocks(a[:, c], d) for a in (state.pos, state.vel) for c in range(3)
    )


def _carry_state(carry, prev, state: SimState, arr: NHGridArrays):
    d = arr.dims
    X, Y, Z, VX, VY, VZ = carry

    def stack3(x, y, z):
        return jnp.stack(
            [_from_blocks(x, d), _from_blocks(y, d), _from_blocks(z, d)],
            axis=-1,
        )

    return state.replace(
        pos=stack3(X, Y, Z),
        prev_pos=stack3(*prev),
        vel=stack3(VX, VY, VZ),
    )


def substep(state, arr: NHGridArrays, params, dt, controls, axis_name=None,
            color_scan=False):
    """Single-substep entry matching the engine API (used by tests)."""
    del axis_name
    carry = _to_carry(state, arr)
    carry, (prev, diag) = _substep_blocks(carry, arr, params, dt, controls,
                                          color_scan=color_scan)
    return _carry_state(carry, prev, state, arr), diag


def step_frame(
    state: SimState,
    arr: NHGridArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
    color_scan=False,
):
    """One frame = params.num_substeps stencil-GS substeps in one trace.

    color_scan: emit the 48-color sweep as a table-driven lax.scan — same
    trajectory, ~48x less traced code (see _gs_sweep)."""
    del axis_name
    dt = params.dt
    carry0 = _to_carry(state, arr)

    def body(carry_prev, _):
        carry, _ = carry_prev
        carry, (prev, diag) = _substep_blocks(carry, arr, params, dt, controls,
                                              color_scan=color_scan)
        return (carry, prev), diag

    (carry, prev), diags = jax.lax.scan(
        body, (carry0, carry0[:3]), None, length=params.num_substeps
    )
    return _carry_state(carry, prev, state, arr), diags


# ---------------------------------------------------------------------------
# Multi-chip slab sharding (shard_map along the cube-x axis)
# ---------------------------------------------------------------------------
#
# Gauss-Seidel is sequential over colors, so the Jacobi-style
# one-exchange-per-substep halo (polar_grid.make_grid_sharded_step) cannot
# reproduce its trajectory.  The structured color plan makes an exact slab
# decomposition possible anyway: with slab cuts at EVEN cube columns, a
# px=0 color (even-x cubes) updates each shared vertex plane only from the
# RIGHT slab and a px=1 color only from the LEFT, and no color reads a
# vertex the other slab updated within the same px group.  Refreshing the
# stale copy exactly at the plan's px transitions — 12 one-plane ppermute
# sends per substep, 3*gy*gz*4 B each — therefore reproduces the global
# 48-color GS trajectory exactly (tests/test_sharding.py asserts
# sharded == unsharded).  This is the GS-aware counterpart of the
# reference's single-device scheme, which had no distributed form at all
# (SURVEY.md §2.5).


def _slab_geometry(dims, d):
    nx, ny, nz = dims
    if nx % d != 0:
        raise ValueError(f"nx={nx} must divide evenly over {d} slabs")
    lx = nx // d
    if d > 1 and lx % 2 != 0:
        raise ValueError(
            f"cubes per slab must be even for parity-aligned cuts "
            f"(nx={nx}, {d} slabs -> {lx})"
        )
    return lx, (lx, ny, nz)


def nh_prepare(state: SimState, arr: NHGridArrays, d: int):
    """Flat SimState -> slab pytree: 6 arrays [d, 8, LHp_local]
    (pos x/y/z, vel x/y/z in per-slab parity-block layout).  Shared
    boundary vertex planes are REPLICATED into both neighbors (each slab
    holds its lx+1 local vertex planes)."""
    nx, ny, nz = arr.dims
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    lx, local_dims = _slab_geometry(arr.dims, d)

    def comp(a):
        g = a.reshape(gx, gy, gz)
        return jnp.stack(
            [
                _to_blocks(
                    g[i * lx : i * lx + lx + 1].reshape(-1), local_dims
                )
                for i in range(d)
            ],
            axis=0,
        )

    return tuple(
        comp(a[:, c]) for a in (state.pos, state.vel) for c in range(3)
    )


def nh_unprepare(slab, arr: NHGridArrays, d: int,
                 params: PhysicsParams) -> SimState:
    """Slab pytree -> flat SimState.  Boundary copies are
    replica-consistent at frame boundaries (the sweep's final exchange),
    so each slab contributes its first lx planes and the last slab also
    its closing plane.  prev_pos re-derives exactly as pos - vel*dt (the
    substep's velocity update is (pos - prev)/dt)."""
    nx, ny, nz = arr.dims
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    lx, local_dims = _slab_geometry(arr.dims, d)

    def comp(blocks):
        planes = [
            _from_blocks(blocks[i], local_dims).reshape(lx + 1, gy, gz)[
                : lx + 1 if i == d - 1 else lx
            ]
            for i in range(d)
        ]
        return jnp.concatenate(planes, axis=0).reshape(-1)

    pos = jnp.stack([comp(slab[c]) for c in range(3)], axis=-1)
    vel = jnp.stack([comp(slab[3 + c]) for c in range(3)], axis=-1)
    quats = jnp.zeros((arr.num_tets, 4), jnp.float32).at[:, 3].set(1.0)
    return SimState(
        pos=pos, prev_pos=pos - vel * params.dt, vel=vel, quats=quats
    )


def make_nh_sharded_step(mesh, arr: NHGridArrays, axis: str = "x",
                         compiler_options=None, color_scan=False):
    """Build a jitted sharded frame step over `mesh`'s `axis`:
    (slab_state, params, controls) -> (slab_state, diags).

    slab_state is the nh_prepare tuple sharded P(axis) on the leading dim.
    Per substep: 12 one-plane halo sends (see module comment); everything
    else is the unsharded engine running on the local slab grid.

    compiler_options: optional dict forwarded to XLA at compile time (the
    hermetic suite passes {"xla_backend_optimization_level": "0"} — the
    48-color graph costs minutes of LLVM opt on CPU that tiny test shapes
    never pay back).

    color_scan: emit each exchange-free px run as one table-driven
    lax.scan body instead of 4 unrolled colors — same trajectory, ~4x
    less traced code (see _gs_sweep; the multi-chip dryrun uses it)."""
    from jax.sharding import PartitionSpec as P

    d = mesh.shape[axis]
    nx, ny, nz = arr.dims
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    lx, local_dims = _slab_geometry(arr.dims, d)
    (hxl, hy, hz), lh_l, lhp_l = _geometry(local_dims)
    hyz = hy * hz
    xb_last = lx // 2
    tets_local = 6 * lx * ny * nz

    # per-slab inv-mass planes (global lumped mass: boundary vertices carry
    # contributions from BOTH sides — sliced, not rebuilt per slab)
    im = np.asarray(arr.inv_mass).reshape(gx, gy, gz)
    imb = jnp.asarray(
        np.stack(
            [
                _to_blocks_np(
                    im[i * lx : i * lx + lx + 1].reshape(-1), local_dims
                )
                for i in range(d)
            ],
            axis=0,
        )
    )
    arr_local_static = dict(
        dims=local_dims,
        corner_slab=arr.corner_slab,
        inv_rest_pose=arr.inv_rest_pose,
        inv_rest_volume=arr.inv_rest_volume,
        rest_volume=arr.rest_volume,
    )

    def shard_body(slab, imb_s, params, controls):
        arr_l = NHGridArrays(
            inv_mass_blocks=imb_s[0], inv_mass=None, **arr_local_static
        )
        idx = jax.lax.axis_index(axis)
        x_offset = idx.astype(jnp.int32) * (lx * gy * gz)

        def exchange(X, Y, Z, to_px):
            if d == 1:
                return X, Y, Z
            if to_px == 1:
                # right neighbor's plane x=0 -> local plane x=lx
                perm = [(i, i - 1) for i in range(1, d)]
                src = slice(0, hyz)
                dst = slice(xb_last * hyz, xb_last * hyz + hyz)
                keep = idx < d - 1
            else:
                # left neighbor's plane x=lx -> local plane x=0
                perm = [(i, i + 1) for i in range(d - 1)]
                src = slice(xb_last * hyz, xb_last * hyz + hyz)
                dst = slice(0, hyz)
                keep = idx > 0

            def ex(A):
                recv = jax.lax.ppermute(A[0:4, src], axis, perm)
                cur = A[0:4, dst]
                return A.at[0:4, dst].set(jnp.where(keep, recv, cur))

            return ex(X), ex(Y), ex(Z)

        carry0 = tuple(a[0] for a in slab)
        dt = params.dt

        def body(carry, _):
            carry, (_, diag) = _substep_blocks(
                carry, arr_l, params, dt, controls,
                exchange=exchange, x_offset=x_offset, color_scan=color_scan,
            )
            return carry, diag

        carry, diags = jax.lax.scan(
            body, carry0, None, length=params.num_substeps
        )
        # local diag is vol_err/tets_local; renormalize to the global mean
        diags = jax.lax.psum(diags * tets_local, axis) / arr.num_tets
        return tuple(a[None] for a in carry), diags

    slab_p = (P(axis),) * 6

    @jax.jit
    def _sharded_jit(slab, params, controls):
        pm_specs = jax.tree.map(lambda _: P(), params)
        ct_specs = jax.tree.map(lambda _: P(), controls)
        fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(slab_p, P(axis), pm_specs, ct_specs),
            out_specs=(slab_p, P()),
            check_vma=False,
        )
        return fn(slab, imb, params, controls)

    if compiler_options is None:
        sharded = _sharded_jit
    else:
        cache = {}

        def sharded(slab, params, controls):
            # full retrace key: static fields live in the treedef (e.g.
            # num_substeps), grab-slot width in the leaf shapes — keying
            # on num_substeps alone returned a stale executable when the
            # controls batch shape changed (round-4 review finding)
            leaves, treedef = jax.tree.flatten((params, controls))
            key = (treedef,
                   tuple((jnp.shape(l), jnp.result_type(l)) for l in leaves))
            if key not in cache:
                cache[key] = _sharded_jit.lower(
                    slab, params, controls
                ).compile(compiler_options)
            return cache[key](slab, params, controls)

    if mesh.devices.flat[0].platform != "cpu":
        return sharded

    # serialize dispatch on the CPU test backend (parallel/sharding.py:
    # XLA-CPU's in-process communicator deadlocks under interleaved async
    # collective dispatches across virtual devices)
    def sharded_sync(slab, params, controls):
        out = sharded(slab, params, controls)
        jax.block_until_ready(out)
        return out

    return sharded_sync
