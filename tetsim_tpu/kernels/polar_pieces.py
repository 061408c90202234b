"""Fused polar kernel for ONE large connected unstructured mesh ("pieces").

The last workload shape with no fast path (VERDICT r2 item 3): a single
irregular 1M-tet blob.  The generic XLA polar engine is gather-bound there
(71 ms/substep: 4M corner rows + N x valence inverse rows through HBM at
~2.5 ns/row), the VMEM-resident fused kernel (polar_fused) cannot hold 1M
tets of tables, and the stencil engine needs regular connectivity.

The TPU-native answer reuses the *measured-fast* structure this codebase
already has — the fused polar kernel's lane-gather solve, which sustains
~190k body-substeps/s on dragon-sized meshes — by making the big mesh LOOK
like that workload:

  * the mesh is partitioned into dragon-sized **pieces** (~4k tets) along a
    bandwidth-minimizing particle order (reverse Cuthill-McKee), so each
    piece's particle set is compact;
  * pieces ride the kernel's body sublanes (8 pieces per grid block) with
    per-piece tables streamed HBM->VMEM by the Pallas pipeline — the same
    blocked streaming that lifted the multi-body batch gate, now with
    *different* tables per sublane;
  * the kernel runs the solve only (corner gather -> covariance -> Mueller
    extractRotation -> goal deltas -> piece-local scatter inversion) and
    outputs per-piece partial numerators; particles shared between pieces
    (the piece boundaries — a few % after RCM) are completed by a cheap
    XLA pass: owner-instance gather + boundary scatter-add.  Predict,
    apply, collide, grab and velocity run as global elementwise XLA.

Same math as solvers/polar.py (= the reference GPU path, SoftbodyGPU.js
passes 3-5: extractRotation at :122-139, volume-weighted averaging at
:302-320), so trajectories match the XLA engine to f32 accumulation order.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh import TetMesh, rest_state
from ..params import PhysicsParams
from ..state import SimState, Controls
from ..solvers.polar_grid import _extract_rotation, _qmul
from .schedule import ta_tiled as _ta_tiled, vmem_budget_bytes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Host-side partition + schedule
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PiecesSchedule:
    """Numpy tables for the piecewise fused polar kernel."""

    # per-piece kernel tables (B = padded piece count, multiple of 8)
    ids: np.ndarray      # i32 [4, B, rt]  corner -> LOCAL particle lane
    inc: np.ndarray      # i32 [K, B, rp]  local scatter inversion, -1 pad
    rc: np.ndarray       # f32 [12, B, rt] rest_centered rows k*3+r
    wvol: np.ndarray     # f32 [B, rt]     rest volume (0 on padded lanes)
    # local <-> global maps
    g2l: np.ndarray      # i32 [B, rp]     local lane -> global pid (N pad)
    tet_l2g: np.ndarray  # i32 [B, rt]     local tet lane -> global tet (M pad)
    tet_inst: np.ndarray  # i32 [M]        global tet -> flat piece*rt + lane
    owner_inst: np.ndarray  # i32 [N]      first instance (piece*rp + lane)
    bnd_pid: np.ndarray  # i32 [Sb]        particles with >1 instance
    bnd_inst: np.ndarray  # i32 [Sb, J]    2nd..Jth instances, -1 pad
    # global per-particle constants
    invden: np.ndarray   # f32 [N]
    movw: np.ndarray     # f32 [N]
    num_particles: int
    num_tets: int
    n_pieces: int
    B: int
    rp: int
    rt: int
    valence: int
    gather_tiles: tuple   # [4][rt/128] of tuple[int] (union over pieces)
    scatter_tiles: tuple  # [K][rp/128] of tuple[int]


def _rcm_particle_order(tets: np.ndarray, n: int) -> np.ndarray:
    """Bandwidth-minimizing particle order (reverse Cuthill-McKee) over the
    tet-sharing graph.  BENCHNOTES "gather locality" note: index locality
    does NOT help XLA HBM gathers — but it is exactly what bounds each
    contiguous tet range's particle span, i.e. the piece sizes here."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    pairs = []
    for a in range(4):
        for b in range(a + 1, 4):
            pairs.append(tets[:, (a, b)])
    e = np.concatenate(pairs, axis=0)
    g = sp.coo_matrix(
        (np.ones(len(e), np.int8), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    g = g + g.T
    return np.asarray(reverse_cuthill_mckee(g, symmetric_mode=True))


def build_pieces_schedule(
    mesh: TetMesh,
    density: float = 1000.0,
    tets_per_piece: int = 2048,
    pinned=None,
) -> PiecesSchedule:
    _, _, vol, im, rc = rest_state(mesh, density, pinned=pinned)
    tets = mesh.tets
    n, m = mesh.num_particles, mesh.num_tets

    order = _rcm_particle_order(tets, n)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    # COMPACT pieces via recursive coordinate bisection of tet centroids.
    # (A contiguous range of any 1-D order is the wrong partition for a 3-D
    # mesh: its particle set includes the whole O(M^(2/3)) front on both
    # ends — measured ~6x duplication at 1M tets.  RCB pieces are blobs
    # with ~surface/volume duplication, ~1.3-1.6x.)  RCM survives as the
    # LOCAL particle order, which keeps corner lanes tile-coherent.
    centroids = mesh.verts[tets].mean(axis=1)
    # power-of-two piece count: exact halving keeps every piece within one
    # tet of the same size, so the UNIFORM rt padding wastes nothing (a
    # ragged split left one piece ~2x the target, doubling every piece's
    # tables)
    n_pieces = 1
    while n_pieces * tets_per_piece < m:
        n_pieces *= 2
    parts = [np.arange(m)]
    while len(parts) < n_pieces:
        nxt = []
        for big in parts:
            c = centroids[big]
            ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            med = np.argsort(c[:, ax], kind="stable")
            h = len(big) // 2
            nxt += [big[med[:h]], big[med[h:]]]
        parts = nxt
    b_pad = _round_up(n_pieces, 8)

    pieces = []  # (tet_ids global, local_particles global ids sorted by rank)
    rp = rt = 0
    kmax = 0
    for te in parts:
        locals_ = np.unique(tets[te].reshape(-1))
        locals_ = locals_[np.argsort(rank[locals_], kind="stable")]
        pieces.append((te, locals_))
        rt = max(rt, len(te))
        rp = max(rp, len(locals_))
        counts = np.bincount(tets[te].reshape(-1), minlength=n)
        kmax = max(kmax, int(counts.max()))
    rp, rt = _round_up(rp, 128), _round_up(rt, 128)

    ids = np.zeros((4, b_pad, rt), np.int32)
    inc = np.full((kmax, b_pad, rp), -1, np.int32)
    rc12 = np.zeros((12, b_pad, rt), np.float32)
    wvol = np.zeros((b_pad, rt), np.float32)
    g2l = np.full((b_pad, rp), n, np.int32)
    tet_l2g = np.full((b_pad, rt), m, np.int32)
    tet_inst = np.zeros(m, np.int32)
    instances = [[] for _ in range(n)]  # global pid -> flat instances

    lut = np.empty(n, np.int64)
    for p, (te, locals_) in enumerate(pieces):
        nl = len(locals_)
        lut[locals_] = np.arange(nl)
        lt_local = lut[tets[te]]
        # sort piece tets by first LOCAL corner (lane-tile locality, same
        # move as build_polar_schedule)
        perm = np.argsort(lt_local[:, 0], kind="stable")
        te_s = te[perm]
        lt_local = lt_local[perm]
        mt = len(te_s)
        ids[:, p, :mt] = lt_local.T
        wvol[p, :mt] = vol[te_s]
        rcp = rc[te_s]
        for k in range(4):
            for r in range(3):
                rc12[k * 3 + r, p, :mt] = rcp[:, k, r]
        g2l[p, :nl] = locals_
        tet_l2g[p, :mt] = te_s
        tet_inst[te_s] = p * rt + np.arange(mt)
        # vectorized bank fill (corner-instance -> local particle, sorted;
        # same argsort trick as mesh.build_incidence)
        seg = lt_local.reshape(-1)  # corner instance i=t*4+k -> local pid
        inst_order = np.argsort(seg, kind="stable")
        counts = np.bincount(seg, minlength=nl)
        starts = np.cumsum(counts) - counts
        bank = np.arange(4 * mt, dtype=np.int64) - np.repeat(starts, counts)
        tt = inst_order // 4
        kk = inst_order % 4
        inc[bank, p, seg[inst_order]] = (kk * rt + tt).astype(np.int32)
        for i, g in enumerate(locals_):
            instances[int(g)].append(p * rp + i)

    jmax = max(len(v) for v in instances)
    owner_inst = np.zeros(n, np.int32)
    bnd = [p for p in range(n) if len(instances[p]) > 1]
    bnd_pid = np.asarray(bnd, np.int32)
    bnd_inst = np.full((len(bnd), max(jmax - 1, 1)), -1, np.int32)
    for p in range(n):
        owner_inst[p] = instances[p][0]
    for i, p in enumerate(bnd):
        rest = instances[p][1:]
        bnd_inst[i, : len(rest)] = rest

    # global scatter denominator + movable mask (polar engine semantics)
    den = np.zeros(n, np.float64)
    np.add.at(den, tets.reshape(-1), np.repeat(vol.astype(np.float64), 4))
    invden = (1.0 / np.maximum(den.astype(np.float32), 1e-9)).astype(
        np.float32
    )
    movw = (im > 0.0).astype(np.float32)

    def tile_lists(table, width):
        # union of source tiles per output tile, over ALL pieces (the
        # kernel is compiled once; tables stream per block)
        out = []
        for row in table:  # [B, width]
            vals = np.maximum(row, 0)
            tiles = []
            for o in range(width // 128):
                src = np.unique(vals[:, o * 128 : (o + 1) * 128] // 128)
                tiles.append(tuple(int(x) for x in src))
            out.append(tuple(tiles))
        return tuple(out)

    return PiecesSchedule(
        ids=ids, inc=inc, rc=rc12, wvol=wvol,
        g2l=g2l, tet_l2g=tet_l2g, tet_inst=tet_inst,
        owner_inst=owner_inst, bnd_pid=bnd_pid, bnd_inst=bnd_inst,
        invden=invden, movw=movw,
        num_particles=n, num_tets=m, n_pieces=n_pieces, B=b_pad,
        rp=rp, rt=rt, valence=kmax,
        gather_tiles=tile_lists(ids, rt),
        scatter_tiles=tile_lists(inc, rp),
    )

# ---------------------------------------------------------------------------
# The solve-only kernel (8 pieces per grid block, per-piece tables streamed)
# ---------------------------------------------------------------------------


def _qrot_rows(i, rc_ref, qx, qy, qz, qw, sl):
    """Rotate per-tet rest vector (rc rows 3i..3i+2, PER-SUBLANE pieces) by
    the quaternion planes: v + 2*u x (u x v + w*v)."""
    vx = rc_ref[3 * i, :, sl]
    vy = rc_ref[3 * i + 1, :, sl]
    vz = rc_ref[3 * i + 2, :, sl]
    tx = qy * vz - qz * vy + qw * vx
    ty = qz * vx - qx * vz + qw * vy
    tz = qx * vy - qy * vx + qw * vz
    rx = qy * tz - qz * ty
    ry = qz * tx - qx * tz
    rz = qx * ty - qy * tx
    return vx + 2.0 * rx, vy + 2.0 * ry, vz + 2.0 * rz


def _make_solve_kernel(rp, rt, K, gather_tiles, scatter_tiles, t_tiles):
    """One polar solve over a block of 8 pieces: corner gather ->
    covariance -> extractRotation -> goal deltas -> LOCAL scatter
    inversion.  Outputs the per-piece partial numerator planes; the
    cross-piece completion and the apply/collide tail run in XLA
    (kernels/polar_fused._make_kernel is the single-mesh original)."""
    B = 8

    def kernel(
        pos_ref,   # VMEM f32 [3, B, rp]  local corner positions
        quat_ref,  # VMEM f32 [4, B, rt]  (aliased with qout)
        ids_ref,   # VMEM i32 [4, B, rt]
        inc_ref,   # VMEM i32 [K, B, rp]
        rc_ref,    # VMEM f32 [12, B, rt]
        wvol_ref,  # VMEM f32 [B, rt]
        num_ref,   # VMEM f32 [3, B, rp] out
        qout_ref,  # VMEM f32 [4, B, rt] out
    ):
        X, Y, Z = pos_ref[0], pos_ref[1], pos_ref[2]
        for k in range(4):
            qout_ref[k] = quat_ref[k]
        n_chunks = -(-(rt // 128) // t_tiles)

        dx = [[] for _ in range(4)]
        dy = [[] for _ in range(4)]
        dz = [[] for _ in range(4)]
        for ci in range(n_chunks):
            t0 = ci * t_tiles
            t1 = min(t0 + t_tiles, rt // 128)
            sl = slice(t0 * 128, t1 * 128)
            wv = wvol_ref[:, sl]

            cx, cy, cz = [], [], []
            for k in range(4):
                idx = ids_ref[k, :, sl]
                gt = gather_tiles[k][t0:t1]
                cx.append(_ta_tiled(X, idx, gt))
                cy.append(_ta_tiled(Y, idx, gt))
                cz.append(_ta_tiled(Z, idx, gt))
            ccx = (((cx[0] + cx[1]) + cx[2]) + cx[3]) * 0.25
            ccy = (((cy[0] + cy[1]) + cy[2]) + cy[3]) * 0.25
            ccz = (((cz[0] + cz[1]) + cz[2]) + cz[3]) * 0.25
            pcx = [c - ccx for c in cx]
            pcy = [c - ccy for c in cy]
            pcz = [c - ccz for c in cz]

            qx = qout_ref[0, :, sl]
            qy = qout_ref[1, :, sl]
            qz = qout_ref[2, :, sl]
            qw = qout_ref[3, :, sl]
            rr = [_qrot_rows(k, rc_ref, qx, qy, qz, qw, sl) for k in range(4)]
            cur = (pcx, pcy, pcz)
            a = [
                [sum(cur[r][k] * rr[k][c] for k in range(4)) for c in range(3)]
                for r in range(3)
            ]
            ix, iy, iz, iw = _extract_rotation(a)
            qx, qy, qz, qw = _qmul(ix, iy, iz, iw, qx, qy, qz, qw)
            norm = jnp.maximum(
                jnp.sqrt(qx * qx + qy * qy + qz * qz + qw * qw), 1e-30
            )
            qx, qy, qz, qw = qx / norm, qy / norm, qz / norm, qw / norm
            qout_ref[0, :, sl] = qx
            qout_ref[1, :, sl] = qy
            qout_ref[2, :, sl] = qz
            qout_ref[3, :, sl] = qw

            for k in range(4):
                gx_, gy_, gz_ = _qrot_rows(k, rc_ref, qx, qy, qz, qw, sl)
                dx[k].append((gx_ - pcx[k]) * wv)
                dy[k].append((gy_ - pcy[k]) * wv)
                dz[k].append((gz_ - pcz[k]) * wv)

        # corner-major [B, 4*rt] delta planes (slot = k*rt + t)
        dxf = jnp.concatenate([d for k in range(4) for d in dx[k]], axis=1)
        dyf = jnp.concatenate([d for k in range(4) for d in dy[k]], axis=1)
        dzf = jnp.concatenate([d for k in range(4) for d in dz[k]], axis=1)

        numx = jnp.zeros((B, rp), jnp.float32)
        numy = jnp.zeros((B, rp), jnp.float32)
        numz = jnp.zeros((B, rp), jnp.float32)
        for v in range(K):
            invv = inc_ref[v]
            live = invv >= 0
            idx = jnp.maximum(invv, 0)
            st = scatter_tiles[v]
            numx = numx + jnp.where(live, _ta_tiled(dxf, idx, st), 0.0)
            numy = numy + jnp.where(live, _ta_tiled(dyf, idx, st), 0.0)
            numz = numz + jnp.where(live, _ta_tiled(dzf, idx, st), 0.0)
        num_ref[0] = numx
        num_ref[1] = numy
        num_ref[2] = numz

    return kernel


def _solve_call(s: PiecesSchedule, t_tiles: int, interpret: bool):
    kernel = _make_solve_kernel(
        s.rp, s.rt, s.valence, s.gather_tiles, s.scatter_tiles, t_tiles
    )
    n_blk = s.B // 8

    def spec(lead, width, arg_rows=None):
        return pl.BlockSpec(
            (lead, 8, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        out_shape=[
            jax.ShapeDtypeStruct((3, s.B, s.rp), jnp.float32),
            jax.ShapeDtypeStruct((4, s.B, s.rt), jnp.float32),
        ],
        in_specs=[
            spec(3, s.rp),
            spec(4, s.rt),
            spec(4, s.rt),
            spec(s.valence, s.rp),
            spec(12, s.rt),
            pl.BlockSpec(
                (8, s.rt), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[spec(3, s.rp), spec(4, s.rt)],
        input_output_aliases={1: 1},  # quats updated in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()[1],
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Engine API (state, arrays, params, controls) -> (state, diag)
# ---------------------------------------------------------------------------

from flax import struct


@struct.dataclass
class PiecesArrays:
    """Device-side tables + static meta for the pieces engine."""

    # static
    num_particles: int = struct.field(pytree_node=False)
    num_tets: int = struct.field(pytree_node=False)
    B: int = struct.field(pytree_node=False)
    rp: int = struct.field(pytree_node=False)
    rt: int = struct.field(pytree_node=False)
    valence: int = struct.field(pytree_node=False)
    t_tiles: int = struct.field(pytree_node=False)
    gather_tiles: tuple = struct.field(pytree_node=False)
    scatter_tiles: tuple = struct.field(pytree_node=False)
    # traced tables
    ids: jnp.ndarray = None
    inc: jnp.ndarray = None
    rc: jnp.ndarray = None
    wvol: jnp.ndarray = None
    g2l_flat: jnp.ndarray = None     # i32 [B*rp]
    tet_l2g_flat: jnp.ndarray = None  # i32 [B*rt]
    tet_inst: jnp.ndarray = None     # i32 [M]
    owner_inst: jnp.ndarray = None   # i32 [N]
    bnd_pid: jnp.ndarray = None      # i32 [Sb]
    bnd_inst: jnp.ndarray = None     # i32 [Sb, J]
    inv_mass: jnp.ndarray = None     # f32 [N] (engine-contract name)
    invden: jnp.ndarray = None       # f32 [N]
    movw: jnp.ndarray = None         # f32 [N]


def build_pieces_arrays(
    mesh: TetMesh,
    density: float = 1000.0,
    tets_per_piece: int = 2048,
    pinned=None,
) -> PiecesArrays:
    s = build_pieces_schedule(mesh, density, tets_per_piece, pinned)
    _, _, _, im, _ = rest_state(mesh, density, pinned=pinned)
    return PiecesArrays(
        num_particles=s.num_particles,
        num_tets=s.num_tets,
        B=s.B, rp=s.rp, rt=s.rt, valence=s.valence,
        t_tiles=max(1, min(4, s.rt // 128)),
        gather_tiles=s.gather_tiles,
        scatter_tiles=s.scatter_tiles,
        ids=jnp.asarray(s.ids),
        inc=jnp.asarray(s.inc),
        rc=jnp.asarray(s.rc),
        wvol=jnp.asarray(s.wvol),
        g2l_flat=jnp.asarray(s.g2l.reshape(-1)),
        tet_l2g_flat=jnp.asarray(s.tet_l2g.reshape(-1)),
        tet_inst=jnp.asarray(s.tet_inst),
        owner_inst=jnp.asarray(s.owner_inst),
        bnd_pid=jnp.asarray(s.bnd_pid),
        bnd_inst=jnp.asarray(s.bnd_inst),
        inv_mass=jnp.asarray(im),
        invden=jnp.asarray(s.invden),
        movw=jnp.asarray(s.movw),
    )


def _substep_planes(carry, arr: PiecesArrays, params, dt, controls, call):
    """One substep on global component planes + piece-layout quats."""
    px, py, pz, vx, vy, vz, q = carry
    movable = arr.movw > 0.0

    # predict (common.predict semantics)
    vy = vy + params.gravity * dt
    vx = jnp.where(movable, vx, 0.0)
    vy = jnp.where(movable, vy, 0.0)
    vz = jnp.where(movable, vz, 0.0)
    ppx, ppy, ppz = px, py, pz
    px, py, pz = px + vx * dt, py + vy * dt, pz + vz * dt

    # local corner positions: one [N+1,3] row gather, then piece planes
    pos3 = jnp.stack([px, py, pz], axis=-1)
    pos3 = jnp.concatenate([pos3, jnp.zeros((1, 3), pos3.dtype)])
    lp = pos3[arr.g2l_flat].reshape(arr.B, arr.rp, 3)
    lp = jnp.moveaxis(lp, -1, 0)  # [3, B, rp]

    num, q = call(lp, q, arr.ids, arr.inc, arr.rc, arr.wvol)

    # cross-piece completion: owner-instance gather + boundary add.
    # ROW-major [X,3] gathers throughout: TPU row gathers cost ~2.5 ns/row
    # regardless of width, while minor-axis (column) gathers on a [3, X]
    # array relayout catastrophically.
    flat = jnp.moveaxis(num, 0, -1).reshape(arr.B * arr.rp, 3)
    own = flat[arr.owner_inst]  # [N, 3]
    if arr.bnd_pid.shape[0]:
        extra = jnp.zeros((arr.bnd_pid.shape[0], 3), jnp.float32)
        for j in range(arr.bnd_inst.shape[1]):
            inst = arr.bnd_inst[:, j]
            live = inst >= 0
            g = flat[jnp.maximum(inst, 0)]
            extra = extra + jnp.where(live[:, None], g, 0.0)
        own = own.at[arr.bnd_pid].add(extra)

    px = jnp.where(movable, px + own[:, 0] * arr.invden, px)
    py = jnp.where(movable, py + own[:, 1] * arr.invden, py)
    pz = jnp.where(movable, pz + own[:, 2] * arr.invden, pz)

    # collide (common.collide semantics)
    px = jnp.clip(px, params.world_min[0], params.world_max[0])
    py = jnp.clip(py, params.world_min[1], params.world_max[1])
    pz = jnp.clip(pz, params.world_min[2], params.world_max[2])
    below = py < 0.0
    py = jnp.where(below, 0.0, py)
    k = jnp.minimum(1.0, dt * params.friction)
    px = px + jnp.where(below, (ppx - px) * k, 0.0)
    pz = pz + jnp.where(below, (ppz - pz) * k, 0.0)

    # grab override (scalar id)
    gid = controls.grab_id
    n = px.shape[0]
    pid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    hit = pid == gid
    px = jnp.where(hit, controls.grab_pos[0], px)
    py = jnp.where(hit, controls.grab_pos[1], py)
    pz = jnp.where(hit, controls.grab_pos[2], pz)

    vx, vy, vz = (px - ppx) / dt, (py - ppy) / dt, (pz - ppz) / dt
    return (px, py, pz, vx, vy, vz, q), (ppx, ppy, ppz)


def _quats_to_pieces(quats, arr: PiecesArrays):
    qpad = jnp.concatenate(
        [quats, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], quats.dtype)]
    )
    q = qpad[arr.tet_l2g_flat].reshape(arr.B, arr.rt, 4)
    return jnp.moveaxis(q, -1, 0)  # [4, B, rt]


def _quats_from_pieces(q, arr: PiecesArrays):
    flat = jnp.moveaxis(q, 0, -1).reshape(arr.B * arr.rt, 4)
    return flat[arr.tet_inst]


def step_frame(
    state: SimState,
    arr: PiecesArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
    interpret: bool | None = None,
):
    """One frame = num_substeps piecewise-fused substeps (engine API)."""
    del axis_name
    if controls.grab_id.ndim != 0:
        raise NotImplementedError(
            "polar_pieces supports the scalar grab_id form; use the "
            "generic polar engine for multi-body vector grabs"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _solve_call_cached(
        arr.B, arr.rp, arr.rt, arr.valence,
        arr.gather_tiles, arr.scatter_tiles, arr.t_tiles, bool(interpret),
    )
    dt = params.dt
    carry0 = (
        state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
        state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
        _quats_to_pieces(state.quats, arr),
    )

    def body(carry_prev, _):
        carry, _ = carry_prev
        carry, prev = _substep_planes(carry, arr, params, dt, controls, call)
        return (carry, prev), jnp.nan  # per-substep vol_err not computed

    (carry, prev), diags = jax.lax.scan(
        body, (carry0, carry0[:3]), None, length=params.num_substeps
    )
    px, py, pz, vx, vy, vz, q = carry
    return state.replace(
        pos=jnp.stack([px, py, pz], axis=-1),
        prev_pos=jnp.stack(list(prev), axis=-1),
        vel=jnp.stack([vx, vy, vz], axis=-1),
        quats=_quats_from_pieces(q, arr),
    ), diags


def substep(state, arr, params, dt, controls, axis_name=None,
            interpret: bool | None = None):
    """Single-substep entry matching the engine API (used by tests)."""
    del axis_name, dt
    one = params.replace(num_substeps=1)
    new, diags = step_frame(state, arr, one, controls, interpret=interpret)
    return new, diags[0]


@functools.lru_cache(maxsize=None)
def _solve_call_cached(B, rp, rt, valence, gather_tiles, scatter_tiles,
                       t_tiles, interpret):
    """Cache the pallas_call by STATIC geometry only (no jnp arrays — an
    lru_cache keyed on traced values would leak tracers, CLAUDE.md)."""
    sched = _CallGeom(B, rp, rt, valence, gather_tiles, scatter_tiles)
    return _solve_call(sched, t_tiles, interpret)


@dataclasses.dataclass(frozen=True)
class _CallGeom:
    B: int
    rp: int
    rt: int
    valence: int
    gather_tiles: tuple
    scatter_tiles: tuple
