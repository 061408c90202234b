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
    outputs per-piece partial numerators;
  * state is LOCAL-PRIMARY: positions/velocities live in piece planes
    across substeps (duplicated boundary lanes stay consistent because
    every other phase is elementwise and deterministic); the only
    cross-piece communication is the boundary-numerator completion —
    compact prefix-tier gathers on [*,3]-wide rows (measured 4 ns/row)
    sized exactly to the instance count, plus one read-back.  Predict,
    apply, collide, grab, velocity run elementwise on the piece planes;
    SimState materializes only at the frame/IO boundary.

Measured at 987k tets (single chip): 6.56 ms/substep sustained = 152 Hz —
10.8x the XLA engine; kernel 3.66 ms + completion/elementwise 2.90 ms.

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
from ..solvers.common import norm_grabs
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
    bnd_inst: np.ndarray  # i32 [Jmax, Sb] j-th instance of boundary pcl i
    tier_counts: tuple    # [Jmax] prefix counts (sorted by J descending)
    lane_bnd: np.ndarray  # i32 [B*rp]     compact boundary row or -1
    pidx: np.ndarray      # i32 [B, r2]    J=2 partner flat lane (self pad)
    is2: np.ndarray       # bool [B, r2]   lane holds a J=2 particle
    # global per-particle constants
    invden: np.ndarray   # f32 [N]
    movw: np.ndarray     # f32 [N]
    inv_mass: np.ndarray  # f32 [N] (kept so build_pieces_arrays does not
    #                       re-run the full rest_state pass for it)
    num_particles: int
    num_tets: int
    n_pieces: int
    B: int
    rp: int
    rt: int
    rb: int              # end of the shared-lane bands (= rp unless the
    #                      schedule was built with boundary_prefix=True)
    r2: int              # end of the J=2 band (0 without boundary_prefix)
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


def rcb_partition(mesh: TetMesh, tets_per_piece: int):
    """COMPACT tet pieces via recursive coordinate bisection of centroids.

    (A contiguous range of any 1-D order is the wrong partition for a 3-D
    mesh: its particle set includes the whole O(M^(2/3)) front on both
    ends — measured ~6x duplication at 1M tets.  RCB pieces are blobs
    with ~surface/volume duplication, ~1.3-1.6x.)  Power-of-two piece
    count: exact halving keeps every piece within one tet of the same
    size, so UNIFORM rt padding wastes nothing (a ragged split left one
    piece ~2x the target, doubling every piece's tables).  Shared by the
    polar and Neo-Hookean pieces engines."""
    m = mesh.num_tets
    centroids = mesh.verts[mesh.tets].mean(axis=1)
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
    return parts, n_pieces


def band_locals(locals_list, n: int):
    """[J2 | J>=3 | interior] lane banding, shared by the pieces engines.

    Takes each piece's (rank-sorted) local particle list and returns
    (banded locals list, lane-position list, r2, rb, rp): particles
    shared by exactly 2 pieces land in [0:r2), by >=3 in [r2:rb),
    interior in [rb:rp), with hole lanes between bands left unmapped.
    Band widths are uniform across pieces (max, lane-tile padded) so the
    completion can address each band with a STATIC slice."""
    icount = np.zeros(n, np.int64)
    for locals_ in locals_list:
        icount[locals_] += 1
    n2_max = n3_max = ni_max = 0
    banded = []
    for locals_ in locals_list:
        c = icount[locals_]
        b2, b3, bi = locals_[c == 2], locals_[c > 2], locals_[c == 1]
        banded.append((b2, b3, bi))
        n2_max = max(n2_max, len(b2))
        n3_max = max(n3_max, len(b3))
        ni_max = max(ni_max, len(bi))
    r2 = _round_up(n2_max, 128) if n2_max else 0
    r3 = _round_up(n3_max, 128) if n3_max else 0
    rb = r2 + r3
    rp = rb + (_round_up(ni_max, 128) if ni_max else 0)
    out_locals, out_lanepos = [], []
    for b2, b3, bi in banded:
        out_locals.append(np.concatenate([b2, b3, bi]))
        out_lanepos.append(np.concatenate([
            np.arange(len(b2)),
            r2 + np.arange(len(b3)),
            rb + np.arange(len(bi)),
        ]))
    return out_locals, out_lanepos, r2, rb, rp


def partner_tables(instances, n: int, b_pad: int, rp: int, r2: int):
    """J=2 partner-exchange tables over the [0:r2) band: pidx [B, r2]
    holds each J=2 lane's twin as a FLAT lane index (self for non-J2 /
    hole lanes so gathers stay in-bounds), is2 [B, r2] marks the real
    pairs.  One gather over this band completes every J=2 particle —
    f32 a+b is commutative, so both replicas stay bitwise equal."""
    pidx = np.zeros((b_pad, r2), np.int32)
    is2 = np.zeros((b_pad, r2), bool)
    if r2:
        pidx[:] = (
            np.arange(b_pad)[:, None] * rp + np.arange(r2)[None, :]
        )
        for p in range(n):
            inst = instances[p]
            if len(inst) == 2:
                a, b = inst
                pidx[a // rp, a % rp] = b
                pidx[b // rp, b % rp] = a
                is2[a // rp, a % rp] = True
                is2[b // rp, b % rp] = True
    return pidx, is2


def completion_tables(instances, n: int, lanes_total: int,
                      exclude_pairs: bool = False):
    """Boundary-completion tables over COMPACT boundary space, shared by
    the pieces engines.  Measured gather cost is ~6-12 ns per ROW (not
    per byte), so the design minimizes gathered rows: boundary particles
    (>1 instance) are sorted by instance count DESCENDING, each
    completion tier j then gathers only the prefix [0:C_j) that actually
    has a j-th instance — total gathered rows = total instances, zero
    masked waste.  Interior lanes are never touched.

    exclude_pairs: leave J=2 particles out of the tiers (the
    boundary_prefix layout completes them with one partner gather
    instead — see build_pieces_schedule).

    Returns (owner_inst [n], bnd_inst [Jmax, Sb], tier_counts tuple,
    lane_bnd [lanes_total])."""
    owner_inst = np.zeros(n, np.int32)
    for p in range(n):
        owner_inst[p] = instances[p][0]
    min_j = 3 if exclude_pairs else 2
    bnd = [p for p in range(n) if len(instances[p]) >= min_j]
    bnd.sort(key=lambda p: -len(instances[p]))
    sb = len(bnd)
    jmax = max((len(instances[p]) for p in bnd), default=0)
    bnd_inst = np.zeros((max(jmax, 1), max(sb, 1)), np.int32)
    tier_counts = []
    for j in range(jmax):
        c = sum(1 for p in bnd if len(instances[p]) > j)
        tier_counts.append(c)
        for i in range(c):
            bnd_inst[j, i] = instances[bnd[i]][j]
    lane_bnd = np.full(lanes_total, -1, np.int32)
    for i, p in enumerate(bnd):
        for inst in instances[p]:
            lane_bnd[inst] = i
    return owner_inst, bnd_inst, tuple(tier_counts), lane_bnd


def build_pieces_schedule(
    mesh: TetMesh,
    density: float = 1000.0,
    tets_per_piece: int = 2048,
    pinned=None,
    boundary_prefix: bool = False,
) -> PiecesSchedule:
    _, _, vol, im, rc = rest_state(mesh, density, pinned=pinned)
    tets = mesh.tets
    n, m = mesh.num_particles, mesh.num_tets

    order = _rcm_particle_order(tets, n)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    # RCM survives as the LOCAL particle order, which keeps corner lanes
    # tile-coherent; the pieces themselves come from RCB (see rcb_partition)
    parts, n_pieces = rcb_partition(mesh, tets_per_piece)
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

    # boundary_prefix: band each piece's lanes as
    #   [0:r2)   particles shared by EXACTLY 2 pieces (the dominant case —
    #            face sharing; edge/corner particles have more instances)
    #   [r2:rb)  particles shared by >=3 pieces
    #   [rb:rp)  interior
    # Completion then becomes (a) ONE partner gather over the [*, :r2]
    # band — each J=2 lane reads its twin's numerator and adds it (f32
    # a+b is commutative, so both replicas stay bitwise equal and the
    # value equals the tier scheme's) — and (b) the tier sum + read-back
    # restricted to the (much smaller) >=3 band.  Gathered rows per
    # substep drop from 2x(all shared instances) + interior waste to
    # ~1x(J2 instances) + 2x(J>=3 instances).  Trade-offs: band padding
    # inserts hole lanes (rp can grow a tile or two), and surface tets'
    # corner-gather source-tile lists lengthen — piece-size dependent,
    # hence the flag.
    rb = rp
    r2 = 0
    if boundary_prefix:
        # hole lanes between bands stay unmapped (g2l pads to n ->
        # zero mass, no incidence; they behave like tail padding)
        loc, pos, r2, rb, rp = band_locals(
            [locals_ for _, locals_ in pieces], n
        )
        pieces = [
            (te, loc[i], pos[i]) for i, (te, _) in enumerate(pieces)
        ]
    else:
        pieces = [
            (te, locals_, np.arange(len(locals_)))
            for te, locals_ in pieces
        ]

    ids = np.zeros((4, b_pad, rt), np.int32)
    inc = np.full((kmax, b_pad, rp), -1, np.int32)
    rc12 = np.zeros((12, b_pad, rt), np.float32)
    wvol = np.zeros((b_pad, rt), np.float32)
    g2l = np.full((b_pad, rp), n, np.int32)
    tet_l2g = np.full((b_pad, rt), m, np.int32)
    tet_inst = np.zeros(m, np.int32)
    instances = [[] for _ in range(n)]  # global pid -> flat instances

    lut = np.empty(n, np.int64)
    for p, (te, locals_, lanepos) in enumerate(pieces):
        lut[locals_] = lanepos
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
        g2l[p, lanepos] = locals_
        tet_l2g[p, :mt] = te_s
        tet_inst[te_s] = p * rt + np.arange(mt)
        # vectorized bank fill (corner-instance -> local particle lane,
        # sorted; same argsort trick as mesh.build_incidence)
        seg = lt_local.reshape(-1)  # corner instance i=t*4+k -> lane
        inst_order = np.argsort(seg, kind="stable")
        counts = np.bincount(seg, minlength=rp)
        starts = np.cumsum(counts) - counts
        bank = np.arange(4 * mt, dtype=np.int64) - np.repeat(starts, counts)
        tt = inst_order // 4
        kk = inst_order % 4
        inc[bank, p, seg[inst_order]] = (kk * rt + tt).astype(np.int32)
        for i, g in zip(lanepos, locals_):
            instances[int(g)].append(p * rp + int(i))

    # Completion tables, COMPACT boundary space (shared helper; every
    # lane of a boundary particle reads the completed total back from its
    # compact boundary row; -1 marks interior/padded lanes).  Under
    # boundary_prefix, J=2 particles are excluded from the tiers: the
    # partner tables below complete them with a single banded gather.
    owner_inst, bnd_inst, tier_counts, lane_bnd = completion_tables(
        instances, n, b_pad * rp, exclude_pairs=bool(r2)
    )
    pidx, is2 = partner_tables(instances, n, b_pad, rp, r2)

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
        owner_inst=owner_inst, bnd_inst=bnd_inst,
        tier_counts=tier_counts, lane_bnd=lane_bnd,
        invden=invden, movw=movw, inv_mass=np.asarray(im, np.float32),
        pidx=pidx, is2=is2,
        num_particles=n, num_tets=m, n_pieces=n_pieces, B=b_pad,
        rp=rp, rt=rt, rb=rb, r2=r2, valence=kmax,
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


def _make_solve_kernel(rp, rt, K, gather_tiles, scatter_tiles, t_tiles,
                       extract_iters=9):
    """One polar solve over a block of 8 pieces: corner gather ->
    covariance -> extractRotation -> goal deltas -> LOCAL scatter
    inversion.  Outputs the per-piece partial numerator planes; the
    cross-piece completion and the apply/collide tail run in XLA
    (kernels/polar_fused._make_kernel is the single-mesh original)."""
    B = 8

    def kernel(
        px_ref,    # VMEM f32 [B, rp]  local corner positions (per comp:
        py_ref,    #   three separate planes — a [B,rp,3] or [3,B,rp] form
        pz_ref,    #   would cost a device relayout on every substep)
        quat_ref,  # VMEM f32 [4, B, rt]  (aliased with qout)
        ids_ref,   # VMEM i32 [4, B, rt]
        inc_ref,   # VMEM i32 [K, B, rp]
        rc_ref,    # VMEM f32 [12, B, rt]
        wvol_ref,  # VMEM f32 [B, rt]
        numx_ref,  # VMEM f32 [B, rp] out
        numy_ref,  # VMEM f32 [B, rp] out
        numz_ref,  # VMEM f32 [B, rp] out
        qout_ref,  # VMEM f32 [4, B, rt] out
    ):
        X, Y, Z = px_ref[:], py_ref[:], pz_ref[:]
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
            ix, iy, iz, iw = _extract_rotation(a, iters=extract_iters)
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
        numx_ref[:] = numx
        numy_ref[:] = numy
        numz_ref[:] = numz

    return kernel


def _solve_call(s: PiecesSchedule, t_tiles: int, interpret: bool,
                extract_iters: int = 9):
    kernel = _make_solve_kernel(
        s.rp, s.rt, s.valence, s.gather_tiles, s.scatter_tiles, t_tiles,
        extract_iters=extract_iters,
    )
    n_blk = s.B // 8

    def spec(lead, width, arg_rows=None):
        return pl.BlockSpec(
            (lead, 8, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    def plane(width):
        return pl.BlockSpec(
            (8, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        out_shape=[jax.ShapeDtypeStruct((s.B, s.rp), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((4, s.B, s.rt), jnp.float32)],
        in_specs=[
            plane(s.rp), plane(s.rp), plane(s.rp),
            spec(4, s.rt),
            spec(4, s.rt),
            spec(s.valence, s.rp),
            spec(12, s.rt),
            plane(s.rt),
        ],
        out_specs=[plane(s.rp)] * 3 + [spec(4, s.rt)],
        input_output_aliases={3: 3},  # quats updated in place
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
    rb: int = struct.field(pytree_node=False)
    r2: int = struct.field(pytree_node=False)
    valence: int = struct.field(pytree_node=False)
    t_tiles: int = struct.field(pytree_node=False)
    tier_counts: tuple = struct.field(pytree_node=False)
    gather_tiles: tuple = struct.field(pytree_node=False)
    scatter_tiles: tuple = struct.field(pytree_node=False)
    # traced kernel tables
    ids: jnp.ndarray = None
    inc: jnp.ndarray = None
    rc: jnp.ndarray = None
    wvol: jnp.ndarray = None
    # completion / conversion maps
    g2l_flat: jnp.ndarray = None      # i32 [B*rp]
    tet_l2g_flat: jnp.ndarray = None  # i32 [B*rt]
    tet_inst: jnp.ndarray = None      # i32 [M]
    owner_inst: jnp.ndarray = None    # i32 [N]
    bnd_inst: jnp.ndarray = None      # i32 [Jmax, Sb]
    lane_bnd: jnp.ndarray = None      # i32 [B*rp] (-1 interior)
    pidx: jnp.ndarray = None          # i32 [B, r2] J=2 partner flat lane
    is2: jnp.ndarray = None           # bool [B, r2]
    # LOCAL per-lane constant planes (the substep never touches global
    # arrays — minimizing gathered rows is the whole game, see build)
    invden_l: jnp.ndarray = None  # f32 [B, rp]
    movw_l: jnp.ndarray = None    # f32 [B, rp]
    pid_l: jnp.ndarray = None     # i32 [B, rp] global pid (N on padding)
    inv_mass: jnp.ndarray = None  # f32 [N] global (diagnostics/World)


def build_pieces_arrays(
    mesh: TetMesh,
    density: float = 1000.0,
    tets_per_piece: int = 2048,
    pinned=None,
    boundary_prefix: bool = False,
) -> PiecesArrays:
    s = build_pieces_schedule(
        mesh, density, tets_per_piece, pinned, boundary_prefix
    )
    im = s.inv_mass  # computed by the schedule's rest_state pass already
    n = s.num_particles
    invden_pad = np.concatenate([s.invden, np.zeros(1, np.float32)])
    movw_pad = np.concatenate([s.movw, np.zeros(1, np.float32)])
    return PiecesArrays(
        num_particles=n,
        num_tets=s.num_tets,
        B=s.B, rp=s.rp, rt=s.rt, rb=s.rb, r2=s.r2, valence=s.valence,
        t_tiles=max(1, min(4, s.rt // 128)),
        tier_counts=s.tier_counts,
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
        bnd_inst=jnp.asarray(s.bnd_inst),
        lane_bnd=jnp.asarray(s.lane_bnd),
        pidx=jnp.asarray(s.pidx),
        is2=jnp.asarray(s.is2),
        invden_l=jnp.asarray(invden_pad[s.g2l]),
        movw_l=jnp.asarray(movw_pad[s.g2l]),
        pid_l=jnp.asarray(s.g2l),
        inv_mass=jnp.asarray(im),
    )


# ---------------------------------------------------------------------------
# Local-primary stepping: state LIVES in piece planes across substeps
# ---------------------------------------------------------------------------
#
# Per substep the only non-elementwise work is (a) the fused solve kernel
# and (b) boundary completion over COMPACT tiers: gathered rows = exactly
# the number of cross-piece instances (~2% x J of lanes), plus one
# full-lane read-back.  Duplicated lanes (same particle in >1 piece)
# receive identical elementwise updates, so they stay bitwise consistent;
# only the solve numerator needs the cross-piece sum.


def _substep_local(carry, arr: PiecesArrays, params, dt, controls, call):
    lx, ly, lz, vx, vy, vz, q = carry
    movable = arr.movw_l > 0.0

    # predict (common.predict semantics)
    vy = vy + params.gravity * dt
    vx = jnp.where(movable, vx, 0.0)
    vy = jnp.where(movable, vy, 0.0)
    vz = jnp.where(movable, vz, 0.0)
    plx, ply, plz = lx, ly, lz
    lx, ly, lz = lx + vx * dt, ly + vy * dt, lz + vz * dt

    numx, numy, numz, q = call(
        lx, ly, lz, q, arr.ids, arr.inc, arr.rc, arr.wvol
    )

    # boundary completion: sum each shared particle's instances over the
    # prefix tiers (rows sorted by instance count, no masked waste), then
    # every shared lane reads its completed total back.  All gathers run
    # on [*,3]-wide rows: measured 4.05 ns/row vs 7.14 for single-f32
    # rows — 5x cheaper per element (see BENCHNOTES round 3).
    sb = arr.bnd_inst.shape[1]
    has_tiers = bool(sb and arr.tier_counts)
    if has_tiers or arr.r2:
        numf3 = jnp.stack(
            [numx.reshape(-1), numy.reshape(-1), numz.reshape(-1)], axis=-1
        )
    if arr.r2:
        # J=2 band: one partner gather completes the dominant sharing
        # case (f32 a+b is commutative -> both replicas bitwise equal,
        # and equal to the tier scheme's inst0+inst1)
        back2 = numf3[arr.pidx]  # [B, r2, 3]
        numx = numx.at[:, : arr.r2].set(
            jnp.where(arr.is2, numx[:, : arr.r2] + back2[..., 0],
                      numx[:, : arr.r2])
        )
        numy = numy.at[:, : arr.r2].set(
            jnp.where(arr.is2, numy[:, : arr.r2] + back2[..., 1],
                      numy[:, : arr.r2])
        )
        numz = numz.at[:, : arr.r2].set(
            jnp.where(arr.is2, numz[:, : arr.r2] + back2[..., 2],
                      numz[:, : arr.r2])
        )
    if has_tiers:
        tot = numf3[arr.bnd_inst[0]]  # [Sb, 3]
        for j, c in enumerate(arr.tier_counts[1:], start=1):
            tot = tot.at[:c].add(numf3[arr.bnd_inst[j, :c]])
        lbm = arr.lane_bnd.reshape(arr.B, arr.rp)
        if arr.r2 or arr.rb < arr.rp:
            # banded layout: lanes needing the tier read-back live only
            # in [r2:rb) — interior/J2 rows were pure waste
            lb = lbm[:, arr.r2 : arr.rb]
            shared = lb >= 0
            back = tot[jnp.maximum(lb, 0)]  # [B, rb-r2, 3]
            numx = numx.at[:, arr.r2 : arr.rb].set(
                jnp.where(shared, back[..., 0], numx[:, arr.r2 : arr.rb])
            )
            numy = numy.at[:, arr.r2 : arr.rb].set(
                jnp.where(shared, back[..., 1], numy[:, arr.r2 : arr.rb])
            )
            numz = numz.at[:, arr.r2 : arr.rb].set(
                jnp.where(shared, back[..., 2], numz[:, arr.r2 : arr.rb])
            )
        else:
            shared = lbm >= 0
            back = tot[jnp.maximum(arr.lane_bnd, 0)]  # [B*rp, 3]
            numx = jnp.where(
                shared, back[:, 0].reshape(arr.B, arr.rp), numx
            )
            numy = jnp.where(
                shared, back[:, 1].reshape(arr.B, arr.rp), numy
            )
            numz = jnp.where(
                shared, back[:, 2].reshape(arr.B, arr.rp), numz
            )

    lx = jnp.where(movable, lx + numx * arr.invden_l, lx)
    ly = jnp.where(movable, ly + numy * arr.invden_l, ly)
    lz = jnp.where(movable, lz + numz * arr.invden_l, lz)

    # collide (common.collide semantics) — elementwise, duplicate-safe
    lx = jnp.clip(lx, params.world_min[0], params.world_max[0])
    ly = jnp.clip(ly, params.world_min[1], params.world_max[1])
    lz = jnp.clip(lz, params.world_min[2], params.world_max[2])
    below = ly < 0.0
    ly = jnp.where(below, 0.0, ly)
    k = jnp.minimum(1.0, dt * params.friction)
    lx = lx + jnp.where(below, (plx - lx) * k, 0.0)
    lz = lz + jnp.where(below, (plz - lz) * k, 0.0)

    # grab overrides (common.norm_grabs: G slots on global pid; every
    # duplicated lane of a grabbed particle pins, keeping replicas equal)
    gid, gpos = norm_grabs(controls)
    for g in range(gid.shape[0]):
        hit = arr.pid_l == gid[g]
        lx = jnp.where(hit, gpos[g, 0], lx)
        ly = jnp.where(hit, gpos[g, 1], ly)
        lz = jnp.where(hit, gpos[g, 2], lz)

    vx, vy, vz = (lx - plx) / dt, (ly - ply) / dt, (lz - plz) / dt
    return (lx, ly, lz, vx, vy, vz, q), (plx, ply, plz)


def _quats_to_pieces(quats, arr: PiecesArrays):
    qpad = jnp.concatenate(
        [quats, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], quats.dtype)]
    )
    q = qpad[arr.tet_l2g_flat].reshape(arr.B, arr.rt, 4)
    return jnp.moveaxis(q, -1, 0)  # [4, B, rt]


def _quats_from_pieces(q, arr: PiecesArrays):
    flat = jnp.moveaxis(q, 0, -1).reshape(arr.B * arr.rt, 4)
    return flat[arr.tet_inst]


def make_pieces_stepper(arr: PiecesArrays, interpret: bool | None = None):
    """(pack, step, unpack, unpack_pos) over packed piece-plane state —
    the sustained form (state converts to SimState only at I/O
    boundaries, exactly like kernels/polar_stencil.make_frame_stepper)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _call_for(params: PhysicsParams):
        # re-resolved per step for the static extract_iters (lru-cached —
        # repeat steps are a dict hit, matching polar_stencil's pattern)
        return _solve_call_cached(
            arr.B, arr.rp, arr.rt, arr.valence,
            arr.gather_tiles, arr.scatter_tiles, arr.t_tiles,
            bool(interpret), params.extract_iters,
        )

    def to_local(comp):
        padded = jnp.concatenate([comp, jnp.zeros((1,), comp.dtype)])
        return padded[arr.g2l_flat].reshape(arr.B, arr.rp)

    def pack(state: SimState, params: PhysicsParams):
        del params
        pos, vel = state.pos, state.vel
        return (
            to_local(pos[:, 0]), to_local(pos[:, 1]), to_local(pos[:, 2]),
            to_local(vel[:, 0]), to_local(vel[:, 1]), to_local(vel[:, 2]),
            _quats_to_pieces(state.quats, arr),
        )

    def step(packed, params: PhysicsParams, controls: Controls):
        dt = params.dt
        call = _call_for(params)

        def body(carry, _):
            carry, _prev = _substep_local(
                carry, arr, params, dt, controls, call
            )
            return carry, None

        packed, _ = jax.lax.scan(
            body, packed, None, length=params.num_substeps
        )
        return packed

    def unpack_pos(packed):
        lx, ly, lz = packed[0], packed[1], packed[2]
        own = arr.owner_inst
        return jnp.stack(
            [lx.reshape(-1)[own], ly.reshape(-1)[own], lz.reshape(-1)[own]],
            axis=-1,
        )

    def unpack(packed, params: PhysicsParams) -> SimState:
        lx, ly, lz, vx, vy, vz, q = packed
        own = arr.owner_inst
        pos = unpack_pos(packed)
        vel = jnp.stack(
            [vx.reshape(-1)[own], vy.reshape(-1)[own], vz.reshape(-1)[own]],
            axis=-1,
        )
        return SimState(
            pos=pos,
            prev_pos=pos - vel * params.dt,
            vel=vel,
            quats=_quats_from_pieces(q, arr),
        )

    return pack, step, unpack, unpack_pos


def step_frame(
    state: SimState,
    arr: PiecesArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
    interpret: bool | None = None,
):
    """One frame = num_substeps piecewise-fused substeps (engine API;
    converts SimState <-> piece planes at the frame boundary)."""
    del axis_name
    pack, step, unpack, _ = make_pieces_stepper(arr, interpret)
    packed = step(pack(state, params), params, controls)
    # per-substep solver vol_err not computed (cost); NaN, not a fake 0
    return unpack(packed, params), jnp.full(
        (params.num_substeps,), jnp.nan, jnp.float32
    )


def substep(state, arr, params, dt, controls, axis_name=None,
            interpret: bool | None = None):
    """Single-substep entry matching the engine API (used by tests)."""
    del axis_name, dt
    one = params.replace(num_substeps=1)
    new, diags = step_frame(state, arr, one, controls, interpret=interpret)
    return new, diags[0]


@functools.lru_cache(maxsize=None)
def _solve_call_cached(B, rp, rt, valence, gather_tiles, scatter_tiles,
                       t_tiles, interpret, extract_iters=9):
    """Cache the pallas_call by STATIC geometry only (no jnp arrays — an
    lru_cache keyed on traced values would leak tracers, CLAUDE.md)."""
    sched = _CallGeom(B, rp, rt, valence, gather_tiles, scatter_tiles)
    return _solve_call(sched, t_tiles, interpret, extract_iters)


@dataclasses.dataclass(frozen=True)
class _CallGeom:
    B: int
    rp: int
    rt: int
    valence: int
    gather_tiles: tuple
    scatter_tiles: tuple
