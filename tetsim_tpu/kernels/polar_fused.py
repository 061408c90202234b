"""Fused VMEM-resident polar shape-matching frame kernel (Pallas TPU).

The unstructured-mesh counterpart of kernels/polar_stencil.py and the
direct device-kernel form of the reference's GPU solver: its 7 fragment
passes per substep (SoftbodyGPU.js:59-376 — integrate, solveElem,
gatherElem, applyElem, collision, velocity) run here as ONE Pallas kernel
per FRAME with the whole state resident in VMEM.  Where the reference paid
seven HBM round trips per substep (texture ping-pong), this kernel touches
HBM twice per body block per frame.

Layout follows kernels/gs_fused.py:
  * bodies -> sublanes (B bodies of one mesh step simultaneously),
  * particles -> Rp lanes, tets -> Rt lanes (each 128-padded),
  * xyz and quaternion components -> separate [B, *] planes.

The two indirections of the algorithm are both lane gathers:
  * corner gather  — 4 index rows tet-lane <- particle-lane (tets sorted by
    first corner so each output lane-tile draws from few source tiles),
  * particle scatter — inverted into K gather "banks" (K = max valence; the
    dragon's 32 — exactly the reference's 9x4-channel scatter-table bound,
    SoftbodyGPU.js:29-37), each bank a row particle-lane <- corner-slot with
    -1 for absent entries.

Math is solvers/polar.py (= Mueller extractRotation + volume-weighted
Jacobi averaging, SoftbodyGPU.js:80-323) on component planes; trajectories
match the XLA polar engine to f32 accumulation-order tolerance.
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

from ..params import PhysicsParams
from ..mesh import TetMesh, rest_state
from ..solvers.polar_grid import _extract_rotation, _qmul
from .schedule import vmem_budget_bytes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


from .schedule import ta_tiled as _ta_tiled  # shared lane-gather helper


# ---------------------------------------------------------------------------
# Host-side schedule
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PolarSchedule:
    """Numpy tables consumed by the fused polar kernel."""

    ids: np.ndarray  # i32 [4, 8, Rt]   corner k of tet lane -> particle lane
    inc: np.ndarray  # i32 [K, 8, Rp]   bank v: particle -> corner slot or -1
    rc: np.ndarray  # f32 [12, Rt]      rest_centered, row k*3+r
    wvol: np.ndarray  # f32 [1, Rt]     rest volume (0 on padded tet lanes)
    movw: np.ndarray  # f32 [1, Rp]     movable mask (inv_mass > 0)
    invden: np.ndarray  # f32 [1, Rp]   1 / max(sum incident volumes, eps)
    perm: np.ndarray  # i32 [M]         sorted-tet order (quats permutation)
    num_particles: int
    num_tets: int
    rp: int  # particle lanes (128-padded)
    rt: int  # tet lanes (128-padded)
    valence: int  # K
    gather_tiles: tuple  # [4][Rt/128] of tuple[int]
    scatter_tiles: tuple  # [K][Rp/128] of tuple[int]
    verts: np.ndarray  # f32 [N, 3] rest positions (state init)


def build_polar_schedule(
    mesh: TetMesh, density: float = 1000.0, pinned=None
) -> PolarSchedule:
    _, _, vol, im, rc = rest_state(mesh, density, pinned=pinned)
    tets = mesh.tets
    n, m = mesh.num_particles, mesh.num_tets
    rp, rt = _round_up(n, 128), _round_up(m, 128)

    # sort tets by first corner: within an output lane-tile the corner
    # gathers then reference few source tiles (same move as schedule.py)
    perm = np.argsort(tets[:, 0], kind="stable").astype(np.int32)
    tets_s = tets[perm]
    rc_s = rc[perm]
    vol_s = vol[perm]

    ids4 = np.zeros((4, rt), np.int32)
    ids4[:, :m] = tets_s.T
    rc12 = np.zeros((12, rt), np.float32)
    for k in range(4):
        for r in range(3):
            rc12[k * 3 + r, :m] = rc_s[:, k, r]
    wvol = np.zeros((1, rt), np.float32)
    wvol[0, :m] = vol_s

    # scatter inversion: particle -> incident corner slots (slot = k*Rt + t,
    # corner-major to match the kernel's concatenated delta planes)
    counts = np.bincount(tets_s.reshape(-1), minlength=n)
    kmax = int(counts.max()) if m else 0
    inc = np.full((kmax, rp), -1, np.int32)
    fill = np.zeros(n, np.int64)
    for t in range(m):  # tet-major bank order (matches build_incidence)
        for k in range(4):
            p = tets_s[t, k]
            inc[fill[p], p] = k * rt + t
            fill[p] += 1
    den = np.zeros(n, np.float64)
    np.add.at(den, tets_s.reshape(-1), np.repeat(vol_s.astype(np.float64), 4))
    invden = np.zeros((1, rp), np.float32)
    invden[0, :n] = 1.0 / np.maximum(den.astype(np.float32), 1e-9)
    movw = np.zeros((1, rp), np.float32)
    movw[0, :n] = (im > 0.0).astype(np.float32)

    def tile_lists(table):
        out = []
        for row in table:
            vals = np.maximum(row, 0)
            tiles = []
            for o in range(len(row) // 128):
                src = np.unique(vals[o * 128 : (o + 1) * 128] // 128)
                tiles.append(tuple(int(x) for x in src))
            out.append(tuple(tiles))
        return tuple(out)

    return PolarSchedule(
        ids=np.repeat(ids4[:, None, :], 8, axis=1),
        inc=np.repeat(inc[:, None, :], 8, axis=1),
        rc=rc12,
        wvol=wvol,
        movw=movw,
        invden=invden,
        perm=perm,
        num_particles=n,
        num_tets=m,
        rp=rp,
        rt=rt,
        valence=kmax,
        gather_tiles=tile_lists(ids4),
        scatter_tiles=tile_lists(inc),
        verts=mesh.verts.astype(np.float32),
    )


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _qrot_table(i, rc_ref, qx, qy, qz, qw, sl=slice(None)):
    """Rotate the per-tet rest vector (rc rows 3i..3i+2, lanes ``sl``) by the
    quaternion planes ([B,chunk]): v + 2*u x (u x v + w*v), broadcast over B."""
    vx = rc_ref[3 * i : 3 * i + 1, sl]
    vy = rc_ref[3 * i + 1 : 3 * i + 2, sl]
    vz = rc_ref[3 * i + 2 : 3 * i + 3, sl]
    tx = qy * vz - qz * vy + qw * vx
    ty = qz * vx - qx * vz + qw * vy
    tz = qx * vy - qy * vx + qw * vz
    rx = qy * tz - qz * ty
    ry = qz * tx - qx * tz
    rz = qx * ty - qy * tx
    return vx + 2.0 * rx, vy + 2.0 * ry, vz + 2.0 * rz


def _make_kernel(num_substeps, rp, rt, K, B, gather_tiles, scatter_tiles,
                 t_tiles, extract_iters=9):
    """``t_tiles``: tet-lane CHUNK width in 128-lane tiles.  The solve phase
    (gather -> covariance -> extractRotation -> goal deltas) runs chunk by
    chunk so its temporaries — the dominant VMEM stack cost, ~70 live
    f32/tet-lane — scale with the chunk, not with Rt (Mosaic's stack
    allocator reuses the space across chunks)."""
    def kernel(
        par_ref,  # SMEM f32 [1, 12]
        gid_ref,  # VMEM i32 [B, 1]
        gpos_ref,  # VMEM f32 [B, 4]
        state_ref,  # VMEM f32 [9, B, Rp] (aliased with out)
        quat_ref,  # VMEM f32 [4, B, Rt] (aliased with qout)
        ids_ref,  # VMEM i32 [4, 8, Rt]
        inc_ref,  # VMEM i32 [K, 8, Rp]
        rc_ref,  # VMEM f32 [12, Rt]
        wvol_ref,  # VMEM f32 [1, Rt]
        movw_ref,  # VMEM f32 [1, Rp]
        invden_ref,  # VMEM f32 [1, Rp]
        out_ref,  # VMEM f32 [9, B, Rp]
        qout_ref,  # VMEM f32 [4, B, Rt]
    ):
        dt = par_ref[0, 0]
        gravity = par_ref[0, 1]
        friction = par_ref[0, 2]
        wmin = [par_ref[0, 3], par_ref[0, 4], par_ref[0, 5]]
        wmax = [par_ref[0, 6], par_ref[0, 7], par_ref[0, 8]]

        for k in range(9):
            out_ref[k] = state_ref[k]
        for k in range(4):
            qout_ref[k] = quat_ref[k]

        lane = jax.lax.broadcasted_iota(jnp.int32, (B, rp), 1)
        grab_hit = lane == gid_ref[:, 0:1]
        mov = movw_ref[0:1, :]
        invden = invden_ref[0:1, :]
        n_chunks = -(-(rt // 128) // t_tiles)

        def rep_rows(row8):
            if B == 8:
                return row8
            return jnp.concatenate([row8] * (B // 8), axis=0)

        def substep(_, carry):
            X, Y, Z = out_ref[0], out_ref[1], out_ref[2]
            VX, VY, VZ = out_ref[6], out_ref[7], out_ref[8]

            # predict (common.predict: gravity into vel, pinned gate)
            VY = VY + gravity * dt
            VX, VY, VZ = VX * mov, VY * mov, VZ * mov
            PX, PY, PZ = X, Y, Z
            X, Y, Z = X + VX * dt, Y + VY * dt, Z + VZ * dt

            # solve, one tet-lane chunk at a time
            dx = [[] for _ in range(4)]
            dy = [[] for _ in range(4)]
            dz = [[] for _ in range(4)]
            for ci in range(n_chunks):
                t0 = ci * t_tiles
                t1 = min(t0 + t_tiles, rt // 128)
                c0, c1 = t0 * 128, t1 * 128
                sl = slice(c0, c1)
                wv = wvol_ref[0:1, sl]

                # corner gather (solveElemPass, SoftbodyGPU.js:142-158)
                cx, cy, cz = [], [], []
                for k in range(4):
                    idx = rep_rows(ids_ref[k, :, sl])
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
                rr = [
                    _qrot_table(k, rc_ref, qx, qy, qz, qw, sl)
                    for k in range(4)
                ]
                cur = (pcx, pcy, pcz)
                a = [
                    [
                        sum(cur[r][k] * rr[k][c] for k in range(4))
                        for c in range(3)
                    ]
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

                # goal deltas for this chunk (gatherElemPass analogue)
                for k in range(4):
                    gx_, gy_, gz_ = _qrot_table(k, rc_ref, qx, qy, qz, qw, sl)
                    dx[k].append((gx_ - pcx[k]) * wv)
                    dy[k].append((gy_ - pcy[k]) * wv)
                    dz[k].append((gz_ - pcz[k]) * wv)

            # corner-major [B, 4*Rt] delta planes
            dxf = jnp.concatenate([d for k in range(4) for d in dx[k]], axis=1)
            dyf = jnp.concatenate([d for k in range(4) for d in dy[k]], axis=1)
            dzf = jnp.concatenate([d for k in range(4) for d in dz[k]], axis=1)

            # scatter-as-gather over K valence banks (applyElemPass,
            # SoftbodyGPU.js:302-320 — its 9x4-channel table scan)
            numx = jnp.zeros((B, rp), jnp.float32)
            numy = jnp.zeros((B, rp), jnp.float32)
            numz = jnp.zeros((B, rp), jnp.float32)
            for v in range(K):
                invv = rep_rows(inc_ref[v])
                live = invv >= 0
                idx = jnp.maximum(invv, 0)
                st = scatter_tiles[v]
                numx = numx + jnp.where(live, _ta_tiled(dxf, idx, st), 0.0)
                numy = numy + jnp.where(live, _ta_tiled(dyf, idx, st), 0.0)
                numz = numz + jnp.where(live, _ta_tiled(dzf, idx, st), 0.0)
            movable = mov > 0.0
            X = jnp.where(movable, X + numx * invden, X)
            Y = jnp.where(movable, Y + numy * invden, Y)
            Z = jnp.where(movable, Z + numz * invden, Z)

            # collide: world bounds + ground friction (Softbody.js:213-231)
            X = jnp.clip(X, wmin[0], wmax[0])
            Y = jnp.clip(Y, wmin[1], wmax[1])
            Z = jnp.clip(Z, wmin[2], wmax[2])
            below = Y < 0.0
            Y = jnp.where(below, 0.0, Y)
            k = jnp.minimum(1.0, dt * friction)
            X = X + jnp.where(below, (PX - X) * k, 0.0)
            Z = Z + jnp.where(below, (PZ - Z) * k, 0.0)

            # grab override + velocity update
            X = jnp.where(grab_hit, gpos_ref[:, 0:1], X)
            Y = jnp.where(grab_hit, gpos_ref[:, 1:2], Y)
            Z = jnp.where(grab_hit, gpos_ref[:, 2:3], Z)
            inv_dt = 1.0 / dt
            out_ref[0], out_ref[1], out_ref[2] = X, Y, Z
            out_ref[3], out_ref[4], out_ref[5] = PX, PY, PZ
            out_ref[6] = (X - PX) * inv_dt
            out_ref[7] = (Y - PY) * inv_dt
            out_ref[8] = (Z - PZ) * inv_dt
            return carry

        jax.lax.fori_loop(0, num_substeps, substep, 0)

    return kernel


def _pallas_step_call(s, B, b, t_tiles, vmem_limit, num_substeps, interpret,
                      extract_iters=9):
    """Build the frame pallas_call for a batch of B bodies in b-body blocks.

    Shared by the single-device step and the shard_map'd data-parallel
    path (each device invokes this with its LOCAL body count)."""
    kernel = _make_kernel(
        num_substeps, s.rp, s.rt, s.valence, b,
        s.gather_tiles, s.scatter_tiles, t_tiles,
        extract_iters=extract_iters,
    )
    n_blk = B // b

    def stat(*shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        out_shape=[
            jax.ShapeDtypeStruct((9, B, s.rp), jnp.float32),
            jax.ShapeDtypeStruct((4, B, s.rt), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (9, b, s.rp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, b, s.rt), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            stat(4, 8, s.rt),
            stat(s.valence, 8, s.rp),
            stat(12, s.rt),
            stat(1, s.rt),
            stat(1, s.rp),
            stat(1, s.rp),
        ],
        out_specs=[
            pl.BlockSpec(
                (9, b, s.rp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, b, s.rt), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Batched-body API (mirrors kernels/gs_fused.FusedGSBody)
# ---------------------------------------------------------------------------


class FusedPolarBody:
    """Batched-body stepping through the fused polar kernel.

    Holds device-side SoA state [9, B, Rp] + quats [4, B, Rt] for B bodies
    of one mesh; API mirrors FusedGSBody (step/positions/grab)."""

    def __init__(
        self,
        mesh: TetMesh,
        num_bodies: int = 8,
        density: float = 1000.0,
        schedule: Optional[PolarSchedule] = None,
        interpret: bool | None = None,
        jitter: float = 0.0,
        seed: int = 0,
        pinned=None,
    ):
        self.mesh = mesh
        self.sched = schedule or build_polar_schedule(mesh, density, pinned)
        s = self.sched
        # VMEM sizing.  Mosaic allocates every unrolled dynamic_gather
        # RESULT on the scoped stack without cross-statement reuse (measured:
        # scoped size grows linearly when the scatter loop is repeated), so
        # the dominant cost is the total gather count x block bytes.  The
        # default 16 MB scoped limit is a soft cap — v5e has 128 MB physical
        # VMEM and raising vmem_limit_bytes to 100 MB compiles and runs —
        # so the budget below is 96 MB.
        self.t_tiles = max(1, min(4, s.rt // 128))
        n_gathers = 3 * (
            sum(len(t) for row in s.scatter_tiles for t in row)
            + sum(len(t) for row in s.gather_tiles for t in row)
        )
        tables = 4 * (4 * 8 * s.rt + s.valence * 8 * s.rp + 13 * s.rt + 2 * s.rp)

        def est(b):
            return tables + 4 * b * (
                128 * n_gathers + s.rp * 50 + s.rt * 30
            )

        b_pad = (num_bodies + 7) // 8 * 8
        budget, self._vmem_limit = vmem_budget_bytes()
        feasible = [blk for blk in (8, 16, 32) if est(blk) <= budget]
        if not feasible:
            raise ValueError(
                f"fused polar kernel VMEM estimate {est(8)/1e6:.1f} MB "
                f"exceeds the {budget/1e6:.0f} MB budget (derived from the "
                "local device kind; see kernels.schedule.vmem_budget_bytes) "
                f"at an 8-body block (Rp={s.rp}, Rt={s.rt}, "
                f"valence={s.valence}) — use the XLA polar engine or "
                "polar_grid for this mesh"
            )
        self.B_blk = min(
            (min(blk, b_pad) for blk in feasible),
            key=lambda blk: ((b_pad + blk - 1) // blk * blk, -blk),
        )
        self.B = (num_bodies + self.B_blk - 1) // self.B_blk * self.B_blk
        self.num_bodies = num_bodies
        # None -> auto: Pallas interpret mode off-TPU so the World-level
        # API works on any backend (same policy as kernels/polar_stencil)
        if interpret is None:
            import jax as _jax

            interpret = _jax.default_backend() != "tpu"
        self.interpret = interpret
        self._shard_cfg = None
        self._sharded_cache = {}
        self._ids = jnp.asarray(s.ids)
        self._inc = jnp.asarray(s.inc)
        self._rc = jnp.asarray(s.rc)
        self._wvol = jnp.asarray(s.wvol)
        self._movw = jnp.asarray(s.movw)
        self._invden = jnp.asarray(s.invden)
        offsets = None
        if jitter:
            rng = np.random.RandomState(seed)
            offsets = rng.uniform(-jitter, jitter, (self.B, 3)).astype(np.float32)
            offsets[:, 1] = np.abs(offsets[:, 1])
        self.state = self._init_state(offsets)
        self.quats = self._init_quats()
        self.grab_id = jnp.full((self.B, 1), -1, jnp.int32)
        self.grab_pos = jnp.zeros((self.B, 4), jnp.float32)

    def _init_state(self, offsets=None):
        s = self.sched
        st = np.zeros((9, self.B, s.rp), np.float32)
        for r in range(3):
            st[r, :, : s.num_particles] = s.verts[:, r]
            st[3 + r, :, : s.num_particles] = s.verts[:, r]
        if offsets is not None:
            for r in range(3):
                st[r, :, : s.num_particles] += offsets[: self.B, r : r + 1]
                st[3 + r, :, : s.num_particles] += offsets[: self.B, r : r + 1]
        return jnp.asarray(st)

    def _init_quats(self):
        q = np.zeros((4, self.B, self.sched.rt), np.float32)
        q[3] = 1.0  # identity (xyzw)
        return jnp.asarray(q)

    def _params_vec(self, params: PhysicsParams):
        dt = params.dt
        return jnp.stack(
            [
                dt, params.gravity, params.friction,
                params.world_min[0], params.world_min[1], params.world_min[2],
                params.world_max[0], params.world_max[1], params.world_max[2],
                jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
            ]
        ).reshape(1, 12).astype(jnp.float32)

    @functools.partial(
        jax.jit,
        static_argnames=("self", "num_substeps", "interpret", "extract_iters"),
    )
    def _step(self, state, quats, par, gid, gpos, num_substeps, interpret,
              extract_iters=9):
        return _pallas_step_call(
            self.sched, self.B, self.B_blk, self.t_tiles,
            self._vmem_limit, num_substeps, interpret,
            extract_iters=extract_iters,
        )(
            par, gid, gpos, state, quats,
            self._ids, self._inc, self._rc, self._wvol,
            self._movw, self._invden,
        )

    def step(self, params: PhysicsParams, frames: int = 1):
        par = self._params_vec(params)
        step = (
            self._sharded_step(params.num_substeps, params.extract_iters)
            if self._shard_cfg is not None
            else functools.partial(
                self._step,
                num_substeps=params.num_substeps, interpret=self.interpret,
                extract_iters=params.extract_iters,
            )
        )
        for _ in range(frames):
            self.state, self.quats = step(
                self.state, self.quats, par, self.grab_id, self.grab_pos
            )
        return self.state

    # -- multi-chip: data-parallel body sharding ------------------------------
    def shard(self, mesh, axis="body"):
        """Distribute the body batch over ``mesh``'s ``axis`` (name or tuple
        of names) — pure data parallelism, zero collectives: bodies are
        independent, so each device runs the SAME fused kernel on its own
        block of bodies (SURVEY.md §2.5 multi-body x multi-chip; the
        reference's physicsScene.softBodies list scaled across chips).
        Tables are replicated; state/controls are sharded on the body axis.
        Subsequent step() calls run under shard_map."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .schedule import body_shard_config

        names, b_loc, blk = body_shard_config(mesh, axis, self.B, self.B_blk)
        self._shard_cfg = (mesh, names, b_loc, blk)
        self._sharded_cache = {}
        body_sp = NamedSharding(mesh, P(None, names))
        ctrl_sp = NamedSharding(mesh, P(names))
        rep = NamedSharding(mesh, P())
        self.state = jax.device_put(self.state, body_sp)
        self.quats = jax.device_put(self.quats, body_sp)
        self.grab_id = jax.device_put(self.grab_id, ctrl_sp)
        self.grab_pos = jax.device_put(self.grab_pos, ctrl_sp)
        for t in ("_ids", "_inc", "_rc", "_wvol", "_movw", "_invden"):
            setattr(self, t, jax.device_put(getattr(self, t), rep))
        return self

    def _sharded_step(self, num_substeps: int, extract_iters: int = 9):
        key = (num_substeps, extract_iters)
        if key in self._sharded_cache:
            return self._sharded_cache[key]
        mesh, names, b_loc, blk = self._shard_cfg
        call = _pallas_step_call(
            self.sched, b_loc, blk, self.t_tiles,
            self._vmem_limit, num_substeps, self.interpret,
            extract_iters=extract_iters,
        )

        from .schedule import make_body_sharded_step

        inner = make_body_sharded_step(mesh, names, call, n_state=2,
                                       n_tables=6)
        tables = (self._ids, self._inc, self._rc, self._wvol,
                  self._movw, self._invden)

        def step(state, quats, par, gid, gpos):
            return inner(par, gid, gpos, state, quats, *tables)

        self._sharded_cache[key] = step
        return step

    # -- views ----------------------------------------------------------------
    def positions(self) -> np.ndarray:
        n = self.sched.num_particles
        st = np.asarray(self.state)
        return np.stack([st[0, : self.num_bodies, :n],
                         st[1, : self.num_bodies, :n],
                         st[2, : self.num_bodies, :n]], axis=-1)

    def velocities(self) -> np.ndarray:
        n = self.sched.num_particles
        st = np.asarray(self.state)
        return np.stack([st[6, : self.num_bodies, :n],
                         st[7, : self.num_bodies, :n],
                         st[8, : self.num_bodies, :n]], axis=-1)

    def quaternions(self) -> np.ndarray:
        """[num_bodies, M, 4] per-tet quats in ORIGINAL tet order."""
        s = self.sched
        q = np.asarray(self.quats)[:, : self.num_bodies, : s.num_tets]
        q = np.moveaxis(q, 0, -1)  # [B, M_sorted, 4]
        out = np.empty_like(q)
        out[:, s.perm] = q
        return out

    # -- interaction -----------------------------------------------------------
    def _check_body(self, body: int):
        if not 0 <= body < self.num_bodies:
            raise IndexError(
                f"body index {body} out of range (batch has {self.num_bodies})"
            )

    def set_grab(self, body: int, particle: int, point):
        self._check_body(body)
        self.grab_id = self.grab_id.at[body, 0].set(particle)
        self.grab_pos = self.grab_pos.at[body, :3].set(
            jnp.asarray(point, jnp.float32)
        )

    def start_grab(self, body: int, point) -> int:
        self._check_body(body)
        pos = self.positions()[body]
        pid = int(np.argmin(np.sum((pos - np.asarray(point)) ** 2, axis=-1)))
        self.set_grab(body, pid, point)
        return pid

    def move_grabbed(self, body: int, point):
        self._check_body(body)
        self.grab_pos = self.grab_pos.at[body, :3].set(
            jnp.asarray(point, jnp.float32)
        )

    def end_grab(self, body: int):
        self._check_body(body)
        self.grab_id = self.grab_id.at[body, 0].set(-1)
