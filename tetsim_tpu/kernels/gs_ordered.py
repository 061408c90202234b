"""Exact-order (reference-trajectory) Gauss-Seidel as ONE fused TPU kernel.

BASELINE config 1 asks for Neo-Hookean GS "numerically matching the CPU
reference".  The exact match requires the ordered level schedule — for the
dragon, 703 sequential dependency levels (the longest-path minimum; see
BASELINE.md "Config 1") that the XLA engine walks at ~148 substeps/s (one
dispatch chain per level).  This kernel walks the SAME schedule in-kernel,
so a level costs a handful of VMEM lane-gathers instead of an XLA
dispatch:

  * levels are grouped into **windows**: consecutive levels whose particle
    union fits W lanes (dragon: 4 windows of <=384 particles).  Per window
    the kernel refills a W-lane VMEM working set from the full state, runs
    a ``fori_loop`` over that window's levels (per-level index rows sliced
    DYNAMICALLY from streamed tables — nothing is unrolled, so compile
    time stays flat at 703 levels), and writes the union back;
  * within a level the corner gather, the solve (identical math to
    kernels/gs_fused._solve_level = Softbody.js:91-193), and the
    vertex-disjoint inverse scatter all act on one 128-lane corner block;
  * the Pallas grid is (substeps, windows): predict runs at window 0,
    collide/grab/velocity at the last window, state planes stay VMEM
    resident across the whole frame (gs_fused's layout: bodies ->
    sublanes, particles -> lanes, xyz -> separate planes).

Exactness: windows preserve level order; levels within a window preserve
it via the fori; wide levels chunk into <=32-tet sub-levels (order within
a level is irrelevant — vertex-disjoint).  The trajectory therefore equals
the sequential reference's to f32 rounding, like the XLA ordered engine.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh import TetMesh, level_schedule, rest_state
from ..params import PhysicsParams
from .gs_fused import _solve_level
from .schedule import ta_tiled as _ta_tiled, vmem_budget_bytes

_CW = 32  # tets per sub-level (4 corners x 32 = one 128-lane block)


# ---------------------------------------------------------------------------
# Host schedule
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OrderedSchedule:
    uidx: np.ndarray   # i32 [NW, 8, W]        window refill: X lane per slot
    xinv: np.ndarray   # i32 [NW, 8, R]        write-back: W slot or -1
    lids: np.ndarray   # i32 [NW, Lm, 8, 128]  corner slot -> W lane
    winv: np.ndarray   # i32 [NW, Lm, 8, W]    W lane -> corner slot or -1
    cons: np.ndarray   # f32 [NW, Lm, 14, 32]  rows 0-8 irp, 9 irv, 10-13 imc
    movw: np.ndarray   # f32 [8, R]            movable mask
    nlev: np.ndarray   # i32 [1, NW]           live levels per window (dynamic
                       #                        fori bound: padding not executed)
    num_windows: int
    l_max: int
    w_lanes: int
    rows: int          # R (128-padded particle lanes)
    num_particles: int
    num_tets: int
    num_levels: int
    verts: np.ndarray


def build_ordered_schedule(
    mesh: TetMesh,
    density: float = 1000.0,
    pinned=None,
    w_lanes: int = 384,
) -> OrderedSchedule:
    ir, irv_t, _, im, _ = rest_state(mesh, density, pinned=pinned)
    tets = mesh.tets
    n, m = mesh.num_particles, mesh.num_tets
    r = -(-n // 128) * 128

    colors = level_schedule(tets, n)
    nl = int(colors.max()) + 1
    levels = []  # each: array of <=32 global tet ids, order-preserving
    for l in range(nl):
        tl = np.nonzero(colors == l)[0]
        for i in range(0, len(tl), _CW):
            levels.append(tl[i : i + _CW])

    # greedy window packing: consecutive levels while the particle union
    # fits the W-lane working set
    windows = []  # list of (level list, union particle array)
    cur, cur_union = [], set()
    for lv in levels:
        u = set(int(v) for v in tets[lv].reshape(-1))
        if cur and len(cur_union | u) > w_lanes:
            windows.append((cur, np.asarray(sorted(cur_union), np.int64)))
            cur, cur_union = [], set()
        cur.append(lv)
        cur_union |= u
    if cur:
        windows.append((cur, np.asarray(sorted(cur_union), np.int64)))
    nw = len(windows)
    lm = max(len(w[0]) for w in windows)

    uidx = np.zeros((nw, w_lanes), np.int32)
    xinv = np.full((nw, r), -1, np.int32)
    lids = np.zeros((nw, lm, 128), np.int32)
    winv = np.full((nw, lm, w_lanes), -1, np.int32)
    cons = np.zeros((nw, lm, 14, _CW), np.float32)
    for w, (lvls, union) in enumerate(windows):
        uidx[w, : len(union)] = union
        xinv[w, union] = np.arange(len(union))
        lut = np.full(n, -1, np.int64)
        lut[union] = np.arange(len(union))
        for l, tl in enumerate(lvls):
            k = len(tl)
            corners = lut[tets[tl]]  # [k, 4] window-local lanes
            assert (corners >= 0).all()
            # corner-major slots: corner c of sub-level tet t at c*32+t
            for c in range(4):
                lids[w, l, c * _CW : c * _CW + k] = corners[:, c]
                winv[w, l, corners[:, c]] = c * _CW + np.arange(k)
            irp = ir[tl]  # [k, 3, 3]
            for rr in range(3):
                for cc in range(3):
                    cons[w, l, rr * 3 + cc, :k] = irp[:, rr, cc]
            cons[w, l, 9, :k] = irv_t[tl]
            cons[w, l, 10:14, :k] = im[tets[tl]].T

    movw = np.zeros((8, r), np.float32)
    movw[:, :n] = (im > 0.0).astype(np.float32)[None, :]
    nlev = np.asarray([[len(w[0]) for w in windows]], np.int32)
    return OrderedSchedule(
        nlev=nlev,
        uidx=np.repeat(uidx[:, None, :], 8, axis=1),
        xinv=np.repeat(xinv[:, None, :], 8, axis=1),
        lids=np.repeat(lids[:, :, None, :], 8, axis=2),
        winv=np.repeat(winv[:, :, None, :], 8, axis=2),
        cons=cons,
        movw=movw,
        num_windows=nw,
        l_max=lm,
        w_lanes=w_lanes,
        rows=r,
        num_particles=n,
        num_tets=m,
        num_levels=len(levels),
        verts=mesh.verts.astype(np.float32),
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(num_substeps, R, W, Lm, NW):
    B = 8
    r_tiles = R // 128
    w_tiles = W // 128
    all_r = tuple(range(r_tiles))
    all_w = tuple(range(w_tiles))

    def kernel(
        par_ref,   # SMEM f32 [1, 12]
        nlev_ref,  # SMEM i32 [1, NW]
        gid_ref,   # VMEM i32 [B, 1]
        gpos_ref,  # VMEM f32 [B, 4]
        state_ref,  # VMEM f32 [9, B, R] (aliased with out)
        uidx_ref,  # VMEM i32 [1, 8, W]      (this window)
        xinv_ref,  # VMEM i32 [1, 8, R]
        lids_ref,  # VMEM i32 [1, Lm, 8, 128]
        winv_ref,  # VMEM i32 [1, Lm, 8, W]
        cons_ref,  # VMEM f32 [1, Lm, 14, 32]
        movw_ref,  # VMEM f32 [8, R]
        out_ref,   # VMEM f32 [9, B, R]
        wp_ref,    # VMEM f32 [3*B, W] scratch: rows 0-7 x, 8-15 y, 16-23 z
    ):
        s = pl.program_id(0)
        w = pl.program_id(1)
        dt = par_ref[0, 0]
        gravity = par_ref[0, 1]
        friction = par_ref[0, 2]
        dev_c = par_ref[0, 3]
        vol_c = par_ref[0, 4]
        gamma = par_ref[0, 5]
        wmin = [par_ref[0, 6], par_ref[0, 7], par_ref[0, 8]]
        wmax = [par_ref[0, 9], par_ref[0, 10], par_ref[0, 11]]
        mov = movw_ref[:, :]

        @pl.when((s == 0) & (w == 0))
        def _copy_in():
            for k in range(9):
                out_ref[k] = state_ref[k]

        @pl.when(w == 0)
        def _predict():
            X, Y, Z = out_ref[0], out_ref[1], out_ref[2]
            VX, VY, VZ = out_ref[6], out_ref[7], out_ref[8]
            VY = VY + gravity * dt
            VX, VY, VZ = VX * mov, VY * mov, VZ * mov
            out_ref[3], out_ref[4], out_ref[5] = X, Y, Z
            out_ref[0] = X + VX * dt
            out_ref[1] = Y + VY * dt
            out_ref[2] = Z + VZ * dt
            out_ref[6], out_ref[7], out_ref[8] = VX, VY, VZ

        # refill the W-lane working set from the full planes; x/y/z stack on
        # the SUBLANE axis so every per-level gather moves all three planes
        # in ONE tpu.dynamic_gather (per-row indices).  Measured: this is
        # rate-neutral vs per-plane gathers (1.65k vs 1.68k substeps/s) —
        # the level loop's floor is the SOLVE's serial VPU chain, not the
        # gathers (BENCHNOTES "Exact-order fused GS") — but it keeps the
        # gather count flat if W grows.
        u = uidx_ref[0]
        wp_ref[0:B, :] = _ta_tiled(out_ref[0], u, [all_r] * w_tiles)
        wp_ref[B : 2 * B, :] = _ta_tiled(out_ref[1], u, [all_r] * w_tiles)
        wp_ref[2 * B : 3 * B, :] = _ta_tiled(out_ref[2], u, [all_r] * w_tiles)

        def level(l, carry):
            ids = lids_ref[0, l]  # [8, 128]
            ids3 = jnp.concatenate([ids, ids, ids], axis=0)  # [24, 128]
            g3 = _ta_tiled(wp_ref[:, :], ids3, [all_w])
            gx, gy, gz = g3[0:B], g3[B : 2 * B], g3[2 * B : 3 * B]
            cons = cons_ref[0, l]  # [14, 32]
            irp = [cons[k : k + 1, :] for k in range(9)]
            irv = cons[9:10, :]
            imc = [cons[10 + c : 11 + c, :] for c in range(4)]
            nx, ny, nz = _solve_level(
                gx, gy, gz, irp, irv, imc, dt, dev_c, vol_c, gamma, _CW
            )
            n3 = jnp.concatenate([nx, ny, nz], axis=0)  # [24, 128]
            inv = winv_ref[0, l]  # [8, W]
            live = inv >= 0
            idx = jnp.maximum(inv, 0)
            live3 = jnp.concatenate([live, live, live], axis=0)
            idx3 = jnp.concatenate([idx, idx, idx], axis=0)
            wp_ref[:, :] = jnp.where(
                live3, _ta_tiled(n3, idx3, [(0,)] * w_tiles), wp_ref[:, :]
            )
            return carry

        # dynamic trip count: only this window's live levels execute (the
        # dragon packs 703 sub-levels into 4 windows of Lm=259 -> padding
        # would cost 1036 iterations; the SMEM bound keeps it at 703)
        jax.lax.fori_loop(0, nlev_ref[0, w], level, 0)

        # write the union back into the full planes
        xi = xinv_ref[0]
        xlive = xi >= 0
        xidx = jnp.maximum(xi, 0)
        out_ref[0] = jnp.where(
            xlive, _ta_tiled(wp_ref[0:B, :], xidx, [all_w] * r_tiles),
            out_ref[0],
        )
        out_ref[1] = jnp.where(
            xlive, _ta_tiled(wp_ref[B : 2 * B, :], xidx, [all_w] * r_tiles),
            out_ref[1],
        )
        out_ref[2] = jnp.where(
            xlive, _ta_tiled(wp_ref[2 * B : 3 * B, :], xidx, [all_w] * r_tiles),
            out_ref[2],
        )

        @pl.when(w == NW - 1)
        def _finish():
            X, Y, Z = out_ref[0], out_ref[1], out_ref[2]
            PX, PY, PZ = out_ref[3], out_ref[4], out_ref[5]
            X = jnp.clip(X, wmin[0], wmax[0])
            Y = jnp.clip(Y, wmin[1], wmax[1])
            Z = jnp.clip(Z, wmin[2], wmax[2])
            below = Y < 0.0
            Y = jnp.where(below, 0.0, Y)
            k = jnp.minimum(1.0, dt * friction)
            X = X + jnp.where(below, (PX - X) * k, 0.0)
            Z = Z + jnp.where(below, (PZ - Z) * k, 0.0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
            grab_hit = lane == gid_ref[:, 0:1]
            X = jnp.where(grab_hit, gpos_ref[:, 0:1], X)
            Y = jnp.where(grab_hit, gpos_ref[:, 1:2], Y)
            Z = jnp.where(grab_hit, gpos_ref[:, 2:3], Z)
            inv_dt = 1.0 / dt
            out_ref[0], out_ref[1], out_ref[2] = X, Y, Z
            out_ref[6] = (X - PX) * inv_dt
            out_ref[7] = (Y - PY) * inv_dt
            out_ref[8] = (Z - PZ) * inv_dt

    return kernel


def _step_call(s: OrderedSchedule, num_substeps: int, interpret: bool):
    kernel = _make_kernel(
        num_substeps, s.rows, s.w_lanes, s.l_max, s.num_windows
    )
    R, W, Lm, NW = s.rows, s.w_lanes, s.l_max, s.num_windows

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda su, w, _n=nd: (0,) * _n, memory_space=pltpu.VMEM
        )

    def per_window(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape,
            lambda su, w, _n=nd: (w,) + (0,) * _n,
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(num_substeps, NW),
        out_shape=jax.ShapeDtypeStruct((9, 8, R), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            const((8, 1)),
            const((8, 4)),
            const((9, 8, R)),
            per_window(8, W),
            per_window(8, R),
            per_window(Lm, 8, 128),
            per_window(Lm, 8, W),
            per_window(Lm, 14, _CW),
            const((8, R)),
        ],
        out_specs=const((9, 8, R)),
        scratch_shapes=[pltpu.VMEM((24, W), jnp.float32)],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_budget_bytes()[1],
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Batched-body API (mirrors FusedGSBody, fixed 8 bodies)
# ---------------------------------------------------------------------------


class OrderedGSBody:
    """8 bodies of one mesh stepped with the EXACT reference GS order.

    API mirrors kernels.gs_fused.FusedGSBody (step/positions/velocities/
    set_grab); the trajectory matches solvers/golden.py to f32 rounding."""

    def __init__(self, mesh: TetMesh, density: float = 1000.0,
                 pinned=None, w_lanes: int = 384,
                 interpret: bool | None = None,
                 jitter: float = 0.0, seed: int = 0):
        self.mesh = mesh
        self.sched = build_ordered_schedule(
            mesh, density=density, pinned=pinned, w_lanes=w_lanes
        )
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        s = self.sched
        self.num_bodies = 8
        self._uidx = jnp.asarray(s.uidx)
        self._xinv = jnp.asarray(s.xinv)
        self._lids = jnp.asarray(s.lids)
        self._winv = jnp.asarray(s.winv)
        self._cons = jnp.asarray(s.cons)
        self._movw = jnp.asarray(s.movw)
        self._nlev = jnp.asarray(s.nlev)
        st = np.zeros((9, 8, s.rows), np.float32)
        offsets = np.zeros((8, 3), np.float32)
        if jitter:
            rng = np.random.RandomState(seed)
            offsets = rng.uniform(-jitter, jitter, (8, 3)).astype(np.float32)
            offsets[:, 1] = np.abs(offsets[:, 1])  # never jitter below floor
        for r in range(3):
            st[r, :, : s.num_particles] = s.verts[:, r] + offsets[:, r : r + 1]
            st[3 + r] = st[r]
        self.state = jnp.asarray(st)
        self.grab_id = jnp.full((8, 1), -1, jnp.int32)
        self.grab_pos = jnp.zeros((8, 4), jnp.float32)

    def _params_vec(self, params: PhysicsParams):
        dt = params.dt
        return jnp.stack(
            [
                dt, params.gravity, params.friction,
                params.dev_compliance, params.vol_compliance,
                params.vol_compliance / params.dev_compliance,
                params.world_min[0], params.world_min[1], params.world_min[2],
                params.world_max[0], params.world_max[1], params.world_max[2],
            ]
        ).reshape(1, 12).astype(jnp.float32)

    @functools.partial(
        jax.jit, static_argnames=("self", "num_substeps", "interpret")
    )
    def _step(self, state, par, gid, gpos, num_substeps, interpret):
        return _step_call(self.sched, num_substeps, interpret)(
            par, self._nlev, gid, gpos, state,
            self._uidx, self._xinv, self._lids, self._winv, self._cons,
            self._movw,
        )

    def step(self, params: PhysicsParams, frames: int = 1):
        par = self._params_vec(params)
        for _ in range(frames):
            self.state = self._step(
                self.state, par, self.grab_id, self.grab_pos,
                params.num_substeps, self.interpret,
            )
        return self.state

    def positions(self) -> np.ndarray:
        n = self.sched.num_particles
        st = np.asarray(self.state)
        return np.stack(
            [st[0, :, :n], st[1, :, :n], st[2, :, :n]], axis=-1
        )

    def velocities(self) -> np.ndarray:
        n = self.sched.num_particles
        st = np.asarray(self.state)
        return np.stack(
            [st[6, :, :n], st[7, :, :n], st[8, :, :n]], axis=-1
        )

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
        """Grab body's nearest particle to `point` (Softbody.js:279-291)."""
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
