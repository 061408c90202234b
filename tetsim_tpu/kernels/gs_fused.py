"""Fused VMEM-resident colored-Gauss-Seidel frame kernel (Pallas TPU).

The entire frame — every substep, every color level, prediction, collision,
grab, and velocity update — runs inside ONE Pallas kernel with the whole
simulation state resident in VMEM.  This is the TPU-native replacement for
the reference's 7 render-texture passes per substep (SoftbodyGPU.js §2.4):
where the reference paid a full GPU pass (HBM round trip) per stage, this
kernel touches HBM exactly twice per frame (state in, state out).

Layout (chosen for the VPU's 8x128 registers):
  * bodies  -> sublanes: the kernel steps a BATCH of B bodies of the same
    mesh simultaneously — the reference's multi-body scene list
    (main.js:51 physicsScene.softBodies) scaled the TPU way.
  * particles/corner-slots -> lanes (R lanes, 128-padded).
  * xyz -> three separate [B, R] planes (pure elementwise math; cross
    products and dot products never shuffle lanes or sublanes).

Per color level the particle gather and the scatter-back are both
``take_along_axis`` along lanes (Mosaic ``dynamic_gather``); the scatter is
exact as a gather because tets within a level are vertex-disjoint
(schedule.py builds the inverse index).

Math follows solvers/neohookean.py (= Softbody.js:91-193): deviatoric
C = ||F||_F then hydrostatic C = det F - 1 - volC/devC on the updated
positions, both XPBD-projected.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .schedule import VmemSchedule, build_vmem_schedule, vmem_budget_bytes
from .schedule import ta_tiled as _ta_tiled  # shared lane-gather helper
from ..params import PhysicsParams


def _solve_level(px, py, pz, irp, irv, imc, dt, dev_c, vol_c, gamma, C):
    """Project both Neo-Hookean constraints on one level's corner blocks.

    px/py/pz: [B, 4C] gathered corner coordinates (corner-major blocks).
    irp: list of 9 [1, C] inv_rest_pose entries (row-major r*3+c).
    irv: [1, C]; imc: list of 4 [1, C] corner inverse masses.
    Returns updated [B, 4C] coordinate planes.
    """

    def corner(v, c):
        return v[:, c * C : (c + 1) * C]

    def stack4(v0, v1, v2, v3):
        return jnp.concatenate([v0, v1, v2, v3], axis=1)

    p = [[corner(px, c), corner(py, c), corner(pz, c)] for c in range(4)]

    def edges(p):
        # e[k][r]: edge k (=p_{k+1}-p_0), coordinate r — [B, C]
        return [[p[k + 1][r] - p[0][r] for r in range(3)] for k in range(3)]

    def deformation(e):
        # F[r][c] = sum_k e[k][r] * ir[k][c]   (ir row-major [k*3+c])
        return [
            [sum(e[k][r] * irp[k * 3 + c] for k in range(3)) for c in range(3)]
            for r in range(3)
        ]

    def xpbd_apply(p, g, c_val, compliance):
        # g: gradients for corners 1..3, g[i][r] [B, C]; corner 0 = -sum
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

    # --- deviatoric: C = ||F||_F (Softbody.js:96-131)
    e = edges(p)
    f = deformation(e)
    r_s2 = sum(f[r][c] ** 2 for r in range(3) for c in range(3))
    r_s = jnp.sqrt(r_s2)
    r_inv = jnp.where(r_s > 0.0, 1.0 / jnp.where(r_s > 0.0, r_s, 1.0), 0.0)
    # grads for corner i (1..3): g[i][r] = (sum_c F[r][c] * ir[i][c]) / r_s
    g = [
        [sum(f[r][c] * irp[i * 3 + c] for c in range(3)) * r_inv for r in range(3)]
        for i in range(3)
    ]
    p = xpbd_apply(p, g, r_s, dev_c)

    # --- hydrostatic: C = det F - 1 - gamma on updated positions
    # (Gauss-Seidel within the element, Softbody.js:134-165)
    e = edges(p)
    f = deformation(e)
    # columns of F as vectors: col_c[r] = f[r][c]
    def col(c):
        return [f[r][c] for r in range(3)]

    def cross(a, b):
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    f0, f1, f2 = col(0), col(1), col(2)
    df = [cross(f1, f2), cross(f2, f0), cross(f0, f1)]  # df[c][r]
    det = sum(f[r][0] * df[0][r] for r in range(3))
    c_vol = det - 1.0 - gamma
    g = [
        [sum(df[c][r] * irp[i * 3 + c] for c in range(3)) for r in range(3)]
        for i in range(3)
    ]
    p = xpbd_apply(p, g, c_vol, vol_c)

    return (
        stack4(*(p[c][0] for c in range(4))),
        stack4(*(p[c][1] for c in range(4))),
        stack4(*(p[c][2] for c in range(4))),
    )


def _make_kernel(num_substeps: int, L: int, C: int, R: int, B: int,
                 gather_tiles, scatter_tiles):
    def kernel(
        par_ref,  # SMEM f32 [1, 12]
        gid_ref,  # VMEM i32 [B, 1]
        gpos_ref,  # VMEM f32 [B, 4]
        state_ref,  # VMEM f32 [9, B, R]  (aliased with out)
        ids_ref,  # VMEM i32 [L, 8, R]  (pre-broadcast to one sublane tile)
        inv_ref,  # VMEM i32 [L, 8, R]
        irp_ref,  # VMEM f32 [L, 9, C]
        irv_ref,  # VMEM f32 [L, C]
        imc_ref,  # VMEM f32 [L, 4, C]
        out_ref,  # VMEM f32 [9, B, R]
    ):
        dt = par_ref[0, 0]
        gravity = par_ref[0, 1]
        friction = par_ref[0, 2]
        dev_c = par_ref[0, 3]
        vol_c = par_ref[0, 4]
        gamma = par_ref[0, 5]
        wmin = [par_ref[0, 6], par_ref[0, 7], par_ref[0, 8]]
        wmax = [par_ref[0, 9], par_ref[0, 10], par_ref[0, 11]]

        for k in range(9):
            out_ref[k] = state_ref[k]

        lane = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
        gid = gid_ref[:, 0:1]  # [B, 1]
        grab_hit = lane == gid  # gid == -1 never matches

        def substep(_, carry):
            X, Y, Z = out_ref[0], out_ref[1], out_ref[2]
            VX, VY, VZ = out_ref[6], out_ref[7], out_ref[8]

            # predict (gravity into vel, save prev, advect — Softbody.js:198-202)
            VY = VY + gravity * dt
            PX, PY, PZ = X, Y, Z
            X, Y, Z = X + VX * dt, Y + VY * dt, Z + VZ * dt

            # colored Gauss-Seidel sweep
            def rep_rows(row8):
                # [8,R] -> [B,R] by sublane-tile concatenation (broadcasting
                # a 1-row vector trips a Mosaic layout bug, so the index
                # tables are stored pre-broadcast to one 8-sublane tile)
                if B == 8:
                    return row8
                return jnp.concatenate([row8] * (B // 8), axis=0)

            for l in range(L):
                idx = rep_rows(ids_ref[l])
                gt = gather_tiles[l]
                gx = _ta_tiled(X, idx, gt)
                gy = _ta_tiled(Y, idx, gt)
                gz = _ta_tiled(Z, idx, gt)
                irp = [irp_ref[l, k : k + 1, :] for k in range(9)]
                irv = irv_ref[l : l + 1, :]
                imc = [imc_ref[l, c : c + 1, :] for c in range(4)]
                nx, ny, nz = _solve_level(
                    gx[:, : 4 * C], gy[:, : 4 * C], gz[:, : 4 * C],
                    irp, irv, imc, dt, dev_c, vol_c, gamma, C,
                )
                if R > 4 * C:
                    pad = (0, 0), (0, R - 4 * C)
                    nx, ny, nz = (jnp.pad(v, pad) for v in (nx, ny, nz))
                invl = rep_rows(inv_ref[l])
                live = invl >= 0
                sidx = jnp.maximum(invl, 0)
                st = scatter_tiles[l]
                X = jnp.where(live, _ta_tiled(nx, sidx, st), X)
                Y = jnp.where(live, _ta_tiled(ny, sidx, st), Y)
                Z = jnp.where(live, _ta_tiled(nz, sidx, st), Z)

            # collide: world bounds + ground friction (Softbody.js:213-231)
            X = jnp.clip(X, wmin[0], wmax[0])
            Y = jnp.clip(Y, wmin[1], wmax[1])
            Z = jnp.clip(Z, wmin[2], wmax[2])
            below = Y < 0.0
            Y = jnp.where(below, 0.0, Y)
            k = jnp.minimum(1.0, dt * friction)
            X = X + jnp.where(below, (PX - X) * k, 0.0)
            Z = Z + jnp.where(below, (PZ - Z) * k, 0.0)

            # grab override (Softbody.js:233-235)
            X = jnp.where(grab_hit, gpos_ref[:, 0:1], X)
            Y = jnp.where(grab_hit, gpos_ref[:, 1:2], Y)
            Z = jnp.where(grab_hit, gpos_ref[:, 2:3], Z)

            # velocity update
            inv_dt = 1.0 / dt
            out_ref[0], out_ref[1], out_ref[2] = X, Y, Z
            out_ref[3], out_ref[4], out_ref[5] = PX, PY, PZ
            out_ref[6] = (X - PX) * inv_dt
            out_ref[7] = (Y - PY) * inv_dt
            out_ref[8] = (Z - PZ) * inv_dt
            return carry

        jax.lax.fori_loop(0, num_substeps, substep, 0)

    return kernel


def _pallas_step_call(s, B, b, vmem_limit, num_substeps, interpret):
    """Build the frame pallas_call for B bodies in b-body blocks.

    Grid over body blocks: each grid step runs the WHOLE frame for one
    block of b bodies while the Pallas pipeline streams the next block's
    state HBM->VMEM — the batch size is not VMEM-gated (round-1 cap was
    32 dragons total; now 32 per block, any blocks).  Index tables / tet
    constants use a constant index map, so their VMEM buffers are fetched
    once and revalidated, not re-DMAed.  Shared by the single-device step
    and the shard_map'd data-parallel path (each device invokes this with
    its LOCAL body count)."""
    kernel = _make_kernel(
        num_substeps, s.L, s.C, s.R, b, s.gather_tiles, s.scatter_tiles
    )
    n_blk = B // b

    def stat(*shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        out_shape=jax.ShapeDtypeStruct((9, B, s.R), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (9, b, s.R), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            stat(s.L, 8, s.R),
            stat(s.L, 8, s.R),
            stat(s.L, 9, s.C),
            stat(s.L, s.C),
            stat(s.L, 4, s.C),
        ],
        out_specs=pl.BlockSpec(
            (9, b, s.R), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        input_output_aliases={3: 0},  # state buffer reused as output
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )


class FusedGSBody:
    """Batched-body stepping through the fused kernel.

    Holds the device-side SoA state [9, B, R] for B bodies of one mesh and
    exposes a step/frame API compatible in spirit with solvers.neohookean
    (same math, batched).
    """

    def __init__(
        self,
        mesh,
        num_bodies: int = 8,
        density: float = 1000.0,
        coloring: str = "greedy",
        schedule: Optional[VmemSchedule] = None,
        interpret: bool | None = None,
        jitter: float = 0.0,
        seed: int = 0,
    ):
        self.mesh = mesh
        self.sched = schedule or build_vmem_schedule(mesh, density, coloring)
        if self.sched.L > 64:
            raise ValueError(
                f"schedule has {self.sched.L} color levels; the fused kernel "
                "unrolls levels statically and is intended for compact "
                "schedules (coloring='greedy', typically <64 levels) — use "
                "kernels.gs_ordered.OrderedGSBody for ordered/long "
                "schedules (windowed fori, nothing unrolled)"
            )
        # VMEM sizing.  Bodies are processed in BLOCKS of B_blk sublanes:
        # only one block's state + the shared tables must fit VMEM; the
        # batch streams HBM->VMEM block by block via the Pallas grid
        # pipeline (double-buffered automatically), so the total body count
        # is unbounded (lifts the round-1 <=32-body gate).  The budget is
        # 96 MB, not 16: the default scoped limit is a soft cap — v5e has
        # 128 MB physical VMEM, unlocked via CompilerParams
        # (vmem_limit_bytes; see kernels/polar_fused.py and BENCHNOTES) —
        # which also lifts the round-1 mesh-size gate ~6x.
        s0 = self.sched
        tables = 4 * (2 * s0.L * 8 * s0.R + s0.L * 14 * s0.C)

        def est(b):
            # 60 live f32/lane measured at B=64 (round 1), plus the second
            # pipeline buffers of the blocked state windows (in + out)
            return tables + 4 * b * s0.R * (60 + 2 * 9)

        b_pad = (num_bodies + 7) // 8 * 8
        budget, self._vmem_limit = vmem_budget_bytes()
        feasible = [blk for blk in (8, 16, 32) if est(blk) <= budget]
        if not feasible:
            raise ValueError(
                f"fused kernel VMEM estimate {est(8)/1e6:.1f} MB exceeds the "
                f"{budget/1e6:.0f} MB budget (derived from the local device "
                "kind; see kernels.schedule.vmem_budget_bytes) even at an "
                f"8-body block (R={s0.R}, "
                f"L={s0.L}) — the mesh is too large for the VMEM-resident "
                "kernel; use the XLA engines or polar_grid"
            )
        # least padded total, tie-break the larger block
        self.B_blk = min(
            (min(blk, b_pad) for blk in feasible),
            key=lambda blk: ((b_pad + blk - 1) // blk * blk, -blk),
        )
        # pad the batch to a whole number of blocks
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
        s = self.sched
        self._ids = jnp.asarray(np.repeat(s.ids[:, None, :], 8, axis=1))
        self._inv = jnp.asarray(np.repeat(s.inv[:, None, :], 8, axis=1))
        self._irp = jnp.asarray(s.irp)
        self._irv = jnp.asarray(s.irv)
        self._imc = jnp.asarray(s.imc)
        offsets = None
        if jitter:
            rng = np.random.RandomState(seed)
            offsets = rng.uniform(-jitter, jitter, (self.B, 3)).astype(np.float32)
            offsets[:, 1] = np.abs(offsets[:, 1])  # keep above ground
        self.state = self._init_state(offsets)
        self.grab_id = jnp.full((self.B, 1), -1, jnp.int32)
        self.grab_pos = jnp.zeros((self.B, 4), jnp.float32)

    def _init_state(self, offsets: Optional[np.ndarray] = None):
        s = self.sched
        verts = self.mesh.verts  # [N, 3]
        st = np.zeros((9, self.B, s.R), np.float32)
        for r in range(3):
            st[r, :, : s.num_particles] = verts[:, r]
            st[3 + r, :, : s.num_particles] = verts[:, r]
        if offsets is not None:
            for r in range(3):
                st[r, :, : s.num_particles] += offsets[: self.B, r : r + 1]
                st[3 + r, :, : s.num_particles] += offsets[: self.B, r : r + 1]
        return jnp.asarray(st)

    def _params_vec(self, params: PhysicsParams):
        dt = params.dt
        return jnp.stack(
            [
                dt,
                params.gravity,
                params.friction,
                params.dev_compliance,
                params.vol_compliance,
                params.vol_compliance / params.dev_compliance,
                params.world_min[0], params.world_min[1], params.world_min[2],
                params.world_max[0], params.world_max[1], params.world_max[2],
            ]
        ).reshape(1, 12).astype(jnp.float32)

    @functools.partial(
        jax.jit, static_argnames=("self", "num_substeps", "interpret")
    )
    def _step(self, state, par, gid, gpos, num_substeps, interpret):
        return _pallas_step_call(
            self.sched, self.B, self.B_blk, self._vmem_limit,
            num_substeps, interpret,
        )(par, gid, gpos, state, self._ids, self._inv, self._irp,
          self._irv, self._imc)

    def step(self, params: PhysicsParams, frames: int = 1):
        par = self._params_vec(params)
        step = (
            self._sharded_step(params.num_substeps)
            if self._shard_cfg is not None
            else functools.partial(
                self._step,
                num_substeps=params.num_substeps, interpret=self.interpret,
            )
        )
        for _ in range(frames):
            self.state = step(self.state, par, self.grab_id, self.grab_pos)
        return self.state

    # -- multi-chip: data-parallel body sharding ------------------------------
    def shard(self, mesh, axis="body"):
        """Distribute the body batch over ``mesh``'s ``axis`` (name or tuple
        of names) — pure data parallelism, zero collectives (bodies are
        independent; SURVEY.md §2.5 multi-body x multi-chip).  Tables are
        replicated; state/controls shard on the body axis.  Subsequent
        step() calls run under shard_map."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .schedule import body_shard_config

        names, b_loc, blk = body_shard_config(mesh, axis, self.B, self.B_blk)
        self._shard_cfg = (mesh, names, b_loc, blk)
        self._sharded_cache = {}
        body_sp = NamedSharding(mesh, P(None, names))
        ctrl_sp = NamedSharding(mesh, P(names))
        rep = NamedSharding(mesh, P())
        self.state = jax.device_put(self.state, body_sp)
        self.grab_id = jax.device_put(self.grab_id, ctrl_sp)
        self.grab_pos = jax.device_put(self.grab_pos, ctrl_sp)
        for t in ("_ids", "_inv", "_irp", "_irv", "_imc"):
            setattr(self, t, jax.device_put(getattr(self, t), rep))
        return self

    def _sharded_step(self, num_substeps: int):
        if num_substeps in self._sharded_cache:
            return self._sharded_cache[num_substeps]
        mesh, names, b_loc, blk = self._shard_cfg
        call = _pallas_step_call(
            self.sched, b_loc, blk, self._vmem_limit,
            num_substeps, self.interpret,
        )

        from .schedule import make_body_sharded_step

        inner = make_body_sharded_step(mesh, names, call, n_state=1,
                                       n_tables=5)
        tables = (self._ids, self._inv, self._irp, self._irv, self._imc)

        def step(state, par, gid, gpos):
            return inner(par, gid, gpos, state, *tables)

        self._sharded_cache[num_substeps] = step
        return step

    # -- views ---------------------------------------------------------------
    def positions(self) -> np.ndarray:
        """[num_bodies, N, 3] current particle positions."""
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

    # -- interaction (World/BatchedBody-compatible surface) -------------------
    def _check_body(self, body: int):
        if not 0 <= body < self.num_bodies:
            raise IndexError(
                f"body index {body} out of range (batch has {self.num_bodies})"
            )

    def set_grab(self, body: int, particle: int, point):
        self._check_body(body)
        self.grab_id = self.grab_id.at[body, 0].set(particle)
        self.grab_pos = self.grab_pos.at[body, :3].set(jnp.asarray(point, jnp.float32))

    def start_grab(self, body: int, point) -> int:
        """Grab body's nearest particle to `point` (Softbody.js:279-291)."""
        self._check_body(body)
        pos = self.positions()[body]
        pid = int(np.argmin(np.sum((pos - np.asarray(point)) ** 2, axis=-1)))
        self.set_grab(body, pid, point)
        return pid

    def move_grabbed(self, body: int, point):
        self._check_body(body)
        self.grab_pos = self.grab_pos.at[body, :3].set(jnp.asarray(point, jnp.float32))

    def end_grab(self, body: int):
        self._check_body(body)
        self.grab_id = self.grab_id.at[body, 0].set(-1)
