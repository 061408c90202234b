"""Dense (MXU) data-movement solvers: gather/scatter as one-hot matmuls.

Measured truth on TPU v5e (see BENCHNOTES.md): XLA lowers per-element
scatter at ~18 ns/row and gather at ~2.5 ns/row — the colored-GS level loop
is scatter-bound, exactly the bottleneck the reference hit on WebGL and
worked around with its 9-texture scatter tables (SoftbodyGPU.js:29-37).
The TPU-native fix is to route ALL irregular data movement through the MXU:
each color level's gather and scatter become matmuls against a precomputed
one-hot matrix (exact 0/1 entries; within a level every particle receives
at most one contribution, so the scatter-matmul is exact, not a sum).

Bodies batch in COLUMNS: state is [N, 3, B] and the same per-level one-hot
serves all B bodies in one [N, 4C] x [4C, 3B] matmul — the multi-body form
that keeps the MXU fed (vmap-over-bodies and flattened meshes both fall
back to serial scatter).

All dots use precision=HIGHEST so f32 positions survive the MXU's bf16
passes.  Memory: the one-hot slab is f32 [L, N, 4C] — 162 MB for the
dragon, gated by build_dense_arrays(max_bytes=...).

Reachable via ``World.add_body_batch(..., backend="dense")`` (DenseBody
wrapper in world.py).  Status: correct (parity tests in
tests/test_dense.py) but the fused VMEM kernel (backend="fused") is the
faster batch path on meshes that fit VMEM; prefer dense only for batch
sizes/meshes past the fused kernel's VMEM gate.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..mesh import TetMesh
from ..params import PhysicsParams
from ..kernels.schedule import build_vmem_schedule, VmemSchedule


def _prec():
    """Matmul precision: HIGHEST on TPU keeps f32 positions exact through
    the MXU's bf16 passes; on CPU f32 dots are already exact and HIGHEST
    selects a ~1000x slower scalar fallback."""
    return (
        jax.lax.Precision.DEFAULT
        if jax.default_backend() == "cpu"
        else jax.lax.Precision.HIGHEST
    )


@struct.dataclass
class DenseState:
    pos: jnp.ndarray  # f32 [N, 3, B]
    prev_pos: jnp.ndarray  # f32 [N, 3, B]
    vel: jnp.ndarray  # f32 [N, 3, B]


@struct.dataclass
class DenseArrays:
    """Per-mesh constants for the dense GS path."""

    onehot: jnp.ndarray  # f32 [L, N, 4C]  scatter matrix (also used transposed)
    irp: jnp.ndarray  # f32 [L, 9, C]
    irv: jnp.ndarray  # f32 [L, C]
    imc: jnp.ndarray  # f32 [L, 4, C]
    num_particles: int = struct.field(pytree_node=False)
    slots_per_level: int = struct.field(pytree_node=False)


def build_dense_arrays(
    mesh: TetMesh,
    density: float = 1000.0,
    coloring: str = "greedy",
    schedule: Optional[VmemSchedule] = None,
    max_bytes: int = 2_000_000_000,
) -> DenseArrays:
    s = schedule or build_vmem_schedule(mesh, density, coloring)
    n, C, L = s.num_particles, s.C, s.L
    nbytes = L * n * 4 * C * 4
    if nbytes > max_bytes:
        raise ValueError(
            f"dense GS one-hot slab would need {nbytes/1e9:.1f} GB "
            f"(L={L}, N={n}, 4C={4*C}); use the classic neohookean engine "
            "for meshes this large"
        )
    oh = np.zeros((L, n, 4 * C), np.float32)
    for l in range(L):
        valid_t = s.irv[l] != 0.0
        for c in range(4):
            t_idx = np.nonzero(valid_t)[0]
            slots = c * C + t_idx
            oh[l, s.ids[l, slots], slots] = 1.0
    return DenseArrays(
        onehot=jnp.asarray(oh),
        irp=jnp.asarray(s.irp),
        irv=jnp.asarray(s.irv),
        imc=jnp.asarray(s.imc),
        num_particles=n,
        slots_per_level=C,
    )


def init_dense_state(mesh: TetMesh, num_bodies: int, jitter: float = 0.0, seed: int = 0) -> DenseState:
    pos = np.broadcast_to(
        mesh.verts.astype(np.float32)[:, :, None], (mesh.num_particles, 3, num_bodies)
    ).copy()
    if jitter:
        rng = np.random.RandomState(seed)
        off = rng.uniform(-jitter, jitter, (1, 3, num_bodies)).astype(np.float32)
        off[:, 1] = np.abs(off[:, 1])
        pos = pos + off
    pos = jnp.asarray(pos)
    return DenseState(pos=pos, prev_pos=pos, vel=jnp.zeros_like(pos))


# ---------------------------------------------------------------------------
# level solve (SoA over [C, B] planes; math = Softbody.js:91-193)
# ---------------------------------------------------------------------------


def _solve_level_planes(p, irp, irv, imc, dt, dev_c, vol_c, gamma):
    """p[c][r]: corner c, coordinate r — [C, B] planes.  Returns deltas of
    the same structure.  Mirrors solvers.neohookean.solve_tet_batch."""

    def edges(p):
        return [[p[k + 1][r] - p[0][r] for r in range(3)] for k in range(3)]

    def deformation(e):
        return [
            [sum(e[k][r] * irp[k * 3 + c] for k in range(3)) for c in range(3)]
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
        return [[dlam * imc[i] * gall[i][r] for r in range(3)] for i in range(4)]

    # deviatoric
    e = edges(p)
    f = deformation(e)
    r_s = jnp.sqrt(sum(f[r][c] ** 2 for r in range(3) for c in range(3)))
    r_inv = jnp.where(r_s > 0.0, 1.0 / jnp.where(r_s > 0.0, r_s, 1.0), 0.0)
    g = [
        [sum(f[r][c] * irp[i * 3 + c] for c in range(3)) * r_inv for r in range(3)]
        for i in range(3)
    ]
    d_dev = xpbd_apply(p, g, r_s, dev_c)
    p = [[p[i][r] + d_dev[i][r] for r in range(3)] for i in range(4)]

    # hydrostatic on updated positions
    e = edges(p)
    f = deformation(e)
    col = lambda c: [f[r][c] for r in range(3)]

    def cross(a, b):
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    f0, f1, f2 = col(0), col(1), col(2)
    df = [cross(f1, f2), cross(f2, f0), cross(f0, f1)]
    det = sum(f[r][0] * df[0][r] for r in range(3))
    g = [
        [sum(df[c][r] * irp[i * 3 + c] for c in range(3)) for r in range(3)]
        for i in range(3)
    ]
    d_vol = xpbd_apply(p, g, det - 1.0 - gamma, vol_c)
    return [[d_dev[i][r] + d_vol[i][r] for r in range(3)] for i in range(4)]


def project_constraints(pos, arr: DenseArrays, dt, params: PhysicsParams):
    """Colored GS sweep with MXU gather/scatter.  pos: [N, 3, B]."""
    n, _, B = pos.shape
    C = arr.slots_per_level

    def level_body(pos, level):
        oh, irp_l, irv_l, imc_l = level  # [N,4C], [9,C], [C], [4,C]
        flat = pos.reshape(n, 3 * B)
        # gather: corners [4C, 3B] = onehot^T @ pos
        g = jax.lax.dot_general(
            oh, flat, (((0,), (0,)), ((), ())), precision=_prec()
        )  # [4C, 3B]
        # barrier: keep XLA from fusing (= re-running) the gather-dot into
        # every consumer in the constraint math (same pathology as below)
        g = jax.lax.optimization_barrier(g)
        g4 = g.reshape(4, C, 3, B)
        p = [[g4[c, :, r, :] for r in range(3)] for c in range(4)]
        irp = [irp_l[k][:, None] for k in range(9)]
        irv = irv_l[:, None]
        imc = [imc_l[c][:, None] for c in range(4)]
        d = _solve_level_planes(
            p, irp, irv, imc, dt,
            params.dev_compliance, params.vol_compliance,
            params.vol_compliance / params.dev_compliance,
        )
        delta = jnp.stack(
            [jnp.stack([d[c][r] for r in range(3)], axis=1) for c in range(4)]
        ).reshape(4 * C, 3 * B)
        # barrier: without it XLA may fuse the whole constraint solve into
        # the scatter-dot's inner loop and recompute it per output element
        # (measured 4 orders of magnitude slower on CPU)
        delta = jax.lax.optimization_barrier(delta)
        # scatter: [N, 3B] += onehot @ delta (exact: <=1 contribution/row)
        dense = jnp.dot(oh, delta, precision=_prec())
        return pos + dense.reshape(n, 3, B), None

    pos, _ = jax.lax.scan(
        level_body, pos, (arr.onehot, arr.irp, arr.irv, arr.imc)
    )
    return pos


def substep(state: DenseState, arr: DenseArrays, params: PhysicsParams, dt, grab_id, grab_pos):
    """One XPBD substep (Softbody.js:195-240 semantics) on [N,3,B] planes.

    grab_id: i32 [B] (-1 inactive), grab_pos: f32 [3, B].
    """
    pos, vel = state.pos, state.vel
    vel = vel.at[:, 1, :].add(params.gravity * dt)
    prev = pos
    pos = pos + vel * dt

    pos = project_constraints(pos, arr, dt, params)

    # collide (bounds + ground friction)
    wmin = params.world_min[None, :, None]
    wmax = params.world_max[None, :, None]
    pos = jnp.clip(pos, wmin, wmax)
    below = pos[:, 1, :] < 0.0
    pos = pos.at[:, 1, :].set(jnp.where(below, 0.0, pos[:, 1, :]))
    k = jnp.minimum(1.0, dt * params.friction)
    for ax in (0, 2):
        pos = pos.at[:, ax, :].add(
            jnp.where(below, (prev[:, ax, :] - pos[:, ax, :]) * k, 0.0)
        )

    # per-body grab override
    n = pos.shape[0]
    rows = jnp.arange(n)[:, None]  # [N,1]
    hit = rows == grab_id[None, :]  # [N,B]
    pos = jnp.where(hit[:, None, :], grab_pos[None, :, :], pos)

    vel = (pos - prev) / dt
    return state.replace(pos=pos, prev_pos=prev, vel=vel)


def step_frame(state: DenseState, arr: DenseArrays, params: PhysicsParams, grab_id, grab_pos):
    dt = params.dt

    def body(s, _):
        return substep(s, arr, params, dt, grab_id, grab_pos), None

    state, _ = jax.lax.scan(body, state, None, length=params.num_substeps)
    return state
