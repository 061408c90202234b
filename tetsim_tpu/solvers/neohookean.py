"""Stable Neo-Hookean XPBD with graph-colored Gauss-Seidel — TPU-native.

Math follows Macklin & Müller's constraint formulation as implemented by the
reference CPU solver (Softbody.js:91-193): per tet, a deviatoric constraint
C_D = ||F||_F and a hydrostatic constraint C_H = det F - 1 - volC/devC, each
projected with XPBD (alpha = compliance/dt^2 * invRestVolume).

TPU re-design: the reference's sequential per-tet loop (Softbody.js:206-209)
becomes a ``lax.scan`` over color levels — tets within a level share no
vertex, so they are solved as one vectorized batch (gather 4 corners, solve
both constraints locally, scatter-add the position deltas).  With the
order-preserving ``level_schedule`` coloring this reproduces the sequential
Gauss-Seidel trajectory: conflicting tets keep their relative order, and the
within-element two-phase ordering (volume constraint sees the deviatoric
update, Softbody.js:134-138) is preserved by applying the deviatoric delta to
the local gather before computing the volume constraint.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh import TetArrays
from ..params import PhysicsParams
from ..state import SimState, Controls
from ..utils import mat3
from . import common


def _edge_matrix(p):
    """Column matrix P = [p1-p0 | p2-p0 | p3-p0] (Softbody.js:103-105).
    p: [...,4,3] -> [...,3,3]."""
    return jnp.stack(
        [p[..., 1, :] - p[..., 0, :], p[..., 2, :] - p[..., 0, :], p[..., 3, :] - p[..., 0, :]],
        axis=-1,
    )


def _xpbd_apply(p, grads123, c, compliance, inv_rest_volume, w_inv, dt):
    """XPBD projection (Softbody.js:168-193) on a local batch.

    grads123: [...,3,3] columns are the gradients for corners 1..3.
    Returns the position delta [...,4,3].
    """
    g123 = jnp.swapaxes(grads123, -1, -2)  # [...,3(corner),3(xyz)]
    g0 = -jnp.sum(g123, axis=-2, keepdims=True)
    g = jnp.concatenate([g0, g123], axis=-2)  # [...,4,3]
    w = jnp.sum(jnp.sum(g * g, axis=-1) * w_inv, axis=-1)  # [...]
    alpha = compliance / (dt * dt) * inv_rest_volume
    denom = w + alpha
    ok = (c != 0.0) & (w != 0.0)
    dlambda = jnp.where(ok, -c / jnp.where(ok, denom, 1.0), 0.0)
    return dlambda[..., None, None] * w_inv[..., None] * g


def solve_tet_batch(p, inv_rest_pose, inv_rest_volume, w_inv, dt, params: PhysicsParams):
    """Project both Neo-Hookean constraints on a vertex-disjoint tet batch.

    p:        [...,4,3] gathered corner positions (local copies)
    returns:  (delta [...,4,3], vol_err [...])  with vol_err = det F - 1
    """
    ir = inv_rest_pose

    # --- deviatoric: C = ||F||_F (Softbody.js:96-131)
    f = mat3.matmul(_edge_matrix(p), ir)
    r_s = jnp.sqrt(jnp.sum(f * f, axis=(-1, -2)))
    r_s_inv = jnp.where(r_s > 0.0, 1.0 / jnp.where(r_s > 0.0, r_s, 1.0), 0.0)
    grads = mat3.matmul_t(f, ir) * r_s_inv[..., None, None]
    d_dev = _xpbd_apply(p, grads, r_s, params.dev_compliance, inv_rest_volume, w_inv, dt)
    p = p + d_dev

    # --- hydrostatic: C = det F - 1 - volC/devC on the *updated* positions
    # (Gauss-Seidel within the element, Softbody.js:134-165)
    f = mat3.matmul(_edge_matrix(p), ir)
    df = mat3.cofactor_columns(f)
    grads = mat3.matmul_t(df, ir)
    det = jnp.sum(f[..., 0] * df[..., 0], axis=-1)
    c_vol = det - 1.0 - params.vol_compliance / params.dev_compliance
    d_vol = _xpbd_apply(p, grads, c_vol, params.vol_compliance, inv_rest_volume, w_inv, dt)

    return d_dev + d_vol, det - 1.0


def project_constraints(pos, arr: TetArrays, dt, params: PhysicsParams, axis_name=None):
    """Colored Gauss-Seidel sweep: scan over color levels, vectorized within
    each level.  Returns (pos, mean volume error diagnostic).

    The per-level tet constants are slot-major (pre-gathered at build time,
    mesh.build_schedule) so each level touches memory only through the
    particle gather/scatter.

    Multi-chip runs do NOT pass ``axis_name`` here: the sharded form lives
    in parallel/nh_shard.py (RCB tet shards + compact per-level boundary
    exchange); this module is the single-chip / per-body-vmapped engine."""
    if axis_name is not None:
        raise ValueError(
            "tet-axis sharding of the neohookean engine moved to "
            "parallel.nh_shard (prepare/make_sharded_step build it); "
            "step_frame(axis_name=...) is polar-only"
        )
    if arr.slot_tets is None:
        raise ValueError(
            "neohookean engine needs a GS schedule: build_arrays(..., "
            "coloring='ordered'|'greedy')"
        )

    def level_body(carry, level):
        pos, vol_err = carry
        ids, irp, irv, valid, imc, inv = level
        p = pos[ids]
        delta, verr = solve_tet_batch(p, irp, irv, imc, dt, params)
        delta = jnp.where(valid[:, None, None], delta, 0.0)
        # scatter-as-gather: each particle is touched by <=1 corner in a
        # level, so the update is a gather of (p + delta) by the
        # precomputed inverse index — ~7x cheaper than scatter-add on
        # TPU (mesh.build_schedule docstring)
        live = inv >= 0
        new_corners = (p + delta).reshape(-1, 3)  # [(C*4), 3]
        gathered = new_corners[jnp.maximum(inv, 0)]
        pos = jnp.where(live[:, None], gathered, pos)
        vol_err = vol_err + jnp.sum(jnp.where(valid, verr, 0.0))
        return (pos, vol_err), None

    levels = (
        arr.slot_tets, arr.slot_inv_rest_pose, arr.slot_inv_rest_volume,
        arr.slot_valid, arr.slot_inv_mass, arr.slot_inv,
    )
    (pos, vol_err), _ = jax.lax.scan(level_body, (pos, jnp.float32(0.0)), levels)
    return pos, vol_err / arr.num_tets


def substep(
    state: SimState,
    arr: TetArrays,
    params: PhysicsParams,
    dt,
    controls: Controls,
    axis_name=None,
):
    """One XPBD substep (Softbody.js:195-240 semantics)."""
    pos, prev_pos, vel = common.predict(
        state.pos, state.vel, dt, params, inv_mass=arr.inv_mass
    )
    pos, vol_err = project_constraints(pos, arr, dt, params, axis_name=axis_name)
    pos = common.collide(pos, prev_pos, dt, params)
    pos = common.apply_grab(pos, controls)
    vel = common.velocity_update(pos, prev_pos, dt)
    return state.replace(pos=pos, prev_pos=prev_pos, vel=vel), vol_err


def step_frame(
    state: SimState,
    arr: TetArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
):
    """One frame = params.num_substeps substeps inside a single trace
    (main.js:79-84 outer loop, moved device-side)."""
    dt = params.dt

    def body(state, _):
        state, vol_err = substep(state, arr, params, dt, controls, axis_name=axis_name)
        return state, vol_err

    state, vol_errs = jax.lax.scan(body, state, None, length=params.num_substeps)
    return state, vol_errs
