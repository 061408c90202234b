"""Jacobi shape-matching solver via Müller's robust polar decomposition —
TPU-native port of the reference GPU path's math (SoftbodyGPU.js passes 3-5).

Per substep, per tet (all tets in parallel — Jacobi):
  1. gather the 4 corner positions, compute the current centroid
     (SoftbodyGPU.js:142-175),
  2. form the covariance A = sum_k rest_k (x) cur_k between the
     *previously-rotated* rest corners and the centered current corners
     (``TransposeMult``, SoftbodyGPU.js:90-105),
  3. extract the incremental rotation with Müller's iterative quaternion
     method (9 fixed iterations; the reference's data-dependent early-out
     branch, SoftbodyGPU.js:122-139, becomes a masked update — fixed trip
     count is the XLA-friendly form),
  4. accumulate it into the per-tet quaternion and build the goal corners
     ``rotate(rest_centered, quat) + centroid`` (SoftbodyGPU.js:249-262),
  5. scatter: every particle moves to the rest-volume-weighted average of its
     incident tets' goal corners (SoftbodyGPU.js:302-320) — here a dense
     ``segment_sum`` instead of the reference's 9-texture scatter-table
     workaround (SoftbodyGPU.js:29-37).

State simplification vs the reference: the ``elems`` MRT textures (rotated
rest corners) are fully determined by (rest_centered, quats, current
centroid), so only ``quats`` is carried (see state.py).

Structural divergences (canonical CPU semantics, params.py): gravity in
prediction, worldBounds from params.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh import TetArrays
from ..params import PhysicsParams
from ..state import SimState, Controls
from ..utils import mat3
from . import common

_EXTRACT_ITERS = 9  # SoftbodyGPU.js:123
_EPS = 1e-9


def quat_rotate(v, q):
    """Rotate v by unit quaternion q=(x,y,z,w)
    (``Rotate``, SoftbodyGPU.js:111-113)."""
    u = q[..., :3]
    w = q[..., 3:4]
    return v + 2.0 * jnp.cross(u, jnp.cross(u, v) + w * v)


def quat_mul(q1, q2):
    """Hamilton product, xyzw layout (``quat_mult``, SoftbodyGPU.js:114-121)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat(q):
    """Rotation matrix columns from a unit quaternion (xyzw): m[...,r,c] with
    column c = R @ e_c — the closed form of rotating the basis vectors
    (numerically identical to quat_rotate on the basis, ~1.3x faster at 1M
    tets because it avoids three cross-product chains)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)], axis=-1),
            jnp.stack([2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)], axis=-1),
            jnp.stack([2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-1,
    )


def extract_rotation(a, q0, iters=_EXTRACT_ITERS):
    """Müller et al., 'A Robust Method to Extract the Rotational Part of
    Deformations': iteratively rotate q toward the covariance a [...,3,3].

    The reference breaks out early when the angular step is tiny
    (SoftbodyGPU.js:135); on TPU we run all iterations with a masked update.
    ``iters`` (static) defaults to the reference's fixed 9; see
    PhysicsParams.extract_iters for when fewer is sound.
    """

    def body(_, q):
        r = quat_to_mat(q)  # [...,3,3] columns X,Y,Z
        # omega = sum_i cross(Rcol_i, Acol_i) / (|sum_i dot(Rcol_i, Acol_i)| + eps)
        cr = jnp.cross(r, a, axisa=-2, axisb=-2, axisc=-2)  # column-wise cross
        num = jnp.sum(cr, axis=-1)
        den = jnp.abs(jnp.sum(r * a, axis=(-1, -2))) + _EPS
        omega = num / den[..., None]
        angle = jnp.linalg.norm(omega, axis=-1)
        live = angle >= _EPS
        axis = omega / jnp.where(live, angle, 1.0)[..., None]
        half = angle * 0.5
        s = jnp.sin(half)
        dq = jnp.concatenate([axis * s[..., None], jnp.cos(half)[..., None]], axis=-1)
        q_new = quat_mul(dq, q)
        return jnp.where(live[..., None], q_new, q)

    return jax.lax.fori_loop(0, iters, body, q0, unroll=True)


def solve_shape_match(pos, quats, arr: TetArrays, axis_name=None,
                      iters=_EXTRACT_ITERS):
    """One Jacobi shape-matching iteration: returns (new pos, new quats).

    When ``axis_name`` is given the tet arrays are a local shard of a mesh
    axis: the per-particle numerator/denominator accumulators are partial
    sums over local tets and are combined with ``lax.psum`` over ICI —
    the multi-chip generalization of the reference's scatter-table pass
    (SoftbodyGPU.js:302-320)."""
    p = pos[arr.tets]  # [M,4,3]
    # explicit add order — must match mesh.rest_state's rest centroid so that
    # exact rest is a bitwise fixed point (A stays exactly symmetric)
    centroid = (
        ((p[..., 0, :] + p[..., 1, :]) + p[..., 2, :]) + p[..., 3, :]
    )[..., None, :] * 0.25
    pc = p - centroid

    rest_rot = quat_rotate(arr.rest_centered, quats[..., None, :])  # [M,4,3]
    # A[r,c] = sum_k cur_k[r] * rest_k[c] — shape-matching covariance
    # A_pq = sum p (x) q whose polar rotation maps rest -> current
    # (TransposeMult, SoftbodyGPU.js:90-105: covariance[col][row] gets
    # left[col]*right[row] with left=rest, right=current)
    a = mat3.outer_sum(pc, rest_rot)

    identity = jnp.zeros_like(quats).at[..., 3].set(1.0)
    inc = extract_rotation(a, identity, iters=iters)
    quats = quat_normalize(quat_mul(inc, quats))

    # goal corner = rotate(rest_centered, quat) + centroid; since the goal's
    # base point is the particle's own position, accumulate the *delta*
    # (goal - corner) instead of absolute goals — algebraically identical to
    # the reference's volume-weighted average of goal positions
    # (SoftbodyGPU.js:302-320, weight = rest volume: its 'invVolume' uniform
    # is 1/(1/V) = V) but exact at rest and accurate far from the origin.
    delta = quat_rotate(arr.rest_centered, quats[..., None, :]) - pc  # [M,4,3]

    w = arr.rest_volume  # [M]
    n = pos.shape[-2]
    weighted = (delta * w[..., None, None]).reshape(-1, 3)  # [M*4, 3]
    if axis_name is None and arr.inc_idx is not None:
        # scatter-as-gather: accumulate each particle's incident corner
        # contributions via the precomputed incidence table (TPU lowers
        # scatter serially; gather is ~7x cheaper — mesh.build_incidence).
        # The weight denominator is static (rest volumes) and precomputed.
        live = arr.inc_idx >= 0  # [N,K]
        contrib = weighted[jnp.maximum(arr.inc_idx, 0)]  # [N,K,3]
        num = jnp.sum(jnp.where(live[..., None], contrib, 0.0), axis=-2)
        den = arr.inc_den
    else:
        seg = arr.tets.reshape(-1)
        num = jax.ops.segment_sum(weighted, seg, num_segments=n)
        den = jax.ops.segment_sum(
            jnp.broadcast_to(w[..., None], arr.tets.shape).reshape(-1),
            seg, num_segments=n,
        )
        if axis_name is not None:
            num = jax.lax.psum(num, axis_name)
            den = jax.lax.psum(den, axis_name)
    # pinned particles (inv_mass == 0) never move — the reference CPU
    # solver's zero-mass convention (Softbody.js:82-85), applied here even
    # though the reference GPU path ignores mass (its invMass sampling is
    # commented out, SoftbodyGPU.js:242-246)
    movable = (arr.inv_mass > 0.0)[..., None]
    new_pos = jnp.where(
        movable, pos + num / jnp.maximum(den[..., None], _EPS), pos
    )
    return new_pos, quats


def substep(
    state: SimState,
    arr: TetArrays,
    params: PhysicsParams,
    dt,
    controls: Controls,
    axis_name=None,
):
    """One XPBD substep with the Jacobi polar solve."""
    pos, prev_pos, vel = common.predict(
        state.pos, state.vel, dt, params, inv_mass=arr.inv_mass
    )
    pos, quats = solve_shape_match(
        pos, state.quats, arr, axis_name=axis_name,
        iters=params.extract_iters,
    )
    pos = common.collide(pos, prev_pos, dt, params)
    pos = common.apply_grab(pos, controls)
    vel = common.velocity_update(pos, prev_pos, dt)
    return state.replace(pos=pos, prev_pos=prev_pos, vel=vel, quats=quats), jnp.float32(0.0)


def step_frame(
    state: SimState,
    arr: TetArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
):
    """One frame = params.num_substeps substeps in a single trace."""
    dt = params.dt

    def body(state, _):
        state, diag = substep(state, arr, params, dt, controls, axis_name=axis_name)
        return state, diag

    state, diags = jax.lax.scan(body, state, None, length=params.num_substeps)
    return state, diags
