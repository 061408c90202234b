"""Substep phases shared by all solver backends.

Canonical semantics follow the reference CPU solver (Softbody.js:195-240):
  predict -> constraint solve (backend-specific) -> collide -> grab ->
  velocity update.
Gravity enters in prediction and world bounds come from params for every
backend (see params.py for the documented divergences from the reference GPU
pass ordering).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import PhysicsParams
from ..state import Controls


def predict(pos, vel, dt, params: PhysicsParams, inv_mass=None):
    """XPBD prediction (Softbody.js:198-202): integrate gravity into
    velocity, save prev_pos, advect positions.

    When ``inv_mass`` is given, pinned particles (inv_mass == 0) are not
    advected.  Divergence note: the reference integrates gravity on every
    particle (Softbody.js:198-202), so its zero-mass "pinned-capable"
    convention (Softbody.js:82-85) only shields particles from constraint
    forces — they still fall; real pins need the prediction gate too."""
    vel = vel.at[..., 1].add(params.gravity * dt)
    if inv_mass is not None:
        vel = jnp.where((inv_mass > 0.0)[..., None], vel, 0.0)
    prev_pos = pos
    pos = pos + vel * dt
    return pos, prev_pos, vel


def collide(pos, prev_pos, dt, params: PhysicsParams):
    """World-bounds clamp + ground plane with 'simple friction'
    (Softbody.js:213-231): tangential position pulled back toward prev_pos
    by min(1, dt*friction)."""
    pos = jnp.clip(pos, params.world_min, params.world_max)
    below = pos[..., 1] < 0.0
    pos_grounded = pos.at[..., 1].set(jnp.where(below, 0.0, pos[..., 1]))
    f = prev_pos - pos_grounded
    k = jnp.minimum(1.0, dt * params.friction)
    slid = pos_grounded.at[..., 0].add(jnp.where(below, f[..., 0] * k, 0.0))
    slid = slid.at[..., 2].add(jnp.where(below, f[..., 2] * k, 0.0))
    return slid


def apply_grab(pos, controls: Controls):
    """Hard position override of grabbed particles (Softbody.js:233-235).

    ``grab_id`` may be a scalar (one grab, reference semantics) or a vector
    of K simultaneous grabs (e.g. one per body of a flattened multi-body
    mesh); negative ids are inactive."""
    gid = controls.grab_id
    if gid.ndim == 0:
        n = pos.shape[-2]
        idx = jnp.arange(n)
        hit = idx == gid
        return jnp.where(hit[..., None], controls.grab_pos, pos)
    n = pos.shape[-2]
    safe = jnp.where(gid >= 0, gid, n)  # out-of-range rows drop
    return pos.at[safe].set(controls.grab_pos, mode="drop")


def norm_grabs(controls: Controls):
    """Controls -> (gid i32 [G], gpos f32 [G,3]): the K-simultaneous-grab
    form shared by the grid/stencil engines (one slot per grabber — the
    reference's one-grabber-per-body scene, Softbody.js:279-298 via
    main.js:56-65, flattened).  A scalar grab_id (reference semantics)
    becomes G=1; negative ids are inactive."""
    gid = jnp.asarray(controls.grab_id)
    gpos = jnp.asarray(controls.grab_pos, jnp.float32)
    if gid.ndim == 0:
        gid = gid[None]
        gpos = gpos[None, :]
    return gid.astype(jnp.int32), gpos.reshape(gid.shape[0], 3)


def velocity_update(pos, prev_pos, dt):
    """vel = (pos - prev_pos)/dt (Softbody.js:238-239)."""
    return (pos - prev_pos) / dt
