"""Physics parameter dataclass.

Mirrors the reference's ``physicsParams`` config object
(/root/reference/src/main.js:22-36) — same fields, same defaults — but as a
JAX pytree so parameters are *traced arguments* of the jitted step function:
live-tuning gravity/friction/compliance never triggers a recompile.

Only ``num_substeps`` is static (it sets the length of the in-jit substep
loop).

Canonical semantics notes (SURVEY.md §7.3):
  * ``world_bounds`` is respected by ALL solver backends (the reference's GPU
    path hard-codes the bounds, SoftbodyGPU.js:347 — not replicated).
  * gravity is applied in the prediction step for ALL backends (the
    reference's GPU path adds it post-hoc in the velocity pass,
    SoftbodyGPU.js:364-376 — a known bug per its README:29, not replicated).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PhysicsParams:
    """Tunable physics parameters (pytree leaves except num_substeps)."""

    gravity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-9.81))
    time_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    time_step: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0 / 60.0))
    friction: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1000.0))
    density: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1000.0))
    dev_compliance: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0 / 100000.0))
    vol_compliance: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    # worldBounds [-2.5,-1,-2.5, 2.5,10,2.5] (main.js:32), split min/max.
    world_min: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([-2.5, -1.0, -2.5], jnp.float32)
    )
    world_max: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([2.5, 10.0, 2.5], jnp.float32)
    )
    # Static: length of the substep loop inside one jitted frame step.
    # Reference defaults: 5 (CPU solver) / 20 (GPU solver), main.js:26.
    num_substeps: int = struct.field(pytree_node=False, default=5)
    # Static: Mueller extractRotation iterations in the polar solvers.
    # The reference runs a fixed 9 with a per-thread early-out
    # (SoftbodyGPU.js:123-137); TPU lanes run in lockstep so every lane
    # pays the full count — the default 9 preserves reference parity, and
    # lowering it (the solve is warm-started: each substep extracts only
    # the small residual rotation against the last-rotated rest pose) is
    # the measured perf lever for polar-path kernels, which sit on the
    # extractRotation VPU floor (scripts/roofline.py).  Changing it
    # retraces/recompiles, like num_substeps.
    extract_iters: int = struct.field(pytree_node=False, default=9)

    @property
    def dt(self):
        """Per-substep timestep (main.js:79)."""
        return self.time_scale * self.time_step / self.num_substeps


def default_cpu_params() -> PhysicsParams:
    """Parameters matching the reference CPU solver config (?cpu=true)."""
    return PhysicsParams(num_substeps=5)


def default_gpu_params() -> PhysicsParams:
    """Parameters matching the reference GPU solver config."""
    return PhysicsParams(num_substeps=20)
