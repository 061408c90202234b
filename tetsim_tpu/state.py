"""Simulation state pytrees.

The reference keeps state in typed arrays (Softbody.js:12-17) or ping-ponged
render textures (SoftbodyGPU.js:49-55).  Here it is a single immutable pytree
— functional updates replace ping-pong double buffering, and checkpointing is
just serializing the pytree (a subsystem the reference lacks, SURVEY.md §5).

Note the polar path needs only ``quats`` beyond the common state: the
reference's ``elems`` MRT textures (rotated rest corners, SoftbodyGPU.js:54)
are recomputable as ``rotate(rest_centered, quats) + current centroid``, so
they are not state here.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .mesh import TetMesh, TetArrays


@struct.dataclass
class SimState:
    pos: jnp.ndarray  # f32 [N,3]
    prev_pos: jnp.ndarray  # f32 [N,3]
    vel: jnp.ndarray  # f32 [N,3]
    quats: jnp.ndarray  # f32 [M,4]  per-tet rotation (polar path; xyzw)


@struct.dataclass
class Controls:
    """Per-step interaction inputs (traced — changing them never recompiles).

    grab_id < 0 means no grab (Softbody.js:22-23,233-235).
    """

    grab_id: jnp.ndarray  # int32 scalar
    grab_pos: jnp.ndarray  # f32 [3]

    @staticmethod
    def none() -> "Controls":
        return Controls(grab_id=jnp.int32(-1), grab_pos=jnp.zeros(3, jnp.float32))


def init_state(mesh: TetMesh) -> SimState:
    pos = jnp.asarray(mesh.verts, jnp.float32)
    quats = jnp.zeros((mesh.num_tets, 4), jnp.float32).at[:, 3].set(1.0)
    return SimState(
        pos=pos,
        prev_pos=pos,
        vel=jnp.zeros_like(pos),
        quats=quats,
    )
