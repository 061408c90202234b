"""Checkpoint / resume — a subsystem the reference lacks entirely
(SURVEY.md §5: sim state lives in arrays/textures and is never serialized).

The sim state is a pytree, so checkpointing is flatten + npz.  ``save``/
``load`` round-trip SimState (or any pytree of arrays) bit-exactly; resuming
a run from a checkpoint continues the identical trajectory (tested).
"""
from __future__ import annotations

import numpy as np
import jax

from .state import SimState


def save(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load(path: str, like=None):
    """Load a checkpoint. If ``like`` (a pytree of the same structure) is
    given, the result is unflattened into that structure; otherwise a
    SimState is assumed."""
    with np.load(path) as z:
        n = sum(1 for k in z.files if k.startswith("leaf"))
        leaves = [jax.numpy.asarray(z[f"leaf{i}"]) for i in range(n)]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return SimState(pos=leaves[0], prev_pos=leaves[1], vel=leaves[2], quats=leaves[3])
