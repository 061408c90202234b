"""Multi-body batching and multi-chip sharding (SURVEY.md §2.5 / §7.1
`tetsim/dist`): vmap over bodies, shard_map over a (body, tet) device mesh.
"""
from .sharding import (  # noqa: F401
    make_sharded_step,
    prepare,
    place,
    pad_tet_arrays,
    pad_slots,
    pad_quats,
    batch_state,
    batch_controls,
    state_specs,
    tet_array_specs,
    control_specs,
)
