"""Multi-chip sharding of the XPBD solvers via ``jax.shard_map``.

The reference is single-device (SURVEY.md §2.5: no distributed backend; its
only cross-domain "communication" is the gather/scatter texture-table pair,
SoftbodyGPU.js:29-37).  The TPU rebuild scales two ways, composable on one
2-D device mesh ``(body, tet)``:

  * **body axis (data parallel)** — many independent soft bodies, ``vmap``
    over a leading batch dim, batch sharded across chips. Zero communication.
  * **tet axis (model/spatial parallel)** — one big mesh's tets sharded
    across chips:

      - ``polar``: per-tet shape matching is local; the per-particle
        numerator/denominator accumulators are partial sums over local tets,
        combined with ONE ``psum`` pair per Jacobi solve (positions are
        replicated — particle state is tiny relative to tet data, ~2 MB for
        a 1M-tet mesh, so replication + psum over ICI beats halo exchange).
      - ``neohookean``: RCB-sharded tets with compact per-level boundary
        exchange — only corners landing on particles SHARED between shards
        ride the interconnect (parallel/nh_shard.py; sum_l Eb_l x 12 bytes
        per substep + one ownership combine per frame, vs the O(levels x N)
        dense-psum placeholder this replaced).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh import TetArrays
from ..state import SimState, Controls
from ..params import PhysicsParams
from ..solvers import get_engine


# ---------------------------------------------------------------------------
# Padding helpers (shard axes must divide evenly)
# ---------------------------------------------------------------------------


def pad_tet_arrays(arr: TetArrays, k: int) -> TetArrays:
    """Pad the tet dimension to a multiple of k with degenerate tets.

    Padding tets reference particle 0 with zero rest volume / zero rest pose:
    they produce zero scatter weight in the polar path and are never listed
    in ``slots``, so they contribute nothing to either solver (the same
    degenerate-tet-masking convention as mesh.rest_state / Softbody.js:389-395).
    """
    m = int(arr.tets.shape[0])
    pad = (-m) % k
    if pad == 0:
        return arr

    def padm(x):
        width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, width)

    return arr.replace(
        tets=padm(arr.tets),
        inv_rest_pose=padm(arr.inv_rest_pose),
        inv_rest_volume=padm(arr.inv_rest_volume),
        rest_volume=padm(arr.rest_volume),
        rest_centered=padm(arr.rest_centered),
    )


def pad_slots(arr: TetArrays, k: int) -> TetArrays:
    """Pad the slot-major GS schedule's column dimension to a multiple of k
    with invalid (masked) slots."""
    c = int(arr.slot_tets.shape[1])
    pad = (-c) % k
    if pad == 0:
        return arr

    def padc(x):
        width = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, width)

    return arr.replace(
        slot_tets=padc(arr.slot_tets),
        slot_inv_rest_pose=padc(arr.slot_inv_rest_pose),
        slot_inv_rest_volume=padc(arr.slot_inv_rest_volume),
        slot_valid=padc(arr.slot_valid),
        slot_inv_mass=padc(arr.slot_inv_mass),
    )


def pad_quats(state: SimState, k: int) -> SimState:
    """Pad per-tet quaternions (trailing identity quats) to a multiple of k."""
    m = int(state.quats.shape[-2])
    pad = (-m) % k
    if pad == 0:
        return state
    width = [(0, 0)] * (state.quats.ndim - 2) + [(0, pad), (0, 0)]
    q = jnp.pad(state.quats, width)
    q = q.at[..., m:, 3].set(1.0)
    return state.replace(quats=q)


# ---------------------------------------------------------------------------
# PartitionSpec pytrees
# ---------------------------------------------------------------------------


def tet_array_specs(
    engine: str,
    tet_axis: Optional[str],
    has_schedule: bool = None,
    has_incidence: bool = None,
) -> TetArrays:
    """Per-leaf PartitionSpecs for TetArrays under a given engine.

    ``has_schedule``/``has_incidence``: whether the arrays carry the
    slot-major GS schedule / polar incidence tables (None fields
    otherwise); default by engine.
    """
    if has_schedule is None:
        has_schedule = engine == "neohookean"
    if has_incidence is None:
        has_incidence = engine == "polar"
    rep = P()
    sched = dict(
        slot_tets=None, slot_inv_rest_pose=None,
        slot_inv_rest_volume=None, slot_valid=None, slot_inv=None,
        slot_inv_mass=None,
    )
    inc = (
        dict(inc_idx=rep, inc_den=rep)
        if has_incidence
        else dict(inc_idx=None, inc_den=None)
    )
    if tet_axis is None:
        if has_schedule:
            sched = {k: rep for k in sched}
        return TetArrays(
            tets=rep, inv_rest_pose=rep, inv_rest_volume=rep, rest_volume=rep,
            inv_mass=rep, rest_centered=rep, **sched, **inc,
        )
    if engine == "polar":
        if has_schedule:
            sched = {k: rep for k in sched}
        return TetArrays(
            tets=P(tet_axis),
            inv_rest_pose=P(tet_axis),
            inv_rest_volume=P(tet_axis),
            rest_volume=P(tet_axis),
            inv_mass=P(),
            rest_centered=P(tet_axis),
            **sched, **inc,
        )
    if engine == "neohookean":
        # Tet constants replicated; the slot-major GS schedule is sharded
        # along its column (within-level) dimension — slot entries are
        # global particle ids, valid on every chip.
        col = P(None, tet_axis)
        return TetArrays(
            tets=rep, inv_rest_pose=rep, inv_rest_volume=rep, rest_volume=rep,
            inv_mass=rep, rest_centered=rep,
            slot_tets=col, slot_inv_rest_pose=col,
            slot_inv_rest_volume=col, slot_valid=col, slot_inv=rep,
            slot_inv_mass=col,
            **inc,
        )
    raise ValueError(f"unknown engine {engine!r}")


def state_specs(engine: str, tet_axis: Optional[str], body_axis: Optional[str]) -> SimState:
    """Per-leaf PartitionSpecs for SimState (optionally body-batched)."""
    lead = (body_axis,) if body_axis is not None else ()
    part = P(*lead)  # particle-indexed leaves: replicated over tet axis
    if engine == "polar" and tet_axis is not None:
        quats = P(*lead, tet_axis)
    else:
        quats = P(*lead)
    return SimState(pos=part, prev_pos=part, vel=part, quats=quats)


def control_specs(body_axis: Optional[str]) -> Controls:
    lead = (body_axis,) if body_axis is not None else ()
    return Controls(grab_id=P(*lead), grab_pos=P(*lead))


# ---------------------------------------------------------------------------
# Sharded step builder
# ---------------------------------------------------------------------------


def make_sharded_step(
    mesh: Mesh,
    engine: str = "polar",
    tet_axis: Optional[str] = "tet",
    body_axis: Optional[str] = None,
):
    """Build ``(state, arr, params, controls) -> (state, diags)`` jitted over
    a device mesh.

    ``tet_axis`` / ``body_axis`` name mesh axes (or None to disable that
    dimension of parallelism).  With ``body_axis`` set, state/controls carry
    a leading batch dim sharded across that axis and the solver is vmapped
    over local bodies.
    """
    st_specs = state_specs(engine, tet_axis, body_axis)
    ct_specs = control_specs(body_axis)
    diag_spec = P(body_axis) if body_axis is not None else P()

    nh_sharded = engine == "neohookean" and tet_axis is not None
    if nh_sharded:
        from . import nh_shard

        step = functools.partial(nh_shard.step_frame, axis_name=tet_axis)
    else:
        step = functools.partial(
            get_engine(engine).step_frame, axis_name=tet_axis
        )
    if body_axis is not None:
        step = jax.vmap(step, in_axes=(0, None, None, 0))

    # NOTE: no donate_argnums — donating the state pytree deadlocks the CPU
    # in-process communicator (virtual-device test mesh); state is small
    # relative to tet constants so the copy is negligible.
    @jax.jit
    def sharded(state, arr, params, controls):
        # params' pytree structure carries static metadata (num_substeps) and
        # arr may or may not carry the GS schedule — derive their spec
        # templates per call so structures always match
        pm_specs = jax.tree.map(lambda _: P(), params)
        if nh_sharded:
            from . import nh_shard

            ar_specs = nh_shard.table_specs(tet_axis, arr)
        else:
            ar_specs = tet_array_specs(
                engine, tet_axis,
                has_schedule=arr.slot_tets is not None,
                has_incidence=arr.inc_idx is not None,
            )
        fn = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(st_specs, ar_specs, pm_specs, ct_specs),
            out_specs=(st_specs, diag_spec),
            check_vma=False,
        )
        return fn(state, arr, params, controls)

    if mesh.devices.flat[0].platform != "cpu":
        return sharded

    # XLA-CPU's in-process communicator deadlocks when many async dispatches
    # of a collective program interleave across virtual devices (device pairs
    # end up in different runs' all-reduce rendezvous).  On the CPU test
    # backend, serialize dispatch; real TPU meshes order collectives in
    # hardware and keep the fully async path above.
    def sharded_sync(state, arr, params, controls):
        out = sharded(state, arr, params, controls)
        jax.block_until_ready(out)
        return out

    return sharded_sync


def place(tree, specs, mesh: Mesh):
    """device_put a pytree with per-leaf PartitionSpecs onto the mesh."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def prepare(
    state: SimState,
    arr: TetArrays,
    mesh: Mesh,
    engine: str = "polar",
    tet_axis: Optional[str] = "tet",
    body_axis: Optional[str] = None,
):
    """Pad + place (state, arr) for ``make_sharded_step`` on this mesh.

    For ``neohookean`` with a tet axis, ``arr``'s GS schedule is regrouped
    into boundary-exchange shard tables (parallel/nh_shard.py) — the
    returned arrays pytree is an ``NHShardTables``, which
    ``make_sharded_step`` expects for that engine."""
    if engine == "neohookean" and tet_axis is not None:
        from . import nh_shard

        pos0 = np.asarray(state.pos)
        if pos0.ndim == 3:  # body-batched: geometry is per-body identical
            pos0 = pos0[0]
        tables = nh_shard.build_nh_shard_tables(
            arr, pos0, mesh.shape[tet_axis]
        )
        state = place(state, state_specs(engine, tet_axis, body_axis), mesh)
        tables = place(tables, nh_shard.table_specs(tet_axis, tables), mesh)
        return state, tables
    if tet_axis is not None:
        k = mesh.shape[tet_axis]
        if engine == "polar":
            arr = pad_tet_arrays(arr, k)
            state = pad_quats(state, k)
        else:
            arr = pad_slots(arr, k)
    state = place(state, state_specs(engine, tet_axis, body_axis), mesh)
    arr = place(
        arr,
        tet_array_specs(
            engine, tet_axis,
            has_schedule=arr.slot_tets is not None,
            has_incidence=arr.inc_idx is not None,
        ),
        mesh,
    )
    return state, arr


def batch_state(state: SimState, n: int, jitter: float = 0.0, seed: int = 0) -> SimState:
    """Tile a single-body state into a batch of n bodies (config 4: 64
    dragons in one World).  ``jitter`` adds a per-body rigid offset so the
    bodies are distinguishable."""
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), state)
    if jitter:
        off = jax.random.uniform(
            jax.random.PRNGKey(seed), (n, 1, 3), minval=-jitter, maxval=jitter
        ).astype(jnp.float32)
        off = off.at[..., 1].set(jnp.abs(off[..., 1]))  # keep above ground
        batched = batched.replace(
            pos=batched.pos + off, prev_pos=batched.prev_pos + off
        )
    return batched


def batch_controls(n: int) -> Controls:
    return Controls(
        grab_id=jnp.full((n,), -1, jnp.int32),
        grab_pos=jnp.zeros((n, 3), jnp.float32),
    )
