"""Sharded Neo-Hookean GS with compact per-level boundary exchange.

Replaces the round-4 placeholder that densified every color level's
deltas to the full particle set and ``psum``'d [N,3] per level —
O(levels x N) ICI bytes per substep (~8.4 GB/substep for the ordered
dragon schedule at 1M particles).  The redesign communicates only what
Gauss-Seidel actually requires:

  * tets are RCB-partitioned into S spatial shards (each color level's
    slot columns regrouped shard-major), so a shard's tets cluster and
    only ~surface particles are read by more than one shard;
  * positions are stored replicated-SHAPE per chip but owner-valid:
    each chip applies its own tets' corner updates locally (the same
    scatter-as-gather per-level inverse as the unsharded engine);
  * per level, ONLY the corners that land on SHARED particles (touched
    by >=2 shards anywhere in the schedule) ride the interconnect: a
    compact [Eb,3] buffer with exactly one writer per row (tets within
    a level are vertex-disjoint, so the writer is unique and the whole
    exchange is a zero-padded ``psum``), scattered back through a
    static host-built row->particle table;
  * non-shared particles go stale on non-owner chips — provably unread
    there (a chip only reads particles its own tets touch) — and are
    reconciled once per FRAME by an ownership-masked psum.

Bytes/substep over ICI: sum_l Eb_l x 12 (shared-corner updates) plus
36N per frame for the ownership combine, vs levels x 12N before — see
BENCHNOTES ("Sharded-engine communication volume").

The reference has no distributed backend (SURVEY.md §2.5); this is the
TPU-native scale-out of its CPU solver's sequential Gauss-Seidel
(Softbody.js:195-240), preserving the exact per-level update values —
the sharded run matches the unsharded engine to f32 tolerance because
tets within a level are vertex-disjoint and each tet's solve is
independent of column packing.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import PartitionSpec as P

from ..mesh import TetArrays
from ..params import PhysicsParams
from ..state import SimState, Controls
from ..solvers import common
from ..solvers.neohookean import solve_tet_batch


@struct.dataclass
class NHShardTables:
    """Host-built schedule for the boundary-exchange sharded NH solver.

    Shapes: L color levels, S shards, Cs slot columns per (level, shard),
    Eb exchange rows per level (max over levels), N particles.
    """

    # static
    num_particles: int = struct.field(pytree_node=False)
    num_tets: int = struct.field(pytree_node=False)
    L: int = struct.field(pytree_node=False)
    S: int = struct.field(pytree_node=False)
    Cs: int = struct.field(pytree_node=False)
    Eb: int = struct.field(pytree_node=False)
    # per-shard tables (dim 1 sharded over the tet axis)
    slot_tets: jnp.ndarray = None   # i32 [L, S, Cs, 4]
    slot_irp: jnp.ndarray = None    # f32 [L, S, Cs, 3, 3]
    slot_irv: jnp.ndarray = None    # f32 [L, S, Cs]
    slot_valid: jnp.ndarray = None  # bool [L, S, Cs]
    slot_imc: jnp.ndarray = None    # f32 [L, S, Cs, 4]
    linv: jnp.ndarray = None        # i32 [L, S, N] corner-flat idx or -1
    xw: jnp.ndarray = None          # i32 [L, S, Cs, 4] exchange row or Eb
    owned: jnp.ndarray = None       # bool [S, N] (dim 0 sharded)
    # replicated
    xpid: jnp.ndarray = None        # i32 [L, Eb] exchange row -> pid (N pad)
    inv_mass: jnp.ndarray = None    # f32 [N]


def table_specs(tet_axis: str, like: NHShardTables) -> NHShardTables:
    """Per-leaf PartitionSpecs, carrying ``like``'s static fields so the
    spec pytree's treedef (flax aux data) matches the data pytree's."""
    shard1 = P(None, tet_axis)
    return like.replace(
        slot_tets=shard1, slot_irp=shard1, slot_irv=shard1,
        slot_valid=shard1, slot_imc=shard1, linv=shard1, xw=shard1,
        owned=P(tet_axis), xpid=P(), inv_mass=P(),
    )


def build_nh_shard_tables(
    arr: TetArrays, positions: np.ndarray, n_shards: int
) -> NHShardTables:
    """Regroup an existing GS schedule (mesh.build_schedule) shard-major.

    ``positions``: [N,3] rest/initial particle positions — the RCB
    partition is geometric so each shard's tets cluster spatially and
    the shared-particle set stays ~surface-sized.
    """
    if arr.slot_tets is None:
        raise ValueError(
            "sharded neohookean needs a GS schedule: build_arrays(..., "
            "coloring='ordered'|'greedy')"
        )
    S = int(n_shards)
    if S < 1 or (S & (S - 1)) != 0:
        raise ValueError(f"tet-axis size must be a power of two, got {S}")
    st = np.asarray(arr.slot_tets)              # [L, C, 4]
    irp = np.asarray(arr.slot_inv_rest_pose)    # [L, C, 3, 3]
    irv = np.asarray(arr.slot_inv_rest_volume)  # [L, C]
    val = np.asarray(arr.slot_valid).astype(bool)
    imc = np.asarray(arr.slot_inv_mass)         # [L, C, 4]
    inv_mass = np.asarray(arr.inv_mass, np.float32)
    positions = np.asarray(positions, np.float32)
    L, C, _ = st.shape
    n = inv_mass.shape[0]

    # RCB over valid slots' tet centroids: recursive median halving gives
    # balanced shards (within one tet) of spatially compact tets — the
    # same partition idea as kernels/polar_pieces.rcb_partition, applied
    # to schedule slots (each tet occupies exactly one slot)
    cent = positions[st.reshape(-1)].reshape(L * C, 4, 3).mean(axis=1)
    flat_valid = val.reshape(-1)
    shard_of = np.zeros(L * C, np.int32)
    parts = [np.nonzero(flat_valid)[0]]
    while len(parts) < S:
        nxt = []
        for part in parts:
            c = cent[part]
            ax = int(np.argmax(c.max(axis=0) - c.min(axis=0))) if len(part) else 0
            med = np.argsort(c[:, ax], kind="stable") if len(part) else []
            h = len(part) // 2
            nxt += [part[med[:h]], part[med[h:]]]
        parts = nxt
    for s, part in enumerate(parts):
        shard_of[part] = s
    shard_of = shard_of.reshape(L, C)

    # shard-major regrouped schedule
    counts = np.zeros((L, S), np.int64)
    for l in range(L):
        for s in range(S):
            counts[l, s] = int((val[l] & (shard_of[l] == s)).sum())
    cs = max(1, int(counts.max()))

    sl_t = np.zeros((L, S, cs, 4), np.int32)
    sl_irp = np.zeros((L, S, cs, 3, 3), np.float32)
    sl_irv = np.zeros((L, S, cs), np.float32)
    sl_val = np.zeros((L, S, cs), bool)
    sl_imc = np.zeros((L, S, cs, 4), np.float32)
    linv = np.full((L, S, n), -1, np.int32)

    touch = np.zeros((n, S), bool)
    for l in range(L):
        for s in range(S):
            cols = np.nonzero(val[l] & (shard_of[l] == s))[0]
            k = len(cols)
            sl_t[l, s, :k] = st[l, cols]
            sl_irp[l, s, :k] = irp[l, cols]
            sl_irv[l, s, :k] = irv[l, cols]
            sl_val[l, s, :k] = True
            sl_imc[l, s, :k] = imc[l, cols]
            corners = st[l, cols]  # [k, 4]
            touch[corners.reshape(-1), s] = True
            # corner-flat index j*4 + c into the level's [cs*4, 3] updates
            linv[l, s, corners] = (
                np.arange(k, dtype=np.int32)[:, None] * 4
                + np.arange(4, dtype=np.int32)[None, :]
            )

    shared = touch.sum(axis=1) >= 2
    owner = np.where(touch.any(axis=1), np.argmax(touch, axis=1), 0)
    owned = owner[None, :] == np.arange(S)[:, None]  # [S, N]

    # per-level compact exchange rows: one row per shared-particle corner
    # (unique writer — tets within a level are vertex-disjoint)
    rows_per_level = np.zeros(L, np.int64)
    for l in range(L):
        ps = sl_t[l][sl_val[l]].reshape(-1)
        rows_per_level[l] = int(shared[ps].sum())
    eb = max(1, int(rows_per_level.max()))

    xw = np.full((L, S, cs, 4), eb, np.int32)
    xpid = np.full((L, eb), n, np.int32)
    for l in range(L):
        r = 0
        for s in range(S):
            kk = int(counts[l, s])
            ps = sl_t[l, s, :kk]  # [kk, 4]
            sh = shared[ps]
            for j, c in zip(*np.nonzero(sh)):
                xw[l, s, j, c] = r
                xpid[l, r] = ps[j, c]
                r += 1

    return NHShardTables(
        num_particles=n, num_tets=int(val.sum()), L=L, S=S, Cs=cs, Eb=eb,
        slot_tets=jnp.asarray(sl_t), slot_irp=jnp.asarray(sl_irp),
        slot_irv=jnp.asarray(sl_irv), slot_valid=jnp.asarray(sl_val),
        slot_imc=jnp.asarray(sl_imc), linv=jnp.asarray(linv),
        xw=jnp.asarray(xw), owned=jnp.asarray(owned),
        xpid=jnp.asarray(xpid), inv_mass=jnp.asarray(inv_mass),
    )


def comm_bytes_per_substep(t: NHShardTables) -> int:
    """ICI bytes each substep moves (per chip, send side): the per-level
    shared-corner psums.  The per-frame ownership combine adds 36N once
    per frame on top.  For the BENCHNOTES table."""
    return int(t.L * t.Eb * 12)


def _project(pos, t: NHShardTables, dt, params, axis_name):
    """Colored GS sweep with compact boundary exchange (runs inside
    shard_map: per-shard tables carry a local shard dim of size 1)."""

    def level_body(carry, lev):
        pos, vol_err = carry
        ids, irp, irv, valid, imc, linv, xw, xpid = lev
        ids, irp, irv = ids[0], irp[0], irv[0]
        valid, imc, linv, xw = valid[0], imc[0], linv[0], xw[0]
        p = pos[ids]  # [Cs, 4, 3]
        delta, verr = solve_tet_batch(p, irp, irv, imc, dt, params)
        delta = jnp.where(valid[:, None, None], delta, 0.0)
        newc = (p + delta).reshape(-1, 3)  # [Cs*4, 3]
        # local apply: scatter-as-gather via the per-shard inverse
        live = linv >= 0
        pos = jnp.where(live[:, None], newc[jnp.maximum(linv, 0)], pos)
        # boundary exchange: zero-padded compact buffer, unique writer per
        # row, combined with ONE psum, scattered back by particle id
        u = jnp.zeros((t.Eb + 1, 3)).at[xw.reshape(-1)].set(newc)[: t.Eb]
        u = jax.lax.psum(u, axis_name)
        pos = pos.at[xpid].set(u, mode="drop")
        vol_err = vol_err + jnp.sum(jnp.where(valid, verr, 0.0))
        return (pos, vol_err), None

    levels = (
        t.slot_tets, t.slot_irp, t.slot_irv, t.slot_valid, t.slot_imc,
        t.linv, t.xw, t.xpid,
    )
    (pos, vol_err), _ = jax.lax.scan(
        level_body, (pos, jnp.float32(0.0)), levels
    )
    return pos, jax.lax.psum(vol_err, axis_name) / t.num_tets


def step_frame(
    state: SimState,
    t: NHShardTables,
    params: PhysicsParams,
    controls: Controls,
    axis_name: str,
):
    """One frame of the sharded NH engine (engine step contract).

    Within the frame, non-shared particles are only authoritative on the
    chip whose tets touch them (stale copies elsewhere are never read);
    the frame ends with one ownership-masked psum that republishes the
    authoritative state everywhere, so callers see a replicated SimState.
    """
    dt = params.dt

    def body(st, _):
        pos, prev_pos, vel = common.predict(
            st.pos, st.vel, dt, params, inv_mass=t.inv_mass
        )
        pos, vol_err = _project(pos, t, dt, params, axis_name)
        pos = common.collide(pos, prev_pos, dt, params)
        pos = common.apply_grab(pos, controls)
        vel = common.velocity_update(pos, prev_pos, dt)
        return st.replace(pos=pos, prev_pos=prev_pos, vel=vel), vol_err

    state, vol_errs = jax.lax.scan(body, state, None, length=params.num_substeps)

    owned = t.owned[0]  # local [N]

    def combine(x):
        return jax.lax.psum(jnp.where(owned[:, None], x, 0.0), axis_name)

    state = state.replace(
        pos=combine(state.pos),
        prev_pos=combine(state.prev_pos),
        vel=combine(state.vel),
    )
    return state, vol_errs
