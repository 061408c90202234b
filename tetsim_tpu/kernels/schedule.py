"""Host-side precompute for the fused VMEM Gauss-Seidel kernel.

Lays the colored-GS schedule out for a lane-oriented TPU kernel
(kernels/gs_fused.py): bodies occupy sublanes, particles occupy lanes, and
each color level becomes

  * a lane-gather index row  (``ids``   — corner slot -> particle id), and
  * a lane-scatter-as-gather index row (``inv`` — particle -> corner slot,
    -1 when the particle is not in the level; the level's position update is
    then ``where(inv >= 0, gathered_new_corners, pos)``) —

the same scatter->gather inversion the reference used for its per-particle
texture tables (SoftbodyGPU.js:29-37), applied per color level where it is
exact because tets within a level are vertex-disjoint.

Corner slots are corner-major (corner c of slot t lives at row ``c*C + t``)
so the kernel's per-corner blocks are contiguous, and C is padded to a
multiple of 128 so the blocks are lane-tile aligned.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..mesh import TetMesh, color_slots, greedy_color, level_schedule, rest_state


def vmem_budget_bytes() -> tuple[int, int]:
    """(usable budget, vmem_limit_bytes) for the fused VMEM kernels.

    The Pallas default scoped limit (16 MB) is a SOFT cap; v5e's physical
    VMEM is 128 MB and a 100 MB limit is measured to compile and run
    (BENCHNOTES "VMEM soft-limit unlock").  v4/v5p/v6e have >=128 MB VMEM
    as well, so they get the same budget.  Non-TPU backends (interpret
    mode — no real VMEM) get the v5e budget too, so block sizing in the
    hermetic CPU suite matches hardware behavior.  Only unknown/older TPU
    generations fall back to a conservative 14 MB budget under the 16 MB
    default, so sizing failures happen at build time with an actionable
    error, not as an opaque Mosaic allocation failure.
    """
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    if "tpu" not in kind:
        # interpret mode — no real VMEM; use the v5e budget so block
        # sizing matches hardware behavior in hermetic tests
        return 96_000_000, 100_000_000
    if any(t in kind for t in ("v5 lite", "v5e", "v5p", "v5", "v4", "v6")):
        return 96_000_000, 100_000_000
    return 14_000_000, 16_000_000


def ta(x, idx):
    """take_along_axis along lanes — lowers to tpu.dynamic_gather."""
    return jnp.take_along_axis(x, idx, axis=1, mode="promise_in_bounds")


def ta_tiled(x, idx, tiles):
    """Lane-gather decomposed per 128-lane vreg (source and output lengths
    may differ).

    ``x`` [B, Rs] source planes, ``idx`` [B, Ro] lane indices into Rs,
    ``tiles[o]`` = the statically-known source tiles referenced by output
    tile o (host-precomputed — the fused kernels sort their tables so most
    output tiles touch 1-2 source tiles).  Mosaic's ``tpu.dynamic_gather``
    handles one source vreg along the gather dimension ("Multiple source
    vregs along gather dimension" otherwise), so each output tile gathers
    from each of its source tiles and masks the results together."""
    b, ro = idx.shape
    outs = []
    for o in range(ro // 128):
        idx_o = idx[:, o * 128 : (o + 1) * 128]
        src = tiles[o]
        if len(src) == 1:
            t = src[0]
            outs.append(ta(x[:, t * 128 : (t + 1) * 128], idx_o - t * 128))
            continue
        acc = jnp.zeros((b, 128), x.dtype)
        for t in src:
            loc = jnp.clip(idx_o - t * 128, 0, 127)
            g = ta(x[:, t * 128 : (t + 1) * 128], loc)
            hit = (idx_o >= t * 128) & (idx_o < (t + 1) * 128)
            acc = acc + jnp.where(hit, g, 0.0)
        outs.append(acc)
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=1)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class VmemSchedule:
    """Numpy tables consumed by the fused kernel (shapes in comments)."""

    ids: np.ndarray  # i32 [L, R]   lane-gather: corner slot r -> particle id
    inv: np.ndarray  # i32 [L, R]   particle p -> corner slot (or -1)
    irp: np.ndarray  # f32 [L, 9, C] inv_rest_pose rows (row-major r*3+c)
    irv: np.ndarray  # f32 [L, C]   inv rest volume (0 for padded slots)
    imc: np.ndarray  # f32 [L, 4, C] per-corner inverse masses
    inv_mass: np.ndarray  # f32 [N]
    num_particles: int
    num_tets: int
    num_levels: int
    slots_per_level: int  # C (lane-tile padded)
    rows: int  # R = max(N, 4C) rounded to lane tile
    # static source-tile lists for the lane-tiled gather decomposition
    # (Mosaic dynamic_gather handles ONE 128-lane vreg along the gather dim):
    # gather_tiles[l][o] = tuple of source tiles referenced by output tile o
    # of level l's corner gather; scatter_tiles likewise for the inverse map.
    gather_tiles: tuple = ()  # [L][R/128] of tuple[int]
    scatter_tiles: tuple = ()  # [L][R/128] of tuple[int]

    @property
    def L(self):
        return self.num_levels

    @property
    def C(self):
        return self.slots_per_level

    @property
    def R(self):
        return self.rows


def build_vmem_schedule(
    mesh: TetMesh, density: float = 1000.0, coloring: str = "greedy"
) -> VmemSchedule:
    ir, irv_t, _, im, _ = rest_state(mesh, density)
    tets = mesh.tets
    n = mesh.num_particles
    if coloring == "greedy":
        colors = greedy_color(tets, n)
    elif coloring == "ordered":
        colors = level_schedule(tets, n)
    else:
        raise ValueError(f"unknown coloring {coloring!r}")
    slots = color_slots(colors)  # [L, Cmax] of tet ids, -1 padded
    L, cmax = slots.shape
    C = _round_up(max(cmax, 1), 128)
    R = _round_up(max(n, 4 * C), 128)

    ids = np.zeros((L, R), np.int32)
    inv = np.full((L, R), -1, np.int32)
    irp = np.zeros((L, 9, C), np.float32)
    irv = np.zeros((L, C), np.float32)
    imc = np.zeros((L, 4, C), np.float32)

    for l in range(L):
        row = slots[l]
        valid = row >= 0
        t_idx = np.nonzero(valid)[0]
        e = row[t_idx]
        # sort the level's tets by first-corner particle id: within a level
        # tets are vertex-disjoint so any order is exact, and sorted ids
        # concentrate each output lane-tile's gather on few source tiles
        e = e[np.argsort(tets[e, 0], kind="stable")]
        t_idx = np.arange(len(e))
        corners = tets[e]  # [k, 4]
        for c in range(4):
            ids[l, c * C + t_idx] = corners[:, c]
            inv[l, corners[:, c]] = c * C + t_idx
            imc[l, c, t_idx] = im[corners[:, c]]
        # inv_rest_pose rows: irp[l, 3*r + co] = ir[e][:, r, co]
        m = ir[e]  # [k, 3, 3]
        for r in range(3):
            for co in range(3):
                irp[l, 3 * r + co, t_idx] = m[:, r, co]
        irv[l, t_idx] = irv_t[e]

    def tile_lists(table, clamp_lo=0):
        """Per (level, out-tile): sorted tuple of source lane-tiles hit."""
        t = R // 128
        out = []
        for l in range(L):
            vals = np.maximum(table[l], clamp_lo)
            row = []
            for o in range(t):
                src = np.unique(vals[o * 128 : (o + 1) * 128] // 128)
                row.append(tuple(int(x) for x in src))
            out.append(tuple(row))
        return tuple(out)

    return VmemSchedule(
        ids=ids, inv=inv, irp=irp, irv=irv, imc=imc,
        inv_mass=im.astype(np.float32),
        num_particles=n, num_tets=mesh.num_tets,
        num_levels=L, slots_per_level=C, rows=R,
        gather_tiles=tile_lists(ids),
        scatter_tiles=tile_lists(inv),
    )


# ---------------------------------------------------------------------------
# Shared body-axis data-parallel sharding (FusedGSBody / FusedPolarBody)
# ---------------------------------------------------------------------------


def body_shard_config(mesh, axis, B: int, B_blk: int):
    """Validate a body-batch split over ``mesh``'s ``axis`` (name or tuple
    of names) and return (names, bodies_per_device, per_device_block).

    Bodies pack 8 per sublane row and stream through the kernel in blocks,
    so each device's share must be whole sublane rows and whole blocks."""
    names = (axis,) if isinstance(axis, str) else tuple(axis)
    d = 1
    for n in names:
        d *= mesh.shape[n]
    b_loc = B // d
    # the per-device block may be smaller than the single-device one
    # (same VMEM budget, fewer bodies per device)
    blk = min(B_blk, b_loc)
    if B % d != 0 or b_loc % 8 != 0 or b_loc % blk != 0:
        raise ValueError(
            f"batch of {B} bodies must split across {d} devices "
            "into whole 8-body sublane blocks; pad num_bodies"
        )
    return names, b_loc, blk


def make_body_sharded_step(mesh, names, call, n_state: int, n_tables: int):
    """jitted shard_map of a fused per-device kernel over the body axis.

    ``call(par, gid, gpos, *state, *tables)`` -> state (or state tuple):
    state arrays are [planes, B, R] (bodies on dim 1 -> P(None, names)),
    par replicated, gid/gpos per-body P(names), tables replicated.
    On the CPU test backend the returned step serializes dispatch
    (XLA-CPU's in-process communicator deadlocks under interleaved async
    dispatches; see parallel/sharding.py)."""
    import jax
    from jax.sharding import PartitionSpec as P

    body = P(None, names)
    ctrl = P(names)
    rep = P()
    out_specs = (body,) * n_state if n_state > 1 else body
    sm = jax.shard_map(
        call,
        mesh=mesh,
        in_specs=(rep, ctrl, ctrl) + (body,) * n_state + (rep,) * n_tables,
        out_specs=out_specs,
        check_vma=False,
    )
    step = jax.jit(sm)
    if mesh.devices.flat[0].platform != "cpu":
        return step

    def step_sync(*a):
        out = step(*a)
        jax.block_until_ready(out)
        return out

    return step_sync
