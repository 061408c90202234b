"""Fused Pallas kernel for the 48-color Neo-Hookean grid GS engine.

This is to ``solvers/neohookean_grid.py`` what ``kernels/polar_stencil.py``
is to ``solvers/polar_grid.py``: the whole substep — predict, the 48-color
Gauss-Seidel sweep, collide, grab, velocity update — runs inside ONE
Pallas kernel with every state plane VMEM-resident.  The XLA engine pays
~48 sequential dispatch+HBM round trips per substep (4.8 ms at 1M tets);
here a color costs 16 shifted VMEM slice reads, one constraint solve on
the parity sub-lattice, and 12 shifted VMEM slice-adds.

Layout: each state component is an ``[8, rows, 128]`` f32 array — 8 cube-
parity blocks (solvers/neohookean_grid parity-block layout) of flat
(hx,hy,hz) sub-lattice lanes, row-major over 128-lane rows.  Corner reads
and the vertex-disjoint scatter of color (type t, parity p) are the SAME
8-offset flat-shift stencil as the polar kernel, one level down: block id
``(p+d)%2`` per axis, flat offset ``dot((p+d)//2, strides)`` — implemented
with the sublane-slice + ``pltpu.roll`` lane-rotate trick
(polar_stencil._shift_read) on the block's plane.

The color ORDER (type-major, parity-minor) and the constraint math
(`neohookean_grid._solve_color`, shared, not copied) match the XLA engine
exactly, so the two trajectories agree to f32 accumulation noise.

Reference lineage: the physics is Softbody.js:91-240; the device-resident
frame (state never leaves the chip mid-substep) is the TPU answer to the
reference's GPU texture ping-pong (MultiTargetGPUComputationRenderer.js).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import PhysicsParams
from ..state import SimState, Controls
from .schedule import vmem_budget_bytes
from ..solvers.common import norm_grabs
from ..solvers.neohookean_grid import (
    NHGridArrays,
    _color_plan,
    _geometry,
    _solve_color,
    _to_blocks,
    _from_blocks,
    collide_grab_phase as nhg_collide_grab,
    predict_phase as nhg_predict,
)

_LANES = 128
_CHUNK = 64  # sublane chunk for whole-state elementwise phases


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class _NHGeometry:
    """Static kernel geometry for dims: block rows and shift bounds."""

    def __init__(self, dims):
        (hx, hy, hz), lh, lhp = _geometry(dims)
        self.dims = dims
        self.h = (hx, hy, hz)
        self.lh = lh
        # rows of solve lanes (the parity sub-lattice), f32-tile aligned
        self.rbc = _round_up(-(-lh // _LANES), 8)
        o_max = hy * hz + hz + 1
        # plane rows: room for the largest shifted read window
        self.rows = _round_up(self.rbc + o_max // _LANES + 9, 8)
        self.n_flat = self.rows * _LANES


def _shift_read(ref, b, o, rbc, roll):
    """[rbc,128] view of block plane ``ref[b]`` shifted by +o lanes.

    out[r, l] = block_flat[r*128 + l + o] (polar_stencil._shift_read with a
    static leading block index)."""
    q, s = divmod(o, _LANES)
    w = ref[b, pl.ds(q, rbc + 8), :]
    a = w[0:rbc]
    if s == 0:
        return a
    bv = w[1 : rbc + 1]
    ra = roll(a, _LANES - s)
    rb = roll(bv, _LANES - s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rbc, _LANES), 1)
    return jnp.where(lane < _LANES - s, ra, rb)


def _shift_accum(ref, b, val, o, rbc, roll):
    """block_flat[r*128 + l + o] += val[r, l] on block plane ``ref[b]``."""
    q, s = divmod(o, _LANES)
    if s == 0:
        ref[b, pl.ds(q, rbc), :] += val
        return
    shifted = roll(val, s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rbc, _LANES), 1)
    zero = jnp.zeros_like(val)
    ref[b, pl.ds(q, rbc), :] += jnp.where(lane >= s, shifted, zero)
    ref[b, pl.ds(q + 1, rbc), :] += jnp.where(lane < s, shifted, zero)


def _lane_coords(geom: _NHGeometry):
    """(ax, ay, az) i32 [rbc,128]: sub-lattice coords of each solve lane."""
    hx, hy, hz = geom.h
    i = (
        jax.lax.broadcasted_iota(jnp.int32, (geom.rbc, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (geom.rbc, _LANES), 1)
    )
    az = i % hz
    ay = (i // hz) % hy
    ax = i // (hy * hz)
    return ax, ay, az


def _emit_sweep(plan, geom, pos_refs, imc_ref, inv_rest_pose,
                inv_rest_volume, dt, dev_c, vol_c, roll):
    """Emit the colored GS sweep over ``plan`` on the (writable) position
    refs — shared by the monolithic kernel and the sharded segment
    kernels so the color order and arithmetic are identical."""
    rbc = geom.rbc
    ox_ref, oy_ref, oz_ref = pos_refs
    ax, ay, az = _lane_coords(geom)
    for t, p, corners, cw in plan:
        ok = (ax < cw[0]) & (ay < cw[1]) & (az < cw[2])
        mask = jnp.where(ok, 1.0, 0.0).astype(jnp.float32)
        pc = [
            [
                _shift_read(ref, b, o, rbc, roll)
                for ref in (ox_ref, oy_ref, oz_ref)
            ]
            for (b, o) in corners
        ]
        imc = [
            _shift_read(imc_ref, b, o, rbc, roll) for (b, o) in corners
        ]
        newp, _ = _solve_color(
            pc, imc, inv_rest_pose[t], inv_rest_volume, dt, dev_c, vol_c
        )
        for k, (b, o) in enumerate(corners):
            _shift_accum(
                ox_ref, b, (newp[k][0] - pc[k][0]) * mask, o, rbc, roll
            )
            _shift_accum(
                oy_ref, b, (newp[k][1] - pc[k][1]) * mask, o, rbc, roll
            )
            _shift_accum(
                oz_ref, b, (newp[k][2] - pc[k][2]) * mask, o, rbc, roll
            )


def _roll_fn(interpret):
    if interpret:
        return lambda x, k: jnp.roll(x, k, axis=1)
    return lambda x, k: pltpu.roll(x, k, axis=1)


def _plan_tables(plan):
    """Static color plan -> i32 tables for the dynamic (fori) sweep:
    (b [C,4] block ids, o [C,4] flat lane offsets, cw [C,3] windows)."""
    b = np.array([[c[0] for c in corners] for _, _, corners, _ in plan],
                 np.int32)
    o = np.array([[c[1] for c in corners] for _, _, corners, _ in plan],
                 np.int32)
    cw = np.array([list(cw) for _, _, _, cw in plan], np.int32)
    return b, o, cw


def _shift_read_dyn(ref, b, o, rbc, roll):
    """_shift_read with TRACED block id and lane offset (SMEM scalars)."""
    q = o // _LANES
    s = o % _LANES
    w = ref[pl.ds(b, 1), pl.ds(q, rbc + 8), :][0]
    a = w[0:rbc]
    bv = w[1 : rbc + 1]
    sr = (_LANES - s) % _LANES
    ra = roll(a, sr)
    rb = roll(bv, sr)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rbc, _LANES), 1)
    return jnp.where(lane < _LANES - s, ra, rb)


def _shift_accum_dyn(ref, b, val, o, rbc, roll):
    """_shift_accum with TRACED block id and lane offset."""
    q = o // _LANES
    s = o % _LANES
    shifted = roll(val, s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rbc, _LANES), 1)
    zero = jnp.zeros_like(val)
    ref[pl.ds(b, 1), pl.ds(q, rbc), :] += jnp.where(
        lane >= s, shifted, zero
    )[None]
    ref[pl.ds(b, 1), pl.ds(q + 1, rbc), :] += jnp.where(
        lane < s, shifted, zero
    )[None]


def _emit_sweep_dyn(groups, geom, pos_refs, imc_ref, btab_ref, otab_ref,
                    cwtab_ref, inv_rest_pose, inv_rest_volume, dt, dev_c,
                    vol_c, roll):
    """The colored GS sweep as fori_loops over parity colors.

    The unrolled _emit_sweep traces 48 colors x ~30 stencil ops — minutes
    of Mosaic/LLVM compile.  Since the 8 parity colors of a type run the
    SAME arithmetic with different (block id, lane offset, window) CONSTANTS,
    they fold into one fori_loop iteration reading those constants from
    SMEM tables: one traced color body per group instead of `count`
    (~8x less code for the monolith's 6x8 plan, 4x for a sharded
    segment's 1x4).  Dynamic machinery: pl.ds with traced starts +
    pltpu.roll with traced shift.  inv_rest_pose stays a per-type
    compile-time constant (the group loop remains unrolled).

    groups: [(kuhn_type, table_base_row, color_count)] — the monolith
    passes [(t, 8*t, 8) for t in range(6)]; a sharded (t, px) segment
    passes [(t, 0, 4)]."""
    rbc = geom.rbc
    ox_ref, oy_ref, oz_ref = pos_refs
    ax, ay, az = _lane_coords(geom)

    for t, base, count in groups:
        def body(pi, _, t=t, base=base):
            ci = base + pi
            cw = [cwtab_ref[ci, i] for i in range(3)]
            ok = (ax < cw[0]) & (ay < cw[1]) & (az < cw[2])
            mask = jnp.where(ok, 1.0, 0.0).astype(jnp.float32)
            bs = [btab_ref[ci, k] for k in range(4)]
            os_ = [otab_ref[ci, k] for k in range(4)]
            pc = [
                [
                    _shift_read_dyn(ref, bs[k], os_[k], rbc, roll)
                    for ref in (ox_ref, oy_ref, oz_ref)
                ]
                for k in range(4)
            ]
            imc = [
                _shift_read_dyn(imc_ref, bs[k], os_[k], rbc, roll)
                for k in range(4)
            ]
            newp, _ = _solve_color(
                pc, imc, inv_rest_pose[t], inv_rest_volume, dt, dev_c,
                vol_c,
            )
            for k in range(4):
                _shift_accum_dyn(
                    ox_ref, bs[k], (newp[k][0] - pc[k][0]) * mask,
                    os_[k], rbc, roll,
                )
                _shift_accum_dyn(
                    oy_ref, bs[k], (newp[k][1] - pc[k][1]) * mask,
                    os_[k], rbc, roll,
                )
                _shift_accum_dyn(
                    oz_ref, bs[k], (newp[k][2] - pc[k][2]) * mask,
                    os_[k], rbc, roll,
                )
            return 0

        jax.lax.fori_loop(0, count, body, 0)


def _make_kernel(geom: _NHGeometry, plan, inv_rest_pose, inv_rest_volume,
                 interpret, dynamic=False, n_grabs=1):
    rows, rbc = geom.rows, geom.rbc
    dims = geom.dims
    gy, gz = dims[1] + 1, dims[2] + 1
    hx, hy, hz = geom.h
    roll = _roll_fn(interpret)

    def kernel(
        par_ref,   # SMEM f32 [1, 12]
        gid_ref,   # SMEM i32 [1, G] grab ids (multi-slot, -1 inactive)
        gpos_ref,  # SMEM f32 [G, 3] grab targets
        *rest,
    ):
        if dynamic:
            btab_ref, otab_ref, cwtab_ref = rest[:3]
            rest = rest[3:]
        (
            imc_ref,   # VMEM f32 [8, rows, 128] inv mass blocks
            x_ref, y_ref, z_ref,     # VMEM pos (aliased out)
            vx_ref, vy_ref, vz_ref,  # VMEM vel (aliased out)
            ox_ref, oy_ref, oz_ref,  # outputs (alias the pos inputs)
            ovx_ref, ovy_ref, ovz_ref,  # outputs (alias the vel inputs)
            px_ref, py_ref, pz_ref,  # VMEM scratch: prev pos
        ) = rest
        dt = par_ref[0, 0]
        gravity = par_ref[0, 1]
        friction = par_ref[0, 2]
        dev_c = par_ref[0, 3]
        vol_c = par_ref[0, 4]
        wmin = [par_ref[0, 5], par_ref[0, 6], par_ref[0, 7]]
        wmax = [par_ref[0, 8], par_ref[0, 9], par_ref[0, 10]]

        # ---- predict: save prev, integrate (neohookean_grid._substep_blocks)
        # Copies flow input->output refs once; every later phase reads AND
        # writes the output refs only (gs_fused's aliasing-safe pattern —
        # inputs alias outputs, so input refs must not be read after this).
        for b in range(8):
            for r0 in range(0, rows, _CHUNK):
                n = min(_CHUNK, rows - r0)
                sl = (b, slice(r0, r0 + n), slice(None))
                movable = imc_ref[sl] > 0.0
                vx = jnp.where(movable, vx_ref[sl], 0.0)
                vy = jnp.where(movable, vy_ref[sl] + gravity * dt, 0.0)
                vz = jnp.where(movable, vz_ref[sl], 0.0)
                x, y, z = x_ref[sl], y_ref[sl], z_ref[sl]
                px_ref[sl] = x
                py_ref[sl] = y
                pz_ref[sl] = z
                ox_ref[sl] = x + vx * dt
                oy_ref[sl] = y + vy * dt
                oz_ref[sl] = z + vz * dt
                ovx_ref[sl] = vx
                ovy_ref[sl] = vy
                ovz_ref[sl] = vz

        # ---- the 48-color GS sweep (same order as the XLA engine) --------
        if dynamic:
            per_t = len(plan) // 6
            _emit_sweep_dyn([(t, t * per_t, per_t) for t in range(6)],
                            geom, (ox_ref, oy_ref, oz_ref),
                            imc_ref, btab_ref, otab_ref, cwtab_ref,
                            inv_rest_pose, inv_rest_volume, dt, dev_c,
                            vol_c, roll)
        else:
            _emit_sweep(plan, geom, (ox_ref, oy_ref, oz_ref), imc_ref,
                        inv_rest_pose, inv_rest_volume, dt, dev_c, vol_c,
                        roll)

        # ---- collide + grab + velocity update ----------------------------
        kf = jnp.minimum(1.0, dt * friction)
        inv_dt = 1.0 / dt
        for b in range(8):
            bx, by, bz = (b >> 2) & 1, (b >> 1) & 1, b & 1
            for r0 in range(0, rows, _CHUNK):
                n = min(_CHUNK, rows - r0)
                sl = (b, slice(r0, r0 + n), slice(None))
                x, y, z = ox_ref[sl], oy_ref[sl], oz_ref[sl]
                px, py, pz = px_ref[sl], py_ref[sl], pz_ref[sl]
                x = jnp.clip(x, wmin[0], wmax[0])
                y = jnp.clip(y, wmin[1], wmax[1])
                z = jnp.clip(z, wmin[2], wmax[2])
                below = y < 0.0
                y = jnp.where(below, 0.0, y)
                x = x + jnp.where(below, (px - x) * kf, 0.0)
                z = z + jnp.where(below, (pz - z) * kf, 0.0)
                # grab: block lane -> global particle id (iota arithmetic,
                # matches neohookean_grid._block_pid)
                i = (
                    jax.lax.broadcasted_iota(jnp.int32, (n, _LANES), 0)
                    + r0
                ) * _LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (n, _LANES), 1
                )
                lz = i % hz
                ly = (i // hz) % hy
                lx = i // (hy * hz)
                gi = 2 * lx + bx
                gj = 2 * ly + by
                gk = 2 * lz + bz
                valid = (
                    (i < geom.lh)
                    & (gi < dims[0] + 1) & (gj < gy) & (gk < gz)
                )
                pid = jnp.where(valid, (gi * gy + gj) * gz + gk, -2)
                for g in range(n_grabs):
                    hit = pid == gid_ref[0, g]
                    x = jnp.where(hit, gpos_ref[g, 0], x)
                    y = jnp.where(hit, gpos_ref[g, 1], y)
                    z = jnp.where(hit, gpos_ref[g, 2], z)
                ox_ref[sl] = x
                oy_ref[sl] = y
                oz_ref[sl] = z
                ovx_ref[sl] = (x - px) * inv_dt
                ovy_ref[sl] = (y - py) * inv_dt
                ovz_ref[sl] = (z - pz) * inv_dt

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(dims, corner_slab, inv_rest_pose, inv_rest_volume,
                interpret: bool, dynamic: bool = False, n_grabs: int = 1):
    """Per-substep pallas_call for `dims` (cached; all args static).

    Returns (geom, call, tables): ``tables`` is None in unrolled mode, or
    the (b, o, cw) SMEM plan tables the dynamic-sweep call expects as
    extra leading operands."""

    class _Arr:  # minimal static view for _color_plan
        pass

    arr = _Arr()
    arr.dims = dims
    arr.corner_slab = corner_slab
    geom = _NHGeometry(dims)
    plan = _color_plan(arr)
    kernel = _make_kernel(geom, plan, inv_rest_pose, inv_rest_volume,
                          interpret, dynamic=dynamic, n_grabs=n_grabs)
    rows = geom.rows

    full = pl.BlockSpec(
        (8, rows, _LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    plane = jax.ShapeDtypeStruct((8, rows, _LANES), jnp.float32)
    n_tab = 3 if dynamic else 0
    base = 4 + n_tab  # operand index of the first aliased plane

    call = pl.pallas_call(
        kernel,
        out_shape=[plane] * 6,
        in_specs=[smem] * (3 + n_tab) + [full] * 7,
        out_specs=[full] * 6,
        # pos/vel update in place: plane inputs alias outputs 0..5
        input_output_aliases={base + i: i for i in range(6)},
        scratch_shapes=[pltpu.VMEM((8, rows, _LANES), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()[1],
        ),
        interpret=interpret,
    )
    # cache NumPy, not jnp (CLAUDE.md: jnp values must not be lru_cached —
    # callers convert per call, so tracing contexts stay clean)
    tables = _plan_tables(plan) if dynamic else None
    return geom, call, tables


def _params_vec(params: PhysicsParams):
    """Params-only SMEM row (grab slots travel separately as gid/gpos —
    vector grabs change shape per grabber count, params do not)."""
    return jnp.stack(
        [
            params.dt, params.gravity, params.friction,
            params.dev_compliance, params.vol_compliance,
            params.world_min[0], params.world_min[1], params.world_min[2],
            params.world_max[0], params.world_max[1], params.world_max[2],
            jnp.float32(0.0),
        ]
    ).reshape(1, 12).astype(jnp.float32)


def _static_key(arr: NHGridArrays):
    return (arr.dims, arr.corner_slab, arr.inv_rest_pose,
            arr.inv_rest_volume)


def _pack_plane(blocks, geom: _NHGeometry):
    """[8, LHp] parity blocks -> [8, rows, 128] zero-padded."""
    lhp = blocks.shape[1]
    out = jnp.zeros((8, geom.n_flat), blocks.dtype)
    out = out.at[:, :lhp].set(blocks)
    return out.reshape(8, geom.rows, _LANES)


def _unpack_plane(plane, dims):
    """[8, rows, 128] -> [Nv] flat component."""
    _, lh, lhp = _geometry(dims)
    return _from_blocks(plane.reshape(8, -1)[:, :lhp], dims)


def make_frame_stepper(arr: NHGridArrays, interpret: bool | None = None,
                       dynamic: bool | None = None):
    """(pack, step, unpack, unpack_pos) with state in kernel layout.

    Mirrors kernels/polar_stencil.make_frame_stepper: ``pack`` once, then
    ``step`` keeps the packed pytree on device across frames (the fast path
    for sustained simulation / the viewer), ``unpack`` only at I/O
    boundaries.

    dynamic: fold the 8 parity colors of each type into one in-kernel
    fori_loop reading (block id, offset, window) from SMEM tables —
    ~8x less traced/compiled code than the fully unrolled sweep, same
    arithmetic (see _emit_sweep_dyn).  Default False (measured-default;
    flip per BENCHNOTES once the runtime cost of dynamic rolls is
    quantified on hardware).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dynamic is None:
        dynamic = False
    # geometry/tables only; the pallas_call itself is re-resolved per step
    # for the controls' grab-slot count (lru-cached, so repeat steps are a
    # dict hit)
    geom, _, tables = _build_call(*_static_key(arr), interpret, dynamic)
    tabs = (
        tuple(jnp.asarray(t) for t in tables) if tables is not None else ()
    )
    dims = arr.dims
    imc = _pack_plane(arr.inv_mass_blocks, geom)

    def pack(state: SimState, params: PhysicsParams):
        del params
        planes = [
            _pack_plane(_to_blocks(a[:, c], dims), geom)
            for a in (state.pos, state.vel)
            for c in range(3)
        ]
        return tuple(planes)  # (X, Y, Z, VX, VY, VZ)

    def step(packed, params: PhysicsParams, controls: Controls):
        gid, gpos = norm_grabs(controls)  # [G], [G,3] multi-slot grabs
        _, callg, _ = _build_call(
            *_static_key(arr), interpret, dynamic, gid.shape[0]
        )
        par = _params_vec(params)
        gid = gid.reshape(1, -1)

        def substep(carry, _):
            out = callg(par, gid, gpos, *tabs, imc, *carry)
            return tuple(out), None

        packed, _ = jax.lax.scan(
            substep, tuple(packed), None, length=params.num_substeps
        )
        return packed

    def unpack(packed, params: PhysicsParams) -> SimState:
        x, y, z, vx, vy, vz = packed
        pos = jnp.stack(
            [_unpack_plane(p, dims) for p in (x, y, z)], axis=-1
        )
        vel = jnp.stack(
            [_unpack_plane(p, dims) for p in (vx, vy, vz)], axis=-1
        )
        quats = jnp.zeros((arr.num_tets, 4), jnp.float32).at[:, 3].set(1.0)
        # prev_pos at the I/O boundary = pos - vel*dt (the kernel's last
        # velocity update is (pos - prev)/dt, so this is exact)
        return SimState(
            pos=pos, prev_pos=pos - vel * params.dt, vel=vel, quats=quats
        )

    def unpack_pos(packed):
        x, y, z = packed[:3]
        return jnp.stack(
            [_unpack_plane(p, dims) for p in (x, y, z)], axis=-1
        )

    return pack, step, unpack, unpack_pos


def step_frame(
    state: SimState,
    arr: NHGridArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
    interpret: bool | None = None,
    dynamic: bool | None = None,
):
    """Engine-API wrapper (one frame = num_substeps fused substeps).

    Per-substep solver volume error is not computed in-kernel (it would
    cost a full reduction per substep); NaN is reported so diag.summarize
    omits it — same convention as kernels/polar_stencil.step_frame.
    """
    del axis_name
    pack, step, unpack, _ = make_frame_stepper(arr, interpret, dynamic)
    packed = step(pack(state, params), params, controls)
    new = unpack(packed, params)
    return state.replace(pos=new.pos, prev_pos=new.prev_pos, vel=new.vel), \
        jnp.full((params.num_substeps,), jnp.nan, jnp.float32)


def substep(state, arr, params, dt, controls, axis_name=None,
            interpret: bool | None = None):
    """Single-substep entry matching the engine API (used by tests)."""
    del axis_name, dt
    one = params.replace(num_substeps=1)
    new, diags = step_frame(state, arr, one, controls, interpret=interpret)
    return new, diags[0]


# ---------------------------------------------------------------------------
# Multi-chip slab sharding of the fused kernel
# ---------------------------------------------------------------------------
#
# The monolithic kernel holds all 48 colors in VMEM — collectives cannot
# run mid-kernel, so the sharded form splits the sweep at exactly the
# points where slabs must communicate: the color plan's 12 cube-x-parity
# groups (solvers/neohookean_grid.py module comment — a px=0 color updates
# each shared vertex plane only from the RIGHT slab, px=1 only from the
# LEFT, no cross-slab reads within a group).  Per substep: XLA predict,
# 12 segment kernels (4 colors each, planes VMEM-resident within a
# segment) with one ppermute vertex-plane send at each group boundary,
# XLA collide/grab/velocity.  The trajectory equals the unsharded
# monolith's exactly — same _emit_sweep arithmetic, same order, and the
# exchanges only refresh replicas of values a single slab computed.


@functools.lru_cache(maxsize=256)
def _build_seg_call(dims, corner_slab, inv_rest_pose, inv_rest_volume,
                    seg: int, interpret: bool, dynamic: bool = False):
    """pallas_call for color group ``seg`` (4 colors = one (t, px) pair):
    (par, imc, X, Y, Z) -> (X, Y, Z), positions aliased in/out.

    dynamic: fold the segment's 4 parity colors into one fori_loop body
    reading (block, offset, window) from SMEM tables (_emit_sweep_dyn) —
    ~4x less traced/compiled code per segment, same trajectory.  The
    returned callable keeps the (par, imc, X, Y, Z) signature either way
    (tables are closed over)."""

    class _Arr:
        pass

    arr = _Arr()
    arr.dims = dims
    arr.corner_slab = corner_slab
    geom = _NHGeometry(dims)
    plan = _color_plan(arr)[4 * seg : 4 * seg + 4]
    t_seg = plan[0][0]
    roll = _roll_fn(interpret)
    rows = geom.rows
    n_tab = 3 if dynamic else 0

    def kernel(par_ref, *rest):
        if dynamic:
            btab_ref, otab_ref, cwtab_ref = rest[:3]
            rest = rest[3:]
        imc_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref = rest
        dt = par_ref[0, 0]
        dev_c = par_ref[0, 3]
        vol_c = par_ref[0, 4]
        for b in range(8):  # aliasing-safe copy-in (gs_fused pattern)
            for r0 in range(0, rows, _CHUNK):
                n = min(_CHUNK, rows - r0)
                sl = (b, slice(r0, r0 + n), slice(None))
                ox_ref[sl] = x_ref[sl]
                oy_ref[sl] = y_ref[sl]
                oz_ref[sl] = z_ref[sl]
        if dynamic:
            _emit_sweep_dyn([(t_seg, 0, len(plan))], geom,
                            (ox_ref, oy_ref, oz_ref), imc_ref,
                            btab_ref, otab_ref, cwtab_ref,
                            inv_rest_pose, inv_rest_volume, dt, dev_c,
                            vol_c, roll)
        else:
            _emit_sweep(plan, geom, (ox_ref, oy_ref, oz_ref), imc_ref,
                        inv_rest_pose, inv_rest_volume, dt, dev_c, vol_c,
                        roll)

    full = pl.BlockSpec(
        (8, rows, _LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    plane = jax.ShapeDtypeStruct((8, rows, _LANES), jnp.float32)
    call = pl.pallas_call(
        kernel,
        out_shape=[plane] * 3,
        in_specs=[smem] * (1 + n_tab) + [full] * 4,
        out_specs=[full] * 3,
        input_output_aliases={2 + n_tab: 0, 3 + n_tab: 1, 4 + n_tab: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()[1],
        ),
        interpret=interpret,
    )
    if not dynamic:
        return geom, call
    btab, otab, cwtab = (jnp.asarray(a) for a in _plan_tables(plan))

    def call_dyn(par, imc, X, Y, Z):
        return call(par, btab, otab, cwtab, imc, X, Y, Z)

    return geom, call_dyn


def _plane_pid(geom: _NHGeometry, dims):
    """Global-grid particle id per packed-plane entry: i32 [8, rows, 128]
    (-2 on padding) — the XLA mirror of the monolith kernel's grab
    decode."""
    gy, gz = dims[1] + 1, dims[2] + 1
    hx, hy, hz = geom.h
    i = (
        jax.lax.broadcasted_iota(jnp.int32, (geom.rows, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (geom.rows, _LANES), 1)
    )
    lz = i % hz
    ly = (i // hz) % hy
    lx = i // (hy * hz)
    pids = []
    for b in range(8):
        bx, by, bz = (b >> 2) & 1, (b >> 1) & 1, b & 1
        gi, gj, gk = 2 * lx + bx, 2 * ly + by, 2 * lz + bz
        valid = (
            (i < geom.lh)
            & (gi < dims[0] + 1) & (gj < gy) & (gk < gz)
        )
        pids.append(jnp.where(valid, (gi * gy + gj) * gz + gk, -2))
    return jnp.stack(pids, axis=0)


def make_nh_sharded_stepper(mesh, arr: NHGridArrays, axis: str = "x",
                            interpret: bool | None = None,
                            compiler_options=None,
                            dynamic: bool = False):
    """(prepare, step, unprepare) for the fused NH kernel sharded over
    ``mesh``'s ``axis`` in cube-column slabs.

    prepare(state, params) -> packed slab planes (6 x [d, 8, rows_l, 128])
    step(packed, params, controls) -> packed   (one frame, jitted)
    unprepare(packed, params) -> SimState

    Weak-scaling form: each chip holds nx/d cube columns; the 12 exchanges
    per substep move one [gy*gz] vertex plane each (~40 KB at 56^3) over
    ICI.  compiler_options: forwarded to XLA (tests pass O0 — see
    solvers/neohookean_grid.make_nh_sharded_step).

    Compile note: 12 separate Mosaic kernels cost ~12x the per-kernel
    compile overhead (~25 min one-time on the tunneled v5e vs ~10 min for
    the monolith at 56^3) — amortized in production runs; use the
    monolithic make_frame_stepper when a single chip suffices."""
    from jax.sharding import PartitionSpec as P
    from ..solvers.neohookean_grid import _slab_geometry

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = mesh.shape[axis]
    nx, ny, nz = arr.dims
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    lx, local_dims = _slab_geometry(arr.dims, d)
    (hxl, hy, hz), lh_l, lhp_l = _geometry(local_dims)
    hyz = hy * hz
    xb_last = lx // 2

    static = (local_dims, arr.corner_slab, arr.inv_rest_pose,
              arr.inv_rest_volume)
    geom_l, _ = _build_seg_call(*static, 0, interpret, dynamic)
    segs = [_build_seg_call(*static, s, interpret, dynamic)[1]
            for s in range(12)]
    rows_l = geom_l.rows
    n_flat = geom_l.n_flat

    # per-slab inv-mass planes (global lumped mass, sliced)
    im = np.asarray(arr.inv_mass).reshape(gx, gy, gz)
    imc = jnp.asarray(
        np.stack(
            [
                np.asarray(
                    _pack_plane(
                        _to_blocks(
                            jnp.asarray(
                                im[i * lx : i * lx + lx + 1].reshape(-1)
                            ),
                            local_dims,
                        ),
                        geom_l,
                    )
                )
                for i in range(d)
            ],
            axis=0,
        )
    )
    pid_planes = _plane_pid(geom_l, local_dims)

    def prepare(state: SimState, params: PhysicsParams):
        del params

        def comp(a):
            g = a.reshape(gx, gy, gz)
            return jnp.stack(
                [
                    _pack_plane(
                        _to_blocks(
                            g[i * lx : i * lx + lx + 1].reshape(-1),
                            local_dims,
                        ),
                        geom_l,
                    )
                    for i in range(d)
                ],
                axis=0,
            )

        return tuple(
            comp(a[:, c]) for a in (state.pos, state.vel) for c in range(3)
        )

    def unprepare(packed, params: PhysicsParams) -> SimState:
        def comp(planes):
            slabs = [
                _from_blocks(
                    planes[i].reshape(8, -1)[:, :lhp_l], local_dims
                ).reshape(lx + 1, gy, gz)[: lx + 1 if i == d - 1 else lx]
                for i in range(d)
            ]
            return jnp.concatenate(slabs, axis=0).reshape(-1)

        pos = jnp.stack([comp(packed[c]) for c in range(3)], axis=-1)
        vel = jnp.stack([comp(packed[3 + c]) for c in range(3)], axis=-1)
        quats = jnp.zeros((arr.num_tets, 4), jnp.float32).at[:, 3].set(1.0)
        return SimState(
            pos=pos, prev_pos=pos - vel * params.dt, vel=vel, quats=quats
        )

    def shard_body(packed, imc_s, params, controls):
        imc_l = imc_s[0]
        idx = jax.lax.axis_index(axis)
        x_offset = idx.astype(jnp.int32) * (lx * gy * gz)
        par = _params_vec(params)
        pid = jnp.where(pid_planes >= 0, pid_planes + x_offset, pid_planes)
        dt = params.dt

        def exchange(X, Y, Z, to_px):
            if d == 1:
                return X, Y, Z
            if to_px == 1:
                perm = [(i, i - 1) for i in range(1, d)]
                src = slice(0, hyz)
                dst = slice(xb_last * hyz, xb_last * hyz + hyz)
                keep = idx < d - 1
            else:
                perm = [(i, i + 1) for i in range(d - 1)]
                src = slice(xb_last * hyz, xb_last * hyz + hyz)
                dst = slice(0, hyz)
                keep = idx > 0

            def ex(A):
                f = A.reshape(8, n_flat)
                recv = jax.lax.ppermute(f[0:4, src], axis, perm)
                cur = f[0:4, dst]
                f = f.at[0:4, dst].set(jnp.where(keep, recv, cur))
                return f.reshape(8, rows_l, _LANES)

            return ex(X), ex(Y), ex(Z)

        def substep(carry, _):
            X, Y, Z, VX, VY, VZ = carry
            PX, PY, PZ = X, Y, Z
            # predict + collide/grab/velocity are the XLA engine's shared
            # phase helpers (solvers/neohookean_grid) on plane-shaped
            # arrays — one source of semantics, not a third copy
            X, Y, Z, VX, VY, VZ = nhg_predict(
                imc_l, X, Y, Z, VX, VY, VZ, params, dt
            )

            for s in range(12):
                if s > 0:
                    # plan is type-major, px-minor: odd segments are px=1
                    X, Y, Z = exchange(X, Y, Z, s % 2)
                X, Y, Z = segs[s](par, imc_l, X, Y, Z)
            X, Y, Z = exchange(X, Y, Z, 0)  # final px=1 updates -> right

            X, Y, Z, VX, VY, VZ = nhg_collide_grab(
                X, Y, Z, PX, PY, PZ, pid, params, dt, controls
            )
            return (X, Y, Z, VX, VY, VZ), None

        carry0 = tuple(a[0] for a in packed)
        carry, _ = jax.lax.scan(
            substep, carry0, None, length=params.num_substeps
        )
        return tuple(a[None] for a in carry)

    slab_p = (P(axis),) * 6

    @jax.jit
    def _step_jit(packed, params, controls):
        pm_specs = jax.tree.map(lambda _: P(), params)
        ct_specs = jax.tree.map(lambda _: P(), controls)
        fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(slab_p, P(axis), pm_specs, ct_specs),
            out_specs=slab_p,
            check_vma=False,
        )
        return fn(packed, imc, params, controls)

    if compiler_options is None:
        step_inner = _step_jit
    else:
        cache = {}

        def step_inner(packed, params, controls):
            # full retrace key: static fields live in the treedef, grab-slot
            # width in the leaf shapes (round-4 review: num_substeps alone
            # served a stale executable after a controls-shape change)
            leaves, treedef = jax.tree.flatten((params, controls))
            key = (treedef,
                   tuple((jnp.shape(l), jnp.result_type(l)) for l in leaves))
            if key not in cache:
                cache[key] = _step_jit.lower(
                    packed, params, controls
                ).compile(compiler_options)
            return cache[key](packed, params, controls)

    if mesh.devices.flat[0].platform != "cpu":
        return prepare, step_inner, unprepare

    def step_sync(packed, params, controls):
        # serialize dispatch on the CPU test backend (parallel/sharding.py)
        out = step_inner(packed, params, controls)
        jax.block_until_ready(out)
        return out

    return prepare, step_sync, unprepare
