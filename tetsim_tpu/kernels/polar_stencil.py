"""Fused Pallas stencil substep for the polar_grid engine.

The XLA stencil engine (solvers/polar_grid.py) already removed the gather
floor structurally — 2.52 ms/substep at 1M tets — but ~2 ms of that is
fusion/layout overhead: XLA splits the giant elementwise graph (6 tet types
x 9 extractRotation iterations x dozens of temporaries per lane) into many
fusions that materialize intermediates through HBM, plus relayouts for the
unaligned shifted slices.  The measured compute floor (extractRotation alone
on 1M tets) is 0.45 ms.

This kernel closes that gap the Pallas way: ONE kernel per substep, gridded
over blocks of cube lanes, with every intermediate living in VMEM/vregs.
It is the device-kernel counterpart of the reference's GPU solver passes
3-5 (SoftbodyGPU.js:80-323 — solveElemPass / gatherElemPass /
applyElemPass) plus integration (pass 1-2), collision (pass 6) and the
velocity update (pass 7), all fused: where the reference paid seven full
HBM round trips per substep, this kernel reads state once and writes it
once.

Data layout — flat C-order arrays reshaped to [rows, 128] (lanes are the
TPU vector dimension):

  * a stencil shift by (dx,dy,dz) is a flat offset o = dx*gyz + dy*gz + dz;
    in [rows,128] form that is a sublane shift by o//128 plus a LANE ROTATE
    by o%128 (``pltpu.roll``) with a two-source select at the wrap column —
    zero indirection, the Pallas equivalent of the XLA engine's contiguous
    slices,
  * the inverse stencil (particle scatter) is the same rotate with the
    complementary mask, accumulated into a VMEM scratch accumulator.

Math and operation order mirror solvers/polar_grid.py exactly (same
formulas as polar.py = Mueller extractRotation, SoftbodyGPU.js:122-139),
so trajectories match to f32 accumulation-order tolerance.  The only
intentional divergences (each ~1 ulp/substep):
  * velocity is carried as (pos, prev) — v*dt is re-derived as pos-prev
    instead of round-tripping through /dt then *dt,
  * the scatter divide uses a precomputed reciprocal 1/max(den,eps).

Grid-step layout (grid = (num_blocks,), sequential on TPU):
  step 0        : predict positions for ALL lanes + zero the accumulator
  every step b  : solve all 6 tet types on cube-lane block b, write the
                  block's new quats, accumulate goal deltas
  last step     : apply accumulated deltas, collide, grab, finalize
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
from ..solvers.polar_grid import (
    GridArrays,
    _EPS,
    _extract_rotation,
    _qmul,
    _qrot_const,
)

_LANES = 128
_CHUNK = 512  # row chunk for the full-array prologue/epilogue passes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class _Geometry:
    """Static kernel geometry derived from GridArrays' static fields."""

    def __init__(self, dims, slab_offsets, rest_volume):
        nx, ny, nz = dims
        self.dims = dims
        self.gy, self.gz = ny + 1, nz + 1
        self.gyz = self.gy * self.gz
        self.lc = nx * self.gyz  # cube lanes incl. phantoms
        self.nv = (nx + 1) * self.gyz  # vertices
        self.offs = tuple(
            dx * self.gyz + dy * self.gz + dz for (dx, dy, dz) in slab_offsets
        )
        self.q_max = max(o // _LANES for o in self.offs)
        lc_rows = -(-self.lc // _LANES)
        self.rb = 32 if lc_rows >= 32 else _round_up(lc_rows, 8)
        self.nb = -(-lc_rows // self.rb)
        self.rows = _round_up(self.nb * self.rb + self.q_max + 8, 8)
        self.qrows = self.nb * self.rb
        self.n_flat = self.rows * _LANES

    def wmask(self, rest_volume: float) -> np.ndarray:
        """[qrows,128] f32: rest_volume on real cubes, 0 on phantom/tail."""
        nx, ny, nz = self.dims
        c = np.arange(self.qrows * _LANES, dtype=np.int64)
        r = c % self.gyz
        j, k = r // self.gz, r % self.gz
        valid = (c < self.lc) & (j < ny) & (k < nz)
        return (valid * np.float64(rest_volume)).astype(np.float32).reshape(
            self.qrows, _LANES
        )


def _shift_read(ref, base, o, rb, roll):
    """[rb,128] view of flat `ref` shifted by +o from cube-row `base`.

    out[r, l] = flat[(base+r)*128 + l + o]."""
    q, s = divmod(o, _LANES)
    w = ref[pl.ds(base + q, rb + 8), :]
    a = w[0:rb]
    if s == 0:
        return a
    b = w[1 : rb + 1]
    ra = roll(a, _LANES - s)  # ra[l] = a[l+s] for l < 128-s
    rbv = roll(b, _LANES - s)  # rbv[l] = b[l+s-128] for l >= 128-s
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, _LANES), 1)
    return jnp.where(lane < _LANES - s, ra, rbv)


def _shift_accum(ref, val, base, o, rb, roll):
    """flat[(base+r)*128 + l + o] += val[r, l] for the [rb,128] block."""
    q, s = divmod(o, _LANES)
    if s == 0:
        ref[pl.ds(base + q, rb), :] += val
        return
    shifted = roll(val, s)  # shifted[l] = val[l-s] (wrapping)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, _LANES), 1)
    zero = jnp.zeros_like(val)
    ref[pl.ds(base + q, rb), :] += jnp.where(lane >= s, shifted, zero)
    ref[pl.ds(base + q + 1, rb), :] += jnp.where(lane < s, shifted, zero)


def _make_kernel(geom: _Geometry, corner_slab, rest_centered, interpret,
                 epilogue: bool = True, n_grabs: int = 1,
                 extract_iters: int = 9):
    """``epilogue=False`` builds the SHARDED-path variant: it stops after
    accumulation (acc refs are outputs, not scratch) so the multi-chip
    wrapper can halo-exchange boundary accumulator planes between shards
    before applying them (in XLA — apply/collide/grab are elementwise).
    ``n_grabs``: number of simultaneous grab slots (static)."""
    rb, nb, rows, offs = geom.rb, geom.nb, geom.rows, geom.offs

    if interpret:
        roll = lambda x, k: jnp.roll(x, k, axis=1)  # == pltpu.roll semantics
    else:
        roll = lambda x, k: pltpu.roll(x, k, axis=1)

    def kernel(
        par_ref,  # SMEM f32 [1, 9]
        gid_ref,  # SMEM i32 [1, G] grab ids (multi-slot, -1 inactive)
        gpos_ref,  # SMEM f32 [G, 3] grab targets
        px_ref, py_ref, pz_ref,  # VMEM f32 [rows,128] pos at substep start
        ppx_ref, ppy_ref, ppz_ref,  # VMEM f32 [rows,128] prev pos
        movw_ref,  # VMEM f32 [rows,128] movable mask (1/0)
        invden_ref,  # VMEM f32 [rows,128] 1/max(den,eps)
        wmask_ref,  # VMEM f32 [rb,128] blocked: rest_volume * valid
        quat_ref,  # VMEM f32 [24, rb, 128] blocked: t*4+c component planes
        ox_ref, oy_ref, oz_ref,  # VMEM f32 [rows,128] out / working pred
        qout_ref,  # VMEM f32 [24, rb, 128] blocked out
        ax_ref, ay_ref, az_ref,  # VMEM f32 [rows,128] scratch accumulators
    ):
        b = pl.program_id(0)
        dt = par_ref[0, 0]
        gdt2 = par_ref[0, 1]
        friction = par_ref[0, 2]

        # ---- prologue: predict all lanes, zero accumulators --------------
        @pl.when(b == 0)
        def _():
            for r0 in range(0, rows, _CHUNK):
                n = min(_CHUNK, rows - r0)
                sl = slice(r0, r0 + n)
                mov = movw_ref[sl]
                # d = pos - prev (== v*dt incl. last substep's friction/grab)
                dx = (px_ref[sl] - ppx_ref[sl]) * mov
                dy = (py_ref[sl] - ppy_ref[sl] + gdt2) * mov
                dz = (pz_ref[sl] - ppz_ref[sl]) * mov
                ox_ref[sl] = px_ref[sl] + dx
                oy_ref[sl] = py_ref[sl] + dy
                oz_ref[sl] = pz_ref[sl] + dz
                zero = jnp.zeros((n, _LANES), jnp.float32)
                ax_ref[sl] = zero
                ay_ref[sl] = zero
                az_ref[sl] = zero

        # ---- per-block solve: all 6 tet types on cube rows [b*rb, b*rb+rb)
        base = b * rb
        wm = wmask_ref[:]
        # the 8 shifted corner views, shared across types (polar_grid._solve)
        sx = [_shift_read(ox_ref, base, o, rb, roll) for o in offs]
        sy = [_shift_read(oy_ref, base, o, rb, roll) for o in offs]
        sz = [_shift_read(oz_ref, base, o, rb, roll) for o in offs]

        zero = jnp.zeros((rb, _LANES), jnp.float32)
        accx = [zero] * 8
        accy = [zero] * 8
        accz = [zero] * 8

        for t in range(6):
            ks = corner_slab[t]
            cx = [sx[s] for s in ks]
            cy = [sy[s] for s in ks]
            cz = [sz[s] for s in ks]
            ccx = (((cx[0] + cx[1]) + cx[2]) + cx[3]) * 0.25
            ccy = (((cy[0] + cy[1]) + cy[2]) + cy[3]) * 0.25
            ccz = (((cz[0] + cz[1]) + cz[2]) + cz[3]) * 0.25
            pcx = [c - ccx for c in cx]
            pcy = [c - ccy for c in cy]
            pcz = [c - ccz for c in cz]

            qx = quat_ref[t * 4 + 0]
            qy = quat_ref[t * 4 + 1]
            qz = quat_ref[t * 4 + 2]
            qw = quat_ref[t * 4 + 3]
            rr = [
                _qrot_const(rest_centered[t][k], qx, qy, qz, qw)
                for k in range(4)
            ]
            cur = (pcx, pcy, pcz)
            a = [
                [sum(cur[r][k] * rr[k][c] for k in range(4)) for c in range(3)]
                for r in range(3)
            ]
            ix, iy, iz, iw = _extract_rotation(a, iters=extract_iters)
            qx, qy, qz, qw = _qmul(ix, iy, iz, iw, qx, qy, qz, qw)
            norm = jnp.maximum(
                jnp.sqrt(qx * qx + qy * qy + qz * qz + qw * qw), 1e-30
            )
            qx, qy, qz, qw = qx / norm, qy / norm, qz / norm, qw / norm
            qout_ref[t * 4 + 0] = qx
            qout_ref[t * 4 + 1] = qy
            qout_ref[t * 4 + 2] = qz
            qout_ref[t * 4 + 3] = qw

            for k in range(4):
                gx_, gy_, gz_ = _qrot_const(
                    rest_centered[t][k], qx, qy, qz, qw
                )
                s = ks[k]
                accx[s] = accx[s] + (gx_ - pcx[k]) * wm
                accy[s] = accy[s] + (gy_ - pcy[k]) * wm
                accz[s] = accz[s] + (gz_ - pcz[k]) * wm

        for s, o in enumerate(offs):
            _shift_accum(ax_ref, accx[s], base, o, rb, roll)
            _shift_accum(ay_ref, accy[s], base, o, rb, roll)
            _shift_accum(az_ref, accz[s], base, o, rb, roll)

        # ---- epilogue: apply deltas, collide, grab, finalize --------------
        if not epilogue:
            return

        @pl.when(b == nb - 1)
        def _():
            wminx, wminy, wminz = par_ref[0, 3], par_ref[0, 4], par_ref[0, 5]
            wmaxx, wmaxy, wmaxz = par_ref[0, 6], par_ref[0, 7], par_ref[0, 8]
            k = jnp.minimum(1.0, dt * friction)
            for r0 in range(0, rows, _CHUNK):
                n = min(_CHUNK, rows - r0)
                sl = slice(r0, r0 + n)
                movable = movw_ref[sl] > 0.0
                inv = invden_ref[sl]
                x = jnp.where(movable, ox_ref[sl] + ax_ref[sl] * inv, ox_ref[sl])
                y = jnp.where(movable, oy_ref[sl] + ay_ref[sl] * inv, oy_ref[sl])
                z = jnp.where(movable, oz_ref[sl] + az_ref[sl] * inv, oz_ref[sl])
                # collide (common.collide semantics; pp = pos at substep start)
                x = jnp.clip(x, wminx, wmaxx)
                y = jnp.clip(y, wminy, wmaxy)
                z = jnp.clip(z, wminz, wmaxz)
                below = y < 0.0
                y = jnp.where(below, 0.0, y)
                x = x + jnp.where(below, (px_ref[sl] - x) * k, 0.0)
                z = z + jnp.where(below, (pz_ref[sl] - z) * k, 0.0)
                # grab overrides (G slots on global flat vertex index —
                # one per grabber, common.norm_grabs semantics)
                pid = (
                    jax.lax.broadcasted_iota(jnp.int32, (n, _LANES), 0)
                    + r0
                ) * _LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (n, _LANES), 1
                )
                for g in range(n_grabs):
                    hit = pid == gid_ref[0, g]
                    x = jnp.where(hit, gpos_ref[g, 0], x)
                    y = jnp.where(hit, gpos_ref[g, 1], y)
                    z = jnp.where(hit, gpos_ref[g, 2], z)
                ox_ref[sl] = x
                oy_ref[sl] = y
                oz_ref[sl] = z

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(dims, slab_offsets, corner_slab, rest_centered, rest_volume,
                interpret: bool, epilogue: bool, n_grabs: int = 1,
                extract_iters: int = 9):
    """Build the per-substep pallas_call + packed static mask for `dims`.

    ``epilogue=True`` (single-chip form): accumulators are scratch, the
    kernel applies them and returns finalized positions.
    ``epilogue=False`` (sharded form): the kernel stops after accumulation
    and RETURNS the predicted positions, new quats, and the unapplied
    accumulator planes (halo exchange + apply happen outside, see
    make_grid_sharded_stepper).
    """
    geom = _Geometry(dims, slab_offsets, rest_volume)
    kernel = _make_kernel(
        geom, corner_slab, rest_centered, interpret, epilogue=epilogue,
        n_grabs=n_grabs, extract_iters=extract_iters,
    )
    rows, rb, nb, qrows = geom.rows, geom.rb, geom.nb, geom.qrows

    full = pl.BlockSpec(
        (rows, _LANES), lambda b: (0, 0), memory_space=pltpu.VMEM
    )
    qblock = pl.BlockSpec(
        (24, rb, _LANES), lambda b: (0, b, 0), memory_space=pltpu.VMEM
    )
    wblock = pl.BlockSpec(
        (rb, _LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    plane = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    qshape = jax.ShapeDtypeStruct((24, qrows, _LANES), jnp.float32)

    n_acc_out = 0 if epilogue else 3
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=[plane] * 3 + [qshape] + [plane] * n_acc_out,
        in_specs=[smem, smem, smem] + [full] * 8 + [wblock, qblock],
        out_specs=[full, full, full, qblock] + [full] * n_acc_out,
        scratch_shapes=(
            [pltpu.VMEM((rows, _LANES), jnp.float32)] * 3 if epilogue else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # soft-cap unlock (BENCHNOTES); derived from device kind
            vmem_limit_bytes=vmem_budget_bytes()[1],
        ),
        interpret=interpret,
    )
    # cache the mask as NumPy: a jnp array materialized here would be built
    # inside whatever trace first called us and leak its tracer into later
    # traces through the lru_cache
    return geom, call, geom.wmask(rest_volume)


def _make_call(*key, n_grabs: int = 1, extract_iters: int = 9):
    return _build_call(*key, True, n_grabs, extract_iters)


def _make_call_acc(*key, n_grabs: int = 1, extract_iters: int = 9):
    return _build_call(*key, False, n_grabs, extract_iters)


def _geometry_key(arr: GridArrays):
    return (arr.dims, arr.slab_offsets, arr.corner_slab, arr.rest_centered,
            arr.rest_volume)


def _pack_flat(flat, geom: _Geometry):
    """1-D [<=n_flat] -> [rows, 128] zero-padded."""
    out = jnp.zeros((geom.n_flat,), flat.dtype).at[: flat.shape[0]].set(flat)
    return out.reshape(geom.rows, _LANES)


def _pack3(v, geom):
    """[N,3] -> three [rows,128] planes."""
    return tuple(_pack_flat(v[:, c], geom) for c in range(3))


def _unpack3(x, y, z, geom):
    n = geom.nv
    flat = lambda a: a.reshape(-1)[:n]
    return jnp.stack([flat(x), flat(y), flat(z)], axis=-1)


def _pack_quats(quats, geom):
    """[M,4] type-major -> [24, qrows, 128] phantom-padded component planes."""
    nx, ny, nz = geom.dims
    q = quats.reshape(6, nx, ny, nz, 4)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    q = q.reshape(6, geom.lc, 4)
    q = jnp.moveaxis(q, -1, 1).reshape(24, geom.lc)
    q = jnp.pad(q, ((0, 0), (0, geom.qrows * _LANES - geom.lc)))
    return q.reshape(24, geom.qrows, _LANES)


def _unpack_quats(q, geom):
    nx, ny, nz = geom.dims
    gy, gz = ny + 1, nz + 1
    q = q.reshape(24, -1)[:, : geom.lc].reshape(6, 4, nx, gy, gz)
    q = q[:, :, :, :ny, :nz]
    return jnp.moveaxis(q, 1, -1).reshape(-1, 4)


def step_frame(
    state: SimState,
    arr: GridArrays,
    params: PhysicsParams,
    controls: Controls,
    axis_name=None,
    interpret: bool | None = None,
):
    """One frame = num_substeps fused-kernel substeps (engine API).

    Matches solvers/polar_grid.step_frame semantics; `interpret=None`
    auto-selects Pallas interpret mode off-TPU so the engine is usable in
    the hermetic CPU test suite.
    """
    del axis_name
    pack, step, unpack, _ = make_frame_stepper(arr, interpret)
    packed = step(pack(state, params), params, controls)
    # The fused kernel does not compute per-substep solver volume error
    # (that would cost an extra reduction per substep); report NaN rather
    # than a fabricated 0.0 so diag.summarize can omit it.
    return unpack(packed, params), jnp.full(
        (params.num_substeps,), jnp.nan, jnp.float32
    )


def substep(state, arr, params, dt, controls, axis_name=None,
            interpret: bool | None = None):
    """Single-substep entry matching the engine API (used by tests)."""
    del axis_name, dt
    one = params.replace(num_substeps=1)
    new, diags = step_frame(state, arr, one, controls, interpret=interpret)
    return new, diags[0]


# ---------------------------------------------------------------------------
# Packed-state fast path
# ---------------------------------------------------------------------------
#
# The SimState layout ([N,3] positions, [M,4] quats) is hostile to TPU tiles:
# a minor dimension of 3 or 4 pads to the 128-lane tile, so the per-frame
# pack/unpack costs ~1 ms at 1M tets — more than the 0.69 ms fused substep
# itself.  For sustained simulation, keep the state in the kernel's native
# component-plane layout ACROSS frames and convert only at the I/O boundary
# (viewer export, checkpoint).  This mirrors how the reference never reads
# its textures back except on grab (SoftbodyGPU.js:649-668).


def make_frame_stepper(arr: GridArrays, interpret: bool | None = None):
    """Build (pack, step, unpack) over packed component-plane state.

    pack(state)                    -> packed pytree (device layout)
    step(packed, params, controls) -> packed       (num_substeps substeps)
    unpack(packed)                 -> SimState

    step is jit-compatible; state never leaves the tile-friendly layout.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # geometry/mask only; the pallas_call is re-resolved per step for the
    # controls' grab-slot count (lru-cached — repeat steps are a dict hit)
    geom, _, wmask_np = _make_call(*_geometry_key(arr), bool(interpret))
    wmask = jnp.asarray(wmask_np)
    nv = geom.nv
    movw = _pack_flat(
        (arr.inv_mass.reshape(nv) > 0.0).astype(jnp.float32), geom
    )
    invden = _pack_flat(1.0 / jnp.maximum(arr.den.reshape(nv), _EPS), geom)

    def pack(state: SimState, params: PhysicsParams):
        dt = params.dt
        px, py, pz = _pack3(state.pos, geom)
        vx, vy, vz = _pack3(state.vel, geom)
        return (
            (px, py, pz),
            (px - vx * dt, py - vy * dt, pz - vz * dt),
            _pack_quats(state.quats, geom),
        )

    def step(packed, params: PhysicsParams, controls: Controls):
        gid, gpos = norm_grabs(controls)  # [G], [G,3] multi-slot grabs
        _, callg, _ = _make_call(
            *_geometry_key(arr), bool(interpret), n_grabs=gid.shape[0],
            extract_iters=params.extract_iters,
        )
        dt = params.dt
        par = jnp.stack(
            [
                dt,
                params.gravity * dt * dt,
                params.friction,
                params.world_min[0], params.world_min[1], params.world_min[2],
                params.world_max[0], params.world_max[1], params.world_max[2],
            ]
        ).reshape(1, 9).astype(jnp.float32)
        gid = gid.reshape(1, -1)

        def body(carry, _):
            (px, py, pz), _prev, quats = carry
            nx_, ny_, nz_, nq = callg(
                par, gid, gpos, px, py, pz, *_prev, movw, invden, wmask,
                quats
            )
            return ((nx_, ny_, nz_), (px, py, pz), nq), None

        packed, _ = jax.lax.scan(
            body, packed, None, length=params.num_substeps
        )
        return packed

    def unpack(packed, params: PhysicsParams) -> SimState:
        (px, py, pz), (ppx, ppy, ppz), quats = packed
        pos = _unpack3(px, py, pz, geom)
        prev = _unpack3(ppx, ppy, ppz, geom)
        return SimState(
            pos=pos,
            prev_pos=prev,
            vel=(pos - prev) / params.dt,
            quats=_unpack_quats(quats, geom),
        )

    def unpack_pos(packed):
        """Positions only ([N,3]) — the cheap per-render-frame export (the
        full unpack pays the quat relayout; rendering needs only pos)."""
        (px, py, pz), _, _ = packed
        return _unpack3(px, py, pz, geom)

    return pack, step, unpack, unpack_pos


# ---------------------------------------------------------------------------
# Multi-chip: the fused kernel composed with slab sharding
# ---------------------------------------------------------------------------
#
# Same decomposition as solvers/polar_grid.make_grid_sharded_step (device d
# owns lx cube layers; the shared vertex plane is stored by both owners;
# per substep the only communication is one accumulator plane per neighbor
# direction, ~39 KB at the 1M-tet config), but the solve runs through the
# fused Pallas kernel: the epilogue-free variant outputs the UNAPPLIED
# accumulator planes, the wrapper halo-exchanges them with lax.ppermute,
# and the apply/collide/grab tail — pure elementwise — runs in XLA.
# Duplicated boundary planes stay bitwise identical on both owners (each
# adds the same two partial sums; IEEE addition is commutative).


def make_grid_sharded_stepper(mesh, garr: GridArrays, axis: str = "x",
                              interpret: bool | None = None):
    """Build (prepare, step, unprepare) for the Pallas-fused sharded path.

    prepare(state, params)        -> sharded packed pytree
    step(packed, params, controls)-> packed  (num_substeps substeps)
    unprepare(packed, params)     -> SimState

    ``mesh`` is a jax.sharding.Mesh; state lives as stacked per-shard
    component planes [D*rows_loc, 128] sharded on axis 0.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = mesh.shape[axis]
    nx, ny, nz = garr.dims
    if nx % d != 0:
        raise ValueError(f"nx={nx} must divide evenly over {d} devices")
    lx = nx // d
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    gyz = gy * gz
    nv_loc = (lx + 1) * gyz

    geom, call, wmask_np = _make_call_acc(
        (lx, ny, nz), garr.slab_offsets, garr.corner_slab,
        garr.rest_centered, garr.rest_volume, bool(interpret),
    )
    rows = geom.rows
    wmask = jnp.asarray(wmask_np)

    def _stack(a3d):
        """[gx,gy,gz] -> [d*rows, 128]: per-device slabs (duplicated
        boundary plane), each flat-padded to the kernel's row count."""
        slabs = [
            _pack_flat(
                a3d[i * lx : i * lx + lx + 1].reshape(nv_loc), geom
            )
            for i in range(d)
        ]
        return jnp.concatenate(slabs, axis=0)

    def _unstack(s):
        """[d*rows, 128] -> flat [N] (keeps the first copy of shared
        planes)."""
        slabs = s.reshape(d, rows * _LANES)[:, :nv_loc]
        body = slabs[:, : lx * gyz].reshape(-1)
        return jnp.concatenate([body, slabs[d - 1, lx * gyz :]])

    n_loc = geom.lc  # local cube lanes

    def _stack_quats(quats):
        """[M,4] global type-major -> [24, d*qrows, 128]."""
        q = quats.reshape(6, nx, ny, nz, 4)
        blocks = []
        for i in range(d):
            blocks.append(
                _pack_quats(
                    q[:, i * lx : (i + 1) * lx].reshape(-1, 4), geom
                )
            )
        return jnp.concatenate(blocks, axis=1)

    def _unstack_quats(q):
        blocks = q.reshape(24, d, geom.qrows, _LANES)
        parts = [
            _unpack_quats(blocks[:, i], geom).reshape(6, lx, ny, nz, 4)
            for i in range(d)
        ]
        return jnp.concatenate(parts, axis=1).reshape(-1, 4)

    # per-particle constants, sharded like the state
    movw_g = _stack((garr.inv_mass > 0.0).astype(jnp.float32))
    invden_g = _stack(1.0 / jnp.maximum(garr.den, _EPS))

    spec = P(axis)
    qspec = P(None, axis)

    def prepare(state: SimState, params: PhysicsParams):
        dt = params.dt
        sh = lambda a, s: jax.device_put(a, NamedSharding(mesh, s))
        pos3 = [state.pos[:, c].reshape(gx, gy, gz) for c in range(3)]
        vel3 = [state.vel[:, c].reshape(gx, gy, gz) for c in range(3)]
        p = tuple(sh(_stack(pos3[c]), spec) for c in range(3))
        pp = tuple(
            sh(_stack(pos3[c] - vel3[c] * dt), spec) for c in range(3)
        )
        return (p, pp, sh(_stack_quats(state.quats), qspec))

    def unprepare(packed, params: PhysicsParams) -> SimState:
        (px, py, pz), (ppx, ppy, ppz), quats = packed
        pos = jnp.stack([_unstack(px), _unstack(py), _unstack(pz)], axis=-1)
        prev = jnp.stack(
            [_unstack(ppx), _unstack(ppy), _unstack(ppz)], axis=-1
        )
        return SimState(
            pos=pos,
            prev_pos=prev,
            vel=(pos - prev) / params.dt,
            quats=_unstack_quats(quats),
        )

    def _halo(acc):
        """Complete boundary-plane partial sums with one ppermute per
        neighbor direction (the only inter-chip communication)."""
        f = acc.reshape(-1)
        fr = jax.lax.ppermute(
            f[0:gyz], axis, [(i, i - 1) for i in range(1, d)]
        )
        fl = jax.lax.ppermute(
            f[lx * gyz : nv_loc], axis, [(i, i + 1) for i in range(d - 1)]
        )
        f = f.at[lx * gyz : nv_loc].add(fr).at[0:gyz].add(fl)
        return f.reshape(rows, _LANES)

    def _make_shard_body(num_substeps, n_grabs, extract_iters=9):
        _, callg, _ = _make_call_acc(
            (lx, ny, nz), garr.slab_offsets, garr.corner_slab,
            garr.rest_centered, garr.rest_volume, bool(interpret),
            n_grabs=n_grabs, extract_iters=extract_iters,
        )

        def shard_body(p, pp, quats, movw, invden, par, gid, gpos):
            px, py, pz = p
            ppx, ppy, ppz = pp
            x_offset = jax.lax.axis_index(axis).astype(jnp.int32) * (
                lx * gyz
            )
            dt = par[0, 0]
            friction = par[0, 2]
            wmin = par[0, 3:6]
            wmax = par[0, 6:9]
            k = jnp.minimum(1.0, dt * friction)
            pid = (
                jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
                + x_offset
            )
            hits = [pid == gid[0, g] for g in range(n_grabs)]
            movable = movw > 0.0

            def substep(carry, _):
                (px, py, pz), (ppx, ppy, ppz), quats = carry
                prx, pry, prz, nq, ax, ay, az = callg(
                    par, gid, gpos, px, py, pz, ppx, ppy, ppz, movw,
                    invden, wmask, quats,
                )
                ax, ay, az = _halo(ax), _halo(ay), _halo(az)
                # apply + collide + grab — the kernel epilogue's exact op order
                x = jnp.where(movable, prx + ax * invden, prx)
                y = jnp.where(movable, pry + ay * invden, pry)
                z = jnp.where(movable, prz + az * invden, prz)
                x = jnp.clip(x, wmin[0], wmax[0])
                y = jnp.clip(y, wmin[1], wmax[1])
                z = jnp.clip(z, wmin[2], wmax[2])
                below = y < 0.0
                y = jnp.where(below, 0.0, y)
                x = x + jnp.where(below, (px - x) * k, 0.0)
                z = z + jnp.where(below, (pz - z) * k, 0.0)
                for g in range(n_grabs):
                    x = jnp.where(hits[g], gpos[g, 0], x)
                    y = jnp.where(hits[g], gpos[g, 1], y)
                    z = jnp.where(hits[g], gpos[g, 2], z)
                return (((x, y, z), (px, py, pz), nq), None)

            carry, _ = jax.lax.scan(
                substep, ((px, py, pz), (ppx, ppy, ppz), quats), None,
                length=num_substeps,
            )
            return carry

        return shard_body

    @functools.partial(
        jax.jit, static_argnames=("num_substeps", "extract_iters")
    )
    def _sharded(packed, par, gid, gpos, movw, invden, num_substeps,
                 extract_iters=9):
        p, pp, quats = packed
        fn = jax.shard_map(
            _make_shard_body(num_substeps, gid.shape[1], extract_iters),
            mesh=mesh,
            in_specs=(
                (spec,) * 3, (spec,) * 3, qspec, spec, spec, P(), P(), P(),
            ),
            out_specs=((spec,) * 3, (spec,) * 3, qspec),
            check_vma=False,
        )
        return fn(p, pp, quats, movw, invden, par, gid, gpos)

    def step(packed, params: PhysicsParams, controls: Controls):
        gid, gpos = norm_grabs(controls)  # [G], [G,3] multi-slot grabs
        dt = params.dt
        par = jnp.stack(
            [
                dt,
                params.gravity * dt * dt,
                params.friction,
                params.world_min[0], params.world_min[1],
                params.world_min[2],
                params.world_max[0], params.world_max[1],
                params.world_max[2],
            ]
        ).reshape(1, 9).astype(jnp.float32)
        gid = gid.reshape(1, -1)
        out = _sharded(
            packed, par, gid, gpos, movw_g, invden_g, params.num_substeps,
            params.extract_iters,
        )
        if mesh.devices.flat[0].platform == "cpu":
            # serialize dispatch on the CPU test backend (XLA-CPU's
            # in-process communicator deadlocks under interleaved async
            # collective dispatches — see parallel/sharding.py)
            jax.block_until_ready(out)
        return out

    return prepare, step, unprepare
