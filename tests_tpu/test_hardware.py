"""Real-TPU correctness + performance-floor tests.

These make the BENCHNOTES parity/rate claims executable: a Mosaic or XLA
regression on the benched paths fails here instead of silently producing
a wrong headline number (VERDICT r1 weak-point #3).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine


def _frame_loop(step, state, arr, params, controls, frames):
    for _ in range(frames):
        state, _ = step(state, arr, params, controls)
    return state


def test_fused_kernel_matches_xla_engine_on_hardware(dragon):
    """The headline bench path: fused VMEM Pallas kernel vs the classic XLA
    neohookean engine, 10 frames on the dragon (the BENCHNOTES '~1e-5 over
    10 frames' claim, now enforced)."""
    from tetsim_tpu.kernels import FusedGSBody

    params = ts.PhysicsParams(num_substeps=5)
    body = FusedGSBody(dragon, num_bodies=8, interpret=False)
    body.step(params, frames=10)
    fused_pos = body.positions()  # [8, N, 3]

    arr = ts.build_arrays(dragon, coloring="greedy")
    step = jax.jit(get_engine("neohookean").step_frame)
    state = _frame_loop(
        step, ts.init_state(dragon), arr, params, ts.Controls.none(), 10
    )
    xla_pos = np.asarray(state.pos)

    for b in range(8):
        np.testing.assert_allclose(fused_pos[b], xla_pos, atol=5e-5)


def test_polar_engine_lowers_and_settles(dragon):
    """Polar Jacobi lowering smoke on hardware: finite, above floor."""
    arr = ts.build_arrays(dragon, coloring=None)
    params = ts.PhysicsParams(num_substeps=20)
    step = jax.jit(get_engine("polar").step_frame)
    state = _frame_loop(
        step, ts.init_state(dragon), arr, params, ts.Controls.none(), 30
    )
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-4


def test_polar_grid_stencil_on_hardware():
    """Stencil engine lowering + physics sanity at a mid-size grid."""
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays

    dims = (16, 8, 16)
    mesh = ts.grid_mesh(*dims, cell=0.05, origin=(-0.4, 0.3, -0.4))
    garr = build_grid_arrays(mesh, dims)
    params = ts.PhysicsParams(num_substeps=5)
    step = jax.jit(get_engine("polar_grid").step_frame)
    state = _frame_loop(
        step, ts.init_state(mesh), garr, params, ts.Controls.none(), 60
    )
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-4


def _two_point_rate(run1, run2, k1, k2, state):
    """Honest substeps/s (BENCHNOTES methodology): data-dependent transfer
    ends the timed region; two-point fit cancels the round trip."""

    def timed(run):
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = run(state)
            float(out.pos.sum())
        return (time.perf_counter() - t0) / reps

    timed(run1)  # warm
    timed(run2)
    t1, t2 = timed(run1), timed(run2)
    return (t2 - t1) / (k2 - k1)


def _xla_engine_frame_time(engine, coloring, dragon, params, k1=10, k2=40):
    """Per-frame time of an XLA engine on the dragon, two-point fit."""
    arr = ts.build_arrays(dragon, coloring=coloring)
    step = get_engine(engine).step_frame
    controls = ts.Controls.none()

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                s, _ = step(s, arr, params, controls)
                return s, None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    return _two_point_rate(
        runner(k1), runner(k2), k1, k2, ts.init_state(dragon)
    )


def test_fused_dragon_rate_floor(dragon):
    """RATIO floor (VERDICT r2 weak #3): the fused VMEM kernel must beat the
    XLA neohookean engine by >=3x per frame, measured in the SAME session —
    immune to the relay's ~2.4x ambient variance, unlike an absolute floor
    (the fused/XLA ratio measures 4-10x; a halving regression fails).
    A loose absolute backstop (>2k substeps/s/body) catches the case where
    both paths break together."""
    from tetsim_tpu.kernels import FusedGSBody

    params = ts.PhysicsParams(num_substeps=5)
    body = FusedGSBody(dragon, num_bodies=8, interpret=False)
    k1, k2 = 100, 600

    def timed(frames):
        t0 = time.perf_counter()
        body.step(params, frames=frames)
        float(np.asarray(body.state).sum())
        return time.perf_counter() - t0

    timed(k1)  # compile + warm
    timed(k2)
    t1, t2 = timed(k1), timed(k2)
    fused_per_frame = (t2 - t1) / (k2 - k1)
    rate = params.num_substeps / fused_per_frame
    assert rate > 2000, f"fused dragon rate broke: {rate:.0f} substeps/s"

    xla_per_frame = _xla_engine_frame_time("neohookean", "greedy", dragon, params)
    ratio = xla_per_frame / fused_per_frame
    assert ratio > 3.0, (
        f"fused GS kernel only {ratio:.2f}x the XLA engine "
        f"({fused_per_frame*1e3:.3f} vs {xla_per_frame*1e3:.3f} ms/frame)"
    )


def test_polar_grid_rate_floor():
    """1M-tet stencil engine floor: <16 ms/substep (the 60 Hz v5e-8 target
    needs <=16 ms single-chip at 8x scaling slack; measured 2.99 ms)."""
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays

    n = 56
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-0.56, 0.5, -0.56))
    garr = build_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=1)
    step = get_engine("polar_grid").step_frame
    controls = ts.Controls.none()

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                s, _ = step(s, garr, params, controls)
                return s, None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    k1, k2 = 30, 200
    per_frame = _two_point_rate(
        runner(k1), runner(k2), k1, k2, ts.init_state(mesh)
    )
    assert per_frame < 16e-3, (
        f"1M-tet stencil substep regressed: {per_frame*1e3:.2f} ms"
    )


def test_polar_stencil_kernel_matches_xla_on_hardware():
    """Fused Pallas stencil kernel (kernels/polar_stencil.py) vs the XLA
    stencil engine, real Mosaic lowering, 10 frames on a 16^3 grid."""
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays

    n = 16
    mesh = ts.grid_mesh(n, n, n, cell=0.1, origin=(0.0, 0.5, 0.0))
    garr = build_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=4)
    controls = ts.Controls.none()
    step_x = jax.jit(get_engine("polar_grid").step_frame)
    step_p = jax.jit(
        lambda s, a, p, c: get_engine("polar_grid_pallas").step_frame(
            s, a, p, c, interpret=False
        )
    )
    s_x, s_p = ts.init_state(mesh), ts.init_state(mesh)
    for _ in range(10):
        s_x, _ = step_x(s_x, garr, params, controls)
        s_p, _ = step_p(s_p, garr, params, controls)
    np.testing.assert_allclose(s_x.pos, s_p.pos, atol=5e-5)
    np.testing.assert_allclose(s_x.quats, s_p.quats, atol=5e-5)


def test_polar_stencil_packed_rate_floor():
    """1M-tet fused-kernel floor: <2 ms/substep on the packed path
    (measured 0.674 ms; 2 ms catches a 3x regression without flaking)."""
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays
    from tetsim_tpu.kernels.polar_stencil import make_frame_stepper

    n = 56
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-0.56, 0.5, -0.56))
    garr = build_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_frame_stepper(garr, interpret=False)
    packed0 = pack(ts.init_state(mesh), params)

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                return step(s, params, controls), None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    k1, k2 = 50, 400
    run1, run2 = runner(k1), runner(k2)

    def timed(run):
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = run(packed0)
            float(jax.tree.leaves(out)[0].sum())
        return (time.perf_counter() - t0) / reps

    timed(run1)
    timed(run2)
    t1, t2 = timed(run1), timed(run2)
    per_substep = (t2 - t1) / (k2 - k1)
    assert per_substep < 4e-3, (
        f"1M-tet fused stencil substep broke: {per_substep*1e3:.3f} ms"
    )

    # RATIO floor (VERDICT r2 weak #3): fused kernel >= 2.5x the XLA
    # stencil engine measured in the same session (measures ~3.7x;
    # variance-immune — a halving regression fails the lane)
    xstep = get_engine("polar_grid").step_frame

    def xrunner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                s, _ = xstep(s, garr, params, controls)
                return s, None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    xk1, xk2 = 20, 120
    xla_per_substep = _two_point_rate(
        xrunner(xk1), xrunner(xk2), xk1, xk2, ts.init_state(mesh)
    )
    ratio = xla_per_substep / per_substep
    assert ratio > 2.5, (
        f"fused stencil kernel only {ratio:.2f}x the XLA stencil engine "
        f"({per_substep*1e3:.3f} vs {xla_per_substep*1e3:.3f} ms/substep)"
    )


def test_fused_polar_matches_xla_on_hardware(dragon):
    """Fused VMEM polar kernel (kernels/polar_fused.py) vs the XLA polar
    engine, real Mosaic lowering, 10 frames x 20 substeps on the dragon
    (the reference GPU config, main.js:26)."""
    from tetsim_tpu.kernels.polar_fused import FusedPolarBody

    params = ts.PhysicsParams(num_substeps=20)
    body = FusedPolarBody(dragon, num_bodies=8, interpret=False)
    body.step(params, frames=10)
    fp = body.positions()

    arr = ts.build_arrays(dragon, coloring=None)
    step = jax.jit(get_engine("polar").step_frame)
    state = _frame_loop(
        step, ts.init_state(dragon), arr, params, ts.Controls.none(), 10
    )
    xla_pos = np.asarray(state.pos)
    for b in range(8):
        np.testing.assert_allclose(fp[b], xla_pos, atol=5e-5)


def test_fused_polar_rate_floor(dragon):
    """RATIO floor: fused polar kernel >= 1.8x the XLA polar engine per
    frame, same session (measures ~2.7x; a 2x regression fails).  Loose
    absolute backstop >3k substeps/s/body."""
    from tetsim_tpu.kernels.polar_fused import FusedPolarBody

    params = ts.PhysicsParams(num_substeps=20)
    body = FusedPolarBody(dragon, num_bodies=8, interpret=False)

    def timed(frames):
        t0 = time.perf_counter()
        body.step(params, frames=frames)
        float(np.asarray(body.state).sum())
        return time.perf_counter() - t0

    k1, k2 = 20, 120
    timed(k1)  # compile + warm
    timed(k2)
    t1, t2 = timed(k1), timed(k2)
    per_frame = (t2 - t1) / (k2 - k1)
    rate = params.num_substeps / per_frame
    assert rate > 3000, f"fused polar rate broke: {rate:.0f} substeps/s"

    xla_per_frame = _xla_engine_frame_time("polar", None, dragon, params)
    ratio = xla_per_frame / per_frame
    assert ratio > 1.8, (
        f"fused polar kernel only {ratio:.2f}x the XLA engine "
        f"({per_frame*1e3:.3f} vs {xla_per_frame*1e3:.3f} ms/frame)"
    )


def test_neohookean_grid_matches_generic_on_hardware():
    """Structured 48-color GS stencil engine vs the generic XLA engine
    running the identical grid coloring — real lowering, 10 frames."""
    from tetsim_tpu.solvers import neohookean_grid as nhg

    dims = (8, 8, 8)
    mesh = ts.grid_mesh(*dims, cell=0.1, origin=(-0.4, 0.5, -0.4))
    arr_g = ts.build_arrays(mesh, coloring=nhg.grid_coloring(dims))
    arr_s = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    step_g = jax.jit(get_engine("neohookean").step_frame)
    step_s = jax.jit(nhg.step_frame)
    sg, ss = ts.init_state(mesh), ts.init_state(mesh)
    for _ in range(10):
        sg, _ = step_g(sg, arr_g, params, controls)
        ss, _ = step_s(ss, arr_s, params, controls)
    np.testing.assert_allclose(sg.pos, ss.pos, atol=5e-5)


def test_neohookean_grid_rate_floor():
    """1M-tet Neo-Hookean GS floor: <16 ms/substep (VERDICT r2 item 4 'done'
    criterion — down from the generic engine's 82 ms)."""
    from tetsim_tpu.solvers.neohookean_grid import build_nh_grid_arrays

    n = 56
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-0.56, 0.5, -0.56))
    arr = build_nh_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=1)
    step = get_engine("neohookean_grid").step_frame
    controls = ts.Controls.none()

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                s, _ = step(s, arr, params, controls)
                return s, None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    k1, k2 = 20, 120
    per_frame = _two_point_rate(
        runner(k1), runner(k2), k1, k2, ts.init_state(mesh)
    )
    assert per_frame < 16e-3, (
        f"1M-tet neohookean_grid substep regressed: {per_frame*1e3:.2f} ms"
    )


def test_polar_pieces_matches_xla_on_hardware():
    """Piecewise fused kernel (kernels/polar_pieces.py) vs the XLA polar
    engine, real Mosaic lowering, on an irregular blob."""
    from tetsim_tpu.kernels.polar_pieces import build_pieces_arrays, step_frame

    blob = ts.ellipsoid_mesh(10, radii=(0.4, 0.35, 0.45), center=(0, 0.8, 0))
    parr = build_pieces_arrays(blob, tets_per_piece=512)
    arrx = ts.build_arrays(blob, coloring=None)
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    step_x = jax.jit(get_engine("polar").step_frame)
    step_p = jax.jit(
        lambda s: step_frame(s, parr, params, controls, interpret=False)[0]
    )
    sx, sp = ts.init_state(blob), ts.init_state(blob)
    for _ in range(6):
        sx, _ = step_x(sx, arrx, params, controls)
        sp = step_p(sp)
    np.testing.assert_allclose(sp.pos, sx.pos, atol=5e-5)


def test_polar_pieces_rate_floor():
    """Single connected unstructured ~1M-tet mesh, sustained (packed piece
    planes across frames): <16 ms/substep (>60 Hz, VERDICT r2 item 3
    'done' criterion — the XLA polar engine reads 71 ms on this shape;
    measured 6.56 ms)."""
    from tetsim_tpu.kernels.polar_pieces import (
        build_pieces_arrays, make_pieces_stepper,
    )

    blob = ts.ellipsoid_mesh(68, radii=(0.68,) * 3, center=(0.0, 0.75, 0.0))
    arr = build_pieces_arrays(blob)
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_pieces_stepper(arr, interpret=False)
    packed0 = pack(ts.init_state(blob), params)

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                return step(s, params, controls), None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    k1, k2 = 20, 120
    run1, run2 = runner(k1), runner(k2)

    def timed(run):
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = run(packed0)
            float(jax.tree.leaves(out)[0].sum())
        return (time.perf_counter() - t0) / reps

    timed(run1)
    timed(run2)
    t1, t2 = timed(run1), timed(run2)
    per_substep = (t2 - t1) / (k2 - k1)
    assert per_substep < 16e-3, (
        f"1M-tet pieces substep regressed: {per_substep*1e3:.2f} ms"
    )


def test_long_run_stability(dragon):
    """Soak: 10,000 frames (50k substeps) of the fused dragon kernel and
    2,000 substeps of the 1M-tet stencil stay finite with bounded energy —
    catches slow NaN/drift accumulation no short parity test would."""
    from tetsim_tpu.kernels import FusedGSBody
    from tetsim_tpu.kernels.polar_stencil import make_frame_stepper
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays

    params = ts.PhysicsParams(num_substeps=5)
    body = FusedGSBody(dragon, num_bodies=8, interpret=False)
    body.step(params, frames=5_000)
    v_mid = float(np.abs(body.velocities()).max())
    body.step(params, frames=5_000)
    pos, vel = body.positions(), body.velocities()
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    assert pos[..., 1].min() >= -1e-4  # still respecting the floor
    # XPBD has no internal damping (the reference model likewise — only
    # ground friction dissipates, Softbody.js:222-225), so the dragon
    # rings in a bounded limit cycle (~12.7 m/s plateau, measured
    # stationary through 20k frames).  Assert boundedness + stationarity,
    # not quiescence.
    v_end = float(np.abs(vel).max())
    assert v_end < 50.0, f"velocity unbounded: {v_end}"
    assert v_end < 2.0 * v_mid + 1.0, (
        f"amplitude growing: {v_mid} -> {v_end}"
    )

    n = 56
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-0.56, 0.5, -0.56))
    garr = build_grid_arrays(mesh, (n, n, n))
    p1 = ts.PhysicsParams(num_substeps=1)
    pack, step, unpack, unpack_pos = make_frame_stepper(garr, interpret=False)
    packed = pack(ts.init_state(mesh), p1)

    @jax.jit
    def run(st):
        def body_fn(s, _):
            return step(s, p1, ts.Controls.none()), None
        s, _ = jax.lax.scan(body_fn, st, None, length=2000)
        return s

    packed = run(packed)
    gp = np.asarray(unpack_pos(packed))
    assert np.isfinite(gp).all()
    assert gp[:, 1].min() >= -1e-4


def test_ordered_fused_matches_xla_ordered_on_hardware(dragon):
    """Exact-order fused kernel (kernels/gs_ordered.py) vs the XLA engine
    running the SAME ordered level schedule on the dragon.

    Both walk the identical 703-level sequential schedule, but with
    different f32 op orders (VPU vreg chains vs XLA fusions), so they
    agree to rounding noise per frame and then diverge chaotically:
    measured max|dpos| = 2.4e-6 (frame 1), 1.9e-5 (frame 5 — pre-contact),
    6.2e-3 (frame 10 — floor-contact switches bifurcate).  Assert tight
    parity before contact and a bounded, finite trajectory after."""
    from tetsim_tpu.kernels.gs_ordered import OrderedGSBody

    params = ts.PhysicsParams(num_substeps=5)
    body = OrderedGSBody(dragon, interpret=False)
    body.step(params, frames=5)
    fused_pos = body.positions()

    arr = ts.build_arrays(dragon, coloring="ordered")
    step = jax.jit(get_engine("neohookean").step_frame)
    state = _frame_loop(
        step, ts.init_state(dragon), arr, params, ts.Controls.none(), 5
    )
    xla_pos = np.asarray(state.pos)
    for b in range(8):
        np.testing.assert_allclose(fused_pos[b], xla_pos, atol=5e-5)

    body.step(params, frames=5)
    state = _frame_loop(step, state, arr, params, ts.Controls.none(), 5)
    late = body.positions()
    assert np.isfinite(late).all()
    drift = np.abs(late[0] - np.asarray(state.pos)).max()
    assert drift < 2e-2, f"post-contact divergence blew up: {drift:.2e}"


def test_ordered_fused_rate_floor(dragon):
    """RATIO floor: the ordered fused kernel walks the dragon's 703-level
    exact schedule in-kernel and must beat the XLA ordered engine by >=4x
    per frame in the same session (measured ~11x: 0.6 vs 6.8 ms/substep;
    BASELINE.md 'Config 1' records the measured serial floor)."""
    from tetsim_tpu.kernels.gs_ordered import OrderedGSBody

    params = ts.PhysicsParams(num_substeps=5)
    body = OrderedGSBody(dragon, interpret=False)
    k1, k2 = 20, 120

    def timed(frames):
        t0 = time.perf_counter()
        body.step(params, frames=frames)
        float(np.asarray(body.state).sum())
        return time.perf_counter() - t0

    timed(k1)  # compile + warm
    timed(k2)
    t1, t2 = timed(k1), timed(k2)
    per_frame = (t2 - t1) / (k2 - k1)
    rate = params.num_substeps / per_frame
    assert rate > 400, f"ordered fused rate broke: {rate:.0f} substeps/s"

    xla_per_frame = _xla_engine_frame_time(
        "neohookean", "ordered", dragon, params, k1=5, k2=15
    )
    ratio = xla_per_frame / per_frame
    assert ratio > 4.0, (
        f"ordered fused kernel only {ratio:.2f}x the XLA ordered engine "
        f"({per_frame*1e3:.3f} vs {xla_per_frame*1e3:.3f} ms/frame)"
    )


def test_nh_stencil_matches_xla_stencil_on_hardware():
    """Fused Neo-Hookean grid kernel (kernels/nh_stencil.py) vs the XLA
    48-color stencil engine — identical color order and math, so hardware
    agreement is bit-level-tight (measured 0.0 at 8^3 x 10 frames)."""
    from tetsim_tpu.solvers import neohookean_grid as nhg
    from tetsim_tpu.kernels import nh_stencil

    dims = (8, 8, 8)
    mesh = ts.grid_mesh(*dims, cell=0.1, origin=(-0.4, 0.5, -0.4))
    arr = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    step_x = jax.jit(nhg.step_frame)
    sx, sf = ts.init_state(mesh), ts.init_state(mesh)
    for _ in range(10):
        sx, _ = step_x(sx, arr, params, controls)
        sf, _ = nh_stencil.step_frame(sf, arr, params, controls,
                                      interpret=False)
    np.testing.assert_allclose(sx.pos, sf.pos, atol=5e-5)


def test_nh_stencil_packed_rate_floor():
    """1M-tet fused Neo-Hookean kernel floor + RATIO vs the XLA stencil
    engine measured in the same session (variance-immune, VERDICT r2 weak
    #3 convention)."""
    from tetsim_tpu.solvers.neohookean_grid import build_nh_grid_arrays
    from tetsim_tpu.kernels.nh_stencil import make_frame_stepper

    n = 56
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-0.56, 0.5, -0.56))
    arr = build_nh_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_frame_stepper(arr, interpret=False)
    packed0 = pack(ts.init_state(mesh), params)

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                return step(s, params, controls), None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    k1, k2 = 50, 400
    run1, run2 = runner(k1), runner(k2)

    def timed(run):
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = run(packed0)
            float(jax.tree.leaves(out)[0].sum())
        return (time.perf_counter() - t0) / reps

    timed(run1)
    timed(run2)
    t1, t2 = timed(run1), timed(run2)
    per_substep = (t2 - t1) / (k2 - k1)
    assert per_substep < 4e-3, (
        f"1M-tet fused NH substep broke: {per_substep*1e3:.3f} ms"
    )

    xstep = get_engine("neohookean_grid").step_frame

    def xrunner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                s, _ = xstep(s, arr, params, controls)
                return s, None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    xk1, xk2 = 20, 120
    xla_per_substep = _two_point_rate(
        xrunner(xk1), xrunner(xk2), xk1, xk2, ts.init_state(mesh)
    )
    ratio = xla_per_substep / per_substep
    assert ratio > 2.0, (
        f"fused NH kernel only {ratio:.2f}x the XLA stencil engine "
        f"({per_substep*1e3:.3f} vs {xla_per_substep*1e3:.3f} ms/substep)"
    )


def test_vector_grabs_on_fused_kernels_on_hardware():
    """Round-4 multi-slot grabs: the G-slot SMEM grab tables (gid [1,G],
    gpos [G,3]) must lower through Mosaic and pin BOTH grabbed vertices in
    the fused NH and polar stencil kernels (interpret-mode parity is
    already enforced in tests/; this is the real-lowering check)."""
    from tetsim_tpu.solvers import neohookean_grid as nhg
    from tetsim_tpu.solvers import polar_grid as pg
    from tetsim_tpu.kernels import nh_stencil, polar_stencil

    dims = (6, 4, 4)
    mesh = ts.grid_mesh(*dims, cell=0.15, origin=(-0.45, 0.6, -0.3))
    ids = np.array([0, mesh.num_particles - 1], np.int32)
    targets = np.array([[-0.4, 1.2, -0.2], [0.5, 1.3, 0.4]], np.float32)
    controls = ts.Controls(grab_id=jnp.asarray(ids),
                           grab_pos=jnp.asarray(targets))
    params = ts.PhysicsParams(num_substeps=5)

    narr = nhg.build_nh_grid_arrays(mesh, dims)
    s = ts.init_state(mesh)
    for _ in range(3):
        s, _ = nh_stencil.step_frame(s, narr, params, controls,
                                     interpret=False)
    pos = np.asarray(s.pos)
    np.testing.assert_allclose(pos[ids[0]], targets[0], atol=1e-5)
    np.testing.assert_allclose(pos[ids[1]], targets[1], atol=1e-5)

    parr = pg.build_grid_arrays(mesh, dims)
    s = ts.init_state(mesh)
    for _ in range(3):
        s, _ = polar_stencil.step_frame(s, parr, params, controls,
                                        interpret=False)
    pos = np.asarray(s.pos)
    np.testing.assert_allclose(pos[ids[0]], targets[0], atol=1e-5)
    np.testing.assert_allclose(pos[ids[1]], targets[1], atol=1e-5)


def test_nh_dynamic_sweep_on_hardware():
    """The fori-table dynamic sweep (traced lane rotates + dynamic block
    slices) must lower through Mosaic and match the unrolled kernel
    bit-for-bit, as it does in interpret mode."""
    from tetsim_tpu.solvers import neohookean_grid as nhg
    from tetsim_tpu.kernels import nh_stencil

    dims = (6, 4, 4)
    mesh = ts.grid_mesh(*dims, cell=0.15, origin=(-0.45, 0.6, -0.3))
    arr = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    su, sd = ts.init_state(mesh), ts.init_state(mesh)
    for _ in range(5):
        su, _ = nh_stencil.step_frame(su, arr, params, controls,
                                      interpret=False)
        sd, _ = nh_stencil.step_frame(sd, arr, params, controls,
                                      interpret=False, dynamic=True)
    err = float(np.abs(np.asarray(su.pos) - np.asarray(sd.pos)).max())
    assert err == 0.0, f"dynamic vs unrolled drift on hardware: {err}"


def test_nh_pieces_matches_interpret_on_hardware():
    """Piecewise fused Neo-Hookean GS kernel (kernels/nh_pieces.py): the
    Mosaic lowering must match interpret mode (measured bitwise-equal in
    round 5) — the CPU suite already pins interpret mode against an
    independent XLA implementation of the same two-level schedule.
    (Divergence from the GLOBAL engine is NOT asserted here: at 25k tets
    a frame's max gap between two valid GS orders — global greedy vs
    global ordered — is itself ~0.37, so closeness to one particular
    order is not a scale-invariant criterion; see BENCHNOTES round 5.)"""
    from tetsim_tpu.kernels.nh_pieces import build_nh_pieces_arrays, step_frame

    blob = ts.ellipsoid_mesh(10, radii=(0.4, 0.35, 0.45), center=(0, 0.8, 0))
    arr = build_nh_pieces_arrays(blob, tets_per_piece=512)
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    step_hw = jax.jit(
        lambda s: step_frame(s, arr, params, controls, interpret=False)[0]
    )
    step_in = jax.jit(
        lambda s: step_frame(s, arr, params, controls, interpret=True)[0]
    )
    sh, si = ts.init_state(blob), ts.init_state(blob)
    for _ in range(3):
        sh = step_hw(sh)
        si = step_in(si)
    np.testing.assert_allclose(np.asarray(sh.pos), np.asarray(si.pos),
                               atol=1e-6)
    assert np.isfinite(np.asarray(sh.pos)).all()


def test_nh_pieces_rate_floor():
    """Reference-fidelity Neo-Hookean GS on a single connected
    UNSTRUCTURED ~1M-tet mesh, sustained packed form: <15 ms/substep
    (VERDICT r4 item 1 'done' criterion; the generic colored engine reads
    ~82 ms on this shape)."""
    from tetsim_tpu.kernels.nh_pieces import (
        build_nh_pieces_arrays, make_nh_pieces_stepper,
    )

    blob = ts.ellipsoid_mesh(68, radii=(0.68,) * 3, center=(0.0, 0.75, 0.0))
    arr = build_nh_pieces_arrays(blob)
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_nh_pieces_stepper(arr, interpret=False)
    packed0 = pack(ts.init_state(blob), params)

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                return step(s, params, controls), None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    k1, k2 = 20, 120
    run1, run2 = runner(k1), runner(k2)

    def timed(run):
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = run(packed0)
            float(jax.tree.leaves(out)[0].sum())
        return (time.perf_counter() - t0) / reps

    timed(run1)
    timed(run2)
    t1, t2 = timed(run1), timed(run2)
    per_substep = (t2 - t1) / (k2 - k1)
    assert per_substep < 15e-3, (
        f"1M-tet nh_pieces substep regressed: {per_substep*1e3:.2f} ms"
    )


def test_viewer_batched_body_fps(dragon):
    """VERDICT r4 item 8: a surfaced BatchedBody scene must sustain >=30
    sim fps through the viewer loop on the tunneled device — the fused
    step_many_export dispatch (one device call per batch of frames)
    amortizes the ~35 ms per-call round trip that capped unpacked bodies
    at ~10 fps."""
    from tetsim_tpu.viewer.server import ViewerServer

    world = ts.World(ts.PhysicsParams(num_substeps=5))
    world.add_body_batch(dragon, 4, engine="polar", backend="flat",
                         jitter=0.1)
    srv = ViewerServer(world, port=0, fps=60.0)
    assert srv.views[0].body._many_export is not None, (
        "viewer must enable the fused step+export on BatchedBody"
    )
    srv.start()
    try:
        time.sleep(3.0)  # warm: first dispatch compiles
        f0, t0 = srv.frame, time.perf_counter()
        time.sleep(5.0)
        fps = (srv.frame - f0) / (time.perf_counter() - t0)
        assert srv.sim_error is None, srv.sim_error
        assert fps >= 30.0, f"viewer sim loop at {fps:.1f} fps (<30)"
    finally:
        srv.stop()
