"""Parity + behavior tests for the fused Neo-Hookean grid-stencil kernel.

`kernels/nh_stencil.py` runs the SAME 48-color (type x cube-parity)
Gauss-Seidel sweep as `solvers/neohookean_grid.py`, with every plane
VMEM-resident and the whole substep in one Pallas kernel.  The parity
chain requirement (CLAUDE.md): fused kernel == XLA stencil engine to f32
accumulation tolerance.  On CPU the kernel runs in interpret mode.

Compile economy (measured): one full-opt XLA-CPU compile of the
interpret-mode kernel costs ~4.5 min (48 colors unrolled, ~100k-op
graph); at --xla_backend_optimization_level=0 it is ~2.5 min and the
tiny-shape runtime difference is irrelevant.  This file therefore builds
exactly TWO O0-compiled executables (fused + XLA stencil, both at the
odd-dims (4,3,2) case that stresses parity-block padding and shifted-read
wrap columns) and shares them across all tests.  `step_frame` routes
pack -> kernel -> unpack, so the packed machinery is covered by the same
compiles; multi-frame packed persistence runs on the hardware lane
(tests_tpu/test_hardware.py::test_nh_stencil_packed_rate_floor).
"""
import functools

import jax
import numpy as np
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine, neohookean_grid as nhg
from tetsim_tpu.kernels import nh_stencil

DIMS = (4, 3, 2)
_O0 = {"xla_backend_optimization_level": "0"}


@pytest.fixture(scope="module")
def setup():
    mesh = ts.grid_mesh(*DIMS, cell=0.25, origin=(-0.3, 0.6, -0.3))
    arr = nhg.build_nh_grid_arrays(mesh, DIMS)
    params = ts.default_cpu_params()
    controls = ts.Controls.none()
    state = ts.init_state(mesh)
    fused = (
        jax.jit(functools.partial(nh_stencil.step_frame, interpret=True))
        .lower(state, arr, params, controls)
        .compile(_O0)
    )
    xla = (
        jax.jit(nhg.step_frame)
        .lower(state, arr, params, controls)
        .compile(_O0)
    )
    return mesh, arr, params, fused, xla


def _drop_state(mesh, vel_seed=0):
    state = ts.init_state(mesh)
    rng = np.random.default_rng(vel_seed)
    vel = rng.uniform(-0.4, 0.4, state.vel.shape).astype(np.float32)
    return state.replace(vel=vel)


def test_matches_xla_stencil_engine(setup):
    mesh, arr, params, fused, xla = setup
    controls = ts.Controls.none()
    sx = _drop_state(mesh)
    sf = _drop_state(mesh)
    for _ in range(10):
        sx, _ = xla(sx, arr, params, controls)
        sf, _ = fused(sf, arr, params, controls)
    err = float(np.abs(np.asarray(sx.pos) - np.asarray(sf.pos)).max())
    assert err < 2e-5, f"fused vs XLA stencil position drift {err}"
    verr = float(np.abs(np.asarray(sx.vel) - np.asarray(sf.vel)).max())
    assert verr < 2e-3, f"fused vs XLA stencil velocity drift {verr}"


def test_grab_override(setup):
    mesh, arr, params, fused, _ = setup
    controls = ts.Controls.none().replace(
        grab_id=np.int32(0),
        grab_pos=np.array([0.1, 1.2, 0.1], np.float32),
    )
    state = ts.init_state(mesh)
    for _ in range(4):
        state, _ = fused(state, arr, params, controls)
    pos = np.asarray(state.pos)
    assert np.allclose(pos[0], [0.1, 1.2, 0.1], atol=1e-6)


def test_pinned_particles_hold(setup):
    mesh, _, params, fused, _ = setup
    pinned = np.arange(4)
    # same pytree structure/static fields -> reuses the compiled executable
    arr = nhg.build_nh_grid_arrays(mesh, DIMS, pinned=pinned)
    state = ts.init_state(mesh)
    p0 = np.asarray(state.pos)[pinned].copy()
    for _ in range(10):
        state, _ = fused(state, arr, params, ts.Controls.none())
    assert np.allclose(np.asarray(state.pos)[pinned], p0, atol=1e-6)


def test_pack_unpack_roundtrip(setup):
    """The packed device layout is exactly invertible (pack -> unpack
    identity on pos/vel; unpack_pos agrees) — the layout half of the
    make_frame_stepper contract; the stepping half runs through step_frame
    (same pack/step/unpack composition) in the parity test above."""
    mesh, arr, params, _, _ = setup
    state = _drop_state(mesh)
    pack, _, unpack, unpack_pos = nh_stencil.make_frame_stepper(
        arr, interpret=True
    )
    packed = pack(state, params)
    back = unpack(packed, params)
    np.testing.assert_array_equal(np.asarray(back.pos),
                                  np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(back.vel),
                                  np.asarray(state.vel))
    np.testing.assert_array_equal(np.asarray(unpack_pos(packed)),
                                  np.asarray(state.pos))
    # prev_pos is re-derived as pos - vel*dt (the kernel's velocity-update
    # inverse), exact in f32 only where pos/vel are representable; check
    # the relation rather than equality with the arbitrary input prev
    np.testing.assert_allclose(
        np.asarray(back.prev_pos),
        np.asarray(state.pos) - np.asarray(state.vel) * float(params.dt),
        atol=1e-7,
    )


def test_engine_registry():
    eng = get_engine("neohookean_grid_pallas")
    assert eng is nh_stencil


def test_world_wiring():
    """add_grid_body accepts the fused NH engine in both body forms (no
    stepping here — the step path is the compiled kernel covered above;
    World-stepping for pallas grid engines is covered by test_world.py on
    the polar twin and by the hardware lane for this kernel)."""
    w = ts.World()
    b = w.add_grid_body(
        DIMS, cell=0.25, origin=(-0.3, 0.6, -0.3),
        engine="neohookean_grid_pallas",
    )
    assert b.engine == "neohookean_grid_pallas"
    assert isinstance(b.arrays, nhg.NHGridArrays)

    wp = ts.World()
    bp = wp.add_grid_body(
        DIMS, cell=0.25, origin=(-0.3, 0.6, -0.3),
        engine="neohookean_grid_pallas", packed=True,
    )
    assert bp.engine == "neohookean_grid_pallas"
    assert np.isfinite(bp.positions).all()

    with pytest.raises(ValueError, match="fused kernel engine"):
        ts.World().add_grid_body(DIMS, engine="neohookean_grid",
                                 packed=True)


def _sharded_fused_check():
    """Body of test_sharded_fused_matches_xla_engine — runs in a FRESH
    subprocess: the 12-segment unrolled sharded-kernel O0 compile can
    SIGSEGV XLA-CPU when ~75 suite compilations precede it in the same
    process (round-5 full-suite finding, same failure class as
    tests/test_sharding.py::_unrolled_slab_check), while the identical
    check passes deterministically in a clean one."""
    from jax.sharding import Mesh

    d = 4
    dims = (8, 4, 2)
    devs = np.array(jax.devices()[:d])
    devmesh = Mesh(devs, ("x",))
    mesh = ts.grid_mesh(*dims, cell=0.2, origin=(-0.8, 0.6, -0.2))
    arr = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.default_cpu_params()
    controls = ts.Controls.none().replace(
        grab_id=np.int32(5),
        grab_pos=np.array([0.3, 1.1, 0.1], np.float32),
    )
    state0 = _drop_state(mesh, vel_seed=7)

    ref_step = (
        jax.jit(nhg.step_frame)
        .lower(state0, arr, params, controls)
        .compile(_O0)
    )
    ref = state0
    for _ in range(6):
        ref, _ = ref_step(ref, arr, params, controls)

    prepare, step, unprepare = nh_stencil.make_nh_sharded_stepper(
        devmesh, arr, "x", interpret=True, compiler_options=_O0
    )
    packed = prepare(state0, params)
    for _ in range(6):
        packed = step(packed, params, controls)
    out = unprepare(packed, params)

    err = float(np.abs(np.asarray(out.pos) - np.asarray(ref.pos)).max())
    assert err < 2e-5, f"sharded fused vs XLA drift {err}"
    np.testing.assert_allclose(
        np.asarray(out.pos)[5], [0.3, 1.1, 0.1], atol=1e-6
    )
    print("sharded fused check ok")


def test_sharded_fused_matches_xla_engine():
    """Fused-kernel slab sharding (make_nh_sharded_stepper: 12 segment
    kernels + ppermute exchanges at the px transitions) == the unsharded
    XLA stencil engine, 6 frames on a 4-slab virtual mesh.  Identical
    arithmetic (_emit_sweep / _solve_color shared) -> f32-tight.
    Executed in a fresh subprocess — see _sharded_fused_check."""
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    src = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tests.test_nh_stencil import _sharded_fused_check\n"
        "_sharded_fused_check()\n"
    )
    r = subprocess.run(
        [_sys.executable, "-c", src],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, (
        f"sharded fused subprocess rc={r.returncode}\n"
        f"stdout: {r.stdout[-2000:]}\nstderr: {r.stderr[-2000:]}"
    )
    assert "sharded fused check ok" in r.stdout


def test_dynamic_sweep_matches_unrolled(setup):
    """The fori-table sweep (_emit_sweep_dyn: 6 traced color bodies with
    SMEM (block, offset, window) tables) computes exactly the unrolled
    sweep's trajectory — same arithmetic, different code shape (~8x less
    traced/compiled code)."""
    mesh, arr, params, fused, _ = setup
    controls = ts.Controls.none()

    pack, step, unpack, _ = nh_stencil.make_frame_stepper(
        arr, interpret=True, dynamic=True
    )
    jstep = (
        jax.jit(step)
        .lower(pack(ts.init_state(mesh), params), params, controls)
        .compile(_O0)
    )

    su = _drop_state(mesh)
    packed = pack(su, params)
    for _ in range(5):
        su, _ = fused(su, arr, params, controls)
        packed = jstep(packed, params, controls)
    sd = unpack(packed, params)
    err = float(np.abs(np.asarray(su.pos) - np.asarray(sd.pos)).max())
    assert err == 0.0, f"dynamic vs unrolled sweep drift {err}"


def test_sharded_dynamic_matches_xla_engine():
    """make_nh_sharded_stepper(dynamic=True): the fori-table segment
    kernels reproduce the XLA engine's trajectory (same color order, same
    _solve_color math through _emit_sweep_dyn) — the form the multi-chip
    dryrun runs."""
    from jax.sharding import Mesh

    d = 4
    dims = (8, 4, 2)
    devs = np.array(jax.devices()[:d])
    devmesh = Mesh(devs, ("x",))
    mesh = ts.grid_mesh(*dims, cell=0.2, origin=(-0.8, 0.6, -0.2))
    arr = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.default_cpu_params()
    controls = ts.Controls.none().replace(
        grab_id=np.int32(5),
        grab_pos=np.array([0.3, 1.1, 0.1], np.float32),
    )
    state0 = _drop_state(mesh, vel_seed=7)

    ref_step = (
        jax.jit(nhg.step_frame)
        .lower(state0, arr, params, controls)
        .compile(_O0)
    )
    ref = state0
    for _ in range(4):
        ref, _ = ref_step(ref, arr, params, controls)

    prepare, step, unprepare = nh_stencil.make_nh_sharded_stepper(
        devmesh, arr, "x", interpret=True, compiler_options=_O0,
        dynamic=True,
    )
    packed = prepare(state0, params)
    for _ in range(4):
        packed = step(packed, params, controls)
    out = unprepare(packed, params)
    err = float(np.abs(np.asarray(out.pos) - np.asarray(ref.pos)).max())
    assert err < 2e-5, f"dynamic sharded fused vs XLA drift {err}"


@pytest.mark.quick
def test_quick_parity_fused_dynamic_vs_xla():
    """Quick-lane parity: the fused NH monolith (dynamic fori-table form —
    small trace, fast compile) == the XLA stencil engine (color_scan form)
    over 5 frames on a tiny grid.  Both sides share _solve_color and the
    color order, so this catches sweep/kernel drift cheaply; the unrolled
    forms are covered by the full suite."""
    dims = (4, 2, 2)
    mesh = ts.grid_mesh(*dims, cell=0.25, origin=(0.0, 0.6, 0.0))
    arr = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.default_cpu_params()
    controls = ts.Controls.none()
    state0 = _drop_state(mesh, vel_seed=5)

    pack, step, unpack, _ = nh_stencil.make_frame_stepper(
        arr, interpret=True, dynamic=True
    )
    jstep = (
        jax.jit(step)
        .lower(pack(state0, params), params, controls)
        .compile(_O0)
    )
    xstep = (
        jax.jit(lambda s, a, p, c: nhg.step_frame(s, a, p, c,
                                                  color_scan=True))
        .lower(state0, arr, params, controls)
        .compile(_O0)
    )
    packed = pack(state0, params)
    ref = state0
    for _ in range(5):
        packed = jstep(packed, params, controls)
        ref, _ = xstep(ref, arr, params, controls)
    out = unpack(packed, params)
    err = float(np.abs(np.asarray(out.pos) - np.asarray(ref.pos)).max())
    assert err < 2e-5, f"fused dynamic vs XLA drift {err}"
