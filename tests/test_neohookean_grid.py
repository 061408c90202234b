"""Parity + behavior tests for the structured-grid Neo-Hookean GS engine.

The parity chain requirement (CLAUDE.md): the stencil-form engine must match
the generic XLA engine running the SAME 48-color schedule (grid_coloring) to
f32 accumulation tolerance.
"""
import jax
import numpy as np
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine, neohookean_grid as nhg


@pytest.fixture(scope="module", params=[(3, 3, 3), (4, 3, 2)])
def grid_setup(request):
    dims = request.param
    mesh = ts.grid_mesh(*dims, cell=0.25, origin=(-0.3, 0.6, -0.3))
    arr_g = ts.build_arrays(mesh, coloring=nhg.grid_coloring(dims))
    arr_s = nhg.build_nh_grid_arrays(mesh, dims)
    return dims, mesh, arr_g, arr_s


def _drop_state(mesh, vel_seed=0):
    state = ts.init_state(mesh)
    rng = np.random.default_rng(vel_seed)
    vel = rng.uniform(-0.4, 0.4, state.vel.shape).astype(np.float32)
    return state.replace(vel=vel)


def test_matches_generic_engine_same_coloring(grid_setup):
    dims, mesh, arr_g, arr_s = grid_setup
    params = ts.default_cpu_params()
    controls = ts.Controls.none()
    step_g = jax.jit(get_engine("neohookean").step_frame)
    step_s = jax.jit(nhg.step_frame)
    sg = _drop_state(mesh)
    ss = _drop_state(mesh)
    for _ in range(10):
        sg, dg = step_g(sg, arr_g, params, controls)
        ss, ds = step_s(ss, arr_s, params, controls)
    err = float(np.abs(np.asarray(sg.pos) - np.asarray(ss.pos)).max())
    assert err < 2e-5, f"stencil vs generic position drift {err}"
    derr = float(np.abs(np.asarray(dg) - np.asarray(ds)).max())
    assert derr < 1e-4, f"vol_err diag drift {derr}"


def test_grid_coloring_is_valid(grid_setup):
    dims, mesh, _, _ = grid_setup
    colors = nhg.grid_coloring(dims)
    assert colors.shape == (mesh.num_tets,)
    for c in range(int(colors.max()) + 1):
        tets = mesh.tets[colors == c]
        verts = tets.reshape(-1)
        assert len(np.unique(verts)) == len(verts), f"color {c} shares verts"


def test_settles_on_floor(grid_setup):
    dims, mesh, _, arr_s = grid_setup
    params = ts.default_cpu_params()
    step = jax.jit(nhg.step_frame)
    state = _drop_state(mesh)
    for _ in range(150):
        state, _ = step(state, arr_s, params, ts.Controls.none())
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-5
    assert pos[:, 1].max() < 1.5


def test_grab_override(grid_setup):
    dims, mesh, _, arr_s = grid_setup
    params = ts.default_cpu_params()
    controls = ts.Controls.none().replace(
        grab_id=np.int32(0),
        grab_pos=np.array([0.1, 1.2, 0.1], np.float32),
    )
    step = jax.jit(nhg.step_frame)
    state = ts.init_state(mesh)
    for _ in range(4):
        state, _ = step(state, arr_s, params, controls)
    pos = np.asarray(state.pos)
    assert np.allclose(pos[0], [0.1, 1.2, 0.1], atol=1e-6)


def test_pinned_particles_hold(grid_setup):
    dims, mesh, _, _ = grid_setup
    pinned = np.arange(4)
    arr = nhg.build_nh_grid_arrays(mesh, dims, pinned=pinned)
    step = jax.jit(nhg.step_frame)
    state = ts.init_state(mesh)
    p0 = np.asarray(state.pos)[pinned].copy()
    for _ in range(20):
        state, _ = step(state, arr, ts.default_cpu_params(), ts.Controls.none())
    assert np.allclose(np.asarray(state.pos)[pinned], p0, atol=1e-6)


def test_block_roundtrip():
    dims = (3, 2, 4)
    n = (dims[0] + 1) * (dims[1] + 1) * (dims[2] + 1)
    x = np.arange(n, dtype=np.float32) * 0.5 - 3.0
    blocks = nhg._to_blocks(jax.numpy.asarray(x), dims)
    back = np.asarray(nhg._from_blocks(blocks, dims))
    assert np.array_equal(back, x)
    np_blocks = nhg._to_blocks_np(x, dims)
    assert np.array_equal(np.asarray(blocks), np_blocks)


def test_color_scan_matches_unrolled():
    """The table-driven lax.scan sweep (_gs_sweep_scan) reproduces the
    unrolled 48-color sweep bit-exactly: identical arithmetic in identical
    order, with the per-color constants moved from the trace into scanned
    tables (the compile-time lever the multi-chip dryrun rides)."""
    dims = (4, 3, 2)
    mesh = ts.grid_mesh(*dims, cell=0.25, origin=(-0.3, 0.6, -0.3))
    arr = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.default_cpu_params()
    controls = ts.Controls.none().replace(
        grab_id=np.int32(3),
        grab_pos=np.array([0.2, 1.0, 0.2], np.float32),
    )
    o0 = {"xla_backend_optimization_level": "0"}
    su = _drop_state(mesh, vel_seed=3)
    ss = su
    step_u = (
        jax.jit(nhg.step_frame)
        .lower(su, arr, params, controls)
        .compile(o0)
    )
    step_s = (
        jax.jit(lambda s, a, p, c: nhg.step_frame(s, a, p, c,
                                                  color_scan=True))
        .lower(ss, arr, params, controls)
        .compile(o0)
    )
    for _ in range(8):
        su, du = step_u(su, arr, params, controls)
        ss, ds = step_s(ss, arr, params, controls)
    err = float(np.abs(np.asarray(su.pos) - np.asarray(ss.pos)).max())
    assert err == 0.0, f"color_scan vs unrolled drift {err}"
    derr = float(np.abs(np.asarray(du) - np.asarray(ds)).max())
    assert derr == 0.0, f"color_scan diag drift {derr}"


@pytest.mark.quick
def test_quick_parity_stencil_vs_generic():
    """Quick-lane parity (one dims, O0 compiles): the 48-color stencil
    engine == the generic engine on the identical schedule."""
    dims = (3, 3, 3)
    mesh = ts.grid_mesh(*dims, cell=0.25, origin=(-0.3, 0.6, -0.3))
    arr_g = ts.build_arrays(mesh, coloring=nhg.grid_coloring(dims))
    arr_s = nhg.build_nh_grid_arrays(mesh, dims)
    params = ts.default_cpu_params()
    controls = ts.Controls.none()
    o0 = {"xla_backend_optimization_level": "0"}
    sg = _drop_state(mesh)
    ss = _drop_state(mesh)
    step_g = (
        jax.jit(get_engine("neohookean").step_frame)
        .lower(sg, arr_g, params, controls).compile(o0)
    )
    step_s = (
        jax.jit(nhg.step_frame)
        .lower(ss, arr_s, params, controls).compile(o0)
    )
    for _ in range(6):
        sg, _ = step_g(sg, arr_g, params, controls)
        ss, _ = step_s(ss, arr_s, params, controls)
    err = float(np.abs(np.asarray(sg.pos) - np.asarray(ss.pos)).max())
    assert err < 2e-5, f"stencil vs generic drift {err}"
