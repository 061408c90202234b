"""Neo-Hookean colored-Gauss-Seidel solver: parity vs the sequential golden
reference, plus physical invariants (the reference ships no tests — SURVEY.md
§4 defines this strategy)."""
import numpy as np
import jax
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers.golden import GoldenSolver, GoldenParams


def run_jax(mesh, frames, params, coloring="ordered"):
    arr = ts.build_arrays(mesh, coloring=coloring)
    state = ts.init_state(mesh)
    ctrl = ts.Controls.none()
    eng = ts.get_engine("neohookean")
    step = jax.jit(eng.step_frame)
    volerr = None
    for _ in range(frames):
        state, volerr = step(state, arr, params, ctrl)
    return state, np.asarray(volerr)


def run_golden(mesh, substeps, dt):
    g = GoldenSolver(mesh)
    for _ in range(substeps):
        g.substep(dt)
    return g


def test_parity_dragon_one_frame(dragon):
    """Level-scheduled GS must reproduce the strict sequential trajectory to
    f32 rounding noise (order-preservation property)."""
    params = ts.default_cpu_params()
    state, volerr = run_jax(dragon, frames=1, params=params)
    g = run_golden(dragon, substeps=5, dt=1.0 / 300.0)
    np.testing.assert_allclose(np.asarray(state.pos), g.pos, atol=2e-5)
    np.testing.assert_allclose(volerr[-1], g.vol_error, atol=1e-4)


@pytest.mark.quick
def test_parity_small_mesh_many_steps(small_mesh):
    params = ts.PhysicsParams(num_substeps=5)
    state, _ = run_jax(small_mesh, frames=12, params=params)
    g = run_golden(small_mesh, substeps=60, dt=1.0 / 300.0)
    np.testing.assert_allclose(np.asarray(state.pos), g.pos, atol=5e-4)


def test_greedy_coloring_physically_equivalent(small_mesh):
    """Greedy coloring reorders GS so trajectories differ, but the physics
    (volume preservation, settling) must match."""
    params = ts.PhysicsParams(num_substeps=5)
    s_ord, v_ord = run_jax(small_mesh, frames=30, params=params, coloring="ordered")
    s_grd, v_grd = run_jax(small_mesh, frames=30, params=params, coloring="greedy")
    assert abs(float(v_ord[-1]) - float(v_grd[-1])) < 1e-2
    # both settled on the floor
    assert np.asarray(s_ord.pos)[:, 1].min() > -1e-5
    assert np.asarray(s_grd.pos)[:, 1].min() > -1e-5
    # centroids agree loosely
    np.testing.assert_allclose(
        np.asarray(s_ord.pos).mean(0), np.asarray(s_grd.pos).mean(0), atol=5e-2
    )


def test_floor_rest_and_volume(small_mesh):
    """After settling, nothing penetrates the floor and volume drift is
    bounded (volError -> ~0, Softbody.js:163)."""
    params = ts.PhysicsParams(num_substeps=5)
    state, volerr = run_jax(small_mesh, frames=60, params=params)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-6
    assert abs(volerr[-1]) < 0.05


def test_zero_gravity_matches_golden(small_mesh):
    """Zero gravity: rest is NOT a fixed point of this material (C_D=||F||
    has rest value sqrt(3), balanced by compliance — the body contracts
    slightly), but the trajectory must still match the sequential golden
    reference exactly."""
    import jax.numpy as jnp

    params = ts.PhysicsParams(num_substeps=5, gravity=jnp.float32(0.0))
    state, _ = run_jax(small_mesh, frames=10, params=params)
    g = GoldenSolver(small_mesh, params=GoldenParams(gravity=0.0))
    for _ in range(50):
        g.substep(1.0 / 300.0)
    np.testing.assert_allclose(np.asarray(state.pos), g.pos, atol=1e-4)
    # drift from rest stays bounded (compliance equilibrium, not collapse)
    assert np.abs(g.pos - small_mesh.verts).max() < 0.02


def test_grab_pins_particle(small_mesh):
    import jax.numpy as jnp

    arr = ts.build_arrays(small_mesh)
    state = ts.init_state(small_mesh)
    params = ts.PhysicsParams(num_substeps=5)
    target = jnp.array([0.2, 1.5, 0.2], jnp.float32)
    ctrl = ts.Controls(grab_id=jnp.int32(0), grab_pos=target)
    eng = ts.get_engine("neohookean")
    step = jax.jit(eng.step_frame)
    for _ in range(20):
        state, _ = step(state, arr, params, ctrl)
    pos = np.asarray(state.pos)
    np.testing.assert_allclose(pos[0], np.asarray(target), atol=1e-6)
    # the body was dragged up with the grabbed particle and stays connected
    assert np.isfinite(pos).all()
    assert pos[:, 1].mean() > 0.5
    assert np.linalg.norm(pos - pos[0], axis=1).max() < 2.0


def test_world_bounds_respected(small_mesh):
    import jax.numpy as jnp

    params = ts.PhysicsParams(
        num_substeps=5,
        world_min=jnp.array([-0.2, -1.0, -0.2], jnp.float32),
        world_max=jnp.array([0.2, 10.0, 0.2], jnp.float32),
    )
    state, _ = run_jax(small_mesh, frames=30, params=params)
    pos = np.asarray(state.pos)
    assert pos[:, 0].min() >= -0.2 - 1e-6 and pos[:, 0].max() <= 0.2 + 1e-6
    assert pos[:, 2].min() >= -0.2 - 1e-6 and pos[:, 2].max() <= 0.2 + 1e-6
