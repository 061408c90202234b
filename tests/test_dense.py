"""Dense (MXU one-hot) GS solver — parity with the classic scatter path."""
import numpy as np
import jax.numpy as jnp
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import dense, get_engine
import jax


@pytest.fixture(scope="module")
def small():
    return ts.grid_mesh(2, 2, 2, cell=0.25, origin=(-0.25, 0.1, -0.25))


def _classic(mesh, params, frames, grab=None):
    arr = ts.build_arrays(mesh, coloring="greedy")
    state = ts.init_state(mesh)
    controls = ts.Controls.none()
    if grab is not None:
        controls = ts.Controls(
            grab_id=jnp.int32(grab[0]), grab_pos=jnp.asarray(grab[1], jnp.float32)
        )
    step = jax.jit(get_engine("neohookean").step_frame)
    for _ in range(frames):
        state, _ = step(state, arr, params, controls)
    return np.asarray(state.pos), np.asarray(state.vel)


def _dense(mesh, params, frames, nb=3, grab=None):
    arr = dense.build_dense_arrays(mesh, coloring="greedy")
    state = dense.init_dense_state(mesh, nb)
    gid = jnp.full((nb,), -1, jnp.int32)
    gpos = jnp.zeros((3, nb), jnp.float32)
    if grab is not None:
        body, pid, point = grab
        gid = gid.at[body].set(pid)
        gpos = gpos.at[:, body].set(jnp.asarray(point, jnp.float32))
    step = jax.jit(dense.step_frame)
    for _ in range(frames):
        state = step(state, arr, params, gid, gpos)
    return np.asarray(state.pos), np.asarray(state.vel)


def test_dense_matches_classic(small):
    params = ts.PhysicsParams(num_substeps=2)
    ref_pos, ref_vel = _classic(small, params, frames=4)
    pos, vel = _dense(small, params, frames=4, nb=3)
    for b in range(3):
        np.testing.assert_allclose(pos[:, :, b], ref_pos, atol=3e-4)
        np.testing.assert_allclose(vel[:, :, b], ref_vel, atol=3e-2)


def test_dense_grab_per_body(small):
    params = ts.PhysicsParams(num_substeps=2)
    target = [0.2, 1.4, 0.0]
    pos, _ = _dense(small, params, frames=3, nb=3, grab=(1, 5, target))
    np.testing.assert_allclose(pos[5, :, 1], target, atol=1e-6)
    assert not np.allclose(pos[5, :, 0], target, atol=1e-2)
    # matches the classic engine run with the same grab
    ref_pos, _ = _classic(small, params, frames=3, grab=(5, target))
    np.testing.assert_allclose(pos[:, :, 1], ref_pos, atol=3e-4)


def test_dense_floor_settle(small):
    params = ts.PhysicsParams(num_substeps=2)
    pos, vel = _dense(small, params, frames=10, nb=2)
    assert np.isfinite(pos).all()
    assert pos[:, 1, :].min() >= -1e-5


def test_dense_size_gate(dragon):
    with pytest.raises(ValueError):
        dense.build_dense_arrays(dragon, max_bytes=1000)
