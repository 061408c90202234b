"""Stencil grid engine (solvers/polar_grid.py) vs the generic polar engine.

The grid engine runs the same math (Mueller extractRotation shape matching,
SoftbodyGPU.js passes 3-5) with gather/scatter replaced by static-slice
stencils, so trajectories must match the generic engine to f32
accumulation-order tolerance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine
from tetsim_tpu.solvers.polar_grid import build_grid_arrays

DIMS = (4, 3, 5)


@pytest.fixture(scope="module")
def grid_setup():
    mesh = ts.grid_mesh(*DIMS, cell=0.25, origin=(-0.5, 0.4, -0.6))
    arr_ref = ts.build_arrays(mesh, coloring=None)
    garr = build_grid_arrays(mesh, DIMS)
    return mesh, arr_ref, garr


def _run(step, state, arr, params, controls, frames):
    for _ in range(frames):
        state, _ = step(state, arr, params, controls)
    return state


@pytest.mark.quick
def test_parity_with_generic_polar(grid_setup):
    mesh, arr_ref, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=4)
    controls = ts.Controls.none()
    step_ref = jax.jit(get_engine("polar").step_frame)
    step_grid = jax.jit(get_engine("polar_grid").step_frame)
    s_ref = _run(step_ref, ts.init_state(mesh), arr_ref, params, controls, 10)
    s_grid = _run(step_grid, ts.init_state(mesh), garr, params, controls, 10)
    np.testing.assert_allclose(s_ref.pos, s_grid.pos, atol=2e-5)
    np.testing.assert_allclose(s_ref.vel, s_grid.vel, atol=2e-2)
    np.testing.assert_allclose(s_ref.quats, s_grid.quats, atol=2e-5)
    # prev_pos of the final substep must also round-trip
    np.testing.assert_allclose(s_ref.prev_pos, s_grid.prev_pos, atol=2e-5)


def test_grab_parity(grid_setup):
    mesh, arr_ref, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=4)
    gid = int(np.argmax(mesh.verts[:, 1]))
    ctl = ts.Controls(
        grab_id=jnp.int32(gid),
        grab_pos=jnp.asarray([0.2, 1.2, 0.1], jnp.float32),
    )
    step_ref = jax.jit(get_engine("polar").step_frame)
    step_grid = jax.jit(get_engine("polar_grid").step_frame)
    s_ref = _run(step_ref, ts.init_state(mesh), arr_ref, params, ctl, 8)
    s_grid = _run(step_grid, ts.init_state(mesh), garr, params, ctl, 8)
    np.testing.assert_allclose(s_ref.pos, s_grid.pos, atol=2e-5)
    # grabbed particle pinned to the target (Softbody.js:233-235 semantics)
    np.testing.assert_allclose(
        np.asarray(s_grid.pos)[gid], [0.2, 1.2, 0.1], atol=1e-6
    )


def test_pinned_particles(grid_setup):
    mesh, _, _ = grid_setup
    garr = build_grid_arrays(mesh, DIMS, pinned=[0, 7])
    params = ts.PhysicsParams(num_substeps=4)
    step = jax.jit(get_engine("polar_grid").step_frame)
    s = _run(step, ts.init_state(mesh), garr, params, ts.Controls.none(), 12)
    pos = np.asarray(s.pos)
    np.testing.assert_array_equal(pos[0], mesh.verts[0])
    np.testing.assert_array_equal(pos[7], mesh.verts[7])
    # unpinned particles fell
    assert pos[:, 1].min() < mesh.verts[:, 1].min()


def test_drop_and_settle(grid_setup):
    mesh, _, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=5)
    step = jax.jit(get_engine("polar_grid").step_frame)
    s = _run(step, ts.init_state(mesh), garr, params, ts.Controls.none(), 120)
    pos = np.asarray(s.pos)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-4  # floor holds
    assert np.abs(np.asarray(s.vel)).max() < 0.5  # settled


def test_build_rejects_non_grid_mesh():
    dragon_like = ts.grid_mesh(2, 2, 2)
    with pytest.raises(ValueError, match="not a grid_mesh"):
        build_grid_arrays(dragon_like, (3, 2, 2))


def test_volume_stability(grid_setup):
    """Total volume after settling stays near rest volume (volError
    diagnostic of the reference, Softbody.js:163)."""
    mesh, _, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=5)
    step = jax.jit(get_engine("polar_grid").step_frame)
    s = _run(step, ts.init_state(mesh), garr, params, ts.Controls.none(), 120)
    pos = np.asarray(s.pos, np.float64)
    p = pos[mesh.tets]
    d = np.stack(
        [p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]], axis=-1
    )
    vol = np.linalg.det(d) / 6.0
    rest = np.float64(garr.rest_volume) * mesh.num_tets
    assert abs(vol.sum() - rest) / rest < 0.05


# ---------------------------------------------------------------------------
# Sharded slab decomposition (halo exchange over the virtual device mesh)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sharded_setup():
    from jax.sharding import Mesh
    from tetsim_tpu.solvers import polar_grid as pg

    dims = (8, 3, 5)  # nx divides the 8 virtual devices
    mesh = ts.grid_mesh(*dims, cell=0.2, origin=(-0.8, 0.5, -0.5))
    garr = pg.build_grid_arrays(mesh, dims)
    devmesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    return mesh, garr, devmesh


def test_sharded_matches_unsharded(sharded_setup):
    from tetsim_tpu.solvers import polar_grid as pg

    mesh, garr, devmesh = sharded_setup
    params = ts.PhysicsParams(num_substeps=4)
    controls = ts.Controls.none()
    state0 = ts.init_state(mesh)
    slab, sarr = pg.grid_prepare(state0, garr, devmesh)
    step_sh = pg.make_grid_sharded_step(devmesh, garr)
    step_un = jax.jit(get_engine("polar_grid").step_frame)
    s_un = state0
    for _ in range(10):
        slab, _ = step_sh(slab, sarr, params, controls)
        s_un, _ = step_un(s_un, garr, params, controls)
    s_sh = pg.grid_unprepare(slab, garr, 8)
    np.testing.assert_allclose(s_sh.pos, s_un.pos, atol=2e-5)
    np.testing.assert_allclose(s_sh.quats, s_un.quats, atol=2e-5)
    np.testing.assert_allclose(s_sh.prev_pos, s_un.prev_pos, atol=2e-5)


def test_sharded_grab(sharded_setup):
    from tetsim_tpu.solvers import polar_grid as pg

    mesh, garr, devmesh = sharded_setup
    params = ts.PhysicsParams(num_substeps=4)
    gid = int(np.argmax(mesh.verts[:, 1]))
    target = [0.1, 1.0, 0.2]
    ctl = ts.Controls(
        grab_id=jnp.int32(gid), grab_pos=jnp.asarray(target, jnp.float32)
    )
    slab, sarr = pg.grid_prepare(ts.init_state(mesh), garr, devmesh)
    step_sh = pg.make_grid_sharded_step(devmesh, garr)
    for _ in range(5):
        slab, _ = step_sh(slab, sarr, params, ctl)
    s = pg.grid_unprepare(slab, garr, 8)
    np.testing.assert_allclose(np.asarray(s.pos)[gid], target, atol=1e-6)


def test_slab_round_trip(sharded_setup):
    from tetsim_tpu.solvers import polar_grid as pg

    mesh, garr, devmesh = sharded_setup
    state = ts.init_state(mesh)
    slab, _ = pg.grid_prepare(state, garr, devmesh)
    back = pg.grid_unprepare(slab, garr, 8)
    np.testing.assert_array_equal(back.pos, state.pos)
    np.testing.assert_array_equal(back.quats, state.quats)


def test_uneven_shard_rejected(sharded_setup):
    from tetsim_tpu.solvers import polar_grid as pg

    dims = (5, 3, 5)
    mesh5 = ts.grid_mesh(*dims, cell=0.2)
    garr5 = pg.build_grid_arrays(mesh5, dims)
    _, _, devmesh = sharded_setup
    with pytest.raises(ValueError, match="divide evenly"):
        pg.make_grid_sharded_step(devmesh, garr5)


def test_world_grid_body_and_diagnostics():
    """World.add_grid_body runs the stencil engine end-to-end with working
    diagnostics (GridArrays-aware volume error / energy)."""
    world = ts.World(ts.PhysicsParams(num_substeps=3))
    body = world.add_grid_body(
        (4, 3, 4), cell=0.2, origin=(-0.4, 0.5, -0.4), with_edges=True
    )
    world.step(30)
    d = world.diagnostics()["body0"]
    assert not d["nan"]
    assert abs(d["volume_error"]) < 0.2
    assert d["min_height"] >= -1e-4
    assert d["kinetic_energy"] >= 0.0
    # interaction through the Body surface
    pid = body.start_grab([0.0, 1.0, 0.0])
    assert pid >= 0
    world.step(3)
    body.end_grab()
    # guard: a polar_grid Body without stencil arrays must be rejected
    with pytest.raises(ValueError, match="polar_grid"):
        ts.World().add_body(ts.grid_mesh(2, 2, 2), engine="polar_grid")
