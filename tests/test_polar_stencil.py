"""Fused Pallas stencil kernel (kernels/polar_stencil.py) vs the XLA
stencil engine (solvers/polar_grid.py).

Runs in Pallas interpret mode on the hermetic CPU suite; the real Mosaic
lowering is covered by tests_tpu/test_hardware.py.  Math and operation
order mirror polar_grid exactly, so trajectories must match to f32
accumulation-order tolerance (the kernel's only intentional divergences —
(pos, prev) velocity carry and a precomputed scatter reciprocal — are
~1 ulp/substep each).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine
from tetsim_tpu.solvers.polar_grid import build_grid_arrays
from tetsim_tpu.kernels.polar_stencil import make_frame_stepper

DIMS = (4, 3, 5)


@pytest.fixture(scope="module")
def grid_setup():
    mesh = ts.grid_mesh(*DIMS, cell=0.25, origin=(-0.5, 0.4, -0.6))
    garr = build_grid_arrays(mesh, DIMS)
    return mesh, garr


def _run(step, state, arr, params, controls, frames):
    for _ in range(frames):
        state, _ = step(state, arr, params, controls)
    return state


def test_engine_registered():
    eng = get_engine("polar_grid_pallas")
    assert hasattr(eng, "step_frame") and hasattr(eng, "substep")


@pytest.mark.quick
def test_parity_with_xla_stencil(grid_setup):
    mesh, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=4)
    controls = ts.Controls.none()
    step_x = jax.jit(get_engine("polar_grid").step_frame)
    step_p = get_engine("polar_grid_pallas").step_frame
    s_x = _run(step_x, ts.init_state(mesh), garr, params, controls, 5)
    s_p = _run(step_p, ts.init_state(mesh), garr, params, controls, 5)
    np.testing.assert_allclose(s_x.pos, s_p.pos, atol=2e-5)
    np.testing.assert_allclose(s_x.prev_pos, s_p.prev_pos, atol=2e-5)
    np.testing.assert_allclose(s_x.quats, s_p.quats, atol=2e-5)
    np.testing.assert_allclose(s_x.vel, s_p.vel, atol=2e-2)


def test_grab_parity(grid_setup):
    mesh, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=4)
    gid = int(np.argmax(mesh.verts[:, 1]))
    ctl = ts.Controls(
        grab_id=jnp.int32(gid),
        grab_pos=jnp.asarray([0.2, 1.2, 0.1], jnp.float32),
    )
    step_x = jax.jit(get_engine("polar_grid").step_frame)
    step_p = get_engine("polar_grid_pallas").step_frame
    s_x = _run(step_x, ts.init_state(mesh), garr, params, ctl, 4)
    s_p = _run(step_p, ts.init_state(mesh), garr, params, ctl, 4)
    # the grabbed particle is pinned to grab_pos
    np.testing.assert_allclose(
        np.asarray(s_p.pos)[gid], [0.2, 1.2, 0.1], atol=1e-6
    )
    np.testing.assert_allclose(s_x.pos, s_p.pos, atol=2e-5)


def test_pinned_particles(grid_setup):
    mesh, _ = grid_setup
    top = np.argsort(-mesh.verts[:, 1])[:4].tolist()
    garr_p = build_grid_arrays(mesh, DIMS, pinned=top)
    params = ts.PhysicsParams(num_substeps=4)
    step_p = get_engine("polar_grid_pallas").step_frame
    s0 = ts.init_state(mesh)
    s = _run(step_p, s0, garr_p, params, ts.Controls.none(), 4)
    np.testing.assert_allclose(
        np.asarray(s.pos)[top], np.asarray(s0.pos)[top], atol=1e-6
    )
    # the rest of the body must hang (move) under gravity
    assert float(jnp.abs(s.pos - s0.pos).max()) > 1e-3


def test_packed_stepper_matches_step_frame(grid_setup):
    mesh, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=3)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_frame_stepper(garr)
    packed = pack(ts.init_state(mesh), params)
    for _ in range(3):
        packed = step(packed, params, controls)
    s_packed = unpack(packed, params)
    step_p = get_engine("polar_grid_pallas").step_frame
    s_frame = _run(
        step_p, ts.init_state(mesh), garr, params, controls, 3
    )
    np.testing.assert_allclose(s_packed.pos, s_frame.pos, atol=1e-6)
    np.testing.assert_allclose(s_packed.quats, s_frame.quats, atol=1e-6)
    np.testing.assert_allclose(s_packed.vel, s_frame.vel, atol=1e-4)


def test_pack_unpack_roundtrip(grid_setup):
    mesh, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=2)
    pack, _, unpack, _ = make_frame_stepper(garr)
    s0 = ts.init_state(mesh)
    s1 = unpack(pack(s0, params), params)
    np.testing.assert_allclose(s0.pos, s1.pos, atol=1e-7)
    np.testing.assert_allclose(s0.quats, s1.quats, atol=1e-7)
    # vel round-trips through prev = pos - vel*dt (1-ulp class)
    np.testing.assert_allclose(s0.vel, s1.vel, atol=1e-4)


def test_world_grid_body_pallas():
    w = ts.World(params=ts.PhysicsParams(num_substeps=2))
    body = w.add_grid_body(
        (2, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0),
        engine="polar_grid_pallas",
    )
    w.step()
    pos = np.asarray(body.state.pos)
    assert np.isfinite(pos).all()
    w2 = ts.World(params=ts.PhysicsParams(num_substeps=2))
    b2 = w2.add_grid_body((2, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0))
    w2.step()
    np.testing.assert_allclose(pos, np.asarray(b2.state.pos), atol=2e-5)


def test_world_grid_body_rejects_other_engines():
    w = ts.World()
    with pytest.raises(ValueError, match="stencil engines"):
        w.add_grid_body((2, 2, 2), engine="neohookean")


def test_packed_grid_body_matches_body():
    """World.add_grid_body(packed=True) — PackedGridBody trajectory matches
    the unpacked polar_grid_pallas Body through the same World API."""
    from tetsim_tpu.world import PackedGridBody

    mk = lambda: ts.World(params=ts.PhysicsParams(num_substeps=2))
    w1, w2 = mk(), mk()
    kw = dict(cell=0.25, origin=(0.0, 0.5, 0.0))
    b1 = w1.add_grid_body((2, 2, 3), engine="polar_grid_pallas",
                          packed=True, **kw)
    assert isinstance(b1, PackedGridBody)
    b2 = w2.add_grid_body((2, 2, 3), engine="polar_grid_pallas", **kw)
    for _ in range(4):
        w1.step()
        w2.step()
    np.testing.assert_allclose(b1.positions, np.asarray(b2.state.pos),
                               atol=1e-6)
    # full-state export (checkpoint boundary) also agrees
    np.testing.assert_allclose(np.asarray(b1.state.quats),
                               np.asarray(b2.state.quats), atol=1e-6)
    d = w1.diagnostics()["body0"]
    assert not d["nan"]


def test_packed_grid_body_grab_and_reset():
    w = ts.World(params=ts.PhysicsParams(num_substeps=2))
    b = w.add_grid_body((2, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0),
                        engine="polar_grid_pallas", packed=True)
    p0 = b.positions.copy()
    target = [0.3, 1.3, 0.1]
    pid = b.start_grab([0.25, 1.0, 0.35])
    b.move_grabbed(target)
    w.step(3)
    np.testing.assert_allclose(b.positions[pid], target, atol=1e-6)
    b.end_grab()
    b.reset()
    np.testing.assert_allclose(b.positions, p0, atol=1e-7)


def test_packed_grid_body_dt_change():
    """Live-tuning dt (viewer sliders) re-derives the packed velocity
    carry instead of silently rescaling it."""
    w = ts.World(params=ts.PhysicsParams(num_substeps=2))
    b = w.add_grid_body((2, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0),
                        engine="polar_grid_pallas", packed=True)
    w.step(2)
    v_before = np.asarray(b.state.vel)
    w.params = w.params.replace(time_scale=jnp.float32(0.5))  # dt halves
    w.step()
    v_after = np.asarray(b.state.vel)
    assert np.isfinite(v_after).all()
    # velocity magnitude must stay continuous (not jump ~2x from the
    # prev-carry reinterpretation)
    m0, m1 = np.abs(v_before).max(), np.abs(v_after).max()
    assert m1 < m0 * 1.6 + 0.5


def test_viewer_view_packed_grid_body():
    from tetsim_tpu.viewer.server import _View

    w = ts.World(params=ts.PhysicsParams(num_substeps=2))
    b = w.add_grid_body((2, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0),
                        engine="polar_grid_pallas", packed=True,
                        with_edges=True)
    view = _View(b)
    assert view.kind == "body" and view._packed_grid
    assert view.n_edges > 0
    pos = np.asarray(view.pos_device())
    assert pos.shape == (b.mesh.num_particles, 3)
    view.grab_start(2, [0.0, 1.0, 0.0])
    assert view.grabbed_id() == 2
    w.step()
    view.grab_end()
    view.reset()
    np.testing.assert_allclose(
        np.asarray(view.pos_device()), np.asarray(b.mesh.verts), atol=1e-6
    )


def test_packed_grid_body_step_many():
    """step_many(N) == N x step() (one dispatch vs N)."""
    mk = lambda: ts.World(params=ts.PhysicsParams(num_substeps=2))
    w1, w2 = mk(), mk()
    kw = dict(cell=0.25, origin=(0.0, 0.5, 0.0),
              engine="polar_grid_pallas", packed=True)
    b1 = w1.add_grid_body((2, 2, 3), **kw)
    b2 = w2.add_grid_body((2, 2, 3), **kw)
    b1.step_many(w1.params, 4)
    for _ in range(4):
        b2.step(w2.params)
    np.testing.assert_allclose(b1.positions, b2.positions, atol=1e-7)


def test_sharded_pallas_matches_unsharded():
    """The fused kernel composed with slab sharding (epilogue-free kernel +
    ppermute halo + XLA apply) matches the single-device kernel, including
    an active grab (8-device CPU mesh)."""
    from jax.sharding import Mesh
    from tetsim_tpu.kernels.polar_stencil import make_grid_sharded_stepper

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    dims = (8, 3, 5)
    mesh = ts.grid_mesh(*dims, cell=0.2, origin=(-0.8, 0.5, -0.5))
    garr = build_grid_arrays(mesh, dims)
    params = ts.PhysicsParams(num_substeps=3)
    gid = int(np.argmax(mesh.verts[:, 1]))
    ctl = ts.Controls(
        grab_id=jnp.int32(gid),
        grab_pos=jnp.asarray([0.2, 1.2, 0.1], jnp.float32),
    )
    jmesh = Mesh(np.array(devs[:8]), ("x",))
    prepare, step, unprepare = make_grid_sharded_stepper(jmesh, garr)
    packed = prepare(ts.init_state(mesh), params)
    for _ in range(5):
        packed = step(packed, params, ctl)
    s_sh = unprepare(packed, params)

    step_u = get_engine("polar_grid_pallas").step_frame
    s_u = ts.init_state(mesh)
    for _ in range(5):
        s_u, _ = step_u(s_u, garr, params, ctl)

    np.testing.assert_allclose(s_sh.pos, s_u.pos, atol=2e-6)
    np.testing.assert_allclose(s_sh.quats, s_u.quats, atol=2e-6)
    np.testing.assert_allclose(s_sh.prev_pos, s_u.prev_pos, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(s_sh.pos)[gid], [0.2, 1.2, 0.1], atol=1e-6
    )


def test_sharded_pallas_rejects_uneven_split():
    from jax.sharding import Mesh
    from tetsim_tpu.kernels.polar_stencil import make_grid_sharded_stepper

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    dims = (6, 2, 2)  # nx=6 does not divide over 8
    garr = build_grid_arrays(ts.grid_mesh(*dims, cell=0.2), dims)
    with pytest.raises(ValueError, match="divide evenly"):
        make_grid_sharded_stepper(Mesh(np.array(devs[:8]), ("x",)), garr)


def test_packed_grid_body_checkpoint_roundtrip(tmp_path):
    """PackedGridBody state survives save/load through the standard
    checkpoint module (the packed layout converts at the I/O boundary)."""
    from tetsim_tpu import checkpoint

    kw = dict(cell=0.25, origin=(0.0, 0.5, 0.0),
              engine="polar_grid_pallas", packed=True)
    w1 = ts.World(params=ts.PhysicsParams(num_substeps=2))
    b1 = w1.add_grid_body((2, 2, 3), **kw)
    w1.step(3)
    path = str(tmp_path / "packed.npz")
    checkpoint.save(path, b1.state, mesh=b1.mesh, engine=b1.engine)

    w2 = ts.World(params=ts.PhysicsParams(num_substeps=2))
    b2 = w2.add_grid_body((2, 2, 3), **kw)
    b2.state = checkpoint.load(path, like=b2.state, mesh=b2.mesh,
                               engine=b2.engine)
    np.testing.assert_allclose(b2.positions, b1.positions, atol=1e-6)
    # both continue identically after resume
    w1.step(2)
    w2.step(2)
    np.testing.assert_allclose(b2.positions, b1.positions, atol=1e-5)


def test_extract_iters_kernel_parity(grid_setup):
    """PhysicsParams.extract_iters reaches the fused kernel: at iters=2
    the Pallas stencil still matches the XLA stencil engine (the lever
    rebuilds the kernel — lru keyed on the static count)."""
    mesh, garr = grid_setup
    params = ts.PhysicsParams(num_substeps=4, extract_iters=2)
    controls = ts.Controls.none()
    step_x = jax.jit(get_engine("polar_grid").step_frame)
    step_p = get_engine("polar_grid_pallas").step_frame
    s_x = _run(step_x, ts.init_state(mesh), garr, params, controls, 5)
    s_p = _run(step_p, ts.init_state(mesh), garr, params, controls, 5)
    np.testing.assert_allclose(s_x.pos, s_p.pos, atol=2e-5)
    # and the lever actually changes the trajectory vs the default 9
    s_9 = _run(step_x, ts.init_state(mesh), garr,
               ts.PhysicsParams(num_substeps=4), controls, 5)
    assert np.abs(np.asarray(s_9.pos) - np.asarray(s_x.pos)).max() > 1e-7
