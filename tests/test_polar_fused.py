"""Fused VMEM polar kernel (kernels/polar_fused.py) vs the XLA polar engine.

Interpret mode on the hermetic CPU suite; real Mosaic lowering is covered
by tests_tpu/test_hardware.py.  The kernel runs the same math as
solvers/polar.py (= the reference GPU path, SoftbodyGPU.js passes 1-7) on
lane-oriented planes, so trajectories must match to f32 accumulation-order
tolerance."""
import numpy as np
import jax
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine
from tetsim_tpu.kernels.polar_fused import FusedPolarBody, build_polar_schedule


@pytest.fixture(scope="module")
def mesh():
    return ts.grid_mesh(3, 2, 4, cell=0.25, origin=(-0.3, 0.5, -0.4))


def _xla_run(mesh, params, controls, frames):
    arr = ts.build_arrays(mesh, coloring=None)
    step = jax.jit(get_engine("polar").step_frame)
    s = ts.init_state(mesh)
    for _ in range(frames):
        s, _ = step(s, arr, params, controls)
    return s


@pytest.mark.quick
def test_parity_with_xla_polar(mesh):
    params = ts.PhysicsParams(num_substeps=5)
    body = FusedPolarBody(mesh, num_bodies=8, interpret=True)
    body.step(params, frames=4)
    s = _xla_run(mesh, params, ts.Controls.none(), 4)
    xp = np.asarray(s.pos)
    for b in range(8):
        np.testing.assert_allclose(body.positions()[b], xp, atol=2e-5)
    np.testing.assert_allclose(
        body.quaternions()[0], np.asarray(s.quats), atol=2e-5
    )
    np.testing.assert_allclose(
        body.velocities()[0], np.asarray(s.vel), atol=2e-2
    )


def test_grab(mesh):
    params = ts.PhysicsParams(num_substeps=5)
    body = FusedPolarBody(mesh, num_bodies=8, interpret=True)
    point = [0.2, 1.2, 0.1]
    pid = body.start_grab(2, point)
    body.step(params, frames=3)
    np.testing.assert_allclose(body.positions()[2][pid], point, atol=1e-6)
    # other bodies unaffected by body 2's grab
    assert np.abs(body.positions()[0] - body.positions()[2]).max() > 1e-4
    body.end_grab(2)
    body.step(params, frames=1)
    assert np.isfinite(body.positions()).all()


def test_pinned(mesh):
    top = np.argsort(-mesh.verts[:, 1])[:3].tolist()
    params = ts.PhysicsParams(num_substeps=4)
    body = FusedPolarBody(mesh, num_bodies=8, interpret=True, pinned=top)
    p0 = body.positions()[0].copy()
    body.step(params, frames=4)
    np.testing.assert_allclose(body.positions()[0][top], p0[top], atol=1e-6)
    assert np.abs(body.positions()[0] - p0).max() > 1e-3  # body hangs


def test_jittered_batch(mesh):
    params = ts.PhysicsParams(num_substeps=3)
    body = FusedPolarBody(mesh, num_bodies=8, interpret=True, jitter=0.1)
    starts = body.positions().copy()
    assert np.abs(starts[0] - starts[1]).max() > 1e-3  # distinct offsets
    body.step(params, frames=2)
    assert np.isfinite(body.positions()).all()


def test_schedule_shapes(mesh):
    s = build_polar_schedule(mesh)
    assert s.rp % 128 == 0 and s.rt % 128 == 0
    assert s.ids.shape == (4, 8, s.rt)
    assert s.inc.shape == (s.valence, 8, s.rp)
    # every corner instance appears exactly once in the incidence banks
    live = s.inc[:, 0, :][s.inc[:, 0, :] >= 0]
    assert len(live) == 4 * s.num_tets
    assert len(np.unique(live)) == 4 * s.num_tets


def test_world_add_body_batch_fused_polar(mesh):
    w = ts.World(params=ts.PhysicsParams(num_substeps=2))
    batch = w.add_body_batch(mesh, 8, engine="polar", backend="fused")
    batch.interpret = True  # hermetic CPU suite
    w.step()
    assert np.isfinite(batch.positions()).all()
    d = w.diagnostics()
    assert d["body0"]["batch"] == 8 and not d["body0"]["nan"]


def test_viewer_view_accepts_fused_polar(mesh):
    from tetsim_tpu.viewer.server import _View

    w = ts.World(params=ts.PhysicsParams(num_substeps=2))
    batch = w.add_body_batch(mesh, 8, engine="polar", backend="fused")
    batch.interpret = True
    view = _View(batch)
    assert view.kind == "packed"
    pos = np.asarray(view.pos_device())
    assert pos.shape == (8 * mesh.num_particles, 3)
    view.grab_start(3, [0.0, 1.0, 0.0])
    assert view.grabbed_id() == 3
    view.grab_end()
    view.reset()
    assert np.isfinite(np.asarray(view.pos_device())).all()


def test_sharded_bodies_match_unsharded(mesh):
    """Data-parallel body sharding (VERDICT r2 item 5): the fused kernel
    under shard_map over a body mesh axis == the single-device kernel,
    including an active grab on a body in the second shard."""
    from jax.sharding import Mesh

    params = ts.PhysicsParams(num_substeps=3)
    ref = FusedPolarBody(mesh, num_bodies=16, interpret=True, jitter=0.2)
    sh = FusedPolarBody(mesh, num_bodies=16, interpret=True, jitter=0.2)
    for b in (ref, sh):
        b.set_grab(9, 0, [0.0, 1.0, 0.0])  # body 9 lives on device 1

    devs = np.array(jax.devices()[:2])
    sh.shard(Mesh(devs, ("body",)), axis="body")
    ref.step(params, frames=3)
    sh.step(params, frames=3)
    np.testing.assert_allclose(sh.positions(), ref.positions(), atol=1e-6)
    np.testing.assert_allclose(sh.quaternions(), ref.quaternions(), atol=1e-6)


def test_shard_rejects_uneven_split(mesh):
    from jax.sharding import Mesh

    body = FusedPolarBody(mesh, num_bodies=8, interpret=True)
    devs = np.array(jax.devices()[:3])
    with pytest.raises(ValueError, match="split"):
        body.shard(Mesh(devs, ("body",)), axis="body")
