"""BatchedBody (vmapped multi-body) tests — BASELINE config 4 surface."""
import numpy as np

import tetsim_tpu as ts
from tetsim_tpu.world import BatchedBody


def test_batch_matches_single(small_mesh):
    params = ts.PhysicsParams(num_substeps=4)
    world = ts.World(params)
    single = world.add_body(small_mesh, engine="polar")
    batch = world.add_body_batch(small_mesh, 8, engine="polar")
    world.step(3)
    ref = single.positions
    pos = batch.positions
    assert pos.shape == (8,) + ref.shape
    for b in range(8):
        np.testing.assert_allclose(pos[b], ref, atol=1e-5)
    d = world.diagnostics()
    assert d["body1"]["batch"] == 8 and not d["body1"]["nan"]


def test_batch_per_body_grab(small_mesh):
    params = ts.PhysicsParams(num_substeps=4)
    batch = BatchedBody(small_mesh, 4, engine="neohookean")
    target = [0.2, 1.5, 0.1]
    gid = batch.start_grab(2, [0.0, 0.6, 0.0])
    batch.move_grabbed(2, target)
    for _ in range(3):
        batch.step(params)
    pos = batch.positions
    np.testing.assert_allclose(pos[2, gid], target, atol=1e-5)
    assert not np.allclose(pos[0, gid], target, atol=1e-2)
    np.testing.assert_allclose(pos[0], pos[1], atol=1e-6)
    batch.end_grab(2)
    for _ in range(2):
        batch.step(params)
    assert not np.allclose(batch.positions[2, gid], target, atol=1e-3)


def test_batch_jitter_distinct(small_mesh):
    batch = BatchedBody(small_mesh, 4, engine="polar", jitter=0.3, seed=7)
    batch.step(ts.PhysicsParams(num_substeps=2))
    pos = batch.positions
    assert not np.allclose(pos[0], pos[1], atol=1e-3)
    assert np.isfinite(pos).all()


def test_fused_backend_in_world(small_mesh):
    """World.add_body_batch(backend="fused") — full scene API round trip
    (interpret-mode Pallas on CPU)."""
    from tetsim_tpu.kernels.gs_fused import FusedGSBody

    world = ts.World(ts.PhysicsParams(num_substeps=2))
    mesh = ts.grid_mesh(1, 1, 1, cell=0.4, origin=(-0.2, 0.2, -0.2))
    batch = world.add_body_batch(mesh, 2, engine="neohookean", backend="fused")
    assert isinstance(batch, FusedGSBody)
    batch.interpret = True  # CPU-test mode
    target = [0.5, 1.0, 0.0]
    pid = batch.start_grab(1, [0.0, 0.4, 0.0])
    batch.move_grabbed(1, target)
    world.step(3)
    pos = batch.positions()
    np.testing.assert_allclose(pos[1, pid], target, atol=1e-6)
    d = world.diagnostics()["body0"]
    assert d["batch"] == 2 and not d["nan"]
    batch.end_grab(1)
    import pytest as _pytest

    # polar has its own fused kernel now (kernels/polar_fused.py)
    from tetsim_tpu.kernels.polar_fused import FusedPolarBody

    pb = world.add_body_batch(mesh, 2, engine="polar", backend="fused")
    assert isinstance(pb, FusedPolarBody)
    with _pytest.raises(ValueError):
        world.add_body_batch(mesh, 2, engine="golden", backend="fused")
    with _pytest.raises(ValueError):
        world.add_body_batch(mesh, 2, backend="bogus")


def test_fused_backend_jitter(small_mesh):
    from tetsim_tpu.kernels.gs_fused import FusedGSBody

    mesh = ts.grid_mesh(1, 1, 1, cell=0.4, origin=(-0.2, 0.2, -0.2))
    b = FusedGSBody(mesh, 4, jitter=0.3, seed=5)
    pos = b.positions()
    assert not np.allclose(pos[0], pos[1], atol=1e-3)
    assert (pos[..., 1] >= 0).all()  # jitter kept above ground
