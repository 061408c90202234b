"""Fused VMEM GS kernel vs the XLA neohookean path — semantics parity in
Pallas interpret mode (lowering/perf are exercised on real TPU hardware by
bench paths; these tests pin the math)."""
import numpy as np
import jax
import pytest

import tetsim_tpu as ts
from tetsim_tpu.kernels.gs_fused import FusedGSBody
from tetsim_tpu.solvers import get_engine


@pytest.fixture(scope="module")
def small():
    return ts.grid_mesh(1, 1, 1, cell=0.5, origin=(-0.25, 0.1, -0.25))


def _xla_run(mesh, params, frames, grab=None):
    arr = ts.build_arrays(mesh, coloring="greedy")
    state = ts.init_state(mesh)
    controls = ts.Controls.none()
    if grab is not None:
        controls = ts.Controls(
            grab_id=np.int32(grab[0]),
            grab_pos=np.asarray(grab[1], np.float32),
        )
    step = jax.jit(get_engine("neohookean").step_frame)
    for _ in range(frames):
        state, _ = step(state, arr, params, controls)
    return np.asarray(state.pos), np.asarray(state.vel)


@pytest.mark.quick
def test_fused_matches_xla(small):
    params = ts.PhysicsParams(num_substeps=2)
    ref_pos, ref_vel = _xla_run(small, params, frames=3)

    body = FusedGSBody(small, num_bodies=4, interpret=True)
    body.step(params, frames=3)
    pos = body.positions()
    vel = body.velocities()
    assert pos.shape == (4, small.num_particles, 3)
    for b in range(4):
        np.testing.assert_allclose(pos[b], ref_pos, atol=2e-4)
        np.testing.assert_allclose(vel[b], ref_vel, atol=2e-2)


def test_fused_grab_per_body(small):
    params = ts.PhysicsParams(num_substeps=2)
    body = FusedGSBody(small, num_bodies=3, interpret=True)
    target = [0.3, 1.2, 0.0]
    body.set_grab(1, 5, target)
    body.step(params, frames=2)
    pos = body.positions()
    # grabbed particle pinned on body 1 only
    np.testing.assert_allclose(pos[1, 5], target, atol=1e-6)
    assert not np.allclose(pos[0, 5], target, atol=1e-3)
    # ungrabbed bodies identical to each other
    np.testing.assert_allclose(pos[0], pos[2], atol=1e-6)
    # matches XLA run with the same grab
    ref_pos, _ = _xla_run(small, params, frames=2, grab=(5, target))
    np.testing.assert_allclose(pos[1], ref_pos, atol=2e-4)


def test_fused_floor_and_bounds(small):
    params = ts.PhysicsParams(num_substeps=2)
    body = FusedGSBody(small, num_bodies=2, interpret=True)
    body.step(params, frames=8)
    pos = body.positions()
    assert np.isfinite(pos).all()
    assert pos[..., 1].min() >= -1e-5
    assert (np.abs(pos[..., [0, 2]]) <= 2.5 + 1e-5).all()


def test_multi_block_body_grid(small):
    """Batch larger than one VMEM block: the kernel grids over body blocks
    (round-2 lift of the <=32-body VMEM gate).  All blocks must produce the
    single-body trajectory, and a grab in a later block stays local."""
    params = ts.PhysicsParams(num_substeps=2)
    ref_pos, _ = _xla_run(small, params, frames=2)

    body = FusedGSBody(small, num_bodies=40, interpret=True)
    assert body.B // body.B_blk >= 2, (
        f"test needs multiple blocks (B={body.B}, blk={body.B_blk})"
    )
    # grab body 35's particle 0 (a later block) before stepping
    target = np.asarray(ref_pos[0]) + [0.0, 0.4, 0.0]
    body.set_grab(35, 0, target)
    body.step(params, frames=2)
    pos = body.positions()
    for b in (0, 7, 8, 20, 39):  # spans block boundaries
        np.testing.assert_allclose(pos[b], ref_pos, atol=1e-5)
    np.testing.assert_allclose(pos[35][0], target, atol=1e-6)
    assert np.abs(pos[35][0] - ref_pos[0]).max() > 0.05  # grab actually held


def test_vmem_budget_admits_midsize_meshes():
    """The 96 MB VMEM budget (vmem_limit_bytes unlock, BENCHNOTES round 2)
    admits mid-size meshes the round-1 16 MB gate rejected; hardware parity
    at 10,368 tets measured 1.9e-6 over 5 frames."""
    import tetsim_tpu as ts
    from tetsim_tpu.kernels import FusedGSBody

    mesh = ts.grid_mesh(12, 12, 12, cell=0.08, origin=(-0.48, 0.5, -0.48))
    body = FusedGSBody(mesh, num_bodies=8, interpret=True)  # must not raise
    assert body.sched.R >= 2304 and body.B_blk == 8

    # a genuinely huge mesh still gets the clear error
    import pytest as _pytest
    big = ts.grid_mesh(40, 40, 40, cell=0.02, origin=(0.0, 0.5, 0.0))
    with _pytest.raises(ValueError, match="VMEM estimate"):
        FusedGSBody(big, num_bodies=8, interpret=True)


def test_sharded_bodies_match_unsharded(small):
    """Data-parallel body sharding (VERDICT r2 item 5): the fused GS kernel
    under shard_map over a body mesh axis == the single-device kernel,
    grab on a second-shard body included."""
    import jax
    from jax.sharding import Mesh

    params = ts.PhysicsParams(num_substeps=2)
    ref = FusedGSBody(small, num_bodies=16, interpret=True, jitter=0.2)
    sh = FusedGSBody(small, num_bodies=16, interpret=True, jitter=0.2)
    for b in (ref, sh):
        b.set_grab(12, 0, [0.0, 1.0, 0.0])

    devs = np.array(jax.devices()[:2])
    sh.shard(Mesh(devs, ("body",)), axis="body")
    ref.step(params, frames=3)
    sh.step(params, frames=3)
    np.testing.assert_allclose(sh.positions(), ref.positions(), atol=1e-6)
