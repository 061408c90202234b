"""Exact-order fused GS kernel (kernels/gs_ordered.py) vs the sequential
golden oracle and the XLA ordered engine.

The whole point of this kernel is TRAJECTORY EXACTNESS: it must reproduce
the reference CPU solver's sequential constraint order (like the XLA
engine with coloring="ordered"), not merely equivalent physics.
"""
import numpy as np
import jax
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine
from tetsim_tpu.solvers.golden import GoldenSolver
from tetsim_tpu.kernels.gs_ordered import OrderedGSBody, build_ordered_schedule


@pytest.fixture(scope="module")
def small():
    return ts.grid_mesh(3, 3, 3, cell=0.25, origin=(-0.375, 0.5, -0.375))


def test_schedule_preserves_order(small):
    s = build_ordered_schedule(small, w_lanes=256)
    # window unions fit; every level's corners resolve inside its window
    assert s.num_windows >= 1 and s.l_max >= 1
    # reconstruct the global tet order of levels and check it is a valid
    # ordered (level_schedule) traversal: non-decreasing level ids
    from tetsim_tpu.mesh import level_schedule

    colors = level_schedule(small.tets, small.num_particles)
    seen_level = -1
    for w in range(s.num_windows):
        for l in range(s.l_max):
            imc = s.cons[w, l, 10:14]
            if (imc == 0).all():
                continue  # padding level
            # recover this sub-level's tets via the window union + lids
            union = s.uidx[w, 0]
            k = int((imc[0] != 0).sum())
            cs = s.lids[w, l, 0]
            tets_here = set()
            for t in range(k):
                corners = tuple(int(union[cs[c * 32 + t]]) for c in range(4))
                # find the tet with this corner set
                tets_here.add(corners)
            levels_here = set()
            for tet_idx, row in enumerate(small.tets):
                if tuple(int(v) for v in row) in tets_here:
                    levels_here.add(int(colors[tet_idx]))
            assert len(levels_here) == 1, "sub-level mixes schedule levels"
            lvl = levels_here.pop()
            assert lvl >= seen_level, "window packing broke level order"
            seen_level = lvl


@pytest.mark.quick
def test_matches_golden_oracle(small):
    """THE exactness property: fused ordered kernel == sequential NumPy
    reference to f32 rounding (same bar as the XLA ordered engine)."""
    params = ts.default_cpu_params()
    body = OrderedGSBody(small, interpret=True, w_lanes=256)
    body.step(params, frames=1)
    g = GoldenSolver(small)
    for _ in range(int(params.num_substeps)):
        g.substep(1.0 / 300.0)
    for b in range(8):
        np.testing.assert_allclose(body.positions()[b], g.pos, atol=2e-5)


def test_matches_xla_ordered_engine(small):
    params = ts.PhysicsParams(num_substeps=3)
    body = OrderedGSBody(small, interpret=True, w_lanes=256)
    body.step(params, frames=4)

    arr = ts.build_arrays(small, coloring="ordered")
    step = jax.jit(get_engine("neohookean").step_frame)
    state = ts.init_state(small)
    for _ in range(4):
        state, _ = step(state, arr, params, ts.Controls.none())
    np.testing.assert_allclose(
        body.positions()[0], np.asarray(state.pos), atol=5e-5
    )


def test_grab_and_floor(small):
    params = ts.PhysicsParams(num_substeps=2)
    body = OrderedGSBody(small, interpret=True, w_lanes=256)
    body.set_grab(2, 0, [0.0, 1.2, 0.0])
    body.step(params, frames=3)
    pos = body.positions()
    assert np.isfinite(pos).all()
    assert pos[..., 1].min() >= -1e-5
    np.testing.assert_allclose(pos[2, 0], [0.0, 1.2, 0.0], atol=1e-6)
    body.end_grab(2)
    body.step(params, frames=1)


def test_world_fused_ordered_backend(small):
    params = ts.PhysicsParams(num_substeps=2)
    world = ts.World(params)
    batch = world.add_body_batch(
        small, 8, engine="neohookean", backend="fused_ordered", jitter=0.05
    )
    batch.interpret = True  # CPU lane
    world.step(2)
    d = world.diagnostics()["body0"]
    assert d["batch"] == 8 and not d["nan"]
    # jittered bodies must differ
    pos = batch.positions()
    assert np.abs(pos[0] - pos[1]).max() > 1e-3

    with pytest.raises(ValueError):
        world.add_body_batch(small, 4, engine="neohookean",
                             backend="fused_ordered")
    with pytest.raises(ValueError):
        world.add_body_batch(small, 8, engine="polar",
                             backend="fused_ordered")
