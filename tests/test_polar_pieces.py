"""Piecewise fused polar kernel (kernels/polar_pieces.py) vs the XLA polar
engine — the single-connected-unstructured-mesh scale path.

Interpret mode on the hermetic CPU suite; real Mosaic lowering + the 1M-tet
rate floor live in tests_tpu/test_hardware.py.
"""
import numpy as np
import jax
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine
from tetsim_tpu.kernels.polar_pieces import (
    build_pieces_arrays,
    build_pieces_schedule,
    step_frame,
)


@pytest.fixture(scope="module")
def blob():
    # irregular blob: ellipsoid (masked grid — no regular stencil applies)
    return ts.ellipsoid_mesh(8, radii=(0.4, 0.3, 0.35), center=(0.0, 0.8, 0.0))


@pytest.fixture(scope="module")
def blob_arr(blob):
    return build_pieces_arrays(blob, tets_per_piece=128)


def test_partition_covers_mesh(blob, blob_arr):
    s = build_pieces_schedule(blob, tets_per_piece=128)
    # every tet in exactly one piece
    seen = np.asarray(s.tet_l2g).reshape(-1)
    seen = seen[seen < blob.num_tets]
    assert len(seen) == blob.num_tets
    assert len(np.unique(seen)) == blob.num_tets
    # every particle has an owner instance; completion tiers cover every
    # shared lane's instances exactly once, all mapping to one particle
    g2l = np.asarray(s.g2l).reshape(-1)
    own = np.asarray(s.owner_inst)
    assert np.array_equal(g2l[own], np.arange(blob.num_particles))
    tiers = []
    for j, c in enumerate(s.tier_counts):
        inst = np.asarray(s.bnd_inst)[j, :c]
        tiers.append(inst)
        # tier j instances of boundary row i all belong to the same pid
        if j > 0:
            assert np.array_equal(
                g2l[inst], g2l[np.asarray(s.bnd_inst)[0, :c]]
            )
    lane_bnd = np.asarray(s.lane_bnd)
    shared = np.nonzero(lane_bnd >= 0)[0]
    # tier multiset == the set of shared lanes, each exactly once
    assert np.array_equal(np.sort(np.concatenate(tiers)), shared)
    # every shared lane points at the boundary row holding its pid
    assert np.array_equal(
        g2l[shared], g2l[np.asarray(s.bnd_inst)[0, lane_bnd[shared]]]
    )


@pytest.mark.quick
def test_parity_with_xla_polar(blob, blob_arr):
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    arrx = ts.build_arrays(blob, coloring=None)
    step_x = jax.jit(get_engine("polar").step_frame)
    step_p = jax.jit(
        lambda s: step_frame(s, blob_arr, params, controls, interpret=True)[0]
    )
    sx, sp = ts.init_state(blob), ts.init_state(blob)
    for _ in range(6):
        sx, _ = step_x(sx, arrx, params, controls)
        sp = step_p(sp)
    np.testing.assert_allclose(sp.pos, sx.pos, atol=2e-5)
    np.testing.assert_allclose(sp.quats, sx.quats, atol=2e-5)


@pytest.mark.parametrize("tpp", [512, 128])
def test_boundary_prefix_parity(blob, tpp):
    """boundary_prefix=True bands each piece's lanes [J2 | J>=3 | interior]
    so completion becomes one partner gather (J2) + a banded tier
    read-back (J>=3).  The trajectory must match the default layout of
    the SAME decomposition (tpp=512: 2 pieces -> partner-only completion;
    tpp=128: 8 pieces -> partner + J>=3 tiers both exercised)."""
    arr0 = build_pieces_arrays(blob, tets_per_piece=tpp)
    arrp = build_pieces_arrays(blob, tets_per_piece=tpp,
                               boundary_prefix=True)
    # tier lanes confined to the J>=3 band; J=2 handled by partners only
    lbm = np.asarray(arrp.lane_bnd).reshape(arrp.B, arrp.rp)
    assert (lbm[:, arrp.rb:] < 0).all()
    assert (lbm[:, : arrp.r2] < 0).all()
    if tpp == 512:
        assert arrp.rb < arrp.rp  # a real interior exists
    else:
        assert arrp.tier_counts  # J>=3 tiers exercised
    # partner table is a symmetric pairing over exactly the J=2 lanes
    if arrp.r2:
        flat_self = (
            np.arange(arrp.B)[:, None] * arrp.rp + np.arange(arrp.r2)
        )
        sel = np.asarray(arrp.is2).reshape(-1)
        assert sel.any()
        pf = np.asarray(arrp.pidx).reshape(-1)[sel]
        # partners point back at each other and are distinct lanes
        assert (pf != flat_self.reshape(-1)[sel]).all()
        back = np.full(arrp.B * arrp.rp, -1)
        back[flat_self.reshape(-1)[sel]] = pf
        assert np.array_equal(back[pf], flat_self.reshape(-1)[sel])
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    step_a = jax.jit(
        lambda s: step_frame(s, arr0, params, controls, interpret=True)[0]
    )
    step_b = jax.jit(
        lambda s: step_frame(s, arrp, params, controls, interpret=True)[0]
    )
    sa, sb = ts.init_state(blob), ts.init_state(blob)
    for _ in range(4):
        sa = step_a(sa)
        sb = step_b(sb)
    np.testing.assert_allclose(sb.pos, sa.pos, atol=2e-5)
    np.testing.assert_allclose(sb.quats, sa.quats, atol=2e-5)


def test_grab_matches_xla(blob, blob_arr):
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none().replace(
        grab_id=np.int32(3),
        grab_pos=np.array([0.1, 1.1, 0.0], np.float32),
    )
    arrx = ts.build_arrays(blob, coloring=None)
    step_x = jax.jit(get_engine("polar").step_frame)
    step_p = jax.jit(
        lambda s: step_frame(s, blob_arr, params, controls, interpret=True)[0]
    )
    sx, sp = ts.init_state(blob), ts.init_state(blob)
    for _ in range(3):
        sx, _ = step_x(sx, arrx, params, controls)
        sp = step_p(sp)
    # the hard pin concentrates strain, which amplifies the (valid)
    # cross-piece f32 accumulation-order difference — 1e-4 instead of the
    # free-fall 2e-5
    np.testing.assert_allclose(sp.pos, sx.pos, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sp.pos)[3], [0.1, 1.1, 0.0], atol=1e-6
    )


def test_settles_and_stays_finite(blob, blob_arr):
    params = ts.PhysicsParams(num_substeps=5)
    step = jax.jit(
        lambda s: step_frame(
            s, blob_arr, params, ts.Controls.none(), interpret=True
        )[0]
    )
    state = ts.init_state(blob)
    for _ in range(40):
        state = step(state)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-5


def test_engine_registry():
    eng = ts.get_engine("polar_pieces")
    assert hasattr(eng, "step_frame") and hasattr(eng, "substep")
