"""Piecewise fused Neo-Hookean GS kernel (kernels/nh_pieces.py) — the
unstructured-mesh scale path for the reference-fidelity physics.

Parity oracle: an INDEPENDENT implementation of the identical two-level
schedule (intra-piece colored GS + cross-piece Jacobi completion), built
here from the same host tables but through a completely different compute
path — solvers.neohookean.solve_tet_batch on [B,C,4,3] gathers plus a
global segment_sum completion.  The kernel (interpret mode) must match it
to f32 accumulation order.

Physics validation vs the GLOBAL greedy engine is qualitative by design:
the cross-piece Jacobi completion is a documented schedule divergence
(kernels/nh_pieces.py header) — the same GS->Jacobi trade the reference
makes wholesale in its GPU backend (/root/reference/README.md:25), here
confined to piece-surface particles.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine
from tetsim_tpu.solvers.neohookean import solve_tet_batch
from tetsim_tpu.kernels.nh_pieces import (
    _CW,
    build_nh_pieces_arrays,
    build_nh_pieces_schedule,
    step_frame,
)


@pytest.fixture(scope="module")
def blob():
    # irregular blob: ellipsoid (masked grid — no regular stencil applies)
    return ts.ellipsoid_mesh(8, radii=(0.4, 0.3, 0.35), center=(0.0, 0.8, 0.0))


@pytest.fixture(scope="module")
def blob_arr(blob):
    return build_nh_pieces_arrays(blob, tets_per_piece=128)


def test_schedule_covers_mesh_once(blob):
    s = build_nh_pieces_schedule(blob, tets_per_piece=128)
    # every tet's 4 corners land in exactly one sub-level slot: total live
    # inverse entries == 4*M (an intra-level vertex collision would
    # overwrite an entry and break this count)
    assert int((s.winv >= 0).sum()) == 4 * blob.num_tets
    # within a sub-level of a piece, corner lanes are vertex-disjoint
    for l in range(s.l_max):
        for p in range(s.n_pieces):
            live = s.cons[l, p, 10:14].max(axis=0) > 0  # live tet slots
            k = int(live.sum())
            if k == 0:
                continue
            corners = s.lids[l, p].reshape(4, _CW)[:, :k]
            assert len(np.unique(corners)) == 4 * k, (
                f"level {l} piece {p} reuses a vertex"
            )
    # owner/boundary tables consistent
    g2l = np.asarray(s.g2l).reshape(-1)
    own = np.asarray(s.owner_inst)
    assert np.array_equal(g2l[own], np.arange(blob.num_particles))


def _reference_step(state, sched, arr, params, controls, frames):
    """Independent two-level-schedule reference in GLOBAL state space."""
    n = sched.num_particles
    g2l_flat = jnp.asarray(sched.g2l.reshape(-1))
    lids = jnp.asarray(sched.lids)
    winv = jnp.asarray(sched.winv)
    cons = jnp.asarray(sched.cons)
    inv_mass = jnp.asarray(sched.inv_mass)
    counts = jnp.zeros(n + 1).at[g2l_flat].add(
        jnp.where(g2l_flat < n, 1.0, 0.0)
    )[:n]
    dt = params.dt
    pos, vel = state.pos, state.vel
    movable = (inv_mass > 0.0)[:, None]

    for _ in range(frames * params.num_substeps):
        vel = vel + jnp.asarray([0.0, 1.0, 0.0]) * params.gravity * dt
        vel = jnp.where(movable, vel, 0.0)
        prev = pos
        pred = pos + vel * dt
        # local planes [B*rp, 3]
        loc = jnp.concatenate([pred, jnp.zeros((1, 3))])[g2l_flat]
        loc = loc.reshape(sched.B, sched.rp, 3)
        for l in range(sched.l_max):
            ids = lids[l]  # [B, 4*CW] corner-major
            p = jnp.take_along_axis(loc, ids[..., None], axis=1)
            p = p.reshape(sched.B, 4, _CW, 3).transpose(0, 2, 1, 3)
            irp = cons[l, :, :9, :].transpose(0, 2, 1).reshape(
                sched.B, _CW, 3, 3
            )
            irv = cons[l, :, 9, :]
            imc = cons[l, :, 10:14, :].transpose(0, 2, 1)
            delta, _ = solve_tet_batch(p, irp, irv, imc, dt, params)
            newc = (p + delta).transpose(0, 2, 1, 3).reshape(
                sched.B, 4 * _CW, 3
            )
            inv = winv[l]  # [B, rp]
            upd = jnp.take_along_axis(
                newc, jnp.maximum(inv, 0)[..., None], axis=1
            )
            loc = jnp.where((inv >= 0)[..., None], upd, loc)
        # cross-piece completion: AVERAGE per-instance deltas per global pid
        # (averaged projections — kernels/nh_pieces.py module header)
        dflat = (loc.reshape(-1, 3)
                 - jnp.concatenate([pred, jnp.zeros((1, 3))])[g2l_flat])
        seg = jnp.zeros((n + 1, 3)).at[g2l_flat].add(dflat)[:n]
        seg = seg / counts[:, None]
        pos = pred + seg
        # collide + grab + velocity (solvers.common semantics)
        pos = jnp.clip(pos, params.world_min, params.world_max)
        below = pos[:, 1] < 0.0
        pos = pos.at[:, 1].set(jnp.where(below, 0.0, pos[:, 1]))
        k = jnp.minimum(1.0, dt * params.friction)
        for ax in (0, 2):
            pos = pos.at[:, ax].add(
                jnp.where(below, (prev[:, ax] - pos[:, ax]) * k, 0.0)
            )
        gid = jnp.atleast_1d(controls.grab_id)
        gpos = jnp.atleast_2d(controls.grab_pos)
        for g in range(gid.shape[0]):
            pos = jnp.where(
                (jnp.arange(n) == gid[g])[:, None], gpos[g], pos
            )
        vel = (pos - prev) / dt
    return pos, vel


@pytest.mark.quick
def test_parity_with_independent_reference(blob, blob_arr):
    sched = build_nh_pieces_schedule(blob, tets_per_piece=128)
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    state = ts.init_state(blob)
    ref_pos, _ = _reference_step(state, sched, blob_arr, params, controls,
                                 frames=4)
    s = state
    for _ in range(4):
        s, _ = step_frame(s, blob_arr, params, controls, interpret=True)
    np.testing.assert_allclose(np.asarray(s.pos), np.asarray(ref_pos),
                               atol=2e-5)


def test_boundary_prefix_parity(blob, blob_arr):
    """Banded lanes ([J2 | J>=3 | interior], polar_pieces.band_locals):
    the J=2 partner completion computes (da+db)/2 exactly like the tier
    average, so the banded trajectory matches the default layout."""
    arrp = build_nh_pieces_arrays(blob, tets_per_piece=128,
                                  boundary_prefix=True)
    assert arrp.r2 > 0
    lbm = np.asarray(arrp.lane_bnd).reshape(arrp.B, arrp.rp)
    assert (lbm[:, : arrp.r2] < 0).all()
    assert (lbm[:, arrp.rb:] < 0).all()
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    sa, sb = ts.init_state(blob), ts.init_state(blob)
    for _ in range(4):
        sa, _ = step_frame(sa, blob_arr, params, controls, interpret=True)
        sb, _ = step_frame(sb, arrp, params, controls, interpret=True)
    np.testing.assert_allclose(np.asarray(sb.pos), np.asarray(sa.pos),
                               atol=2e-5)


def test_grab_matches_reference(blob, blob_arr):
    sched = build_nh_pieces_schedule(blob, tets_per_piece=128)
    params = ts.PhysicsParams(num_substeps=5)
    gid = int(np.argmax(blob.verts[:, 1]))
    target = blob.verts[gid] + np.asarray([0.05, 0.3, 0.0], np.float32)
    controls = ts.Controls(
        grab_id=jnp.int32(gid), grab_pos=jnp.asarray(target)
    )
    state = ts.init_state(blob)
    ref_pos, _ = _reference_step(state, sched, blob_arr, params, controls,
                                 frames=3)
    s = state
    for _ in range(3):
        s, _ = step_frame(s, blob_arr, params, controls, interpret=True)
    np.testing.assert_allclose(np.asarray(s.pos), np.asarray(ref_pos),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s.pos[gid]), target, atol=1e-5)


def test_close_to_global_greedy_engine_precontact(blob, blob_arr):
    """The two-level schedule is a documented divergence from the global
    greedy GS order; pre-contact and at small dt the trajectories must
    stay CLOSE — a physics-sanity bound, not bitwise parity.  Measured
    divergence on this deliberately-adversarial config (960-tet blob cut
    into 128-tet pieces, so piece-surface particles are a large fraction)
    is ~9e-3 over 2 frames; production piece size (2048) shrinks the
    boundary fraction by ~4x."""
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    arrx = ts.build_arrays(blob, coloring="greedy")
    step_x = jax.jit(get_engine("neohookean").step_frame)
    sx, sp = ts.init_state(blob), ts.init_state(blob)
    for _ in range(2):
        sx, _ = step_x(sx, arrx, params, controls)
        sp, _ = step_frame(sp, blob_arr, params, controls, interpret=True)
    d = float(jnp.abs(sp.pos - sx.pos).max())
    assert d < 3e-2, f"pieces vs global greedy diverged {d} pre-contact"


def test_drop_soak_stays_bounded(blob, blob_arr):
    """Drop-and-bounce soak: the cross-piece Jacobi coupling must be
    STABLE (no oscillation blow-up at boundary particles).  The blob
    legitimately still bounces at frame 60 — the GLOBAL greedy engine
    shows the identical envelope (measured peak impact |v| ~3.3, frame-59
    |v| ~1.2-1.6) — so the criterion is a bounded energy envelope, not
    settling."""
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()
    s = ts.init_state(blob)
    step = jax.jit(
        lambda st: step_frame(st, blob_arr, params, controls,
                              interpret=True)[0]
    )
    max_v = []
    for i in range(60):
        s = step(s)
        if i % 10 == 9:
            assert np.isfinite(np.asarray(s.pos)).all(), f"NaN at frame {i}"
            max_v.append(float(jnp.abs(s.vel).max()))
    assert float(s.pos[:, 1].min()) >= -1e-4  # floor holds
    assert max(max_v) < 4.5, f"energy blow-up: max|v| history {max_v}"
    assert max_v[-1] < 2.5, f"did not calm after impacts: {max_v}"


def test_engine_registry_and_body():
    eng = get_engine("nh_pieces")
    assert hasattr(eng, "step_frame")
    mesh = ts.ellipsoid_mesh(6, radii=(0.3, 0.25, 0.3), center=(0, 0.6, 0))
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    body = world.add_body(mesh, engine="nh_pieces")
    world.step(frames=2)
    assert np.isfinite(body.positions).all()
    pid = body.start_grab([0.0, 0.9, 0.0])
    assert 0 <= pid < mesh.num_particles
    world.step(frames=1)
    body.end_grab()
