"""Jacobi polar-decomposition solver: property tests (quaternion hygiene,
frame invariance, settling) — the reference's GPU path has no oracle, so
properties replace trajectories (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tetsim_tpu as ts
from tetsim_tpu.solvers import polar


def run(mesh, frames, params=None, state=None, ctrl=None):
    arr = ts.build_arrays(mesh)
    state = state or ts.init_state(mesh)
    ctrl = ctrl or ts.Controls.none()
    params = params or ts.default_gpu_params()
    step = jax.jit(polar.step_frame)
    for _ in range(frames):
        state, _ = step(state, arr, params, ctrl)
    return state


def test_quats_stay_normalized(small_mesh):
    state = run(small_mesh, frames=30)
    norms = np.linalg.norm(np.asarray(state.quats), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_settles_on_floor(small_mesh):
    state = run(small_mesh, frames=120)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-5
    # kinetic energy decayed (settled)
    assert np.abs(np.asarray(state.vel)).max() < 2.0


@pytest.mark.quick
def test_shape_preserved(small_mesh):
    """Shape matching is rigid-ish: edge lengths after settling stay within a
    moderate band of rest lengths."""
    state = run(small_mesh, frames=120)
    pos = np.asarray(state.pos)
    tets = small_mesh.tets
    rest = small_mesh.verts
    def edge_lens(p):
        e = p[tets[:, 1]] - p[tets[:, 0]]
        return np.linalg.norm(e, axis=-1)
    ratio = edge_lens(pos) / edge_lens(rest)
    assert ratio.min() > 0.5 and ratio.max() < 1.6


def test_zero_gravity_rest_is_fixed_point(small_mesh):
    params = ts.PhysicsParams(num_substeps=20, gravity=jnp.float32(0.0))
    state = run(small_mesh, frames=10, params=params)
    np.testing.assert_allclose(np.asarray(state.pos), small_mesh.verts, atol=1e-4)


def test_rotation_equivariance():
    """Simulating a rotated copy = rotating the simulation (zero gravity, no
    floor interaction): the polar solve must be frame-equivariant.

    The rotated run warm-starts its per-tet quaternions with the frame
    rotation — extract_rotation's fixed 9 iterations from identity
    (SoftbodyGPU.js:123) only resolve *incremental* rotations exactly, the
    same property the reference has."""
    mesh = ts.grid_mesh(2, 2, 2, cell=0.2, origin=(-0.2, 1.0, -0.2))
    # stretch initial positions to make the solve do real work
    stretched = mesh.verts * np.float32([1.3, 0.9, 1.0])

    theta = 0.7
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    q_rot = np.array([0.0, s, 0.0, c], np.float32)  # y-axis rotation, xyzw
    rot = np.asarray(
        jax.vmap(polar.quat_rotate, in_axes=(0, None))(
            jnp.eye(3, dtype=jnp.float32), jnp.asarray(q_rot)
        )
    ).T  # columns R e_i -> matrix

    params = ts.PhysicsParams(num_substeps=20, gravity=jnp.float32(0.0))
    arr = ts.build_arrays(mesh)
    step = jax.jit(polar.step_frame)

    def simulate(init_pos, init_quat):
        quats = jnp.broadcast_to(jnp.asarray(init_quat), (mesh.num_tets, 4))
        state = ts.init_state(mesh).replace(
            pos=jnp.asarray(init_pos), prev_pos=jnp.asarray(init_pos), quats=quats
        )
        for _ in range(5):
            state, _ = step(state, arr, params, ts.Controls.none())
        return np.asarray(state.pos)

    base = simulate(stretched, np.array([0, 0, 0, 1], np.float32))
    rotated = simulate(stretched @ rot.T, q_rot)
    np.testing.assert_allclose(rotated, base @ rot.T, atol=5e-4)


def test_extract_rotation_recovers_known_rotation():
    """extract_rotation on A = R (pure rotation covariance) returns R."""
    rng = np.random.default_rng(42)
    axis = rng.standard_normal(3).astype(np.float32)
    axis /= np.linalg.norm(axis)
    angle = 1.1
    q_true = np.concatenate([axis * np.sin(angle / 2), [np.cos(angle / 2)]]).astype(
        np.float32
    )
    # build rotation matrix columns: R e_i
    cols = [np.asarray(polar.quat_rotate(jnp.asarray(np.eye(3, dtype=np.float32)[i]), jnp.asarray(q_true))) for i in range(3)]
    r = np.stack(cols, axis=-1)
    # covariance A with A's columns = R's columns (identity current frame)
    q0 = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    q = np.asarray(polar.extract_rotation(jnp.asarray(r), q0))
    q = q / np.linalg.norm(q)
    # q == +-q_true
    dot = abs(float(np.dot(q, q_true)))
    assert dot > 1.0 - 1e-4, f"recovered {q} vs {q_true}"


def test_grab_pins_particle_polar(small_mesh):
    arr = ts.build_arrays(small_mesh)
    state = ts.init_state(small_mesh)
    params = ts.default_gpu_params()
    target = jnp.array([0.0, 1.2, 0.0], jnp.float32)
    ctrl = ts.Controls(grab_id=jnp.int32(3), grab_pos=target)
    step = jax.jit(polar.step_frame)
    for _ in range(30):
        state, _ = step(state, arr, params, ctrl)
    np.testing.assert_allclose(np.asarray(state.pos)[3], np.asarray(target), atol=1e-6)


def test_extract_iters_default_is_reference_nine(small_mesh):
    """extract_iters=9 (explicit) must be bit-identical to the default —
    the reference's fixed iteration count (SoftbodyGPU.js:123) is the
    parity-preserving default of the PhysicsParams lever."""
    s_default = run(small_mesh, frames=3)
    s_nine = run(
        small_mesh, frames=3,
        params=ts.PhysicsParams(num_substeps=20, extract_iters=9),
    )
    assert np.array_equal(np.asarray(s_default.pos), np.asarray(s_nine.pos))


def test_extract_iters_low_stays_stable(small_mesh):
    """The perf lever (fewer warm-started extractRotation iterations —
    PhysicsParams.extract_iters) must preserve the solver's invariants:
    settling on the floor, unit quaternions, shape preservation."""
    params = ts.PhysicsParams(num_substeps=20, extract_iters=2)
    state = run(small_mesh, frames=120, params=params)
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    q = np.asarray(state.quats)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-5
    assert np.abs(vel).max() < 0.2
    assert np.abs(np.linalg.norm(q, axis=-1) - 1.0).max() < 1e-4


def test_extract_iters_grid_parity(small_mesh):
    """The iters plumb reaches every polar path identically: generic
    engine == grid stencil engine at extract_iters=2 (the parity chain
    holds for non-default iteration counts too)."""
    from tetsim_tpu.solvers import polar_grid as pg

    params = ts.PhysicsParams(num_substeps=5, extract_iters=2)
    ctrl = ts.Controls.none()
    dims = (3, 3, 3)
    garr = pg.build_grid_arrays(small_mesh, dims)
    arr = ts.build_arrays(small_mesh)
    gs = ts.init_state(small_mesh)
    ss = ts.init_state(small_mesh)
    gstep = jax.jit(pg.step_frame)
    sstep = jax.jit(polar.step_frame)
    for _ in range(10):
        gs, _ = gstep(gs, garr, params, ctrl)
        ss, _ = sstep(ss, arr, params, ctrl)
    d = np.abs(np.asarray(gs.pos) - np.asarray(ss.pos)).max()
    assert d < 5e-5, d
