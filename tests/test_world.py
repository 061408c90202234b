"""World/Body API, skinning, grab round-trip, diagnostics, checkpoint."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tetsim_tpu as ts
from tetsim_tpu import checkpoint, diag


def test_world_step_dragon(dragon):
    world = ts.World(ts.default_gpu_params())
    body = world.add_body(dragon, engine="polar")
    world.step(frames=3)
    assert np.isfinite(body.positions).all()
    d = world.diagnostics()["body0"]
    assert not d["nan"]
    assert d["min_height"] >= -1.0 - 1e-6


def test_surface_skinning_matches_reference_math(dragon):
    """Skinned vis verts = barycentric combination of tet corners
    (Softbody.js:259-273)."""
    world = ts.World(ts.default_gpu_params())
    body = world.add_body(dragon, engine="polar")
    world.step(frames=2)

    pos = body.positions
    sp = body.surface_positions()
    # recompute on host
    ids = dragon.tets[dragon.vis_tet_ids]  # [S,4]
    b = dragon.vis_bary
    w = np.concatenate([b, 1 - b.sum(1, keepdims=True)], axis=1)
    expect = (pos[ids] * w[..., None]).sum(axis=1)
    np.testing.assert_allclose(sp, expect, atol=1e-6)
    assert sp.shape == (29800, 3)


def test_surface_mesh_normals(dragon):
    world = ts.World(ts.default_gpu_params())
    body = world.add_body(dragon, engine="polar")
    verts, normals, tris = body.surface_mesh()
    assert verts.shape == (29800, 3)
    assert normals.shape == (29800, 3)
    assert tris.shape == (59657, 3)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-4)


@pytest.mark.parametrize("engine", ["neohookean", "polar"])
def test_grab_round_trip(small_mesh, engine):
    world = ts.World(ts.PhysicsParams(num_substeps=5))
    body = world.add_body(small_mesh, engine=engine)
    world.step(frames=2)
    # grab near a known vertex
    target_vertex = body.positions[7]
    gid = body.start_grab(target_vertex + 1e-4)
    assert gid == 7
    body.move_grabbed([0.0, 1.0, 0.0])
    world.step(frames=10)
    np.testing.assert_allclose(body.positions[7], [0.0, 1.0, 0.0], atol=1e-6)
    body.end_grab()
    world.step(frames=20)
    assert body.positions[7][1] < 0.9  # released, gravity wins


def test_two_bodies_independent(small_mesh):
    world = ts.World(ts.PhysicsParams(num_substeps=5))
    b1 = world.add_body(small_mesh, engine="neohookean")
    b2 = world.add_body(small_mesh, engine="polar")
    world.step(frames=5)
    assert np.isfinite(b1.positions).all()
    assert np.isfinite(b2.positions).all()
    # engines differ -> trajectories differ
    assert np.abs(b1.positions - b2.positions).max() > 1e-4


def test_checkpoint_resume_exact(small_mesh, tmp_path):
    params = ts.PhysicsParams(num_substeps=5)
    world = ts.World(params)
    body = world.add_body(small_mesh, engine="neohookean")
    world.step(frames=5)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, body.state)

    # continue 5 more frames
    world.step(frames=5)
    ref = body.positions.copy()

    # restore and replay
    body.state = checkpoint.load(path)
    world.step(frames=5)
    np.testing.assert_array_equal(body.positions, ref)


def test_diag_values(small_mesh):
    world = ts.World(ts.PhysicsParams(num_substeps=5))
    body = world.add_body(small_mesh)
    world.step(frames=1)
    d = diag.summarize(body.state, body.arrays, body.last_diag)
    assert set(d) >= {"volume_error", "kinetic_energy", "max_speed", "min_height", "nan"}
    assert d["kinetic_energy"] >= 0.0


def test_rotated_normals(dragon):
    import tetsim_tpu as ts

    world = ts.World(ts.PhysicsParams(num_substeps=2))
    body = world.add_body(dragon, engine="polar")
    world.step(2)
    v1, n_smooth, _ = body.surface_mesh(normals="smooth")
    v2, n_rot, _ = body.surface_mesh(normals="rotated")
    np.testing.assert_allclose(v1, v2)
    assert np.isfinite(n_rot).all()
    # unit length (rotation preserves the rest normal's norm)
    np.testing.assert_allclose(np.linalg.norm(n_rot, axis=1), 1.0, atol=1e-5)
    # for small deformation the two normal modes agree closely
    dots = np.sum(n_rot * n_smooth, axis=1)
    assert np.percentile(dots, 5) > 0.9


def test_rotated_normals_needs_polar(dragon):
    import tetsim_tpu as ts

    world = ts.World(ts.PhysicsParams(num_substeps=1))
    body = world.add_body(dragon, engine="neohookean", coloring="greedy")
    world.step(1)
    with pytest.raises(ValueError):
        body.surface_mesh(normals="rotated")
    with pytest.raises(ValueError):
        body.surface_mesh(normals="bogus")


def test_reference_api_aliases(dragon):
    world = ts.World(ts.default_cpu_params())
    body = world.add_body(dragon, engine="neohookean", coloring="greedy")
    body.simulate(1.0 / 300.0, world.params)  # one substep, reference style
    pos, surface = body.end_frame()
    assert pos.shape == (1234, 3) and surface.shape == (29800, 3)
    assert np.isfinite(pos).all()


@pytest.mark.parametrize("engine", ["neohookean", "polar"])
def test_pinned_particles(engine):
    """Zero-inv-mass pinning (Softbody.js:82-85 convention): pinned top
    vertices hold a hanging block against gravity in both engines."""
    mesh = ts.grid_mesh(2, 2, 2, cell=0.3, origin=(-0.3, 1.0, -0.3))
    top = np.nonzero(mesh.verts[:, 1] >= mesh.verts[:, 1].max() - 1e-6)[0]
    from tetsim_tpu.world import Body

    body = Body(mesh, engine=engine, pinned=top)
    params = ts.PhysicsParams(num_substeps=5)
    for _ in range(30):
        body.step(params)
    pos = body.positions
    rest = mesh.verts
    # pinned vertices have not moved at all
    np.testing.assert_allclose(pos[top], rest[top], atol=1e-6)
    # the rest of the body sagged below its rest pose but did not fall away
    others = np.setdiff1d(np.arange(mesh.num_particles), top)
    assert pos[others, 1].min() < rest[others, 1].min() - 1e-3
    assert pos[others, 1].min() > 0.2  # hanging, not dropped to the floor
    assert np.isfinite(pos).all()


def test_checkpoint_validation(small_mesh, tmp_path):
    """Hardened load: structure/shape/mesh/engine mismatches raise clearly
    instead of positionally unflattening (VERDICT r1 #8)."""
    import pytest

    body = ts.World(ts.PhysicsParams(num_substeps=2)).add_body(
        small_mesh, engine="polar"
    )
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, body.state, mesh=small_mesh, engine="polar")

    # same mesh + engine loads fine
    out = checkpoint.load(path, like=body.state, mesh=small_mesh, engine="polar")
    np.testing.assert_array_equal(out.pos, body.state.pos)

    # wrong engine
    with pytest.raises(ValueError, match="engine"):
        checkpoint.load(path, mesh=small_mesh, engine="neohookean")

    # wrong mesh (different grid)
    other = ts.grid_mesh(4, 4, 4, cell=0.2)
    with pytest.raises(ValueError, match="does not match this mesh"):
        checkpoint.load(path, mesh=other, engine="polar")

    # wrong target structure: leaf shapes differ
    other_state = ts.init_state(other)
    with pytest.raises(ValueError, match="shapes"):
        checkpoint.load(path, like=other_state)

    # wrong treedef (different pytree type)
    with pytest.raises(ValueError, match="structure|shapes"):
        checkpoint.load(path, like={"a": np.zeros(3)})


def test_dense_backend_world_path(small_mesh):
    """DenseBody is reachable from World.add_body_batch (VERDICT r1 #7)."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    batch = world.add_body_batch(
        small_mesh, 3, engine="neohookean", backend="dense", jitter=0.05
    )
    world.step(3)
    pos = batch.positions()
    assert pos.shape == (3, small_mesh.num_particles, 3)
    assert np.isfinite(pos).all()
    d = world.diagnostics()
    assert d["body0"]["batch"] == 3 and not d["body0"]["nan"]
    # per-body grab surface
    pid = batch.start_grab(1, pos[1].mean(axis=0))
    assert 0 <= pid < small_mesh.num_particles
    batch.move_grabbed(1, pos[1].mean(axis=0) + [0, 0.2, 0])
    world.step(2)
    batch.end_grab(1)
    assert int(np.asarray(batch.grab_id)[1]) == -1


def test_checkpoint_corruption_and_unstamped_mesh_guard(small_mesh, tmp_path):
    import pytest

    state = ts.init_state(small_mesh)
    path = str(tmp_path / "plain.npz")
    checkpoint.save(path, state)  # unstamped

    other = ts.grid_mesh(4, 4, 4)
    with pytest.raises(ValueError, match="rows"):
        checkpoint.load(path, mesh=other)
    out = checkpoint.load(path, mesh=small_mesh)
    np.testing.assert_array_equal(out.pos, state.pos)

    # a truncated/mutated file must fail the stamped-shape self check
    import numpy as _np
    with _np.load(path) as z:
        data = {k: z[k] for k in z.files}
    data["leaf0"] = data["leaf0"][:-1]
    bad = str(tmp_path / "bad.npz")
    _np.savez_compressed(bad, **data)
    with pytest.raises(ValueError, match="corrupt|shapes"):
        checkpoint.load(bad)


def test_pinned_with_prebuilt_arrays_rejected(small_mesh):
    import pytest

    arr = ts.build_arrays(small_mesh, coloring=None)
    with pytest.raises(ValueError, match="pinned"):
        ts.World().add_body(small_mesh, engine="polar", arrays=arr, pinned=[0])


def test_world_neohookean_grid_body():
    """add_grid_body(engine='neohookean_grid'): the reference-fidelity
    physics on the structured scale path, with working diagnostics."""
    w = ts.World(ts.PhysicsParams(num_substeps=2))
    b = w.add_grid_body((3, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0),
                        engine="neohookean_grid")
    w.step(3)
    d = w.diagnostics()["body0"]
    assert np.isfinite(b.state.pos).all() and not d["nan"]
    assert {"volume_error", "kinetic_energy", "max_speed"} <= set(d)
    assert abs(d["volume_error"]) < 0.2
    gid = b.start_grab([0.4, 1.2, 0.4])
    assert gid >= 0
    w.step(2)
    b.end_grab()


def test_world_polar_pieces_body():
    """Body(engine='polar_pieces') auto-builds pieces arrays; steps and
    reports diagnostics (no volume_error — pieces carry no tet table)."""
    mesh = ts.ellipsoid_mesh(6, radii=(0.3, 0.25, 0.3), center=(0, 0.6, 0))
    w = ts.World(ts.PhysicsParams(num_substeps=2))
    b = w.add_body(mesh, engine="polar_pieces", coloring=None)
    w.step(3)
    d = w.diagnostics()["body0"]
    assert np.isfinite(b.state.pos).all() and not d["nan"]
    assert "kinetic_energy" in d and "volume_error" not in d


def test_grid_body_batch_per_body_grabs():
    """VERDICT r3 item 4: a batched grid scene must reproduce the
    reference's one-grabber-per-body interactivity (main.js:56-65).  Two
    different bodies of a 3-box polar_grid batch are grabbed at once; each
    grabbed particle pins to its own target while the third body falls."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    batch = world.add_grid_body_batch((2, 2, 2), 3, cell=0.25,
                                      engine="polar_grid")
    t0 = np.array([0.1, 1.4, 0.1], np.float32)
    t2 = np.array([1.6, 1.5, 0.2], np.float32)
    p0 = batch.start_grab(0, [0.0, 1.0, 0.0])
    p2 = batch.start_grab(2, [1.5, 1.0, 0.0])
    batch.move_grabbed(0, t0)
    batch.move_grabbed(2, t2)
    for _ in range(5):
        world.step()
    pos = batch.positions
    np.testing.assert_allclose(pos[0, p0], t0, atol=1e-6)
    np.testing.assert_allclose(pos[2, p2], t2, atol=1e-6)
    # ungrabbed body keeps falling: every particle below its grab-free drop
    assert pos[1][:, 1].max() < 1.2
    assert np.isfinite(pos).all()
    # releasing one grab frees that body only
    batch.end_grab(0)
    for _ in range(3):
        world.step()
    pos = batch.positions
    assert not np.allclose(pos[0, p0], t0, atol=1e-4)
    np.testing.assert_allclose(pos[2, p2], t2, atol=1e-6)


def test_grid_body_batch_neohookean_color_scan():
    """Same per-body grabs through the vmapped 48-color NH stencil engine
    (color_scan keeps the vmapped compile tractable on CPU)."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    batch = world.add_grid_body_batch((2, 2, 2), 2, cell=0.25,
                                      engine="neohookean_grid",
                                      color_scan=True)
    t1 = np.array([0.9, 1.3, 0.1], np.float32)
    p1 = batch.start_grab(1, [0.8, 1.0, 0.0])
    batch.move_grabbed(1, t1)
    for _ in range(4):
        world.step()
    pos = batch.positions
    np.testing.assert_allclose(pos[1, p1], t1, atol=1e-6)
    assert pos[0][:, 1].max() < 1.2
    assert np.isfinite(pos).all()


def test_grid_body_batch_diagnostics():
    """World.diagnostics() must cover GridBodyBatch scenes (round-4 review:
    the generic branch read .state, which the batch does not have)."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_grid_body_batch((2, 2, 2), 2, cell=0.25, engine="polar_grid")
    world.step()
    d = world.diagnostics()["body0"]
    assert d["batch"] == 2 and not d["nan"]
    assert np.isfinite(d["min_height"]) and np.isfinite(d["max_speed"])


def test_multi_grab_single_grid_body():
    """The stencil engines accept the vector multi-slot grab form directly
    (common.norm_grabs): two simultaneous grabs on ONE body both pin."""
    from tetsim_tpu.solvers import polar_grid as pg

    dims = (3, 2, 2)
    mesh = ts.grid_mesh(*dims, cell=0.25, origin=(0.0, 0.6, 0.0))
    arr = pg.build_grid_arrays(mesh, dims)
    params = ts.PhysicsParams(num_substeps=2)
    ids = np.array([0, mesh.num_particles - 1], np.int32)
    targets = np.array([[0.0, 1.2, 0.0], [0.8, 1.3, 0.5]], np.float32)
    controls = ts.Controls(grab_id=jnp.asarray(ids),
                           grab_pos=jnp.asarray(targets))
    state = ts.init_state(mesh)
    step = jax.jit(pg.step_frame)
    for _ in range(4):
        state, _ = step(state, arr, params, controls)
    pos = np.asarray(state.pos)
    np.testing.assert_allclose(pos[ids[0]], targets[0], atol=1e-6)
    np.testing.assert_allclose(pos[ids[1]], targets[1], atol=1e-6)


def test_world_scene_checkpoint_roundtrip(small_mesh, tmp_path):
    """One-file scene checkpoint across a MIXED world (Body + GridBodyBatch
    + PackedGridBody): world.save -> restore into a matching world AND a
    full World.load rebuild both resume the identical session (VERDICT r4
    item 7).  The reference has no counterpart (SURVEY.md §5)."""
    def build():
        w = ts.World(ts.PhysicsParams(num_substeps=2))
        w.add_body(small_mesh, engine="polar")
        w.add_grid_body_batch((3, 3, 3), 2, cell=0.2, engine="polar_grid")
        w.add_grid_body((2, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0),
                        engine="polar_grid_pallas", packed=True)
        return w

    world = build()
    world.step(frames=3)
    world.bodies[0].start_grab([0.0, 1.0, 0.0])  # active grab round-trips
    world.bodies[1].start_grab(1, [0.3, 0.8, 0.3])
    path = str(tmp_path / "scene.npz")
    world.save(path)

    world.step(frames=3)
    ref = [np.asarray(b.positions) for b in world.bodies]
    ref_grab = int(world.bodies[0].controls.grab_id)
    assert ref_grab >= 0

    # (a) restore into a freshly built matching world
    w2 = build()
    w2.restore(path)
    assert int(w2.bodies[0].controls.grab_id) == ref_grab
    assert int(w2.bodies[1].controls.grab_id[1]) >= 0
    w2.step(frames=3)
    for b, r in zip(w2.bodies, ref):
        np.testing.assert_allclose(np.asarray(b.positions), r, atol=1e-5)

    # (b) full rebuild from the file alone
    w3 = ts.World.load(path)
    assert len(w3.bodies) == 3
    assert w3.params.num_substeps == 2
    w3.step(frames=3)
    for b2, b3 in zip(w2.bodies, w3.bodies):
        np.testing.assert_allclose(
            np.asarray(b3.positions), np.asarray(b2.positions), atol=1e-6
        )
    for b, r in zip(w3.bodies, ref):
        np.testing.assert_allclose(np.asarray(b.positions), r, atol=1e-5)


def test_world_scene_checkpoint_validates(small_mesh, tmp_path):
    """restore/load validate structure: body count, engine, mesh."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(small_mesh, engine="polar")
    path = str(tmp_path / "scene.npz")
    world.save(path)

    other = ts.World(ts.PhysicsParams(num_substeps=2))
    other.add_body(small_mesh, engine="neohookean")
    with pytest.raises(ValueError, match="engine"):
        other.restore(path)

    empty = ts.World()
    with pytest.raises(ValueError, match="bodies"):
        empty.restore(path)

    # a fused-backend batch round-trips through save/load too
    wf = ts.World(ts.PhysicsParams(num_substeps=2))
    wf.add_body_batch(small_mesh, 8, engine="neohookean", backend="fused",
                      jitter=0.05, seed=3)
    wf.step(frames=2)
    pf = str(tmp_path / "fused.npz")
    wf.save(pf)
    wf2 = ts.World.load(pf)
    np.testing.assert_allclose(
        wf2.bodies[0].positions(), wf.bodies[0].positions(), atol=1e-6
    )


def test_body_step_many_export_matches_sequential(small_mesh):
    """The generalized fused step+export (VERDICT r4 item 8): N frames +
    skinned surface in ONE dispatch must numerically match N sequential
    step() calls followed by a separate surface export — for Body,
    BatchedBody and GridBodyBatch."""
    from tetsim_tpu.mesh import with_boundary_surface
    from tetsim_tpu.world import Body, BatchedBody, _surface_render_data

    mesh = with_boundary_surface(small_mesh)
    p = ts.PhysicsParams(num_substeps=2)

    # Body (polar: quats available -> rotated mode must also work)
    b1 = Body(mesh, engine="polar")
    b2 = Body(mesh, engine="polar")
    b1.enable_render_export()
    vn = b1.step_many_export(p, frames=4)
    for _ in range(4):
        b2.step(p)
    ref = _surface_render_data(
        b2.state.pos, b2._surface.skin_ids, b2._surface.skin_w,
        b2._surface.tris,
    )
    np.testing.assert_allclose(np.asarray(vn), np.asarray(ref), atol=1e-5)
    rot = b1.step_many_export(p, frames=1, normals="rotated")
    nrm = np.asarray(rot)[1]
    np.testing.assert_allclose(
        np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-3
    )  # quaternion rotation preserves rest-normal unit length

    # BatchedBody (flat-concat multi-body)
    bb1 = BatchedBody(mesh, 4, engine="neohookean", jitter=0.05, seed=2)
    bb2 = BatchedBody(mesh, 4, engine="neohookean", jitter=0.05, seed=2)
    bb1.enable_render_export()
    vn = bb1.step_many_export(p, frames=3)
    for _ in range(3):
        bb2.step(p)
    ref = _surface_render_data(
        bb2.states.pos, bb2._surface.skin_ids, bb2._surface.skin_w,
        bb2._surface.tris,
    )
    np.testing.assert_allclose(np.asarray(vn), np.asarray(ref), atol=1e-5)

    # GridBodyBatch (vmapped stencil engines)
    g1 = ts.World(p).add_grid_body_batch((3, 3, 3), 2, cell=0.2,
                                         engine="polar_grid",
                                         with_surface=True)
    g2 = ts.World(p).add_grid_body_batch((3, 3, 3), 2, cell=0.2,
                                         engine="polar_grid",
                                         with_surface=True)
    g1.enable_render_export()
    vn = g1.step_many_export(p, frames=3)
    for _ in range(3):
        g2.step(p)
    ref = _surface_render_data(
        g2.states.pos.reshape(-1, 3), g2._surface.skin_ids,
        g2._surface.skin_w, g2._surface.tris,
    )
    np.testing.assert_allclose(np.asarray(vn), np.asarray(ref), atol=1e-5)
