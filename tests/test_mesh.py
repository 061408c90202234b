"""Mesh loading, rest-state precompute, and coloring tests."""
import numpy as np
import jax
import pytest

import tetsim_tpu as ts
from tetsim_tpu.mesh import (
    rest_state,
    level_schedule,
    greedy_color,
    color_slots,
    grid_mesh,
    single_tet_mesh,
)


def test_dragon_counts(dragon):
    # exact counts from the reference data (SURVEY.md §2.2)
    assert dragon.num_particles == 1234
    assert dragon.num_tets == 3840
    assert dragon.edges.shape == (6222, 2)
    assert dragon.num_surface_verts == 29800
    assert dragon.tris.shape == (59657, 3)
    assert dragon.tets.max() == 1233
    assert dragon.vis_tet_ids.max() < 3840


def test_rest_state_single_tet():
    mesh = single_tet_mesh()
    ir, irv, vol, im, rc = rest_state(mesh, density=1000.0)
    # unit right tet: V = 1/6
    np.testing.assert_allclose(vol, [1.0 / 6.0], rtol=1e-6)
    np.testing.assert_allclose(irv, [6.0], rtol=1e-6)
    # mass lumping: each vertex gets V/4 * density -> inv_mass = 4/(V*density)
    np.testing.assert_allclose(im, 4.0 / (1000.0 / 6.0), rtol=1e-6)
    # D = I for this tet, so inv_rest_pose = I
    np.testing.assert_allclose(ir[0], np.eye(3), atol=1e-6)
    # rest_centered sums to zero per tet
    np.testing.assert_allclose(rc.sum(axis=1), 0.0, atol=1e-6)


def test_dragon_rest_state_positive_volumes(dragon):
    _, _, vol, im, _ = rest_state(dragon)
    assert (vol > 0).all(), "dragon tets must be positively oriented"
    assert (im > 0).all(), "all dragon particles have mass"


@pytest.mark.parametrize("colorer", [level_schedule, greedy_color])
def test_coloring_valid(dragon, colorer):
    colors = colorer(dragon.tets, dragon.num_particles)
    assert colors.min() == 0
    # no two tets of the same color share a vertex
    for c in range(colors.max() + 1):
        flat = dragon.tets[colors == c].reshape(-1)
        assert len(np.unique(flat)) == len(flat), f"color {c} shares a vertex"


def test_level_schedule_order_preserving(dragon):
    levels = level_schedule(dragon.tets, dragon.num_particles)
    # any two tets sharing a vertex must be processed in index order
    vert_last = {}
    for i, tet in enumerate(dragon.tets):
        for v in tet:
            if v in vert_last:
                j, lj = vert_last[v]
                assert levels[i] > lj, f"tets {j},{i} share vertex {v} out of order"
            vert_last[v] = (i, levels[i])


def test_color_slots_complete(dragon):
    colors = greedy_color(dragon.tets, dragon.num_particles)
    slots = color_slots(colors)
    filled = slots[slots >= 0]
    assert len(filled) == dragon.num_tets
    assert sorted(filled.tolist()) == list(range(dragon.num_tets))


def test_grid_mesh_conforming():
    mesh = grid_mesh(2, 2, 2, cell=1.0)
    assert mesh.num_tets == 2 * 2 * 2 * 6
    _, _, vol, _, _ = rest_state(mesh)
    assert (vol > 0).all()
    # Kuhn tets each have volume cell^3/6; total fills the block exactly
    np.testing.assert_allclose(vol, 1.0 / 6.0, rtol=1e-5)
    np.testing.assert_allclose(vol.sum(), 8.0, rtol=1e-5)


def test_build_arrays_device(dragon):
    arr = ts.build_arrays(dragon, coloring="greedy")
    assert arr.num_particles == 1234
    assert arr.num_tets == 3840
    # slot-major schedule: every real tet appears exactly once
    assert arr.slot_tets.ndim == 3
    assert int(arr.slot_valid.sum()) == 3840
    # invalid slots are fully masked (zero constants)
    sv = np.asarray(arr.slot_valid)
    assert np.all(np.asarray(arr.slot_inv_rest_volume)[~sv] == 0.0)


def test_build_arrays_no_schedule(dragon):
    arr = ts.build_arrays(dragon, coloring=None)
    assert arr.slot_tets is None
    assert arr.rest_centered.shape == (3840, 4, 3)


def test_incidence_gating(dragon):
    # neohookean-style build: no polar tables
    arr = ts.build_arrays(dragon, coloring="greedy")
    assert arr.inc_idx is None and arr.inc_den is None
    # polar-style build: tables present, denominator positive everywhere
    arr = ts.build_arrays(dragon, coloring=None)
    assert arr.inc_idx is not None
    assert (np.asarray(arr.inc_den) > 0).all()
    # explicit override
    arr = ts.build_arrays(dragon, coloring="greedy", incidence=True)
    assert arr.inc_idx is not None


def test_npz_roundtrip(tmp_path, dragon):
    from tetsim_tpu import save_npz, load_npz

    p = str(tmp_path / "d.npz")
    save_npz(p, dragon)
    m = load_npz(p)
    np.testing.assert_array_equal(m.verts, dragon.verts)
    np.testing.assert_array_equal(m.tets, dragon.tets)
    np.testing.assert_array_equal(m.tris, dragon.tris)


def test_tetgen_loader(tmp_path):
    from tetsim_tpu import load_tetgen

    # one unit tet, 1-based ids, with attribute columns and comments
    (tmp_path / "m.node").write_text(
        "# tetgen node file\n4 3 0 0\n1 0 0 0\n2 1 0 0\n3 0 1 0\n4 0 0 1\n"
    )
    (tmp_path / "m.ele").write_text("1 4 0\n1 1 2 4 3  # negative orientation\n")
    m = load_tetgen(str(tmp_path / "m.node"), str(tmp_path / "m.ele"))
    assert m.num_particles == 4 and m.num_tets == 1
    assert m.edges.shape == (6, 2)
    from tetsim_tpu.mesh import rest_state

    _, _, vol, _, _ = rest_state(m)
    assert vol[0] > 0  # reoriented to positive volume
    # bad ele reference
    (tmp_path / "bad.ele").write_text("1 4 0\n1 1 2 9 3\n")
    with pytest.raises(ValueError):
        load_tetgen(str(tmp_path / "m.node"), str(tmp_path / "bad.ele"))


def test_masked_grid_mesh_sphere():
    """Shaped bodies from cube predicates (no external mesher)."""
    m = ts.ellipsoid_mesh(n=8, radii=(0.3, 0.3, 0.3), center=(0.0, 0.5, 0.0))
    full = ts.grid_mesh(9, 9, 9, cell=0.075)
    assert 0 < m.num_tets < full.num_tets
    # compacted ids: every vertex is referenced
    assert m.tets.max() == m.num_particles - 1
    assert len(np.unique(m.tets)) == m.num_particles
    # all tets positively oriented
    p = m.verts[m.tets]
    d = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]],
                 axis=-1)
    assert (np.linalg.det(d) > 0).all()
    # every vertex is inside the bounding ellipsoid inflated by one cell
    r = np.linalg.norm(m.verts - np.array([0.0, 0.5, 0.0]), axis=-1)
    assert r.max() <= 0.3 + 0.16


def test_masked_grid_mesh_validation():
    with pytest.raises(ValueError, match="rejected every cube"):
        ts.masked_grid_mesh(2, 2, 2, lambda c: np.zeros(8, bool))
    with pytest.raises(ValueError, match="must return bool"):
        ts.masked_grid_mesh(2, 2, 2, lambda c: np.zeros(3, bool))


def test_ellipsoid_simulates_on_both_engines():
    m = ts.ellipsoid_mesh(n=6, radii=(0.2, 0.15, 0.2), center=(0.0, 0.4, 0.0))
    params = ts.PhysicsParams(num_substeps=3)
    for engine, coloring in (("polar", None), ("neohookean", "greedy")):
        arr = ts.build_arrays(m, coloring=coloring)
        step = jax.jit(ts.get_engine(engine).step_frame)
        s = ts.init_state(m)
        for _ in range(30):
            s, _ = step(s, arr, params, ts.Controls.none())
        pos = np.asarray(s.pos)
        assert np.isfinite(pos).all()
        assert pos[:, 1].min() >= -1e-5  # resting on / above the floor


def test_boundary_surface():
    """with_boundary_surface: closed 2-manifold, exact skinning."""
    from tetsim_tpu.mesh import with_boundary_surface

    m = with_boundary_surface(ts.grid_mesh(3, 2, 4, cell=0.25))
    assert m.vis_tet_ids is not None and m.tris is not None
    V, F = m.num_surface_verts, m.tris.shape[0]
    E = len(np.unique(np.sort(np.concatenate(
        [m.tris[:, [0, 1]], m.tris[:, [1, 2]], m.tris[:, [2, 0]]]), axis=1),
        axis=0))
    assert V - E + F == 2  # closed surface (Euler characteristic)
    # skinned surface verts coincide exactly with boundary particles
    from tetsim_tpu.world import _Surface
    s = _Surface(m)
    verts = np.asarray(jax.numpy.sum(
        jax.numpy.asarray(m.verts)[s.skin_ids] * s.skin_w[..., None], axis=-2
    ))
    d = np.abs(verts[:, None, :] - m.verts[None, :, :]).sum(-1).min(1)
    assert d.max() == 0.0
    # outward winding: mean normal dot (vert - center) > 0
    c = m.verts.mean(0)
    p0 = verts[m.tris[:, 0]]; p1 = verts[m.tris[:, 1]]; p2 = verts[m.tris[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    outward = np.einsum("ij,ij->i", n, (p0 + p1 + p2) / 3 - c)
    assert (outward > 0).mean() > 0.99


def test_surfaced_grid_body_in_world_and_viewer():
    from tetsim_tpu.viewer.server import _View

    w = ts.World(params=ts.PhysicsParams(num_substeps=2))
    b = w.add_grid_body((2, 2, 3), cell=0.25, origin=(0.0, 0.5, 0.0),
                        engine="polar_grid_pallas", packed=True,
                        with_surface=True)
    assert b._surface is not None
    w.step()
    view = _View(b)
    assert view.n_vis > 0 and view.n_tris > 0
    vn = b._surface.render_data(view.pos_device())
    assert vn.shape == (2, view.n_vis, 3) and np.isfinite(vn).all()
