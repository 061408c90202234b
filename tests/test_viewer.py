"""Viewer protocol tests: mesh/state blobs, grab round trip, params, reset —
driven over real HTTP against a live ViewerServer."""
import json
import urllib.request

import numpy as np
import pytest

import tetsim_tpu as ts
from tetsim_tpu.viewer import ViewerServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
        return r.read()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _split_blob(blob):
    nl = blob.index(b"\n")
    return json.loads(blob[:nl]), blob[nl + 1:]


@pytest.fixture(scope="module")
def server():
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")
    srv = ViewerServer(world, port=0, fps=30.0).start()
    yield srv
    srv.stop()


def test_mesh_blob(server):
    hdr, payload = _split_blob(_get(server.port, "/mesh"))
    assert hdr["n_vis"] == 29800
    assert hdr["n_particles"] == 1234
    assert hdr["n_tris"] == 59657
    assert hdr["n_edges"] == 6222
    assert len(payload) == (hdr["n_tris"] * 3 + hdr["n_edges"] * 2) * 4


def test_state_blob_advances(server):
    import time

    hdr1, payload = _split_blob(_get(server.port, "/state"))
    n = (29800 * 3 + 29800 * 3 + 1234 * 3) * 4
    assert len(payload) == n
    verts = np.frombuffer(payload[: 29800 * 12], "<f4")
    assert np.isfinite(verts).all()
    time.sleep(0.3)
    hdr2, _ = _split_blob(_get(server.port, "/state"))
    assert hdr2["frame"] > hdr1["frame"], "sim thread must advance frames"


def test_grab_round_trip(server):
    # aim a ray at the body's current centroid from above-front
    pos = server.body.positions
    c = pos.mean(axis=0)
    origin = c + np.array([0.0, 0.5, 2.0], np.float32)
    d = (c - origin) / np.linalg.norm(c - origin)
    out = _post(server.port, "/grab",
                {"action": "start", "origin": origin.tolist(), "dir": d.tolist()})
    assert out["grabbed"] >= 0
    gid = out["grabbed"]

    # drag it upward: move along a ray pointing higher
    origin2 = origin + np.array([0.0, 0.6, 0.0], np.float32)
    out = _post(server.port, "/grab",
                {"action": "move", "origin": origin2.tolist(), "dir": d.tolist()})
    assert out["grabbed"] == gid
    import time

    time.sleep(0.2)  # let the solver enforce the constraint
    hdr, _ = _split_blob(_get(server.port, "/state"))
    assert hdr["grabbed"] == gid

    out = _post(server.port, "/grab", {"action": "end"})
    assert out["grabbed"] == -1


def test_grab_miss(server):
    out = _post(server.port, "/grab",
                {"action": "start", "origin": [50, 50, 50], "dir": [0, 1, 0]})
    assert out["grabbed"] == -1


def test_grab_missing_ray_is_clean_400(server):
    # a start/move without origin+dir must 400 with a readable message,
    # not surface a numeric-kernel error from the ray math
    for msg in ({"action": "start", "origin": [0, 1, 3]},
                {"action": "move", "dir": [0, 0, -1]}):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server.port, "/grab", msg)
        assert exc.value.code == 400
        body = json.loads(exc.value.read())
        assert "origin" in body["error"] and "dir" in body["error"]


def test_params_and_reset(server):
    _post(server.port, "/params", {"gravity": -1.0})
    assert float(server.world.params.gravity) == -1.0
    # static fields must land as python ints, not f32 leaves (trace keys)
    _post(server.port, "/params", {"num_substeps": 4, "extract_iters": 2})
    assert server.world.params.num_substeps == 4
    assert server.world.params.extract_iters == 2
    assert type(server.world.params.extract_iters) is int
    _post(server.port, "/params", {"num_substeps": 5, "extract_iters": 9})
    with pytest.raises(urllib.error.HTTPError):
        _post(server.port, "/params", {"not_a_param": 1})
    _post(server.port, "/params", {"gravity": -9.81})
    _post(server.port, "/reset", {})
    import time

    time.sleep(0.1)
    assert int(server.body.controls.grab_id) == -1


def test_index_served(server):
    page = _get(server.port, "/")
    assert b"tetsim_tpu" in page and b"webgl2" in page.lower()


def test_bad_json(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/grab", data=b"{not json", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=120)
    assert e.value.code == 400


def test_blob_headers_4byte_aligned(server):
    """JS typed-array views need byteOffset % 4 == 0 — headers must be
    padded regardless of frame-number/step-ms digit counts."""
    for path in ("/mesh", "/state", "/state", "/state"):
        blob = _get(server.port, path)
        nl = blob.index(b"\n")
        assert (nl + 1) % 4 == 0, f"{path} header {nl+1} bytes (unaligned)"
        json.loads(blob[:nl])  # padding must not break the JSON


# ---------------------------------------------------------------------------
# Multi-body world: every body rendered, grabs routed to the nearest body
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def multi_server():
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")
    batch = world.add_body_batch(
        ts.load_dragon(), 2, engine="polar", jitter=0.0
    )
    # separate the batch bodies from body 0 so grab routing is unambiguous
    import jax.numpy as jnp

    off = jnp.zeros_like(batch.states.pos)
    n = batch._n
    off = off.at[:n, 1].add(3.0).at[n:, 1].add(6.0)
    batch.states = batch.states.replace(
        pos=batch.states.pos + off, prev_pos=batch.states.prev_pos + off
    )
    srv = ViewerServer(world, port=0, fps=30.0).start()
    yield srv
    srv.stop()


def test_multi_mesh_blob_totals(multi_server):
    hdr, payload = _split_blob(_get(multi_server.port, "/mesh"))
    assert hdr["n_vis"] == 29800 * 3
    assert hdr["n_particles"] == 1234 * 3
    assert hdr["n_tris"] == 59657 * 3
    assert hdr["n_edges"] == 6222 * 3
    assert len(payload) == (hdr["n_tris"] * 3 + hdr["n_edges"] * 2) * 4
    # triangle indices of the later bodies must be offset past body 0's verts
    tris = np.frombuffer(payload[: hdr["n_tris"] * 12], "<u4")
    assert tris[: 59657 * 3].max() < 29800
    assert tris[59657 * 3 :].min() >= 29800


def test_multi_state_blob(multi_server):
    hdr, payload = _split_blob(_get(multi_server.port, "/state"))
    nv, np_ = 29800 * 3, 1234 * 3
    assert len(payload) == (nv * 3 + nv * 3 + np_ * 3) * 4
    pos = np.frombuffer(payload[-np_ * 12 :], "<f4").reshape(-1, 3)
    assert np.isfinite(pos).all()
    # batch body 2 sits ~6 units above body 0 (gravity pulls it down a
    # little over the first frames, hence the loose margin)
    assert pos[1234 * 2 :, 1].mean() > pos[:1234, 1].mean() + 3.0


def test_multi_grab_routes_to_batch_body(multi_server):
    # aim at the SECOND batch body's centroid (x ~ +6)
    hdr, payload = _split_blob(_get(multi_server.port, "/state"))
    np_ = 1234 * 3
    pos = np.frombuffer(payload[-np_ * 12 :], "<f4").reshape(-1, 3)
    c = pos[1234 * 2 :].mean(axis=0)
    origin = c + np.array([0.0, 0.0, 2.0], np.float32)
    d = (c - origin) / np.linalg.norm(c - origin)
    out = _post(multi_server.port, "/grab",
                {"action": "start", "origin": origin.tolist(), "dir": d.tolist()})
    gid = out["grabbed"]
    assert gid >= 1234 * 2, f"grab routed to wrong body (gid={gid})"
    batch = multi_server.world.bodies[1]
    assert int(np.asarray(batch.controls.grab_id)[1]) >= 0
    out = _post(multi_server.port, "/grab", {"action": "end"})
    assert out["grabbed"] == -1
    assert int(np.asarray(batch.controls.grab_id)[1]) == -1


def test_point_ranges_and_grab_leak():
    """Review fixes: surface-less bodies get point ranges in /mesh, and a
    second grab start on another body ends the first body's pin."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")
    world.add_grid_body((4, 3, 4), cell=0.2, origin=(2.0, 0.5, 0.0))
    srv = ViewerServer(world)  # no .start(): drive methods directly

    hdr, _ = _split_blob(srv.mesh_blob())
    assert hdr["point_ranges"] == [[1234, 100]]

    pos0 = srv.views[0].pos_device()
    c0 = np.asarray(pos0).mean(axis=0)
    out1 = srv.grab("start", origin=(c0 + [0, 0, 2]).tolist(), direction=[0, 0, -1])
    assert 0 <= out1["grabbed"] < 1234
    c1 = np.asarray(srv.views[1].pos_device()).mean(axis=0)
    out2 = srv.grab("start", origin=(c1 + [0, 0, 2]).tolist(), direction=[0, 0, -1])
    assert out2["grabbed"] >= 1234
    assert int(world.bodies[0].controls.grab_id) == -1, "first grab leaked"
    srv.grab("end")


def test_surfaced_grid_body_streams_boundary_only():
    """A surfaced, edge-less PackedGridBody must NOT stream its interior
    particles per frame — the client renders it entirely from the boundary
    shell (VERDICT r2 item 8: 2.2 MB/frame -> ~0.5 MB at the 56^3 config).
    Wireframe/point bodies still stream."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")  # has edges: streams
    grid = world.add_grid_body(
        (6, 4, 6), cell=0.1, origin=(2.0, 0.5, 0.0),
        engine="polar_grid_pallas", packed=True, with_surface=True,
    )
    srv = ViewerServer(world)  # no .start(): drive methods directly

    hdr, _ = _split_blob(srv.mesh_blob())
    # streamed particle total excludes the surfaced grid body's 7*5*7=245
    assert hdr["n_particles"] == 1234
    assert hdr["n_tris"] > 59657  # dragon tris + boundary shell tris
    n_vis = hdr["n_vis"]

    world.step(frames=2)
    shdr, payload = _split_blob(srv.state_blob())
    assert len(payload) == (n_vis * 3 + n_vis * 3 + 1234 * 3) * 4
    verts = np.frombuffer(payload[: n_vis * 12], "<f4")
    assert np.isfinite(verts).all()
    # grab picking still sees the non-streamed body (device-side argmin)
    c = np.asarray(grid.pos_device()).mean(axis=0)
    out = srv.grab(
        "start", origin=(c + [0, 0, 2]).tolist(), direction=[0, 0, -1]
    )
    assert out["grabbed"] >= 1234
    srv.grab("end")


def test_world_step_many_batches_frames():
    """World.step(frames=N) must advance a PackedGridBody through ONE
    step_many dispatch and match N sequential step() calls exactly."""
    import jax

    p = ts.PhysicsParams(num_substeps=2)
    w1, w2 = ts.World(p), ts.World(p)
    b1 = w1.add_grid_body((4, 3, 4), cell=0.2, origin=(0.0, 0.6, 0.0),
                          engine="polar_grid_pallas", packed=True)
    b2 = w2.add_grid_body((4, 3, 4), cell=0.2, origin=(0.0, 0.6, 0.0),
                          engine="polar_grid_pallas", packed=True)
    calls = []
    orig = b1.step_many

    def spy(params, frames):
        calls.append(frames)
        return orig(params, frames)

    b1.step_many = spy
    w1.step(frames=5)
    for _ in range(5):
        w2.step(frames=1)
    assert calls == [5], f"step_many not used for batching: {calls}"
    np.testing.assert_allclose(
        np.asarray(b1.pos_device()), np.asarray(b2.pos_device()), atol=1e-6
    )


@pytest.fixture(scope="module")
def grid_batch_server():
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_grid_body_batch((2, 2, 2), 2, cell=0.25, engine="polar_grid")
    srv = ViewerServer(world, port=0, fps=30.0).start()
    yield srv, world.bodies[0]
    srv.stop()


def test_grid_batch_grab_routes_to_owning_body(grid_batch_server):
    """The viewer's ray grab on a batched grid scene routes to the hit
    body's own slot (VERDICT r3 item 4 'through the viewer path'): grabbing
    box 1 must pin a box-1 particle and leave box 0's slot free."""
    srv, batch = grid_batch_server
    n = batch._n
    # boxes sit at x in [0,0.5] and [0.75,1.25], y in [0.5,1.0]; aim a ray
    # down +z at box 1's near face
    out = _post(srv.port, "/grab", {
        "action": "start",
        "origin": [1.0, 0.75, -3.0],
        "dir": [0.0, 0.0, 1.0],
    })
    gid = out["grabbed"]
    assert gid >= n, f"expected a box-1 particle (flat id >= {n}), got {gid}"
    assert int(batch.controls.grab_id[1]) == gid - n  # LOCAL id in slot 1
    assert int(batch.controls.grab_id[0]) == -1
    # drag it up and verify the particle follows through the live sim
    _post(srv.port, "/grab", {
        "action": "move",
        "origin": [1.0, 1.6, -3.0],
        "dir": [0.0, 0.0, 1.0],
    })
    import time

    time.sleep(0.3)
    hdr, _ = _split_blob(_get(srv.port, "/state"))
    assert hdr["grabbed"] == gid
    local = gid - n
    target = np.asarray(batch.controls.grab_pos[1])
    np.testing.assert_allclose(
        batch.positions[1, local], target, atol=1e-5
    )
    out = _post(srv.port, "/grab", {"action": "end"})
    assert out["grabbed"] == -1
    assert int(batch.controls.grab_id[1]) == -1


def test_sim_error_surfaces_to_client():
    """A sim-thread exception must not freeze the viewer silently: the
    thread halts, and every subsequent /state header and /diag response
    carries a one-line error for the client's red overlay (reference
    parity: errors render as <div>s over the viewport, main.js:98-108)."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")
    srv = ViewerServer(world, port=0, fps=30.0).start()
    try:
        import time

        time.sleep(0.3)  # let a few good frames land in the cache
        hdr, payload = _split_blob(_get(srv.port, "/state"))
        assert "error" not in hdr

        def boom(*a, **k):
            raise RuntimeError("injected solver failure")

        srv.views[0].body.step = boom
        srv.views[0].body.step_many = boom
        srv.views[0].body.step_many_export = boom
        srv._sim_thread.join(timeout=10)
        assert not srv._sim_thread.is_alive(), "sim thread should halt"
        assert "injected solver failure" in srv.sim_error

        hdr2, payload2 = _split_blob(_get(srv.port, "/state"))
        assert "injected solver failure" in hdr2["error"]
        # payload stays a well-formed last-good frame, still 4-byte aligned
        assert len(payload2) == len(payload)
        assert (_get(srv.port, "/state").index(b"\n") + 1) % 4 == 0
        diag = json.loads(_get(srv.port, "/diag"))
        assert "injected solver failure" in diag["error"]
    finally:
        srv.stop()


def test_patch_blob_error_roundtrip():
    from tetsim_tpu.viewer.server import _pad_header, _patch_blob_error

    payload = np.arange(6, dtype="<f4").tobytes()
    blob = _pad_header(json.dumps({"frame": 7}).encode()) + payload
    out = _patch_blob_error(blob, "boom")
    hdr, rest = _split_blob(out)
    assert hdr == {"frame": 7, "error": "boom"}
    assert rest == payload
    assert (out.index(b"\n") + 1) % 4 == 0


def test_error_blob_when_sim_dies_before_first_frame():
    """A sim thread that dies on its very first iteration (no cached
    frame yet) must still surface its error through /state and /diag
    WITHOUT dispatching device work from the HTTP handler — on a broken
    device/relay that would hang or raise unhandled (ADVICE r4)."""
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")
    srv = ViewerServer(world, port=0, fps=30.0)

    def boom(*a, **k):
        raise RuntimeError("first-step failure")

    srv.views[0].body.step = boom
    srv.views[0].body._many_export = None  # force the per-frame step path
    srv.start()
    srv._sim_thread.join(timeout=10)
    try:
        assert not srv._sim_thread.is_alive()
        assert srv._cached_state is None

        hdr, payload = _split_blob(_get(srv.port, "/state"))
        assert "first-step failure" in hdr["error"]
        # error-only blob carries the exact expected payload size (zeros)
        assert len(payload) == 4 * 3 * (2 * srv._n_vis + srv._n_part)
        assert (_get(srv.port, "/state").index(b"\n") + 1) % 4 == 0

        # /diag must not touch the device either: serve the error directly
        diag = json.loads(_get(srv.port, "/diag"))
        assert "first-step failure" in diag["error"]
    finally:
        srv.stop()


def test_ordered_body_renders_and_grabs():
    """The fused_ordered backend (OrderedGSBody) is a first-class viewer
    citizen: its batch renders through /mesh + /state and grab rays route
    to the owning body's slot (VERDICT r4 missing #2)."""
    import time

    mesh = ts.grid_mesh(3, 3, 3, cell=0.25, origin=(-0.375, 0.5, -0.375))
    from tetsim_tpu.mesh import with_boundary_surface

    mesh = with_boundary_surface(mesh)
    world = ts.World(ts.PhysicsParams(num_substeps=1))
    body = world.add_body_batch(
        mesh, 8, engine="neohookean", backend="fused_ordered", jitter=0.05
    )
    srv = ViewerServer(world, port=0, fps=20.0).start()
    try:
        hdr, _ = _split_blob(_get(srv.port, "/mesh"))
        s_per = mesh.vis_tet_ids.shape[0]
        assert hdr["n_vis"] == 8 * s_per
        assert hdr["n_tris"] == 8 * mesh.tris.shape[0]

        hdr, payload = _split_blob(_get(srv.port, "/state"))
        verts = np.frombuffer(payload[: 8 * s_per * 12], "<f4")
        assert np.isfinite(verts).all()

        # grab: aim at the batch centroid (the jittered bodies overlap, so
        # the hit may land in any body — derive the owner from the flat id)
        pos = body.positions()  # [8, N, 3]
        c = pos.reshape(-1, 3).mean(axis=0)
        origin = c + np.array([0.0, 0.3, 1.5], np.float32)
        d = (c - origin) / np.linalg.norm(c - origin)
        out = _post(
            srv.port, "/grab",
            {"action": "start", "origin": origin.tolist(), "dir": d.tolist()},
        )
        assert out["grabbed"] >= 0
        owner = out["grabbed"] // mesh.num_particles
        assert int(body.grab_id[owner, 0]) >= 0, \
            "grab must land in the owning body's slot"
        # move and verify the constraint target follows
        origin2 = origin + np.array([0.0, 0.4, 0.0], np.float32)
        _post(
            srv.port, "/grab",
            {"action": "move", "origin": origin2.tolist(), "dir": d.tolist()},
        )
        time.sleep(0.3)
        _post(srv.port, "/grab", {"action": "end"})
        assert int(body.grab_id[owner, 0]) == -1
    finally:
        srv.stop()


def test_rotated_normals_flag():
    """POST /params {"normals": "rotated"} switches polar-family bodies to
    the reference GPU path's shading (rest normals rotated by the tet
    quaternion, SoftbodyGPU.js:424-448); the frame header reports the
    active mode (VERDICT r4 missing #3)."""
    import time
    import urllib.error

    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")
    srv = ViewerServer(world, port=0, fps=30.0).start()
    try:
        hdr, _ = _split_blob(_get(srv.port, "/state"))
        assert hdr["normals"] == "smooth"

        _post(srv.port, "/params", {"normals": "rotated"})
        deadline = time.time() + 10
        while time.time() < deadline:
            hdr, payload = _split_blob(_get(srv.port, "/state"))
            if hdr.get("normals") == "rotated":
                break
            time.sleep(0.1)
        assert hdr["normals"] == "rotated"
        nrm = np.frombuffer(
            payload[29800 * 12 : 2 * 29800 * 12], "<f4"
        ).reshape(-1, 3)
        assert np.isfinite(nrm).all()
        # quaternion rotation preserves the rest normals' unit length
        np.testing.assert_allclose(
            np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-3
        )

        with pytest.raises(urllib.error.HTTPError):
            _post(srv.port, "/params", {"normals": "flat"})
        _post(srv.port, "/params", {"normals": "smooth"})
    finally:
        srv.stop()
