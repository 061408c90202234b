"""Client-side protocol conformance (VERDICT r3 weak #6).

`viewer/static/index.html` decodes the /mesh and /state blobs with hard
assumptions the server tests never checked: header = bytes up to the first
newline, then TypedArray views whose byteOffset must be 4-aligned and whose
element counts come from the MESH header (n_vis / n_particles), not the
state header.  ``_client_decode_*`` below are line-for-line Python mirrors
of the client's fetchMesh/pollState parsing (index.html:236-280, including
JS TypedArray constructor semantics: RangeError on misalignment or
overrun), so any server-side blob drift fails here instead of shipping a
silently black canvas.
"""
import json
import urllib.request

import numpy as np
import pytest

import tetsim_tpu as ts
from tetsim_tpu.viewer import ViewerServer


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=120
    ) as r:
        return r.read()


class JSRangeError(Exception):
    """Python stand-in for the RangeError a JS TypedArray ctor throws."""


def _u32_view(buf, off, n):
    # new Uint32Array(buf, off, n): throws unless off % 4 == 0 and the
    # view fits the buffer
    if off % 4 != 0:
        raise JSRangeError(f"Uint32Array byteOffset {off} not 4-aligned")
    if off + 4 * n > len(buf):
        raise JSRangeError("Uint32Array view exceeds ArrayBuffer")
    return np.frombuffer(buf, "<u4", count=n, offset=off)


def _f32_view(buf, off, n):
    if off % 4 != 0:
        raise JSRangeError(f"Float32Array byteOffset {off} not 4-aligned")
    if off + 4 * n > len(buf):
        raise JSRangeError("Float32Array view exceeds ArrayBuffer")
    return np.frombuffer(buf, "<f4", count=n, offset=off)


def _client_decode_mesh(buf):
    """Mirror of fetchMesh (index.html:236-254)."""
    nl = buf.index(b"\n")
    mesh_info = json.loads(buf[:nl].decode())
    off = nl + 1
    tris = _u32_view(buf, off, mesh_info["n_tris"] * 3)
    off += tris.nbytes
    edges = _u32_view(buf, off, mesh_info["n_edges"] * 2)
    return mesh_info, tris, edges


def _client_decode_state(buf, mesh_info):
    """Mirror of pollState (index.html:258-280) — counts come from the
    MESH header, exactly as the client does."""
    nl = buf.index(b"\n")
    diag = json.loads(buf[:nl].decode())
    off = nl + 1
    nv = mesh_info["n_vis"] * 3
    n_par = mesh_info["n_particles"] * 3
    verts = _f32_view(buf, off, nv)
    off += verts.nbytes
    nrms = _f32_view(buf, off, nv)
    off += nrms.nbytes
    parts = _f32_view(buf, off, n_par)
    return diag, verts, nrms, parts


@pytest.fixture(scope="module")
def server():
    world = ts.World(ts.PhysicsParams(num_substeps=2))
    world.add_body(ts.load_dragon(), engine="polar")
    srv = ViewerServer(world, port=0, fps=30.0).start()
    yield srv
    srv.stop()


def test_client_decodes_mesh_blob(server):
    mesh_info, tris, edges = _client_decode_mesh(_get(server.port, "/mesh"))
    assert tris.shape == (mesh_info["n_tris"] * 3,)
    assert edges.shape == (mesh_info["n_edges"] * 2,)
    # indices address the buffers the client allocates from the header
    assert int(tris.max()) < mesh_info["n_vis"]
    assert int(edges.max()) < mesh_info["n_particles"]


def test_client_decodes_state_blob(server):
    mesh_info, _, _ = _client_decode_mesh(_get(server.port, "/mesh"))
    diag, verts, nrms, parts = _client_decode_state(
        _get(server.port, "/state"), mesh_info
    )
    assert "frame" in diag
    for a in (verts, nrms, parts):
        assert np.isfinite(a).all()
    # normals are unit-ish (smooth normals from deformed geometry)
    n3 = nrms.reshape(-1, 3)
    lens = np.linalg.norm(n3, axis=1)
    assert (np.abs(lens - 1.0) < 1e-3).mean() > 0.99


def test_state_consumed_exactly(server):
    """The client's three views must consume the payload EXACTLY: a
    trailing byte means the server serialized something the client never
    reads (protocol drift in the other direction)."""
    mesh_info, _, _ = _client_decode_mesh(_get(server.port, "/mesh"))
    blob = _get(server.port, "/state")
    nl = blob.index(b"\n")
    expect = (2 * mesh_info["n_vis"] * 3 + mesh_info["n_particles"] * 3) * 4
    assert len(blob) - (nl + 1) == expect


def test_header_corruption_breaks_decode(server):
    """Flipping ONE header field must break the client parse (the drift
    detector the VERDICT asked for): inflating n_vis overruns the buffer."""
    mesh_info, _, _ = _client_decode_mesh(_get(server.port, "/mesh"))
    blob = _get(server.port, "/state")
    corrupt = dict(mesh_info, n_vis=mesh_info["n_vis"] + 1)
    with pytest.raises(JSRangeError):
        _client_decode_state(blob, corrupt)
    # corrupting the payload START (dropping one byte after the header)
    # must also fail — alignment is load-bearing, not cosmetic
    nl = blob.index(b"\n")
    trimmed = blob[: nl + 1] + blob[nl + 2 :]
    with pytest.raises(JSRangeError):
        _client_decode_state(trimmed, mesh_info)


def test_alignment_is_load_bearing(server):
    """The server pads the header so the payload starts 4-aligned
    (server.py _assemble_blob); the client's Float32Array views depend on
    it.  Verify on the wire, for both endpoints."""
    for path in ("/mesh", "/state"):
        blob = _get(server.port, path)
        nl = blob.index(b"\n")
        assert (nl + 1) % 4 == 0, f"{path} payload not 4-aligned"
