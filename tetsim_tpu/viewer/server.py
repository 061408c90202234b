"""Interactive viewer server — the rebuild of the reference's browser layer
(World.js three.js scene + Grabber pointer interaction, SURVEY.md §1 L3/L4)
turned inside-out for a TPU host: the simulation loop runs here (device-side),
and a thin WebGL2 client (static/index.html, written from scratch — no
three.js) renders whatever the server exports and sends grab rays back.

Protocol (all HTTP/1.1 on localhost, stdlib only — no websocket dependency):

  GET  /            the client page
  GET  /mesh        static geometry, little-endian binary (header: JSON line)
  GET  /state       per-frame binary: skinned surface verts + normals +
                    particle positions + diagnostics header
  POST /grab        {"action": "start", "origin": [...], "dir": [...]}
                    {"action": "move",  "origin": [...], "dir": [...]}
                    {"action": "end"}
  POST /params      {"gravity": -9.81, "num_substeps": 5, ...}
  POST /reset       reset body state to rest pose

Grab semantics mirror the reference (Softbody.js:279-298 / GPUGrabber):
on start, the nearest particle to the click ray is grabbed (computed on
device — no full-mesh readback, unlike SoftbodyGPU.js:788-795) and its
depth along the ray is remembered; on move, the grab target slides on the
sphere of that depth around the camera (the reference keeps the raycast
distance fixed the same way).
"""
from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp

from ..params import PhysicsParams
from ..world import World, Body

_STATIC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")


def _pad_header(hdr: bytes) -> bytes:
    """Pad a JSON header line (spaces before the newline) so the binary
    payload starts 4-byte aligned — JS Float32Array/Uint32Array views on
    the fetched ArrayBuffer require byteOffset % 4 == 0."""
    total = len(hdr) + 1  # + newline
    pad = (-total) % 4
    return hdr + b" " * pad + b"\n"


@jax.jit
def _nearest_to_ray(pos, origin, direction):
    """Device-side picking: (particle id, depth along ray, distance to ray).

    Replaces the reference's readback + raycast + linear scan
    (SoftbodyGPU.js:788-812, Softbody.js:283-289)."""
    rel = pos - origin
    t = rel @ direction  # depth of each particle along the ray
    perp = rel - t[:, None] * direction
    d2 = jnp.sum(perp * perp, axis=-1)
    d2 = jnp.where(t > 0.0, d2, jnp.inf)  # only in front of the camera
    i = jnp.argmin(d2)
    return i.astype(jnp.int32), t[i], jnp.sqrt(d2[i])


class ViewerServer:
    """Runs `world` at a fixed frame rate in a background thread and serves
    the viewer protocol.  Interaction is applied between frames under a
    lock, so the sim thread owns all JAX dispatch."""

    def __init__(
        self,
        world: World,
        host: str = "127.0.0.1",
        port: int = 8787,
        fps: float = 60.0,
        grab_radius: float = 0.35,
    ):
        if not world.bodies:
            raise ValueError("world has no bodies")
        self.world = world
        self.body: Body = world.bodies[0]
        self.host, self.port = host, port
        self.frame_dt = 1.0 / fps
        self.grab_radius = grab_radius
        self.frame = 0
        self.last_step_ms = 0.0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._grab_depth = None
        self._sim_thread = None
        self._httpd = None

        b = self.body
        if b._skin_ids is None:
            raise ValueError("viewer needs a mesh with an embedded surface")
        self._n_vis = int(b._skin_w.shape[0])
        self._n_part = int(b.state.pos.shape[0])

    # -- static geometry blob ---------------------------------------------
    def mesh_blob(self) -> bytes:
        b = self.body
        m = b.mesh
        header = {
            "n_vis": self._n_vis,
            "n_tris": int(m.tris.shape[0]),
            "n_particles": self._n_part,
            "n_edges": int(m.edges.shape[0]) if m.edges is not None else 0,
        }
        tris = np.ascontiguousarray(m.tris, np.uint32)
        edges = (
            np.ascontiguousarray(m.edges, np.uint32)
            if m.edges is not None
            else np.zeros((0, 2), np.uint32)
        )
        hdr = _pad_header(json.dumps(header).encode())
        return hdr + tris.tobytes() + edges.tobytes()

    # -- per-frame state blob ----------------------------------------------
    def state_blob(self) -> bytes:
        with self._lock:
            verts, normals, _ = self.body.surface_mesh()
            pos = self.body.positions
            diag = {
                "frame": self.frame,
                "step_ms": round(self.last_step_ms, 3),
                "grabbed": int(self.body.controls.grab_id),
            }
        hdr = _pad_header(json.dumps(diag).encode())
        return (
            hdr
            + verts.astype("<f4").tobytes()
            + normals.astype("<f4").tobytes()
            + pos.astype("<f4").tobytes()
        )

    # -- interaction (synchronous, under the sim lock) -----------------------
    def grab(self, action: str, origin=None, direction=None) -> dict:
        """Apply a grab action; returns {"grabbed": id or -1}.

        Actions mutate ``body.controls`` atomically between frames; the
        solver then enforces pos[grab_id] = grab_pos every substep exactly
        like the reference (Softbody.js:233-235)."""
        if action == "start":
            o = np.asarray(origin, np.float32)
            d = np.asarray(direction, np.float32)
            d = d / max(np.linalg.norm(d), 1e-12)
            with self._lock:
                i, t, dist = _nearest_to_ray(
                    self.body.state.pos, jnp.asarray(o), jnp.asarray(d)
                )
                if float(dist) <= self.grab_radius:
                    self._grab_depth = float(t)
                    point = o + d * self._grab_depth
                    self.body.controls = self.body.controls.replace(
                        grab_id=jnp.int32(int(i)),
                        grab_pos=jnp.asarray(point, jnp.float32),
                    )
                    return {"grabbed": int(i)}
            return {"grabbed": -1}

        if action == "move":
            o = np.asarray(origin, np.float32)
            d = np.asarray(direction, np.float32)
            d = d / max(np.linalg.norm(d), 1e-12)
            with self._lock:
                if self._grab_depth is not None:
                    self.body.move_grabbed(o + d * self._grab_depth)
                    return {"grabbed": int(self.body.controls.grab_id)}
            return {"grabbed": -1}

        if action == "end":
            with self._lock:
                self._grab_depth = None
                self.body.end_grab()
            return {"grabbed": -1}

        raise ValueError(f"unknown grab action {action!r}")

    def set_params(self, updates: dict):
        with self._lock:
            p = self.world.params
            fields = {}
            for k, v in updates.items():
                if k == "num_substeps":
                    fields[k] = int(v)
                elif k in ("world_min", "world_max"):
                    fields[k] = jnp.asarray(v, jnp.float32)
                elif hasattr(p, k):
                    fields[k] = jnp.float32(v)
                else:
                    raise ValueError(f"unknown param {k!r}")
            self.world.params = p.replace(**fields)

    def reset(self):
        from ..state import init_state

        with self._lock:
            self.body.state = init_state(self.body.mesh)
            self._grab_depth = None
            self.body.end_grab()

    # -- sim loop ------------------------------------------------------------
    def _run_sim(self):
        while not self._stop.is_set():
            t0 = time.perf_counter()
            with self._lock:
                self.world.step()
                self.frame += 1
            self.last_step_ms = (time.perf_counter() - t0) * 1e3
            sleep = self.frame_dt - (time.perf_counter() - t0)
            if sleep > 0:
                time.sleep(sleep)

    # -- http ----------------------------------------------------------------
    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype="application/octet-stream"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    with open(os.path.join(_STATIC, "index.html"), "rb") as f:
                        self._send(200, f.read(), "text/html")
                elif self.path == "/mesh":
                    self._send(200, server.mesh_blob())
                elif self.path == "/state":
                    self._send(200, server.state_blob())
                elif self.path == "/diag":
                    body = json.dumps(server.world.diagnostics()).encode()
                    self._send(200, body, "application/json")
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    msg = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._send(400, b'{"error": "bad json"}', "application/json")
                    return
                try:
                    if self.path == "/grab":
                        out = server.grab(
                            msg.get("action", ""),
                            msg.get("origin"),
                            msg.get("dir"),
                        )
                        self._send(200, json.dumps(out).encode(), "application/json")
                        return
                    elif self.path == "/params":
                        server.set_params(msg)
                    elif self.path == "/reset":
                        server.reset()
                    else:
                        self._send(404, b"not found", "text/plain")
                        return
                except (ValueError, TypeError) as e:
                    self._send(
                        400, json.dumps({"error": str(e)}).encode(), "application/json"
                    )
                    return
                self._send(200, b'{"ok": true}', "application/json")

        return Handler

    def start(self):
        """Start sim + http threads; returns once both are live."""
        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), self._make_handler()
        )
        self.port = self._httpd.server_address[1]
        self._sim_thread = threading.Thread(target=self._run_sim, daemon=True)
        self._sim_thread.start()
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
        if self._sim_thread is not None:
            self._sim_thread.join(timeout=5)

    def serve_forever(self):
        print(f"tetsim viewer: http://{self.host}:{self.port}/")
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            self.stop()


def main():
    """CLI: python -m tetsim_tpu.viewer.server [--engine polar] [--port 8787]"""
    import argparse

    ap = argparse.ArgumentParser(description="tetsim_tpu interactive viewer")
    ap.add_argument("--engine", default="polar", choices=["polar", "neohookean"])
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--substeps", type=int, default=None)
    args = ap.parse_args()

    from ..mesh import load_dragon
    from ..params import default_cpu_params, default_gpu_params

    params = default_gpu_params() if args.engine == "polar" else default_cpu_params()
    if args.substeps:
        params = params.replace(num_substeps=args.substeps)
    world = World(params)
    world.add_body(load_dragon(), engine=args.engine)
    ViewerServer(world, host=args.host, port=args.port).start().serve_forever()


if __name__ == "__main__":
    main()
