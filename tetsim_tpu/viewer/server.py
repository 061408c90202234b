"""Interactive viewer server — the rebuild of the reference's browser layer
(World.js three.js scene + Grabber pointer interaction, SURVEY.md §1 L3/L4)
turned inside-out for a TPU host: the simulation loop runs here (device-side),
and a thin WebGL2 client (static/index.html, written from scratch — no
three.js) renders whatever the server exports and sends grab rays back.

Every body in the World is rendered — single ``Body``s, flattened
``BatchedBody`` batches, and fused-kernel ``FusedGSBody`` batches — matching
the reference's multi-body scene list (physicsScene.softBodies,
main.js:51,67-68).  Geometry is concatenated into one set of buffers with
per-body index offsets; grab rays are routed to the nearest particle across
all bodies.

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
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp

from ..params import PhysicsParams
from ..state import Controls, init_state
from ..world import World, Body, BatchedBody, _Surface

_STATIC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")


def _pad_header(hdr: bytes) -> bytes:
    """Pad a JSON header line (spaces before the newline) so the binary
    payload starts 4-byte aligned — JS Float32Array/Uint32Array views on
    the fetched ArrayBuffer require byteOffset % 4 == 0."""
    total = len(hdr) + 1  # + newline
    pad = (-total) % 4
    return hdr + b" " * pad + b"\n"


def _patch_blob_error(blob: bytes, err: str) -> bytes:
    """Inject an ``error`` field into an already-assembled state blob's
    JSON header, re-padding so the binary payload stays 4-byte aligned.
    Used when the sim thread dies and the device may no longer answer —
    the last good frame keeps serving, now carrying the error for the
    client's overlay (the reference surfaces errors as red text over the
    viewport, main.js:98-108)."""
    nl = blob.index(b"\n")
    diag = json.loads(blob[:nl])
    diag["error"] = err
    return _pad_header(json.dumps(diag).encode()) + blob[nl + 1 :]


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


class _View:
    """Render + interaction adapter over one ``world.bodies`` entry
    (Body, BatchedBody, or FusedGSBody)."""

    def __init__(self, body):
        self.body = body
        self._grab_sub = None  # sub-body index of an active grab (batches)
        self._grab_pid = None  # host-side mirror of the active grab id
        self._packed_grid = False
        from ..world import GridBodyBatch, PackedGridBody

        if isinstance(body, (Body, PackedGridBody)):
            # PackedGridBody mirrors Body's controls/grab API; only the
            # position export (cheap packed unpack) and reset differ
            self.kind = "body"
            self._packed_grid = isinstance(body, PackedGridBody)
            self.n_particles = body.mesh.num_particles
            self.surface = body._surface
            self.edges = body.mesh.edges
            self._state0 = None if self._packed_grid else body.state
            if self.surface is not None:
                # fuse step + surface export into one jitted device call
                # (VERDICT r4 item 8: every body kind gets the fused
                # dispatch, not just PackedGridBody — per-frame separate
                # step/skin calls pay ~35 ms tunneled round trips each)
                if self._packed_grid:
                    body.enable_render_export(
                        self.surface.skin_ids, self.surface.skin_w,
                        self.surface.tris,
                    )
                else:
                    body.enable_render_export()
        elif isinstance(body, (BatchedBody, GridBodyBatch)):
            # GridBodyBatch mirrors BatchedBody's contract (states with a
            # leading body axis instead of a flat mesh — reshape covers it)
            self.kind = "batched"
            self.n_particles = body.flat_mesh.num_particles
            self.surface = body._surface
            self.edges = body.flat_mesh.edges
            self._state0 = body.states
            if self.surface is not None:
                body.enable_render_export()
        else:
            from ..kernels.gs_fused import FusedGSBody
            from ..kernels.gs_ordered import OrderedGSBody
            from ..kernels.polar_fused import FusedPolarBody
            from ..world import DenseBody

            if not isinstance(
                body, (FusedGSBody, OrderedGSBody, FusedPolarBody, DenseBody)
            ):
                raise ValueError(
                    f"viewer cannot render body of type {type(body).__name__}"
                )
            from ..mesh import replicate_mesh

            self.kind = "packed"  # column/sublane-batched fused backends
            self._n_per = body.mesh.num_particles
            flat = replicate_mesh(body.mesh, body.num_bodies)
            self.n_particles = flat.num_particles
            self.surface = (
                _Surface(flat) if flat.vis_tet_ids is not None else None
            )
            self.edges = flat.edges
            self._state0 = body.state
        self.n_vis = (
            0 if self.surface is None else int(self.surface.skin_w.shape[0])
        )
        self.n_tris = (
            0 if self.surface is None else int(self.surface.tris.shape[0])
        )
        self.n_edges = 0 if self.edges is None else int(self.edges.shape[0])

    @property
    def streams_particles(self) -> bool:
        """Whether the client draws from this view's particle buffer.

        Only wireframes (edges) and surface-less point clouds read it; a
        surfaced, edge-less body (e.g. a 56^3 PackedGridBody with
        with_surface=True) renders entirely from the ~19k boundary-shell
        verts, so streaming its 185k interior particles (2.2 MB/frame)
        would be pure waste — the reference's grab-only readback economy
        (SoftbodyGPU.js:649-668), applied to the render stream."""
        return self.n_edges > 0 or (self.n_tris == 0 and self.n_edges == 0)

    # -- per-frame data ------------------------------------------------------
    def pos_device(self):
        """Flat [n_particles, 3] device positions (no host round trip)."""
        if self.kind == "body":
            if self._packed_grid:
                return self.body.pos_device()
            return self.body.state.pos
        if self.kind == "batched":
            return self.body.states.pos.reshape(-1, 3)
        b = self.body
        from ..world import DenseBody

        if isinstance(b, DenseBody):  # [N, 3, B] column batch
            return jnp.moveaxis(b.state.pos, -1, 0).reshape(-1, 3)
        # FusedGSBody / FusedPolarBody: SoA planes [9, B, R]
        n = b.sched.num_particles
        st = b.state
        return jnp.stack(
            [st[c, : b.num_bodies, :n] for c in range(3)], axis=-1
        ).reshape(-1, 3)

    def quats_device(self):
        """Per-tet quaternions in this view's flat tet numbering, or None
        when the body carries no shape-matching rotation state (NH family,
        or packed layouts whose quats unpack would cost a full layout
        conversion).  Feeds the rotated-rest-normals export (reference
        GPU-path shading, SoftbodyGPU.js:424-448)."""
        b = self.body
        polar = ("polar", "polar_grid", "polar_pieces")
        if self.kind == "body":
            if self._packed_grid:
                return None
            return b.state.quats if b.engine in polar else None
        if self.kind == "batched":
            if getattr(b, "engine", None) not in polar:
                return None
            return b.states.quats.reshape(-1, 4)
        from ..kernels.polar_fused import FusedPolarBody

        if isinstance(b, FusedPolarBody):
            n = b.sched.num_tets
            return jnp.moveaxis(
                b.quats[:, : b.num_bodies, :n], 0, -1
            ).reshape(-1, 4)
        return None

    # -- interaction -----------------------------------------------------------
    def grab_start(self, pid: int, point):
        self._grab_pid = pid
        if self.kind == "body":
            self.body.controls = Controls(
                grab_id=jnp.int32(pid),
                grab_pos=jnp.asarray(point, jnp.float32),
            )
        elif self.kind == "batched":
            # flat raycast pid -> the owning body's slot (BatchedBody keeps
            # flat ids; GridBodyBatch converts to its local id space)
            self._grab_sub = self.body.grab_particle(pid, point)
        else:
            n = self._n_per
            sub = pid // n
            self._grab_sub = sub
            self.body.set_grab(sub, pid % n, point)

    def grab_move(self, point):
        if self.kind == "body":
            self.body.move_grabbed(point)
        elif self._grab_sub is not None:
            self.body.move_grabbed(self._grab_sub, point)

    def grab_end(self):
        if self.kind == "body":
            self.body.end_grab()
        elif self._grab_sub is not None:
            self.body.end_grab(self._grab_sub)
        self._grab_sub = None
        self._grab_pid = None

    def grabbed_id(self) -> int:
        """Currently grabbed particle id (view-local flat index), or -1.

        Host-side mirror of the last viewer-initiated grab: reading the
        device grab_id scalar back would cost a blocking ~35 ms round trip
        per view per sim iteration on tunneled devices."""
        return -1 if self._grab_pid is None else int(self._grab_pid)

    def reset(self):
        if self.kind == "body":
            if self._packed_grid:
                self.body.reset()
            else:
                self.body.state = self._state0
                self.body.end_grab()
        elif self.kind == "batched":
            self.body.states = self._state0
            self.body.controls = Controls(
                grab_id=jnp.full((self.body.num_bodies,), -1, jnp.int32),
                grab_pos=jnp.zeros((self.body.num_bodies, 3), jnp.float32),
            )
            self.body.last_diag = None
        else:
            self.body.state = self._state0
            if hasattr(self.body, "quats"):  # FusedPolarBody rotation state
                self.body.quats = self.body._init_quats()
            for b in range(self.body.num_bodies):
                self.body.end_grab(b)
        self._grab_sub = None


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
        self.views = [_View(b) for b in world.bodies]
        self.host, self.port = host, port
        self.frame_dt = 1.0 / fps
        self.grab_radius = grab_radius
        self.frame = 0
        self.last_step_ms = 0.0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._grab_depth = None
        self._grab_view: _View | None = None
        self._sim_thread = None
        self._cached_state: bytes | None = None
        self._httpd = None
        self.sim_error: str | None = None  # set once if the sim thread dies
        self._last_diag: dict | None = None  # last good /diag (error path)
        # surface shading mode: "smooth" recomputes geometric normals
        # (reference CPU path, Softbody.js:274); "rotated" rotates rest
        # normals by each tet's quaternion (reference GPU path,
        # SoftbodyGPU.js:424-448) — applies to polar-family bodies, others
        # keep smooth.  Client-settable via POST /params {"normals": ...}.
        self.normals_mode = "smooth"

        self._n_vis = sum(v.n_vis for v in self.views)
        # only particle buffers the client actually draws are streamed
        self._n_part = sum(
            v.n_particles for v in self.views if v.streams_particles
        )

    @property
    def body(self):
        """First body in the world (back-compat convenience)."""
        return self.world.bodies[0]

    # -- static geometry blob ---------------------------------------------
    def mesh_blob(self) -> bytes:
        header = {
            "n_vis": self._n_vis,
            "n_tris": sum(v.n_tris for v in self.views),
            "n_particles": self._n_part,
            "n_edges": sum(v.n_edges for v in self.views),
            # bodies with neither a surface nor a wireframe: the client
            # draws these particle ranges as points so every body in the
            # world is visible (physicsScene.softBodies contract)
            "point_ranges": [],
        }
        tris_parts, edge_parts = [], []
        vert_off = 0
        part_off = 0  # offset in the STREAMED particle buffer
        for v in self.views:
            if v.n_tris:
                tris_parts.append(
                    np.ascontiguousarray(v.surface.tris, np.uint32) + np.uint32(vert_off)
                )
            if v.n_edges:
                edge_parts.append(
                    np.ascontiguousarray(v.edges, np.uint32) + np.uint32(part_off)
                )
            if not v.n_tris and not v.n_edges:
                header["point_ranges"].append([part_off, v.n_particles])
            vert_off += v.n_vis
            if v.streams_particles:
                part_off += v.n_particles
        tris = (
            np.concatenate(tris_parts, axis=0)
            if tris_parts
            else np.zeros((0, 3), np.uint32)
        )
        edges = (
            np.concatenate(edge_parts, axis=0)
            if edge_parts
            else np.zeros((0, 2), np.uint32)
        )
        hdr = _pad_header(json.dumps(header).encode())
        return hdr + tris.tobytes() + edges.tobytes()

    # -- per-frame state blob ----------------------------------------------
    def _export_device(self, precomputed=None):
        """Dispatch the render export on device; no blocking transfer.

        Returns (diag dict, [(vn, parts)] per view — arrays still on
        device, host copies already in flight via copy_to_host_async).
        The sim loop assembles the blob one iteration later, overlapping
        the ~35 ms relay round trip with the next step's compute.
        ``precomputed``: {view index: [2,S,3] device array} from fused
        step+export dispatches (step_many_export).  Call with the sim
        lock held."""
        from ..world import _surface_render_data, _surface_render_data_rotated

        if precomputed is None:
            precomputed = {}
        exports = []
        grabbed = -1
        off = 0
        for i, v in enumerate(self.views):
            vn = precomputed.get(i)
            pos = None
            if vn is None or v.streams_particles:
                pos = v.pos_device()
            if vn is None and v.surface is not None:
                quats = (
                    v.quats_device()
                    if self.normals_mode == "rotated"
                    else None
                )
                if quats is not None:
                    vn = _surface_render_data_rotated(
                        pos, v.surface.skin_ids, v.surface.skin_w,
                        v.surface.rest_normals, quats, v.surface.vis_tet_ids,
                    )
                else:
                    vn = _surface_render_data(
                        pos, v.surface.skin_ids, v.surface.skin_w,
                        v.surface.tris,
                    )
            # the only per-frame device->host particle transfer; surfaced
            # edge-less bodies skip it entirely (boundary-only streaming)
            parts = pos if v.streams_particles else None
            for a in (vn, parts):
                if a is not None:
                    try:
                        a.copy_to_host_async()
                    except AttributeError:
                        pass
            exports.append((vn, parts))
            if grabbed < 0:
                g = v.grabbed_id()
                if g >= 0:
                    grabbed = off + g
            off += v.n_particles
        diag = {
            "frame": self.frame,
            "step_ms": round(self.last_step_ms, 3),
            "grabbed": grabbed,
            "normals": self.normals_mode,
        }
        if self.sim_error is not None:
            diag["error"] = self.sim_error
        return diag, exports

    @staticmethod
    def _assemble_blob(diag, exports) -> bytes:
        """Device export -> wire blob (pays the blocking transfers)."""
        z = [np.zeros((0, 3), np.float32)]
        verts, normals, parts = [], [], []
        for vn, p in exports:
            if vn is not None:
                vn = np.asarray(vn)
                verts.append(vn[0])
                normals.append(vn[1])
            if p is not None:
                parts.append(np.asarray(p))
        hdr = _pad_header(json.dumps(diag).encode())
        return (
            hdr
            + np.concatenate(verts or z).astype("<f4").tobytes()
            + np.concatenate(normals or z).astype("<f4").tobytes()
            + np.concatenate(parts or z).astype("<f4").tobytes()
        )

    def state_blob(self) -> bytes:
        with self._lock:
            diag, exports = self._export_device()
        return self._assemble_blob(diag, exports)

    def _error_blob(self) -> bytes:
        """Minimal error-only state blob — correct payload size, zero
        geometry, no device work.  Served when the sim thread died before
        producing its first frame: dispatching state_blob() against a
        broken device would raise (or hang) inside the HTTP handler and
        the one-line sim error would never reach the client (ADVICE r4)."""
        diag = {
            "frame": self.frame,
            "step_ms": 0.0,
            "grabbed": -1,
            "error": self.sim_error or "sim thread not running",
        }
        hdr = _pad_header(json.dumps(diag).encode())
        return hdr + bytes(4 * 3 * (2 * self._n_vis + self._n_part))

    # -- interaction (synchronous, under the sim lock) -----------------------
    def grab(self, action: str, origin=None, direction=None) -> dict:
        """Apply a grab action; returns {"grabbed": id or -1} (id in the
        concatenated particle index space).

        Actions mutate the target body's controls atomically between frames;
        the solver then enforces pos[grab_id] = grab_pos every substep
        exactly like the reference (Softbody.js:233-235)."""
        if action in ("start", "move") and (origin is None or direction is None):
            raise ValueError(
                f"grab {action!r} needs 'origin' and 'dir' (3-vectors)"
            )
        if action == "start":
            o = np.asarray(origin, np.float32)
            d = np.asarray(direction, np.float32)
            d = d / max(np.linalg.norm(d), 1e-12)
            with self._lock:
                best = None  # (dist, view, pid, depth, global id)
                off = 0
                for v in self.views:
                    i, t, dist = _nearest_to_ray(
                        v.pos_device(), jnp.asarray(o), jnp.asarray(d)
                    )
                    dist = float(dist)
                    if best is None or dist < best[0]:
                        best = (dist, v, int(i), float(t), off + int(i))
                    off += v.n_particles
                if best is not None and best[0] <= self.grab_radius:
                    _, view, pid, depth, gid = best
                    if self._grab_view is not None:
                        # a second start without an end (e.g. a fast click
                        # whose release raced the first start's response)
                        # must not leak the old body's hard pin
                        self._grab_view.grab_end()
                    self._grab_depth = depth
                    self._grab_view = view
                    view.grab_start(pid, o + d * depth)
                    return {"grabbed": gid}
            return {"grabbed": -1}

        if action == "move":
            o = np.asarray(origin, np.float32)
            d = np.asarray(direction, np.float32)
            d = d / max(np.linalg.norm(d), 1e-12)
            with self._lock:
                if self._grab_depth is not None and self._grab_view is not None:
                    self._grab_view.grab_move(o + d * self._grab_depth)
                    gid, off = -1, 0
                    for v in self.views:
                        if v is self._grab_view:
                            gid = off + v.grabbed_id()
                            break
                        off += v.n_particles
                    return {"grabbed": gid}
            return {"grabbed": -1}

        if action == "end":
            with self._lock:
                self._grab_depth = None
                if self._grab_view is not None:
                    self._grab_view.grab_end()
                    self._grab_view = None
            return {"grabbed": -1}

        raise ValueError(f"unknown grab action {action!r}")

    def set_params(self, updates: dict):
        with self._lock:
            p = self.world.params
            fields = {}
            for k, v in updates.items():
                if k == "normals":
                    # viewer-level shading flag, not a physics param
                    if v not in ("smooth", "rotated"):
                        raise ValueError(
                            f"normals must be 'smooth' or 'rotated', got {v!r}"
                        )
                    self.normals_mode = v
                elif k in ("num_substeps", "extract_iters"):
                    # static fields: python ints (a float32 leaf here would
                    # poison the step functions' static trace keys)
                    fields[k] = int(v)
                elif k in ("world_min", "world_max"):
                    fields[k] = jnp.asarray(v, jnp.float32)
                elif hasattr(p, k):
                    fields[k] = jnp.float32(v)
                else:
                    raise ValueError(f"unknown param {k!r}")
            self.world.params = p.replace(**fields)

    def reset(self):
        with self._lock:
            for v in self.views:
                v.reset()
            self._grab_depth = None
            self._grab_view = None
        self._cached_state = None

    # -- sim loop ------------------------------------------------------------
    def _step_world(self, frames: int) -> dict:
        """Advance every body ``frames`` frames; bodies with a fused
        step+export (PackedGridBody.enable_render_export) return their
        render data from the SAME device call — {view index: [2,S,3]}.
        Call with the sim lock held."""
        vns = {}
        for i, v in enumerate(self.views):
            b = v.body
            if getattr(b, "_many_export", None) is not None:
                vns[i] = b.step_many_export(
                    self.world.params, frames, normals=self.normals_mode
                )
            elif frames > 1 and hasattr(b, "step_many"):
                b.step_many(self.world.params, frames)
            else:
                for _ in range(frames):
                    b.step(self.world.params)
        return vns

    def _run_sim(self):
        batch = 1
        pending = None  # last iteration's device export, transfer in flight
        while not self._stop.is_set():
            t0 = time.perf_counter()
            try:
                with self._lock:
                    vns = self._step_world(batch)
                    step_s = time.perf_counter() - t0
                    self.frame += batch
                    # dispatch this frame's export (async) under the lock...
                    export = self._export_device(precomputed=vns)
                # ...then assemble the PREVIOUS frame's blob while this
                # frame's step + export run on device: the blocking transfer
                # overlaps compute instead of serializing with it (one frame
                # of visual latency, ~2x the state refresh rate through the
                # ~35 ms-round-trip relay)
                if pending is not None:
                    self._cached_state = self._assemble_blob(*pending)
            except Exception as e:  # noqa: BLE001 — sim thread must not die silently
                self._record_sim_error(e, pending)
                return
            pending = export
            dt_wall = time.perf_counter() - t0
            # HUD metric: the step alone — dt_wall also covers the export
            # dispatch and the PREVIOUS frame's blob assembly, which are
            # deliberately overlapped with device work and would
            # double-count into a "per-frame step" number (dt_wall still
            # drives the pacing/batching below, where total loop cost is
            # the right signal)
            self.last_step_ms = step_s * 1e3 / batch
            # Adaptive frame batching with hysteresis: when one dispatch
            # cannot keep real-time pace (the ~35 ms per-dispatch round
            # trip dominates at interactive sizes), advance several frames
            # per dispatch via World.step(frames=N)/step_many.  Hysteresis
            # (grow >1.2x, shrink <0.8x) prevents the 1<->N oscillation
            # that otherwise halves throughput at the boundary.  Capped at
            # 4 so grab/param updates stay responsive.
            lag = (dt_wall / batch) / self.frame_dt
            sleep = batch * self.frame_dt - dt_wall
            if lag > 1.2 and batch < 4:
                batch += 1
            elif lag < 0.8 and batch > 1:
                batch -= 1
            if sleep > 0:
                time.sleep(sleep)
        if pending is not None:  # flush so /state never sees a stale cache
            self._cached_state = self._assemble_blob(*pending)

    def _record_sim_error(self, e: Exception, pending):
        """The sim thread is about to exit on an exception: log the full
        traceback server-side, and make sure every subsequent /state and
        /diag response carries a one-line error so the client can overlay
        it (reference behavior: errors render as red <div>s over the
        viewport, main.js:98-108, instead of a silent freeze)."""
        import traceback

        traceback.print_exc()
        err = f"{type(e).__name__}: {e}"[:500]
        print(f"viewer sim thread halted: {err}",
              file=sys.stderr, flush=True)
        # Prefer finishing the in-flight frame (transfers were already
        # dispatched); if the device itself is broken, fall back to
        # patching the last good blob's header host-side only.
        # ``sim_error`` is published LAST: a concurrent /state must never
        # observe the error via /diag while the cached blob still lacks it
        # (ADVICE r4 — the one-poll inconsistency window).
        if pending is not None:
            try:
                pending[0]["error"] = err
                self._cached_state = self._assemble_blob(*pending)
                self.sim_error = err
                return
            except Exception:
                pass
        if self._cached_state is not None:
            self._cached_state = _patch_blob_error(self._cached_state, err)
        self.sim_error = err

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
                    # served from the sim thread's per-frame cache; computed
                    # on demand only before the first frame (or no sim loop).
                    # A dead sim thread with no cached frame serves an
                    # error-only blob — state_blob() would dispatch device
                    # work against a possibly-broken device (ADVICE r4)
                    blob = server._cached_state
                    if blob is None:
                        blob = (
                            server._error_blob()
                            if server.sim_error is not None
                            else server.state_blob()
                        )
                    self._send(200, blob)
                elif self.path == "/diag":
                    # after a sim-thread death, never touch the device (the
                    # readbacks in world.diagnostics() can hang or raise on
                    # a broken device/relay — ADVICE r4); serve the last
                    # good diag plus the error line instead
                    if server.sim_error is not None:
                        d = dict(
                            server._last_diag or {}, error=server.sim_error
                        )
                    else:
                        d = server.world.diagnostics()
                        server._last_diag = d
                    self._send(200, json.dumps(d).encode(), "application/json")
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
                    elif self.path == "/shutdown":
                        # clean remote stop: the sim thread finishes its
                        # current device call before exiting — killing the
                        # process mid-RPC can wedge relayed devices
                        server._stop.set()
                        threading.Thread(
                            target=server._httpd.shutdown, daemon=True
                        ).start()
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
            while not self._stop.is_set():
                time.sleep(1)
            self._sim_thread.join(timeout=30)
        except KeyboardInterrupt:
            self.stop()


def main():
    """CLI: python -m tetsim_tpu.viewer.server [--engine polar] [--port 8787]
    [--bodies N] — N > 1 renders a draggable batch (BatchedBody).
    [--grid NX,NY,NZ] — a grid_mesh box through a fused Pallas stencil
    kernel with packed device state (PackedGridBody): interactive
    million-tet scenes (e.g. --grid 32,32,32 = 196,608 tets).  Combined
    with --engine neohookean the box runs the fused Neo-Hookean kernel
    (kernels/nh_stencil.py); default polar runs the shape-matching
    stencil (kernels/polar_stencil.py)."""
    import argparse

    ap = argparse.ArgumentParser(description="tetsim_tpu interactive viewer")
    ap.add_argument("--engine", default="polar", choices=["polar", "neohookean"])
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--substeps", type=int, default=None)
    ap.add_argument("--bodies", type=int, default=1)
    ap.add_argument("--grid", default=None,
                    help="NX,NY,NZ grid_mesh via the packed stencil kernel")
    ap.add_argument("--cell", type=float, default=0.06)
    args = ap.parse_args()

    from ..mesh import load_dragon
    from ..params import default_cpu_params, default_gpu_params

    params = default_gpu_params() if args.engine == "polar" else default_cpu_params()
    if args.substeps:
        params = params.replace(num_substeps=args.substeps)
    world = World(params)
    if args.grid:
        try:
            dims = tuple(int(x) for x in args.grid.split(","))
        except ValueError:
            ap.error(f"--grid expects NX,NY,NZ integers, got {args.grid!r}")
        if len(dims) != 3 or any(d < 1 for d in dims):
            ap.error(
                f"--grid expects exactly three positive integers NX,NY,NZ "
                f"(e.g. 32,32,32), got {args.grid!r}"
            )
        ext = max(dims) * args.cell
        grid_engine = (
            "neohookean_grid_pallas" if args.engine == "neohookean"
            else "polar_grid_pallas"
        )
        world.add_grid_body(
            dims, cell=args.cell,
            origin=(-dims[0] * args.cell / 2, ext * 0.75,
                    -dims[2] * args.cell / 2),
            engine=grid_engine, packed=True, with_surface=True,
        )
    elif args.bodies > 1:
        world.add_body_batch(
            load_dragon(), args.bodies, engine=args.engine, jitter=0.5
        )
    else:
        world.add_body(load_dragon(), engine=args.engine)
    ViewerServer(world, host=args.host, port=args.port).start().serve_forever()


if __name__ == "__main__":
    main()
