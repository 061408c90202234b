"""Scene/world API — the rebuild of the reference's Main/World/Grabber layers
(main.js:9-112, World.js, Softbody.js:414-492) minus the browser: bodies are
added to a World, `world.step()` advances every body by one frame (the whole
numSubsteps loop runs inside one jitted call, main.js:79-84), and render data
(wireframe positions, skinned surface vertices, normals) is produced on
device and exported on demand.

Grab interaction mirrors the reference API (startGrab/moveGrabbed/endGrab,
Softbody.js:279-298) but the nearest-particle search is an on-device argmin
instead of the reference GPU path's full texture readback + CPU linear scan
(SoftbodyGPU.js:788-795 — a pipeline stall the rebuild avoids by design).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import TetMesh, TetArrays, build_arrays
from .params import PhysicsParams
from .state import SimState, Controls, init_state
from .solvers import get_engine


@functools.partial(jax.jit, static_argnames=("engine_name",))
def _step_frame(engine_name, state, arr, params, controls):
    return get_engine(engine_name).step_frame(state, arr, params, controls)


@jax.jit
def _nearest_particle(pos, point):
    d2 = jnp.sum((pos - point) ** 2, axis=-1)
    return jnp.argmin(d2).astype(jnp.int32)


@jax.jit
def _skin_surface(pos, skin_ids, skin_w):
    """Barycentric surface skinning (Softbody.js:259-273): vis vert = sum of
    its tet's 4 particle positions weighted by (b0,b1,b2,1-b0-b1-b2)."""
    return jnp.sum(pos[skin_ids] * skin_w[..., None], axis=-2)


@jax.jit
def _surface_render_data(pos, skin_ids, skin_w, tris):
    """Fused viewer export: skin + smooth normals, one [2,S,3] output."""
    verts = _skin_surface(pos, skin_ids, skin_w)
    return jnp.stack([verts, _vertex_normals(verts, tris)])


@jax.jit
def _surface_render_data_rotated(pos, skin_ids, skin_w, rest_normals, quats,
                                 vis_tet_ids):
    """Fused viewer export, reference GPU-path shading: skin + rest normals
    rotated by the containing tet's quaternion (SoftbodyGPU.js:424-448) —
    one [2,S,3] output, no geometric normal recomputation."""
    verts = _skin_surface(pos, skin_ids, skin_w)
    return jnp.stack(
        [verts, _rotated_normals(rest_normals, quats, vis_tet_ids)]
    )


_POLAR_ENGINES = ("polar", "polar_grid", "polar_pieces")


def _make_many_export(step, has_quats: bool):
    """Build the fused N-frames + surface-export dispatch shared by Body,
    BatchedBody and GridBodyBatch (VERDICT r4 item 8 — PackedGridBody had
    this; unpacked bodies paid a ~35 ms tunneled round trip per frame,
    BENCHNOTES pitfall 2).  ``step`` is the engine's raw (possibly
    vmapped) step_frame; ``normals`` picks the reference CPU shading
    (recomputed smooth) or GPU shading (quaternion-rotated rest normals,
    SoftbodyGPU.js:424-448) when the engine carries quats."""

    def many(state, arrays, params, controls, surf, frames, normals):
        skin_ids, skin_w, tris, rest_normals, vis_ids = surf

        # frames is TRACED (fori_loop, not scan): the viewer's adaptive
        # frame batching varies it per iteration, and a static length
        # would recompile this whole program at every batch-size change
        state = jax.lax.fori_loop(
            0, frames, lambda _i, s: step(s, arrays, params, controls)[0],
            state,
        )
        pos = state.pos.reshape(-1, 3)  # batched states flatten body-major
        verts = _skin_surface(pos, skin_ids, skin_w)
        if normals == "rotated" and has_quats:
            nrm = _rotated_normals(
                rest_normals, state.quats.reshape(-1, 4), vis_ids
            )
        else:
            nrm = _vertex_normals(verts, tris)
        return state, jnp.stack([verts, nrm])

    return jax.jit(many, static_argnames=("normals",))


@jax.jit
def _rotated_normals(rest_normals, quats, vis_tet_ids):
    """Reference GPU-path normals: rotate the REST normal by the containing
    tet's shape-matching quaternion instead of recomputing from geometry
    (SoftbodyGPU.js:424-448) — exact for rigid motion, cheap everywhere."""
    from .solvers.polar import quat_rotate

    return quat_rotate(rest_normals, quats[vis_tet_ids])


@jax.jit
def _vertex_normals(verts, tris):
    """Area-weighted vertex normals via segment_sum (the device-side
    equivalent of three.js computeVertexNormals, Softbody.js:274)."""
    p0, p1, p2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    fn = jnp.cross(p1 - p0, p2 - p0)  # area-weighted
    n = jnp.zeros_like(verts)
    for k in range(3):
        n = n.at[tris[:, k]].add(fn)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.maximum(norm, 1e-12)


class _Surface:
    """Embedded-surface render tables + skinning for one (possibly
    flattened multi-body) mesh — shared by Body and BatchedBody.

    Wraps the reference's visMesh machinery (barycentric skinning
    Softbody.js:259-277; rotated rest normals SoftbodyGPU.js:424-448)."""

    def __init__(self, mesh: TetMesh):
        self.skin_ids = jnp.asarray(mesh.tets[mesh.vis_tet_ids])  # [S,4]
        b = mesh.vis_bary
        w = np.concatenate([b, 1.0 - b.sum(axis=1, keepdims=True)], axis=1)
        self.skin_w = jnp.asarray(w.astype(np.float32))  # [S,4]
        self.tris = jnp.asarray(mesh.tris)
        self.vis_tet_ids = jnp.asarray(mesh.vis_tet_ids)
        rest_verts = _skin_surface(
            jnp.asarray(mesh.verts, jnp.float32), self.skin_ids, self.skin_w
        )
        self.rest_normals = _vertex_normals(rest_verts, self.tris)

    def mesh_data(self, pos, quats=None, normals: str = "smooth"):
        """(verts [S,3], normals [S,3], tris [T,3]) — device compute, one
        transfer.  normals="rotated" needs per-tet quats (polar path)."""
        verts = _skin_surface(pos, self.skin_ids, self.skin_w)
        if normals == "smooth":
            nrm = _vertex_normals(verts, self.tris)
        elif normals == "rotated":
            if quats is None:
                raise ValueError(
                    "rotated normals need per-tet quaternions (polar engine)"
                )
            nrm = _rotated_normals(self.rest_normals, quats, self.vis_tet_ids)
        else:
            raise ValueError(f"unknown normals mode {normals!r}")
        return np.asarray(verts), np.asarray(nrm), np.asarray(self.tris)

    def render_data(self, pos) -> np.ndarray:
        """Stacked [2,S,3] (verts, smooth normals) in ONE device->host
        transfer — the per-render-frame export path.  On tunneled devices
        every blocking transfer costs a ~35 ms round trip (BENCHNOTES), so
        the viewer's frame export must be a single one."""
        return np.asarray(
            _surface_render_data(pos, self.skin_ids, self.skin_w, self.tris)
        )


class Body:
    """One soft body: mesh constants + simulation state + interaction.

    API shape mirrors the reference SoftBody/SoftBodyGPU (Softbody.js:4-5,
    simulate/endFrame/startGrab/moveGrabbed/endGrab) re-expressed
    functionally."""

    def __init__(
        self,
        mesh: TetMesh,
        engine: str = "neohookean",
        coloring: Optional[str] = "auto",
        density: float = 1000.0,
        arrays: Optional[TetArrays] = None,
        pinned=None,
    ):
        self.mesh = mesh
        self.engine = engine
        if coloring == "auto":
            # polar is Jacobi — no GS schedule needed (skip the host-side
            # coloring pass entirely)
            coloring = "ordered" if engine == "neohookean" else None
        if engine == "polar_pieces" and arrays is None:
            from .kernels.polar_pieces import build_pieces_arrays

            arrays = build_pieces_arrays(mesh, density=density, pinned=pinned)
            pinned = None
        if engine == "nh_pieces" and arrays is None:
            from .kernels.nh_pieces import build_nh_pieces_arrays

            arrays = build_nh_pieces_arrays(
                mesh, density=density, pinned=pinned
            )
            pinned = None
        if (
            engine in ("polar_grid", "polar_grid_pallas", "neohookean_grid",
                       "neohookean_grid_pallas")
            and arrays is None
        ):
            raise ValueError(
                f"the {engine} engine needs stencil arrays: pass "
                "arrays=build_grid_arrays(mesh, (nx,ny,nz)) (or "
                "build_nh_grid_arrays) — the cube dims are not derivable "
                "from a flat TetMesh (or use World.add_grid_body)"
            )
        if arrays is not None and pinned is not None:
            raise ValueError(
                "pinned= has no effect when arrays= is prebuilt — bake the "
                "pins in (build_arrays/build_grid_arrays take pinned=)"
            )
        self.arrays = arrays if arrays is not None else build_arrays(
            mesh, density=density, coloring=coloring, pinned=pinned
        )
        self.state = init_state(mesh)
        self.controls = Controls.none()
        self.last_diag = None
        self._many_export = None
        self._step_many_fn = None

        if mesh.vis_tet_ids is not None:
            self._surface = _Surface(mesh)
            self._skin_ids = self._surface.skin_ids
            self._skin_w = self._surface.skin_w
        else:
            self._surface = None
            self._skin_ids = None

    # -- stepping ---------------------------------------------------------
    def step(self, params: PhysicsParams):
        self.state, diag = _step_frame(
            self.engine, self.state, self.arrays, params, self.controls
        )
        self.last_diag = diag
        return diag

    def step_many(self, params: PhysicsParams, frames: int):
        """``frames`` full frames in ONE device dispatch (fori_loop over a
        TRACED frame count — one compile for every batch size) — the
        per-call round-trip latency (~35 ms tunneled, BENCHNOTES pitfall
        2) amortizes over the batch.  Diagnostics carry the LAST frame's."""
        from .solvers import get_engine

        if self._step_many_fn is None:
            step = get_engine(self.engine).step_frame

            @jax.jit
            def many(state, arrays, params, controls, frames):
                def body(_i, carry):
                    s, _d = carry
                    return step(s, arrays, params, controls)

                d0 = jnp.full((params.num_substeps,), jnp.nan, jnp.float32)
                return jax.lax.fori_loop(0, frames, body, (state, d0))

            self._step_many_fn = many
        self.state, self.last_diag = self._step_many_fn(
            self.state, self.arrays, params, self.controls, frames
        )
        return self.last_diag

    def enable_render_export(self):
        """Fuse step_many + the viewer's surface export into one jitted
        device call (PackedGridBody.enable_render_export counterpart)."""
        from .solvers import get_engine

        if self._surface is None:
            raise ValueError("mesh has no embedded render surface")
        self._many_export = _make_many_export(
            get_engine(self.engine).step_frame,
            has_quats=self.engine in _POLAR_ENGINES,
        )

    def step_many_export(self, params: PhysicsParams, frames: int,
                         normals: str = "smooth"):
        """``frames`` frames + surface render export, one device call.
        Requires a prior enable_render_export; returns device [2,S,3]."""
        if self._many_export is None:
            raise RuntimeError("call enable_render_export() first")
        s = self._surface
        self.state, vn = self._many_export(
            self.state, self.arrays, params, self.controls,
            (s.skin_ids, s.skin_w, s.tris, s.rest_normals, s.vis_tet_ids),
            frames=frames, normals=normals,
        )
        self.last_diag = None
        return vn

    def simulate(self, dt, params: Optional[PhysicsParams] = None):
        """Reference-API alias (Softbody.js simulate(dt, physicsParams)):
        one substep at explicit dt.  Prefer step() — it runs the whole
        frame's substep loop in one device call."""
        from .solvers import get_engine

        p = (params or PhysicsParams()).replace(
            time_step=jnp.float32(dt), time_scale=jnp.float32(1.0)
        )
        one = p.replace(num_substeps=1)
        self.state, diag = _step_frame(
            self.engine, self.state, self.arrays, one, self.controls
        )
        self.last_diag = diag
        return diag

    def end_frame(self):
        """Reference-API alias (Softbody.js endFrame): produce render
        buffers after the substep loop; returns (positions, surface)."""
        surface = (
            self.surface_positions() if self._skin_ids is not None else None
        )
        return self.positions, surface

    # -- interaction (Softbody.js:279-298 semantics) -----------------------
    def start_grab(self, point) -> int:
        point = jnp.asarray(point, jnp.float32)
        gid = _nearest_particle(self.state.pos, point)
        self.controls = Controls(grab_id=gid, grab_pos=point)
        return int(gid)

    def move_grabbed(self, point):
        self.controls = self.controls.replace(
            grab_pos=jnp.asarray(point, jnp.float32)
        )

    def end_grab(self):
        self.controls = Controls.none()

    # -- render-data export (endFrame analogue, Softbody.js:244-277) -------
    @property
    def positions(self) -> np.ndarray:
        """Particle positions (= the reference's edgeMesh vertex buffer)."""
        return np.asarray(self.state.pos)

    def surface_positions(self) -> np.ndarray:
        """Skinned embedded-surface vertices [S,3]."""
        if self._skin_ids is None:
            raise ValueError("mesh has no embedded render surface")
        return np.asarray(_skin_surface(self.state.pos, self._skin_ids, self._skin_w))

    def surface_mesh(self, normals: str = "smooth"):
        """(positions [S,3], normals [S,3], triangles [T,3]) for a viewer —
        all computed on device, one transfer.

        normals="smooth"  recompute area-weighted normals from deformed
                          geometry (reference CPU path, Softbody.js:274);
        normals="rotated" rotate rest normals by the per-tet shape-matching
                          quaternion (reference GPU path,
                          SoftbodyGPU.js:424-448; polar engine only).
        """
        if self._surface is None:
            raise ValueError("mesh has no embedded render surface")
        quats = self.state.quats if self.engine == "polar" else None
        return self._surface.mesh_data(self.state.pos, quats, normals)


class PackedGridBody:
    """Grid body whose state STAYS in the fused stencil kernel's packed
    device layout across frames (kernels/polar_stencil.make_frame_stepper).

    The SimState layout ([N,3] / [M,4] minor dims) pads to 128-lane TPU
    tiles, so converting it per frame costs ~1 ms at 1M tets — more than
    the 0.67 ms fused substep.  This body converts only at the I/O
    boundary: positions for rendering (cheap pos-only unpack), the full
    SimState on demand (checkpoint/diagnostics).  The interactive analogue
    of the reference keeping its state in textures and reading back only
    on grab (SoftbodyGPU.js:649-668).  Grab API mirrors Body."""

    def __init__(self, mesh, arrays, params: PhysicsParams,
                 interpret: Optional[bool] = None,
                 engine: str = "polar_grid_pallas"):
        if engine == "neohookean_grid_pallas":
            from .kernels.nh_stencil import make_frame_stepper
        elif engine == "polar_grid_pallas":
            from .kernels.polar_stencil import make_frame_stepper
        else:
            raise ValueError(
                "PackedGridBody runs the fused grid kernels "
                f"(polar_grid_pallas / neohookean_grid_pallas), not {engine!r}"
            )

        self.mesh = mesh
        self.arrays = arrays
        self.engine = engine
        pack, stepfn, unpack, unpack_pos = make_frame_stepper(
            arrays, interpret
        )
        self._pack = pack
        self._stepfn = jax.jit(stepfn)
        self._stepfn_raw = stepfn
        self._unpack = unpack
        self._unpack_pos = jax.jit(unpack_pos)
        self._unpack_pos_raw = unpack_pos
        self._many_export = None

        def _many(packed, params, controls, frames):
            # frames is TRACED (fori_loop): the viewer's adaptive batching
            # varies it; a static scan length would recompile per size
            return jax.lax.fori_loop(
                0, frames, lambda _i, s: stepfn(s, params, controls), packed
            )

        self._step_many = jax.jit(_many)
        self._params = params
        self._packed = self._pack(init_state(mesh), params)
        self._packed0 = self._packed
        self.controls = Controls.none()
        self.last_diag = None
        if mesh.vis_tet_ids is not None:  # e.g. with_boundary_surface
            self._surface = _Surface(mesh)
            self._skin_ids = self._surface.skin_ids
            self._skin_w = self._surface.skin_w
        else:
            self._surface = None
            self._skin_ids = None

    def step(self, params: PhysicsParams):
        if float(params.dt) != float(self._params.dt):
            # the packed carry encodes velocity as prev = pos - v*dt; a dt
            # change (live tuning) re-derives prev under the new dt
            self._packed = self._pack(
                self._unpack(self._packed, self._params), params
            )
        self._packed = self._stepfn(self._packed, params, self.controls)
        self._params = params
        self.last_diag = None
        return None

    def step_many(self, params: PhysicsParams, frames: int):
        """`frames` full frames in ONE device dispatch (lax.scan) — the
        sustained-throughput form: per-call round-trip latency (~35 ms on
        tunneled devices, BENCHNOTES pitfall 2) amortizes over the batch."""
        if float(params.dt) != float(self._params.dt):
            self._packed = self._pack(
                self._unpack(self._packed, self._params), params
            )
        self._packed = self._step_many(
            self._packed, params, self.controls, frames=frames
        )
        self._params = params
        self.last_diag = None
        return None

    def enable_render_export(self, skin_ids, skin_w, tris):
        """Fuse the viewer's surface export into the frame dispatch.

        After this, ``step_many_export`` advances N frames AND returns the
        stacked [2,S,3] (skinned verts, smooth normals) in ONE jitted
        call.  On tunneled devices every jit invocation costs a ~35 ms
        round trip, so separate step/unpack/skin calls would cap the
        interactive refresh rate at ~10/s regardless of compute."""
        stepfn, unpack_pos = self._stepfn_raw, self._unpack_pos_raw
        skin_ids = jnp.asarray(skin_ids)
        skin_w = jnp.asarray(skin_w)
        tris = jnp.asarray(tris)

        def many_export(packed, params, controls, frames):
            # frames TRACED (fori_loop) — see _many above
            s = jax.lax.fori_loop(
                0, frames, lambda _i, st: stepfn(st, params, controls),
                packed,
            )
            pos = unpack_pos(s)
            verts = _skin_surface(pos, skin_ids, skin_w)
            return s, jnp.stack([verts, _vertex_normals(verts, tris)])

        self._many_export = jax.jit(many_export)

    def step_many_export(self, params: PhysicsParams, frames: int,
                         normals: str = "smooth"):
        """``frames`` frames + surface render export, one device call.
        Requires a prior enable_render_export; returns device [2,S,3].
        ``normals`` accepted for interface parity with Body — the packed
        layouts keep quats in kernel planes, so rotated-normals shading
        falls back to smooth here (documented viewer behavior)."""
        del normals
        if self._many_export is None:
            raise RuntimeError(
                "call enable_render_export(skin_ids, skin_w, tris) first"
            )
        if float(params.dt) != float(self._params.dt):
            self._packed = self._pack(
                self._unpack(self._packed, self._params), params
            )
        self._packed, vn = self._many_export(
            self._packed, params, self.controls, frames=frames
        )
        self._params = params
        self.last_diag = None
        return vn

    # -- state I/O boundary -------------------------------------------------
    @property
    def state(self) -> SimState:
        """Full SimState (pays the layout conversion — checkpoint/diag)."""
        return self._unpack(self._packed, self._params)

    @state.setter
    def state(self, new: SimState):
        self._packed = self._pack(new, self._params)

    def pos_device(self):
        """Device [N,3] positions — the cheap per-render-frame export."""
        return self._unpack_pos(self._packed)

    @property
    def positions(self) -> np.ndarray:
        return np.asarray(self.pos_device())

    # -- interaction (Body-compatible) ---------------------------------------
    def start_grab(self, point) -> int:
        point = jnp.asarray(point, jnp.float32)
        gid = _nearest_particle(self.pos_device(), point)
        self.controls = Controls(grab_id=gid, grab_pos=point)
        return int(gid)

    def move_grabbed(self, point):
        self.controls = self.controls.replace(
            grab_pos=jnp.asarray(point, jnp.float32)
        )

    def end_grab(self):
        self.controls = Controls.none()

    def reset(self):
        self._packed = self._packed0
        self.end_grab()


class BatchedBody:
    """N bodies of one mesh stepped as ONE flattened disjoint mesh — the
    TPU-native form of the reference's multi-body scene list (main.js:51
    physicsScene.softBodies; BASELINE config 4).

    Batching-by-concatenation runs the solvers' ordinary unbatched
    gather/scatter paths: measured 17.6M body-substeps/s for 128 dragons on
    one chip, ~380x faster than vmap-over-bodies (XLA lowers batched
    scatter poorly).  Controls hold one grab slot per body (simultaneous
    per-body grabs; solvers.common.apply_grab vector form).
    """

    def __init__(
        self,
        mesh: TetMesh,
        num_bodies: int,
        engine: str = "polar",
        coloring: Optional[str] = "auto",
        density: float = 1000.0,
        jitter: float = 0.0,
        seed: int = 0,
    ):
        from .mesh import replicate_mesh

        if coloring == "auto":
            coloring = "ordered" if engine == "neohookean" else None
        self.mesh = mesh
        self.engine = engine
        self.num_bodies = num_bodies
        self._n = mesh.num_particles
        self.flat_mesh = replicate_mesh(mesh, num_bodies, jitter=jitter, seed=seed)
        self.arrays = build_arrays(self.flat_mesh, density=density, coloring=coloring)
        self.states = init_state(self.flat_mesh)
        self.controls = Controls(
            grab_id=jnp.full((num_bodies,), -1, jnp.int32),
            grab_pos=jnp.zeros((num_bodies, 3), jnp.float32),
        )
        self.last_diag = None
        self._many_export = None
        self._surface = (
            _Surface(self.flat_mesh)
            if self.flat_mesh.vis_tet_ids is not None
            else None
        )

    def step(self, params: PhysicsParams):
        self.states, diag = _step_frame(
            self.engine, self.states, self.arrays, params, self.controls
        )
        self.last_diag = diag
        return diag

    def enable_render_export(self):
        """Fuse step_many + surface export (Body counterpart; the batch is
        one flat mesh, so the same dispatch covers all bodies)."""
        from .solvers import get_engine

        if self._surface is None:
            raise ValueError("mesh has no embedded render surface")
        self._many_export = _make_many_export(
            get_engine(self.engine).step_frame,
            has_quats=self.engine in _POLAR_ENGINES,
        )

    def step_many_export(self, params: PhysicsParams, frames: int,
                         normals: str = "smooth"):
        """``frames`` frames + the whole batch's surface export, one
        device call (see Body.step_many_export)."""
        if self._many_export is None:
            raise RuntimeError("call enable_render_export() first")
        s = self._surface
        self.states, vn = self._many_export(
            self.states, self.arrays, params, self.controls,
            (s.skin_ids, s.skin_w, s.tris, s.rest_normals, s.vis_tet_ids),
            frames=frames, normals=normals,
        )
        self.last_diag = None
        return vn

    @property
    def positions(self) -> np.ndarray:
        """[num_bodies, N, 3]."""
        return np.asarray(self.states.pos).reshape(self.num_bodies, self._n, 3)

    def surface_mesh(self, normals: str = "smooth"):
        """Skinned surfaces of ALL bodies in the batch, concatenated:
        (verts [B*S,3], normals [B*S,3], tris [B*T,3] — indices already
        offset per body by replicate_mesh)."""
        if self._surface is None:
            raise ValueError("mesh has no embedded render surface")
        quats = self.states.quats if self.engine == "polar" else None
        return self._surface.mesh_data(self.states.pos, quats, normals)

    # -- per-body interaction ------------------------------------------------
    def _check_body(self, body: int):
        if not 0 <= body < self.num_bodies:
            raise IndexError(
                f"body index {body} out of range (batch has {self.num_bodies})"
            )

    def start_grab(self, body: int, point) -> int:
        """Grab body's nearest particle to `point`; returns the LOCAL
        (per-body) particle id."""
        self._check_body(body)
        point = jnp.asarray(point, jnp.float32)
        lo = body * self._n
        local = _nearest_particle(
            jax.lax.dynamic_slice_in_dim(self.states.pos, lo, self._n), point
        )
        self.controls = Controls(
            grab_id=self.controls.grab_id.at[body].set(local + lo),
            grab_pos=self.controls.grab_pos.at[body].set(point),
        )
        return int(local)

    def grab_particle(self, flat_pid: int, point):
        """Grab a KNOWN flat particle id (viewer raycast hit) in its
        owning body's slot."""
        body = int(flat_pid) // self._n
        self._check_body(body)
        self.controls = Controls(
            grab_id=self.controls.grab_id.at[body].set(int(flat_pid)),
            grab_pos=self.controls.grab_pos.at[body].set(
                jnp.asarray(point, jnp.float32)
            ),
        )
        return body

    def move_grabbed(self, body: int, point):
        self._check_body(body)
        self.controls = self.controls.replace(
            grab_pos=self.controls.grab_pos.at[body].set(
                jnp.asarray(point, jnp.float32)
            )
        )

    def end_grab(self, body: int):
        self._check_body(body)
        self.controls = self.controls.replace(
            grab_id=self.controls.grab_id.at[body].set(-1)
        )


class GridBodyBatch:
    """B grid boxes stepped as ONE vmapped stencil-engine call, each with
    its own grab slot — the reference's one-grabber-per-body scene
    (main.js:56-65, Softbody.js:279-298) on the structured scale engines.

    The XLA stencil engines (polar_grid / neohookean_grid) vmap cleanly:
    every instance runs the identical static-slice stencil program, and
    per-body controls batch on the leading axis (inside the trace each
    instance sees the scalar-grab reference semantics).  The fused Pallas
    kernels stay single-box (a vmap would re-grid their VMEM-resident
    planes); batch those by stacking Bodies instead.

    External contract mirrors BatchedBody (the viewer's "batched" kind):
    ``flat_mesh`` (connectivity for rendering), ``states`` (leading body
    axis), ``controls`` ([B] grab slots), per-body
    start_grab/move_grabbed/end_grab, ``grab_particle`` (flat-id routing),
    ``positions`` [B, N, 3].
    """

    def __init__(
        self,
        dims,
        num_bodies: int,
        cell: float = 0.1,
        origins=None,
        engine: str = "polar_grid",
        density: float = 1000.0,
        with_edges: bool = False,
        with_surface: bool = False,
        color_scan: bool = False,
    ):
        from .mesh import grid_mesh, replicate_mesh

        if engine not in ("polar_grid", "neohookean_grid"):
            raise ValueError(
                "GridBodyBatch runs the XLA stencil engines "
                f"(polar_grid / neohookean_grid), not {engine!r}"
            )
        self.engine = engine
        self.num_bodies = num_bodies
        self.dims = tuple(dims)
        mesh = grid_mesh(*dims, cell=cell, origin=(0.0, 0.0, 0.0),
                         with_edges=with_edges)
        if with_surface:
            from .mesh import with_boundary_surface

            mesh = with_boundary_surface(mesh)
        self.mesh = mesh
        self._n = mesh.num_particles
        if engine == "neohookean_grid":
            from .solvers.neohookean_grid import build_nh_grid_arrays

            self.arrays = build_nh_grid_arrays(
                mesh, self.dims, density=density
            )
        else:
            from .solvers.polar_grid import build_grid_arrays

            self.arrays = build_grid_arrays(mesh, self.dims, density=density)
        if origins is None:
            # spread along x, one box-width + one cell apart
            w = dims[0] * cell
            origins = np.stack(
                [
                    np.arange(num_bodies, dtype=np.float32) * (w + cell),
                    np.full(num_bodies, 0.5, np.float32),
                    np.zeros(num_bodies, np.float32),
                ],
                axis=-1,
            )
        origins = np.asarray(origins, np.float32).reshape(num_bodies, 3)
        base = init_state(mesh)
        self.states = jax.vmap(
            lambda o: base.replace(pos=base.pos + o,
                                   prev_pos=base.prev_pos + o)
        )(jnp.asarray(origins))
        self.controls = Controls(
            grab_id=jnp.full((num_bodies,), -1, jnp.int32),
            grab_pos=jnp.zeros((num_bodies, 3), jnp.float32),
        )
        self.last_diag = None
        # viewer contract: replicated connectivity (positions stream live)
        self.flat_mesh = replicate_mesh(mesh, num_bodies)
        self._surface = (
            _Surface(self.flat_mesh)
            if self.flat_mesh.vis_tet_ids is not None
            else None
        )
        self._color_scan = color_scan
        self._step_jit = None
        self._many_export = None

    def _vmapped_step(self):
        if self.engine == "neohookean_grid":
            from .solvers import neohookean_grid as eng

            def one(state, arr, params, controls):
                return eng.step_frame(state, arr, params, controls,
                                      color_scan=self._color_scan)
        else:
            from .solvers import polar_grid as eng

            one = eng.step_frame

        return jax.vmap(one, in_axes=(0, None, None, 0))

    def step(self, params: PhysicsParams):
        if self._step_jit is None:
            self._step_jit = jax.jit(self._vmapped_step())
        self.states, diag = self._step_jit(
            self.states, self.arrays, params, self.controls
        )
        self.last_diag = diag
        return diag

    def enable_render_export(self):
        """Fuse step_many + surface export across the vmapped batch
        (Body counterpart; states flatten body-major for the skin)."""
        if self._surface is None:
            raise ValueError("batch was built without with_surface=True")
        self._many_export = _make_many_export(
            self._vmapped_step(), has_quats=self.engine == "polar_grid"
        )

    def step_many_export(self, params: PhysicsParams, frames: int,
                         normals: str = "smooth"):
        """``frames`` frames + the whole batch's surface export, one
        device call (see Body.step_many_export)."""
        if self._many_export is None:
            raise RuntimeError("call enable_render_export() first")
        s = self._surface
        self.states, vn = self._many_export(
            self.states, self.arrays, params, self.controls,
            (s.skin_ids, s.skin_w, s.tris, s.rest_normals, s.vis_tet_ids),
            frames=frames, normals=normals,
        )
        self.last_diag = None
        return vn

    @property
    def positions(self) -> np.ndarray:
        """[num_bodies, N, 3]."""
        return np.asarray(self.states.pos)

    def surface_mesh(self, normals: str = "smooth"):
        if self._surface is None:
            raise ValueError("mesh has no embedded render surface")
        return self._surface.mesh_data(
            self.states.pos.reshape(-1, 3), None, normals
        )

    # -- per-body interaction (BatchedBody contract) ----------------------
    def _check_body(self, body: int):
        if not 0 <= body < self.num_bodies:
            raise IndexError(
                f"body index {body} out of range (batch has "
                f"{self.num_bodies})"
            )

    def start_grab(self, body: int, point) -> int:
        """Grab body's nearest particle to `point`; returns the LOCAL
        particle id (grid engines address particles per body)."""
        self._check_body(body)
        point = jnp.asarray(point, jnp.float32)
        local = _nearest_particle(self.states.pos[body], point)
        self.controls = Controls(
            grab_id=self.controls.grab_id.at[body].set(local),
            grab_pos=self.controls.grab_pos.at[body].set(point),
        )
        return int(local)

    def grab_particle(self, flat_pid: int, point):
        """Grab a KNOWN flat particle id (viewer raycast hit over the
        replicated mesh); converts to the owning body's LOCAL id."""
        body = int(flat_pid) // self._n
        self._check_body(body)
        self.controls = Controls(
            grab_id=self.controls.grab_id.at[body].set(
                int(flat_pid) % self._n
            ),
            grab_pos=self.controls.grab_pos.at[body].set(
                jnp.asarray(point, jnp.float32)
            ),
        )
        return body

    def move_grabbed(self, body: int, point):
        self._check_body(body)
        self.controls = self.controls.replace(
            grab_pos=self.controls.grab_pos.at[body].set(
                jnp.asarray(point, jnp.float32)
            )
        )

    def end_grab(self, body: int):
        self._check_body(body)
        self.controls = self.controls.replace(
            grab_id=self.controls.grab_id.at[body].set(-1)
        )


@functools.partial(jax.jit, static_argnames=())
def _dense_step(state, arrays, params, grab_id, grab_pos):
    from .solvers import dense

    return dense.step_frame(state, arrays, params, grab_id, grab_pos)


class DenseBody:
    """N bodies stepped by the dense MXU engine (solvers/dense.py):
    gather/scatter as one-hot matmuls, bodies batched in COLUMNS so one
    [N,4C] x [4C,3B] matmul serves the whole batch per level.

    Interaction surface matches FusedGSBody (per-body grabs)."""

    def __init__(
        self,
        mesh: TetMesh,
        num_bodies: int,
        density: float = 1000.0,
        coloring: str = "greedy",
        jitter: float = 0.0,
        seed: int = 0,
    ):
        from .solvers import dense

        self.mesh = mesh
        self.engine = "dense"
        self.num_bodies = num_bodies
        self.arrays = dense.build_dense_arrays(mesh, density, coloring)
        self.state = dense.init_dense_state(mesh, num_bodies, jitter, seed)
        self.grab_id = jnp.full((num_bodies,), -1, jnp.int32)
        self.grab_pos = jnp.zeros((3, num_bodies), jnp.float32)
        self.last_diag = None

    def step(self, params: PhysicsParams):
        self.state = _dense_step(
            self.state, self.arrays, params, self.grab_id, self.grab_pos
        )
        return None

    # -- views (FusedGSBody-compatible) -----------------------------------
    def positions(self) -> np.ndarray:
        """[num_bodies, N, 3]."""
        return np.moveaxis(np.asarray(self.state.pos), -1, 0)

    def velocities(self) -> np.ndarray:
        return np.moveaxis(np.asarray(self.state.vel), -1, 0)

    # -- per-body interaction ----------------------------------------------
    def _check_body(self, body: int):
        if not 0 <= body < self.num_bodies:
            raise IndexError(
                f"body index {body} out of range (batch has {self.num_bodies})"
            )

    def set_grab(self, body: int, particle: int, point):
        self._check_body(body)
        self.grab_id = self.grab_id.at[body].set(particle)
        self.grab_pos = self.grab_pos.at[:, body].set(
            jnp.asarray(point, jnp.float32)
        )

    def start_grab(self, body: int, point) -> int:
        self._check_body(body)
        pos = self.positions()[body]
        pid = int(np.argmin(np.sum((pos - np.asarray(point)) ** 2, axis=-1)))
        self.set_grab(body, pid, point)
        return pid

    def move_grabbed(self, body: int, point):
        self._check_body(body)
        self.grab_pos = self.grab_pos.at[:, body].set(
            jnp.asarray(point, jnp.float32)
        )

    def end_grab(self, body: int):
        self._check_body(body)
        self.grab_id = self.grab_id.at[body].set(-1)


class World:
    """Scene container + frame loop (main.js:51,74-96 analogue)."""

    def __init__(self, params: Optional[PhysicsParams] = None):
        self.params = params if params is not None else PhysicsParams()
        self.bodies: list = []
        # construction specs recorded by the add_* APIs — lets a scene
        # checkpoint (checkpoint.save_world) rebuild the whole world from
        # one file; None marks a body load_world cannot reconstruct
        self._specs: list = []

    @staticmethod
    def _pins(pinned):
        return None if pinned is None else np.asarray(pinned).tolist()

    def add_body(
        self,
        mesh: TetMesh,
        engine: str = "neohookean",
        coloring: Optional[str] = "auto",
        density: Optional[float] = None,
        arrays=None,
        pinned=None,
    ) -> Body:
        d = float(self.params.density) if density is None else density
        body = Body(
            mesh, engine=engine, coloring=coloring, density=d,
            arrays=arrays, pinned=pinned,
        )
        self.bodies.append(body)
        if arrays is None:
            self._specs.append({
                "add": "body", "engine": engine, "coloring": coloring,
                "density": d, "pinned": self._pins(pinned), "_mesh": mesh,
            })
        else:
            self._specs.append(None)  # prebuilt arrays: not reconstructible
        return body

    def add_grid_body(
        self,
        dims,
        cell: float = 0.1,
        origin=(0.0, 0.0, 0.0),
        density: Optional[float] = None,
        pinned=None,
        with_edges: bool = False,
        engine: str = "polar_grid",
        packed: bool = False,
        with_surface: bool = False,
    ):
        """Add a grid_mesh box running the stencil scale engine
        (solvers/polar_grid.py, or its fused Pallas form with
        engine="polar_grid_pallas") — the fast path for structured meshes.

        ``packed=True`` (polar_grid_pallas only) keeps the state in the
        kernel's device layout across frames (PackedGridBody) — the
        sustained-throughput form: at 1M tets the per-frame SimState
        conversion alone costs more than the fused substep."""
        from .mesh import grid_mesh

        if engine not in (
            "polar_grid", "polar_grid_pallas", "neohookean_grid",
            "neohookean_grid_pallas",
        ):
            raise ValueError(
                f"add_grid_body runs the stencil engines, not {engine!r}"
            )
        d = float(self.params.density) if density is None else density
        mesh = grid_mesh(*dims, cell=cell, origin=origin, with_edges=with_edges)
        if with_surface:
            from .mesh import with_boundary_surface

            mesh = with_boundary_surface(mesh)
        if engine.startswith("neohookean_grid"):
            from .solvers.neohookean_grid import build_nh_grid_arrays

            arrays = build_nh_grid_arrays(
                mesh, tuple(dims), density=d, pinned=pinned
            )
        else:
            from .solvers.polar_grid import build_grid_arrays

            arrays = build_grid_arrays(
                mesh, tuple(dims), density=d, pinned=pinned
            )
        if packed:
            if not engine.endswith("_pallas"):
                raise ValueError(
                    "packed grid state requires a fused kernel engine "
                    "(polar_grid_pallas / neohookean_grid_pallas)"
                )
            body = PackedGridBody(mesh, arrays, self.params, engine=engine)
        else:
            body = Body(mesh, engine=engine, arrays=arrays, coloring=None)
        self.bodies.append(body)
        self._specs.append({
            "add": "grid_body", "dims": [int(x) for x in dims],
            "cell": float(cell), "origin": [float(x) for x in origin],
            "density": d, "pinned": self._pins(pinned),
            "with_edges": with_edges, "engine": engine, "packed": packed,
            "with_surface": with_surface,
        })
        return body

    def add_grid_body_batch(
        self,
        dims,
        num_bodies: int,
        cell: float = 0.1,
        origins=None,
        engine: str = "polar_grid",
        density: Optional[float] = None,
        with_edges: bool = False,
        with_surface: bool = False,
        color_scan: bool = False,
    ) -> "GridBodyBatch":
        """Add B grid boxes stepped as one vmapped stencil-engine call,
        each with its own grab slot (the reference's one-grabber-per-body
        interactivity, main.js:56-65, on the structured scale engines)."""
        d = float(self.params.density) if density is None else density
        batch = GridBodyBatch(
            dims, num_bodies, cell=cell, origins=origins, engine=engine,
            density=d, with_edges=with_edges, with_surface=with_surface,
            color_scan=color_scan,
        )
        self.bodies.append(batch)
        self._specs.append({
            "add": "grid_body_batch", "dims": [int(x) for x in dims],
            "num_bodies": num_bodies, "cell": float(cell),
            "origins": None if origins is None
            else np.asarray(origins, np.float32).tolist(),
            "engine": engine, "density": d, "with_edges": with_edges,
            "with_surface": with_surface, "color_scan": color_scan,
        })
        return batch

    def add_body_batch(
        self,
        mesh: TetMesh,
        num_bodies: int,
        engine: str = "polar",
        backend: str = "flat",
        jitter: float = 0.0,
        seed: int = 0,
        density: Optional[float] = None,
    ):
        """Add a batch of bodies.

        backend="flat"  — one flattened disjoint mesh through the XLA
                          engines (any engine, any size).
        backend="fused" — the VMEM-resident Pallas kernels (neohookean or
                          polar; bodies batched in sublanes, VMEM-gated
                          size; fastest measured paths on the dragon).
        backend="dense" — the MXU one-hot engine (neohookean only; bodies
                          batched in matmul columns; experimental — see
                          solvers/dense.py header for precision caveats).
        backend="fused_ordered" — the exact-order fused GS kernel
                          (kernels/gs_ordered.py): reproduces the
                          sequential reference trajectory at the measured
                          serial floor (neohookean only, 8 bodies).
        """
        d = float(self.params.density) if density is None else density
        if backend == "fused_ordered":
            if engine != "neohookean":
                raise ValueError(
                    "the fused_ordered backend implements the neohookean "
                    f"engine, not {engine!r}"
                )
            if num_bodies != 8:
                raise ValueError(
                    "the fused_ordered kernel batches exactly 8 bodies "
                    f"(sublane-fixed), got num_bodies={num_bodies}"
                )
            from .kernels.gs_ordered import OrderedGSBody

            batch = OrderedGSBody(mesh, density=d, jitter=jitter, seed=seed)
        elif backend == "fused":
            if engine == "neohookean":
                from .kernels import FusedGSBody

                batch = FusedGSBody(
                    mesh, num_bodies, density=d, jitter=jitter, seed=seed
                )
            elif engine == "polar":
                from .kernels.polar_fused import FusedPolarBody

                batch = FusedPolarBody(
                    mesh, num_bodies, density=d, jitter=jitter, seed=seed
                )
            else:
                raise ValueError(
                    "the fused backend implements the neohookean and "
                    f"polar engines, not {engine!r}"
                )
        elif backend == "dense":
            if engine != "neohookean":
                raise ValueError("the dense backend implements the neohookean engine")
            batch = DenseBody(mesh, num_bodies, density=d, jitter=jitter, seed=seed)
        elif backend == "flat":
            batch = BatchedBody(
                mesh, num_bodies, engine=engine, density=d, jitter=jitter, seed=seed
            )
        else:
            raise ValueError(f"unknown backend {backend!r}")
        self.bodies.append(batch)
        self._specs.append({
            "add": "body_batch", "num_bodies": num_bodies, "engine": engine,
            "backend": backend, "jitter": float(jitter), "seed": int(seed),
            "density": d, "_mesh": mesh,
        })
        return batch

    # -- scene checkpoint (VERDICT r4 item 7; extends checkpoint.py) -------
    def save(self, path: str) -> None:
        """One-file scene checkpoint: params + every body's runtime state
        (incl. PackedGridBody packed state and the fused kernels' planes)
        + construction specs, so ``World.load(path)`` restores the whole
        interactive session."""
        from . import checkpoint

        checkpoint.save_world(self, path)

    def restore(self, path: str) -> None:
        """Restore a scene checkpoint into THIS world (same body structure:
        types, engines, meshes are validated)."""
        from . import checkpoint

        checkpoint.restore_world(self, path)

    @staticmethod
    def load(path: str) -> "World":
        """Rebuild a full World from a scene checkpoint file."""
        from . import checkpoint

        return checkpoint.load_world(path)

    def step(self, frames: int = 1):
        """Advance all bodies by ``frames`` frames.

        Bodies exposing ``step_many`` (PackedGridBody) advance all frames
        in ONE device dispatch (lax.scan) — on tunneled devices the ~35 ms
        per-call round trip otherwise dominates at interactive sizes
        (BENCHNOTES pitfall 2).  Bodies are mutually independent, so
        per-body frame batching is order-equivalent to the per-frame
        body loop."""
        for body in self.bodies:
            if frames > 1 and hasattr(body, "step_many"):
                body.step_many(self.params, frames)
            else:
                for _ in range(frames):
                    body.step(self.params)

    def diagnostics(self) -> dict:
        from . import diag

        from .kernels.gs_fused import FusedGSBody
        from .kernels.gs_ordered import OrderedGSBody
        from .kernels.polar_fused import FusedPolarBody

        out = {}
        for i, b in enumerate(self.bodies):
            if isinstance(b, (FusedGSBody, OrderedGSBody, FusedPolarBody,
                              DenseBody)):
                pos = b.positions()
                vel = b.velocities()
                out[f"body{i}"] = {
                    "batch": b.num_bodies,
                    "min_height": float(pos[..., 1].min()),
                    "max_speed": float(np.linalg.norm(vel, axis=-1).max()),
                    "nan": bool(np.isnan(pos).any()),
                }
            elif isinstance(b, (BatchedBody, GridBodyBatch)):
                pos = b.positions
                vel = np.asarray(b.states.vel)
                out[f"body{i}"] = {
                    "batch": b.num_bodies,
                    "min_height": float(pos[..., 1].min()),
                    "max_speed": float(np.linalg.norm(vel, axis=-1).max()),
                    "nan": bool(np.isnan(pos).any()),
                }
            else:
                out[f"body{i}"] = diag.summarize(b.state, b.arrays, b.last_diag)
        return out
