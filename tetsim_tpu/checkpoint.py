"""Checkpoint / resume — a subsystem the reference lacks entirely
(SURVEY.md §5: sim state lives in arrays/textures and is never serialized).

The sim state is a pytree, so checkpointing is flatten + npz.  ``save``/
``load`` round-trip SimState (or any pytree of arrays) bit-exactly; resuming
a run from a checkpoint continues the identical trajectory (tested).

Hardening (VERDICT r1 #8): checkpoints stamp the pytree structure, leaf
shapes, and — when provided — mesh identity (particle/tet counts + content
hash) and engine name.  ``load`` validates all of it and raises a clear
error instead of positionally unflattening into a mismatched structure.
"""
from __future__ import annotations

import hashlib
import json

import numpy as np
import jax

from .state import SimState


def mesh_fingerprint(mesh) -> str:
    """Content hash of a TetMesh's defining arrays (rest verts + tets)."""
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(mesh.verts, np.float32).tobytes())
    h.update(np.ascontiguousarray(mesh.tets, np.int32).tobytes())
    return h.hexdigest()[:16]


def save(path: str, state, mesh=None, engine: str | None = None) -> None:
    """Serialize a state pytree; optionally stamp mesh identity + engine."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    meta = {
        "treedef": str(treedef),
        "shapes": [list(np.shape(l)) for l in leaves],
    }
    if engine is not None:
        meta["engine"] = engine
    if mesh is not None:
        meta["num_particles"] = int(mesh.num_particles)
        meta["num_tets"] = int(mesh.num_tets)
        meta["mesh_hash"] = mesh_fingerprint(mesh)
    np.savez_compressed(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def _read_meta(z) -> dict:
    if "__meta__" in z.files:
        return json.loads(bytes(z["__meta__"]).decode())
    if "__treedef__" in z.files:  # pre-hardening checkpoints
        return {"treedef": bytes(z["__treedef__"]).decode()}
    return {}


def load(path: str, like=None, mesh=None, engine: str | None = None):
    """Load a checkpoint.

    ``like``: a pytree of the target structure — the stored treedef and
    leaf shapes are validated against it before unflattening.
    ``mesh``/``engine``: validated against the stamped identity when both
    sides have one.  Without ``like`` a plain SimState is assumed.
    """
    with np.load(path) as z:
        meta = _read_meta(z)
        n = sum(1 for k in z.files if k.startswith("leaf"))
        leaves = [jax.numpy.asarray(z[f"leaf{i}"]) for i in range(n)]

    if engine is not None and meta.get("engine") not in (None, engine):
        raise ValueError(
            f"checkpoint was written by engine {meta['engine']!r}, "
            f"not {engine!r}"
        )
    if "shapes" in meta:  # corruption / partial-write guard
        got = [list(np.shape(l)) for l in leaves]
        if got != meta["shapes"]:
            raise ValueError(
                f"checkpoint leaves {got} disagree with their own stamped "
                f"shapes {meta['shapes']} — file corrupt or truncated"
            )
    if mesh is not None:
        if "mesh_hash" in meta:
            if (
                meta["num_particles"] != mesh.num_particles
                or meta["num_tets"] != mesh.num_tets
                or meta["mesh_hash"] != mesh_fingerprint(mesh)
            ):
                raise ValueError(
                    "checkpoint does not match this mesh: stored "
                    f"{meta['num_particles']} particles / {meta['num_tets']} tets "
                    f"(hash {meta['mesh_hash']}), got {mesh.num_particles} / "
                    f"{mesh.num_tets} (hash {mesh_fingerprint(mesh)})"
                )
        elif leaves and np.shape(leaves[0])[0] != mesh.num_particles:
            # unstamped (or pre-hardening) checkpoint: fall back to the
            # particle count of the first leaf (pos for a SimState)
            raise ValueError(
                f"checkpoint first leaf has {np.shape(leaves[0])[0]} rows, "
                f"mesh has {mesh.num_particles} particles"
            )

    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        stored = meta.get("treedef")
        if stored is not None and stored != str(treedef):
            raise ValueError(
                "checkpoint pytree structure does not match `like`:\n"
                f"  stored: {stored}\n  target: {treedef}"
            )
        want = [np.shape(l) for l in jax.tree_util.tree_leaves(like)]
        got = [np.shape(l) for l in leaves]
        if len(want) != len(got) or any(
            tuple(w) != tuple(g) for w, g in zip(want, got)
        ):
            raise ValueError(
                f"checkpoint leaf shapes {got} do not match target {want}"
            )
        return jax.tree_util.tree_unflatten(treedef, leaves)
    if len(leaves) != 4:
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; a bare SimState needs 4 "
            "(pass `like=` for other structures)"
        )
    return SimState(pos=leaves[0], prev_pos=leaves[1], vel=leaves[2], quats=leaves[3])


# ---------------------------------------------------------------------------
# World-level scene checkpoint (VERDICT r4 item 7)
#
# One file captures an interactive session: params, every body's runtime
# state (incl. PackedGridBody packed state via its ``.state`` I/O boundary
# and the fused kernels' SoA planes), engine tags, mesh fingerprints, and —
# for bodies added through the World.add_* APIs — a construction spec, so
# ``load_world`` rebuilds the whole scene from nothing.  The reference has
# no counterpart (SURVEY.md §5: state lives in textures, never serialized).
# ---------------------------------------------------------------------------

SCENE_VERSION = 1

_PARAM_LEAVES = (
    "gravity", "time_scale", "time_step", "friction", "density",
    "dev_compliance", "vol_compliance", "world_min", "world_max",
)
_MESH_FIELDS = ("verts", "tets", "edges", "vis_tet_ids", "vis_bary", "tris")


def _params_to_meta(p) -> dict:
    m = {k: np.asarray(getattr(p, k)).tolist() for k in _PARAM_LEAVES}
    m["num_substeps"] = int(p.num_substeps)
    m["extract_iters"] = int(p.extract_iters)
    return m


def _params_from_meta(m) -> "PhysicsParams":
    import jax.numpy as jnp

    from .params import PhysicsParams

    kw = {}
    for k, v in m.items():
        if k in ("num_substeps", "extract_iters"):
            kw[k] = int(v)
        elif isinstance(v, list):
            kw[k] = jnp.asarray(v, jnp.float32)
        else:
            kw[k] = jnp.float32(v)
    return PhysicsParams(**kw)


def _capture_body(body) -> dict:
    """Runtime state of one scene body as a flat {name: array} dict."""
    from .kernels.gs_fused import FusedGSBody
    from .kernels.gs_ordered import OrderedGSBody
    from .kernels.polar_fused import FusedPolarBody
    from .world import Body, PackedGridBody, BatchedBody, GridBodyBatch, \
        DenseBody

    if isinstance(body, (Body, PackedGridBody)):
        s, c = body.state, body.controls  # PackedGridBody: unpack boundary
        return {"pos": s.pos, "prev_pos": s.prev_pos, "vel": s.vel,
                "quats": s.quats, "grab_id": c.grab_id, "grab_pos": c.grab_pos}
    if isinstance(body, (BatchedBody, GridBodyBatch)):
        s, c = body.states, body.controls
        return {"pos": s.pos, "prev_pos": s.prev_pos, "vel": s.vel,
                "quats": s.quats, "grab_id": c.grab_id, "grab_pos": c.grab_pos}
    if isinstance(body, FusedPolarBody):
        return {"planes": body.state, "quats": body.quats,
                "grab_id": body.grab_id, "grab_pos": body.grab_pos}
    if isinstance(body, (FusedGSBody, OrderedGSBody)):
        return {"planes": body.state,
                "grab_id": body.grab_id, "grab_pos": body.grab_pos}
    if isinstance(body, DenseBody):
        s = body.state
        return {"pos": s.pos, "prev_pos": s.prev_pos, "vel": s.vel,
                "grab_id": body.grab_id, "grab_pos": body.grab_pos}
    raise TypeError(f"cannot checkpoint body type {type(body).__name__}")


def _restore_body(body, d: dict, params) -> None:
    """Inverse of _capture_body (arrays already jnp)."""
    from .kernels.gs_fused import FusedGSBody
    from .kernels.gs_ordered import OrderedGSBody
    from .kernels.polar_fused import FusedPolarBody
    from .state import Controls
    from .world import Body, PackedGridBody, BatchedBody, GridBodyBatch, \
        DenseBody

    if isinstance(body, (Body, PackedGridBody)):
        if isinstance(body, PackedGridBody):
            # .state setter re-packs with body._params.dt; align it with
            # the restored params so prev = pos - v*dt round-trips exactly
            body._params = params
        body.state = SimState(pos=d["pos"], prev_pos=d["prev_pos"],
                              vel=d["vel"], quats=d["quats"])
        body.controls = Controls(grab_id=d["grab_id"], grab_pos=d["grab_pos"])
    elif isinstance(body, (BatchedBody, GridBodyBatch)):
        body.states = SimState(pos=d["pos"], prev_pos=d["prev_pos"],
                               vel=d["vel"], quats=d["quats"])
        body.controls = Controls(grab_id=d["grab_id"], grab_pos=d["grab_pos"])
        body.last_diag = None
    elif isinstance(body, FusedPolarBody):
        body.state, body.quats = d["planes"], d["quats"]
        body.grab_id, body.grab_pos = d["grab_id"], d["grab_pos"]
    elif isinstance(body, (FusedGSBody, OrderedGSBody)):
        body.state = d["planes"]
        body.grab_id, body.grab_pos = d["grab_id"], d["grab_pos"]
    elif isinstance(body, DenseBody):
        from .solvers.dense import DenseState

        body.state = DenseState(pos=d["pos"], prev_pos=d["prev_pos"],
                                vel=d["vel"])
        body.grab_id, body.grab_pos = d["grab_id"], d["grab_pos"]
    else:
        raise TypeError(f"cannot restore body type {type(body).__name__}")


def save_world(world, path: str) -> None:
    """Serialize a whole World: params + every body's state (+ specs)."""
    arrays: dict = {}
    bodies_meta = []
    for i, b in enumerate(world.bodies):
        d = _capture_body(b)
        bodies_meta.append({
            "type": type(b).__name__,
            "engine": getattr(b, "engine", type(b).__name__),
            "mesh_hash": mesh_fingerprint(b.mesh),
            "keys": sorted(d),
        })
        arrays.update({f"b{i}.{k}": np.asarray(v) for k, v in d.items()})
    specs = [
        None if s is None else dict(s)
        for s in getattr(world, "_specs", [])
    ]
    for i, spec in enumerate(specs):
        if spec is None:
            continue
        mesh = spec.pop("_mesh", None)  # popped from the COPY only
        if mesh is not None:
            spec["mesh"] = "inline"
            for f in _MESH_FIELDS:
                v = getattr(mesh, f)
                if v is not None:
                    arrays[f"spec{i}.{f}"] = np.asarray(v)
    meta = {
        "scene_version": SCENE_VERSION,
        "params": _params_to_meta(world.params),
        "bodies": bodies_meta,
        "specs": specs,
    }
    np.savez_compressed(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays,
    )


def _apply_states(world, meta, z) -> None:
    import jax.numpy as jnp

    for i, (b, bm) in enumerate(zip(world.bodies, meta["bodies"])):
        if type(b).__name__ != bm["type"]:
            raise ValueError(
                f"scene body {i} is {type(b).__name__}, checkpoint has "
                f"{bm['type']}"
            )
        if getattr(b, "engine", type(b).__name__) != bm["engine"]:
            raise ValueError(
                f"scene body {i} runs engine "
                f"{getattr(b, 'engine', '?')!r}, checkpoint has "
                f"{bm['engine']!r}"
            )
        if mesh_fingerprint(b.mesh) != bm["mesh_hash"]:
            raise ValueError(f"scene body {i} mesh differs from checkpoint")
        d = {k: jnp.asarray(z[f"b{i}.{k}"]) for k in bm["keys"]}
        _restore_body(b, d, world.params)


def restore_world(world, path: str) -> None:
    """Restore a checkpoint into an EXISTING World with the same scene
    structure (body types, engines, meshes) — validates, then applies."""
    with np.load(path) as z:
        meta = _read_meta(z)
        if "bodies" not in meta:
            raise ValueError(f"{path} is not a world checkpoint")
        if len(world.bodies) != len(meta["bodies"]):
            raise ValueError(
                f"scene has {len(world.bodies)} bodies, checkpoint has "
                f"{len(meta['bodies'])}"
            )
        world.params = _params_from_meta(meta["params"])
        _apply_states(world, meta, z)


def _spec_mesh(z, i: int):
    from .mesh import TetMesh

    kw = {}
    for f in _MESH_FIELDS:
        key = f"spec{i}.{f}"
        if key in z.files:
            kw[f] = z[key]
    return TetMesh(**kw)


def load_world(path: str):
    """Rebuild a World from a scene checkpoint: replay each body's
    construction spec (recorded by the World.add_* APIs), then restore
    params and every body's runtime state."""
    from .world import World

    with np.load(path) as z:
        meta = _read_meta(z)
        if "bodies" not in meta:
            raise ValueError(f"{path} is not a world checkpoint")
        specs = meta.get("specs", [])
        if len(specs) != len(meta["bodies"]):
            raise ValueError(
                "checkpoint bodies lack construction specs (added outside "
                "the World.add_* APIs?) — rebuild the scene in code and use "
                "restore_world/world.restore instead"
            )
        world = World(_params_from_meta(meta["params"]))
        for i, spec in enumerate(specs):
            if spec is None:
                raise ValueError(
                    f"body {i} has no construction spec (prebuilt arrays or "
                    "direct bodies.append) — rebuild the scene in code and "
                    "use restore_world/world.restore instead"
                )
            spec = dict(spec)
            kind = spec.pop("add")
            if spec.pop("mesh", None) == "inline":
                spec["mesh"] = _spec_mesh(z, i)
            if kind == "body":
                world.add_body(**spec)
            elif kind == "grid_body":
                world.add_grid_body(**spec)
            elif kind == "grid_body_batch":
                world.add_grid_body_batch(**spec)
            elif kind == "body_batch":
                world.add_body_batch(**spec)
            else:
                raise ValueError(f"unknown body spec kind {kind!r}")
        _apply_states(world, meta, z)
    return world
