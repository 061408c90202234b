"""Tetrahedral mesh types, precompute, and constraint-graph coloring.

Replaces the reference's mesh layer (Dragon.js data + the per-tet init math of
Softbody.js:60-87 / SoftbodyGPU.js:487-608) with flat numpy/JAX arrays:

  verts     float32[N,3]   rest positions
  tets      int32[M,4]     connectivity
  edges     int32[E,2]     wireframe index buffer
  vis_*                    embedded render surface (barycentric skinning)

Precomputed per-tet quantities (Softbody.js:60-87 math, re-derived):
  inv_rest_pose   [M,3,3]  D^-1 where D's columns are rest edge vectors
  inv_rest_volume [M]      1/V, V = det(D)/6
  rest_volume     [M]      V (scatter weight of the Jacobi polar path,
                           SoftbodyGPU.js:259-262,313-314)
  inv_mass        [N]      lumped: each tet adds V/4*density to its 4 verts
  rest_centered   [M,4,3]  rest corners minus rest centroid (polar path)

Graph coloring — the piece the reference declared but never implemented
(SoftbodyGPU.js:590 stores color = -1 "Undefined"; README.md:25 explains the
>30-valence defeat). Two schedules:

  * ``level_schedule`` — order-preserving: tet i's level is one more than the
    max level of any *earlier* tet sharing a vertex.  Processing levels in
    order reproduces the sequential Gauss-Seidel trajectory of the reference
    CPU solver exactly (any two conflicting tets keep their relative order;
    tets within a level are vertex-disjoint so they commute).
  * ``greedy_color`` — fewer colors (first-fit, no order constraint), for
    speed when strict CPU-reference parity is not required.
"""
from __future__ import annotations

import dataclasses
import importlib.resources
from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Host-side mesh container
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TetMesh:
    """Host-side (numpy) tetrahedral mesh with optional render surface."""

    verts: np.ndarray  # float32 [N,3]
    tets: np.ndarray  # int32 [M,4]
    edges: Optional[np.ndarray] = None  # int32 [E,2]
    vis_tet_ids: Optional[np.ndarray] = None  # int32 [S]
    vis_bary: Optional[np.ndarray] = None  # float32 [S,3] (b3 = 1-b0-b1-b2)
    tris: Optional[np.ndarray] = None  # int32 [T,3]

    @property
    def num_particles(self) -> int:
        return self.verts.shape[0]

    @property
    def num_tets(self) -> int:
        return self.tets.shape[0]

    @property
    def num_surface_verts(self) -> int:
        return 0 if self.vis_tet_ids is None else self.vis_tet_ids.shape[0]


def load_dragon() -> TetMesh:
    """The reference's dragon mesh (1,234 particles / 3,840 tets / 29,800
    surface verts), converted from Dragon.js literals to an npz asset."""
    path = importlib.resources.files("tetsim_tpu.assets") / "dragon.npz"
    with np.load(str(path)) as z:
        return TetMesh(
            verts=z["verts"],
            tets=z["tet_ids"],
            edges=z["edge_ids"],
            vis_tet_ids=z["vis_tet_ids"],
            vis_bary=z["vis_bary"],
            tris=z["tri_ids"],
        )


# ---------------------------------------------------------------------------
# Per-tet rest-state precompute (Softbody.js:60-87 math)
# ---------------------------------------------------------------------------


def rest_state(mesh: TetMesh, density: float = 1000.0, dtype=np.float32,
               pinned=None):
    """Returns (inv_rest_pose[M,3,3], inv_rest_volume[M], rest_volume[M],
    inv_mass[N], rest_centered[M,4,3]) as numpy arrays.

    Degenerate tets (det == 0) get a zeroed inv_rest_pose, matching the
    reference's matSetInverse behavior (Softbody.js:389-395); pinned
    particles get inv_mass == 0 and never move under XPBD projection
    (Softbody.js:82-85 zero-mass convention — the reference is
    pinned-capable but its dragon pins nothing).  ``pinned``: optional
    particle-id array to pin.
    """
    verts = mesh.verts.astype(dtype)
    tets = mesh.tets
    p = verts[tets]  # [M,4,3]
    # D columns are the edge vectors (p1-p0, p2-p0, p3-p0).
    d = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]], axis=-1)
    det = np.linalg.det(d.astype(np.float64))
    vol = (det / 6.0).astype(dtype)

    inv_rest_pose = np.zeros_like(d)
    ok = det != 0.0
    inv_rest_pose[ok] = np.linalg.inv(d[ok].astype(np.float64)).astype(dtype)

    with np.errstate(divide="ignore"):
        inv_rest_volume = np.where(vol != 0.0, 1.0 / vol, 0.0).astype(dtype)

    mass = np.zeros(mesh.num_particles, dtype)
    pm = vol / 4.0 * dtype(density)
    np.add.at(mass, tets[:, 0], pm)
    np.add.at(mass, tets[:, 1], pm)
    np.add.at(mass, tets[:, 2], pm)
    np.add.at(mass, tets[:, 3], pm)
    inv_mass = np.where(mass != 0.0, 1.0 / mass, 0.0).astype(dtype)
    if pinned is not None:
        inv_mass[np.asarray(pinned, np.int64)] = 0.0

    # centroid with the exact add order used at runtime (polar.solve_shape_match
    # / SoftbodyGPU.js:162) so that exact rest is a bitwise fixed point of the
    # shape-matching solve
    centroid = (((p[:, 0] + p[:, 1]) + p[:, 2]) + p[:, 3]) * dtype(0.25)
    rest_centered = (p - centroid[:, None, :]).astype(dtype)
    return inv_rest_pose, inv_rest_volume, vol, inv_mass, rest_centered


# ---------------------------------------------------------------------------
# Constraint-graph coloring
# ---------------------------------------------------------------------------


def level_schedule(tets: np.ndarray, num_particles: int) -> np.ndarray:
    """Order-preserving level assignment: ``level[i] = 1 + max(level[j])``
    over earlier tets j sharing a vertex with i.  Returns int32[M].

    Uses the native C++ kernel when available (same algorithm; the Python
    loop below is the reference implementation and fallback)."""
    from . import native

    out = native.level_schedule(tets, num_particles)
    if out is not None:
        return out
    vert_level = np.full(num_particles, -1, np.int64)
    levels = np.empty(tets.shape[0], np.int32)
    for i, tet in enumerate(tets):
        lvl = vert_level[tet].max() + 1
        levels[i] = lvl
        vert_level[tet] = np.maximum(vert_level[tet], lvl)
    return levels


def greedy_color(tets: np.ndarray, num_particles: int) -> np.ndarray:
    """First-fit greedy coloring of the tet conflict graph (tets conflict if
    they share a vertex).  Returns int32[M]; typically far fewer colors than
    the level schedule, but does not preserve Gauss-Seidel order.

    Uses the native C++ kernel when available (same first-fit algorithm)."""
    from . import native

    out = native.greedy_color(tets, num_particles)
    if out is not None:
        return out
    m = tets.shape[0]
    colors = np.full(m, -1, np.int32)
    # per-vertex bitmask of colors used by incident tets
    vert_used: list[int] = [0] * num_particles
    for i in range(m):
        used = 0
        for v in tets[i]:
            used |= vert_used[v]
        c = 0
        while used >> c & 1:
            c += 1
        colors[i] = c
        bit = 1 << c
        for v in tets[i]:
            vert_used[v] |= bit
    return colors


def color_slots(colors: np.ndarray) -> np.ndarray:
    """Pack per-tet color ids into a dense schedule int32[L, Cmax]: row c
    lists the tet indices of color c in ascending order, padded with -1."""
    from . import native

    out = native.color_slots(colors)
    if out is not None:
        return out
    num_colors = int(colors.max()) + 1
    counts = np.bincount(colors, minlength=num_colors)
    cmax = int(counts.max())
    slots = np.full((num_colors, cmax), -1, np.int32)
    fill = np.zeros(num_colors, np.int64)
    for i, c in enumerate(colors):
        slots[c, fill[c]] = i
        fill[c] += 1
    return slots


# ---------------------------------------------------------------------------
# Device-side mesh pytree
# ---------------------------------------------------------------------------


@struct.dataclass
class TetArrays:
    """Device-resident per-mesh constants used by the solvers.

    The colored Gauss-Seidel schedule is stored *slot-major*: per-level,
    per-slot copies of every per-tet constant (``slot_*``, [L,Cmax,...]),
    pre-gathered on the host at build time.  The runtime level loop then
    performs **zero tet-indexed gathers** — its only dynamic memory traffic
    is the particle gather/scatter, which is the physical communication of
    the algorithm (the reference pays the same two table lookups per texel,
    SoftbodyGPU.js:29-42).  Slot arrays are None for engines that do not use
    the GS schedule (polar)."""

    tets: jnp.ndarray  # int32 [M,4]
    inv_rest_pose: jnp.ndarray  # f32 [M,3,3]
    inv_rest_volume: jnp.ndarray  # f32 [M]
    rest_volume: jnp.ndarray  # f32 [M]
    inv_mass: jnp.ndarray  # f32 [N]
    rest_centered: jnp.ndarray  # f32 [M,4,3]
    # -- colored-GS schedule, slot-major (None when not built) --
    slot_tets: Optional[jnp.ndarray] = None  # int32 [L,C,4]
    slot_inv_rest_pose: Optional[jnp.ndarray] = None  # f32 [L,C,3,3]
    slot_inv_rest_volume: Optional[jnp.ndarray] = None  # f32 [L,C]
    slot_valid: Optional[jnp.ndarray] = None  # bool [L,C]
    slot_inv: Optional[jnp.ndarray] = None  # int32 [L,N] particle->4*slot+corner
    slot_inv_mass: Optional[jnp.ndarray] = None  # f32 [L,C,4] corner inverse masses
    # -- polar scatter-as-gather tables (None when not built) --
    inc_idx: Optional[jnp.ndarray] = None  # int32 [N,K] corner-instance ids, -1 pad
    inc_den: Optional[jnp.ndarray] = None  # f32 [N] static sum of scatter weights

    @property
    def num_particles(self) -> int:
        return self.inv_mass.shape[-1]

    @property
    def num_tets(self) -> int:
        return self.tets.shape[-2]


def build_schedule(colors: np.ndarray, tets, inv_rest_pose, inv_rest_volume, num_particles: int, inv_mass=None):
    """Pre-gather per-tet constants into slot-major [L,Cmax,...] arrays.

    Also builds the per-level inverse index ``slot_inv [L, N]``: particle ->
    flat corner index (slot*4 + corner) within the level, or -1 when the
    particle is not touched by the level.  The level's position update is
    then a GATHER of updated corner values instead of a scatter-add — exact
    because tets within a level are vertex-disjoint, and ~7x faster on TPU
    where XLA lowers scatter at ~18 ns/row but gather at ~2.5 ns/row (the
    same scatter->gather inversion the reference used for its per-particle
    texture tables, SoftbodyGPU.js:29-37)."""
    slots = color_slots(colors)  # [L,C], -1 padded
    valid = slots >= 0
    e = np.where(valid, slots, 0)
    slot_tets = tets[e].astype(np.int32)
    slot_tets[~valid] = 0
    slot_irp = inv_rest_pose[e]
    slot_irp[~valid] = 0.0
    slot_irv = inv_rest_volume[e]
    slot_irv[~valid] = 0.0

    L, C = slots.shape
    slot_inv = np.full((L, num_particles), -1, np.int32)
    for l in range(L):
        t_idx = np.nonzero(valid[l])[0]
        corners = slot_tets[l, t_idx]  # [k,4]
        for c in range(4):
            slot_inv[l, corners[:, c]] = t_idx * 4 + c
    slot_imc = None
    if inv_mass is not None:
        slot_imc = inv_mass[slot_tets].astype(np.float32)  # [L,C,4]
        slot_imc[~valid] = 0.0
    return slot_tets, slot_irp, slot_irv, valid, slot_inv, slot_imc


def build_arrays(
    mesh: TetMesh,
    density: float = 1000.0,
    coloring: Optional[str] = "ordered",
    incidence: Optional[bool] = None,
    pinned=None,
) -> TetArrays:
    """Precompute everything the solvers need and move it to device.

    coloring: "ordered" (level schedule, exact CPU-reference GS order),
    "greedy" (fewest colors, fastest — a different but equally valid
    Gauss-Seidel constraint order), an explicit int32[M] per-tet color
    array (e.g. ``solvers.neohookean_grid.grid_coloring`` — any valid
    coloring where same-color tets share no vertex), or None (no GS
    schedule; polar engine).
    incidence: build the polar scatter-as-gather tables (inc_idx/inc_den).
    Defaults to True only when no GS schedule is requested (a Neo-Hookean
    body never reads them; polar falls back to segment_sum without them).
    """
    ir, irv, vol, im, rc = rest_state(mesh, density, pinned=pinned)
    sched = (None, None, None, None, None, None)
    if isinstance(coloring, np.ndarray):
        colors = np.asarray(coloring, np.int32)
        if colors.shape != (mesh.num_tets,):
            raise ValueError(
                f"explicit coloring must be int32[{mesh.num_tets}], got "
                f"shape {colors.shape}"
            )
        sched = build_schedule(colors, mesh.tets, ir, irv, mesh.num_particles, im)
    elif coloring == "ordered":
        colors = level_schedule(mesh.tets, mesh.num_particles)
        sched = build_schedule(colors, mesh.tets, ir, irv, mesh.num_particles, im)
    elif coloring == "greedy":
        colors = greedy_color(mesh.tets, mesh.num_particles)
        sched = build_schedule(colors, mesh.tets, ir, irv, mesh.num_particles, im)
    elif coloring is not None:
        raise ValueError(f"unknown coloring {coloring!r}")
    st, sp, sv, sd, si, sm = sched
    if incidence is None:
        incidence = coloring is None
    inc_idx = inc_den = None
    if incidence:
        inc_idx, inc_den = build_incidence(mesh.tets, vol, mesh.num_particles)
    as_j = lambda x: None if x is None else jnp.asarray(x)
    return TetArrays(
        tets=jnp.asarray(mesh.tets),
        inv_rest_pose=jnp.asarray(ir),
        inv_rest_volume=jnp.asarray(irv),
        rest_volume=jnp.asarray(vol),
        inv_mass=jnp.asarray(im),
        rest_centered=jnp.asarray(rc),
        slot_tets=as_j(st),
        slot_inv_rest_pose=as_j(sp),
        slot_inv_rest_volume=as_j(sv),
        slot_valid=as_j(sd),
        slot_inv=as_j(si),
        slot_inv_mass=as_j(sm),
        inc_idx=as_j(inc_idx),
        inc_den=as_j(inc_den),
    )


def build_incidence(tets: np.ndarray, rest_volume: np.ndarray, num_particles: int):
    """Particle -> incident corner-instance table (scatter->gather inversion
    for the polar path; replaces runtime segment_sum whose TPU lowering is
    a serial scatter).  Returns (inc_idx int32 [N,K], inc_den f32 [N]):
    flat corner-instance ids (tet*4+corner, -1 padded to the max valence K)
    and the static per-particle sum of scatter weights (rest volumes)."""
    seg = tets.reshape(-1).astype(np.int64)  # corner instance -> particle
    order = np.argsort(seg, kind="stable").astype(np.int32)
    counts = np.bincount(seg, minlength=num_particles)
    k = int(counts.max()) if len(seg) else 0
    inc = np.full((num_particles, k), -1, np.int32)
    starts = np.cumsum(counts) - counts
    seg_sorted = seg[order]
    pos_sorted = np.arange(len(seg), dtype=np.int64) - np.repeat(starts, counts)
    inc[seg_sorted, pos_sorted] = order
    den = np.zeros(num_particles, np.float64)
    np.add.at(den, seg, np.repeat(rest_volume.astype(np.float64), 4))
    return inc, den.astype(np.float32)


# ---------------------------------------------------------------------------
# Synthetic mesh generator (stress/scale testing; no analogue in reference,
# which ships only the hard-coded dragon)
# ---------------------------------------------------------------------------


def grid_mesh(
    nx: int,
    ny: int,
    nz: int,
    cell: float = 0.1,
    origin=(0.0, 0.0, 0.0),
    with_edges: bool = False,
) -> TetMesh:
    """Axis-aligned block of nx*ny*nz cubes, each Kuhn-split into 6 tets
    (conforming across cube faces).  nx=ny=nz=56 gives ~1.05M tets.

    ``with_edges`` derives the unique-edge wireframe (off by default: a
    1M-tet mesh has ~7M unique edges and the big configs never render)."""
    gx, gy, gz = nx + 1, ny + 1, nz + 1
    xs = origin[0] + np.arange(gx) * cell
    ys = origin[1] + np.arange(gy) * cell
    zs = origin[2] + np.arange(gz) * cell
    vx, vy, vz = np.meshgrid(xs, ys, zs, indexing="ij")
    verts = np.stack([vx, vy, vz], axis=-1).reshape(-1, 3).astype(np.float32)

    def vid(i, j, k):
        return (i * gy + j) * gz + k

    ci, cj, ck = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
    # Kuhn subdivision: 6 monotone paths 000 -> 111, one tet per axis
    # permutation; face diagonals always run low-corner -> high-corner, so the
    # decomposition is conforming between neighboring cubes.
    import itertools

    tet_list = []
    for perm in itertools.permutations(range(3)):
        steps = np.zeros((4, 3), np.int64)
        for s, axis in enumerate(perm):
            steps[s + 1] = steps[s]
            steps[s + 1, axis] += 1
        corners = [vid(ci + d[0], cj + d[1], ck + d[2]) for d in steps]
        tet_list.append(np.stack(corners, axis=-1))
    tets = np.concatenate(tet_list, axis=0).astype(np.int32)

    # enforce positive orientation (det of edge matrix > 0)
    p = verts[tets]
    d = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]], axis=-1)
    neg = np.linalg.det(d) < 0
    tets[neg] = tets[neg][:, [0, 2, 1, 3]]
    edges = _derive_edges(tets) if with_edges else None
    return TetMesh(verts=verts, tets=tets, edges=edges)


def _derive_edges(tets: np.ndarray) -> np.ndarray:
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return np.unique(
        np.sort(
            np.concatenate([tets[:, list(c)] for c in pairs], axis=0), axis=1
        ),
        axis=0,
    ).astype(np.int32)


def masked_grid_mesh(
    nx: int,
    ny: int,
    nz: int,
    keep,
    cell: float = 0.1,
    origin=(0.0, 0.0, 0.0),
    with_edges: bool = False,
) -> TetMesh:
    """``grid_mesh`` with cubes filtered by a predicate — shaped soft
    bodies (spheres, shells, tubes) without an external mesher (the
    reference ships only its hard-coded dragon, Dragon.js).

    ``keep``: callable(centers f32 [C,3]) -> bool [C] over cube centers.
    Unused vertices are compacted.  The result is irregular, so it runs on
    the generic engines (neohookean / polar / fused kernels), NOT the
    polar_grid stencil."""
    full = grid_mesh(nx, ny, nz, cell=cell, origin=origin)
    ci, cj, ck = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    centers = (
        np.asarray(origin, np.float32)
        + (np.stack([ci, cj, ck], axis=-1).reshape(-1, 3) + 0.5)
        * np.float32(cell)
    ).astype(np.float32)
    mask = np.asarray(keep(centers), bool)
    if mask.shape != (nx * ny * nz,):
        raise ValueError(
            f"keep() must return bool [{nx*ny*nz}], got {mask.shape}"
        )
    if not mask.any():
        raise ValueError("keep() rejected every cube")
    tets = full.tets[np.tile(mask, 6)]  # tets are type-major: 6 x C blocks
    used = np.unique(tets)
    remap = np.full(full.num_particles, -1, np.int32)
    remap[used] = np.arange(len(used), dtype=np.int32)
    tets = remap[tets]
    verts = full.verts[used]
    edges = _derive_edges(tets) if with_edges else None
    return TetMesh(verts=verts, tets=tets, edges=edges)


def ellipsoid_mesh(
    n: int = 12,
    radii=(0.5, 0.5, 0.5),
    cell: Optional[float] = None,
    center=(0.0, 1.0, 0.0),
    with_edges: bool = False,
) -> TetMesh:
    """Solid tet ellipsoid (sphere for equal radii): a masked grid of
    ~n cubes across each diameter."""
    radii = np.asarray(radii, np.float32)
    c = np.asarray(center, np.float32)
    if cell is None:
        cell = float(2.0 * radii.max() / n)
    dims = tuple(int(np.ceil(2.0 * r / cell)) + 1 for r in radii)
    origin = tuple(c - np.asarray(dims) * cell / 2.0)

    def keep(centers):
        return np.sum(((centers - c) / radii) ** 2, axis=-1) <= 1.0

    return masked_grid_mesh(
        *dims, keep, cell=cell, origin=origin, with_edges=with_edges
    )


def with_boundary_surface(mesh: TetMesh) -> TetMesh:
    """Attach the mesh's own boundary triangles as its render surface.

    Generated meshes (grid_mesh, masked_grid_mesh, TetGen imports) have no
    embedded visual mesh like the dragon's 29,800-vert skin
    (Dragon.js:1705); this derives one from the tet boundary so they render
    as shaded deformable surfaces in the viewer.  Each surface vertex IS a
    boundary particle: its skinning weight is 1 at one corner of an
    incident tet, so the standard barycentric pipeline (Softbody.js:259-273)
    applies unchanged.  Faces are wound outward (normal away from the
    owning tet's centroid)."""
    tets = mesh.tets
    # faces opposite each corner; count==1 across the mesh => boundary
    face_corners = [(1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1)]
    faces = np.concatenate([tets[:, list(c)] for c in face_corners], axis=0)
    owner = np.tile(np.arange(tets.shape[0], dtype=np.int64), 4)
    key = np.sort(faces, axis=1)
    _, first, counts = np.unique(
        key, axis=0, return_index=True, return_counts=True
    )
    sel = first[counts == 1]
    bfaces = faces[sel]
    bowner = owner[sel]

    # outward winding: flip faces whose normal points toward the owner
    # tet's centroid
    v = mesh.verts
    tc = v[tets[bowner]].mean(axis=1)
    p0, p1, p2 = v[bfaces[:, 0]], v[bfaces[:, 1]], v[bfaces[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    inward = np.einsum("ij,ij->i", n, (p0 + p1 + p2) / 3.0 - tc) < 0.0
    bfaces[inward] = bfaces[inward][:, [0, 2, 1]]

    # surface verts = unique boundary particles; skin = corner indicator
    surf_pids, tri_idx = np.unique(bfaces, return_inverse=True)
    tris = tri_idx.reshape(bfaces.shape).astype(np.int32)
    # one incident tet + corner per surface particle
    tet_of = np.full(mesh.num_particles, -1, np.int64)
    corner_of = np.zeros(mesh.num_particles, np.int64)
    for k in range(4):
        col = tets[:, k]
        tet_of[col] = np.arange(tets.shape[0])
        corner_of[col] = k
    vis_tet_ids = tet_of[surf_pids].astype(np.int32)
    cb = corner_of[surf_pids]
    # bary (b0,b1,b2) with b3 = 1-b0-b1-b2: indicator of the corner
    vis_bary = np.zeros((len(surf_pids), 3), np.float32)
    vis_bary[cb < 3, cb[cb < 3]] = 1.0  # corner 3 -> all zeros
    return dataclasses.replace(
        mesh, vis_tet_ids=vis_tet_ids, vis_bary=vis_bary, tris=tris
    )


def replicate_mesh(
    mesh: TetMesh, n: int, jitter: float = 0.0, seed: int = 0
) -> TetMesh:
    """Concatenate n copies of a mesh into one disjoint mesh (particle and
    tet ids offset per copy).

    This is the fast multi-body form on TPU: a batch of bodies becomes one
    bigger mesh, so the solvers run their ordinary (unbatched) gather /
    scatter code paths — measured ~380x faster than vmap-over-bodies for
    128 dragons, because XLA lowers *batched* scatter poorly.  Per-body
    colorings are identical to the single mesh (copies are disjoint, so the
    greedy/ordered schedules repeat per body) — a batched trajectory with
    zero jitter matches the single-body trajectory.
    """
    nv, nt = mesh.num_particles, mesh.num_tets
    off = np.zeros((n, 1, 3), np.float32)
    if jitter:
        rng = np.random.RandomState(seed)
        off = rng.uniform(-jitter, jitter, (n, 1, 3)).astype(np.float32)
        off[:, :, 1] = np.abs(off[:, :, 1])  # keep above ground
    verts = (mesh.verts[None] + off).reshape(-1, 3)
    tets = (
        mesh.tets[None] + (np.arange(n, dtype=np.int64)[:, None, None] * nv)
    ).reshape(-1, 4).astype(np.int32)

    def rep_idx(x, stride):
        if x is None:
            return None
        return (
            x[None] + (np.arange(n, dtype=np.int64).reshape((n,) + (1,) * x.ndim) * stride)
        ).reshape((-1,) + x.shape[1:]).astype(np.int32)

    vis_bary = None if mesh.vis_bary is None else np.tile(mesh.vis_bary, (n, 1))
    ns = mesh.num_surface_verts
    return TetMesh(
        verts=verts,
        tets=tets,
        edges=rep_idx(mesh.edges, nv),
        vis_tet_ids=rep_idx(mesh.vis_tet_ids, nt),
        vis_bary=vis_bary,
        tris=rep_idx(mesh.tris, ns),
    )


def single_tet_mesh() -> TetMesh:
    """Minimal regular-ish tet for unit tests."""
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    tets = np.array([[0, 1, 2, 3]], np.int32)
    return TetMesh(verts=verts, tets=tets)


# ---------------------------------------------------------------------------
# Mesh I/O (the reference ships only the hard-coded Dragon.js; a framework
# needs user meshes: TetGen .node/.ele pairs and npz round-trip)
# ---------------------------------------------------------------------------


def save_npz(path: str, mesh: TetMesh) -> None:
    """Serialize a TetMesh (same keys as the bundled dragon asset)."""
    data = {"verts": mesh.verts, "tet_ids": mesh.tets}
    if mesh.edges is not None:
        data["edge_ids"] = mesh.edges
    if mesh.vis_tet_ids is not None:
        data["vis_tet_ids"] = mesh.vis_tet_ids
        data["vis_bary"] = mesh.vis_bary
        data["tri_ids"] = mesh.tris
    np.savez_compressed(path, **data)


def load_npz(path: str) -> TetMesh:
    with np.load(path) as z:
        return TetMesh(
            verts=z["verts"].astype(np.float32),
            tets=z["tet_ids"].astype(np.int32),
            edges=z["edge_ids"].astype(np.int32) if "edge_ids" in z else None,
            vis_tet_ids=z["vis_tet_ids"].astype(np.int32) if "vis_tet_ids" in z else None,
            vis_bary=z["vis_bary"].astype(np.float32) if "vis_bary" in z else None,
            tris=z["tri_ids"].astype(np.int32) if "tri_ids" in z else None,
        )


def _read_tetgen_table(path: str) -> list:
    """Parse a TetGen-style whitespace table, skipping comments; returns the
    rows (header first) as lists of floats (rows may vary in length)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                rows.append([float(x) for x in line.split()])
    if not rows:
        raise ValueError(f"{path}: empty TetGen file")
    return rows


def load_tetgen(node_path: str, ele_path: str) -> TetMesh:
    """Load a TetGen .node/.ele pair (the de-facto tet-mesh interchange
    format).  Handles 0- or 1-based node numbering and attribute columns;
    tets are reoriented to positive volume, and the wireframe edge list is
    derived from unique tet edges."""
    nodes = _read_tetgen_table(node_path)
    n_nodes = int(nodes[0][0])
    body = nodes[1 : 1 + n_nodes]
    ids = np.array([r[0] for r in body])
    verts = np.array([r[1:4] for r in body], np.float32)
    base = int(ids.min())

    eles = _read_tetgen_table(ele_path)
    n_tets = int(eles[0][0])
    tbody = eles[1 : 1 + n_tets]
    tets = np.array([r[1:5] for r in tbody], np.int64) - base
    if tets.min() < 0 or tets.max() >= n_nodes:
        raise ValueError("TetGen .ele references nodes outside the .node file")
    tets = tets.astype(np.int32)

    # positive orientation (same convention as grid_mesh)
    p = verts[tets]
    d = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]], axis=-1)
    neg = np.linalg.det(d) < 0
    tets[neg] = tets[neg][:, [0, 2, 1, 3]]

    return TetMesh(verts=verts, tets=tets, edges=_derive_edges(tets))
