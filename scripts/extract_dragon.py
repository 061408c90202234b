"""Extract the dragon tet-mesh data arrays from the reference's Dragon.js into
an .npz asset.

The reference ships its only mesh as JS literal arrays
(/root/reference/src/Dragon.js:1,311,1080,1705,11640):
  dragonTetVerts       float  3*1234   rest positions (xyz)
  dragonTetIds         int    4*3840   tet connectivity
  dragonTetEdgeIds     int    2*6222   wireframe edges
  dragonAttachedVerts  float  4*29800  surface vert -> (tetId, b0, b1, b2)
  dragonAttachedTriIds int    3*59657  surface triangles

This is pure data conversion (mesh asset), not code translation.
"""
import re
import numpy as np

SRC = "/root/reference/src/Dragon.js"
DST = "/root/repo/tetsim_tpu/assets/dragon.npz"

NAMES = [
    "dragonTetVerts",
    "dragonTetIds",
    "dragonTetEdgeIds",
    "dragonAttachedVerts",
    "dragonAttachedTriIds",
]


def extract_array(text, name):
    m = re.search(r"(?:export\s+)?(?:const|let|var)\s+" + name + r"\s*=\s*", text)
    assert m, f"decl for {name} not found"
    i = text.index("[", m.end())
    depth = 0
    for j in range(i, len(text)):
        c = text[j]
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth == 0:
                body = text[i + 1 : j]
                return np.array(
                    [float(tok) for tok in body.replace("\n", " ").split(",") if tok.strip()],
                    dtype=np.float64,
                )
    raise ValueError(f"unbalanced brackets for {name}")


def main():
    text = open(SRC).read()
    arrays = {n: extract_array(text, n) for n in NAMES}

    verts = arrays["dragonTetVerts"].astype(np.float32).reshape(-1, 3)
    tet_ids = arrays["dragonTetIds"].astype(np.int32).reshape(-1, 4)
    edge_ids = arrays["dragonTetEdgeIds"].astype(np.int32).reshape(-1, 2)
    attached = arrays["dragonAttachedVerts"].astype(np.float32).reshape(-1, 4)
    vis_tet_ids = attached[:, 0].astype(np.int32)
    vis_bary = attached[:, 1:4].astype(np.float32)
    tri_ids = arrays["dragonAttachedTriIds"].astype(np.int32).reshape(-1, 3)

    assert verts.shape == (1234, 3), verts.shape
    assert tet_ids.shape == (3840, 4), tet_ids.shape
    assert edge_ids.shape == (6222, 2), edge_ids.shape
    assert attached.shape == (29800, 4), attached.shape
    assert tri_ids.shape == (59657, 3), tri_ids.shape
    assert tet_ids.max() == 1233 and tet_ids.min() == 0
    assert vis_tet_ids.max() < 3840

    np.savez_compressed(
        DST,
        verts=verts,
        tet_ids=tet_ids,
        edge_ids=edge_ids,
        vis_tet_ids=vis_tet_ids,
        vis_bary=vis_bary,
        tri_ids=tri_ids,
    )
    print("wrote", DST)
    for k, v in dict(
        verts=verts, tet_ids=tet_ids, edge_ids=edge_ids,
        vis_tet_ids=vis_tet_ids, vis_bary=vis_bary, tri_ids=tri_ids,
    ).items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
