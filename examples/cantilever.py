"""Cantilever beam on the structured-grid stencil engine: a grid_mesh bar
pinned at one end wall sags under gravity and settles — the classic
soft-body validation the reference cannot run (it has no pinning and no
mesh generator; Dragon.js is its only asset).

  python examples/cantilever.py                  # headless
  python examples/cantilever.py --viewer         # interactive (particles +
                                                 # wireframe; grid meshes
                                                 # have no render surface)
  TETSIM_PLATFORM=cpu python examples/cantilever.py   # force CPU
"""
import argparse
import os
import time


if os.environ.get("TETSIM_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TETSIM_PLATFORM"])

import numpy as np
import jax

import tetsim_tpu as ts
from tetsim_tpu.solvers import get_engine
from tetsim_tpu.solvers.polar_grid import build_grid_arrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=24)
    ap.add_argument("--ny", type=int, default=4)
    ap.add_argument("--nz", type=int, default=4)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--viewer", action="store_true")
    args = ap.parse_args()

    dims = (args.nx, args.ny, args.nz)
    cell = 0.08
    mesh = ts.grid_mesh(
        *dims, cell=cell, origin=(-1.0, 1.2, -args.nz * cell / 2),
        with_edges=True,
    )

    # pin the x=0 vertex wall (zero inverse mass — Softbody.js:82-85
    # convention, which the reference supports but never exercises)
    gy, gz = args.ny + 1, args.nz + 1
    wall = np.arange(gy * gz, dtype=np.int64)  # plane i=0 is the first gy*gz ids
    garr = build_grid_arrays(mesh, dims, pinned=wall)

    params = ts.PhysicsParams(num_substeps=8)
    step = jax.jit(get_engine("polar_grid").step_frame)
    state = ts.init_state(mesh)
    controls = ts.Controls.none()

    t0 = time.perf_counter()
    for _ in range(args.frames):
        state, _ = step(state, garr, params, controls)
    pos = np.asarray(state.pos)
    dtime = time.perf_counter() - t0

    tip0 = mesh.verts[:, 1].max()
    tip = pos[-gy * gz :, 1].mean()  # free-end wall mean height
    root = pos[: gy * gz]
    print(f"{mesh.num_tets} tets, {args.frames} frames in {dtime:.2f}s")
    print(f"root wall held: max drift {np.abs(root - mesh.verts[:gy*gz]).max():.2e}")
    print(f"tip sagged {mesh.verts[-gy*gz:,1].mean() - tip:.3f} m under gravity")
    assert np.isfinite(pos).all()
    assert np.abs(root - mesh.verts[: gy * gz]).max() == 0.0, "pins moved"
    assert tip < mesh.verts[-gy * gz :, 1].mean() - 0.01, "beam did not sag"

    if args.viewer:
        from tetsim_tpu.world import World, Body
        from tetsim_tpu.viewer import ViewerServer

        world = World(params)
        body = Body(mesh, engine="polar_grid", arrays=garr, coloring=None)
        body.state = state
        world.bodies.append(body)
        ViewerServer(world).start().serve_forever()


if __name__ == "__main__":
    main()
