"""Scale demo: a soft box of N^3 cubes (6N^3 tets) through the fused Pallas
stencil kernel with PACKED device state — the path that steps 1,053,696
tets at 0.67 ms/substep on one v5e chip (BENCHNOTES.md).

  python examples/scale_grid.py               # 16^3 = 24,576 tets, headless
  python examples/scale_grid.py --n 56        # the 1M-tet BASELINE config
  python examples/scale_grid.py --viewer      # interactive (drag the box!)
  python examples/scale_grid.py --engine neohookean   # reference-fidelity
                      # physics through kernels/nh_stencil.py (0.168
                      # ms/substep at 1M tets — the fastest 1M path)

Headless mode drops the box, lets it settle on the floor, and reports the
sustained frame rate plus physics diagnostics.  Off-TPU the kernel runs in
Pallas interpret mode automatically (slow but correct).
"""
import argparse
import os
import time


if os.environ.get("TETSIM_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TETSIM_PLATFORM"])

import tetsim_tpu as ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16, help="cubes per axis")
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--substeps", type=int, default=5)
    ap.add_argument("--viewer", action="store_true")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--engine", default="polar",
                    choices=["polar", "neohookean"],
                    help="fused kernel family: polar shape matching or "
                    "reference-fidelity Neo-Hookean GS")
    args = ap.parse_args()

    n = args.n
    cell = 1.0 / n  # ~1 m box regardless of resolution
    params = ts.PhysicsParams(num_substeps=args.substeps)
    world = ts.World(params)
    grid_engine = ("neohookean_grid_pallas" if args.engine == "neohookean"
                   else "polar_grid_pallas")
    body = world.add_grid_body(
        (n, n, n), cell=cell, origin=(-0.5, 0.75, -0.5),
        engine=grid_engine, packed=True,
        with_edges=args.viewer and n <= 32,
    )
    print(f"grid {n}^3: {body.mesh.num_tets:,} tets / "
          f"{body.mesh.num_particles:,} particles")

    if args.viewer:
        from tetsim_tpu.viewer.server import ViewerServer

        srv = ViewerServer(world, port=args.port).start()
        print(f"viewer: http://127.0.0.1:{srv.port}  (ctrl-c to stop)")
        srv.serve_forever()
        return

    # one device dispatch for the whole run (PackedGridBody.step_many):
    # per-call round-trip latency would otherwise dominate on tunneled
    # devices (BENCHNOTES pitfall 2).  Warm with the SAME frame count so
    # the timed region excludes the scan compile.
    body.step_many(params, args.frames)
    body.positions
    t0 = time.perf_counter()
    body.step_many(params, args.frames)
    body.positions  # data-dependent sync
    dt = time.perf_counter() - t0
    rate = args.frames / dt
    d = world.diagnostics()["body0"]
    print(f"{args.frames} frames in {dt:.2f}s = {rate:,.1f} frames/s "
          f"({rate * args.substeps:,.0f} substeps/s)")
    print(f"settled: min_height={d['min_height']:.4f} "
          f"max_speed={d['max_speed']:.3f} nan={d['nan']}")


if __name__ == "__main__":
    main()
