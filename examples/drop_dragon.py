"""Minimal end-to-end example: drop the dragon, let it settle, report
diagnostics, save a checkpoint, and (optionally) serve the interactive
viewer.

  python examples/drop_dragon.py                 # headless, both engines
  python examples/drop_dragon.py --viewer        # then open the printed URL
"""
import argparse
import os
import time


if os.environ.get("TETSIM_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TETSIM_PLATFORM"])

import tetsim_tpu as ts
from tetsim_tpu import checkpoint


def run(engine: str, frames: int = 120):
    params = (
        ts.default_gpu_params() if engine == "polar" else ts.default_cpu_params()
    )
    world = ts.World(params)
    body = world.add_body(ts.load_dragon(), engine=engine)
    t0 = time.perf_counter()
    world.step(frames)
    body.positions  # sync
    dt = time.perf_counter() - t0
    rate = frames * params.num_substeps / dt
    print(f"[{engine:11s}] {frames} frames in {dt:.2f}s "
          f"({rate:,.0f} substeps/s) -> {world.diagnostics()['body0']}")
    return world, body


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--viewer", action="store_true")
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()

    for engine in ("neohookean", "polar"):
        world, body = run(engine, args.frames)

    checkpoint.save("/tmp/dragon_settled.npz", body.state)
    print("checkpoint saved -> /tmp/dragon_settled.npz")

    if args.viewer:
        from tetsim_tpu.viewer import ViewerServer

        ViewerServer(world).start().serve_forever()


if __name__ == "__main__":
    main()
