"""Headline benchmark: dragon-mesh XPBD substeps/sec on one chip.

Workload matches the reference CPU solver config (stable Neo-Hookean XPBD,
Gauss-Seidel, 5 substeps/frame, dragon mesh: 1,234 particles / 3,840 tets —
/root/reference/src/main.js:22-36, Softbody.js).  Gauss-Seidel runs as
graph-colored batches (greedy coloring, 32 colors on the dragon); the whole
frame (all substeps, all color levels) is one jitted device program.

Baseline: the reference CPU path's implied rate — 5 substeps/frame at its
60 Hz real-time target = 300 substeps/s (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


BASELINE_SUBSTEPS_PER_SEC = 300.0  # reference CPU path @60Hz (main.js:25-27)


def main():
    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.solvers import get_engine

    mesh = ts.load_dragon()
    arr = ts.build_arrays(mesh, coloring="greedy")
    state = ts.init_state(mesh)
    params = ts.PhysicsParams(num_substeps=5)
    controls = ts.Controls.none()

    step = jax.jit(get_engine("neohookean").step_frame)

    # warmup / compile
    state, _ = step(state, arr, params, controls)
    jax.block_until_ready(state)

    # measure: async batches with a sync point + stderr heartbeat per batch
    # (tight dispatch loops with no other syscalls can stall tunneled
    # devices; see scripts/bench_scale.py)
    frames = 0
    s = state
    t0 = time.perf_counter()
    while True:
        for _ in range(50):
            s, _ = step(s, arr, params, controls)
        jax.block_until_ready(s)
        frames += 50
        elapsed = time.perf_counter() - t0
        print(f"  {frames} frames, {elapsed:.2f}s", file=sys.stderr, flush=True)
        if elapsed > 1.5 or frames >= 20000:
            break

    assert np.isfinite(np.asarray(s.pos)).all(), "non-finite positions"
    substeps_per_sec = frames * params.num_substeps / elapsed
    print(
        json.dumps(
            {
                "metric": "dragon_substeps_per_sec",
                "value": round(substeps_per_sec, 1),
                "unit": "substeps/s",
                "vs_baseline": round(substeps_per_sec / BASELINE_SUBSTEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
