"""Scale benchmark: big-grid-mesh step rate, single chip (BASELINE config 5
workload shape; the v5e-8 sharded variant divides tets over the mesh).

Usage: python scripts/bench_scale.py [n_cells=56] [engine=polar] [substeps=1]
n_cells=56 -> 56^3 * 6 = 1,053,696 tets / 185,193 particles.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56
    engine = sys.argv[2] if len(sys.argv) > 2 else "polar"
    substeps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax

    if os.environ.get("TETSIM_PLATFORM"):
        # explicit override (the host sitecustomize may ignore JAX_PLATFORMS)
        jax.config.update("jax_platforms", os.environ["TETSIM_PLATFORM"])
    import tetsim_tpu as ts
    from tetsim_tpu.solvers import get_engine

    t0 = time.perf_counter()
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-n * 0.01, 0.5, -n * 0.01))
    print(f"mesh: {mesh.num_tets} tets / {mesh.num_particles} particles "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    t0 = time.perf_counter()
    coloring = None if engine == "polar" else "greedy"
    arr = ts.build_arrays(mesh, coloring=coloring)
    print(f"build_arrays: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    state = ts.init_state(mesh)
    params = ts.PhysicsParams(num_substeps=substeps)
    controls = ts.Controls.none()
    step = jax.jit(get_engine(engine).step_frame)

    t0 = time.perf_counter()
    state, _ = step(state, arr, params, controls)
    jax.block_until_ready(state)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # Measurement pattern tuned for tunneled devices: small async batches
    # with a sync point + stderr heartbeat per batch.  (A fully tight
    # dispatch/block loop with no other syscalls reproducibly stalls the
    # tunnel's background IO; a heartbeat print per batch avoids it.)
    frames = 0
    s = state
    t0 = time.perf_counter()
    while True:
        for _ in range(25):
            s, _ = step(s, arr, params, controls)
        jax.block_until_ready(s)
        frames += 25
        elapsed = time.perf_counter() - t0
        print(f"  {frames} frames, {elapsed:.2f}s", file=sys.stderr, flush=True)
        if elapsed > 2.0 or frames >= 1500:
            break

    assert np.isfinite(np.asarray(s.pos)).all()
    steps_per_sec = frames / elapsed
    print(json.dumps({
        "metric": f"{engine}_steps_per_sec_{mesh.num_tets}tets_{substeps}sub",
        "value": round(steps_per_sec, 2),
        "unit": "frames/s",
        "substeps_per_sec": round(steps_per_sec * substeps, 1),
    }))


if __name__ == "__main__":
    main()
