"""Hardware measurement: exact-order fused GS kernel on the dragon.

BASELINE config 1 target: >10,000 substeps/s numerically matching the CPU
reference (the ordered level schedule).  Methodology per BENCHNOTES: data-
dependent sync, two-point (K1/K2) fit, min-of-reps.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.kernels.gs_ordered import OrderedGSBody

    w_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    mesh = ts.load_dragon()
    params = ts.PhysicsParams(num_substeps=5)
    body = OrderedGSBody(mesh, w_lanes=w_lanes, interpret=False)
    s = body.sched
    print(
        f"dragon: {s.num_particles} particles {s.num_tets} tets, "
        f"{s.num_levels} sub-levels, {s.num_windows} windows x Lm={s.l_max} "
        f"(W={w_lanes})",
        file=sys.stderr, flush=True,
    )

    def timed(K, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            body.step(params, frames=K)
            chk = float(np.asarray(body.state).sum())
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(chk), "non-finite state"
        return best

    k1, k2 = 20, 120
    timed(k1, reps=1)  # compile
    t1 = timed(k1)
    t2 = timed(k2)
    per_frame = (t2 - t1) / (k2 - k1)
    rate = params.num_substeps / per_frame
    print(
        f"ordered fused: k1 {t1:.3f}s k2 {t2:.3f}s "
        f"per-frame {per_frame*1e3:.3f} ms -> {rate:,.0f} substeps/s "
        f"({per_frame*1e3/params.num_substeps:.3f} ms/substep)",
        flush=True,
    )


if __name__ == "__main__":
    main()
