"""Measure the fused NH kernel's fori-table sweep vs the unrolled sweep.

Compares compile time and sustained substep rate of
kernels/nh_stencil.make_frame_stepper(dynamic=True) against the default
unrolled form, at a given grid size (default 56 -> 1,053,696 tets).
Decides whether `dynamic` should become the default (BENCHNOTES
"Compile-time lever").

Usage: python scripts/bench_nh_dynamic.py [n=56] [substeps=1]
"""
import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56
    substeps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.solvers.neohookean_grid import build_nh_grid_arrays
    from tetsim_tpu.kernels.nh_stencil import make_frame_stepper

    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-n * 0.01, 0.5, -n * 0.01))
    arr = build_nh_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=substeps)
    controls = ts.Controls.none()
    state = ts.init_state(mesh)
    out = {"metric": f"nh_dynamic_vs_unrolled_{mesh.num_tets}tets"}

    for name, dyn in (("dynamic", True), ("unrolled", False)):
        pack, step, unpack, _ = make_frame_stepper(arr, interpret=False,
                                                   dynamic=dyn)
        packed0 = pack(state, params)

        def runner(frames):
            @jax.jit
            def run(st):
                def body(s, _):
                    return step(s, params, controls), None

                s, _ = jax.lax.scan(body, st, None, length=frames)
                return s

            return run

        k1, k2 = 50, 400
        run1, run2 = runner(k1), runner(k2)
        t0 = time.perf_counter()
        o = run1(packed0)
        chk1 = float(jax.tree.leaves(o)[0].sum())
        o = run2(packed0)
        chk2 = float(jax.tree.leaves(o)[0].sum())
        compile_s = time.perf_counter() - t0
        assert np.isfinite(chk1) and np.isfinite(chk2)
        print(f"{name}: compile+warm {compile_s:.1f}s chk={chk2:.4f}",
              file=sys.stderr, flush=True)

        def timed(run, reps=3):
            best = float("inf")
            for r in range(reps):
                t0 = time.perf_counter()
                o = run(packed0)
                float(jax.tree.leaves(o)[0].sum())
                best = min(best, time.perf_counter() - t0)
                print(f"  {name} rep {r}", file=sys.stderr, flush=True)
            return best

        t1, t2 = timed(run1), timed(run2)
        per_substep = (t2 - t1) / (k2 - k1) / substeps
        print(f"{name}: {per_substep*1e3:.3f} ms/substep",
              file=sys.stderr, flush=True)
        out[f"{name}_compile_s"] = round(compile_s, 1)
        out[f"{name}_ms_per_substep"] = round(per_substep * 1e3, 3)
        # parity checksum across variants (identical arithmetic)
        out[f"{name}_chk"] = round(chk2, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
