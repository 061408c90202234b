"""Measure PhysicsParams.extract_iters on the 1M-tet fused polar stencil.

The polar-path kernels sit on the Mueller extractRotation VPU floor
(scripts/roofline.py: 0.665 ms of the 0.7 ms substep at 9 iterations), and
the solve is warm-started — each substep extracts only the small residual
rotation against the last-rotated rest pose, the same economics that let
the reference's per-thread early-out exit after 1-2 iterations
(SoftbodyGPU.js:135).  TPU lanes run in lockstep, so the iteration COUNT
is the lever: this script measures ms/substep at iters in {9, 4, 2, 1}
through kernels/polar_stencil.make_frame_stepper (packed state, two-point
scan fit, min-of-reps — BENCHNOTES methodology), plus a 120-frame settle
check per count so speed claims never outrun stability.

Usage: python scripts/bench_extract_iters.py [n=56] [iters,iters,...]
       python scripts/bench_extract_iters.py dragon [iters,...]   # the
       reference GPU config (polar, 20 substeps/frame) through the fused
       unstructured kernel (kernels/polar_fused.FusedPolarBody, 8 bodies)
"""
import json
import sys
import time

import numpy as np


def _enable_cache():
    import os

    import jax

    try:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass


def bench_dragon(iters_list):
    """Dragon, polar, 20 substeps/frame (the reference GPU solver config,
    main.js:26) through the fused VMEM kernel, 8 bodies/kernel — reports
    per-body substeps/s per extract_iters count (two-point, min-of-reps)."""
    import time

    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.kernels.polar_fused import FusedPolarBody

    _enable_cache()
    mesh = ts.load_dragon()
    body = FusedPolarBody(mesh, num_bodies=8, interpret=False)
    out = {"metric": "dragon_polar_fused_extract_iters"}
    for it in iters_list:
        params = ts.PhysicsParams(num_substeps=20, extract_iters=it)
        k1, k2 = 50, 250

        def timed(K, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                body.step(params, frames=K)
                chk = float(np.asarray(body.state).sum())
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(chk), "non-finite state"
            return best

        timed(k1, reps=1)
        timed(k2, reps=1)
        per_frame = (timed(k2) - timed(k1)) / (k2 - k1)
        rate = params.num_substeps / per_frame
        out[f"iters_{it}_substeps_per_sec_per_body"] = round(rate, 1)
        print(f"dragon iters={it}: {per_frame*1e3:.3f} ms/frame -> "
              f"{rate:,.0f} substeps/s/body", file=sys.stderr, flush=True)
    base = out.get("iters_9_substeps_per_sec_per_body")
    if base:
        for it in iters_list:
            k = f"iters_{it}_substeps_per_sec_per_body"
            if it != 9 and k in out:
                out[f"iters_{it}_speedup_x"] = round(out[k] / base, 2)
    print(json.dumps(out))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "dragon":
        iters_list = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [9, 4, 2, 1]
        )
        bench_dragon(iters_list)
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56
    iters_list = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [9, 4, 2, 1]
    )

    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays
    from tetsim_tpu.kernels.polar_stencil import make_frame_stepper

    _enable_cache()

    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-n * 0.01, 0.5, -n * 0.01))
    garr = build_grid_arrays(mesh, (n, n, n))
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_frame_stepper(garr, interpret=False)
    out = {"metric": f"polar_stencil_extract_iters_{mesh.num_tets}tets"}

    for it in iters_list:
        params = ts.PhysicsParams(num_substeps=1, extract_iters=it)
        packed0 = pack(ts.init_state(mesh), params)

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

        def timed(run, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                chk = float(jax.tree.leaves(run(packed0))[0].sum())
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(chk)
            return best

        t0 = time.perf_counter()
        timed(run1, reps=1)
        timed(run2, reps=1)
        compile_s = time.perf_counter() - t0
        ms = (timed(run2) - timed(run1)) / (k2 - k1) * 1e3

        # settle check: 120 frames at 5 substeps, then inspect the state
        pset = ts.PhysicsParams(num_substeps=5, extract_iters=it)
        pk = pack(ts.init_state(mesh), pset)

        @jax.jit
        def settle(st):
            def body(s, _):
                return step(s, pset, controls), None

            s, _ = jax.lax.scan(body, st, None, length=120)
            return s

        st = unpack(settle(pk), pset)
        pos = np.asarray(st.pos)
        vel = np.asarray(st.vel)
        max_v = float(np.abs(vel).max())
        # stability is judged RELATIVE to the reference count: after 120
        # frames this 1.12 m cube is still legitimately sloshing at any
        # iteration count — an unstable count shows up as NaN, floor
        # penetration, or runaway velocity vs the 9-iteration baseline
        if it == iters_list[0]:
            out["_baseline_max_v"] = max_v
        base_v = out.get("_baseline_max_v", max_v)
        stable = bool(
            np.isfinite(pos).all()
            and pos[:, 1].min() >= -1e-4
            and max_v <= max(0.5, 2.0 * base_v)
        )
        out[f"iters_{it}_ms_per_substep"] = round(ms, 3)
        out[f"iters_{it}_max_v"] = round(max_v, 3)
        out[f"iters_{it}_stable"] = stable
        print(
            f"iters={it}: {ms:.3f} ms/substep (compile {compile_s:.0f}s, "
            f"settle stable={stable}, max|v|={max_v:.3f})",
            file=sys.stderr, flush=True,
        )

    base = out.get("iters_9_ms_per_substep")
    if base:
        for it in iters_list:
            if it != 9 and f"iters_{it}_ms_per_substep" in out:
                out[f"iters_{it}_speedup_x"] = round(
                    base / out[f"iters_{it}_ms_per_substep"], 2
                )
    out.pop("_baseline_max_v", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
