"""Phase decomposition for the pieces engines at ~1M unstructured tets.

Times three variants of the polar_pieces (or nh_pieces) substep on the
real chip with the BENCHNOTES two-point method:

  full        — kernel + boundary completion + elementwise tail
  nocomplete  — completion disabled (tier_counts=(), a static field), so
                kernel + elementwise only; full - nocomplete = completion
  kernel      — the fused solve kernel alone in a scan

Usage: python scripts/phase_pieces.py [n=68] [engine=polar_pieces] [tpp=2048]

The point (VERDICT r4 weak #4): 6.56 ms/substep = 3.66 kernel + 2.90 glue;
this script attributes the glue before optimizing it.  Run SOLO — host
schedule builds contend catastrophically with concurrent CPU jobs
(BENCHNOTES round 5 pitfall).
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def two_point(make_run, state, k1, k2, reps=3):
    run1, run2 = make_run(k1), make_run(k2)

    def timed(run, reps):
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            chk = float(np.asarray(jax_tree_first(out)).sum())
            ts.append(time.perf_counter() - t0)
            print(f"  rep {r} chk={chk:.4f} {ts[-1]:.3f}s",
                  file=sys.stderr, flush=True)
        return min(ts)

    timed(run1, 1)  # compile
    timed(run2, 1)
    t1 = timed(run1, reps)
    t2 = timed(run2, reps)
    return (t2 - t1) / (k2 - k1)


def jax_tree_first(out):
    import jax

    return jax.tree.leaves(out)[0]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    engine = sys.argv[2] if len(sys.argv) > 2 else "polar_pieces"
    tpp = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    import jax
    import tetsim_tpu as ts

    mesh = ts.ellipsoid_mesh(
        n, radii=(n * 0.01,) * 3, center=(0.0, n * 0.011, 0.0)
    )
    print(f"mesh: {mesh.num_tets} tets / {mesh.num_particles} particles",
          file=sys.stderr)

    t0 = time.perf_counter()
    if engine == "polar_pieces":
        from tetsim_tpu.kernels.polar_pieces import (
            build_pieces_arrays, make_pieces_stepper,
        )

        bpfx = os.environ.get("TETSIM_BOUNDARY_PREFIX", "") == "1"
        arr = build_pieces_arrays(
            mesh, tets_per_piece=tpp, boundary_prefix=bpfx
        )
        make_stepper = make_pieces_stepper
    else:
        from tetsim_tpu.kernels.nh_pieces import (
            build_nh_pieces_arrays, make_nh_pieces_stepper,
        )

        bpfx = os.environ.get("TETSIM_BOUNDARY_PREFIX", "") == "1"
        arr = build_nh_pieces_arrays(
            mesh, tets_per_piece=tpp, boundary_prefix=bpfx
        )
        make_stepper = make_nh_pieces_stepper
    shared = int(np.asarray(arr.lane_bnd >= 0).sum())
    lanes = arr.B * arr.rp
    print(
        f"build {time.perf_counter()-t0:.1f}s: B={arr.B} rp={arr.rp} "
        f"lanes={lanes} shared_lanes={shared} "
        f"dup={lanes/mesh.num_particles:.2f}x "
        f"tiers={len(arr.tier_counts)} Sb={arr.bnd_inst.shape[1]}",
        file=sys.stderr,
    )

    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    state0 = ts.init_state(mesh)

    results = {}
    for variant in ("full", "nocomplete"):
        a = arr if variant == "full" else dataclasses.replace(
            arr, tier_counts=(), r2=0
        )
        pack, step, _, _ = make_stepper(a, interpret=False)
        packed = pack(state0, params)

        def make_run(frames, step=step):
            @jax.jit
            def run(st):
                def body(s, _):
                    return step(s, params, controls), None

                s, _ = jax.lax.scan(body, st, None, length=frames)
                return s

            return run

        per = two_point(make_run, packed, 20, 120)
        results[variant] = per * 1e3
        print(f"{variant}: {per*1e3:.3f} ms/substep", file=sys.stderr)

    # kernel-only: scan the fused solve call itself on fixed plane inputs
    # (positions don't evolve — rate-only; same kernel, same tables)
    pack, _, _, _ = make_stepper(arr, interpret=False)
    packed = pack(state0, params)
    if engine == "polar_pieces":
        from tetsim_tpu.kernels.polar_pieces import _solve_call_cached

        call = _solve_call_cached(
            arr.B, arr.rp, arr.rt, arr.valence,
            arr.gather_tiles, arr.scatter_tiles, arr.t_tiles,
            False, params.extract_iters,
        )
        lx, ly, lz = packed[0], packed[1], packed[2]
        q = packed[6]

        def make_krun(frames):
            @jax.jit
            def run(st):
                x, y, z, qq = st

                def body(c, _):
                    x_, y_, z_, q_ = c
                    nx, ny, nz, q_ = call(
                        x_, y_, z_, q_, arr.ids, arr.inc, arr.rc, arr.wvol
                    )
                    # feed outputs back so the scan cannot be elided
                    # (1e-30 scale: x*0 could be algebraically simplified)
                    return (x_ + nx * 1e-30, y_ + ny * 1e-30,
                            z_ + nz * 1e-30, q_), None

                c, _ = jax.lax.scan(body, (x, y, z, qq), None, length=frames)
                return c

            return run

        per = two_point(make_krun, (lx, ly, lz, q), 20, 120)
        results["kernel"] = per * 1e3
        print(f"kernel: {per*1e3:.3f} ms/substep", file=sys.stderr)

    results["completion"] = results["full"] - results["nocomplete"]
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
