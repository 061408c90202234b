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

# runnable from anywhere: the package lives next to scripts/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56
    engine = sys.argv[2] if len(sys.argv) > 2 else "polar"
    substeps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax

    if os.environ.get("TETSIM_PLATFORM"):
        # explicit override (the host sitecustomize may ignore JAX_PLATFORMS)
        jax.config.update("jax_platforms", os.environ["TETSIM_PLATFORM"])
    try:
        # share bench.py's persistent cache: the 1M-tet Mosaic monoliths
        # cost minutes of one-time compile per (shape, layout) — cached,
        # re-runs (and the driver's bench.py, for shared shapes) skip it
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception as e:
        print(f"compile cache unavailable ({e})", file=sys.stderr)
    import tetsim_tpu as ts
    from tetsim_tpu.solvers import get_engine

    t0 = time.perf_counter()
    if engine.startswith(("polar_pieces", "nh_pieces")):
        # the single-connected-UNSTRUCTURED-mesh workload (an irregular
        # blob, no exploitable grid stencil): n=68 -> ~987k tets
        mesh = ts.ellipsoid_mesh(
            n, radii=(n * 0.01,) * 3, center=(0.0, n * 0.011, 0.0)
        )
    else:
        mesh = ts.grid_mesh(
            n, n, n, cell=0.02, origin=(-n * 0.01, 0.5, -n * 0.01)
        )
    print(f"mesh: {mesh.num_tets} tets / {mesh.num_particles} particles "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    t0 = time.perf_counter()
    if engine.startswith("polar_grid"):
        from tetsim_tpu.solvers.polar_grid import build_grid_arrays

        arr = build_grid_arrays(mesh, (n, n, n))
    elif engine.startswith("neohookean_grid"):
        from tetsim_tpu.solvers.neohookean_grid import build_nh_grid_arrays

        arr = build_nh_grid_arrays(mesh, (n, n, n))
    elif engine.startswith("polar_pieces"):
        from tetsim_tpu.kernels.polar_pieces import build_pieces_arrays

        tpp = int(os.environ.get("TETSIM_TETS_PER_PIECE", "2048"))
        bpfx = os.environ.get("TETSIM_BOUNDARY_PREFIX", "") == "1"
        arr = build_pieces_arrays(
            mesh, tets_per_piece=tpp, boundary_prefix=bpfx
        )
        print(
            f"pieces: {arr.B} (rp={arr.rp}, rb={arr.rb}, rt={arr.rt}, "
            f"K={arr.valence}, "
            f"shared={int((arr.lane_bnd >= 0).sum())}, "
            f"dup={arr.B*arr.rp/mesh.num_particles:.2f}x lanes)",
            file=sys.stderr,
        )
    elif engine.startswith("nh_pieces"):
        from tetsim_tpu.kernels.nh_pieces import build_nh_pieces_arrays

        tpp = int(os.environ.get("TETSIM_TETS_PER_PIECE", "2048"))
        bpfx = os.environ.get("TETSIM_BOUNDARY_PREFIX", "") == "1"
        arr = build_nh_pieces_arrays(
            mesh, tets_per_piece=tpp, boundary_prefix=bpfx
        )
        print(
            f"nh pieces: {arr.B} (rp={arr.rp}, rb={arr.rb}, r2={arr.r2}, "
            f"l_max={arr.l_max}, "
            f"shared={int((arr.lane_bnd >= 0).sum())}, "
            f"dup={arr.B*arr.rp/mesh.num_particles:.2f}x lanes)",
            file=sys.stderr,
        )
    else:
        coloring = None if engine == "polar" else "greedy"
        arr = ts.build_arrays(mesh, coloring=coloring)
    print(f"build_arrays: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    state = ts.init_state(mesh)
    params = ts.PhysicsParams(num_substeps=substeps)
    controls = ts.Controls.none()
    # "<engine>+packed": keep state in the kernel's device layout across
    # frames (kernels/polar_stencil.make_frame_stepper) — measures sustained
    # sim throughput without the per-frame SimState layout conversion
    packed_mode = engine.endswith("+packed")
    if packed_mode:
        if engine.startswith("polar_pieces"):
            from tetsim_tpu.kernels.polar_pieces import make_pieces_stepper

            pack, step_packed, unpack, _ = make_pieces_stepper(
                arr, interpret=False
            )
        elif engine.startswith("nh_pieces"):
            from tetsim_tpu.kernels.nh_pieces import make_nh_pieces_stepper

            pack, step_packed, unpack, _ = make_nh_pieces_stepper(
                arr, interpret=False
            )
        elif engine.startswith("neohookean_grid_pallas"):
            from tetsim_tpu.kernels.nh_stencil import make_frame_stepper

            pack, step_packed, unpack, _ = make_frame_stepper(
                arr, interpret=False
            )
        else:
            from tetsim_tpu.kernels.polar_stencil import make_frame_stepper

            pack, step_packed, unpack, _ = make_frame_stepper(
                arr, interpret=False
            )
        state = pack(state, params)

        def step(s, arr_, params_, controls_):
            return step_packed(s, params_, controls_), None

    else:
        step = get_engine(engine).step_frame

    # Honest methodology (BENCHNOTES.md): K frames inside one jitted scan,
    # timed region ends with a DATA-DEPENDENT device->host transfer (through
    # the tunnel, block_until_ready can resolve at dispatch — the raw
    # dispatch rate here reads up to 30x too fast), constant round-trip
    # cancelled by the two-point fit.  Heartbeat prints per rep keep the
    # tunnel's background IO alive.
    def make_runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                s, _ = step(s, arr, params, controls)
                return s, None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    def timed(run, st, reps=3):
        t0 = time.perf_counter()
        chk = 0.0
        for r in range(reps):
            out = run(st)
            # data-dependent sync (packed mode: first position plane)
            chk = float(jax.tree.leaves(out)[0].sum())
            print(f"  rep {r} chk={chk:.4f}", file=sys.stderr, flush=True)
        return (time.perf_counter() - t0) / reps, chk

    # pick the two-point spread by engine speed: fast engines need a wide
    # spread so the per-frame delta dominates round-trip jitter
    k1, k2 = (
        (50, 400) if engine.startswith(("polar_grid",
                                        "neohookean_grid_pallas"))
        else (20, 120) if engine.startswith(
            ("neohookean_grid", "polar_pieces", "nh_pieces")
        )
        else (3, 15)
    )
    run1, run2 = make_runner(k1), make_runner(k2)
    t0 = time.perf_counter()
    timed(run1, state, reps=1)
    timed(run2, state, reps=1)
    print(f"compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t1, _ = timed(run1, state)
    t2, chk = timed(run2, state)
    assert np.isfinite(chk), "non-finite positions"
    per_frame = (t2 - t1) / (k2 - k1)

    steps_per_sec = 1.0 / per_frame
    print(json.dumps({
        "metric": f"{engine}_steps_per_sec_{mesh.num_tets}tets_{substeps}sub",
        "value": round(steps_per_sec, 2),
        "unit": "frames/s",
        "substeps_per_sec": round(steps_per_sec * substeps, 1),
        "ms_per_substep": round(per_frame / substeps * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
