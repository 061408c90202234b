"""Headline benchmark: dragon-mesh XPBD substeps/sec on one chip.

Workload matches the reference CPU solver config (stable Neo-Hookean XPBD,
Gauss-Seidel, 5 substeps/frame, dragon mesh: 1,234 particles / 3,840 tets —
/root/reference/src/main.js:22-36, Softbody.js).  Gauss-Seidel runs as
graph-colored batches (greedy coloring, 32 colors on the dragon); the whole
measurement block (K frames) runs inside ONE jitted device program.

Measurement methodology (important on tunneled/virtualized devices where
``block_until_ready`` may resolve before execution): the timed region ends
with a DATA-DEPENDENT device->host transfer (a scalar reduced from the
final state), so the clock cannot stop before the device finished; the
fixed call/transfer round-trip is amortized over K in-jit frames and
subtracted via a two-point measurement (K1 vs K2 frames).

Baseline: the reference CPU path's implied rate — 5 substeps/frame at its
60 Hz real-time target = 300 substeps/s (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


BASELINE_SUBSTEPS_PER_SEC = 300.0  # reference CPU path @60Hz (main.js:25-27)


def _device_canary(budget_s: float | None = None):
    """Gate the heavy sections on a LIVE device, without hanging on a
    wedged relay (VERDICT r3: one wedge at snapshot time zeroed the
    round's bench after a 25-minute stall).

    Each probe is a fresh SUBPROCESS that runs a tiny data-dependent
    computation in a daemon thread and exits on its own within ~2 min
    (never killed externally — killing a client mid-relay-RPC wedges the
    relay further, BENCHNOTES).  Subprocesses matter twice over: this
    process must not import jax before the device is known-good (a failed
    backend init is cached for the process lifetime), and a relay wedge
    typically clears in 10-40 min, so a failed probe retries once a
    minute until the budget runs out (TETSIM_CANARY_BUDGET_S, default
    900 s) instead of permanently failing the round's snapshot on a
    transient."""
    import os
    import subprocess

    if budget_s is None:
        budget_s = float(os.environ.get("TETSIM_CANARY_BUDGET_S", "900"))
    # A hard plugin-init FAILURE (as opposed to a hang) makes JAX fall
    # back to CPU silently; without the platform check the canary would
    # pass and the bench would emit CPU numbers as the chip's snapshot.
    # CPU-only development runs opt in with TETSIM_CANARY_ALLOW_CPU=1.
    allow_cpu = os.environ.get("TETSIM_CANARY_ALLOW_CPU", "") == "1"
    probe_src = (
        "import threading, sys\n"
        "out = {}\n"
        "def p():\n"
        "    try:\n"
        "        import jax, jax.numpy as jnp\n"
        "        out['plat'] = jax.default_backend()\n"
        "        out['ok'] = float(jnp.arange(8.0).sum()) == 28.0\n"
        "    except Exception as e:\n"
        "        out['err'] = f'{type(e).__name__}: {e}'[:300]\n"
        "t = threading.Thread(target=p, daemon=True)\n"
        "t.start(); t.join(120)\n"
        f"if out.get('ok') and out['plat'] == 'cpu' and not {allow_cpu}:\n"
        "    print('ERR accelerator init failed, JAX fell back to cpu "
        "(set TETSIM_CANARY_ALLOW_CPU=1 for CPU runs)'); sys.exit(1)\n"
        "if out.get('ok'): print('OK', out['plat']); sys.exit(0)\n"
        "if 'err' in out: print('ERR', out['err']); sys.exit(1)\n"
        "print('HUNG: relay wedged (probe alive at 120 s)'); sys.exit(2)\n"
    )
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        r = subprocess.run(
            [sys.executable, "-c", probe_src], capture_output=True, text=True
        )
        lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
        msg = lines[-1] if lines else f"rc={r.returncode} (no output)"
        if r.returncode == 0:
            print(f"bench canary ok: {msg} (attempt {attempt})",
                  file=sys.stderr, flush=True)
            return
        left = deadline - time.monotonic()
        if left <= 0:
            print(
                f"bench canary: device unavailable after {attempt} probes "
                f"over {budget_s:.0f}s — last: {msg}. Aborting before the "
                "heavy sections (relay wedges clear in 10-40 min; rerun).",
                file=sys.stderr, flush=True,
            )
            raise SystemExit(1)
        print(f"bench canary: probe {attempt} failed ({msg}); retrying for "
              f"up to {left:.0f}s more", file=sys.stderr, flush=True)
        time.sleep(min(60.0, max(5.0, left)))


def _enable_compile_cache():
    """Persistent XLA compilation cache next to the repo: the 1M-tet
    Mosaic monoliths cost ~10 min of one-time compile per shape — cached,
    the driver's snapshot bench re-runs them in seconds (best-effort)."""
    import os

    import jax

    try:
        cache = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception as e:
        print(f"compile cache unavailable ({e}); continuing without",
              file=sys.stderr, flush=True)


def _make_runner(step, arr, params, controls, frames):
    import jax

    @jax.jit
    def run(state):
        def body(s, _):
            s, _ = step(s, arr, params, controls)
            return s, None

        s, _ = jax.lax.scan(body, state, None, length=frames)
        return s

    return run


def _timed(run, state, reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        state = run(state)
        chk = float(state.pos.sum())  # data-dependent sync: device finished
    return (time.perf_counter() - t0) / reps, chk


FUSED_BODIES = 8  # kernel batch: all 8 bodies step in the same frame


def _bench_fused(mesh, params, num_bodies=FUSED_BODIES, tag="fused"):
    """Fused VMEM Pallas kernel (the fast path; numerics verified against
    the classic engine on hardware — tests_tpu/test_hardware.py).

    Measures FRAME LATENCY of a ``num_bodies`` batch: the headline
    substeps/s is the single-body real-time rate (all bodies advance in
    that same frame, so per-body latency == batch latency); the aggregate
    body-substeps/s is reported separately in the JSON.  num_bodies=1
    publishes the un-batched number (VERDICT r4 weak #2): the kernel pads
    a lone body to its 8-sublane block, so this is the latency one dragon
    actually pays."""
    import numpy as np
    import time

    from tetsim_tpu.kernels import FusedGSBody

    body = FusedGSBody(mesh, num_bodies=num_bodies, interpret=False)
    k1, k2 = 100, 1100  # wide spread: per-frame ~0.5 ms vs ~35 ms round trip

    def timed(K, reps=3):
        # min-of-reps: the tunneled device's per-call latency is noisy
        # (BENCHNOTES: unchanged kernels read 13.6k-24.2k/s across runs);
        # the minimum is the standard latency estimator under such noise
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            body.step(params, frames=K)
            chk = float(np.asarray(body.state).sum())
            best = min(best, time.perf_counter() - t0)
        return best, chk

    timed(k1, reps=1)  # compile k-independent program once
    t1, _ = timed(k1)
    t2, chk = timed(k2)
    assert np.isfinite(chk), "non-finite state"
    per_frame = (t2 - t1) / (k2 - k1)
    print(f"{tag}: k1 {t1:.3f}s k2 {t2:.3f}s per-frame {per_frame*1e3:.3f} ms",
          file=sys.stderr, flush=True)
    return per_frame


def _bench_classic(mesh, params):
    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.solvers import get_engine

    arr = ts.build_arrays(mesh, coloring="greedy")
    state = ts.init_state(mesh)
    controls = ts.Controls.none()
    step = get_engine("neohookean").step_frame
    k1, k2 = 20, 100
    run1 = _make_runner(step, arr, params, controls, k1)
    run2 = _make_runner(step, arr, params, controls, k2)
    s = run1(state)
    float(s.pos.sum())
    s2 = run2(state)
    float(s2.pos.sum())
    t1, _ = _timed(run1, state, reps=3)
    t2, chk = _timed(run2, state, reps=3)
    assert np.isfinite(chk), "non-finite positions"
    per_frame = (t2 - t1) / (k2 - k1)
    print(f"classic: k1 {t1:.3f}s k2 {t2:.3f}s per-frame {per_frame*1e3:.3f} ms",
          file=sys.stderr, flush=True)
    return per_frame


def _bench_scale_1m():
    """Secondary headline: 1,053,696-tet grid through the fused Pallas
    stencil kernel, packed state (kernels/polar_stencil.py) — the BASELINE
    north-star workload.  Returns ms/substep, or None on failure (the
    primary dragon metric must not be blocked by this)."""
    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays
    from tetsim_tpu.kernels.polar_stencil import make_frame_stepper

    n = 56
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-0.56, 0.5, -0.56))
    garr = build_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_frame_stepper(garr, interpret=False)
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

    def timed(run, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chk = float(jax.tree.leaves(run(packed0))[0].sum())
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(chk)
        return best

    timed(run1, reps=1)
    timed(run2, reps=1)
    per_substep = (timed(run2, 3) - timed(run1, 3)) / (k2 - k1)
    print(f"scale: 1M-tet stencil {per_substep*1e3:.3f} ms/substep",
          file=sys.stderr, flush=True)
    return per_substep


def _bench_scale_1m_nh():
    """Flagship scale metric (VERDICT r3 item 2): the 1,053,696-tet grid
    through the fused Neo-Hookean 48-color GS stencil kernel
    (kernels/nh_stencil.py, packed state) — the reference-fidelity physics
    at its fastest form (0.168 ms/substep measured in round 3, BENCHNOTES).
    Returns ms/substep or None."""
    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.solvers.neohookean_grid import build_nh_grid_arrays
    from tetsim_tpu.kernels.nh_stencil import make_frame_stepper

    n = 56
    mesh = ts.grid_mesh(n, n, n, cell=0.02, origin=(-0.56, 0.5, -0.56))
    arr = build_nh_grid_arrays(mesh, (n, n, n))
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_frame_stepper(arr, interpret=False)
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

    def timed(run, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chk = float(jax.tree.leaves(run(packed0))[0].sum())
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(chk)
        return best

    timed(run1, reps=1)
    timed(run2, reps=1)
    per_substep = (timed(run2, 3) - timed(run1, 3)) / (k2 - k1)
    print(f"scale-nh: 1M-tet NH stencil {per_substep*1e3:.3f} ms/substep",
          file=sys.stderr, flush=True)
    return per_substep


def _bench_scale_1m_nh_unstructured():
    """VERDICT r4 item 1: reference-fidelity Neo-Hookean GS on a single
    connected UNSTRUCTURED ~1M-tet mesh (an irregular blob — no grid
    stencil applies), sustained packed piece planes
    (kernels/nh_pieces.py).  Measured 3.845 ms/substep in round 5 with
    the banded [J2|J>=3|interior] lane layout (5.53 default layout) vs
    the generic colored engine's ~82 ms on this shape.  Host-side
    schedule build is ~6 s; the Mosaic compile is one-time (persistent
    cache).  Returns ms/substep or None."""
    import jax
    import tetsim_tpu as ts
    from tetsim_tpu.kernels.nh_pieces import (
        build_nh_pieces_arrays, make_nh_pieces_stepper,
    )

    blob = ts.ellipsoid_mesh(68, radii=(0.68,) * 3, center=(0.0, 0.75, 0.0))
    arr = build_nh_pieces_arrays(blob, boundary_prefix=True)
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, unpack, _ = make_nh_pieces_stepper(arr, interpret=False)
    packed0 = pack(ts.init_state(blob), params)

    def runner(frames):
        @jax.jit
        def run(st):
            def body(s, _):
                return step(s, params, controls), None

            s, _ = jax.lax.scan(body, st, None, length=frames)
            return s

        return run

    k1, k2 = 20, 120
    run1, run2 = runner(k1), runner(k2)

    def timed(run, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chk = float(jax.tree.leaves(run(packed0))[0].sum())
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(chk)
        return best

    timed(run1, reps=1)
    timed(run2, reps=1)
    per_substep = (timed(run2, 3) - timed(run1, 3)) / (k2 - k1)
    print(
        f"scale-nh-unstructured: 987k-tet blob {per_substep*1e3:.3f} "
        "ms/substep", file=sys.stderr, flush=True,
    )
    return per_substep


def _bench_ordered(mesh, params):
    """Exact-order fused GS (kernels/gs_ordered.py): the BASELINE config-1
    trajectory-matching path at its measured serial floor (703 sequential
    levels on the dragon — BENCHNOTES 'Exact-order fused GS')."""
    from tetsim_tpu.kernels.gs_ordered import OrderedGSBody

    body = OrderedGSBody(mesh, interpret=False)
    k1, k2 = 20, 120

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
    t1, t2 = timed(k1), timed(k2)
    per_frame = (t2 - t1) / (k2 - k1)
    rate = params.num_substeps / per_frame
    print(f"ordered: per-frame {per_frame*1e3:.3f} ms -> {rate:,.0f} "
          "exact-order substeps/s", file=sys.stderr, flush=True)
    return rate


def main():
    _enable_compile_cache()
    _device_canary()
    import tetsim_tpu as ts

    mesh = ts.load_dragon()
    params = ts.PhysicsParams(num_substeps=5)
    try:
        per_frame = _bench_fused(mesh, params)
        path = "fused"
    except Exception as e:  # pallas lowering unavailable on this backend
        print(f"fused path unavailable ({type(e).__name__}: {str(e)[:120]}); "
              "falling back to XLA engine", file=sys.stderr, flush=True)
        per_frame = _bench_classic(mesh, params)
        path = "classic"
    per_frame_b1 = None
    if path == "fused":
        # single-body number (VERDICT r4 weak #2): num_bodies=1, so the
        # headline cannot be read as a batching artifact
        try:
            per_frame_b1 = _bench_fused(mesh, params, num_bodies=1,
                                        tag="fused-b1")
        except Exception as e:
            print(f"b1 bench unavailable ({type(e).__name__}: "
                  f"{str(e)[:120]})", file=sys.stderr, flush=True)
    try:
        scale_nh_ms = _bench_scale_1m_nh()
    except Exception as e:
        print(f"1M-tet NH stencil bench unavailable ({type(e).__name__}: "
              f"{str(e)[:120]})", file=sys.stderr, flush=True)
        scale_nh_ms = None
    try:
        scale_ms = _bench_scale_1m()
    except Exception as e:
        print(f"1M-tet scale bench unavailable ({type(e).__name__}: "
              f"{str(e)[:120]})", file=sys.stderr, flush=True)
        scale_ms = None
    try:
        scale_nh_un_ms = _bench_scale_1m_nh_unstructured()
    except Exception as e:
        print(f"unstructured NH scale bench unavailable ({type(e).__name__}:"
              f" {str(e)[:120]})", file=sys.stderr, flush=True)
        scale_nh_un_ms = None
    try:
        ordered_rate = _bench_ordered(mesh, params)
    except Exception as e:
        print(f"ordered bench unavailable ({type(e).__name__}: "
              f"{str(e)[:120]})", file=sys.stderr, flush=True)
        ordered_rate = None

    substeps_per_sec = params.num_substeps / per_frame
    out = {
        "metric": "dragon_substeps_per_sec",
        "value": round(substeps_per_sec, 1),
        "unit": "substeps/s",
        "vs_baseline": round(substeps_per_sec / BASELINE_SUBSTEPS_PER_SEC, 2),
        "path": path,
    }
    if path == "fused":
        # disambiguate (VERDICT r1): value = single-body frame latency rate
        # (the batch steps together); aggregate throughput reported apart
        out["bodies_per_kernel"] = FUSED_BODIES
        out["aggregate_body_substeps_per_sec"] = round(
            substeps_per_sec * FUSED_BODIES, 1
        )
    if per_frame_b1 is not None:
        # one dragon, num_bodies=1 (the reference's exact scene shape,
        # main.js:53-62) — VERDICT r4 weak #2
        out["dragon_substeps_per_sec_b1"] = round(
            params.num_substeps / per_frame_b1, 1
        )
    if scale_nh_ms is not None:
        # flagship: reference-fidelity NH GS at 1M tets (fastest path)
        out["scale_1m_nh_ms_per_substep"] = round(scale_nh_ms * 1e3, 3)
        out["scale_1m_nh_hz_single_chip"] = round(1.0 / scale_nh_ms, 1)
    if scale_ms is not None:
        # north-star workload (BASELINE.md: 1M tets >60 Hz on v5e-8)
        out["scale_1m_tets_ms_per_substep"] = round(scale_ms * 1e3, 3)
        out["scale_1m_tets_hz_single_chip"] = round(1.0 / scale_ms, 1)
    if scale_nh_un_ms is not None:
        # reference-fidelity NH on an UNSTRUCTURED ~1M-tet blob
        # (kernels/nh_pieces.py; VERDICT r4 item 1)
        out["scale_1m_nh_unstructured_ms"] = round(scale_nh_un_ms * 1e3, 3)
    if ordered_rate is not None:
        # BASELINE config 1 exact-trajectory path (serial floor: BASELINE.md)
        out["ordered_exact_substeps_per_sec"] = round(ordered_rate, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
