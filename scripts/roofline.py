"""Roofline accounting for the flagship 1M-tet kernels (VERDICT r3 item 8).

Publishes the BENCHNOTES performance claims as MEASURED numbers tied to
hardware ceilings, in one JSON document:

  * ``hbm_copy_gbps``        — streaming elementwise ceiling (the 1.65 TB/s
                               line), measured with the two-point method on
                               a 256 MB array.
  * ``extract_rotation_ms``  — Mueller 9-iteration extractRotation alone
                               over 1,053,696 tet lanes: the VPU
                               transcendental floor every polar-path kernel
                               sits on (BENCHNOTES: ~0.53 ms).
  * per-kernel sections      — measured ms/substep for the fused NH and
                               polar stencil kernels at 56^3 (1,053,696
                               tets), the kernel's resident state bytes,
                               the HBM lower bound for streaming that state
                               once (read+write), and achieved/floor
                               ratios.

Methodology is BENCHNOTES.md throughout: K frames inside one jitted scan,
a data-dependent device->host transfer closes every timed region, constant
call overhead cancelled by the two-point (K1/K2) fit, min-of-reps.

Run on the real chip (no env overrides):  python scripts/roofline.py
"""
import json
import sys
import time

import numpy as np


N = 56  # 56^3 cubes = 1,053,696 tets / 185,193 particles


def _two_point(make_run, arg, k1, k2, reps=3):
    """Two-point fit over scan lengths k1 < k2; returns seconds per unit."""
    import jax

    run1, run2 = make_run(k1), make_run(k2)

    def timed(run):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chk = float(jax.tree.leaves(run(arg))[0].sum())
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(chk)
        return best

    timed(run1)  # compile
    timed(run2)
    return (timed(run2) - timed(run1)) / (k2 - k1)


def bench_hbm_copy():
    """Streaming ceiling: y = x * c over 256 MB f32, read+write counted."""
    import jax
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # 256 MB
    x = jax.random.uniform(jax.random.PRNGKey(0), (n,), jnp.float32)

    def make_run(k):
        @jax.jit
        def run(x):
            def body(a, _):
                return a * np.float32(1.0000001), None

            a, _ = jax.lax.scan(body, x, None, length=k)
            return a

        return run

    per_iter = _two_point(make_run, x, 8, 64)
    return (2 * 4 * n) / per_iter / 1e9  # read + write GB/s


def bench_extract_rotation():
    """The VPU floor: 9-iteration extractRotation over 1,053,696 lanes
    (solvers/polar_grid._extract_rotation — the exact in-kernel math)."""
    import jax
    import jax.numpy as jnp

    from tetsim_tpu.solvers.polar_grid import _extract_rotation

    m = 6 * N * N * N
    key = jax.random.PRNGKey(1)
    a = [
        [
            jax.random.uniform(jax.random.fold_in(key, 3 * r + c), (m,),
                               jnp.float32, 0.5, 1.5)
            for c in range(3)
        ]
        for r in range(3)
    ]

    def make_run(k):
        @jax.jit
        def run(a):
            def body(carry, _):
                q = _extract_rotation(carry)
                # feed the result back so iterations cannot be collapsed
                out = [
                    [carry[r][c] + q[0] * np.float32(1e-20) for c in range(3)]
                    for r in range(3)
                ]
                return out, None

            out, _ = jax.lax.scan(body, a, None, length=k)
            return out

        return run

    return _two_point(make_run, a, 5, 25) * 1e3  # ms per pass


def _stepper_ms(pack_step, packed0, k1=50, k2=400):
    import jax

    def make_run(k):
        @jax.jit
        def run(st):
            def body(s, _):
                return pack_step(s), None

            s, _ = jax.lax.scan(body, st, None, length=k)
            return s

        return run

    return _two_point(make_run, packed0, k1, k2) * 1e3


def bench_nh_stencil():
    import jax.numpy as jnp

    import tetsim_tpu as ts
    from tetsim_tpu.solvers.neohookean_grid import build_nh_grid_arrays
    from tetsim_tpu.kernels.nh_stencil import make_frame_stepper

    mesh = ts.grid_mesh(N, N, N, cell=0.02, origin=(-0.56, 0.5, -0.56))
    arr = build_nh_grid_arrays(mesh, (N, N, N))
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, _, _ = make_frame_stepper(arr, interpret=False)
    packed0 = pack(ts.init_state(mesh), params)
    ms = _stepper_ms(lambda s: step(s, params, controls), packed0)
    # resident state: 6 position/velocity planes (f32 [8, rows, 128])
    state_bytes = sum(int(np.prod(p.shape)) * 4 for p in packed0)
    return ms, state_bytes


def bench_polar_stencil():
    import tetsim_tpu as ts
    from tetsim_tpu.solvers.polar_grid import build_grid_arrays
    from tetsim_tpu.kernels.polar_stencil import make_frame_stepper

    mesh = ts.grid_mesh(N, N, N, cell=0.02, origin=(-0.56, 0.5, -0.56))
    arr = build_grid_arrays(mesh, (N, N, N))
    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    pack, step, _, _ = make_frame_stepper(arr, interpret=False)
    packed0 = pack(ts.init_state(mesh), params)
    ms = _stepper_ms(lambda s: step(s, params, controls), packed0)
    leaves = []
    for grp in packed0:
        leaves.extend(grp if isinstance(grp, tuple) else [grp])
    state_bytes = sum(int(np.prod(np.asarray(p).shape)) * 4 for p in leaves)
    return ms, state_bytes


def main():
    out = {"mesh": f"{N}^3 cubes", "tets": 6 * N * N * N,
           "particles": (N + 1) ** 3}

    gbps = bench_hbm_copy()
    out["hbm_copy_gbps"] = round(gbps, 1)
    print(f"hbm copy: {gbps:.0f} GB/s", file=sys.stderr, flush=True)

    er_ms = bench_extract_rotation()
    out["extract_rotation_1m_ms"] = round(er_ms, 3)
    print(f"extract_rotation (9 it, 1.05M lanes): {er_ms:.3f} ms",
          file=sys.stderr, flush=True)

    nh_ms, nh_bytes = bench_nh_stencil()
    nh_floor = 2 * nh_bytes / (gbps * 1e9) * 1e3  # stream state r+w once
    out["nh_stencil"] = {
        "measured_ms_per_substep": round(nh_ms, 3),
        "state_bytes": nh_bytes,
        "hbm_stream_floor_ms": round(nh_floor, 4),
        "vs_hbm_floor": round(nh_ms / nh_floor, 1),
        "note": "VPU-bound: 48 colors x 2 XPBD projections per lane; "
                "state is VMEM-resident so the HBM floor is slack",
    }
    print(f"nh_stencil: {nh_ms:.3f} ms/substep "
          f"(hbm floor {nh_floor:.4f} ms)", file=sys.stderr, flush=True)

    po_ms, po_bytes = bench_polar_stencil()
    po_floor = 2 * po_bytes / (gbps * 1e9) * 1e3
    out["polar_stencil"] = {
        "measured_ms_per_substep": round(po_ms, 3),
        "state_bytes": po_bytes,
        "hbm_stream_floor_ms": round(po_floor, 4),
        "extract_rotation_floor_ms": round(er_ms, 3),
        "vs_vpu_floor": round(po_ms / er_ms, 2),
        "note": "sits on the extractRotation VPU transcendental floor "
                "(BENCHNOTES: kernel within ~25% of it)",
    }
    print(f"polar_stencil: {po_ms:.3f} ms/substep "
          f"(extractRotation floor {er_ms:.3f} ms)",
          file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
