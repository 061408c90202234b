"""Roofline accounting for the flagship 1M-tet kernels (VERDICT r3 item 8).

Publishes the BENCHNOTES performance claims as MEASURED numbers tied to
hardware ceilings, in one JSON document:

  * ``hbm_copy_gbps``        — streaming elementwise ceiling (read+write
                               bytes counted), measured with the two-point
                               method on a 256 MB array.  v5e spec HBM is
                               819 GB/s; ~640 GB/s achieved is the real
                               line every HBM-bound estimate must use.
  * ``extract_rotation``     — Mueller 9-iteration extractRotation alone
                               over ~1.05M tet lanes, measured two ways:
                               in-kernel (a Pallas micro-kernel iterating
                               on VMEM-resident planes — the true VPU
                               transcendental floor the fused kernels sit
                               on) and at XLA level (same math through
                               jnp, where fusion-boundary HBM round trips
                               dominate — the gap is the measured case for
                               whole-substep kernel fusion).
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


def bench_extract_rotation_kernel(m_rows=8192, rb=256, interpret=False):
    """The true VPU floor: extractRotation iterated on VMEM-RESIDENT
    planes inside one Pallas kernel (solvers/polar_grid._extract_rotation,
    the exact math the fused kernels inline).  m_rows*128 = 1,048,576
    lanes ~= the 1M-tet covariance count; per-pass HBM traffic is ZERO
    (inputs load once per block), so the two-point fit over in-kernel
    iteration counts isolates pure VPU time."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tetsim_tpu.solvers.polar_grid import _extract_rotation

    a0 = jax.random.uniform(jax.random.PRNGKey(2), (9, m_rows, 128),
                            jnp.float32, 0.5, 1.5)

    def make_call(k):
        def kernel(a_ref, o_ref):
            fixed = [a_ref[i] for i in range(1, 9)]

            def body(_, carry):
                a00, _, _, _, qw = carry
                planes = [a00] + fixed
                a = [[planes[3 * r + c] for c in range(3)] for r in range(3)]
                qx, qy, qz, qw = _extract_rotation(a)
                # data-dependent feedback so passes cannot collapse
                return (a00 + qw * np.float32(1e-20), qx, qy, qz, qw)

            z = jnp.zeros_like(a_ref[0])
            _, qx, qy, qz, qw = jax.lax.fori_loop(
                0, k, body, (a_ref[0], z, z, z, z)
            )
            o_ref[0], o_ref[1], o_ref[2], o_ref[3] = qx, qy, qz, qw

        return pl.pallas_call(
            kernel,
            grid=(m_rows // rb,),
            in_specs=[pl.BlockSpec((9, rb, 128), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((4, rb, 128), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, m_rows, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
            interpret=interpret,
        )

    def make_run(k):
        call = make_call(k)

        @jax.jit
        def run(a):
            return call(a)

        return run

    return _two_point(make_run, a0, 4, 16) * 1e3  # ms per full 9-it pass


def bench_extract_rotation_xla():
    """Same math at XLA level over 1,053,696 lanes: what extractRotation
    costs WITHOUT whole-substep kernel fusion (fusion-boundary HBM round
    trips dominate — publishing the gap vs the in-kernel floor is the
    measured case for the Pallas kernels)."""
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

    er_ms = bench_extract_rotation_kernel()
    out["extract_rotation_kernel_ms"] = round(er_ms, 3)
    print(f"extract_rotation in-kernel (9 it, 1.05M lanes): {er_ms:.3f} ms",
          file=sys.stderr, flush=True)

    erx_ms = bench_extract_rotation_xla()
    out["extract_rotation_xla_ms"] = round(erx_ms, 3)
    out["kernel_fusion_gap_x"] = round(erx_ms / er_ms, 2)
    print(f"extract_rotation XLA-level: {erx_ms:.3f} ms "
          f"({erx_ms / er_ms:.1f}x the in-kernel floor)",
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
        "note": "VPU-bound: the in-kernel extractRotation floor is the "
                "dominant term; the remainder is the stencil "
                "gather/scatter + XPBD tail",
    }
    print(f"polar_stencil: {po_ms:.3f} ms/substep "
          f"(extractRotation floor {er_ms:.3f} ms)",
          file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
