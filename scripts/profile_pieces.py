"""Break the polar_pieces substep into kernel vs XLA-glue time (real chip).

Usage: python scripts/profile_pieces.py [n=68] [tets_per_piece=2048]
"""
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    tpp = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    import jax
    import jax.numpy as jnp

    import tetsim_tpu as ts
    from tetsim_tpu.kernels import polar_pieces as pp

    t0 = time.perf_counter()
    mesh = ts.ellipsoid_mesh(n, radii=(n * 0.01,) * 3, center=(0, n * 0.011, 0))
    arr = pp.build_pieces_arrays(mesh, tets_per_piece=tpp)
    print(
        f"mesh {mesh.num_tets} tets; pieces {arr.B} rp={arr.rp} rt={arr.rt} "
        f"K={arr.valence} tiers={arr.tier_counts} "
        f"build {time.perf_counter()-t0:.0f}s",
        flush=True,
    )
    # union-size diagnostics (kernel gather cost driver)
    gsz = [len(t) for corner in arr.gather_tiles for t in corner]
    ssz = [len(t) for bank in arr.scatter_tiles for t in bank]
    print(
        f"gather unions: mean {np.mean(gsz):.1f} max {max(gsz)}  "
        f"scatter unions: mean {np.mean(ssz):.1f} max {max(ssz)}  "
        f"sites ~{(sum(gsz)*3 + sum(ssz)*3)}",
        flush=True,
    )

    params = ts.PhysicsParams(num_substeps=1)
    controls = ts.Controls.none()
    state = ts.init_state(mesh)
    call = pp._solve_call_cached(
        arr.B, arr.rp, arr.rt, arr.valence,
        arr.gather_tiles, arr.scatter_tiles, arr.t_tiles, False,
    )

    # kernel-only inputs (per-component planes)
    def to_local(comp):
        padded = jnp.concatenate([comp, jnp.zeros((1,), comp.dtype)])
        return padded[arr.g2l_flat].reshape(arr.B, arr.rp)

    pos = jnp.asarray(state.pos)
    lx, ly, lz = (to_local(pos[:, c]) for c in range(3))
    q = pp._quats_to_pieces(state.quats, arr)

    def two_point(make_run, x, k1=20, k2=120):
        r1, r2 = make_run(k1), make_run(k2)

        def t(run):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                out = run(x)
                float(jax.tree.leaves(out)[0].sum())
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            return best

        t(r1); t(r2)
        return (t(r2) - t(r1)) / (k2 - k1)

    def kernel_runner(k):
        @jax.jit
        def run(carry):
            def body(c, _):
                lx_, ly_, lz_, q_ = c
                nx_, ny_, nz_, q2 = call(
                    lx_, ly_, lz_, q_, arr.ids, arr.inc, arr.rc, arr.wvol
                )
                # feed num back in as positions to keep a data dependence
                return (nx_, ny_, nz_, q2), None

            c, _ = jax.lax.scan(body, carry, None, length=k)
            return c

        return run

    tk = two_point(kernel_runner, (lx, ly, lz, q))
    print(f"kernel-only: {tk*1e3:.2f} ms/substep", flush=True)

    pack, step, unpack, _ = pp.make_pieces_stepper(arr, interpret=False)
    packed0 = pack(state, params)

    def packed_runner(k):
        @jax.jit
        def run(st):
            def body(s, _):
                return step(s, params, controls), None

            s, _ = jax.lax.scan(body, st, None, length=k)
            return s

        return run

    tp = two_point(packed_runner, packed0)
    print(
        f"packed substep: {tp*1e3:.2f} ms  (glue = {max(tp-tk,0)*1e3:.2f} ms)",
        flush=True,
    )

    def full_runner(k):
        @jax.jit
        def run(st):
            def body(s, _):
                s = pp.step_frame(s, arr, params, controls, interpret=False)[0]
                return s, None

            s, _ = jax.lax.scan(body, st, None, length=k)
            return s

        return run

    tf = two_point(full_runner, state)
    print(
        f"step_frame (1 sub/frame, converts per frame): {tf*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
