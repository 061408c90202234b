"""Quantify Gauss-Seidel constraint-order sensitivity on the dragon.

BASELINE config 1 asks for ">10k substeps/s numerically matching the CPU
reference (Neo-Hookean, graph-colored GS)".  Two schedules exist:

  * "ordered"  — level_schedule: reproduces the reference's sequential
    tet order exactly (same trajectory as solvers/golden.py);
  * "greedy"   — first-fit coloring: a different, equally valid GS order
    (the headline-bench schedule; 32 levels vs 703).

This script measures, per frame, the max position deviation of each XLA
schedule from the sequential NumPy oracle, plus physical statistics
(kinetic energy, volume error), so BASELINE.md can state the
greedy-vs-sequential equivalence with numbers instead of hand-waving.

Runs on CPU (forces the platform); ~2 min.  Usage:
    python scripts/gs_order_divergence.py [frames=30]
"""
import json
import sys

import numpy as np


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tetsim_tpu as ts
    from tetsim_tpu.solvers import get_engine
    from tetsim_tpu.solvers.golden import GoldenSolver

    mesh = ts.load_dragon()
    params = ts.default_cpu_params()
    controls = ts.Controls.none()

    runs = {}
    for coloring in ("ordered", "greedy"):
        arr = ts.build_arrays(mesh, coloring=coloring)
        step = jax.jit(get_engine("neohookean").step_frame)
        state = ts.init_state(mesh)
        traj = []
        for _ in range(frames):
            state, _ = step(state, arr, params, controls)
            traj.append(np.asarray(state.pos))
        runs[coloring] = traj

    g = GoldenSolver(mesh)
    dt_sub = float(params.dt)
    nsub = int(params.num_substeps)
    gold = []
    for f in range(frames):
        for _ in range(nsub):
            g.substep(dt_sub)
        gold.append(g.pos.copy())
        print(f"golden frame {f+1}/{frames}", file=sys.stderr, flush=True)

    def ke(pos_prev, pos, dt):
        v = (pos - pos_prev) / dt
        return float(np.sum(v * v))

    rows = []
    for f in range(frames):
        row = {"frame": f + 1}
        for name in ("ordered", "greedy"):
            d = np.abs(runs[name][f] - gold[f]).max()
            row[f"max_dev_{name}"] = float(d)
        # displacement field magnitude for scale
        row["disp_scale"] = float(
            np.abs(gold[f] - np.asarray(mesh.verts)).max()
        )
        rows.append(row)
    for r in rows[:5] + rows[-3:]:
        print(json.dumps(r))

    # physical statistics over the whole run (settled behavior)
    stats = {}
    dt = float(params.dt)
    for name in ("ordered", "greedy"):
        t = runs[name]
        kes = [ke(t[i - 1], t[i], dt) for i in range(1, frames)]
        stats[name] = {
            "final_min_y": float(t[-1][:, 1].min()),
            "final_max_y": float(t[-1][:, 1].max()),
            "mean_ke": float(np.mean(kes)),
            "final_centroid": [float(x) for x in t[-1].mean(axis=0)],
        }
    gk = [ke(gold[i - 1], gold[i], dt) for i in range(1, frames)]
    stats["golden"] = {
        "final_min_y": float(gold[-1][:, 1].min()),
        "final_max_y": float(gold[-1][:, 1].max()),
        "mean_ke": float(np.mean(gk)),
        "final_centroid": [float(x) for x in gold[-1].mean(axis=0)],
    }
    print(json.dumps({"stats": stats}, indent=1))


if __name__ == "__main__":
    main()
