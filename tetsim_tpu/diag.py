"""Diagnostics & observability — first-class versions of the reference's
ad-hoc signals (volError running average Softbody.js:163,206-209; FPS meter
World.js:95-97; debug texture plane SoftbodyGPU.js:383-390)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import TetArrays
from .state import SimState
from .utils import mat3


@jax.jit
def volume_error(state: SimState, arr: TetArrays):
    """Mean (det F - 1) over tets — the reference's volError diagnostic."""
    p = state.pos[arr.tets]
    d = jnp.stack(
        [p[..., 1, :] - p[..., 0, :], p[..., 2, :] - p[..., 0, :], p[..., 3, :] - p[..., 0, :]],
        axis=-1,
    )
    f = mat3.matmul(d, arr.inv_rest_pose)
    return jnp.mean(mat3.det(f) - 1.0)


@jax.jit
def kinetic_energy(state: SimState, arr: TetArrays):
    """0.5 * sum m |v|^2 (pinned particles with inv_mass 0 excluded)."""
    m = jnp.where(arr.inv_mass > 0, 1.0 / jnp.maximum(arr.inv_mass, 1e-30), 0.0)
    return 0.5 * jnp.sum(m * jnp.sum(state.vel**2, axis=-1))


@jax.jit
def max_speed(state: SimState):
    return jnp.max(jnp.linalg.norm(state.vel, axis=-1))


@jax.jit
def min_height(state: SimState):
    return jnp.min(state.pos[..., 1])


class trace:
    """Context manager around jax.profiler for kernel-level timelines —
    the deep version of the reference's FPS meter (World.js:95-97):

        with diag.trace("/tmp/tetsim-trace"):
            world.step(30)

    Open the resulting directory with TensorBoard's profile plugin or
    Perfetto."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


class Timer:
    """Rolling substeps/sec meter (the reference's Stats panel analogue)."""

    def __init__(self):
        import time

        self._time = time.perf_counter
        self.reset()

    def reset(self):
        self._t0 = self._time()
        self._substeps = 0

    def tick(self, num_substeps: int):
        self._substeps += num_substeps

    @property
    def substeps_per_sec(self) -> float:
        dt = self._time() - self._t0
        return self._substeps / dt if dt > 0 else 0.0


@jax.jit
def _grid_volume_error(state: SimState, garr):
    """volError for the stencil engine's GridArrays (no tets array —
    reconstruct per-type corner views from the static stencil structure).

    Runs jitted on device: at the 1M-tet config the previous host-side
    float64 pass copied the full position grid and took seconds per call.
    Precision note: determinants and the ~6M-term sum run in f32 (TPU has
    no native f64); XLA reduces with a tree, so accumulation error is
    O(log n) ulps, adequate for a diagnostic.  Tests that threshold this
    value keep tolerances >= 1e-1 (see tests/test_polar_grid.py) — do not
    tighten them to f64-oracle levels."""
    nx, ny, nz = garr.dims
    gy, gz = ny + 1, nz + 1
    pos = state.pos.reshape(nx + 1, gy, gz, 3)
    total = jnp.float32(0.0)
    m = 6 * nx * ny * nz
    for t in range(6):
        offs = [garr.slab_offsets[s] for s in garr.corner_slab[t]]
        p = [
            pos[dx : dx + nx, dy : dy + ny, dz : dz + nz].reshape(-1, 3)
            for (dx, dy, dz) in offs
        ]
        d = jnp.stack([p[1] - p[0], p[2] - p[0], p[3] - p[0]], axis=-1)
        vol = jnp.linalg.det(d) / 6.0
        total = total + jnp.sum(vol / garr.rest_volume - 1.0)
    return total / m


def summarize(state: SimState, arr, frame_diag=None) -> dict:
    from .solvers.polar_grid import GridArrays
    from .solvers.neohookean_grid import NHGridArrays, _OFFSETS
    from .kernels.polar_pieces import PiecesArrays

    if isinstance(arr, PiecesArrays):
        # pieces carry no global tet table; volume error is not computed
        # (same omission policy as the fused stencil kernel's diag)
        im = np.asarray(arr.inv_mass)
        mass = np.where(im > 0, 1.0 / np.maximum(im, 1e-30), 0.0)
        vel = np.asarray(state.vel)
        out = {
            "kinetic_energy": float(
                0.5 * np.sum(mass * np.sum(vel**2, axis=-1))
            ),
            "max_speed": float(max_speed(state)),
            "min_height": float(min_height(state)),
            "nan": bool(jnp.isnan(state.pos).any()),
        }
        if frame_diag is not None:
            sve = float(np.asarray(frame_diag)[-1])
            if np.isfinite(sve):
                out["solver_vol_error"] = sve
        return out

    if isinstance(arr, NHGridArrays):
        # same stencil-structured volume error as GridArrays — adapt the
        # static fields (corner order/rest volume are decoded identically)
        arr = GridArrays(
            dims=arr.dims,
            corner_slab=arr.corner_slab,
            slab_offsets=_OFFSETS,
            rest_centered=None,
            rest_volume=arr.rest_volume,
            inv_mass=arr.inv_mass,
            den=None,
        )
    if isinstance(arr, GridArrays):
        im = np.asarray(arr.inv_mass).reshape(-1)
        mass = np.where(im > 0, 1.0 / np.maximum(im, 1e-30), 0.0)
        vel = np.asarray(state.vel)
        out = {
            "volume_error": float(_grid_volume_error(state, arr)),
            "kinetic_energy": float(
                0.5 * np.sum(mass * np.sum(vel**2, axis=-1))
            ),
            "max_speed": float(max_speed(state)),
            "min_height": float(min_height(state)),
            "nan": bool(jnp.isnan(state.pos).any()),
        }
    else:
        out = {
            "volume_error": float(volume_error(state, arr)),
            "kinetic_energy": float(kinetic_energy(state, arr)),
            "max_speed": float(max_speed(state)),
            "min_height": float(min_height(state)),
            "nan": bool(jnp.isnan(state.pos).any()),
        }
    if frame_diag is not None:
        sve = float(np.asarray(frame_diag)[-1])
        # Engines that don't measure per-substep volume error report NaN
        # (e.g. the fused stencil kernel); omit rather than show a bogus 0.
        if np.isfinite(sve):
            out["solver_vol_error"] = sve
    return out
