"""Golden sequential reference solver (NumPy, host-side).

A fresh, readable implementation of the reference CPU solver's exact
semantics (Softbody.js:91-240) used as the numeric oracle for parity tests —
the reference itself ships no tests (SURVEY.md §4), so this *is* the test
strategy: strict per-tet sequential Gauss-Seidel, two constraints per tet,
volume constraint reading the deviatoric constraint's in-place updates.

``dtype=np.float32`` stores and computes in f32 (closest to the TPU path);
``compute_dtype=np.float64`` reproduces JS semantics (f64 arithmetic, f32
storage).  Deliberately unoptimized; O(M) python loop per substep.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..mesh import TetMesh, rest_state


@dataclasses.dataclass
class GoldenParams:
    gravity: float = -9.81
    friction: float = 1000.0
    dev_compliance: float = 1.0 / 100000.0
    vol_compliance: float = 0.0
    world_min: tuple = (-2.5, -1.0, -2.5)
    world_max: tuple = (2.5, 10.0, 2.5)


class GoldenSolver:
    def __init__(self, mesh: TetMesh, density: float = 1000.0,
                 params: GoldenParams | None = None, dtype=np.float32):
        self.params = params or GoldenParams()
        self.dtype = dtype
        ir, irv, vol, im, _ = rest_state(mesh, density, dtype=dtype)
        self.tets = mesh.tets
        self.inv_rest_pose = ir
        self.inv_rest_volume = irv
        self.inv_mass = im
        self.pos = mesh.verts.astype(dtype).copy()
        self.prev_pos = self.pos.copy()
        self.vel = np.zeros_like(self.pos)
        self.num_particles = mesh.num_particles
        self.num_tets = mesh.num_tets
        self.grab_id = -1
        self.grab_pos = np.zeros(3, dtype)
        self.vol_error = 0.0

    # -- one sequential substep ------------------------------------------
    def substep(self, dt: float):
        p = self.params
        dt = self.dtype(dt)
        # predict
        self.vel[:, 1] += self.dtype(p.gravity) * dt
        self.prev_pos[:] = self.pos
        self.pos += self.vel * dt

        # sequential Gauss-Seidel over tets
        self.vol_error = 0.0
        for e in range(self.num_tets):
            self._solve_tet(e, dt)
        self.vol_error /= self.num_tets

        # bounds + ground friction
        np.clip(self.pos, np.asarray(p.world_min, self.dtype),
                np.asarray(p.world_max, self.dtype), out=self.pos)
        below = self.pos[:, 1] < 0.0
        self.pos[below, 1] = 0.0
        k = min(1.0, float(dt) * p.friction)
        f = self.prev_pos[below] - self.pos[below]
        self.pos[below, 0] += (f[:, 0] * self.dtype(k)).astype(self.dtype)
        self.pos[below, 2] += (f[:, 2] * self.dtype(k)).astype(self.dtype)

        # grab override
        if self.grab_id >= 0:
            self.pos[self.grab_id] = self.grab_pos

        # velocity update
        self.vel[:] = (self.pos - self.prev_pos) / dt

    def _solve_tet(self, e: int, dt):
        p = self.params
        ids = self.tets[e]
        ir = self.inv_rest_pose[e]

        # deviatoric: C = ||F||_F
        pm = self.pos[ids]
        d = np.stack([pm[1] - pm[0], pm[2] - pm[0], pm[3] - pm[0]], axis=-1)
        f = d @ ir
        r_s = np.sqrt((f * f).sum())
        if r_s > 0.0:
            grads123 = (f @ ir.T) / r_s  # columns are gradients for corners 1..3
            self._apply(e, ids, grads123, r_s, p.dev_compliance, dt)

        # hydrostatic: C = det F - 1 - volC/devC  (on updated positions)
        pm = self.pos[ids]
        d = np.stack([pm[1] - pm[0], pm[2] - pm[0], pm[3] - pm[0]], axis=-1)
        f = d @ ir
        df = np.stack(
            [np.cross(f[:, 1], f[:, 2]), np.cross(f[:, 2], f[:, 0]), np.cross(f[:, 0], f[:, 1])],
            axis=-1,
        )
        det = float(f[:, 0] @ df[:, 0])
        c = det - 1.0 - p.vol_compliance / p.dev_compliance
        self.vol_error += det - 1.0
        grads123 = df @ ir.T
        self._apply(e, ids, grads123, c, p.vol_compliance, dt)

    def _apply(self, e, ids, grads123, c, compliance, dt):
        if c == 0.0:
            return
        g = np.empty((4, 3), self.dtype)
        g[1:] = grads123.T
        g[0] = -g[1:].sum(axis=0)
        w = ((g * g).sum(axis=1) * self.inv_mass[ids]).sum()
        if w == 0.0:
            return
        alpha = compliance / float(dt) / float(dt) * self.inv_rest_volume[e]
        dlam = self.dtype(-c / (w + alpha))
        self.pos[ids] += (dlam * self.inv_mass[ids])[:, None] * g

    # -- interaction API (Softbody.js:279-298) ----------------------------
    def start_grab(self, point):
        d2 = ((self.pos - np.asarray(point, self.dtype)) ** 2).sum(axis=1)
        self.grab_id = int(d2.argmin())
        self.grab_pos = np.asarray(point, self.dtype).copy()

    def move_grabbed(self, point):
        self.grab_pos = np.asarray(point, self.dtype).copy()

    def end_grab(self):
        self.grab_id = -1
