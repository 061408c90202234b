"""Solver backends.

Two interchangeable constraint engines behind one substep API, mirroring the
reference's two-backend structure (SURVEY.md §1 L2):

  * ``neohookean`` — stable Neo-Hookean XPBD, graph-colored Gauss-Seidel
    (the Softbody.js path; exact-order parity via level scheduling)
  * ``polar``      — Müller robust-polar-decomposition shape matching,
    Jacobi iteration (the SoftbodyGPU.js path; embarrassingly parallel)
  * ``polar_grid`` — same math specialized to structured grid_mesh boxes:
    gather/scatter replaced by an 8-slab stencil (the TPU scale path)
  * ``golden``     — sequential NumPy oracle for parity tests
"""
from . import common, golden, neohookean, polar, polar_grid  # noqa: F401

ENGINES = {
    "neohookean": neohookean,
    "polar": polar,
    "polar_grid": polar_grid,
}


def get_engine(name: str):
    try:
        return ENGINES[name]
    except KeyError:
        raise ValueError(f"unknown engine {name!r}; available: {sorted(ENGINES)}")
