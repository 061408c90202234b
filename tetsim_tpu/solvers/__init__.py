"""Solver backends.

Two interchangeable constraint engines behind one substep API, mirroring the
reference's two-backend structure (SURVEY.md §1 L2):

  * ``neohookean`` — stable Neo-Hookean XPBD, graph-colored Gauss-Seidel
    (the Softbody.js path; exact-order parity via level scheduling)
  * ``polar``      — Müller robust-polar-decomposition shape matching,
    Jacobi iteration (the SoftbodyGPU.js path; embarrassingly parallel)
  * ``polar_grid`` — same math specialized to structured grid_mesh boxes:
    gather/scatter replaced by an 8-slab stencil (the TPU scale path)
  * ``polar_grid_pallas`` — the same stencil substep fused into ONE Pallas
    kernel per substep (kernels/polar_stencil.py) — the device-kernel form
  * ``neohookean_grid`` — Neo-Hookean GS specialized to grid_mesh boxes:
    48-color structured (type x cube-parity) coloring on parity-block
    state — the reference-fidelity physics at the stencil scale path
  * ``neohookean_grid_pallas`` — the same 48-color sweep fused into ONE
    Pallas kernel per substep (kernels/nh_stencil.py)
  * ``polar_pieces`` — polar on ONE large unstructured mesh: RCB pieces
    riding the fused kernel's sublanes (kernels/polar_pieces.py)
  * ``nh_pieces``  — Neo-Hookean GS on ONE large unstructured mesh:
    intra-piece colored GS + cross-piece Jacobi boundary completion
    (kernels/nh_pieces.py)
  * ``golden``     — sequential NumPy oracle for parity tests
"""
from . import (  # noqa: F401
    common, golden, neohookean, neohookean_grid, polar, polar_grid,
)

ENGINES = {
    "neohookean": neohookean,
    "neohookean_grid": neohookean_grid,
    "polar": polar,
    "polar_grid": polar_grid,
}

# Engines that live outside solvers/ (device kernels); imported lazily to
# avoid a package-import cycle (kernels.polar_stencil imports solvers).
_LAZY_ENGINES = {
    "polar_grid_pallas": "tetsim_tpu.kernels.polar_stencil",
    "polar_pieces": "tetsim_tpu.kernels.polar_pieces",
    "neohookean_grid_pallas": "tetsim_tpu.kernels.nh_stencil",
    "nh_pieces": "tetsim_tpu.kernels.nh_pieces",
}


def get_engine(name: str):
    if name in _LAZY_ENGINES:
        import importlib

        mod = importlib.import_module(_LAZY_ENGINES[name])
        ENGINES[name] = mod
        return mod
    try:
        return ENGINES[name]
    except KeyError:
        raise ValueError(
            f"unknown engine {name!r}; available: "
            f"{sorted(set(ENGINES) | set(_LAZY_ENGINES))}"
        )
