"""tetsim_tpu — a TPU-native XPBD tetrahedral-FEM soft-body framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of zalo/TetSim
(reference: /root/reference): stable Neo-Hookean XPBD with graph-colored
Gauss-Seidel, Müller robust-polar-decomposition Jacobi shape matching,
ground/bounds collision with friction, grab constraints, barycentric surface
skinning, multi-body batching, and multi-chip sharding.
"""
from .params import PhysicsParams, default_cpu_params, default_gpu_params
from .state import SimState, Controls, init_state
from .mesh import (
    TetMesh, TetArrays, load_dragon, grid_mesh, masked_grid_mesh,
    ellipsoid_mesh, with_boundary_surface, build_arrays,
    replicate_mesh, load_npz, save_npz, load_tetgen,
)
from .solvers import get_engine

__version__ = "0.3.0"

__all__ = [
    "PhysicsParams",
    "default_cpu_params",
    "default_gpu_params",
    "SimState",
    "Controls",
    "init_state",
    "TetMesh",
    "TetArrays",
    "load_dragon",
    "grid_mesh",
    "masked_grid_mesh",
    "ellipsoid_mesh",
    "with_boundary_surface",
    "build_arrays",
    "replicate_mesh",
    "load_npz",
    "save_npz",
    "load_tetgen",
    "get_engine",
    "World",
]


def __getattr__(name):
    if name == "World":
        from .world import World

        return World
    raise AttributeError(name)
