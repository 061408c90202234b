"""Pallas TPU kernels — the rebuild's native device-kernel layer
(SURVEY.md §7.1 `tetsim/kernels`, replacing the reference's embedded GLSL
passes, SoftbodyGPU.js §2.4).
"""
from .schedule import VmemSchedule, build_vmem_schedule  # noqa: F401
from .gs_fused import FusedGSBody  # noqa: F401
from .polar_fused import FusedPolarBody, PolarSchedule, build_polar_schedule  # noqa: F401
