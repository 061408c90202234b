"""Native (C++) mesh-preprocessing kernels, loaded over ctypes.

The shared library is compiled from ``coloring.cpp`` on first use (cached
next to the source); if no C++ toolchain is available the callers in
``mesh.py`` fall back to the pure-Python implementations, so the framework
never hard-requires the native path — it is a >100x speedup for million-tet
meshes, not a correctness dependency.
"""
from __future__ import annotations

import ctypes
import os
import platform
import subprocess
import sysconfig
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "coloring.cpp")
# The cache name carries the machine arch + a hash of the CPU feature
# flags: the build uses -march=native, so a .so copied to a different CPU
# (shared image / NFS home / heterogeneous fleet) must not be picked up —
# it would SIGILL instead of falling back (ADVICE r1).
def _cpu_tag() -> str:
    tag = platform.machine().lower()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    import hashlib

                    h = hashlib.sha1(
                        " ".join(sorted(line.split(":", 1)[1].split())).encode()
                    ).hexdigest()[:8]
                    return f"{tag}_{h}"
    except OSError:
        pass
    return tag


_LIB = os.path.join(_HERE, f"_libtetsim_native_{_cpu_tag()}.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        needs_build = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if needs_build and not _compile():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.level_schedule.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
        lib.level_schedule.restype = ctypes.c_int
        lib.greedy_color.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
        lib.greedy_color.restype = ctypes.c_int
        lib.color_slots.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, i64p
        ]
        lib.color_slots.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def level_schedule(tets: np.ndarray, n_particles: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int32)
    out = np.empty(tets.shape[0], np.int32)
    lib.level_schedule(tets, tets.shape[0], n_particles, out)
    return out


def greedy_color(tets: np.ndarray, n_particles: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int32)
    out = np.empty(tets.shape[0], np.int32)
    lib.greedy_color(tets, tets.shape[0], n_particles, out)
    return out


def color_slots(colors: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    colors = np.ascontiguousarray(colors, np.int32)
    m = colors.shape[0]
    if m == 0:
        return np.zeros((0, 0), np.int32)
    num_colors = int(colors.max()) + 1
    cmax_cap = int(np.bincount(colors, minlength=num_colors).max())
    buf = np.empty(num_colors * cmax_cap, np.int32)
    cmax = np.zeros(1, np.int64)
    l = lib.color_slots(colors, m, num_colors, cmax_cap, buf, cmax)
    if l < 0:
        return None
    return buf[: l * cmax[0]].reshape(l, int(cmax[0]))
