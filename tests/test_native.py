"""Native C++ preprocessing kernels: availability + exact parity with the
pure-Python reference implementations in mesh.py."""
import numpy as np
import pytest

from tetsim_tpu import native
from tetsim_tpu.mesh import level_schedule, greedy_color, color_slots


def _force_python(monkeypatch):
    """Disable the native library so mesh.py uses its Python fallbacks."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


def test_native_available():
    assert native.available(), "g++ toolchain expected in this environment"


def test_level_schedule_parity(dragon, monkeypatch):
    nat = native.level_schedule(dragon.tets, dragon.num_particles)
    _force_python(monkeypatch)
    py = level_schedule(dragon.tets, dragon.num_particles)
    np.testing.assert_array_equal(py, nat)


def test_greedy_color_parity(dragon, monkeypatch):
    nat = native.greedy_color(dragon.tets, dragon.num_particles)
    _force_python(monkeypatch)
    py = greedy_color(dragon.tets, dragon.num_particles)
    np.testing.assert_array_equal(py, nat)


def test_color_slots_parity(dragon, monkeypatch):
    colors = greedy_color(dragon.tets, dragon.num_particles)
    nat = native.color_slots(colors)
    _force_python(monkeypatch)
    py = color_slots(colors)
    np.testing.assert_array_equal(py, nat)


def test_greedy_color_many_colors():
    """>64 colors exercises the multi-word bitmask path: a star mesh where
    every tet shares vertex 0 forces one color per tet."""
    k = 150
    tets = np.stack(
        [np.zeros(k, np.int32)]
        + [np.arange(k, dtype=np.int32) * 3 + 1 + j for j in range(3)],
        axis=1,
    )
    nat = native.greedy_color(tets, int(tets.max()) + 1)
    assert nat is not None
    assert sorted(nat.tolist()) == list(range(k))
