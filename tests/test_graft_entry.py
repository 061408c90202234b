"""Regression tests for the driver entry points (__graft_entry__.py).

The multi-chip gate failed in rounds 1 and 2 for environment reasons the
hermetic suite never reproduced: the driver calls ``dryrun_multichip``
from a process whose JAX default device/platform is the real accelerator.
These tests simulate that hostile environment as closely as a CPU-only
process can:

  * a non-default device set as ``jax.default_device`` around the call
    (the exact r02 condition — unplaced eager ops must not follow it),
  * the rebind-decision logic forced through the "default platform is not
    CPU" branch.
"""
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402


def test_dryrun_with_hostile_default_device():
    """r02 regression: the driver process's default device is NOT the CPU
    mesh's device 0.  Every unplaced eager op inside the dryrun used to
    follow it (to the TPU, which died); the dryrun must pin them itself."""
    hostile = jax.devices()[3]
    with jax.default_device(hostile):
        ge.dryrun_multichip(8)


def test_dryrun_smoke():
    ge.dryrun_multichip(8)


def test_needs_rebind_logic():
    class FakeJaxTPU:
        @staticmethod
        def default_backend():
            return "tpu"

    class FakeJaxCPU:
        @staticmethod
        def default_backend():
            return "cpu"

    class FakeJaxBroken:
        @staticmethod
        def default_backend():
            raise RuntimeError("backend init failed")

    assert ge._needs_rebind(FakeJaxTPU())
    assert not ge._needs_rebind(FakeJaxCPU())
    assert ge._needs_rebind(FakeJaxBroken())


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out_state, _diag = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out_state.pos)).all()
