"""Hardware test lane: runs on the real TPU chip (VERDICT r1 #3).

Kept OUTSIDE tests/ because tests/conftest.py forces the 8-virtual-device
CPU platform for hermeticity; this suite wants the opposite.  Run with:

    python -m pytest tests_tpu/ -q          # skips itself off-TPU

Everything here shares one process (one TPU client at a time — the relay
on this host wedges under concurrent clients), and no test SIGKILLs or
forks JAX work.
"""
import threading

import numpy as np
import pytest

import jax


def _probe_platform(timeout_s: float = 90.0) -> str:
    """Bounded-wait device probe: on this host a wedged relay makes even
    jax.devices() hang indefinitely in fresh processes (BENCHNOTES), which
    used to hang COLLECTION; a hung probe now skips the lane instead."""
    out = {}

    def probe():
        try:
            out["platform"] = jax.devices()[0].platform
        except Exception:
            out["platform"] = "none"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return out.get("platform", "wedged-relay")


def pytest_collection_modifyitems(config, items):
    platform = _probe_platform()
    if platform != "tpu":
        skip = pytest.mark.skip(reason=f"needs a TPU device (got {platform})")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def dragon():
    import tetsim_tpu as ts

    return ts.load_dragon()
