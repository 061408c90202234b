"""Hardware test lane: runs on the real TPU chip (VERDICT r1 #3).

Kept OUTSIDE tests/ because tests/conftest.py forces the 8-virtual-device
CPU platform for hermeticity; this suite wants the opposite.  Run with:

    python -m pytest tests_tpu/ -q          # skips itself off-TPU

Everything here shares one process (one TPU client at a time — the relay
on this host wedges under concurrent clients), and no test SIGKILLs or
forks JAX work.
"""
import numpy as np
import pytest

import jax


def pytest_collection_modifyitems(config, items):
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "none"
    if platform != "tpu":
        skip = pytest.mark.skip(reason=f"needs a TPU device (got {platform})")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def dragon():
    import tetsim_tpu as ts

    return ts.load_dragon()
