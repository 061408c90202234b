"""Test config: force the CPU backend with 8 virtual devices so sharding
tests run anywhere (SURVEY.md §4 multi-chip test strategy).

Must run before any JAX backend initialization.  A plain JAX_PLATFORMS env
var is not enough on hosts whose sitecustomize registers an accelerator
plugin and rewrites the platform config — override via jax.config too.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: do NOT set --xla_backend_optimization_level=0 suite-wide: it cuts
# the fused-kernel interpret compiles ~40% but slows runtime-heavy tests
# (golden-parity frame loops) by far more — measured net 3x SLOWER suite.
# test_nh_stencil.py applies O0 per-compile via lower().compile() instead.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def dragon():
    import tetsim_tpu as ts

    return ts.load_dragon()


@pytest.fixture(scope="session")
def small_mesh():
    """A 3x3x3-cube block (162 tets) — fast for golden-parity loops."""
    import tetsim_tpu as ts

    mesh = ts.grid_mesh(3, 3, 3, cell=0.25, origin=(-0.375, 0.5, -0.375))
    return mesh


def assert_finite(x, name="array"):
    assert np.isfinite(np.asarray(x)).all(), f"{name} has non-finite values"
