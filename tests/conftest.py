"""Test environment: force CPU with 8 virtual devices BEFORE jax import.

This is the TPU-world analog of "test multi-node without a cluster"
(SURVEY.md §4): all multi-device sharding tests run on a virtual CPU mesh.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize (axon TPU tunnel) force-overrides
# jax_platforms to "axon,cpu" in every interpreter; pin it back to cpu
# before any backend is materialized so tests run on the virtual 8-device
# CPU mesh. (Prefer `tools/pytest.sh`, which skips the sitecustomize hook
# entirely and starts much faster.)
import jax  # noqa: E402

if "axon" in (jax.config.jax_platforms or ""):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running e2e tests (minutes); always part of "
        "the default run, deselectable with -m 'not slow'")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
