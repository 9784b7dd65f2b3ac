"""Test config: force JAX onto CPU with 8 virtual devices so data-parallel
sharding, pmean, and eval gather are testable without TPU hardware
(SURVEY.md §4). Must run before the first `import jax` in any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container pins JAX_PLATFORMS=axon via sitecustomize; the env var alone
# is not enough, the config must be overridden after import.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow end-to-end tests")
