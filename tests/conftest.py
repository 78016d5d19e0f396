"""Test env: force CPU backend with 8 virtual devices so the full pjit/mesh
path is exercised without TPU hardware (SURVEY.md §4 test-strategy note).

The sandbox's sitecustomize pins JAX to the tunneled 'axon' TPU platform and
ignores the JAX_PLATFORMS env var, so we override via jax.config (must happen
before the backend is first initialized — conftest import time is early enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
