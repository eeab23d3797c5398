"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the axon TPU backend and pins
jax_platforms, so env vars alone don't stick; we must both set XLA_FLAGS
before jax import *and* jax.config.update afterwards (before any backend
initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# f32 matmuls at full precision on every backend: golden tests compare at 1e-4.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "regression: pinned-metric regression tests (test_regression.py)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
