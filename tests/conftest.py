"""Test configuration: force an 8-device virtual CPU mesh.

The session environment pre-imports jax (site hook) with a TPU platform pinned
via JAX_PLATFORMS, so plain env manipulation here is too late; jax.config.update
before first backend use still works.  All kernel tests run against NumPy
oracles on CPU; multi-device tests use the virtual 8-device mesh (mirrors the
test strategy the reference lacks, SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
