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
# Persistent compile cache: whole-model slow tests recompile the same graphs
# every session otherwise (18+ min on this 1-core box); bench.py and
# __graft_entry__.py already share this directory.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
