import time

import jax.numpy as jnp
import numpy as np
import pytest

from gapartnet_tpu.utils import invariants
from gapartnet_tpu.utils.profiling import StepTimer, maybe_trace


def test_step_timer_accumulates():
    t = StepTimer()
    with t.time("a"):
        time.sleep(0.01)
    with t.time("a"):
        time.sleep(0.01)
    with t.time("b"):
        pass
    s = t.summary()
    assert s["a"] >= 5.0  # ms
    assert t.counts["a"] == 2 and t.counts["b"] == 1


def test_maybe_trace_noop():
    with maybe_trace(None):
        x = 1
    assert x == 1


def test_invariants_host_mode():
    with invariants.check_mode("host"):
        invariants.check(jnp.asarray(True), "fine")
        with pytest.raises(AssertionError, match="boom"):
            invariants.check(jnp.asarray(False), "boom")
    # off mode never raises
    with invariants.check_mode("off"):
        invariants.check(jnp.asarray(False), "ignored")


def test_invariants_checked_jit():
    import jax

    def f(x):
        invariants.check(jnp.all(x >= 0), "negative input")
        return x * 2

    with invariants.check_mode("jit"):
        wrapped = invariants.checked_jit(f)
        np.testing.assert_array_equal(
            np.asarray(wrapped(jnp.asarray([1.0, 2.0]))), [2.0, 4.0]
        )
        with pytest.raises(Exception, match="negative"):
            wrapped(jnp.asarray([-1.0]))


def test_check_point_voxel_ids():
    with invariants.check_mode("host"):
        invariants.check_point_voxel_ids(
            jnp.asarray([0, 1, -1]), jnp.asarray([True, True, False])
        )
        with pytest.raises(AssertionError):
            invariants.check_point_voxel_ids(
                jnp.asarray([0, -1]), jnp.asarray([True, True])
            )
