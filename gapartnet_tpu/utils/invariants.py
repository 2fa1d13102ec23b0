"""Runtime invariant checks (replacing the reference's pdb traps).

The reference drops into pdb on invariant violations (model.py:328-330,
dataset/gapartnet.py:70,196, structure/point_cloud.py:130).  Here the same
invariants are checkable in three modes:
  * "off":   no checks (production)
  * "host":  host-side assertions on fetched values (debug runs)
  * "jit":   jax.experimental.checkify checks inside jitted code

Call sites use `check(pred, msg)` which is routed per the active mode.
"""

import contextlib
import os
from typing import Optional

import jax
import jax.numpy as jnp

_MODE = os.environ.get("GAPARTNET_CHECKS", "off")


def set_mode(mode: str):
    global _MODE
    assert mode in ("off", "host", "jit")
    _MODE = mode


@contextlib.contextmanager
def check_mode(mode: str):
    global _MODE
    old = _MODE
    set_mode(mode)
    try:
        yield
    finally:
        _MODE = old


def check(pred, msg: str, **fmt):
    """pred: scalar bool (traced ok in 'jit' mode)."""
    if _MODE == "off":
        return
    if _MODE == "jit":
        from jax.experimental import checkify

        checkify.check(pred, msg, **fmt)
    else:
        import numpy as np

        value = np.asarray(pred)
        assert bool(value), msg.format(**fmt) if fmt else msg


def check_traced(pred, msg: str, **fmt):
    """Like check(), but only active in 'jit' mode — for call sites that live
    inside always-jitted code, where a host-mode np.asarray would fail on the
    tracer.  Host-mode users should assert on fetched outputs instead."""
    if _MODE != "jit":
        return
    check(pred, msg, **fmt)


def check_point_voxel_ids(pc_voxel_id: jnp.ndarray, point_mask: jnp.ndarray):
    """Every valid point maps to a voxel (gapartnet.py:196 assert)."""
    ok = jnp.all(jnp.where(point_mask, pc_voxel_id >= 0, True))
    check(ok, "valid point without voxel id")


def check_proposal_consistency(entry_proposal, entry_mask, num_proposals):
    ok1 = jnp.all(jnp.where(entry_mask, entry_proposal >= 0, True))
    ok2 = jnp.all(jnp.where(entry_mask, entry_proposal < num_proposals, True))
    check(ok1 & ok2, "proposal ids out of range")


def checked_jit(fn, *, errors=None):
    """jit a function under checkify so 'jit'-mode checks surface as errors."""
    from jax.experimental import checkify

    err = errors or checkify.user_checks
    cfn = checkify.checkify(fn, errors=err)

    def wrapper(*a, **k):
        e, out = cfn(*a, **k)
        e.throw()
        return out

    return wrapper
