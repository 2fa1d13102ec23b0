"""Pallas subm-conv kernel vs the XLA reference implementation.

Runs in Pallas interpret mode on CPU; the numerics are identical code paths
on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapartnet_tpu.ops.sparse_conv import build_subm_rulebook, subm_conv_apply
from tests.test_sparse_conv import _make_grid


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_pallas_matches_xla_forward(rng):
    from gapartnet_tpu.ops.pallas_conv import subm_conv_pallas

    cap, na = 512, 300
    keys1, _ = _make_grid(rng, na, cap, grid=10)
    keys2, _ = _make_grid(rng, 200, cap, grid=10)
    keys = jnp.asarray(np.stack([keys1, keys2]))
    nbr = jax.vmap(lambda k: build_subm_rulebook(k, 3))(keys)
    cin, cout = 8, 16
    feats = jnp.asarray(rng.rand(2, cap, cin).astype(np.float32))
    w = jnp.asarray(rng.rand(27, cin, cout).astype(np.float32) - 0.5)

    want = subm_conv_apply(feats, nbr, w)
    got = subm_conv_pallas(feats, nbr, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_gradients_match_xla(rng):
    from gapartnet_tpu.ops.pallas_conv import subm_conv_pallas

    cap, na = 256, 150
    keys1, _ = _make_grid(rng, na, cap, grid=8)
    keys = jnp.asarray(keys1)[None]
    nbr = jax.vmap(lambda k: build_subm_rulebook(k, 3))(keys)
    cin, cout = 4, 6
    feats = jnp.asarray(rng.rand(1, cap, cin).astype(np.float32))
    w = jnp.asarray(rng.rand(27, cin, cout).astype(np.float32) - 0.5)
    cot = jnp.asarray(rng.rand(1, cap, cout).astype(np.float32))

    def loss_xla(f, ww):
        return jnp.sum(subm_conv_apply(f, nbr, ww) * cot)

    def loss_pl(f, ww):
        return jnp.sum(subm_conv_pallas(f, nbr, ww) * cot)

    gx_f, gx_w = jax.grad(loss_xla, argnums=(0, 1))(feats, w)
    gp_f, gp_w = jax.grad(loss_pl, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gx_f), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_w), np.asarray(gx_w), rtol=1e-4, atol=1e-4)
