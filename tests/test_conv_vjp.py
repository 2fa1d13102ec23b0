"""Custom-VJP submanifold conv vs plain autodiff of the raw forward."""

import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops.sparse_conv import (
    _subm_conv_forward,
    build_subm_rulebook,
    subm_conv_apply,
)
from tests.test_sparse_conv import _make_grid


def test_custom_vjp_matches_autodiff(rng):
    cap = 256
    keys1, _ = _make_grid(rng, 150, cap, grid=8)
    keys2, _ = _make_grid(rng, 100, cap, grid=8)
    keys = jnp.asarray(np.stack([keys1, keys2]))
    nbr = jax.vmap(lambda k: build_subm_rulebook(k, 3))(keys)
    cin, cout = 6, 5
    feats = jnp.asarray(rng.rand(2, cap, cin).astype(np.float32))
    w = jnp.asarray(rng.rand(27, cin, cout).astype(np.float32) - 0.5)
    cot = jnp.asarray(rng.rand(2, cap, cout).astype(np.float32))

    def loss_custom(f, ww):
        return jnp.sum(subm_conv_apply(f, nbr, ww) * cot)

    def loss_raw(f, ww):
        return jnp.sum(_subm_conv_forward(f, nbr, ww) * cot)

    gc_f, gc_w = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
    gr_f, gr_w = jax.grad(loss_raw, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gr_f), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_w), np.asarray(gr_w), rtol=1e-4, atol=1e-5)


def test_save_gather_vjp_matches_regather(rng, monkeypatch):
    """GAPARTNET_SUBM_SAVE_GATHER=1 must change memory strategy only: value
    and both grads bit-match the default regather VJP."""
    from gapartnet_tpu.ops.sparse_conv import _subm_conv, _subm_conv_sg

    cap = 128
    keys1, _ = _make_grid(rng, 90, cap, grid=8)
    keys2, _ = _make_grid(rng, 60, cap, grid=8)
    keys = jnp.asarray(np.stack([keys1, keys2]))
    nbr = jax.vmap(lambda k: build_subm_rulebook(k, 3))(keys)
    cin, cout = 6, 5
    feats = jnp.asarray(rng.rand(2, cap, cin).astype(np.float32))
    w = jnp.asarray(rng.rand(27, cin, cout).astype(np.float32) - 0.5)
    cot = jnp.asarray(rng.rand(2, cap, cout).astype(np.float32))

    def loss(fn, f, ww):
        return jnp.sum(fn(f, nbr, ww) * cot)

    v0, (df0, dw0) = jax.value_and_grad(
        lambda f, ww: loss(_subm_conv, f, ww), argnums=(0, 1))(feats, w)
    v1, (df1, dw1) = jax.value_and_grad(
        lambda f, ww: loss(_subm_conv_sg, f, ww), argnums=(0, 1))(feats, w)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(df0), np.asarray(df1))
    np.testing.assert_array_equal(np.asarray(dw0), np.asarray(dw1))

    # the env flag routes k=27 subm convs through the save-gather VJP
    monkeypatch.setenv("GAPARTNET_SUBM_SAVE_GATHER", "1")
    v2 = subm_conv_apply(feats, nbr, w)
    np.testing.assert_array_equal(
        np.asarray(v2), np.asarray(_subm_conv_forward(feats, nbr, w)))
