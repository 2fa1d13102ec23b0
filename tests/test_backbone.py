import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapartnet_tpu.models.backbone import SparseUNet
from gapartnet_tpu.ops.sparse_conv import build_hierarchy
from tests.test_sparse_conv import _make_grid


def _setup(rng, caps=(64, 32, 16), na=(40, 28)):
    keys = []
    for n in na:
        k, _ = _make_grid(rng, n, caps[0])
        keys.append(k)
    keys = jnp.asarray(np.stack(keys))
    nv = jnp.asarray(list(na), jnp.int32)
    h = build_hierarchy(keys, nv, capacities=list(caps))
    return h, nv


@pytest.mark.slow
def test_sparse_unet_forward(rng):
    h, nv = _setup(rng)
    feats = jnp.asarray(rng.rand(2, 64, 6).astype(np.float32))
    model = SparseUNet(channels=(8, 16, 24), block_repeat=2)
    variables = model.init(jax.random.PRNGKey(0), feats, h, train=False)
    out = model.apply(variables, feats, h, train=False)
    assert out.shape == (2, 64, 8)
    assert np.isfinite(np.asarray(out)).all()

    # train mode mutates batch stats
    out2, mutated = model.apply(
        variables, feats, h, train=True, mutable=["batch_stats"]
    )
    assert out2.shape == (2, 64, 8)
    assert "batch_stats" in mutated


def test_padding_does_not_leak(rng):
    h, nv = _setup(rng)
    feats = np.asarray(rng.rand(2, 64, 6), np.float32)
    model = SparseUNet(channels=(8, 16), block_repeat=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), h, train=False)
    out1 = model.apply(variables, jnp.asarray(feats), h, train=False)

    # garbage in the padded voxel slots must not change valid outputs
    feats2 = feats.copy()
    feats2[0, 40:] = 1e6
    feats2[1, 28:] = -1e6
    out2 = model.apply(variables, jnp.asarray(feats2), h, train=False)
    np.testing.assert_allclose(
        np.asarray(out1)[0, :40], np.asarray(out2)[0, :40], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out1)[1, :28], np.asarray(out2)[1, :28], rtol=1e-5, atol=1e-5
    )


def test_without_stem_variant(rng):
    h, nv = _setup(rng)
    feats = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
    model = SparseUNet(channels=(8, 16), block_repeat=2, without_stem=True)
    variables = model.init(jax.random.PRNGKey(0), feats, h, train=False)
    out = model.apply(variables, feats, h, train=False)
    assert out.shape == (2, 64, 8)
    # no stem conv params
    assert "stem_conv" not in variables["params"]
