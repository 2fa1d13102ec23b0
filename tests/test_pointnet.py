import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.models.pointnet import PointNetSegBackbone
from tests.test_model_forward import SMALL_CFG, _batch

import pytest

# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def test_pointnet_backbone_shapes(rng):
    model = PointNetSegBackbone(fea_dim=16)
    pts = jnp.asarray(rng.rand(2, 128, 6).astype(np.float32))
    mask = jnp.ones((2, 128), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    out = model.apply(variables, pts, mask, train=False)
    assert out.shape == (2, 128, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pointnet_mask_respected(rng):
    model = PointNetSegBackbone(fea_dim=8)
    pts = np.asarray(rng.rand(1, 64, 6), np.float32)
    mask = np.arange(64) < 48
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask)[None], train=False
    )
    out1 = model.apply(variables, jnp.asarray(pts), jnp.asarray(mask)[None], train=False)
    pts2 = pts.copy()
    pts2[0, 48:] = 99.0  # garbage in masked-out points
    out2 = model.apply(variables, jnp.asarray(pts2), jnp.asarray(mask)[None], train=False)
    np.testing.assert_allclose(
        np.asarray(out1)[0, :48], np.asarray(out2)[0, :48], rtol=1e-4, atol=1e-5
    )
    assert np.all(np.asarray(out1)[0, 48:] == 0)


def test_gapartnet_with_pointnet_backbone(rng):
    from gapartnet_tpu.models.gapartnet import GAPartNet

    cfg = dataclasses.replace(SMALL_CFG, backbone_type="PointNet")
    model = GAPartNet(cfg)
    batch = _batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "proposal_jitter": jax.random.PRNGKey(1)},
        batch, train=False, do_cluster=True, do_score=True, do_npcs=True,
    )
    out = model.apply(
        variables, batch, train=False, do_cluster=True, do_score=True, do_npcs=True
    )
    assert out.sem_logits.shape == (2, 512, 10)
    assert out.score_preds is not None
    assert np.isfinite(float(out.total_loss))
