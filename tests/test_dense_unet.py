"""Dense proposal-UNet path vs the sparse rulebook path.

The dense conv3d implementation (models/dense_unet.py) must be numerically
equivalent to the sparse gather-GEMM implementation and share its parameter
tree, so checkpoints (including converted reference checkpoints) work with
either.  Tolerances are loose-ish because conv reassociation differs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
from gapartnet_tpu.structures import PointCloudBatch
from gapartnet_tpu.data.synthetic import synthetic_batch


# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def _cfg(impl):
    return GAPartNetConfig(
        channels=(8, 16),
        max_points=192,
        max_proposals=8,
        max_instances=6,
        level_capacity_divisors=(1, 2),
        proposal_voxel_capacity=384,  # == 2N so the sparse path never drops
        min_num_points_per_proposal=3,
        ball_query_radius=0.1,
        max_num_points_per_query=8,
        max_num_points_per_query_shift=16,
        score_fullscale=12.0,
        proposal_conv_impl=impl,
    )


def _batch(n, b, max_inst):
    d = synthetic_batch(
        np.random.RandomState(3), batch_size=b, num_points=n,
        num_parts=3, max_instances=max_inst,
    )
    ids = d.pop("pc_ids")
    return PointCloudBatch(**{k: jnp.asarray(v) for k, v in d.items()}, pc_ids=ids)


@pytest.fixture(scope="module")
def setup():
    cfg_s = _cfg("sparse")
    batch = _batch(cfg_s.max_points, 2, cfg_s.max_instances)
    model_s = GAPartNet(cfg_s)
    model_d = GAPartNet(_cfg("dense"))
    rngs = {"params": jax.random.PRNGKey(0), "proposal_jitter": jax.random.PRNGKey(1)}

    @jax.jit
    def init_s(b):
        return model_s.init(rngs, b, train=False, do_cluster=True, do_score=True,
                            do_npcs=True)

    variables = init_s(batch)
    return model_s, model_d, variables, batch


def test_param_trees_identical(setup):
    model_s, model_d, variables, batch = setup
    rngs = {"params": jax.random.PRNGKey(0), "proposal_jitter": jax.random.PRNGKey(1)}

    @jax.jit
    def init_d(b):
        return model_d.init(rngs, b, train=False, do_cluster=True, do_score=True,
                            do_npcs=True)

    vd = init_d(batch)
    ps = jax.tree_util.tree_structure(variables)
    pd = jax.tree_util.tree_structure(vd)
    assert ps == pd
    shapes_s = jax.tree_util.tree_map(lambda x: x.shape, variables)
    shapes_d = jax.tree_util.tree_map(lambda x: x.shape, vd)
    assert shapes_s == shapes_d


def test_eval_forward_equivalent(setup):
    model_s, model_d, variables, batch = setup

    @jax.jit
    def fwd(model_idx, v, b):
        m = model_s if model_idx else model_d
        return m.apply(v, b, train=False, do_cluster=True, do_score=True,
                       do_npcs=True)

    out_s = jax.jit(lambda v, b: model_s.apply(
        v, b, train=False, do_cluster=True, do_score=True, do_npcs=True))(
        variables, batch)
    out_d = jax.jit(lambda v, b: model_d.apply(
        v, b, train=False, do_cluster=True, do_score=True, do_npcs=True))(
        variables, batch)

    np.testing.assert_array_equal(np.asarray(out_s.sem_preds),
                                  np.asarray(out_d.sem_preds))
    np.testing.assert_allclose(
        np.asarray(out_s.score_preds), np.asarray(out_d.score_preds),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.npcs_preds), np.asarray(out_d.npcs_preds),
        rtol=2e-4, atol=2e-4,
    )


def test_train_forward_equivalent(setup):
    """Same rng => same jitter draws; losses and BN stats must match."""
    model_s, model_d, variables, batch = setup
    rng = {"proposal_jitter": jax.random.PRNGKey(7)}

    def fwd(model):
        def f(v, b):
            return model.apply(
                v, b, train=True, do_cluster=True, do_score=True, do_npcs=True,
                rngs=rng, mutable=["batch_stats"],
            )
        return jax.jit(f)(variables, batch)

    out_s, mut_s = fwd(model_s)
    out_d, mut_d = fwd(model_d)

    np.testing.assert_allclose(
        float(out_s.loss_prop_score), float(out_d.loss_prop_score),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(out_s.loss_prop_npcs), float(out_d.loss_prop_npcs),
        rtol=2e-4, atol=1e-6,
    )
    # proposal-UNet BN running stats see the same site sets
    for unet in ("score_unet", "npcs_unet"):
        s_stats = jax.tree_util.tree_leaves(mut_s["batch_stats"][unet])
        d_stats = jax.tree_util.tree_leaves(mut_d["batch_stats"][unet])
        for a, c in zip(s_stats, d_stats):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=5e-5
            )


def test_bf16_train_grad_compiles(setup):
    """value_and_grad through the dense path with bf16 conv compute must not

    hit conv_general_dilated's mixed-dtype AD rejection (regression: the
    bf16-in/f32-out conv form breaks only under grad, so eval-only tests
    missed it)."""
    import dataclasses

    _, model_d, variables, batch = setup
    cfg = dataclasses.replace(_cfg("dense"), conv_compute_dtype="bfloat16")
    model = GAPartNet(cfg)

    def loss(params, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            b, train=True, do_cluster=True, do_score=True, do_npcs=True,
            rngs={"proposal_jitter": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return out.total_loss

    val, grads = jax.jit(jax.value_and_grad(loss))(variables["params"], batch)
    assert np.isfinite(float(val))
    gn = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
             for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0
