import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapartnet_tpu.data.synthetic import synthetic_batch
from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
from gapartnet_tpu.structures import PointCloudBatch


# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


SMALL_CFG = GAPartNetConfig(
    channels=(8, 16, 24),
    block_repeat=2,
    max_points=512,
    max_proposals=32,
    max_instances=8,
    level_capacity_divisors=(1, 2, 4),
    min_num_points_per_proposal=3,
    ball_query_radius=0.1,
    max_num_points_per_query=16,
    max_num_points_per_query_shift=32,
)


def _batch(rng, b=2, n=512, parts=4):
    d = synthetic_batch(rng, batch_size=b, num_points=n, num_parts=parts, max_instances=8)
    ids = d.pop("pc_ids")
    return PointCloudBatch(**{k: jnp.asarray(v) for k, v in d.items()}, pc_ids=ids)


@pytest.fixture(scope="module")
def model_and_batch():
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    model = GAPartNet(SMALL_CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "proposal_jitter": jax.random.PRNGKey(1)},
        batch, train=False, do_cluster=True, do_score=True, do_npcs=True,
    )
    return model, variables, batch


def test_stage0_sem_only(model_and_batch):
    model, variables, batch = model_and_batch
    out = model.apply(variables, batch, train=False)
    assert out.sem_logits.shape == (2, 512, 10)
    assert out.sem_preds.shape == (2, 512)
    assert out.offset_preds.shape == (2, 512, 3)
    assert np.isfinite(float(out.loss_sem_seg))
    assert np.isfinite(float(out.loss_offset_dist))
    assert np.isfinite(float(out.total_loss))
    assert out.proposals is None


def test_full_forward_with_losses(model_and_batch):
    model, variables, batch = model_and_batch
    out, _ = model.apply(
        variables, batch, train=True, do_cluster=True, do_score=True, do_npcs=True,
        rngs={"proposal_jitter": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out.proposals is not None
    p = out.proposals
    assert p.entry_point.shape == (2, 1024)
    assert p.proposal_mask.shape == (2, 32)
    # each sample should find at least one proposal on clean synthetic parts
    num_props = np.asarray(p.num_proposals)
    assert (num_props >= 1).all()
    assert out.score_preds.shape == (2, 32)
    sp = np.asarray(out.score_preds)
    assert ((sp >= 0) & (sp <= 1)).all()
    assert out.npcs_preds.shape == (2, 1024, 3)
    assert out.ious.shape == (2, 32, 8)
    for l in [
        out.loss_sem_seg, out.loss_offset_dist, out.loss_offset_dir,
        out.loss_prop_score, out.loss_prop_npcs,
    ]:
        assert np.isfinite(float(l)), l


def test_proposals_have_consistent_masks(model_and_batch):
    model, variables, batch = model_and_batch
    out = model.apply(
        variables, batch, train=False, do_cluster=True, do_score=True, do_npcs=True,
    )
    p = out.proposals
    pid = np.asarray(p.entry_proposal)
    em = np.asarray(p.entry_mask)
    sizes = np.asarray(p.proposal_size)
    nprop = np.asarray(p.num_proposals)
    for b in range(2):
        assert (pid[b][em[b]] >= 0).all()
        assert (pid[b][em[b]] < nprop[b]).all()
        # sizes match entry counts
        counts = np.bincount(pid[b][em[b]], minlength=sizes.shape[1])
        np.testing.assert_array_equal(counts, sizes[b])
        # all proposals respect the min-points filter
        assert (sizes[b][: nprop[b]] >= SMALL_CFG.min_num_points_per_proposal).all()
        # IoU sanity
        iou = np.asarray(out.ious)[b]
        assert (iou >= 0).all() and (iou <= 1 + 1e-5).all()


def test_gradients_flow(model_and_batch):
    model, variables, batch = model_and_batch

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, do_cluster=True, do_score=True, do_npcs=True,
            rngs={"proposal_jitter": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return out.total_loss

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the backbone stem and all heads receive nonzero gradient
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0
    for head in ["sem_seg_head", "offset_mlp0", "score_head", "npcs_head"]:
        g = grads[head]["kernel"]
        assert float(jnp.abs(g).sum()) > 0, head
