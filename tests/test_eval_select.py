"""Eval-time proposal selection (score/size filter + NMS) on model outputs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.eval.ap import batch_to_records, select_eval_proposals
from tests.test_model_forward import SMALL_CFG, _batch

import pytest

# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def test_select_eval_proposals_semantics(rng):
    from gapartnet_tpu.models.gapartnet import GAPartNet

    model = GAPartNet(SMALL_CFG)
    batch = _batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "proposal_jitter": jax.random.PRNGKey(1)},
        batch, train=False, do_cluster=True, do_score=True, do_npcs=True,
    )
    out = model.apply(
        variables, batch, train=False, do_cluster=True, do_score=True, do_npcs=True
    )
    keep = np.asarray(select_eval_proposals(out, SMALL_CFG, SMALL_CFG.max_points))
    pm = np.asarray(out.proposals.proposal_mask)
    scores = np.asarray(out.score_preds)
    sizes = np.asarray(out.proposals.proposal_size)

    # kept proposals satisfy the filters (grouping_utils.py:159-218 semantics)
    assert (~keep[~pm]).all()
    assert (scores[keep] > SMALL_CFG.val_score_threshold).all()
    assert (sizes[keep] > SMALL_CFG.val_min_num_points_per_proposal).all()

    # kept proposals are mutually below the NMS IoU threshold
    ep = np.asarray(out.proposals.entry_point)
    pid = np.asarray(out.proposals.entry_proposal)
    em = np.asarray(out.proposals.entry_mask)
    for b in range(keep.shape[0]):
        kept = np.nonzero(keep[b])[0]
        sets = [set(ep[b][em[b] & (pid[b] == p)].tolist()) for p in kept]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                iou = inter / max(union, 1)
                assert iou <= SMALL_CFG.val_nms_iou_threshold + 1e-5, (
                    b, kept[i], kept[j], iou
                )

    # records flatten cleanly for the AP evaluator
    s, c, si, io, isl = batch_to_records(out, keep, batch.instance_sem_labels)
    assert len(s) == keep.sum()
    assert io.shape == (keep.sum(), SMALL_CFG.max_instances)
    assert ((c >= 1) & (c < SMALL_CFG.num_part_classes)).all()
