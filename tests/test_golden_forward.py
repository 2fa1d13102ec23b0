"""Golden regression: fixed-seed forward outputs must stay stable.

Locks the numeric semantics of the full pipeline (voxelize -> backbone ->
heads -> clustering -> score/npcs) across refactors.  Values were produced on
CPU with jax 0.9.0; loosen tolerances rather than regenerate if a jax upgrade
shifts them in the last ulps.  (Note: loss_prop_npcs is exactly 0 at init —
the NPCS mask requires sem_preds == sem_labels, which an untrained model
rarely satisfies; same gating as the reference model.py:406.)
"""

import jax
import numpy as np

from gapartnet_tpu.models.gapartnet import GAPartNet
from tests.test_model_forward import SMALL_CFG, _batch

import pytest

# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow

GOLDEN = dict(
    loss_sem_seg=2.796346664428711,
    loss_offset_dist=0.11734303832054138,
    loss_offset_dir=0.009887173771858215,
    loss_prop_score=0.6958713531494141,
    loss_prop_npcs=0.0,
    num_props=[22, 20],
    sem_pred_hist=[0, 19, 70, 1, 0, 0, 2, 0, 205, 727],
    score_sum=32.40766906738281,
    npcs_mean=-0.0031528889667242765,
)


def test_golden_forward():
    rng = np.random.RandomState(42)
    batch = _batch(rng)
    model = GAPartNet(SMALL_CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(7), "proposal_jitter": jax.random.PRNGKey(8)},
        batch, train=False, do_cluster=True, do_score=True, do_npcs=True,
    )
    out = model.apply(
        variables, batch, train=False, do_cluster=True, do_score=True, do_npcs=True
    )
    np.testing.assert_allclose(float(out.loss_sem_seg), GOLDEN["loss_sem_seg"], rtol=1e-3)
    np.testing.assert_allclose(
        float(out.loss_offset_dist), GOLDEN["loss_offset_dist"], rtol=1e-3
    )
    np.testing.assert_allclose(
        float(out.loss_offset_dir), GOLDEN["loss_offset_dir"], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.loss_prop_score), GOLDEN["loss_prop_score"], rtol=1e-3
    )
    assert float(out.loss_prop_npcs) == GOLDEN["loss_prop_npcs"]
    assert np.asarray(out.proposals.num_proposals).tolist() == GOLDEN["num_props"]
    hist = np.bincount(np.asarray(out.sem_preds).reshape(-1), minlength=10).tolist()
    assert hist == GOLDEN["sem_pred_hist"]
    np.testing.assert_allclose(
        float(np.asarray(out.score_preds).sum()), GOLDEN["score_sum"], rtol=1e-3
    )
    np.testing.assert_allclose(
        float(np.asarray(out.npcs_preds).mean()), GOLDEN["npcs_mean"], rtol=5e-3
    )
