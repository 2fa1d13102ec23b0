import numpy as np

from gapartnet_tpu.data.synthetic import synthetic_cloud
from gapartnet_tpu.infer.api import GAPartNetInference
from tests.test_model_forward import SMALL_CFG

import pytest

# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def test_predict_with_masks(rng):
    infer = GAPartNetInference(cfg=SMALL_CFG)
    c = synthetic_cloud(rng, num_points=SMALL_CFG.max_points, num_parts=3)
    # ground-truth instance masks as the external (SAM-like) masks
    masks = np.stack(
        [c["instance_labels"] == i for i in range(3)]
    )
    scores, classes, npcs_map, bboxes = infer.predict_with_masks(
        c["points"], masks
    )
    assert scores.shape == (3,)
    assert ((scores >= 0) & (scores <= 1)).all()
    assert classes.shape == (3,)
    assert npcs_map.shape == (SMALL_CFG.max_points, 3)
    assert len(bboxes) == 3
    for b in bboxes:
        assert b is None or (b.shape == (8, 3) and np.isfinite(b).all())
    # npcs was scattered exactly onto masked points
    bg = ~masks.any(0)
    np.testing.assert_allclose(npcs_map[bg], 230.0 / 255.0)
