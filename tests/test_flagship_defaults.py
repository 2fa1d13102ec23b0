"""Flagship defaults must stay reference-exact (VERDICT r4 #7).

The few-shot artifact runs (tools/sustained_run.py) carry beyond-reference
scaffolding — class-weighted losses, trunk freezing, balance monitors,
batch-scaled lr — every knob justified by a documented failure at
few-hundred-view scale (PERF.md rounds 3-5).  None of that may leak into
the flagship configuration: the reference ships alpha=None focal+dice,
Adam lr 1e-3, staged schedule [5, 10], no freezing
(reference gapartnet.yaml:27,51,66; model.py:1051-1055; losses.py:38).
"""

from pathlib import Path

from gapartnet_tpu.models.gapartnet import GAPartNetConfig
from gapartnet_tpu.train.config import load_config

YAML = Path(__file__).resolve().parent.parent / "configs" / "gapartnet.yaml"


def test_flagship_yaml_reference_exact():
    cfg = load_config(str(YAML))
    assert cfg.trainer.learning_rate == 1e-3
    assert tuple(cfg.trainer.training_schedule) == (5, 10)
    assert cfg.trainer.freeze_prefixes == ()
    assert cfg.trainer.monitor == "monitor_metrics/mean_mAP"
    assert cfg.model.use_sem_focal_loss is True
    assert cfg.model.use_sem_dice_loss is True
    assert cfg.model.sem_focal_alpha is None  # reference alpha=None
    assert cfg.data.train_batch_size == 64
    assert cfg.data.color_jitter == 0.3  # full reference augmentation
    assert cfg.trainer.seed == 23333


def test_model_config_defaults_reference_exact():
    m = GAPartNetConfig()
    assert m.sem_focal_alpha is None
    assert m.use_sem_focal_loss and m.use_sem_dice_loss
    assert m.ball_query_radius == 0.04
    assert (m.max_num_points_per_query, m.max_num_points_per_query_shift) == (50, 300)
    assert m.min_num_points_per_proposal == 5
    assert (m.score_fullscale, m.score_scale) == (28, 50)
    assert m.val_nms_iou_threshold == 0.3 and m.val_ap_iou_threshold == 0.5
