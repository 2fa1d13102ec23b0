"""Dotted-override parsing for TPU-extension model keys (fast)."""

from gapartnet_tpu.train.config import load_config


def test_sem_focal_alpha_override(tmp_path):
    cfg = load_config(None, overrides=[
        ("--model.init_args.sem_focal_alpha",
         "[0.1, 1, 1, 1, 1, 1, 1, 1, 1, 1]"),
    ])
    assert cfg.model.sem_focal_alpha == (0.1, 1, 1, 1, 1, 1, 1, 1, 1, 1)


def test_sem_focal_alpha_defaults_none():
    cfg = load_config(None, overrides=[])
    assert cfg.model.sem_focal_alpha is None
