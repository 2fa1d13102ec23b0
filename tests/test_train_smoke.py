"""End-to-end fit/test smoke over synthetic data — the integration test the

reference performs manually via few-shot debug mode (SURVEY.md section 4)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from gapartnet_tpu.data.synthetic import synthetic_cloud


# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


N_POINTS = 256


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gapartnet_data")
    rng = np.random.RandomState(0)
    names = ["Box_100_00_000", "Box_101_00_000", "Remote_102_00_000", "Remote_103_00_000"]
    for split in ("train", "val", "test_intra", "test_inter"):
        d = root / split / "pth"
        d.mkdir(parents=True)
        for name in names[: 4 if split == "train" else 2]:
            c = synthetic_cloud(rng, num_points=N_POINTS, num_parts=3)
            np.savez(
                d / f"{name}.npz",
                xyz=c["points"][:, :3],
                rgb=c["points"][:, 3:],
                sem_labels=c["sem_labels"],
                instance_labels=c["instance_labels"],
                gt_npcs=c["gt_npcs"],
            )
    return root


@pytest.fixture(scope="module")
def config_file(tmp_path_factory, data_root):
    cfg = {
        "model": {
            "class_path": "network.model.GAPartNet",
            "init_args": {
                "debug": True,
                "in_channels": 6,
                "num_part_classes": 10,
                "backbone_type": "SparseUNet",
                "backbone_cfg": {"channels": [8, 16], "block_repeat": 1},
                "instance_seg_cfg": {
                    "ball_query_radius": 0.1,
                    "max_num_points_per_query": 8,
                    "min_num_points_per_proposal": 3,
                    "max_num_points_per_query_shift": 16,
                    "score_fullscale": 28,
                    "score_scale": 50,
                },
                "learning_rate": 0.001,
                "training_schedule": [0, 1],
                "max_points": N_POINTS,
                "max_proposals": 16,
                "max_instances": 8,
            },
        },
        "data": {
            "class_path": "dataset.gapartnet.GAPartNetInst",
            "init_args": {
                "root_dir": str(data_root),
                "max_points": N_POINTS,
                "train_batch_size": 2,
                "val_batch_size": 2,
                "pos_jitter": 0.1,
                "color_jitter": 0.3,
                "flip_prob": 0.3,
                "rotate_prob": 0.3,
                "max_instances": 8,
            },
        },
        "trainer": {"max_epochs": 2},
        "seed_everything": 233,
    }
    p = tmp_path_factory.mktemp("cfg") / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_config_parsing(config_file):
    from gapartnet_tpu.train.config import load_config

    cfg = load_config(str(config_file))
    assert cfg.model.channels == (8, 16)
    assert cfg.model.max_points == N_POINTS
    assert cfg.model.ball_query_radius == 0.1
    assert cfg.trainer.training_schedule == (0, 1)
    assert cfg.trainer.seed == 233
    assert cfg.data.train_batch_size == 2

    # dotted overrides (the reference CLI syntax)
    cfg2 = load_config(
        str(config_file),
        overrides=[
            ("model.init_args.training_schedule", "[0,0]"),
            ("data.init_args.train_batch_size", "4"),
        ],
    )
    assert cfg2.trainer.training_schedule == (0, 0)
    assert cfg2.data.train_batch_size == 4


def test_fit_and_test(config_file, tmp_path, monkeypatch):
    from gapartnet_tpu.train.config import load_config
    from gapartnet_tpu.train import trainer

    monkeypatch.chdir(tmp_path)
    cfg = load_config(str(config_file))
    # capacity divisors must fit the tiny model (2 levels)
    import dataclasses

    cfg.model = dataclasses.replace(
        cfg.model, level_capacity_divisors=(1, 2), ball_query_radius=0.1
    )
    state = trainer.fit(cfg)
    assert state.step > 0

    log = Path(cfg.trainer.log_file)
    assert log.exists()
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    keys = set().union(*[set(l) for l in lines])
    # metric-name contract
    assert "monitor_metrics/mean_mAP" in keys
    assert "val/AP@50" in keys and "test_inter/miou" in keys
    assert any(k.startswith("train_loss/") for k in keys)

    # checkpoints got written
    ckpts = list(Path(cfg.trainer.ckpt_dir).iterdir())
    assert ckpts

    # test subcommand restores the checkpoint and evaluates
    cfg.trainer.resume_ckpt = str(sorted(ckpts)[-1])
    metrics = trainer.test(cfg)
    assert "monitor_metrics/mean_mAP" in metrics
    assert np.isfinite(metrics["monitor_metrics/mean_mAP"])


def test_build_datasets_multihost_sharding(config_file):
    """Every split's file list shards round-robin by process; shards are

    disjoint and cover the full list (data_utils.py:15-37 semantics)."""
    from gapartnet_tpu.train.config import load_config
    from gapartnet_tpu.train import trainer

    cfg = load_config(str(config_file))
    full = trainer.build_datasets(cfg, "fit", process_index=0, process_count=1)
    s0 = trainer.build_datasets(cfg, "fit", process_index=0, process_count=2)
    s1 = trainer.build_datasets(cfg, "fit", process_index=1, process_count=2)
    for split in ("train", "val", "test_intra", "test_inter"):
        all_paths = set(full[split].paths)
        p0, p1 = set(s0[split].paths), set(s1[split].paths)
        assert p0 | p1 == all_paths
        assert not (p0 & p1)
        assert abs(len(p0) - len(p1)) <= 1


@pytest.mark.skipif(
    __import__("jax").device_count() < 2, reason="needs 2+ virtual devices"
)
def test_sharded_eval_matches_single_device(config_file, tmp_path, monkeypatch):
    """evaluate_splits over a 2-device mesh must reproduce the single-device

    metrics (AP, mIoU, accuracies) — eval sharding is a layout change only."""
    import dataclasses

    import jax

    from gapartnet_tpu.models.gapartnet import GAPartNet
    from gapartnet_tpu.parallel.mesh import make_mesh, replicate_tree
    from gapartnet_tpu.train import trainer
    from gapartnet_tpu.train.config import load_config
    from gapartnet_tpu.train.loop import adam, create_train_state

    monkeypatch.chdir(tmp_path)
    cfg = load_config(str(config_file))
    cfg.model = dataclasses.replace(
        cfg.model, level_capacity_divisors=(1, 2), ball_query_radius=0.1
    )
    model = GAPartNet(cfg.model)
    datasets = trainer.build_datasets(cfg, "test")
    example = trainer._np_batch_to_device(
        next(trainer._iter_batches(datasets["val"], cfg.data.val_batch_size, False))
    )
    state = create_train_state(model, example, adam(1e-3), seed=0)
    logger = trainer.MetricLogger(str(tmp_path / "m.jsonl"))

    _, single = trainer.evaluate_splits(
        model, state, cfg, datasets, 0, logger, 0, do_instance=True, mesh=None
    )
    mesh = make_mesh(2)
    _, sharded = trainer.evaluate_splits(
        model, replicate_tree(state, mesh), cfg, datasets, 0, logger, 0,
        do_instance=True, mesh=mesh,
    )
    assert set(single) == set(sharded)
    for k in single:
        np.testing.assert_allclose(single[k], sharded[k], rtol=1e-4, atol=1e-3,
                                   err_msg=k)


def test_multihost_metric_mean_simulated(config_file, tmp_path, monkeypatch):
    """Simulate process_count == 2 in evaluate_splits: the collective must be
    entered with the deterministic key vector, a peer's NaN entries must drop
    out of the nanmean, and peer values must average positionally
    (trainer.py:658-675; ADVICE r2 medium)."""
    import dataclasses

    import jax

    from gapartnet_tpu.models.gapartnet import GAPartNet
    from gapartnet_tpu.train import trainer
    from gapartnet_tpu.train.config import load_config
    from gapartnet_tpu.train.loop import adam, create_train_state

    monkeypatch.chdir(tmp_path)
    cfg = load_config(str(config_file))
    cfg.model = dataclasses.replace(
        cfg.model, level_capacity_divisors=(1, 2), ball_query_radius=0.1
    )
    model = GAPartNet(cfg.model)
    datasets = trainer.build_datasets(cfg, "test")
    example = trainer._np_batch_to_device(
        next(trainer._iter_batches(datasets["val"], cfg.data.val_batch_size, False))
    )
    state = create_train_state(model, example, adam(1e-3), seed=0)
    logger = trainer.MetricLogger(str(tmp_path / "mh.jsonl"))

    _, single = trainer.evaluate_splits(
        model, state, cfg, datasets, 0, logger, 0, do_instance=True, mesh=None
    )

    calls = {}

    def fake_allgather(vec):
        calls["len"] = len(vec)
        # peer process: half the vector NaN (its shard left those splits
        # empty), the other half shifted by +2
        peer = np.where(np.arange(len(vec)) % 2 == 0, np.nan, vec + 2.0)
        return np.stack([np.asarray(vec), peer.astype(np.float32)])

    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    _, merged = trainer.evaluate_splits(
        model, state, cfg, datasets, 0, logger, 0, do_instance=True, mesh=None
    )

    keys = trainer._expected_eval_keys(
        trainer.make_reduced_eval_step(model, cfg, True), state, cfg, True
    )
    assert calls["len"] == len(keys)
    for i, k in enumerate(keys):
        if k not in single:
            continue
        expect = single[k] if i % 2 == 0 else single[k] + 1.0
        np.testing.assert_allclose(merged[k], expect, rtol=1e-5, err_msg=k)


def test_expected_eval_keys_cover_observed(config_file, tmp_path, monkeypatch):
    """The deterministic cross-process key set (multi-host metric mean) must

    cover every metric evaluate_splits can emit, for both do_instance modes,
    so differing per-process shard contents can never misalign the
    process_allgather vector (ADVICE r2 medium)."""
    import dataclasses

    from gapartnet_tpu.models.gapartnet import GAPartNet
    from gapartnet_tpu.train import trainer
    from gapartnet_tpu.train.config import load_config
    from gapartnet_tpu.train.loop import adam, create_train_state

    monkeypatch.chdir(tmp_path)
    cfg = load_config(str(config_file))
    cfg.model = dataclasses.replace(
        cfg.model, level_capacity_divisors=(1, 2), ball_query_radius=0.1
    )
    model = GAPartNet(cfg.model)
    datasets = trainer.build_datasets(cfg, "test")
    example = trainer._np_batch_to_device(
        next(trainer._iter_batches(datasets["val"], cfg.data.val_batch_size, False))
    )
    state = create_train_state(model, example, adam(1e-3), seed=0)
    logger = trainer.MetricLogger(str(tmp_path / "m.jsonl"))

    for do_instance in (False, True):
        eval_step = trainer.make_reduced_eval_step(model, cfg, do_instance)
        expected = trainer._expected_eval_keys(eval_step, state, cfg, do_instance)
        assert len(expected) == len(set(expected))
        _, metrics = trainer.evaluate_splits(
            model, state, cfg, datasets, 0, logger, 0,
            do_instance=do_instance, mesh=None,
        )
        missing = set(metrics) - set(expected)
        assert not missing, missing
