"""Few-shot training on REAL articulated-object geometry.

Renders labeled views of the two reference example assets with the
SAPIEN-free point-splat renderer (datagen/assets.py), subsamples them to the
smoke-test envelope (256 points — same compiled graph shapes as
test_train_smoke, so the compile cache is shared), and runs fit + test:
loss must decrease and the AP pipeline must produce finite metrics.  This is
the reference's debug/few-shot integration mode (gapartnet.yaml:59-63) on
real data instead of Gaussian blobs.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

ASSETS = [
    "/root/reference/example_assets/45780",
    "/root/reference/example_assets/102442",
]

N_POINTS = 256


@pytest.fixture(scope="module")
def real_data_root(tmp_path_factory):
    if not os.path.isdir(ASSETS[0]):
        pytest.skip("reference example assets absent")
    from gapartnet_tpu.datagen import assets

    root = tmp_path_factory.mktemp("real_data")
    render_dir = root / "render"
    names = []
    for ai, asset in enumerate(ASSETS):
        for ridx in range(2):
            n = assets.render_asset_view(
                asset, str(render_dir), render_idx=ridx, seed=10 * ai + ridx,
                width=256, height=256, num_surface_samples=150_000,
                num_points=2000,
            )
            assert n is not None
            names.append(n)

    rng = np.random.RandomState(0)
    for split in ("train", "val", "test_intra", "test_inter"):
        d = root / split / "pth"
        d.mkdir(parents=True)
        use = names if split == "train" else names[:2]
        for name in use:
            full = np.load(render_dir / "pth" / f"{name}.npz")
            # subsample real views to the smoke-test point budget (keeps the
            # jitted train/eval graph shapes identical to test_train_smoke)
            sel = rng.choice(full["xyz"].shape[0], N_POINTS, replace=False)
            np.savez(
                d / f"{name}.npz",
                xyz=full["xyz"][sel], rgb=full["rgb"][sel],
                sem_labels=full["sem_labels"][sel],
                instance_labels=full["instance_labels"][sel],
                gt_npcs=full["gt_npcs"][sel],
            )
    return root


@pytest.fixture(scope="module")
def real_config(tmp_path_factory, real_data_root):
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
                "root_dir": str(real_data_root),
                "max_points": N_POINTS,
                "train_batch_size": 2,
                "val_batch_size": 2,
                "max_instances": 8,
            },
        },
        "trainer": {"max_epochs": 4},
        "seed_everything": 233,
    }
    p = tmp_path_factory.mktemp("real_cfg") / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_fit_and_test_on_real_assets(real_config, tmp_path, monkeypatch):
    import dataclasses

    from gapartnet_tpu.train import trainer
    from gapartnet_tpu.train.config import load_config

    monkeypatch.chdir(tmp_path)
    cfg = load_config(str(real_config))
    cfg.model = dataclasses.replace(
        cfg.model, level_capacity_divisors=(1, 2), ball_query_radius=0.1
    )
    state = trainer.fit(cfg)
    assert state.step > 0

    lines = [
        json.loads(l) for l in Path(cfg.trainer.log_file).read_text().splitlines()
    ]
    losses = [l["train_loss/total_loss"] for l in lines if "train_loss/total_loss" in l]
    assert len(losses) >= 4
    # learning happened on real geometry: compare within the fully-staged
    # regime (epoch 1 onward — score/npcs terms join at epoch 1, so epoch 0's
    # total is not comparable)
    assert losses[-1] < losses[1], losses

    ckpts = sorted(Path(cfg.trainer.ckpt_dir).iterdir())
    assert ckpts
    cfg.trainer.resume_ckpt = str(ckpts[-1])
    metrics = trainer.test(cfg)
    assert np.isfinite(metrics["monitor_metrics/mean_mAP"])
    assert np.isfinite(metrics["test_intra/all_accu"])
