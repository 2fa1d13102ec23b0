"""Full checkpoint resume: kill a staged fit mid-run, resume from the saved
checkpoint, and land bit-identical to the uninterrupted run.

Covers the Lightning `fit --ckpt_path` contract the reference gets for free
from pytorch-lightning (reference gapartnet/train.py CLI): optimizer
moments/count, the epoch-loop RNG, epoch index, and global step all round-trip
through orbax (trainer.CkptManager), so `interrupted(k) + resume` replays
exactly the tail of `uninterrupted`.
"""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from gapartnet_tpu.data.synthetic import synthetic_cloud

pytestmark = pytest.mark.slow

N_POINTS = 256


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_data")
    rng = np.random.RandomState(1)
    names = ["Box_200_00_000", "Box_201_00_000", "Door_202_00_000", "Door_203_00_000"]
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


def _make_cfg(data_root, workdir, max_epochs):
    from gapartnet_tpu.train.config import load_config

    raw = {
        "model": {
            "init_args": {
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
                # both stage transitions inside the run
                "training_schedule": [1, 2],
                "max_points": N_POINTS,
                "max_proposals": 16,
                "max_instances": 8,
            },
        },
        "data": {
            "init_args": {
                "root_dir": str(data_root),
                "max_points": N_POINTS,
                "train_batch_size": 2,
                "val_batch_size": 2,
                "max_instances": 8,
            },
        },
        "trainer": {"max_epochs": max_epochs},
        "seed_everything": 77,
    }
    p = Path(workdir) / "config.yaml"
    p.write_text(yaml.safe_dump(raw))
    cfg = load_config(str(p))
    cfg.model = dataclasses.replace(
        cfg.model, level_capacity_divisors=(1, 2), ball_query_radius=0.1
    )
    return cfg


def _leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_resume_bit_matches_uninterrupted(data_root, tmp_path, monkeypatch):
    from gapartnet_tpu.train import trainer

    # uninterrupted run: 4 epochs crossing both stage transitions (1, 2)
    d_full = tmp_path / "full"
    d_full.mkdir()
    monkeypatch.chdir(d_full)
    cfg = _make_cfg(data_root, d_full, max_epochs=4)
    state_full = trainer.fit(cfg)

    # interrupted run: stop after epoch 1 (checkpoint saved each epoch) ...
    d_part = tmp_path / "part"
    d_part.mkdir()
    monkeypatch.chdir(d_part)
    cfg2 = _make_cfg(data_root, d_part, max_epochs=2)
    trainer.fit(cfg2)
    ckpts = sorted(Path(cfg2.trainer.ckpt_dir).iterdir())
    ck = str([p for p in ckpts if p.name.startswith("epoch_001")][0])

    # ... then resume to epoch 4 from the epoch-1 checkpoint
    cfg3 = _make_cfg(data_root, d_part, max_epochs=4)
    cfg3.trainer.ckpt_path = ck
    cfg3.trainer.log_file = "resumed.jsonl"  # MetricLogger appends
    state_res = trainer.fit(cfg3)

    assert int(state_res.step) == int(state_full.step)
    for a, b in zip(_leaves(state_full.params), _leaves(state_res.params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_leaves(state_full.opt_state), _leaves(state_res.opt_state)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_leaves(state_full.batch_stats), _leaves(state_res.batch_stats)):
        np.testing.assert_array_equal(a, b)

    # the resumed log continues with epoch>=2 rows and staged metrics
    lines = [
        json.loads(l) for l in Path(cfg3.trainer.log_file).read_text().splitlines()
    ]
    epochs = [l["epoch"] for l in lines if "epoch" in l]
    assert min(epochs) >= 2 and max(epochs) == 3


def test_ckpt_manager_save_last_and_tie_keeping(tmp_path):
    """With a flat monitor, top-k must keep the NEWEST epochs among ties and
    `last` must always point at the most recent epoch (resume-from-latest
    depends on it; Lightning ModelCheckpoint save_last semantics)."""
    import jax.numpy as jnp
    import optax

    from gapartnet_tpu.train.loop import TrainState
    from gapartnet_tpu.train.trainer import CkptManager

    params = {"w": jnp.arange(4.0)}
    opt = optax.adam(1e-3)
    mgr = CkptManager(str(tmp_path), save_top_k=2)
    for epoch in range(5):
        state = TrainState(
            params={"w": jnp.full(4, float(epoch))}, batch_stats={},
            opt_state=opt.init(params), step=jnp.asarray(epoch),
        )
        mgr.save(state, epoch, 0.0, gstep=epoch)
    names = sorted(p.name for p in tmp_path.iterdir())
    # newest ties kept, oldest evicted; `last` always present.  Filenames
    # encode the monitor slug so scores from different monitors can never be
    # compared by name (ADVICE r4)
    assert names == [
        "epoch_003_mean_mAP_0.00", "epoch_004_mean_mAP_0.00", "last",
    ]
    restored = CkptManager.restore(str(tmp_path / "last"))
    assert restored["epoch"] == 4 and restored["gstep"] == 4
    np.testing.assert_array_equal(restored["params"]["w"], np.full(4, 4.0))
