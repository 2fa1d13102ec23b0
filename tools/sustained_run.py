#!/usr/bin/env python
"""Sustained staged training run on real articulated-object geometry.

The round-3 evidence artifact for BASELINE config #5 (staged training,
reference model.py:528-601 + gapartnet.yaml:66-84):

  1. renders a few-shot dataset of REAL example-asset views at the flagship
     envelope (20000 points) with the SAPIEN-free renderer (datagen/assets.py)
  2. `fit` with training_schedule [5, 10] to max_epochs 8 — both stage
     transitions crossed, eval + top-k checkpointing every epoch
  3. simulated interruption: a SECOND `fit` resumes FULLY (params/opt_state/
     rng/epoch, trainer.ckpt_path) from the epoch-7 checkpoint to epoch 13
  4. `test` from the last checkpoint

Metric JSONL logs land in --workdir (committed as runs/sustained_r3/).

    python tools/sustained_run.py --workdir runs/sustained_r3
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ASSETS = [
    "/root/reference/example_assets/45780",
    "/root/reference/example_assets/102442",
]
N_POINTS = 20000


def build_dataset(root: Path, n_points: int = N_POINTS):
    import numpy as np

    from gapartnet_tpu.datagen import assets

    render_dir = root / "render"
    names = {a: [] for a in ASSETS}
    for ai, asset in enumerate(ASSETS):
        for ridx in range(12):
            n = assets.render_asset_view(
                str(asset), str(render_dir), render_idx=ridx,
                seed=100 * ai + ridx, width=512, height=512,
                num_surface_samples=200_000, num_points=n_points,
            )
            assert n is not None, (asset, ridx)
            names[asset].append(n)
            print(f"rendered {n} ({ridx})", flush=True)

    # splits: 8+8 train, 2+2 val, test_intra = seen object (45780),
    # test_inter = the other object (102442) — mirroring the reference's
    # seen/unseen-category split semantics at toy scale
    split_names = {
        "train": names[ASSETS[0]][:8] + names[ASSETS[1]][:8],
        "val": names[ASSETS[0]][8:10] + names[ASSETS[1]][8:10],
        "test_intra": names[ASSETS[0]][10:12],
        "test_inter": names[ASSETS[1]][10:12],
    }
    for split, use in split_names.items():
        d = root / split / "pth"
        d.mkdir(parents=True, exist_ok=True)
        for n in use:
            src = np.load(render_dir / "pth" / f"{n}.npz")
            np.savez(
                d / f"{n}.npz",
                xyz=src["xyz"], rgb=src["rgb"], sem_labels=src["sem_labels"],
                instance_labels=src["instance_labels"], gt_npcs=src["gt_npcs"],
            )


def make_cfg(root: Path, workdir: Path, max_epochs: int, log_name: str,
             n_points: int = N_POINTS, sem_alpha: float = 0.0):
    from gapartnet_tpu.train.config import Config, DataConfig, TrainerConfig
    from gapartnet_tpu.models.gapartnet import GAPartNetConfig

    # sem_alpha > 0: class-balanced focal (reference losses.py:38 `alpha`,
    # background weighted sem_alpha, parts 1.0).  The reference recipe
    # (alpha=None) is tuned for its 26k-cloud dataset; on a 16-view few-shot
    # set the ~90% background fraction is an attractor the sem head provably
    # sinks into — margin diagnostics on the collapsed 4096-pt run show the
    # correct-class-vs-background logit margin on foreground points FALLING
    # from -0.81 (epoch 12) to -1.92 (epoch 49) with foreground predictions
    # ~0.05% (PERF.md round 3).
    model = GAPartNetConfig(
        conv_compute_dtype="bfloat16", max_points=n_points,
        sem_focal_alpha=(
            (sem_alpha,) + (1.0,) * 9 if sem_alpha > 0 else None
        ),
    )
    data = DataConfig(
        root_dir=str(root), max_points=n_points, train_batch_size=4,
        val_batch_size=4, num_workers=2, max_instances=model.max_instances,
        # real surfaces overflow the synthetic-tuned divisor schedule at the
        # mid levels (measured L1 16.5k vs 10k default) — size from the data
        auto_capacity=True,
        # augmentation OFF for this 16-cloud few-shot artifact: a controlled
        # A/B (static vs per-epoch re-augmented batches, trainer's own step)
        # showed the reference-strength draws (random 3x3 jitter 0.1 + flips
        # + z-rotations, sane at the reference's 26k-cloud scale) keep the
        # sem head pinned in the all-background valley for 480+ steps on two
        # objects, while static batches escape it by step ~160 and reach 73%
        # foreground accuracy by step 600 (PERF.md round 3).  The artifact's
        # purpose is e2e instance-pipeline evidence, not generalization.
        pos_jitter=0.0, color_jitter=0.0, flip_prob=0.0, rotate_prob=0.0,
    )
    trainer = TrainerConfig(
        max_epochs=max_epochs, training_schedule=(5, 10), seed=23333,
        ckpt_dir=str(workdir / "checkpoints"),
        log_file=str(workdir / log_name), save_top_k=3,
    )
    return Config(model=model, data=data, trainer=trainer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/sustained_r3")
    ap.add_argument("--data", default="/tmp/sustained_data")
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument(
        "--points", type=int, default=N_POINTS,
        help="point budget per cloud (20000 = flagship envelope; smaller "
        "values make a CPU-feasible fallback when the TPU tunnel is down)",
    )
    ap.add_argument(
        "--sem-alpha", type=float, default=0.0, metavar="W",
        help="background class weight for the focal loss (reference "
        "losses.py:38 alpha; parts stay 1.0).  0 = reference default "
        "(alpha=None).  Few-shot sets need ~0.1: the 90%%-background "
        "imbalance otherwise traps the sem head in the all-background "
        "valley (measured margin divergence, PERF.md round 3)",
    )
    ap.add_argument(
        "--extend", type=int, default=0, metavar="EPOCHS",
        help="phase 3: resume from <workdir>/checkpoints/last and train on "
        "to EPOCHS total (eval every 5), then re-test — 52 steps of phases "
        "1+2 cross both stage transitions but underfit the sem head "
        "(salt-and-pepper part predictions, so no cluster reaches the "
        "5-point minimum and AP stays 0); the continuation trains to "
        "nonzero AP on the held-out views",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    root = Path(args.data)

    from gapartnet_tpu.train import trainer as T

    if args.extend:
        last = workdir / "checkpoints" / "last"
        assert last.exists(), last
        cfg = make_cfg(root, workdir, max_epochs=args.extend,
                       log_name="fit_phase3.jsonl", n_points=args.points,
                   sem_alpha=args.sem_alpha)
        cfg.trainer.ckpt_path = str(last)
        cfg.trainer.val_every_n_epochs = 5
        T.fit(cfg)
        cfg3 = make_cfg(root, workdir, max_epochs=args.extend,
                        log_name="test.jsonl", n_points=args.points,
                   sem_alpha=args.sem_alpha)
        cfg3.trainer.resume_ckpt = str(last)
        metrics = T.test(cfg3)
        (workdir / "test_metrics.json").write_text(
            json.dumps({k: float(v) for k, v in metrics.items()}, indent=1)
        )
        print("sustained extension complete:", workdir, flush=True)
        return

    if not args.skip_render:
        build_dataset(root, n_points=args.points)

    # phase 1: epochs 0-7 (crosses the epoch-5 scorenet transition)
    cfg = make_cfg(root, workdir, max_epochs=8, log_name="fit_phase1.jsonl",
                   n_points=args.points,
                   sem_alpha=args.sem_alpha)
    T.fit(cfg)

    # phase 2: full resume from the always-saved `last` checkpoint (epoch 7)
    # -> epoch 13 (crosses the epoch-10 npcs transition); params/opt_state/
    # rng restored exactly.  Top-k alone cannot serve here: with the monitor
    # flat at 0 early, top-k keeps the earliest ties, not the newest epoch.
    last = Path(cfg.trainer.ckpt_dir) / "last"
    assert last.exists(), list(Path(cfg.trainer.ckpt_dir).iterdir())
    cfg2 = make_cfg(root, workdir, max_epochs=13, log_name="fit_phase2.jsonl",
                    n_points=args.points,
                   sem_alpha=args.sem_alpha)
    cfg2.trainer.ckpt_path = str(last)
    T.fit(cfg2)

    # test from the newest checkpoint
    cfg3 = make_cfg(root, workdir, max_epochs=13, log_name="test.jsonl",
                    n_points=args.points,
                   sem_alpha=args.sem_alpha)
    cfg3.trainer.resume_ckpt = str(last)
    metrics = T.test(cfg3)
    (workdir / "test_metrics.json").write_text(
        json.dumps({k: float(v) for k, v in metrics.items()}, indent=1)
    )
    print("sustained run complete:", workdir, flush=True)


if __name__ == "__main__":
    main()
