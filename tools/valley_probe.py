#!/usr/bin/env python
"""Short controlled training probes for the all-background-valley diagnosis.

Round-4 instrument: the sem head on the ~200-view real+synthetic dataset
collapses into all-background around step ~120 even with NO stage
transition, no augmentation, and sem_focal_alpha=0.1 (runs/sustained_r4/
fit_probe_* logs) — so the round-3 explanation (augmentation at few-shot
scale) is incomplete.  This tool runs one short fit with targeted overrides
and prints the per-epoch trajectory, so single factors (lr, dice loss,
alpha, batch size, offset-loss coupling) can be isolated in ~5 minutes each:

    python tools/valley_probe.py --tag lr3e4 --lr 3e-4 --epochs 14
    python tools/valley_probe.py --tag nodice --no-dice --epochs 14
    python tools/valley_probe.py --tag alpha02 --sem-alpha 0.02 --epochs 14
    python tools/valley_probe.py --tag b4 --batch 4 --epochs 14
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/sustained_r4_data")
    ap.add_argument("--workdir", default="/tmp/valley_probes")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--sem-alpha", default=0.1,
                    type=lambda v: v if v == "auto" else float(v))
    ap.add_argument("--no-dice", action="store_true")
    ap.add_argument("--no-focal", action="store_true")
    ap.add_argument("--no-offset", action="store_true",
                    help="zero the offset-loss weight (backbone-coupling "
                    "probe; not a reference configuration)")
    ap.add_argument("--schedule", type=int, nargs=2, default=(100, 110),
                    help="default: stages never activate (sem-only probe)")
    ap.add_argument("--aug", action="store_true",
                    help="geometric augmentation on (default off for probes)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from tools.sustained_run import make_cfg
    from gapartnet_tpu.train import trainer as T

    workdir = Path(args.workdir) / args.tag
    workdir.mkdir(parents=True, exist_ok=True)
    cfg = make_cfg(
        Path(args.data), workdir, args.epochs, "fit.jsonl",
        sem_alpha=args.sem_alpha, batch_size=args.batch,
        color_jitter=0.0,
        pos_jitter=0.1 if args.aug else 0.0,
        flip_prob=0.3 if args.aug else 0.0,
        rotate_prob=0.3 if args.aug else 0.0,
        schedule=tuple(args.schedule),
    )
    cfg.trainer.learning_rate = args.lr
    cfg.trainer.val_every_n_epochs = 4
    cfg.trainer.save_top_k = 1
    mkw = {}
    if args.no_dice:
        mkw["use_sem_dice_loss"] = False
    if args.no_focal:
        mkw["use_sem_focal_loss"] = False
    if args.no_offset:
        mkw["offset_loss_weight"] = 0.0
    if mkw:
        cfg.model = dataclasses.replace(cfg.model, **mkw)
    (workdir / "probe_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=1, default=str)
    )
    T.fit(cfg)

    print(f"=== probe {args.tag} trajectory")
    for line in open(workdir / "fit.jsonl"):
        d = json.loads(line)
        keys = {
            k: round(float(d[k]), 2)
            for k in (
                "step", "train_pixel_accu", "train_loss/loss_sem_seg",
                "val/pixel_accu", "val/recall_hinge_door",
                "val/recall_slider_button", "val/recall_line_fixed_handle",
            )
            if k in d
        }
        print(keys, flush=True)


if __name__ == "__main__":
    main()
