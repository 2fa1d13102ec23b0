#!/usr/bin/env python
"""Per-view semantic confusion diagnostic.

Answers "WHERE do the GT points of class c go?" for a trained checkpoint —
the question aggregate recall can't (val recall_line_fixed_handle = 0 says
handles are lost; this says to WHOM).  Runs the reduced eval step per view
(batch size 1) and prints, per split:

  * the aggregate GT-row-normalized confusion over the part classes
  * a per-view table for the focus class: GT points, recall in that view,
    and the top absorbing predicted class — separating "lost in distant
    views only" (sub-voxel geometry) from "lost everywhere" (feature/label
    problem)

Usage:
    python tools/confusion_diag.py --data /tmp/sustained_r4_data \
        --ckpt runs/sustained_r4/checkpoints_a/last --splits val \
        --focus-class 1 [--sem-alpha auto ...]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/sustained_r4_data")
    ap.add_argument("--workdir", default="/tmp/confusion_diag")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--splits", nargs="+", default=["val"])
    ap.add_argument("--focus-class", type=int, default=1,
                    help="part class id for the per-view table "
                    "(1 = line_fixed_handle)")
    ap.add_argument("--limit", type=int, default=0,
                    help="max views per split (0 = all)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import numpy as np

    from tools.sustained_run import make_cfg
    from gapartnet_tpu.constants import PART_ID2NAME
    from gapartnet_tpu.models.gapartnet import GAPartNet
    from gapartnet_tpu.train.loop import adam, create_train_state
    from gapartnet_tpu.train.trainer import (
        CkptManager,
        _apply_auto_capacity,
        _iter_batches,
        _np_batch_to_device,
        build_datasets,
        load_warm_start,
        make_reduced_eval_step,
    )

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    cfg = make_cfg(Path(args.data), workdir, 1, "diag.jsonl")
    cfg.data.val_batch_size = 1  # per-view confusion
    datasets = build_datasets(cfg, "test")
    _apply_auto_capacity(cfg, datasets)
    model = GAPartNet(cfg.model)

    example = _np_batch_to_device(
        next(_iter_batches(datasets[args.splits[0]], 1, False)))
    state = create_train_state(model, example, adam(1e-3), seed=0)
    p, b = load_warm_start(state.params, state.batch_stats, args.ckpt)
    state = state._replace(params=p, batch_stats=b)

    # sem-only reduced step: no clustering, so this compiles fast and runs
    # on the sem head alone (do_instance=False path)
    eval_step = make_reduced_eval_step(model, cfg, do_instance=False)

    C = cfg.model.num_part_classes
    fc = args.focus_class
    for split in args.splits:
        ds = datasets[split]
        n = len(ds) if not args.limit else min(len(ds), args.limit)
        agg = np.zeros((C, C), np.int64)
        rows = []
        it = _iter_batches(ds, 1, drop_last=False)
        for vi in range(n):
            batch = _np_batch_to_device(next(it))
            r = jax.device_get(eval_step(state, batch))
            conf = np.asarray(r["conf"]).astype(np.int64)
            agg += conf
            gt = int(conf[fc].sum())
            if gt > 0:
                rec = conf[fc, fc] / gt * 100
                top = int(np.argmax(conf[fc]))
                rows.append((vi, gt, rec, top, conf[fc, top] / gt * 100))
        print(f"\n=== {split}: GT-row-normalized confusion (percent) ===")
        names = [PART_ID2NAME.get(i, str(i)) for i in range(C)]
        present = [i for i in range(C) if agg[i].sum() > 0]
        hdr = "gt\\pred".ljust(20) + "".join(
            names[j][:10].rjust(11) for j in present)
        print(hdr)
        for i in present:
            row = agg[i] / max(agg[i].sum(), 1) * 100
            print(names[i][:18].ljust(20)
                  + "".join(f"{row[j]:11.1f}" for j in present))
        if rows:
            print(f"\n--- per-view {names[fc]} (views with GT points) ---")
            print("view  gt_pts  recall%  top_pred(share%)")
            for vi, gt, rec, top, share in rows:
                print(f"{vi:4d}  {gt:6d}  {rec:6.1f}   "
                      f"{names[top]}({share:.0f}%)")


if __name__ == "__main__":
    main()
