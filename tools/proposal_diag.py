#!/usr/bin/env python
"""Per-class proposal birth/death instrumentation through the eval cascade.

Round-3 verdict item #3: when a part class scores AP@50 = 0, name the stage
that kills it.  For each part class this tool tracks the proposal population
through every stage of the instance pipeline on a real eval split:

    gt        GT instances of the class in the split
    sem_rec   sem-head point recall (gt points of the class predicted right)
    born      clustered proposals whose GT-majority class is this class
              (already past the >= 5-point minimum, grouping min_pts)
    iou50     born proposals with IoU > 0.5 against some GT instance of the
              class (upper bound on matches before any filtering)
    scored    survivors of the score/size filter (score > 0.09, > 3 pts,
              reference model.py:46-49)
    kept      survivors of NMS (IoU 0.3)
    matched   kept proposals greedily matched at IoU 0.5 with the PREDICTED
              class (what AP@50 actually counts)

Usage (against a sustained-run workdir):

    python tools/proposal_diag.py --workdir runs/sustained_r4 \
        --data /tmp/sustained_r4_data --split val [--ckpt .../epoch_X]
"""

import argparse
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def majority_gt_class(prop, sem_labels, num_classes):
    """(B, P) GT-majority semantic class per proposal (host side)."""
    ep = np.asarray(prop.entry_point)
    pid = np.asarray(prop.entry_proposal)
    em = np.asarray(prop.entry_mask)
    b, p = np.asarray(prop.proposal_mask).shape
    out = np.full((b, p), -1, np.int64)
    for bi in range(b):
        sel = em[bi]
        gt = sem_labels[bi][ep[bi][sel]]
        pp = pid[bi][sel]
        ok = gt >= 0
        hist = np.zeros((p, num_classes), np.int64)
        np.add.at(hist, (pp[ok], gt[ok]), 1)
        has = hist.sum(1) > 0
        out[bi][has] = hist[has].argmax(1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/sustained_r4")
    ap.add_argument("--data", default="/tmp/sustained_r4_data")
    ap.add_argument("--split", default="val",
                    choices=["train", "val", "test_intra", "test_inter"])
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default <workdir>/checkpoints/last)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--sem-alpha", type=float, default=0.1)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )

    from tools.sustained_run import make_cfg
    from gapartnet_tpu.eval.ap import select_eval_proposals
    from gapartnet_tpu.models.gapartnet import GAPartNet
    from gapartnet_tpu.constants import PART_ID2NAME
    from gapartnet_tpu.train import trainer as T
    from gapartnet_tpu.train.loop import adam, create_train_state, make_eval_step

    workdir = Path(args.workdir)
    cfg = make_cfg(Path(args.data), workdir, 1, "diag.jsonl",
                   n_points=args.points, sem_alpha=args.sem_alpha,
                   batch_size=args.batch)
    datasets = T.build_datasets(cfg, "test")
    T._apply_auto_capacity(cfg, datasets)
    model = GAPartNet(cfg.model)

    ds = datasets[args.split]
    assert ds is not None and len(ds) > 0, args.split
    example = T._np_batch_to_device(
        next(T._iter_batches(ds, args.batch, False, 0)), None
    )
    state = create_train_state(model, example, adam(), seed=0)
    ckpt = Path(args.ckpt) if args.ckpt else workdir / "checkpoints" / "last"
    p, b = T.load_warm_start(state.params, state.batch_stats, str(ckpt))
    state = state.replace(params=p, batch_stats=b)

    step = make_eval_step(model, do_cluster=True, do_score=True, do_npcs=True)
    C = cfg.model.num_part_classes
    agg = defaultdict(lambda: np.zeros(7, np.float64))  # per-class stages
    sem_hit = np.zeros(C, np.float64)
    sem_tot = np.zeros(C, np.float64)

    for raw in T._iter_batches(ds, args.batch, drop_last=False, workers=0):
        batch = T._np_batch_to_device(raw, None)
        out = step(state, batch)
        keep = select_eval_proposals(out, cfg.model, cfg.model.max_points)
        out, keep = jax.device_get((out, keep))

        sem_labels = np.asarray(batch.sem_labels)
        point_mask = np.asarray(batch.point_mask)
        sem_preds = np.asarray(out.sem_preds)
        for c in range(1, C):
            m = (sem_labels == c) & point_mask
            sem_tot[c] += m.sum()
            sem_hit[c] += (sem_preds[m] == c).sum()

        prop = out.proposals
        gcls = majority_gt_class(prop, sem_labels, C)          # (B, P)
        pm = np.asarray(prop.proposal_mask)
        sizes = np.asarray(prop.proposal_size)
        scores = np.asarray(out.score_preds)
        ious = np.asarray(out.ious)                            # (B, P, I)
        isl = np.asarray(batch.instance_sem_labels)            # (B, I)
        scored = pm & (scores > cfg.model.val_score_threshold) & (
            sizes > cfg.model.val_min_num_points_per_proposal
        )
        kept = np.asarray(keep)
        bsz = pm.shape[0]
        for bi in range(bsz):
            for c in range(1, C):
                born = pm[bi] & (gcls[bi] == c)
                # IoU>0.5 against a GT instance of class c (class-filtered)
                iou_c = ious[bi].copy()
                iou_c[:, isl[bi] != c] = 0.0
                hit50 = born & (iou_c.max(1) > 0.5)
                row = agg[c]
                row[0] += (isl[bi] == c).sum()                 # gt
                row[1] += born.sum()                           # born
                row[2] += hit50.sum()                          # iou50
                row[3] += (born & scored[bi]).sum()            # scored
                row[4] += (born & kept[bi]).sum()              # kept
                # greedy match at 0.5 among kept of this GT-majority class
                row[5] += (hit50 & kept[bi]).sum()             # matchable
        # matched with PREDICTED class (what AP counts): reuse evaluator parts
        from gapartnet_tpu.eval.ap import _proposal_pred_classes
        pred_cls = _proposal_pred_classes(prop, sem_preds)
        for bi in range(bsz):
            for c in range(1, C):
                sel = kept[bi] & (pred_cls[bi] == c)
                iou_c = ious[bi].copy()
                iou_c[:, isl[bi] != c] = 0.0
                agg[c][6] += (sel & (iou_c.max(1) > 0.5)).sum()

    print(f"split={args.split} ckpt={ckpt}")
    hdr = f"{'class':22s} {'gt':>5s} {'semrec':>7s} {'born':>6s} {'iou50':>6s} " \
          f"{'scored':>7s} {'kept':>5s} {'match-gt':>9s} {'match-pred':>10s}"
    print(hdr)
    for c in range(1, C):
        row = agg[c]
        if row[0] == 0 and row[1] == 0:
            continue
        rec = sem_hit[c] / sem_tot[c] if sem_tot[c] else 0.0
        print(f"{PART_ID2NAME[c]:22s} {row[0]:5.0f} {rec:7.2%} {row[1]:6.0f} "
              f"{row[2]:6.0f} {row[3]:7.0f} {row[4]:5.0f} {row[5]:9.0f} "
              f"{row[6]:10.0f}")


if __name__ == "__main__":
    main()
