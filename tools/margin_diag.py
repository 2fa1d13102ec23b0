#!/usr/bin/env python
"""Semantic-head escape diagnostic: foreground logit-margin trend.

For each checkpoint of a (possibly in-flight) run, reports on one training
batch: the margin between each ground-truth-foreground point's correct-class
logit and its background logit.  A healthy run's margin RISES toward 0; a run
sinking into the all-background valley shows a FALLING margin while the total
loss still decreases (background confidence) — the failure mode that cost the
first two few-shot artifact runs (PERF.md round 3).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/margin_diag.py \
        --workdir runs/sustained_r3_cpu --data /tmp/sustained_data_4k --points 4096
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--ckpts", nargs="*", default=None,
                    help="checkpoint names under <workdir>/checkpoints "
                         "(default: all, sorted, plus 'last')")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from sustained_run import make_cfg  # noqa: E402 (tools/ sibling)

    from gapartnet_tpu.models.gapartnet import GAPartNet
    from gapartnet_tpu.train import trainer as T
    from gapartnet_tpu.train.loop import adam, create_train_state

    wd = Path(args.workdir)
    cfg = make_cfg(Path(args.data), wd, 8, "margin_diag.jsonl",
                   n_points=args.points)
    datasets = T.build_datasets(cfg, "fit")
    T._apply_auto_capacity(cfg, datasets)
    model = GAPartNet(cfg.model)
    batch = T._np_batch_to_device(
        next(T._iter_batches(datasets["train"], 4, True, 0)), None)
    create_train_state(model, batch, adam(1e-3), seed=0)  # shape init only

    @jax.jit
    def sem_logits(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False, do_cluster=False, do_score=False, do_npcs=False)
        return out.sem_logits, out.sem_preds

    names = args.ckpts
    if not names:
        names = sorted(
            p.name for p in (wd / "checkpoints").iterdir()
            if p.name.startswith("epoch_")
        ) + ["last"]
    sem = np.asarray(batch.sem_labels)
    maskv = np.asarray(batch.point_mask)
    fg = (sem > 0) & maskv
    print(f"{'ckpt':28s} {'mean':>7s} {'p50':>7s} {'p90':>7s} "
          f"{'frac>0':>7s} {'predfg%':>8s}")
    for name in names:
        p = wd / "checkpoints" / name
        if not p.exists():
            continue
        r = T.CkptManager.restore(str(p))
        lg, preds = sem_logits(r["params"], r["batch_stats"], batch)
        lg, preds = np.asarray(lg), np.asarray(preds)
        fg_lg = lg[fg]
        margin = fg_lg[np.arange(len(fg_lg)), sem[fg]] - fg_lg[:, 0]
        print(f"{name:28s} {margin.mean():7.3f} "
              f"{np.percentile(margin, 50):7.3f} "
              f"{np.percentile(margin, 90):7.3f} "
              f"{(margin > 0).mean():7.3f} "
              f"{(preds[maskv] > 0).mean() * 100:8.3f}")


if __name__ == "__main__":
    main()
