#!/usr/bin/env python
"""AP-parity evaluation against the reference checkpoint (BASELINE config #4).

Given the GAPartNet dataset tree and the reference release checkpoint
(release.ckpt / all_best_7816.ckpt), this converts the torch state_dict to
flax parameters (gapartnet_tpu/train/ckpt_convert.py) and runs the fixed mAP
evaluation over val / test_intra / test_inter with the exact reference
thresholds (score > 0.09, > 3 points, NMS IoU 0.3, AP IoU 0.50:0.05:0.95).

    python tools/eval_parity.py --data data/GAPartNet_All --ckpt release.ckpt \
        [--spatial-order xyz|zyx] [--clustering exact|hash] [--batch 8]

The spconv kernel-tap layout is proven "xyz" by the dense-grid oracle tests
(tests/test_ckpt_layout.py); --spatial-order zyx remains as an A/B escape
hatch only.  Clustering defaults to the exact reference-parity path (ball
query with the 50/300 per-query caps + CCL) so the proposal sets match the
reference's neighbor semantics; use --clustering hash to measure the fast
path's AP delta.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--spatial-order", default="xyz", choices=["xyz", "zyx"])
    ap.add_argument("--clustering", default="exact", choices=["exact", "hash"])
    ap.add_argument("--splits", nargs="*", default=["val", "test_intra", "test_inter"])
    ap.add_argument("--bf16", action="store_true", help="bf16 conv compute")
    args = ap.parse_args()

    from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
    from gapartnet_tpu.train.ckpt_convert import load_reference_ckpt
    from gapartnet_tpu.train.config import Config, DataConfig, TrainerConfig
    from gapartnet_tpu.train import trainer as T

    cfg = Config(
        model=GAPartNetConfig(
            conv_compute_dtype="bfloat16" if args.bf16 else "float32",
            clustering_impl=args.clustering,
        ),
        data=DataConfig(
            root_dir=args.data, val_batch_size=args.batch,
            nopart_path=str(Path(args.data) / "nopart.txt"),
        ),
        trainer=TrainerConfig(),
    )

    print(f"[parity] converting {args.ckpt} (spatial_order={args.spatial_order})")
    params, batch_stats = load_reference_ckpt(
        args.ckpt, channels=cfg.model.channels,
        block_repeat=cfg.model.block_repeat,
        spatial_order=args.spatial_order,
    )

    model = GAPartNet(cfg.model)
    datasets = T.build_datasets(cfg, "test")
    from gapartnet_tpu.train.loop import TrainState, adam

    state = TrainState(
        params=params, batch_stats=batch_stats,
        opt_state=None, step=0,
    )
    logger = T.MetricLogger("parity_metrics.jsonl")
    _, metrics = T.evaluate_splits(
        model, state, cfg, datasets, 0, logger, 0, do_instance=True
    )
    print("\n[parity] results (compare against the reference's `train.py test`"
          " with the same checkpoint):")
    for k in sorted(metrics):
        print(f"  {k}: {metrics[k]:.2f}")


if __name__ == "__main__":
    main()
