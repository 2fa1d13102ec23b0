#!/usr/bin/env python
"""Batched-eval throughput bench (BASELINE config #4 is a throughput config).

Times the REAL eval surface — `trainer.evaluate_splits` end to end, including
host-side AP matching and the queued once-per-split device fetch — over a
synthetic split of --clouds flagship-envelope clouds, and separately times the
jitted reduced eval step alone (N dispatches, one fetch — the only sync that
works through the remote-device tunnel) to attribute the non-compute overhead
per batch.  The reference's equivalent path is the Lightning test loop over
`model.py:807-857` + `on_test_epoch_end`.

Prints one JSON line:
  {"eval_clouds_per_sec", "step_ms_per_batch", "overhead_ms_per_batch", ...}

Fixed-shape graphs make throughput weight-independent (random init is fine:
score/NPCS stages run at static proposal capacity regardless of predictions).

    python tools/eval_bench.py            # TPU (the tunneled chip)
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/eval_bench.py --clouds 8 --points 512   # CPU smoke
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_split(root: Path, clouds: int, points: int):
    import numpy as np

    from gapartnet_tpu.data.synthetic import synthetic_cloud

    rng = np.random.RandomState(7)
    for split in ("val", "test_intra", "test_inter"):
        d = root / split / "pth"
        d.mkdir(parents=True, exist_ok=True)
        n = clouds if split == "test_intra" else 0
        for i in range(n):
            c = synthetic_cloud(rng, num_points=points, num_parts=4)
            np.savez(
                d / f"Box_{1000 + i}_00_000.npz",
                xyz=c["points"][:, :3], rgb=c["points"][:, 3:],
                sem_labels=c["sem_labels"],
                instance_labels=c["instance_labels"],
                gt_npcs=c["gt_npcs"],
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clouds", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--dir", default="/tmp/eval_bench_ds")
    ap.add_argument("--step-iters", type=int, default=0,
                    help="compute-only step timing iterations "
                         "(0 = max(10, clouds/batch); use 2 for CPU smokes)")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )

    root = Path(args.dir) / f"c{args.clouds}_p{args.points}"
    if not (root / "test_intra" / "pth").exists():
        build_split(root, args.clouds, args.points)

    from gapartnet_tpu.train import trainer as T
    from gapartnet_tpu.train.config import Config, DataConfig, TrainerConfig
    from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
    from gapartnet_tpu.train.loop import adam, create_train_state

    cfg = Config(
        model=GAPartNetConfig(), data=DataConfig(), trainer=TrainerConfig()
    )
    cfg.data = dataclasses.replace(
        cfg.data, root_dir=str(root), val_batch_size=args.batch, num_workers=0,
        max_points=args.points, auto_capacity=True,
    )
    cfg.model = dataclasses.replace(
        cfg.model, max_points=args.points, conv_compute_dtype="bfloat16",
    )
    cfg.trainer = dataclasses.replace(
        cfg.trainer, log_file="/tmp/eval_bench_metrics.jsonl", visualize=False,
    )

    datasets = T.build_datasets(cfg, "test")
    T._apply_auto_capacity(cfg, datasets)
    model = GAPartNet(cfg.model)
    logger = T.MetricLogger(cfg.trainer.log_file)
    example = T._np_batch_to_device(
        next(T._iter_batches(datasets["test_intra"], args.batch, False)), None
    )
    state = create_train_state(
        model, example, adam(cfg.trainer.learning_rate), seed=0
    )

    step_cache: dict = {}
    # warm every graph (compile + first-dispatch costs out of the timed run)
    T.evaluate_splits(model, state, cfg, datasets, 0, logger, 0,
                      do_instance=True, step_cache=step_cache)

    t0 = time.perf_counter()
    _, metrics = T.evaluate_splits(model, state, cfg, datasets, 0, logger, 1,
                                   do_instance=True, step_cache=step_cache)
    wall = time.perf_counter() - t0

    # compute-only reference: same jitted step, same batch, N dispatches
    eval_step = step_cache[("reduced", True)]
    iters = args.step_iters or max(10, args.clouds // args.batch)
    r = eval_step(state, example)
    np.asarray(r["all_accu"])  # sync (block_until_ready lies through the tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = eval_step(state, example)
    np.asarray(r["all_accu"])
    step_ms = (time.perf_counter() - t0) / iters * 1000

    num_batches = -(-args.clouds // args.batch)
    overhead_ms = max(0.0, (wall * 1000 - step_ms * num_batches) / num_batches)
    print(json.dumps({
        "metric": "batched_eval_throughput",
        "eval_clouds_per_sec": round(args.clouds / wall, 2),
        "wall_s": round(wall, 3),
        "step_ms_per_batch": round(step_ms, 1),
        "overhead_ms_per_batch": round(overhead_ms, 1),
        "clouds": args.clouds, "batch": args.batch, "points": args.points,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
