#!/usr/bin/env python
"""Stage-delta timing of the flagship inference forward on the real chip.

Times four nested forward graphs (backbone-only, +cluster, +score, full);
consecutive deltas attribute cost to clustering, ScoreNet, NPCSNet.
Honest tunnel timing: dispatch N iters, then one device->host fetch.

    python tools/stage_bench.py            # the ONE TPU process
    BENCH_BATCH=8 python tools/stage_bench.py
    BENCH_REAL=1 python tools/stage_bench.py   # the committed real-asset
                                               # cloud bench.py measures
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = int(os.environ.get("BENCH_BATCH", "1"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main():
    import jax
    import numpy as np

    import __graft_entry__ as g
    from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    overrides = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        try:
            v = eval(v)  # noqa: S307 - trusted CLI use
        except Exception:
            pass
        overrides[k] = v
    cfg = GAPartNetConfig(conv_compute_dtype="bfloat16", **overrides)
    cluster_sem = cluster_off = None
    if os.environ.get("BENCH_REAL"):
        import bench

        cfg, batch, cluster_sem, cluster_off = bench.real_cloud_setup(
            cfg,
            str(Path(__file__).resolve().parent.parent
                / "assets" / "bench_cloud.npz"),
            BATCH,
        )
    model = GAPartNet(cfg)
    if not os.environ.get("BENCH_REAL"):
        batch = g._make_batch(cfg.max_points, BATCH, cfg.max_instances, seed=0)
    variables = g.jitted_init(model, batch)

    stages = [
        ("backbone", dict(do_cluster=False, do_score=False, do_npcs=False)),
        ("cluster", dict(do_cluster=True, do_score=False, do_npcs=False)),
        ("score", dict(do_cluster=True, do_score=True, do_npcs=False)),
        ("full", dict(do_cluster=True, do_score=True, do_npcs=True)),
    ]
    prev = 0.0
    for name, flags in stages:
        fn = jax.jit(
            lambda b, fl=flags: model.apply(
                variables, b, train=False,
                cluster_sem_override=cluster_sem,
                cluster_offset_override=cluster_off, **fl
            ).sem_preds
            if not fl["do_cluster"]
            else model.apply(
                variables, b, train=False,
                cluster_sem_override=cluster_sem,
                cluster_offset_override=cluster_off, **fl
            )
        )
        out = fn(batch)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(batch)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:10s} {ms:8.1f} ms   (+{ms - prev:7.1f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
