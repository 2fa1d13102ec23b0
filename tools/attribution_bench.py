#!/usr/bin/env python
"""Bandwidth / MFU attribution of the inference forward (VERDICT r4 #8).

For each nested stage graph (backbone-only, +cluster, +score, full) this
combines XLA's own cost model (compiled.cost_analysis(): flops + bytes
accessed) with measured wall time to report, per stage DELTA:

    ms | GFLOP | GB moved | achieved TFLOP/s (% of 197 bf16 peak)
       | achieved GB/s (% of 819 HBM peak)

grounding "gather-bound" claims in numbers: a stage whose bandwidth
utilization dwarfs its MFU is HBM-rate-bound and scales with the v5e->v5p
bandwidth ratio (3.38x), not the FLOP ratio (BASELINE.md v5p projection).

    python tools/attribution_bench.py          # the ONE TPU process
    BENCH_REAL=1 python tools/attribution_bench.py   # committed real cloud
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = int(os.environ.get("BENCH_BATCH", "1"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
# public v5e per-chip peaks (jax-ml.github.io/scaling-book numbers)
PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBS = 819.0


def main():
    import jax
    import numpy as np

    import __graft_entry__ as g
    from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    cfg = GAPartNetConfig(conv_compute_dtype="bfloat16")
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
    rows = []
    prev = dict(ms=0.0, gflop=0.0, gb=0.0)
    for name, flags in stages:
        def fn(b, fl=flags):
            out = model.apply(
                variables, b, train=False,
                cluster_sem_override=cluster_sem,
                cluster_offset_override=cluster_off, **fl
            )
            return out.sem_preds if not fl["do_cluster"] else out

        compiled = jax.jit(fn).lower(batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        gflop = float(ca.get("flops", 0.0)) / 1e9
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9

        out = compiled(batch)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = compiled(batch)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3

        d_ms = ms - prev["ms"]
        d_gf = gflop - prev["gflop"]
        d_gb = gb - prev["gb"]
        tflops = d_gf / max(d_ms, 1e-9)  # GFLOP / ms == TFLOP/s
        gbs = d_gb / max(d_ms, 1e-9) * 1e3
        rows.append(dict(
            stage=name, delta_ms=round(d_ms, 1), gflop=round(d_gf, 2),
            gb_moved=round(d_gb, 3), tflops=round(tflops, 2),
            mfu_pct=round(100 * tflops / PEAK_TFLOPS_BF16, 2),
            gbs=round(gbs, 1),
            bw_util_pct=round(100 * gbs / PEAK_HBM_GBS, 1),
            cum_ms=round(ms, 1),
        ))
        prev = dict(ms=ms, gflop=gflop, gb=gb)

    print(f"# B={BATCH} iters={ITERS} "
          f"input={'real' if os.environ.get('BENCH_REAL') else 'synthetic'}")
    hdr = ("stage", "delta_ms", "gflop", "gb_moved", "tflops", "mfu_pct",
           "gbs", "bw_util_pct", "cum_ms")
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r[h]) for h in hdr))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
