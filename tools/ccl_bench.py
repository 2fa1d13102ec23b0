#!/usr/bin/env python
"""Stage profiling of the hash-grid CCL (the clustering hot loop).

Times cumulative prefixes (nodes -> probe -> edges -> full) of
hash_connected_components on the real chip at flagship shapes; deltas
attribute cost to the sort/table build, the 125-offset probe, the
rep-distance edge scan, and the label-propagation loop.

    python tools/ccl_bench.py [reps=8] [max_degree=48] [node_capacity=8192]

CCL_REAL=1 switches the input to the committed real-asset cloud
(assets/bench_cloud.npz) in the model's exact dual-set form (both sets
merged into one 2N call with set-2 cells stride-shifted, offsets = GT
instance-center pulls, models/grouping.py cluster_single) and the table
shapes bench.py measures at (node cap / cand cap sized from the cloud's
occupancy) — the honest serving-shape CCL profile.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("CCL_N", "20000"))
B = int(os.environ.get("CCL_BATCH", "1"))  # vmapped samples, as in the model
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def main():
    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from gapartnet_tpu.data.synthetic import synthetic_cloud
    from gapartnet_tpu.ops.hash_ccl import hash_connected_components

    kw = {} if os.environ.get("CCL_REAL") else dict(node_capacity=8192)
    for a in sys.argv[1:]:
        k, v = a.split("=")
        try:
            kw[k] = int(v)
        except ValueError:
            kw[k] = v

    import jax.numpy as jnp

    set_mask = None
    if os.environ.get("CCL_REAL"):
        d = np.load(Path(__file__).resolve().parent.parent
                    / "assets" / "bench_cloud.npz")
        pxyz, psem = d["xyz"].astype(np.float32), d["sem_labels"].astype(np.int32)
        ins = d["instance_labels"]
        # GT instance-center offsets (what the trained offset head predicts)
        centers = np.zeros_like(pxyz)
        for i in np.unique(ins[ins >= 0]):
            centers[ins == i] = pxyz[ins == i].mean(0)
        off = np.where((ins >= 0)[:, None], centers - pxyz, 0.0).astype(np.float32)
        n = len(pxyz)
        # the model's merged dual-set call (cluster_single): [xyz; xyz + off]
        xyz = jnp.asarray(np.tile(
            np.concatenate([pxyz, pxyz + off])[None], (B, 1, 1)))
        sem = jnp.asarray(np.tile(np.concatenate([psem, psem])[None], (B, 1)))
        v1 = psem > 0
        valid = jnp.asarray(np.tile(np.concatenate([v1, v1])[None], (B, 1)))
        set_mask = jnp.asarray(np.arange(2 * n) >= n)
        # bench.py's data-sized tables (data/capacity.py rule)
        from gapartnet_tpu.data.capacity import (
            _hash_connected_degree,
            _hash_occupancy,
        )

        n_nodes, cmax = _hash_occupancy(
            pxyz[v1].astype(np.float64), psem[v1].astype(np.int64), 0.04)
        node_cap = min(max(-(-int(min(n_nodes * 1.3, v1.sum())) // 256) * 256,
                           256), n)
        cand = -(-min(cmax + 8, 62) // 4) * 4
        deg = max(
            _hash_connected_degree(
                pxyz[v1].astype(np.float64), psem[v1].astype(np.int64), 0.04),
            _hash_connected_degree(
                (pxyz + off)[v1].astype(np.float64),
                psem[v1].astype(np.int64), 0.04),
        )
        degree = min(max(-(-(deg + 6) // 4) * 4, 8), cand)
        kw.setdefault("node_capacity", 2 * node_cap)
        kw.setdefault("cand_cap", cand)
        kw.setdefault("max_degree", degree)
        print(f"real cloud: fg={int(v1.sum())} nodes/set~{n_nodes} "
              f"m={kw['node_capacity']} cand={cand} degree={degree}",
              flush=True)
    else:
        clouds = [
            synthetic_cloud(np.random.RandomState(i), num_points=N, num_parts=6)
            for i in range(B)
        ]
        xyz = jnp.asarray(np.stack([c["points"][:, :3] for c in clouds]))
        sem = jnp.asarray(np.stack([c["sem_labels"] for c in clouds]))
        valid = jnp.asarray(np.stack([c["sem_labels"] > 0 for c in clouds]))

    if os.environ.get("CCL_ITER_SWEEP"):
        # propagation-cost anatomy: time the full pass at increasing
        # max_iters; the curve flattens at the converged iteration count
        # (while_loop early-exits), and the pre-plateau slope is the
        # per-iteration cost of the pull+push+jump body
        ref = None
        for mi in (1, 2, 3, 4, 6, 8, 12, 16, 32):
            fn = jax.jit(jax.vmap(
                lambda x, s, v: hash_connected_components(
                    x, s, v, 0.04, max_iters=mi, set_mask=set_mask, **kw)))
            out = fn(xyz, sem, valid)
            lab = np.asarray(out[0])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(xyz, sem, valid)
            np.asarray(out[0][0, 0])
            ms = (time.perf_counter() - t0) / ITERS * 1000
            if ref is None and mi == 32:
                ref = lab
            ncomp = len(np.unique(lab[0]))
            print(f"max_iters={mi:3d}  {ms:8.2f} ms  components={ncomp}",
                  flush=True)
        return

    prev = 0.0
    for stage in ("nodes", "probe", "edges", ""):
        fn = jax.jit(
            jax.vmap(
                lambda x, s, v: hash_connected_components(
                    x, s, v, 0.04, debug_stage=stage, set_mask=set_mask, **kw
                )
            )
        )
        out = fn(xyz, sem, valid)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(xyz, sem, valid)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ms = (time.perf_counter() - t0) / ITERS * 1000
        name = stage or "full"
        print(f"{name:8s} {ms:8.2f} ms   (+{ms - prev:7.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
