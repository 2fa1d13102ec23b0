#!/usr/bin/env python
"""Stage profiling of the hash-grid CCL (the clustering hot loop).

Times cumulative prefixes (nodes -> probe -> edges -> full) of
hash_connected_components on the real chip at flagship shapes; deltas
attribute cost to the sort/table build, the 125-offset probe, the
rep-distance edge scan, and the label-propagation loop.

    python tools/ccl_bench.py [reps=8] [max_degree=48] [node_capacity=8192]
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

    kw = dict(node_capacity=8192)
    for a in sys.argv[1:]:
        k, v = a.split("=")
        try:
            kw[k] = int(v)
        except ValueError:
            kw[k] = v

    import jax.numpy as jnp

    clouds = [
        synthetic_cloud(np.random.RandomState(i), num_points=N, num_parts=6)
        for i in range(B)
    ]
    xyz = jnp.asarray(np.stack([c["points"][:, :3] for c in clouds]))
    sem = jnp.asarray(np.stack([c["sem_labels"] for c in clouds]))
    valid = jnp.asarray(np.stack([c["sem_labels"] > 0 for c in clouds]))

    prev = 0.0
    for stage in ("nodes", "probe", "edges", ""):
        fn = jax.jit(
            jax.vmap(
                lambda x, s, v: hash_connected_components(
                    x, s, v, 0.04, debug_stage=stage, **kw
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
