#!/usr/bin/env python
"""Break down the clustering stage: merged CCL vs compaction vs IoU etc."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from gapartnet_tpu.data.synthetic import synthetic_cloud
    from gapartnet_tpu.models.grouping import cluster_single
    from gapartnet_tpu.ops.hash_ccl import hash_connected_components
    from gapartnet_tpu.ops.iou import instance_seg_iou

    n = 20000
    c = synthetic_cloud(np.random.RandomState(0), num_points=n, num_parts=6)
    xyz = jnp.asarray(c["points"][:, :3])
    sem = jnp.asarray(c["sem_labels"])
    valid = jnp.asarray(c["sem_labels"] > 0)
    offsets = jnp.zeros((n, 3), jnp.float32)
    inst = jnp.asarray(c["instance_labels"])

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"{name:24s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)
        return out

    merged = jax.jit(
        lambda x, o, s, v: hash_connected_components(
            jnp.concatenate([x, x + o]),
            jnp.concatenate([s, s]),
            jnp.concatenate([v, v]),
            0.04,
            node_capacity=8192,
            set_mask=jnp.arange(2 * n) >= n,
        )
    )
    timeit("merged CCL", merged, xyz, offsets, sem, valid)

    clus = jax.jit(
        lambda x, o, s, v: cluster_single(
            x, o, s, v, 0.04, 50, 300, 5, 128, impl="hash",
            hash_node_capacity=4096,
        )
    )
    prop = timeit("cluster_single full", clus, xyz, offsets, sem, valid)

    iou = jax.jit(
        lambda pid, ei, m, sp, si: instance_seg_iou(
            pid, ei, m, sp, si, num_proposals=128, num_instances=64
        )
    )
    entry_inst = inst[prop.entry_point]
    npi = jnp.zeros((64,), jnp.int32) + 100
    timeit(
        "instance_seg_iou", iou,
        prop.entry_proposal, entry_inst, prop.entry_mask,
        prop.proposal_size, npi,
    )


if __name__ == "__main__":
    main()
