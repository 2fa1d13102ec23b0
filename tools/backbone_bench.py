#!/usr/bin/env python
"""Backbone stage breakdown: voxelize -> hierarchy build -> UNet convs."""

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
    import __graft_entry__ as g
    from gapartnet_tpu.models.gapartnet import (
        GAPartNet, GAPartNetConfig, prepare_input_grid, _gather_per_point,
    )
    from gapartnet_tpu.ops.sparse_conv import build_hierarchy

    cfg = GAPartNetConfig(conv_compute_dtype="bfloat16")
    model = GAPartNet(cfg)
    batch = g._make_batch(cfg.max_points, 1, cfg.max_instances, seed=0)
    variables = g.jitted_init(model, batch)

    def timeit(name, fn, *args, iters=15):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"{name:22s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

    def vox(b):
        return prepare_input_grid(b.points, b.point_mask, cfg)

    def hier(b):
        keys, vfeats, nvox, pcv = vox(b)
        h = build_hierarchy(
            keys, nvox, list(cfg.input_capacities()), extent=cfg.input_grid_extent
        )
        return h.levels[-1].subm_nbr, h.downsamples[-1].child_parent

    def hier_l0(b):
        keys, vfeats, nvox, pcv = vox(b)
        h = build_hierarchy(
            keys, nvox, list(cfg.input_capacities())[:1], extent=cfg.input_grid_extent
        )
        return h.levels[0].subm_nbr

    timeit("voxelize", jax.jit(vox), batch)
    timeit("vox+hier_l0", jax.jit(hier_l0), batch)
    timeit("vox+hier_all", jax.jit(hier), batch)
    timeit(
        "backbone full",
        jax.jit(lambda b: model.apply(b_1 := variables, b, train=False).sem_preds),
        batch,
    )


if __name__ == "__main__":
    main()
