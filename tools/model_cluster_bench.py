#!/usr/bin/env python
"""Incremental timing inside the model's cluster stage (flagship shapes)."""

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
    from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig

    cfg = GAPartNetConfig(conv_compute_dtype="bfloat16")
    model = GAPartNet(cfg)
    batch = g._make_batch(cfg.max_points, 1, cfg.max_instances, seed=0)
    variables = g.jitted_init(model, batch)

    def timeit(name, fn, *args, iters=10):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"{name:22s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

    def run(ret, b):
        out = model.apply(variables, b, train=False, do_cluster=True,
                          do_score=False, do_npcs=False)
        if ret == "prop_entries":
            return out.proposals.entry_proposal
        if ret == "prop_all":
            return out.proposals
        if ret == "sem_only":
            return out.sem_preds
        if ret == "ious":
            return out.ious
        return out

    for ret in ("sem_only", "prop_entries", "prop_all", "ious", "everything"):
        timeit(ret, jax.jit(lambda b, r=ret: run(r, b)), batch)


if __name__ == "__main__":
    main()
