#!/usr/bin/env python
"""Training-step timing on the real chip: fwd / fwd+bwd / full step deltas.

Times (1) the train-mode forward (loss only), (2) value_and_grad, and (3) the
full train step (grad + Adam + donated state), each at the same stage flags,
so deltas attribute cost to backward and optimizer.  Also sweeps the staged
schedule (backbone-only vs full) to localize backward cost.

Honest tunnel timing: dispatch N iters, then ONE device->host fetch
(block_until_ready does not sync through the remote-device tunnel).

    python tools/train_bench.py                 # B8, full staged flags
    BENCH_BATCH=16 python tools/train_bench.py remat_blocks=True
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as g
    from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
    from gapartnet_tpu.train.loop import adam, create_train_state, make_train_step

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
    model = GAPartNet(cfg)
    batch = g._make_batch(cfg.max_points, BATCH, cfg.max_instances, seed=0)
    optimizer = adam(1e-3)
    state = create_train_state(model, batch, optimizer)
    rng = jax.random.PRNGKey(7)

    stagesets = [
        ("backbone", dict(do_cluster=False, do_score=False, do_npcs=False)),
        ("full", dict(do_cluster=True, do_score=True, do_npcs=True)),
    ]

    def timed(fn, *args, fetch):
        out = fn(*args)
        np.asarray(fetch(out))  # compile + settle
        out = fn(*args)
        np.asarray(fetch(out))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(fetch(out))
        return (time.perf_counter() - t0) / ITERS

    for name, flags in stagesets:
        def loss_only(params, b, r, fl=flags):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                b, train=True, **fl, rngs={"proposal_jitter": r},
                mutable=["batch_stats"],
            )
            return out.total_loss

        fwd = jax.jit(loss_only)
        t_fwd = timed(fwd, state.params, batch, rng, fetch=lambda o: o)

        vg = jax.jit(jax.value_and_grad(loss_only))
        t_vg = timed(vg, state.params, batch, rng,
                     fetch=lambda o: jax.tree_util.tree_leaves(o[1])[0])

        step = make_train_step(model, optimizer, **flags, donate=False)
        t_step = timed(step, state, batch, rng,
                       fetch=lambda o: o[1]["loss/total_loss"])

        print(
            f"[{name}] B{BATCH}: fwd {t_fwd*1e3:7.1f} ms | "
            f"fwd+bwd {t_vg*1e3:7.1f} ms (bwd {1e3*(t_vg-t_fwd):7.1f}) | "
            f"step {t_step*1e3:7.1f} ms (opt {1e3*(t_step-t_vg):6.1f}) | "
            f"{BATCH/t_step:5.2f} clouds/s"
        )


if __name__ == "__main__":
    main()
