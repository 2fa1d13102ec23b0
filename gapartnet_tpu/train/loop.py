"""Training / evaluation step factories.

Replaces the reference's LightningModule training plumbing
(model.py:466-692, 1051-1055): Adam(lr=1e-3), staged schedule gating
(epoch >= start_clustering / start_scorenet / start_npcs selects one of three
compiled step graphs), and per-step metric emission.

Each stage is a separately jitted function; under a device mesh the batch is
sharded over "dp" and parameters are replicated — XLA handles the gradient
all-reduce (see parallel/mesh.py).
"""

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig, ModelOutput
from gapartnet_tpu.structures import PointCloudBatch


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def stage_flags(epoch: int, training_schedule: Tuple[int, int]) -> Dict[str, bool]:
    """Reference gating (model.py:69-70, 528-601): clustering and ScoreNet

    from start_scorenet (= schedule[0], and start_clustering = min of both),
    NPCS from start_npcs (= schedule[1])."""
    start_scorenet, start_npcs = training_schedule
    start_clustering = min(start_scorenet, start_npcs)
    return dict(
        do_cluster=epoch >= start_clustering,
        do_score=epoch >= start_scorenet,
        do_npcs=epoch >= start_npcs,
    )


def create_train_state(
    model: GAPartNet,
    example_batch: PointCloudBatch,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
) -> TrainState:
    # init under jit: an eager flax init dispatches thousands of tiny ops,
    # pathological through a remote-device tunnel
    def _init(b):
        return model.init(
            {
                "params": jax.random.PRNGKey(seed),
                "proposal_jitter": jax.random.PRNGKey(seed + 1),
            },
            b, train=False, do_cluster=True, do_score=True, do_npcs=True,
        )

    variables = jax.jit(_init)(example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def loss_metrics(out: ModelOutput) -> Dict[str, jnp.ndarray]:
    """Metric names match the reference logging contract (model.py:607-657).

    Capacity-overflow counters (ModelOutput.counters) are appended under
    counters/* — nonzero values mean a fixed-shape capacity silently clipped
    real data and AP may be depressed; raise the corresponding capacity."""
    metrics = {
        "loss/total_loss": out.total_loss,
        "loss/loss_sem_seg": out.loss_sem_seg,
        "loss/loss_offset_dist": out.loss_offset_dist,
        "loss/loss_offset_dir": out.loss_offset_dir,
        "loss/loss_prop_score": out.loss_prop_score,
        "loss/loss_prop_npcs": out.loss_prop_npcs,
        "all_accu": out.all_accu * 100.0,
        "pixel_accu": out.pixel_accu * 100.0,
    }
    for k in sorted(out.counters or ()):
        metrics[f"counters/{k}"] = jnp.sum(out.counters[k]).astype(jnp.float32)
    return metrics


def make_train_step(
    model: GAPartNet,
    optimizer: optax.GradientTransformation,
    do_cluster: bool,
    do_score: bool,
    do_npcs: bool,
    donate: bool = True,
    freeze_prefixes: Tuple[str, ...] = (),
):
    flags = dict(do_cluster=do_cluster, do_score=do_score, do_npcs=do_npcs)

    def step(state: TrainState, batch: PointCloudBatch, rng: jax.Array):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, **flags,
                # frozen modules also normalize with their PINNED running
                # stats (not current batch stats), so the trainable heads
                # see the same trunk features at train and eval time
                # (ADVICE r4)
                frozen_bn=freeze_prefixes,
                rngs={"proposal_jitter": rng},
                mutable=["batch_stats"],
            )
            return out.total_loss, (out, mutated["batch_stats"])

        (loss, (out, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if freeze_prefixes:
            # frozen modules must not drift AT ALL — that includes their
            # BatchNorm running stats, which `mutable=["batch_stats"]`
            # otherwise keeps updating every step
            new_bs = type(new_bs)(
                {
                    k: (state.batch_stats[k]
                        if k in freeze_prefixes and k in state.batch_stats
                        else v)
                    for k, v in new_bs.items()
                }
            )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss_metrics(out)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: GAPartNet, do_cluster: bool, do_score: bool, do_npcs: bool):
    flags = dict(do_cluster=do_cluster, do_score=do_score, do_npcs=do_npcs)

    def step(state: TrainState, batch: PointCloudBatch) -> ModelOutput:
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, **flags,
        )

    return jax.jit(step)


def adam(
    learning_rate: float = 1e-3,
    freeze_prefixes: Tuple[str, ...] = (),
) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (model.py:1051-1055): b1=.9 b2=.999 eps=1e-8.

    freeze_prefixes: top-level param-tree module names whose updates are
    zeroed (optax.set_to_zero under multi_transform).  The reference has no
    freezing during fit — its warm-start (model.py:132-143) trains every
    loaded weight — but at few-hundred-view scale the all-stages phase-B
    loss measurably ERODES a warm-started sem head (fit_phase_b decay,
    PERF.md round 4 part 5); freezing the trunk makes phase B strictly
    additive (score/NPCS heads can only add AP on top of the frozen
    semantics, never destroy it).
    """
    tx = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if not freeze_prefixes:
        return tx
    fz = tuple(freeze_prefixes)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if _path_key(path[0]) in fz else "train",
            params,
        )

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label_fn
    )


def _path_key(entry) -> str:
    """Top-level pytree key as a string (DictKey / FlattenedIndexKey)."""
    return str(getattr(entry, "key", entry))
