"""Proposal-vs-GT-instance IoU via segment histograms.

TPU-native replacement for epic_ops.iou.batch_instance_seg_iou (reference
gapartnet/network/model.py:373-378): the IoU of each proposal's point set
against each ground-truth instance's point set of the same sample.

Instead of a CUDA two-pass histogram, intersection counts come from one
segment_sum over fused (proposal, instance) ids — a fixed-shape scatter-add.
"""

from functools import partial

import jax
import jax.numpy as jnp

from gapartnet_tpu.ops.segment import segment_sum


@partial(jax.jit, static_argnames=("num_proposals", "num_instances"))
def instance_seg_iou(
    entry_proposal: jnp.ndarray,
    entry_instance: jnp.ndarray,
    entry_mask: jnp.ndarray,
    num_points_per_proposal: jnp.ndarray,
    num_points_per_instance: jnp.ndarray,
    num_proposals: int,
    num_instances: int,
):
    """One sample (vmap over batch).

    entry_proposal: (E,) proposal id per proposal-point entry (-1 ignore).
    entry_instance: (E,) GT instance label of the entry's point (-100 = none).
    num_points_per_proposal: (P,) int.
    num_points_per_instance: (I,) int (0 pads).
    Returns (P, I) float32 IoU.
    """
    ok = (
        entry_mask
        & (entry_proposal >= 0)
        & (entry_instance >= 0)
        & (entry_instance < num_instances)
    )
    fused = entry_proposal * num_instances + entry_instance
    inter = segment_sum(
        jnp.ones_like(fused, dtype=jnp.int32),
        fused,
        num_proposals * num_instances,
        mask=ok,
    ).reshape(num_proposals, num_instances)
    sizes_p = num_points_per_proposal.astype(jnp.float32)[:, None]
    sizes_i = num_points_per_instance.astype(jnp.float32)[None, :]
    union = sizes_p + sizes_i - inter
    return inter / jnp.maximum(union, 1.0)
