"""Connected-components labeling on a fixed-shape neighbor graph.

TPU-native replacement for epic_ops.connected_components_labeling on the
ball-query graph (reference gapartnet/network/grouping_utils.py:130-137).
The CUDA kernel computes components of the (symmetrized) directed graph given
as CSR; here the graph is the (N, K) first-K neighbor list from
ops/ball_query.py.

Algorithm: min-label propagation with pointer jumping (path halving), a
classic O(log N)-round parallel CC.  Each round does
  pull:  l[i] <- min(l[i], min_j l[nbr(i, j)])
  push:  l[nbr(i, j)] <- min(l[nbr(i, j)], l[i])    (scatter-min; symmetrizes)
  jump:  l[i] <- l[l[i]]  (twice)
inside a lax.while_loop with an early exit on convergence and a hard bound.
Labels converge to the minimum point index of each component, matching the
"compacted=False" reference behavior of labeling by representative node.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("max_iters",))
def connected_components_single(
    neighbor_idx: jnp.ndarray,
    valid: jnp.ndarray,
    max_iters: int = 64,
):
    """One sample; vmap over the batch.

    Args:
      neighbor_idx: (N, K) int32, -1 padded out-neighbor lists.
      valid: (N,) bool node mask; invalid nodes label themselves.
    Returns:
      labels: (N,) int32 — min point index of each node's component.
    """
    n = neighbor_idx.shape[0]
    self_idx = jnp.arange(n, dtype=jnp.int32)
    nbr_ok = neighbor_idx >= 0
    nbr = jnp.where(nbr_ok, neighbor_idx, self_idx[:, None])

    def cond(state):
        labels, prev, it = state
        return (it < max_iters) & jnp.any(labels != prev)

    def body(state):
        labels, _, it = state
        prev = labels
        # pull
        nl = jnp.min(jnp.where(nbr_ok, labels[nbr], n), axis=1)
        labels = jnp.minimum(labels, nl)
        # push (scatter-min symmetrizes the capped directed graph)
        flat_targets = jnp.where(nbr_ok, nbr, n).reshape(-1)
        flat_vals = jnp.broadcast_to(labels[:, None], nbr.shape).reshape(-1)
        labels = labels.at[flat_targets].min(flat_vals, mode="drop")
        # pointer jumping (labels are point indices, so they index labels)
        labels = labels[labels]
        labels = labels[labels]
        return labels, prev, it + 1

    labels0 = self_idx
    labels, _, _ = lax.while_loop(
        cond, body, (labels0, jnp.full((n,), -1, jnp.int32), jnp.int32(0))
    )
    return jnp.where(valid, labels, self_idx)
