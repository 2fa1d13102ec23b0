"""Greedy non-maximum suppression over a dense IoU matrix.

TPU-native replacement for epic_ops.nms (reference
gapartnet/network/grouping_utils.py:221-246, which precomputes a dense pairwise
point-set IoU via CSR matmul then calls the CUDA nms kernel).  Semantics:
iterate proposals in descending score order; keep a proposal unless it overlaps
(IoU > threshold) an already-kept one.

Fixed shape: (P, P) IoU + (P,) scores + (P,) validity; the greedy pass is a
lax.fori_loop over P slots (P is a small static capacity).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def nms_single(ious: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray, threshold):
    """Returns keep mask (P,) bool.  Invalid proposals are never kept."""
    p = scores.shape[0]
    # stable descending sort by score; invalid slots sort last
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf), stable=True)

    def body(i, state):
        keep, suppressed = state
        idx = order[i]
        ok = valid[idx] & ~suppressed[idx]
        keep = keep.at[idx].set(ok)
        overlap = ious[idx] > threshold
        overlap = overlap.at[idx].set(False)
        suppressed = suppressed | (overlap & ok)
        return keep, suppressed

    keep0 = jnp.zeros((p,), bool)
    sup0 = jnp.zeros((p,), bool)
    keep, _ = lax.fori_loop(0, p, body, (keep0, sup0))
    return keep


@partial(jax.jit, static_argnames=("num_points",))
def pairwise_pointset_iou(
    entry_point_idx: jnp.ndarray,
    entry_proposal: jnp.ndarray,
    entry_mask: jnp.ndarray,
    num_points_per_proposal: jnp.ndarray,
    num_points: int,
):
    """Dense pairwise IoU between proposal point sets of one sample.

    Replaces the reference's torch CSR matmul (grouping_utils.py:231-243) with a
    membership-matrix matmul that maps straight onto the MXU:
      M[p, point] in {0, 1};  intersection = M @ M^T.

    entry_point_idx: (E,) point index of each proposal-point entry.
    entry_proposal:  (E,) proposal id per entry (-1 / masked = ignore).
    num_points_per_proposal: (P,)
    """
    p = num_points_per_proposal.shape[0]
    ok = entry_mask & (entry_proposal >= 0)
    rows = jnp.where(ok, entry_proposal, p)
    cols = jnp.where(ok, entry_point_idx, 0)
    membership = jnp.zeros((p + 1, num_points), jnp.float32).at[rows, cols].set(1.0)
    membership = membership[:p]
    inter = membership @ membership.T
    sizes = num_points_per_proposal.astype(jnp.float32)
    union = sizes[:, None] + sizes[None, :] - inter
    return inter / (union + 1e-8)
