"""Fixed-shape segment reductions.

TPU-native replacements for the reference's CUDA segment ops:
  - epic_ops.reduce.segmented_reduce (sum/min/max over CSR ranges,
    reference gapartnet/network/grouping_utils.py:59-70)
  - epic_ops.reduce.segmented_maxpool (reference gapartnet/network/model.py:360-362)
  - torch.segment_reduce(..., "mean") (reference grouping_utils.py:39-41)

Instead of CSR (begin, end) ranges over dynamically-sized tensors, every op here
takes a per-element segment id plus a validity mask and a static segment count,
so shapes stay fixed under jit.  Invalid elements (mask=False) contribute
nothing.  XLA lowers jax.ops.segment_* to sorted scatter-adds that fuse well.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_ids(segment_ids: jnp.ndarray, mask: Optional[jnp.ndarray], num_segments: int):
    """Route invalid elements to a dummy trailing segment."""
    if mask is None:
        return segment_ids, num_segments
    ids = jnp.where(mask, segment_ids, num_segments)
    return ids, num_segments + 1


def segment_sum(values, segment_ids, num_segments: int, mask=None):
    ids, n = _masked_ids(segment_ids, mask, num_segments)
    out = jax.ops.segment_sum(values, ids, num_segments=n)
    return out[:num_segments]


def segment_count(segment_ids, num_segments: int, mask=None):
    ones = jnp.ones(segment_ids.shape[:1], dtype=jnp.int32)
    return segment_sum(ones, segment_ids, num_segments, mask=mask)


def segment_mean(values, segment_ids, num_segments: int, mask=None):
    total = segment_sum(values, segment_ids, num_segments, mask=mask)
    count = segment_count(segment_ids, num_segments, mask=mask)
    denom = jnp.maximum(count, 1).astype(values.dtype)
    if values.ndim > 1:
        denom = denom.reshape(denom.shape + (1,) * (values.ndim - 1))
    return total / denom


def segment_min(values, segment_ids, num_segments: int, mask=None):
    ids, n = _masked_ids(segment_ids, mask, num_segments)
    out = jax.ops.segment_min(values, ids, num_segments=n)
    return out[:num_segments]


def segment_max(values, segment_ids, num_segments: int, mask=None):
    ids, n = _masked_ids(segment_ids, mask, num_segments)
    out = jax.ops.segment_max(values, ids, num_segments=n)
    return out[:num_segments]


def segmented_maxpool(features, segment_ids, num_segments: int, mask=None):
    """Per-segment max pool over features (N, C) -> (num_segments, C).

    Segments with no valid elements pool to 0 (the reference never pools an
    empty proposal; zeros keep downstream matmuls finite for padded slots).
    """
    pooled = segment_max(features, segment_ids, num_segments, mask=mask)
    count = segment_count(segment_ids, num_segments, mask=mask)
    nonempty = (count > 0)[:, None]
    return jnp.where(nonempty, pooled, jnp.zeros_like(pooled))
