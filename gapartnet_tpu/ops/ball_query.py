"""Label-constrained fixed-radius neighbor search (first-K, index order).

TPU-native replacement for epic_ops.ball_query as used by dual-set clustering
(reference gapartnet/network/grouping_utils.py:108-140): for each query point,
collect at most K neighbors that (a) lie within `radius`, (b) share the query's
semantic label, in ascending point-index order (the CUDA kernel scans points in
order and stops at K — "first hit" semantics, not nearest-K).

TPU design: "first K by index" == "K smallest indices among valid neighbors",
so the op is a tiled scan over point blocks keeping a running buffer of the K
smallest candidate indices per query (merged with `lax.top_k` on negated
indices).  Distances for a (query_block, point_block) tile are one fused
matmul-shaped VPU pass; shapes are fully static.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _pad_to(x, size, fill, axis=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@partial(jax.jit, static_argnames=("max_neighbors", "query_block", "point_block"))
def ball_query_single(
    pt_xyz: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    max_neighbors: int,
    query_block: int = 1024,
    point_block: int = 2048,
):
    """One sample; vmap over the batch for (B, N, ...) inputs.

    Args:
      pt_xyz: (N, 3) positions (queries == points, as in the reference call).
      labels: (N,) int semantic label per point.
      valid:  (N,) bool mask (invalid points neither query nor match).
    Returns:
      neighbor_idx: (N, max_neighbors) int32, -1 padded, ascending per row.
      counts: (N,) int32 number of valid neighbors.
    """
    n = pt_xyz.shape[0]
    k = max_neighbors
    r2 = jnp.float32(radius * radius)

    nq = -(-n // query_block) * query_block
    xyz_q = _pad_to(pt_xyz, nq, 0.0).reshape(-1, query_block, 3)
    lab_q = _pad_to(labels, nq, -1).reshape(-1, query_block)
    val_q = _pad_to(valid, nq, False).reshape(-1, query_block)

    np_ = -(-n // point_block) * point_block
    xyz_p = _pad_to(pt_xyz, np_, 0.0)
    lab_p = _pad_to(labels, np_, -2)
    val_p = _pad_to(valid, np_, False)
    num_ptiles = np_ // point_block

    def per_query_chunk(args):
        q_xyz, q_lab, q_val = args  # (Qb, 3), (Qb,), (Qb,)

        def scan_tile(buf, t):
            start = t * point_block
            p_xyz = lax.dynamic_slice(xyz_p, (start, 0), (point_block, 3))
            p_lab = lax.dynamic_slice(lab_p, (start,), (point_block,))
            p_val = lax.dynamic_slice(val_p, (start,), (point_block,))
            d2 = jnp.sum(
                (q_xyz[:, None, :] - p_xyz[None, :, :]) ** 2, axis=-1
            )  # (Qb, Pb)
            ok = (
                (d2 <= r2)
                & (q_lab[:, None] == p_lab[None, :])
                & q_val[:, None]
                & p_val[None, :]
            )
            cand = jnp.where(
                ok, start + jnp.arange(point_block, dtype=jnp.int32)[None, :], n
            )
            merged = jnp.concatenate([buf, cand], axis=1)
            # K smallest indices == top_k of negated values.
            neg_top, _ = lax.top_k(-merged, k)
            return -neg_top, None

        buf0 = jnp.full((query_block, k), n, dtype=jnp.int32)
        buf, _ = lax.scan(scan_tile, buf0, jnp.arange(num_ptiles))
        return buf

    bufs = lax.map(per_query_chunk, (xyz_q, lab_q, val_q))  # (chunks, Qb, K)
    buf = bufs.reshape(-1, k)[:n]
    counts = jnp.sum(buf < n, axis=1).astype(jnp.int32)
    neighbor_idx = jnp.where(buf < n, buf, -1)
    return neighbor_idx, counts
