"""PointNet++ point operations.

TPU equivalents of the vendored pointnet_lib CUDA extension
(dataset/process_tools/utils/pointnet_lib/, SURVEY.md section 2.4a): the
reference vendors the whole library although its pipeline only exercises FPS
(+ gather).  All ops here are jitted fixed-shape XLA; FPS itself lives in
ops/fps.py.

Shapes follow the reference wrappers (pointnet2_utils.py): features are
channel-first (B, C, N) in the torch API; here everything is (B, N, C) /
(N, C) — channel-last, the natural TPU layout — with adapters trivial at call
sites.
"""

from functools import partial

import jax
import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[..., m, :] = points[..., idx[..., m], :]  (sampling_gpu.cu:8-83)."""
    return jnp.take_along_axis(
        points, idx[..., None].astype(jnp.int32), axis=-2
    )


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, C) + (M, S) -> (M, S, C) neighborhood gather

    (group_points_gpu.cu:8-86); batch via vmap."""
    return points[idx]


@partial(jax.jit, static_argnames=("k",))
def knn(query: jnp.ndarray, points: jnp.ndarray, k: int):
    """Brute-force k nearest neighbors (interpolate_gpu.cu:9-120 semantics:

    ascending by distance).  query (M, 3), points (N, 3) ->
    (dists (M, k), idx (M, k))."""
    d2 = jnp.sum((query[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg_top, 0.0)), idx.astype(jnp.int32)


def three_nn(query: jnp.ndarray, points: jnp.ndarray):
    """Three nearest neighbors (dist, idx)."""
    return knn(query, points, 3)


def three_interpolate(
    features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted 3-NN feature interpolation (interpolate_gpu.cu + wrapper):

    features (N, C), idx (M, 3), weight (M, 3) -> (M, C)."""
    g = features[idx]                        # (M, 3, C)
    return jnp.sum(g * weight[..., None], axis=1)


def interpolation_weights(dists: jnp.ndarray, eps: float = 1e-8):
    """Inverse-distance weights used by the reference FP module

    (pointnet2_modules.py semantics)."""
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def ball_query_simple(
    query: jnp.ndarray, points: jnp.ndarray, radius: float, nsample: int
):
    """Unlabeled first-K ball query (ball_query_gpu.cu:9-67 semantics,

    first-hit padding: empty slots repeat the first hit).  (M, 3), (N, 3) ->
    idx (M, nsample)."""
    n = points.shape[0]
    d2 = jnp.sum((query[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    ok = d2 <= radius * radius
    scores = jnp.where(ok, jnp.arange(n)[None, :], n)
    if n < nsample:  # fewer points than slots: pad candidate columns
        scores = jnp.pad(scores, ((0, 0), (0, nsample - n)), constant_values=n)
    neg_top, _ = jax.lax.top_k(-scores, nsample)
    idx = -neg_top                          # ascending first-K, n = none
    first = idx[:, :1]
    idx = jnp.where(idx >= n, first, idx)   # pad with the first hit
    return jnp.where(idx >= n, 0, idx).astype(jnp.int32)
