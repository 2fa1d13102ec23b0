"""Furthest point sampling.

TPU-native replacement for pointnet2_cuda.furthest_point_sampling (reference
dataset/process_tools/utils/pointnet_lib/src/sampling_gpu.cu:93-253, Python
wrapper pointnet2_utils.py:10-37): greedy max-min-distance sampling seeded at
index 0, used to downsample rendered clouds to 20000 points
(convert_rendered_into_input.py:90-175, structure/utils.py:345-376).

Design: a lax.fori_loop carrying the running min-distance field; each step is
one fused distance update + argmax over N — pure VPU work with static shapes.
Invalid (masked) points never get selected (their distance is pinned at -inf).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sampling_single(
    pt_xyz: jnp.ndarray,
    num_samples: int,
    valid=None,
    start_idx: int = 0,
):
    """One sample; vmap over batch.  Returns (num_samples,) int32 indices.

    If fewer than num_samples valid points exist, indices repeat the argmax of
    a zero field (harmless; callers gather with them).
    """
    n = pt_xyz.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    neg_inf = jnp.float32(-jnp.inf)

    def body(i, state):
        dists, last, out = state
        d = jnp.sum((pt_xyz - pt_xyz[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        masked = jnp.where(valid, dists, neg_inf)
        nxt = jnp.argmax(masked).astype(jnp.int32)
        out = out.at[i].set(nxt)
        return dists, nxt, out

    out0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(start_idx)
    dists0 = jnp.full((n,), jnp.inf, jnp.float32)
    _, _, out = lax.fori_loop(
        1, num_samples, body, (dists0, jnp.int32(start_idx), out0)
    )
    return out
