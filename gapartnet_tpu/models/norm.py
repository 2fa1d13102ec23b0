"""Masked batch normalization for padded sparse tensors.

Replaces the reference's nn.BatchNorm1d(eps=1e-4, momentum=0.1) over
concatenated voxel/point features (model.py:86).  Our tensors carry padding,
so batch statistics are computed over valid elements only.  Under pjit with
the batch axis sharded, the means below are global (XLA inserts the
cross-device reductions), which gives synchronized BN across the mesh — the
DDP reference runs per-GPU BN; sync-BN is statistically equivalent or better.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the channel (last) axis of (..., C) with a validity mask.

    Matches torch BatchNorm1d semantics: biased batch variance for
    normalization, running stats updated as (1 - momentum) * old + momentum *
    new with the *unbiased* variance (torch updates running_var with unbiased).
    """

    momentum: float = 0.1
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            if mask is None:
                cnt = jnp.float32(x.size // c)
                mean = jnp.mean(x.reshape(-1, c), axis=0)
                var = jnp.mean(x.reshape(-1, c) ** 2, axis=0) - mean**2
            else:
                w = mask.astype(jnp.float32).reshape(-1)
                cnt = jnp.maximum(w.sum(), 1.0)
                xf = x.reshape(-1, c)
                mean = (xf * w[:, None]).sum(0) / cnt
                var = ((xf - mean) ** 2 * w[:, None]).sum(0) / cnt
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (x - mean) * (inv * scale) + bias
