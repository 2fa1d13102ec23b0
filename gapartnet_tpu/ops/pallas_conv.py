"""Pallas TPU kernel for submanifold sparse convolution.

The XLA formulation (ops/sparse_conv.subm_conv_apply) gathers 27 neighbor
feature rows per voxel from HBM; TPU random gathers run at a few elements per
cycle, which made these convs gather-bound.  Here the whole per-sample feature
matrix (V x Cin, ~1-3 MB for this model family) is pinned in VMEM, the 27-tap
gather happens at VMEM speed, and each tile issues one (TILE, 27*Cin) @
(27*Cin, Cout) MXU matmul.

The backward pass reuses the same kernel with the tap-reversed rulebook and
transposed weights: output site i reads neighbor j at offset o iff j reads i
at offset -o, so d_feats = subm_conv(d_out, nbr[::-1], W_rev_transposed).
d_W re-gathers features once per backward (einsum in XLA).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _kernel(feats_ref, nbr_ref, w_ref, out_ref):
    """feats: (V, Cin) VMEM-resident; nbr tile: (K, TILE); w: (K*Cin, Cout)."""
    k = nbr_ref.shape[0]
    cin = feats_ref.shape[1]
    idx = nbr_ref[...]                                  # (K, TILE)
    feats = feats_ref[...]                              # (V, Cin)
    g = jnp.take(feats, idx.reshape(-1).clip(0), axis=0)  # (K*TILE, Cin)
    g = jnp.where(idx.reshape(-1, 1) >= 0, g, 0.0)
    g = g.reshape(k, -1, cin).transpose(1, 0, 2).reshape(-1, k * cin)
    out_ref[...] = jnp.dot(g, w_ref[...], preferred_element_type=jnp.float32)


def _subm_conv_pallas_single(features, nbr, weights):
    v, cin = features.shape
    k = nbr.shape[0]
    cout = weights.shape[-1]
    w2 = weights.reshape(k * cin, cout)
    num_tiles = -(-v // TILE)
    vpad = num_tiles * TILE
    if vpad != v:
        nbr = jnp.pad(nbr, ((0, 0), (0, vpad - v)), constant_values=-1)

    out = pl.pallas_call(
        _kernel,
        grid=(num_tiles,),
        in_specs=[
            # whole feature matrix resident in VMEM across all grid steps
            pl.BlockSpec((v, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vpad, cout), jnp.float32),
    )(features.astype(jnp.float32), nbr, w2.astype(jnp.float32))
    return out[:v]


@jax.custom_vjp
def subm_conv_pallas(features, nbr, weights):
    """features (B, V, Cin), nbr (B, K, V), weights (K, Cin, Cout)."""
    return jax.vmap(lambda f, n: _subm_conv_pallas_single(f, n, weights))(
        features, nbr
    )


def _fwd(features, nbr, weights):
    return subm_conv_pallas(features, nbr, weights), (features, nbr, weights)


def _bwd(res, g):
    features, nbr, weights = res
    k = weights.shape[0]
    # d_feats[j] = sum_m g[nbr_m(j)] @ W[26-m]^T  (the pair (i reads j at
    # offset o) transposes to (j reads i at -o); tap enumeration reversal
    # negates offsets, so the rulebook stays as-is and the WEIGHTS reverse)
    w_rev_t = jnp.flip(weights, axis=0).transpose(0, 2, 1)  # (K, Cout, Cin)
    d_feats = jax.vmap(
        lambda gi, ni: _subm_conv_pallas_single(gi, ni, w_rev_t)
    )(g, nbr)

    # dW[k] = sum_b gather_k(feats)^T @ g   (XLA gather; backward-only cost)
    def dw_one(f, n, gi):
        gk = f[n.clip(0)]                                  # (K, V, Cin)
        gk = jnp.where((n >= 0)[..., None], gk, 0.0)
        return jnp.einsum("kvc,vd->kcd", gk, gi, preferred_element_type=jnp.float32)

    d_w = jax.vmap(dw_one)(features, nbr, g).sum(0)
    return d_feats, None, d_w


subm_conv_pallas.defvjp(_fwd, _bwd)


def enabled() -> bool:
    """Use the Pallas kernel on TPU unless GAPARTNET_PALLAS=0."""
    import os

    if os.environ.get("GAPARTNET_PALLAS", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def supported(features, nbr) -> bool:
    """VMEM residency check: feature matrix + tile buffers must fit."""
    v, cin = features.shape[-2:]
    k = nbr.shape[-2]
    feat_bytes = v * cin * 4
    tile_bytes = TILE * k * cin * 4 * 2
    return feat_bytes + tile_bytes < 10 * 1024 * 1024
