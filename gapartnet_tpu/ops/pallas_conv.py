"""Pallas TPU kernel for submanifold sparse convolution.

The XLA formulation (ops/sparse_conv.subm_conv_apply) gathers 27 neighbor
feature rows per voxel from HBM; TPU random gathers run at ~0.1 element/cycle,
which made these convs gather-bound.  Here the per-sample feature matrix stays
VMEM-resident and the taps are fetched with Mosaic's `tpu.dynamic_gather`
(via jnp.take_along_axis), which requires table shape == index shape: the
feature table is padded to exactly 27 * TILE rows, and each grid step's
full-table gather produces the 27 taps for TILE output voxels, followed by 27
small MXU matmuls.

The backward pass reuses the same kernel: output site i reads neighbor j at
offset o iff j reads i at offset -o, and the tap enumeration reversal negates
offsets, so d_feats = subm_conv(d_out, nbr, W_tap_reversed_transposed).
d_W re-gathers features once per backward (XLA einsum).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_TAPS = 27


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(feats_ref, nbr_ref, w_ref, out_ref):
    """feats: (27*TILE, Cin) VMEM table; nbr tile: (27, TILE);

    w: (27, Cin, Cout); out: (TILE, Cout)."""
    vpad, cin = feats_ref.shape
    k, tile = nbr_ref.shape
    cout = w_ref.shape[-1]

    idx = nbr_ref[...].reshape(-1)                     # (27*TILE,) == (vpad,)
    safe = jnp.broadcast_to(idx.clip(0)[:, None], (vpad, cin))
    g = jnp.take_along_axis(feats_ref[...], safe, axis=0)   # (vpad, cin)
    g = jnp.where((idx >= 0)[:, None], g, 0.0)
    g3 = g.reshape(k, tile, cin)

    acc = jnp.zeros((tile, cout), jnp.float32)
    for kk in range(k):
        acc = acc + jnp.dot(
            g3[kk], w_ref[kk], preferred_element_type=jnp.float32
        )
    out_ref[...] = acc


def _subm_conv_pallas_single(features, nbr, weights):
    v, cin = features.shape
    k = nbr.shape[0]
    assert k == K_TAPS, k
    cout = weights.shape[-1]

    # table rows must equal 27 * TILE (Mosaic dynamic_gather shape rule)
    tile = _round_up(-(-v // K_TAPS), 8)
    vpad = K_TAPS * tile
    feats_p = jnp.pad(features, ((0, vpad - v), (0, 0)))
    num_tiles = -(-v // tile)
    npad = num_tiles * tile
    nbr_p = jnp.pad(nbr, ((0, 0), (0, npad - v)), constant_values=-1)

    out = pl.pallas_call(
        _kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((vpad, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TAPS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (K_TAPS, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, cout), jnp.float32),
    )(feats_p.astype(jnp.float32), nbr_p, weights.astype(jnp.float32))
    return out[:v]


@jax.custom_vjp
def subm_conv_pallas(features, nbr, weights):
    """features (B, V, Cin), nbr (B, 27, V), weights (27, Cin, Cout)."""
    return jax.vmap(lambda f, n: _subm_conv_pallas_single(f, n, weights))(
        features, nbr
    )


def _fwd(features, nbr, weights):
    return subm_conv_pallas(features, nbr, weights), (features, nbr, weights)


def _bwd(res, g):
    features, nbr, weights = res
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
    """VMEM residency check: padded table + tile buffers must fit."""
    v, cin = features.shape[-2:]
    tile = _round_up(-(-v // K_TAPS), 8)
    vpad = K_TAPS * tile
    feat_bytes = vpad * cin * 4
    return feat_bytes * 3 < 12 * 1024 * 1024
