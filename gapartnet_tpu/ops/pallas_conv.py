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
    """Channel-major layout: feats (Cin, V), nbr (27, V), w (27, Cout, Cin),

    out (Cout, V).  Per tap: lane-wise dynamic_gather of the tap's neighbor
    columns, then one (Cout, Cin) @ (Cin, V) MXU matmul, accumulated.
    V rides the lane dimension, so a 16-channel feature matrix wastes no VMEM
    tiles and the matmul N dimension is large.
    """
    cin, v = feats_ref.shape
    k = nbr_ref.shape[0]
    cout = w_ref.shape[1]
    feats = feats_ref[...]

    acc = jnp.zeros((cout, v), jnp.float32)
    for kk in range(k):
        idx = nbr_ref[kk : kk + 1, :]                      # (1, V)
        safe = jnp.broadcast_to(idx.clip(0), (cin, v))
        g = jnp.take_along_axis(feats, safe, axis=1)       # (Cin, V)
        g = jnp.where(idx >= 0, g, 0.0)
        acc = acc + jnp.dot(
            w_ref[kk], g, preferred_element_type=jnp.float32
        )
    out_ref[...] = acc


def _subm_conv_pallas_single(features, nbr, weights):
    v, cin = features.shape
    k = nbr.shape[0]
    assert k == K_TAPS, k
    cout = weights.shape[-1]

    vpad = _round_up(v, 128)  # lane alignment
    feats_t = jnp.pad(features, ((0, vpad - v), (0, 0))).T  # (Cin, Vp)
    nbr_p = jnp.pad(nbr, ((0, 0), (0, vpad - v)), constant_values=-1)
    w_t = weights.transpose(0, 2, 1)  # (K, Cout, Cin)

    out = pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec((cin, vpad), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TAPS, vpad), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (K_TAPS, cout, cin), lambda: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((cout, vpad), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, vpad), jnp.float32),
    )(feats_t.astype(jnp.float32), nbr_p, w_t.astype(jnp.float32))
    return out.T[:v]


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
    """Opt-in via GAPARTNET_PALLAS=1.

    Default OFF: current Mosaic lowers gathers only as single-vreg shuffles
    ("Multiple source vregs along gather dimension"), so a VMEM-resident
    big-table gather kernel cannot compile on this toolchain yet.  The kernel
    + tests are kept (they pass in interpret mode) for when Mosaic grows
    multi-vreg dynamic_gather support.

    Status 2026-08-17 (round 2): re-tested on jax 0.9.0 through the remote
    AOT compile service — still fails for BOTH a single-vreg-sized table
    (V=512) and the flagship table (V=20000); the service surfaces only
    "HTTP 500: tpu_compile_helper subprocess exit code 1" and scrubs the
    Mosaic diagnostic, so the precise pass error cannot be captured in this
    environment.  Workarounds examined and rejected for now: per-128-lane
    chunked dynamic_gather (O(V/128) full-table passes), one-hot MXU gather
    (27x FLOP blowup), scalar-prefetch row DMAs (row-latency-bound, no
    modeled win over the XLA windowed slice-gather path, which is no longer
    the e2e bottleneck — see PERF.md round 2).  Revisit when the toolchain
    surfaces Mosaic errors or gains multi-vreg dynamic_gather.

    Status 2026-08-17 (round 3): retried both table sizes (V=512 and
    V=20000) against the current toolchain via the remote AOT service —
    still "HTTP 500: tpu_compile_helper subprocess exit code 1" with the
    Mosaic diagnostic scrubbed; no change in observable behavior.  The
    kernel stays behind GAPARTNET_PALLAS=1 with interpret-mode tests.

    Status 2026-08-20 (round 5): retried both table sizes — still
    MosaicError "HTTP 500: tpu_compile_helper subprocess exit code 1"
    (diagnostic scrubbed; the service now also surfaces a landlock warning
    that is unrelated).  No toolchain change observed; the XLA windowed
    slice-gather path remains the production conv (and the conv is no
    longer the e2e pole — see PERF.md round 5).
    """
    import os

    if os.environ.get("GAPARTNET_PALLAS", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


def supported(features, nbr) -> bool:
    """VMEM residency check: feats + gather buffer + nbr table + out."""
    v, cin = features.shape[-2:]
    vpad = _round_up(v, 128)
    feat_bytes = vpad * max(cin, 8) * 4
    nbr_bytes = K_TAPS * vpad * 4
    return 3 * feat_bytes + nbr_bytes < 12 * 1024 * 1024
