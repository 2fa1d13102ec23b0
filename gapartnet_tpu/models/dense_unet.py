"""Dense 3D-conv proposal UNet: the TPU-native ScoreNet/NPCSNet path.

The reference runs its Score/NPCS UNets as spconv sparse convs over per-
proposal 28^3 grids (/root/reference/gapartnet/network/model.py:113-122,
gapartnet.yaml score_fullscale: 28).  On TPU the proposal grids are small and
dense convolution maps straight onto the MXU via XLA's native conv3d, so this
module runs the SAME UNet (identical parameter tree and numerics to
models/backbone.SparseUNet(without_stem=True)) on a dense
(G, S, S, S, C) tensor, where G = batch * max_proposals and S = 28.

Exact equivalence with the submanifold path
-------------------------------------------
A submanifold conv at an occupied site sums over occupied neighbors only;
with features zeroed at unoccupied sites, a plain dense conv computes the
identical sum (missing neighbors contribute zero either way).  The only ops
that create nonzero values at unoccupied sites are BatchNorm bias and the
ResBlock shortcut — so every block re-masks unoccupied sites to zero after
its pointwise tail.  BatchNorm statistics are computed over occupied sites
only (MaskedBatchNorm), matching the sparse path's voxel_mask semantics.
Downsampled occupancy is a 2x2x2 any-pool, matching the sparse stride-2
coordinate dedup; the inverse conv is the exact pair adjoint
(out[2p+k] = W[k] @ in[p]), matching ops/sparse_conv.inverse_conv_apply.
Equivalence is asserted by tests/test_dense_unet.py.

Parameter compatibility: kernels are stored in the same (27, Cin, Cout) /
(8, Cin, Cout) tap-major layout as the sparse modules (x-major, dz fastest)
and reshaped to (3,3,3,Cin,Cout) at apply time, so sparse<->dense checkpoints
and the reference converter (train/ckpt_convert.py) work unchanged.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gapartnet_tpu.models.backbone import _kernel_init
from gapartnet_tpu.models.norm import MaskedBatchNorm

_DIMS = ("NXYZC", "XYZIO", "NXYZC")


def _mask(x, occ):
    """Zero unoccupied sites: occ (G,S,S,S) bool, x (G,S,S,S,C)."""
    return jnp.where(occ[..., None], x, jnp.zeros((), x.dtype))


def _conv(x, rhs, strides, padding, compute_dtype):
    """conv3d with optional low-precision compute.

    With a compute dtype, BOTH operands and the declared output share it —
    conv_general_dilated's AD rule rejects mixed operand/cotangent dtypes
    (a bf16-in/f32-out conv breaks under value_and_grad) — and the result is
    upcast to f32 after; the MXU accumulates in f32 internally either way.
    """
    if compute_dtype is not None:
        y = jax.lax.conv_general_dilated(
            x.astype(compute_dtype), rhs.astype(compute_dtype),
            window_strides=strides, padding=padding, dimension_numbers=_DIMS,
        )
        return y.astype(jnp.float32)
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=strides, padding=padding,
        dimension_numbers=_DIMS, preferred_element_type=jnp.float32,
    )


def dense_subm_conv(x, w27, compute_dtype=None):
    """k=3 'submanifold' conv as a dense SAME conv (input pre-masked)."""
    k, cin, cout = w27.shape
    rhs = w27.reshape(3, 3, 3, cin, cout)
    return _conv(x, rhs, (1, 1, 1), [(1, 1)] * 3, compute_dtype)


def dense_down_conv(x, w8, compute_dtype=None):
    """k=2 s=2 strided conv (28^3 -> 14^3), pad 0."""
    k, cin, cout = w8.shape
    rhs = w8.reshape(2, 2, 2, cin, cout)
    return _conv(x, rhs, (2, 2, 2), [(0, 0)] * 3, compute_dtype)


def dense_up_conv(x, w8, compute_dtype=None):
    """Inverse (adjoint) of the k=2 s=2 conv: out[2p+k] = W[k] @ in[p]."""
    g, sx, sy, sz, cin = x.shape
    k, _, cout = w8.shape
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w8 = w8.astype(compute_dtype)
    w = w8.reshape(2, 2, 2, cin, cout)
    y = jnp.einsum(
        "gxyzi,abcio->gxaybzco", x, w, preferred_element_type=jnp.float32
    )
    return y.reshape(g, 2 * sx, 2 * sy, 2 * sz, cout)


def downsample_occupancy(occ):
    """(G, S, S, S) -> (G, S/2, S/2, S/2): parent occupied iff any child is."""
    g, sx, sy, sz = occ.shape
    return occ.reshape(g, sx // 2, 2, sy // 2, 2, sz // 2, 2).any(axis=(2, 4, 6))


class DenseSubMConv(nn.Module):
    """Param-tree twin of backbone.SubMConv: one (27, Cin, Cout) kernel."""

    out_channels: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", _kernel_init, (27, x.shape[-1], self.out_channels)
        )
        return dense_subm_conv(x, w, self.compute_dtype)


class DenseResBlock(nn.Module):
    """Parameter-compatible with backbone.ResBlock (conv1/bn1/conv2/bn2 +
    optional shortcut_kernel/shortcut_bn).

    act_dtype: keep inter-layer activations in this dtype (eval-time
    bandwidth saver; the stage is HBM-bound).  None = float32 (required
    under AD: see _conv)."""

    out_channels: int
    compute_dtype: Any = None
    act_dtype: Any = None

    @nn.compact
    def __call__(self, x, occ, train: bool):
        cin = x.shape[-1]
        cast = (lambda t: t.astype(self.act_dtype)) if self.act_dtype else (lambda t: t)
        if cin == self.out_channels:
            shortcut = x
        else:
            w = self.param("shortcut_kernel", _kernel_init, (cin, self.out_channels))
            shortcut = jax.lax.dot_general(
                x, w, dimension_numbers=(((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            shortcut = cast(MaskedBatchNorm(name="shortcut_bn")(shortcut, occ, train))

        h = DenseSubMConv(self.out_channels, self.compute_dtype, name="conv1")(x)
        h = cast(MaskedBatchNorm(name="bn1")(h, occ, train))
        h = _mask(nn.relu(h), occ)
        h = DenseSubMConv(self.out_channels, self.compute_dtype, name="conv2")(h)
        h = cast(MaskedBatchNorm(name="bn2")(h, occ, train))
        return _mask(nn.relu(h + shortcut.astype(h.dtype)), occ)


class DenseUBlock(nn.Module):
    """Parameter-compatible with backbone.UBlock over a dense grid."""

    channels: Sequence[int]
    block_repeat: int
    compute_dtype: Any = None
    remat: bool = False
    act_dtype: Any = None

    def _block(self, ch, name):
        cls = (
            nn.remat(DenseResBlock, static_argnums=(3,))
            if self.remat else DenseResBlock
        )
        return cls(ch, self.compute_dtype, self.act_dtype, name=name)

    @nn.compact
    def __call__(self, x, occ, train: bool):
        cast = (lambda t: t.astype(self.act_dtype)) if self.act_dtype else (lambda t: t)
        for r in range(self.block_repeat):
            x = self._block(self.channels[0], f"enc{r}")(x, occ, train)
        skip = x

        if len(self.channels) > 1:
            occ2 = downsample_occupancy(occ)
            w_down = self.param(
                "down_kernel", _kernel_init, (8, self.channels[0], self.channels[1])
            )
            x = dense_down_conv(x, w_down, self.compute_dtype)
            x = cast(MaskedBatchNorm(name="down_bn")(x, occ2, train))
            x = _mask(nn.relu(x), occ2)

            x = DenseUBlock(
                tuple(self.channels[1:]), self.block_repeat,
                self.compute_dtype, self.remat, self.act_dtype, name="ublock",
            )(x, occ2, train)

            w_up = self.param(
                "up_kernel", _kernel_init, (8, self.channels[1], self.channels[0])
            )
            x = dense_up_conv(x, w_up, self.compute_dtype)
            x = cast(MaskedBatchNorm(name="up_bn")(x, occ, train))
            x = _mask(nn.relu(x), occ)

            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = self._block(self.channels[0], "dec0")(x, occ, train)
            for r in range(1, self.block_repeat):
                x = self._block(self.channels[0], f"dec{r}")(x, occ, train)
        return x


class DenseProposalUNet(nn.Module):
    """Drop-in dense twin of SparseUNet(channels, without_stem=True).

    Input: x (G, S, S, S, C) dense proposal grids with zeros at unoccupied
    sites; occ (G, S, S, S) occupancy.  Returns (G, S, S, S, channels[0]).
    """

    channels: Sequence[int]
    block_repeat: int = 2
    compute_dtype: Any = None
    remat: bool = False
    act_dtype: Any = None

    @nn.compact
    def __call__(self, x, occ, train: bool = True):
        x = MaskedBatchNorm(name="stem_bn")(x, occ, train)
        if self.act_dtype:
            x = x.astype(self.act_dtype)
        x = _mask(nn.relu(x), occ)
        return DenseUBlock(
            tuple(self.channels), self.block_repeat, self.compute_dtype,
            self.remat, self.act_dtype, name="ublock",
        )(x, occ, train)
