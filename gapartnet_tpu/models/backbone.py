"""SparseUNet backbone over rulebook sparse convolutions.

Re-architecture of the reference backbone (/root/reference/gapartnet/network/
backbone.py:8-165): submanifold ResBlocks + a recursive U of stride-2
downsamples and inverse-conv upsamples with skip concatenation.  Geometry
(rulebooks, GridHierarchy) is computed once per forward outside the modules;
the modules are pure feature math (matmuls + masked BN + ReLU), which keeps
the MXU busy and lets XLA fuse everything.

Structural parity notes vs the reference:
  * block_repeat encoder ResBlocks per level (backbone.py:64-70)
  * decoder: first ResBlock takes concat(up, skip) = 2*C -> C, then
    block_repeat-1 ResBlocks C -> C (backbone.py:95-108)
  * ResBlock: conv1(k3)+BN+ReLU, conv2(k3)+BN, add shortcut (identity or
    k1 conv + BN), final ReLU (backbone.py:40-49)
  * stem: SubMConv3d(in, C0, k3)+BN+ReLU; without_stem variant = BN+ReLU only
    (backbone.py:147-160), used by the Score/NPCS UNets (model.py:113-122)
  * all convs bias-free (bias=False throughout the reference backbone)
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from gapartnet_tpu.models.norm import MaskedBatchNorm
from gapartnet_tpu.ops.sparse_conv import (
    GridHierarchy,
    downsample_conv_apply,
    inverse_conv_apply,
    linear_conv_apply,
    subm_conv_apply,
)


def _kernel_init(key, shape, dtype=jnp.float32):
    """He-uniform over fan_in = K * Cin (matching torch conv default scale)."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = (6.0 / fan_in) ** 0.5
    return nn.initializers.uniform(scale=2 * bound)(key, shape, dtype) - bound


class SubMConv(nn.Module):
    """Submanifold conv (k=3) on one grid level; weights (27, Cin, Cout).

    Optionally runs the gather + matmul in bfloat16 (f32 accumulation); the
    Pallas VMEM-gather kernel (ops/pallas_conv.py) is behind an opt-in env
    flag until Mosaic supports multi-vreg gathers.
    """

    out_channels: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, features, nbr):
        w = self.param(
            "kernel", _kernel_init, (27, features.shape[-1], self.out_channels)
        )
        from gapartnet_tpu.ops import pallas_conv

        if pallas_conv.enabled() and pallas_conv.supported(features[0], nbr[0]):
            return pallas_conv.subm_conv_pallas(features, nbr, w)
        return subm_conv_apply(features, nbr, w, compute_dtype=self.compute_dtype)


class ResBlock(nn.Module):
    out_channels: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, features, nbr, mask, train: bool):
        cin = features.shape[-1]
        if cin == self.out_channels:
            shortcut = features
        else:
            w = self.param("shortcut_kernel", _kernel_init, (cin, self.out_channels))
            shortcut = linear_conv_apply(features, w)
            shortcut = MaskedBatchNorm(name="shortcut_bn")(shortcut, mask, train)

        x = SubMConv(self.out_channels, self.compute_dtype, name="conv1")(features, nbr)
        x = MaskedBatchNorm(name="bn1")(x, mask, train)
        x = nn.relu(x)
        x = SubMConv(self.out_channels, self.compute_dtype, name="conv2")(x, nbr)
        x = MaskedBatchNorm(name="bn2")(x, mask, train)
        return nn.relu(x + shortcut)


class UBlock(nn.Module):
    """Recursive U over the prebuilt GridHierarchy starting at `level`."""

    channels: Sequence[int]
    block_repeat: int
    level: int = 0
    compute_dtype: Any = None
    remat: bool = False  # rematerialize ResBlocks in backward (bigger batches)

    def _block(self, ch, name):
        cls = (
            nn.remat(ResBlock, static_argnums=(4,)) if self.remat else ResBlock
        )
        return cls(ch, self.compute_dtype, name=name)

    @nn.compact
    def __call__(self, features, hierarchy: GridHierarchy, train: bool):
        li = self.level
        lv = hierarchy.levels[li]
        nbr, mask = lv.subm_nbr, lv.voxel_mask

        x = features
        for r in range(self.block_repeat):
            x = self._block(self.channels[0], f"enc{r}")(x, nbr, mask, train)
        skip = x

        if len(self.channels) > 1:
            ds = hierarchy.downsamples[li]
            nxt = hierarchy.levels[li + 1]
            out_cap = nxt.keys.shape[-1]

            w_down = self.param(
                "down_kernel", _kernel_init, (8, self.channels[0], self.channels[1])
            )
            x = downsample_conv_apply(x, ds, w_down, out_cap)
            x = MaskedBatchNorm(name="down_bn")(x, nxt.voxel_mask, train)
            x = nn.relu(x)

            x = UBlock(
                tuple(self.channels[1:]), self.block_repeat, li + 1,
                self.compute_dtype, self.remat, name="ublock",
            )(x, hierarchy, train)

            w_up = self.param(
                "up_kernel", _kernel_init, (8, self.channels[1], self.channels[0])
            )
            x = inverse_conv_apply(x, ds, w_up)
            x = MaskedBatchNorm(name="up_bn")(x, mask, train)
            x = nn.relu(x)

            x = jnp.concatenate([x, skip], axis=-1)
            x = self._block(self.channels[0], "dec0")(x, nbr, mask, train)
            for r in range(1, self.block_repeat):
                x = self._block(self.channels[0], f"dec{r}")(x, nbr, mask, train)
        return x


class SparseUNet(nn.Module):
    channels: Sequence[int]
    block_repeat: int = 2
    without_stem: bool = False
    compute_dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, features, hierarchy: GridHierarchy, train: bool = True):
        lv0 = hierarchy.levels[0]
        if self.without_stem:
            x = MaskedBatchNorm(name="stem_bn")(features, lv0.voxel_mask, train)
            x = nn.relu(x)
        else:
            x = SubMConv(self.channels[0], self.compute_dtype, name="stem_conv")(features, lv0.subm_nbr)
            x = MaskedBatchNorm(name="stem_bn")(x, lv0.voxel_mask, train)
            x = nn.relu(x)
        return UBlock(
            tuple(self.channels), self.block_repeat, 0, self.compute_dtype,
            self.remat, name="ublock",
        )(x, hierarchy, train)
