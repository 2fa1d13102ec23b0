"""PointNet++ set-abstraction / feature-propagation modules.

Flax equivalents of the vendored pointnet_lib module layer
(dataset/process_tools/utils/pointnet_lib/pointnet2_modules.py +
pytorch_utils.py SharedMLP; vendored wholesale by the reference though unused
by its shipped pipeline — provided here for API completeness).  Channel-last
(B, N, C) layout; grouping/interpolation use ops/pointnet2.py + ops/fps.py.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gapartnet_tpu.models.norm import MaskedBatchNorm
from gapartnet_tpu.ops.fps import furthest_point_sampling_single
from gapartnet_tpu.ops.pointnet2 import (
    ball_query_simple,
    gather_points,
    interpolation_weights,
    three_interpolate,
    three_nn,
)


class SharedMLP(nn.Module):
    """Per-point MLP with BN+ReLU (pytorch_utils.SharedMLP semantics)."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, name=f"conv{i}")(x)
            x = MaskedBatchNorm(name=f"bn{i}")(x, None, train)
            x = nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """SA module: FPS centroids -> ball-query grouping -> shared MLP ->

    max pool per group (pointnet2_modules.PointnetSAModule semantics)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = True):
        def sample_one(x):
            return furthest_point_sampling_single(x, self.npoint)

        idx = jax.vmap(sample_one)(xyz)                 # (B, npoint)
        new_xyz = gather_points(xyz, idx)               # (B, npoint, 3)

        def group_one(x, q, f):
            gi = ball_query_simple(q, x, self.radius, self.nsample)
            gx = x[gi] - q[:, None, :]                  # centered neighborhoods
            if f is not None:
                gf = f[gi]
                return jnp.concatenate([gx, gf], axis=-1)
            return gx

        grouped = jax.vmap(group_one)(
            xyz, new_xyz, features if features is not None else
            jnp.zeros(xyz.shape[:2] + (0,), xyz.dtype)
        )                                               # (B, npoint, nsample, C)
        out = SharedMLP(self.mlp, name="mlp")(grouped, train)
        return new_xyz, jnp.max(out, axis=2)            # (B, npoint, mlp[-1])


class FeaturePropagation(nn.Module):
    """FP module: 3-NN inverse-distance interpolation + shared MLP

    (pointnet2_modules.PointnetFPModule semantics)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_to, xyz_from, feats_to, feats_from, train: bool = True):
        def interp_one(qt, pf, ff):
            d, i = three_nn(qt, pf)
            w = interpolation_weights(d)
            return three_interpolate(ff, i, w)

        interpolated = jax.vmap(interp_one)(xyz_to, xyz_from, feats_from)
        if feats_to is not None:
            interpolated = jnp.concatenate([interpolated, feats_to], axis=-1)
        return SharedMLP(self.mlp, name="mlp")(interpolated, train)
