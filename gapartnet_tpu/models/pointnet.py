"""PointNet segmentation backbone (alternative to the SparseUNet).

Re-architecture of the reference PointNet path (backbone_type: "PointNet",
network/backbone.py:284-298 + network/pointnet/pointnet_utils.py:10-133 +
pointnet_sem_seg.py:8-33): spatial transformer on xyz, per-point MLPs with a
64-d feature transformer, global max pool concatenated back to point features
(1088-d), then a 1088->512->256->256->fea_dim head.

Layout here is (B, N, C) with masked BN / masked max pooling (the reference
assumes exactly 20000 valid points; model.py:155 reshapes to (-1, 6, 20000)).
1x1 Conv1d == Dense over the channel axis.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gapartnet_tpu.models.norm import MaskedBatchNorm


def _masked_max(x, mask):
    """(B, N, C) -> (B, C) max over valid points."""
    neg = jnp.finfo(x.dtype).min
    return jnp.max(jnp.where(mask[..., None], x, neg), axis=1)


class STN(nn.Module):
    """Spatial transformer predicting a k x k transform (STN3d / STNkd)."""

    k: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        for i, c in enumerate((64, 128, 1024)):
            x = nn.Dense(c, name=f"conv{i + 1}")(x)
            x = MaskedBatchNorm(name=f"bn{i + 1}")(x, mask, train)
            x = nn.relu(x)
        g = _masked_max(x, mask)  # (B, 1024)
        for i, c in enumerate((512, 256)):
            g = nn.Dense(c, name=f"fc{i + 1}")(g)
            g = MaskedBatchNorm(name=f"bn{i + 4}")(g, None, train)
            g = nn.relu(g)
        g = nn.Dense(self.k * self.k, name="fc3",
                     kernel_init=nn.initializers.zeros)(g)
        iden = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        return (g + iden).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    feature_transform: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool):
        b, n, d = x.shape
        trans = STN(3, name="stn")(x, mask, train)
        xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
        if d > 3:
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        else:
            x = xyz
        x = nn.Dense(64, name="conv1")(x)
        x = MaskedBatchNorm(name="bn1")(x, mask, train)
        x = nn.relu(x)

        if self.feature_transform:
            trans_feat = STN(64, name="fstn")(x, mask, train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans_feat)

        point_feat = x
        x = nn.Dense(128, name="conv2")(x)
        x = MaskedBatchNorm(name="bn2")(x, mask, train)
        x = nn.relu(x)
        x = nn.Dense(1024, name="conv3")(x)
        x = MaskedBatchNorm(name="bn3")(x, mask, train)
        g = _masked_max(x, mask)  # (B, 1024)
        g = jnp.broadcast_to(g[:, None, :], (b, n, 1024))
        return jnp.concatenate([g, point_feat], axis=-1)  # (B, N, 1088)


class PointNetSegBackbone(nn.Module):
    """Per-point feature extractor producing (B, N, fea_dim)."""

    fea_dim: int

    @nn.compact
    def __call__(self, points, point_mask, train: bool = True):
        x = PointNetEncoder(feature_transform=True, name="feat")(
            points, point_mask, train
        )
        for i, c in enumerate((512, 256, 256)):
            x = nn.Dense(c, name=f"conv{i + 1}")(x)
            x = MaskedBatchNorm(name=f"bn{i + 1}")(x, point_mask, train)
            x = nn.relu(x)
        x = nn.Dense(self.fea_dim, name="conv4")(x)
        return jnp.where(point_mask[..., None], x, 0.0)
