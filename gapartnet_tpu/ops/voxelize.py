"""Fixed-shape point-cloud voxelization.

TPU-native replacement for epic_ops.voxelize.voxelize as used by the reference
(data path: gapartnet/dataset/gapartnet.py:179-205, proposal path:
gapartnet/network/grouping_utils.py:93-104): points are deduplicated into
voxels, features are mean-reduced per voxel, and a point->voxel index map is
returned.

Design: one sample at a time with a static point capacity N (vmap over the
batch).  Voxel coordinates are packed into a single int32 key (10 bits per
axis, grid up to 1024^3), keys are sorted, voxel boundaries found by run-length
flags, and features reduced with segment ops.  Everything is O(N log N) with
static shapes; the voxel capacity equals the point capacity (a voxel holds at
least one point).  Output voxels are ordered by ascending key — exactly the
sorted order the rulebook sparse-conv lookup (ops/sparse_conv.py) requires, so
no re-sort happens downstream.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gapartnet_tpu.ops.segment import segment_mean

COORD_BITS = 10
COORD_MAX = 1 << COORD_BITS  # 1024 per axis
KEY_SENTINEL = jnp.iinfo(jnp.int32).max


def pack_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """Pack integer (x, y, z) in [0, 1024) into one int32 key (x major)."""
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    return (x << (2 * COORD_BITS)) | (y << COORD_BITS) | z


def unpack_key(key: jnp.ndarray) -> jnp.ndarray:
    mask = COORD_MAX - 1
    x = (key >> (2 * COORD_BITS)) & mask
    y = (key >> COORD_BITS) & mask
    z = key & mask
    return jnp.stack([x, y, z], axis=-1)


def dedup_keys(keys: jnp.ndarray, valid: jnp.ndarray):
    """Sort + run-length deduplicate int32 keys (invalid -> KEY_SENTINEL).

    Returns (unique_keys (M,) ascending sentinel-padded,
             id_per_entry (M,) int32 with -1 for invalid,
             num_unique ()).
    """
    m = keys.shape[0]
    keys = jnp.where(valid, keys, KEY_SENTINEL)
    order = jnp.argsort(keys)
    sorted_keys = keys[order]
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    sorted_valid = sorted_keys != KEY_SENTINEL
    first = first & sorted_valid
    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = first.sum().astype(jnp.int32)
    id_per_entry = jnp.zeros((m,), jnp.int32).at[order].set(
        jnp.where(sorted_valid, uid_sorted, -1)
    )
    unique_keys = jnp.full((m,), KEY_SENTINEL, jnp.int32).at[
        jnp.where(first, uid_sorted, m)
    ].set(sorted_keys, mode="drop")
    return unique_keys, id_per_entry, num_unique


class VoxelizeResult(NamedTuple):
    voxel_keys: jnp.ndarray      # (N,) int32, ascending, KEY_SENTINEL padded
    voxel_features: jnp.ndarray  # (N, C) mean-reduced features per voxel
    voxel_mask: jnp.ndarray      # (N,) bool, True for real voxels
    pc_voxel_id: jnp.ndarray     # (N,) int32, -1 for invalid points
    num_voxels: jnp.ndarray      # () int32

    @property
    def voxel_coords(self) -> jnp.ndarray:
        return unpack_key(self.voxel_keys)


def voxelize_single(
    pt_xyz: jnp.ndarray,
    pt_features: jnp.ndarray,
    voxel_size: jnp.ndarray,
    range_min: jnp.ndarray,
    range_max: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
) -> VoxelizeResult:
    """Voxelize one point cloud with mean feature reduction.

    Args:
      pt_xyz: (N, 3) float point positions.
      pt_features: (N, C) per-point features.
      voxel_size: (3,) voxel edge lengths.
      range_min / range_max: (3,) inclusive spatial range; points outside map to
        pc_voxel_id == -1 (the reference asserts this never happens on its data,
        gapartnet/dataset/gapartnet.py:196).
      point_mask: (N,) optional validity mask for padded points.
    """
    n = pt_xyz.shape[0]
    coords = jnp.floor((pt_xyz - range_min) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((pt_xyz >= range_min) & (pt_xyz <= range_max), axis=-1)
    in_grid = jnp.all((coords >= 0) & (coords < COORD_MAX), axis=-1)
    valid = in_range & in_grid
    if point_mask is not None:
        valid = valid & point_mask
    coords = jnp.clip(coords, 0, COORD_MAX - 1)

    keys = jnp.where(valid, pack_coords(coords), KEY_SENTINEL)
    order = jnp.argsort(keys)  # stable; sentinels sort to the back
    sorted_keys = keys[order]

    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    sorted_valid = sorted_keys != KEY_SENTINEL
    first = first & sorted_valid
    # voxel id per sorted point (0-based rank of its voxel)
    vox_id_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_voxels = first.sum().astype(jnp.int32)

    # scatter back to original point order
    pc_voxel_id = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(sorted_valid, vox_id_sorted, -1)
    )

    # voxel key table: the first occurrence of each voxel writes its key;
    # non-first entries are routed out of bounds and dropped.
    voxel_keys = jnp.full((n,), KEY_SENTINEL, jnp.int32).at[
        jnp.where(first, vox_id_sorted, n)
    ].set(sorted_keys, mode="drop")

    voxel_features = segment_mean(
        pt_features, pc_voxel_id, num_segments=n, mask=valid
    )
    voxel_mask = jnp.arange(n) < num_voxels

    return VoxelizeResult(
        voxel_keys=voxel_keys,
        voxel_features=voxel_features,
        voxel_mask=voxel_mask,
        pc_voxel_id=pc_voxel_id,
        num_voxels=num_voxels,
    )
