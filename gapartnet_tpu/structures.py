"""Fixed-shape data structures (pytrees).

TPU re-design of the reference dataclasses (gapartnet/structure/point_cloud.py:9-189,
gapartnet/structure/instances.py:8-36).  The reference concatenates variable-length
per-sample tensors; here every field keeps an explicit batch dimension and a static
capacity with validity masks, so the whole pipeline stays jit/pjit-compatible and
shards over the leading batch axis.
"""

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class HostList(list):
    """Host-side metadata list that is invisible to jit caching.

    Non-pytree-node fields participate in pytree treedef equality, so a plain
    per-batch id list gives every batch a distinct treedef: each real-data
    train/eval step then misses the jit cache and pays a full retrace plus an
    XLA persistent-cache deserialization (~20 s/step measured on the
    single-core tunnel host — the sustained run spent 98% of its epoch time
    there).  All HostList instances compare equal, so ids ride along for
    host-side consumers (visualization, logging) without ever splitting the
    trace cache.
    """

    __slots__ = ()

    def __eq__(self, other):
        return isinstance(other, HostList)

    def __ne__(self, other):
        return not isinstance(other, HostList)

    def __hash__(self):
        return 0


@struct.dataclass
class PointCloudBatch:
    """A batch of padded point clouds.

    Shapes (B = batch, N = point capacity, I = instance capacity):
      points:                 (B, N, 6)  xyz + rgb
      point_mask:             (B, N)     True for real points
      sem_labels:             (B, N)     int32, -100 = ignore (padding included)
      instance_labels:        (B, N)     int32, -100 = no instance
      gt_npcs:                (B, N, 3)
      instance_regions:       (B, N, 9)  per-point instance mean/min/max xyz
      num_points_per_instance:(B, I)     int32, 0 pads
      instance_sem_labels:    (B, I)     int32, -1 pads
      num_instances:          (B,)       int32
    """

    points: jnp.ndarray
    point_mask: jnp.ndarray
    sem_labels: Optional[jnp.ndarray] = None
    instance_labels: Optional[jnp.ndarray] = None
    gt_npcs: Optional[jnp.ndarray] = None
    instance_regions: Optional[jnp.ndarray] = None
    num_points_per_instance: Optional[jnp.ndarray] = None
    instance_sem_labels: Optional[jnp.ndarray] = None
    num_instances: Optional[jnp.ndarray] = None
    # host-side metadata, not traced
    pc_ids: Any = struct.field(pytree_node=False, default=None)

    @property
    def batch_size(self) -> int:
        return self.points.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[1]


@struct.dataclass
class SparseGrid:
    """A batch of sparse voxel grids with static voxel capacity.

    Replaces spconv.SparseConvTensor.  Voxel keys are packed int32 coordinates
    (ops/voxelize.pack_coords), sorted ascending per sample with KEY_SENTINEL
    padding, which makes neighbor lookup a searchsorted and keeps downstream
    gathers static.

      keys:     (B, V) int32 sorted, KEY_SENTINEL padded
      features: (B, V, C)
      num_voxels: (B,) int32
      spatial_shape: static python tuple (sx, sy, sz) — grid extent for
        boundary checks (kept <= 1024 per axis by key packing)
    """

    keys: jnp.ndarray
    features: jnp.ndarray
    num_voxels: jnp.ndarray
    spatial_shape: Any = struct.field(pytree_node=False, default=(1024, 1024, 1024))

    @property
    def voxel_mask(self) -> jnp.ndarray:
        b, v = self.keys.shape
        return jnp.arange(v)[None, :] < self.num_voxels[:, None]

    def replace_features(self, features: jnp.ndarray) -> "SparseGrid":
        return self.replace(features=features)


@struct.dataclass
class Proposals:
    """Flat proposal SoA with static capacities (replaces structure/instances.py:8).

    E = proposal-point entry capacity per batch element folded flat (B*2N entries
    total when dual-set clustering is on); P = proposal capacity.

      entry_point_idx: (E,) int32  index into the flattened (B*N) point space
      entry_proposal:  (E,) int32  compacted proposal id, -1 invalid
      entry_mask:      (E,) bool
      proposal_mask:   (P,) bool
      batch_indices:   (P,) int32  which sample each proposal belongs to
      num_points:      (P,) int32
      sem_classes:     (P,) int32  semantic class of the proposal's points
      score_preds:     (P,) float  sigmoid scores (after ScoreNet)
      ious:            (P, I) float  IoU vs each GT instance of its sample
      npcs_preds:      (E, 3) per-entry NPCS predictions (valid via npcs_valid)
      npcs_valid:      (E,) bool
    """

    entry_point_idx: jnp.ndarray
    entry_proposal: jnp.ndarray
    entry_mask: jnp.ndarray
    proposal_mask: jnp.ndarray
    batch_indices: jnp.ndarray
    num_points: jnp.ndarray
    sem_classes: jnp.ndarray
    score_preds: Optional[jnp.ndarray] = None
    ious: Optional[jnp.ndarray] = None
    npcs_preds: Optional[jnp.ndarray] = None
    npcs_valid: Optional[jnp.ndarray] = None

    @property
    def num_proposal_capacity(self) -> int:
        return self.proposal_mask.shape[0]


@struct.dataclass
class Segmentation:
    """Per-batch semantic segmentation outputs (replaces structure/segmentation.py:8)."""

    sem_preds: jnp.ndarray   # (B, N) int32
    sem_labels: jnp.ndarray  # (B, N) int32
    point_mask: jnp.ndarray  # (B, N) bool
    all_accu: jnp.ndarray    # () float
    pixel_accu: jnp.ndarray  # () float
