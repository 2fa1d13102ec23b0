"""Fixed-shape TPU ops (L0): every hot loop of the reference's CUDA stack

(spconv / epic_ops / pointnet2_cuda) re-designed as jitted XLA programs.
See SURVEY.md section 2.4 for the op-by-op mapping."""

from gapartnet_tpu.ops.ball_query import ball_query_single
from gapartnet_tpu.ops.ccl import connected_components_single
from gapartnet_tpu.ops.fps import furthest_point_sampling_single
from gapartnet_tpu.ops.hash_ccl import hash_connected_components
from gapartnet_tpu.ops.iou import instance_seg_iou
from gapartnet_tpu.ops.nms import nms_single, pairwise_pointset_iou
from gapartnet_tpu.ops.segment import (
    segment_count,
    segment_max,
    segment_mean,
    segment_min,
    segment_sum,
    segmented_maxpool,
)
from gapartnet_tpu.ops.sparse_conv import (
    build_downsample,
    build_hierarchy,
    build_subm_rulebook,
    downsample_conv_apply,
    inverse_conv_apply,
    linear_conv_apply,
    subm_conv_apply,
)
from gapartnet_tpu.ops.umeyama import ransac_pose_from_npcs, umeyama_masked
from gapartnet_tpu.ops.voxelize import (
    VoxelizeResult,
    dedup_keys,
    pack_coords,
    unpack_key,
    voxelize_single,
)

__all__ = [
    "ball_query_single",
    "connected_components_single",
    "furthest_point_sampling_single",
    "hash_connected_components",
    "instance_seg_iou",
    "nms_single",
    "pairwise_pointset_iou",
    "segment_count",
    "segment_max",
    "segment_mean",
    "segment_min",
    "segment_sum",
    "segmented_maxpool",
    "build_downsample",
    "build_hierarchy",
    "build_subm_rulebook",
    "downsample_conv_apply",
    "inverse_conv_apply",
    "linear_conv_apply",
    "subm_conv_apply",
    "ransac_pose_from_npcs",
    "umeyama_masked",
    "VoxelizeResult",
    "dedup_keys",
    "pack_coords",
    "unpack_key",
    "voxelize_single",
]
