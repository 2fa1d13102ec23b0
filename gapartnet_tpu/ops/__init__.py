from gapartnet_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_min,
    segment_max,
    segmented_maxpool,
)
from gapartnet_tpu.ops.voxelize import voxelize_single, VoxelizeResult

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_min",
    "segment_max",
    "segmented_maxpool",
    "voxelize_single",
    "VoxelizeResult",
]
