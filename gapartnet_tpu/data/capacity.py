"""Data-driven fixed-shape capacity sizing.

TPU graphs are compiled at static shapes, so every level of the sparse
hierarchy carries a fixed voxel capacity and silently-counted overflow
(ops/sparse_conv.py `num_dropped`).  The round-2 defaults were rightsized
against synthetic Gaussian-blob clouds; real articulated-object surfaces
occupy far more voxels at the intermediate strides (a surface loses only
~3-4x voxels per stride-2, not 8x), so the divisor schedule
(1, 2, 4, ...) clipped ~13% of real voxels at level 1.

This module sizes capacities from the data itself: scan a sample of the
dataset *through the real loading + augmentation pipeline*, take the
per-level max unique-voxel count, add headroom, and round up to a
TPU-friendly multiple.  The result plugs into
`GAPartNetConfig.level_capacities` (checked before the divisor schedule)
and is enabled end-to-end with `DataConfig.auto_capacity`.

Reference context: the reference never needed this — spconv grids are
dynamically shaped (gapartnet/network/backbone.py uses whatever indices
arrive).  Static capacity + overflow counters + this scan is the
TPU-native equivalent contract.
"""

from typing import Iterable, Sequence, Tuple

import numpy as np


def _unique_counts(xyz: np.ndarray, voxel_size, num_levels: int):
    """Unique voxel count of `xyz` at each stride-2 level."""
    vox = np.floor(
        (xyz - xyz.min(0)) / np.asarray(voxel_size, np.float64)
    ).astype(np.int64)
    out = []
    for lvl in range(num_levels):
        c = vox >> lvl
        key = (c[:, 0] << 42) + (c[:, 1] << 21) + c[:, 2]
        out.append(len(np.unique(key)))
    return out


def scan_level_capacities(
    datasets: Iterable,
    voxel_size: Sequence[float],
    num_levels: int,
    max_points: int,
    *,
    augment_trials: int = 3,
    headroom: float = 1.08,
    round_to: int = 128,
    max_samples: int = 48,
) -> Tuple[int, ...]:
    """Measure per-level voxel occupancy over dataset samples.

    `datasets` are GAPartNetDataset-likes (len / __getitem__ / .epoch /
    .augmentation).  Augmenting datasets are sampled `augment_trials`
    times at distinct epochs so jitter/rotation draws widen the envelope
    the way a real training run would.  Returns per-level capacities:
    max observed count x headroom, rounded up to `round_to`, clamped to
    [64, max_points].
    """
    mx = np.zeros(num_levels, np.int64)
    for ds in datasets:
        if ds is None or len(ds) == 0:
            continue
        idxs = np.unique(
            np.linspace(0, len(ds) - 1, min(len(ds), max_samples)).astype(int)
        )
        trials = augment_trials if getattr(ds, "augmentation", False) else 1
        epoch0 = getattr(ds, "epoch", 0)
        try:
            for t in range(trials):
                ds.epoch = epoch0 + t
                for i in idxs:
                    item = ds[int(i)]
                    xyz = item["points"][item["point_mask"]][:, :3]
                    mx = np.maximum(
                        mx, _unique_counts(xyz, voxel_size, num_levels)
                    )
        finally:
            ds.epoch = epoch0
    caps = np.ceil(mx * headroom / round_to).astype(np.int64) * round_to
    caps = np.minimum(np.maximum(caps, 64), max_points)
    return tuple(int(c) for c in caps)
