"""Data-driven capacity sizing (data/capacity.py).

The divisor-schedule defaults were tuned on synthetic blobs; real surfaces
keep more voxels per stride-2 level.  auto_capacity must (a) bound every
observed per-level unique-voxel count, (b) respect clamps/rounding, and
(c) flow into the model's input_capacities() via level_capacities.
"""

import dataclasses

import numpy as np
import pytest

from gapartnet_tpu.data.capacity import _unique_counts, scan_level_capacities
from gapartnet_tpu.data.loader import GAPartNetDataset
from gapartnet_tpu.models.gapartnet import GAPartNetConfig


@pytest.fixture
def npz_dir(tmp_path, rng):
    d = tmp_path / "train" / "pth"
    d.mkdir(parents=True)
    for name in ("Box_0_00_000", "Box_0_00_001"):
        n = 500
        # a flat-ish surface patch: many distinct voxels at coarse levels
        xyz = np.stack(
            [rng.rand(n), rng.rand(n), 0.02 * rng.rand(n)], 1
        ).astype(np.float32)
        np.savez(
            d / f"{name}.npz",
            xyz=xyz,
            rgb=rng.rand(n, 3).astype(np.float32),
            sem_labels=rng.randint(0, 10, n).astype(np.int32),
            instance_labels=rng.randint(0, 3, n).astype(np.int32),
            gt_npcs=rng.rand(n, 3).astype(np.float32) - 0.5,
        )
    return d


def test_scan_bounds_observed_counts(npz_dir):
    ds = GAPartNetDataset(npz_dir, max_points=500)
    caps = scan_level_capacities(
        [ds], (0.01, 0.01, 0.01), 5, 500, round_to=16, headroom=1.0
    )
    assert len(caps) == 5
    for i in range(len(ds)):
        item = ds[i]
        xyz = item["points"][item["point_mask"]][:, :3]
        counts = _unique_counts(xyz, (0.01, 0.01, 0.01), 5)
        assert all(c <= cap for c, cap in zip(counts, caps)), (counts, caps)
    # rounding + clamps
    assert all(c % 16 == 0 or c in (64, 500) for c in caps)
    assert all(64 <= c <= 500 for c in caps)
    # monotone non-increasing across levels (coarser grid, fewer voxels)
    assert list(caps) == sorted(caps, reverse=True)


def test_scan_covers_augmentation_envelope(npz_dir):
    plain = GAPartNetDataset(npz_dir, max_points=500)
    aug = GAPartNetDataset(
        npz_dir, max_points=500, augmentation=True,
        pos_jitter=0.1, flip_prob=0.5, rotate_prob=0.5, seed=3,
    )
    caps_plain = scan_level_capacities(
        [plain], (0.01, 0.01, 0.01), 4, 500, round_to=1, headroom=1.0
    )
    caps_aug = scan_level_capacities(
        [aug], (0.01, 0.01, 0.01), 4, 500, round_to=1, headroom=1.0,
        augment_trials=4,
    )
    # jitter shears the cloud -> strictly more mid-level voxels
    assert any(a > p for a, p in zip(caps_aug, caps_plain)), (
        caps_aug, caps_plain,
    )
    # epoch is restored after the scan
    assert aug.epoch == 0


def test_level_capacities_override_divisors():
    cfg = GAPartNetConfig(max_points=1000)
    assert cfg.input_capacities() == (1000, 500, 250, 125, 64, 64, 64)
    cfg2 = dataclasses.replace(
        cfg, level_capacities=(1000, 900, 400, 120, 32, 8, 2000)
    )
    # clamped to [64, max_points]
    assert cfg2.input_capacities() == (1000, 900, 400, 120, 64, 64, 1000)
    with pytest.raises(AssertionError):
        dataclasses.replace(cfg, level_capacities=(5, 5)).input_capacities()


def test_scan_dataset_shapes_extent(npz_dir):
    from gapartnet_tpu.data.capacity import scan_dataset_shapes

    ds = GAPartNetDataset(npz_dir, max_points=500)
    caps, extent = scan_dataset_shapes(
        [ds], (0.01, 0.01, 0.01), 3, 500, extent_round_to=8, headroom=1.0
    )
    assert len(extent) == 3
    # extent bounds every cloud's span, rounded to 8
    for i in range(len(ds)):
        item = ds[i]
        xyz = item["points"][item["point_mask"]][:, :3]
        vox = np.floor((xyz - xyz.min(0)) / 0.01).astype(np.int64)
        span = vox.max(0) + 1
        assert all(int(s) <= e for s, e in zip(span, extent)), (span, extent)
    assert all(e % 8 == 0 for e in extent)
    # the flat surface patch is thin in z: the fitted extent must be too
    assert extent[2] < extent[0]


def test_bench_real_cloud_setup():
    """The committed bench asset must produce a consistent fitted config and
    a full-occupancy batch (20000 real points, no padding)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    cfg = GAPartNetConfig()
    path = Path(bench.__file__).parent / "assets" / "bench_cloud.npz"
    cfg2, batch = bench.real_cloud_setup(cfg, str(path), 2)
    assert batch.points.shape == (2, 20000, 6)
    assert bool(batch.point_mask.all())
    caps = cfg2.input_capacities()
    # real surface: level-1 occupancy well above half of level 0
    assert caps[1] > 10000, caps
    assert caps[0] == 20000
    # fitted extent is tighter than the conservative 288^3 default
    assert all(32 <= e < 288 for e in cfg2.input_grid_extent)


def test_scan_hash_capacities(npz_dir):
    from gapartnet_tpu.data.capacity import _hash_occupancy, scan_hash_capacities

    ds = GAPartNetDataset(npz_dir, max_points=500)
    node_cap, cand_cap = scan_hash_capacities(
        [ds], 0.04, round_to=64, max_points=500
    )
    # node cap bounds the measured gt-node count AND 1.5x the foreground
    # count (the label-noise-proof budget) of every sample
    for i in range(len(ds)):
        item = ds[i]
        mask = item["point_mask"]
        sem = item["sem_labels"][mask]
        xyz = item["points"][mask][:, :3]
        fg = sem > 0
        n_nodes, cmax = _hash_occupancy(xyz[fg], sem[fg], 0.04)
        assert n_nodes <= node_cap
        assert cmax <= cand_cap
    assert 64 <= node_cap <= 500
    assert cand_cap % 4 == 0 and 4 <= cand_cap <= 62 + 3
