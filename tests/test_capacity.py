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
    cfg2, batch, cluster_sem, cluster_off = bench.real_cloud_setup(cfg, str(path), 2)
    assert batch.points.shape == (2, 20000, 6)
    assert cluster_sem.shape == (2, 20000)
    # the trained-operating-point labels: some foreground, mostly background
    fg_frac = float((cluster_sem > 0).mean())
    assert 0.0 < fg_frac < 0.5, fg_frac
    assert bool(batch.point_mask.all())
    # propagation-table width sized from measured connected degree: strictly
    # narrower than the candidate cap on this cloud (the round-5 fix)
    assert cfg2.hash_max_degree < cfg2.hash_cand_cap
    caps = cfg2.input_capacities()
    # real surface: level-1 occupancy well above half of level 0
    assert caps[1] > 10000, caps
    assert caps[0] == 20000
    # fitted extent is tighter than the conservative 288^3 default
    assert all(32 <= e < 288 for e in cfg2.input_grid_extent)


def test_scan_hash_capacities(npz_dir):
    from gapartnet_tpu.data.capacity import (
        _hash_connected_degree,
        _hash_occupancy,
        scan_hash_capacities,
    )

    ds = GAPartNetDataset(npz_dir, max_points=500)
    node_cap, cand_cap, degree = scan_hash_capacities(
        [ds], 0.04, round_to=64, max_points=500
    )
    # node cap bounds the measured gt-node count AND 1.5x the foreground
    # count (the label-noise-proof budget) of every sample
    for i in range(len(ds)):
        item = ds[i]
        mask = item["point_mask"]
        sem = item["sem_labels"][mask]
        xyz = item["points"][mask][:, :3].astype("float64")
        fg = sem > 0
        n_nodes, cmax = _hash_occupancy(xyz[fg], sem[fg], 0.04)
        assert n_nodes <= node_cap
        assert cmax <= cand_cap
        # the degree cap bounds the measured CONNECTED degree of both
        # clustering sets with margin (no silent propagation-edge drops)
        assert _hash_connected_degree(xyz[fg], sem[fg], 0.04) <= degree
        shifted = item["instance_regions"][mask][:, :3].astype("float64")
        has_inst = item["instance_labels"][mask] >= 0
        import numpy as np

        shifted = np.where(has_inst[:, None], shifted, xyz)
        assert _hash_connected_degree(shifted[fg], sem[fg], 0.04) <= degree
    assert 64 <= node_cap <= 500
    assert cand_cap % 4 == 0 and 4 <= cand_cap <= 62 + 3
    # connected degree never exceeds the candidate count
    assert 8 <= degree <= cand_cap and degree % 4 == 0


def test_hash_connected_degree_vs_kernel_edges():
    """The host-side connected-degree measurement must match the max forward
    degree of the edge table the device kernel actually builds — otherwise
    sizing hash_max_degree from it could drop propagation edges."""
    import numpy as np

    from gapartnet_tpu.data.capacity import _hash_connected_degree
    from gapartnet_tpu.ops.hash_ccl import hash_connected_components

    rng = np.random.RandomState(3)
    # clumpy geometry: a few dense blobs + sparse scatter, 3 labels
    blobs = [
        rng.normal(c, 0.03, size=(120, 3))
        for c in rng.uniform(-0.3, 0.3, size=(4, 3))
    ]
    xyz = np.concatenate(blobs + [rng.uniform(-0.4, 0.4, (120, 3))]).astype(
        np.float32
    )
    sem = rng.randint(1, 4, size=len(xyz)).astype(np.int32)
    valid = np.ones(len(xyz), bool)

    host_deg = _hash_connected_degree(xyz.astype(np.float64), sem, 0.04)

    nbr = hash_connected_components(
        xyz, sem, valid, 0.04, debug_stage="edges",
        cand_cap=60, max_degree=60,
    )
    kernel_deg = int((np.asarray(nbr) >= 0).sum(axis=0).max())
    assert host_deg == kernel_deg, (host_deg, kernel_deg)


def test_hash_connected_degree_oracle():
    """Candidate-but-not-connected geometry: nodes within 2 cells but beyond
    the radius are candidates yet contribute zero connected degree."""
    import numpy as np

    from gapartnet_tpu.data.capacity import (
        _hash_connected_degree,
        _hash_occupancy,
    )

    # a--b and a--c: 0.05 apart (within the 2-cell probe reach for
    # s = 0.04/sqrt(3) ~ 0.0231, beyond radius 0.04); b--d: 0.02 apart in
    # distinct cells (connected)
    xyz = np.array(
        [[0, 0, 0], [0.05, 0, 0], [0, 0.05, 0], [0.07, 0, 0]], np.float64
    )
    sem = np.ones(4, np.int64)
    _, cmax = _hash_occupancy(xyz, sem, 0.04)
    deg = _hash_connected_degree(xyz, sem, 0.04)
    assert cmax >= 2
    assert deg == 1, deg


def test_hash_components_vs_cluster_single():
    """_hash_components (sizes the dense grid pool) must match the live
    proposal count the device clustering actually produces."""
    import jax.numpy as jnp
    import numpy as np

    from gapartnet_tpu.data.capacity import _hash_components
    from gapartnet_tpu.models.grouping import cluster_single

    rng = np.random.RandomState(7)
    blobs, sems = [], []
    for i, c in enumerate(rng.uniform(-0.3, 0.3, size=(5, 3))):
        blobs.append(rng.normal(c, 0.01, size=(60, 3)))
        sems.append(np.full(60, 1 + i % 3))
    xyz = np.concatenate(blobs).astype(np.float32)
    sem = np.concatenate(sems).astype(np.int32)
    valid = np.ones(len(xyz), bool)
    offsets = np.zeros_like(xyz)

    prop = cluster_single(
        jnp.asarray(xyz), jnp.asarray(offsets), jnp.asarray(sem),
        jnp.asarray(valid), 0.04, 50, 300, 5, 64,
    )
    dev_live = int(prop.num_proposals)

    host_live = 2 * _hash_components(
        xyz.astype(np.float64), sem.astype(np.int64), 0.04, min_points=5
    )  # zero offsets: both sets cluster identically
    assert dev_live == host_live, (dev_live, host_live)
    assert dev_live >= 10  # 5 blobs x 2 sets (blobs may merge if overlapping)
