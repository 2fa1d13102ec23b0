import numpy as np
import pytest
import torch

from gapartnet_tpu.data.loader import (
    GAPartNetDataset,
    apply_augmentations,
    collate,
    compact_instance_labels,
    load_cloud_file,
    shard_files,
)


@pytest.fixture
def pth_dir(tmp_path, rng):
    """Real torch.save tuples, exactly the reference converter format

    (convert_rendered_into_input.py:156-158)."""
    d = tmp_path / "train" / "pth"
    d.mkdir(parents=True)
    n = 200
    for name in ("Box_1_00_000", "Remote_2_00_000"):
        xyz = rng.rand(n, 3).astype(np.float32)
        rgb = rng.rand(n, 3).astype(np.float32)
        sem = rng.randint(0, 10, n).astype(np.int32)
        ins = rng.randint(-1, 3, n).astype(np.int32)
        ins[ins == -1] = -100
        # make instance labels follow sem>0 structure loosely
        npcs = (rng.rand(n, 3).astype(np.float32) - 0.5)
        idx = rng.randint(0, 800, (n, 2)).astype(np.int32)
        torch.save((xyz, rgb, sem, ins, npcs, idx), d / f"{name}.pth")
    return d


def test_load_pth_tuple(pth_dir):
    d = load_cloud_file(str(pth_dir / "Box_1_00_000.pth"))
    assert d["points"].shape == (200, 6)
    assert d["sem_labels"].dtype == np.int32
    assert d["gt_npcs"].shape == (200, 3)
    assert d["pc_id"] == "Box_1_00_000"
    assert d["obj_cat"] == 0  # Box


def test_dataset_pth_end_to_end(pth_dir):
    ds = GAPartNetDataset(
        pth_dir, max_points=256, max_instances=8, augmentation=True,
        pos_jitter=0.1, color_jitter=0.3, flip_prob=0.3, rotate_prob=0.3,
    )
    assert len(ds) == 2
    s = ds[0]
    assert s["points"].shape == (256, 6)
    assert s["point_mask"].sum() == 200
    assert (s["sem_labels"][200:] == -100).all()
    batch = collate([ds[0], ds[1]])
    assert batch["points"].shape == (2, 256, 6)
    assert len(batch["pc_ids"]) == 2


def test_compact_instance_labels():
    ins = np.array([-100, 5, 5, 9, -100, 2])
    out = compact_instance_labels(ins)
    np.testing.assert_array_equal(out, [-100, 1, 1, 2, -100, 0])


def test_augmentations_preserve_shape_and_colors(rng):
    pts = rng.rand(100, 6).astype(np.float32)
    out = apply_augmentations(
        pts, np.random.RandomState(0), pos_jitter=0.0, color_jitter=0.0,
        flip_prob=0.0, rotate_prob=1.0,
    )
    # pure z-rotation: z column unchanged, xy norms preserved
    np.testing.assert_allclose(out[:, 2], pts[:, 2], atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, :2], axis=1),
        np.linalg.norm(pts[:, :2], axis=1), rtol=1e-5,
    )
    np.testing.assert_allclose(out[:, 3:], pts[:, 3:])


def test_shard_files():
    paths = [f"f{i}" for i in range(10)]
    s0 = shard_files(paths, 0, 4)
    s1 = shard_files(paths, 1, 4)
    assert s0 == ["f0", "f4", "f8"]
    assert s1 == ["f1", "f5", "f9"]
    all_shards = sum((shard_files(paths, i, 4) for i in range(4)), [])
    assert sorted(all_shards) == paths


def test_parallel_loading_deterministic(pth_dir):
    """Worker-parallel batch loading must produce the identical stream as

    serial loading (augmentation rng is per-(seed, epoch, idx), so thread
    scheduling cannot perturb it)."""
    from gapartnet_tpu.data.loader import GAPartNetDataset
    from gapartnet_tpu.train.trainer import _iter_batches

    ds = GAPartNetDataset(
        pth_dir, max_points=200, max_instances=8, augmentation=True,
        pos_jitter=0.1, color_jitter=0.3, flip_prob=0.5, rotate_prob=0.5,
    )
    serial = list(_iter_batches(ds, 2, drop_last=False, shuffle_seed=5,
                                workers=0))
    parallel = list(_iter_batches(ds, 2, drop_last=False, shuffle_seed=5,
                                  workers=4))
    assert len(serial) == len(parallel)
    for a, b in zip(serial, parallel):
        assert set(a) == set(b)
        for k in a:
            if isinstance(a[k], np.ndarray):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            else:
                assert a[k] == b[k], k


def test_batch_treedef_stable_across_pc_ids(pth_dir):
    """Per-batch id strings must not split the jit trace cache.

    pc_ids is a non-pytree-node field, so it participates in treedef
    equality; with a plain list every real-data batch had a distinct treedef
    and every train/eval step paid a full retrace + XLA persistent-cache
    deserialization (~20 s/step on the tunnel host).  HostList compares
    equal regardless of contents, keeping one cache entry for all batches.
    """
    import jax

    from gapartnet_tpu.data.loader import GAPartNetDataset
    from gapartnet_tpu.train.trainer import _np_batch_to_device

    ds = GAPartNetDataset(pth_dir, max_points=200, max_instances=8)
    b0 = _np_batch_to_device(collate([ds[0]]))
    b1 = _np_batch_to_device(collate([ds[1]]))
    assert list(b0.pc_ids)[0] != list(b1.pc_ids)[0]  # genuinely different ids
    t0 = jax.tree_util.tree_structure(b0)
    t1 = jax.tree_util.tree_structure(b1)
    assert t0 == t1

    calls = 0

    @jax.jit
    def f(batch):
        nonlocal calls
        calls += 1
        return batch.points.sum()

    f(b0)
    f(b1)
    assert calls == 1  # second call hits the trace cache


def test_prefetcher_order_transform_and_errors():
    from gapartnet_tpu.train.trainer import Prefetcher

    # order + transform run in the producer thread
    out = list(Prefetcher(iter(range(10)), transform=lambda x: x * 2))
    assert out == [2 * i for i in range(10)]

    # a transform exception propagates to the consumer (instead of silently
    # truncating the epoch) and items before it still arrive in order
    def boom(x):
        if x == 3:
            raise ValueError("bad batch")
        return x

    got, err = [], None
    try:
        for item in Prefetcher(iter(range(10)), transform=boom):
            got.append(item)
    except ValueError as e:
        err = e
    assert got == [0, 1, 2]
    assert err is not None and "bad batch" in str(err)

    # a generator exception propagates too
    def gen():
        yield 1
        raise RuntimeError("source died")

    try:
        list(Prefetcher(gen()))
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "source died" in str(e)
