"""GAPartNet dataset ingestion.

Mirrors the reference data pipeline (gapartnet/dataset/gapartnet.py:22-285)
with a TPU-first split of responsibilities: the host loads, augments, and pads
to fixed shapes; voxelization happens on device inside the jitted step
(models/gapartnet.prepare_input_grid), removing the reference's
epic_ops-voxelize-in-dataloader-worker CPU stage.

File formats: the reference's .pth tuples
(convert_rendered_into_input.py:156-158: (xyz, rgb, sem, ins, npcs, ...)) are
read via torch (CPU) when available; .npz archives with the same fields are
the torch-free path (tools/convert_pth_to_npz.py converts).
"""

import os
import random
from glob import glob
from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from gapartnet_tpu.constants import OBJECT_NAME2ID


def load_cloud_file(path: str) -> dict:
    """Load one sample -> dict(points (N,6) f32, sem_labels i32,
    instance_labels i32, gt_npcs f32, pc_id, obj_cat)."""
    pc_id = os.path.basename(path).split(".")[0]
    obj_cat = OBJECT_NAME2ID.get(pc_id.split("_")[0], -1)
    if path.endswith(".npz"):
        d = np.load(path)
        xyz, rgb = d["xyz"], d["rgb"]
        sem, ins, npcs = d["sem_labels"], d["instance_labels"], d["gt_npcs"]
    else:
        import torch  # host-side only; reference files are torch.save tuples

        data = torch.load(path, map_location="cpu", weights_only=False)
        xyz = np.asarray(data[0])
        rgb = np.asarray(data[1])
        sem = np.asarray(data[2])
        ins = np.asarray(data[3])
        npcs = np.asarray(data[4])
    points = np.concatenate([xyz, rgb], axis=-1).astype(np.float32)
    return dict(
        pc_id=pc_id,
        obj_cat=obj_cat,
        points=points,
        sem_labels=sem.astype(np.int32),
        instance_labels=ins.astype(np.int32),
        gt_npcs=npcs.astype(np.float32),
    )


def compact_instance_labels(instance_labels: np.ndarray) -> np.ndarray:
    """Renumber instances 0..K-1, keeping -100 (gapartnet.py:134-142)."""
    out = instance_labels.copy()
    valid = out >= 0
    _, inv = np.unique(out[valid], return_inverse=True)
    out[valid] = inv
    return out


def apply_augmentations(
    points: np.ndarray,
    rng: np.random.RandomState,
    pos_jitter: float = 0.0,
    color_jitter: float = 0.0,
    flip_prob: float = 0.0,
    rotate_prob: float = 0.0,
) -> np.ndarray:
    """Reference augmentations (gapartnet.py:85-120): random 3x3 position

    jitter matrix, x-flip, z-rotation, color jitter.  Note: the reference
    gates the rotation draw on flip_prob (gapartnet.py:104), a bug that is
    invisible with the shipped config (both probs are 0.3); here the rotation
    is gated on rotate_prob as intended.
    """
    points = points.copy()
    m = np.eye(3)
    if pos_jitter > 0:
        m += rng.randn(3, 3) * pos_jitter
    if flip_prob > 0 and rng.rand() < flip_prob:
        m[0, 0] = -m[0, 0]
    if rotate_prob > 0 and rng.rand() < rotate_prob:
        theta = rng.rand() * np.pi * 2
        m = m @ np.asarray(
            [
                [np.cos(theta), np.sin(theta), 0],
                [-np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
    points[:, :3] = points[:, :3] @ m
    if color_jitter > 0:
        points[:, 3:] += rng.randn(1, points.shape[1] - 3) * color_jitter
    return points


def generate_instance_info(
    points: np.ndarray, sem_labels: np.ndarray, instance_labels: np.ndarray
):
    """Vectorized instance statistics (replaces the reference's Python loop,

    gapartnet.py:145-176): per-point instance mean/min/max regions and
    per-instance sizes / semantic labels.
    """
    xyz = points[:, :3]
    num_instances = int(instance_labels.max()) + 1 if (instance_labels >= 0).any() else 0
    instance_regions = np.zeros((len(points), 9), np.float32)
    nppi = np.zeros(max(num_instances, 1), np.int32)
    isl = np.full(max(num_instances, 1), -1, np.int32)
    valid = instance_labels >= 0
    if num_instances > 0:
        ids = instance_labels[valid]
        w = xyz[valid]
        counts = np.bincount(ids, minlength=num_instances)
        sums = np.zeros((num_instances, 3))
        np.add.at(sums, ids, w)
        means = sums / np.maximum(counts, 1)[:, None]
        mins = np.full((num_instances, 3), np.inf)
        maxs = np.full((num_instances, 3), -np.inf)
        np.minimum.at(mins, ids, w)
        np.maximum.at(maxs, ids, w)
        instance_regions[valid, 0:3] = means[ids]
        instance_regions[valid, 3:6] = mins[ids]
        instance_regions[valid, 6:9] = maxs[ids]
        nppi = counts.astype(np.int32)
        # semantic label of the first point of each instance (gapartnet.py:169)
        idxs = np.nonzero(valid)[0]
        first_idx = np.full(num_instances, len(points), np.int64)
        np.minimum.at(first_idx, ids, idxs)
        isl = sem_labels[first_idx].astype(np.int32)
    return instance_regions, nppi, isl, num_instances


class GAPartNetDataset:
    """File-list dataset (reference GAPartNetDataset, gapartnet.py:22-82).

    Produces fixed-shape padded samples ready for stacking into
    structures.PointCloudBatch arrays.
    """

    def __init__(
        self,
        root_dir: Union[str, Path, List],
        shuffle: bool = False,
        max_points: int = 20000,
        augmentation: bool = False,
        max_instances: int = 64,
        few_shot: bool = False,
        few_shot_num: int = 512,
        pos_jitter: float = 0.0,
        color_jitter: float = 0.0,
        flip_prob: float = 0.0,
        rotate_prob: float = 0.0,
        nopart_path: Optional[str] = None,
        seed: int = 0,
    ):
        if isinstance(root_dir, (list, tuple)):
            paths: List[str] = []
            for rt in root_dir:
                paths += sorted(glob(str(rt) + "/*.pth")) + sorted(
                    glob(str(rt) + "/*.npz")
                )
        else:
            paths = sorted(glob(str(root_dir) + "/*.pth")) + sorted(
                glob(str(root_dir) + "/*.npz")
            )
        if nopart_path and os.path.exists(nopart_path):
            with open(nopart_path) as f:
                nopart = f.readlines()[0].split(" ")
            nopart_names = {p.split("/")[-1].split(".")[0] for p in nopart}
            paths = [
                p for p in paths
                if os.path.basename(p).split(".")[0] not in nopart_names
            ]
        self.seed = seed
        # bumped per epoch (trainer._iter_batches) so augmentation draws vary
        # across epochs while staying deterministic per (seed, epoch, idx) —
        # and safe under parallel loader threads (no shared RandomState)
        self.epoch = 0
        if shuffle:
            shuffled = list(paths)
            random.Random(seed).shuffle(shuffled)
            paths = shuffled
        if few_shot:
            paths = paths[:few_shot_num]
        self.paths = paths
        self.max_points = max_points
        self.max_instances = max_instances
        self.augmentation = augmentation
        self.pos_jitter = pos_jitter
        self.color_jitter = color_jitter
        self.flip_prob = flip_prob
        self.rotate_prob = rotate_prob

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        d = load_cloud_file(self.paths[idx])
        n = d["points"].shape[0]
        assert n <= self.max_points, (n, self.max_points)  # gapartnet.py:123-131
        d["instance_labels"] = compact_instance_labels(d["instance_labels"])
        if self.augmentation:
            rng = np.random.RandomState(
                (self.seed * 1000003 + self.epoch * 7919 + idx) % (2**31 - 1)
            )
            d["points"] = apply_augmentations(
                d["points"], rng,
                self.pos_jitter, self.color_jitter,
                self.flip_prob, self.rotate_prob,
            )
        # native C++ instance stats when libgapdata built; NumPy otherwise
        from gapartnet_tpu.data import native_loader

        regions, nppi_p, isl_p, k = native_loader.instance_info(
            d["points"], d["sem_labels"], d["instance_labels"], self.max_instances
        )
        return self._pad_arrays(d, regions, nppi_p, isl_p, k, n)

    def _pad_arrays(self, d, regions, nppi_p, isl_p, k, n):
        mp = self.max_points
        pad = mp - n

        def pad_pts(x, fill=0):
            if pad == 0:
                return x
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, widths, constant_values=fill)

        return dict(
            pc_id=d["pc_id"],
            points=pad_pts(d["points"]),
            point_mask=np.arange(mp) < n,
            sem_labels=pad_pts(d["sem_labels"], fill=-100),
            instance_labels=pad_pts(d["instance_labels"], fill=-100),
            gt_npcs=pad_pts(d["gt_npcs"]),
            instance_regions=pad_pts(regions),
            num_points_per_instance=nppi_p,
            instance_sem_labels=isl_p,
            num_instances=np.int32(k),
        )


def collate(samples: Sequence[dict]) -> dict:
    """Stack padded samples into PointCloudBatch arrays (replaces

    PointCloud.collate, structure/point_cloud.py:84-189 — no SparseConvTensor;
    voxelization happens on device)."""
    out = {}
    for k in [
        "points", "point_mask", "sem_labels", "instance_labels", "gt_npcs",
        "instance_regions", "num_points_per_instance", "instance_sem_labels",
        "num_instances",
    ]:
        out[k] = np.stack([s[k] for s in samples])
    out["pc_ids"] = [s["pc_id"] for s in samples]
    return out


def from_folder(
    root_dir: Union[str, Path],
    split: str = "train_new",
    process_index: int = 0,
    process_count: int = 1,
    **dataset_kwargs,
) -> "GAPartNetDataset":
    """JSON-split variant (reference from_folder, dataset/gapartnet.py:231-285):

    reads {root}/{split}.json for the file list and applies per-host sharding
    (the reference's distributed_sharding_filter)."""
    import json as _json

    root = Path(root_dir)
    with open(root / f"{split}.json") as f:
        names = _json.load(f)
    paths = [str(root / n) for n in names]
    paths = shard_files(paths, process_index, process_count)
    ds = GAPartNetDataset.__new__(GAPartNetDataset)
    GAPartNetDataset.__init__(ds, root_dir=[], **dataset_kwargs)
    ds.paths = [p for p in paths if os.path.exists(p)]
    return ds


def shard_files(paths: List[str], process_index: int, process_count: int):
    """Per-host file sharding (replaces DistributedShardingFilter,

    dataset/data_utils.py:15-37): host i takes every process_count-th file."""
    return paths[process_index::process_count]
