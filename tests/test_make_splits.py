"""Two-level dataset split generation (tools/make_splits.py).

Semantics under test mirror the reference's released split artifacts
(dataset/README.md:24-26, render_tools/meta/partnet_all_split.json): unseen
categories go wholesale to test_inter; seen categories lose a fraction of
instances to test_intra; remaining views split train/val at view level.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np


def _fake_clouds(root: Path):
    rng = np.random.RandomState(0)
    names = []
    for cat, ids, views in [
        ("Box", [100, 101, 102, 103, 104], 4),
        ("Remote", [200, 201, 202, 203], 4),
        ("Toaster", [300, 301], 4),
    ]:
        for mid in ids:
            for r in range(views):
                names.append(f"{cat}_{mid}_00_{r:03d}")
    for n in names:
        np.savez(
            root / f"{n}.npz",
            xyz=rng.randn(64, 3).astype(np.float32),
            rgb=rng.rand(64, 3).astype(np.float32),
            sem_labels=np.zeros(64, np.int32),
            instance_labels=np.full(64, -100, np.int32),
            gt_npcs=np.zeros((64, 3), np.float32),
        )
    return names


def test_two_level_split_semantics(tmp_path):
    import tools.make_splits as MS

    names = _fake_clouds(tmp_path)
    scanned = MS.scan_clouds(tmp_path)
    assert len(scanned) == len(names)

    id_lines, split_json, file_lists = MS.make_splits(
        scanned, unseen_category_frac=0.34, unseen_instance_frac=0.25,
        val_view_frac=0.25, seed=7,
    )
    # id list covers every (category, instance) once
    assert len(id_lines) == 5 + 4 + 2
    # exactly one of three categories unseen; both levels present
    assert len(split_json["unseen_category"]) == 1
    assert len(split_json["seen_category"]) == 2
    for cat, d in split_json["seen_category"].items():
        assert d["seen_instance"], cat  # never empties a seen category
        assert set(d["seen_instance"]).isdisjoint(d["unseen_instance"])

    # every view lands in exactly one split
    allv = sum(file_lists.values(), [])
    assert sorted(allv) == sorted(names)
    # test_inter == all views of the unseen category
    ucat = next(iter(split_json["unseen_category"]))
    assert all(n.startswith(ucat + "_") for n in file_lists["test_inter_new"])
    # test_intra views belong to seen categories' unseen instances
    intra_inst = {
        (cat, mid)
        for cat, d in split_json["seen_category"].items()
        for mid in d["unseen_instance"]
    }
    for n in file_lists["test_intra_new"]:
        cat, mid = n.split("_")[0], int(n.split("_")[1])
        assert (cat, mid) in intra_inst
    # train and val share instances but never views
    assert set(file_lists["train_new"]).isdisjoint(file_lists["val_new"])
    assert file_lists["val_new"]

    # determinism
    again = MS.make_splits(
        scanned, unseen_category_frac=0.34, unseen_instance_frac=0.25,
        val_view_frac=0.25, seed=7,
    )
    assert again[1] == split_json and again[2] == file_lists


def test_cli_emits_from_folder_consumable_lists(tmp_path):
    _fake_clouds(tmp_path)
    r = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "tools" / "make_splits.py"),
         str(tmp_path), "--seed", "3"],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(Path(__file__).parent.parent)},
    )
    assert r.returncode == 0, r.stderr
    split = json.loads((tmp_path / "all_split.json").read_text())
    assert set(split) == {"seen_category", "unseen_category"}

    from gapartnet_tpu.data.loader import from_folder

    ds = from_folder(tmp_path, split="train_new", max_points=64)
    assert len(ds.paths) == len(
        json.loads((tmp_path / "train_new.json").read_text())
    )
    sample = ds[0]
    assert sample["points"].shape == (64, 6)
