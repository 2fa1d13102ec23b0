#!/usr/bin/env python
"""Generate GAPartNet id lists and two-level split JSONs from a cloud folder.

The reference ships its dataset splits as released artifacts
(`dataset/render_tools/meta/{partnet,akb48}_all_id_list.txt` and
`*_all_split.json`; semantics documented in dataset/README.md:24-26): all
object categories are split into seen and unseen categories, and each seen
category is further split into seen and unseen instances, so every GAPart
class appears in both intra- and inter-category evaluation.  Those lists are
dataset artifacts — they cannot be reproduced without the dataset — but the
*machinery* can: this tool derives the same structures from whatever clouds a
user has rendered (datagen/assets.py or datagen/render.py + convert.py), so a
from-scratch dataset gets the same split workflow the reference's release had.

Outputs, written next to the clouds:

  * ``all_id_list.txt``  — "Category model_id" lines
    (format of render_tools/meta/partnet_all_id_list.txt)
  * ``all_split.json``   — {"seen_category": {cat: {"seen_instance": [...],
    "unseen_instance": [...]}}, "unseen_category": {...}}
    (format of render_tools/meta/partnet_all_split.json)
  * ``{train_new,val_new,test_intra_new,test_inter_new}.json`` — per-split
    file-name lists consumable by ``data.loader.from_folder``
    (reference from_folder, dataset/gapartnet.py:231-285):
      - train/val:   seen categories, seen instances (view-level val holdout)
      - test_intra:  seen categories, unseen instances
      - test_inter:  unseen categories

File names must follow the reference convention
``{Category}_{model_id}_{camera_idx}_{render_idx}`` (convert.py output).

    python tools/make_splits.py DATA_DIR [--unseen-category-frac 0.3]
        [--unseen-instance-frac 0.2] [--val-view-frac 0.1] [--seed 233]
"""

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def scan_clouds(data_dir: Path):
    """name -> (category, model_id) for every cloud file under data_dir."""
    out = {}
    for p in sorted(data_dir.glob("*.npz")) + sorted(data_dir.glob("*.pth")):
        name = p.stem
        parts = name.split("_")
        if len(parts) < 4:
            continue
        out[name] = (parts[0], int(parts[1]))
    return out


def make_splits(
    names,
    unseen_category_frac: float = 0.3,
    unseen_instance_frac: float = 0.2,
    val_view_frac: float = 0.1,
    seed: int = 233,
):
    """Two-level split (dataset/README.md:24-26 semantics) over cloud names.

    Returns (id_list_lines, split_json, file_lists) with deterministic
    seeded draws; every seen category keeps >= 1 seen instance, and the
    unseen-instance pool is nonempty whenever a category has >= 2 instances.
    """
    rng = np.random.RandomState(seed)
    by_cat = defaultdict(set)
    for _, (cat, mid) in names.items():
        by_cat[cat].add(mid)

    cats = sorted(by_cat)
    n_unseen_cat = int(round(len(cats) * unseen_category_frac))
    n_unseen_cat = min(n_unseen_cat, len(cats) - 1) if len(cats) > 1 else 0
    unseen_cats = set(
        rng.choice(cats, size=n_unseen_cat, replace=False).tolist()
        if n_unseen_cat else []
    )

    split_json = {"seen_category": {}, "unseen_category": {}}
    for cat in cats:
        ids = sorted(by_cat[cat])
        if cat in unseen_cats:
            split_json["unseen_category"][cat] = {
                "seen_instance": [],
                "unseen_instance": ids,
            }
            continue
        n_unseen = int(round(len(ids) * unseen_instance_frac))
        n_unseen = min(n_unseen, len(ids) - 1) if len(ids) > 1 else 0
        unseen = set(
            rng.choice(ids, size=n_unseen, replace=False).tolist()
            if n_unseen else []
        )
        split_json["seen_category"][cat] = {
            "seen_instance": [i for i in ids if i not in unseen],
            "unseen_instance": sorted(unseen),
        }

    seen_inst = {
        (cat, mid)
        for cat, d in split_json["seen_category"].items()
        for mid in d["seen_instance"]
    }
    intra_inst = {
        (cat, mid)
        for cat, d in split_json["seen_category"].items()
        for mid in d["unseen_instance"]
    }

    file_lists = {"train_new": [], "val_new": [], "test_intra_new": [],
                  "test_inter_new": []}
    # view-level val holdout within seen instances (the reference's val split
    # is view-level too: same objects, held-out renders)
    by_inst_views = defaultdict(list)
    for name, (cat, mid) in sorted(names.items()):
        by_inst_views[(cat, mid)].append(name)
    for inst, views in sorted(by_inst_views.items()):
        if inst in seen_inst:
            n_val = int(round(len(views) * val_view_frac))
            n_val = min(n_val, len(views) - 1) if len(views) > 1 else 0
            val_views = set(
                rng.choice(views, size=n_val, replace=False).tolist()
                if n_val else []
            )
            for v in views:
                file_lists["val_new" if v in val_views else "train_new"].append(v)
        elif inst in intra_inst:
            file_lists["test_intra_new"].extend(views)
        else:
            file_lists["test_inter_new"].extend(views)

    id_lines = [
        f"{cat} {mid}"
        for cat in cats
        for mid in sorted(by_cat[cat])
    ]
    return id_lines, split_json, file_lists


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", help="folder of {Cat}_{id}_{cam}_{render} clouds")
    ap.add_argument("--unseen-category-frac", type=float, default=0.3)
    ap.add_argument("--unseen-instance-frac", type=float, default=0.2)
    ap.add_argument("--val-view-frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=233)
    args = ap.parse_args()

    data_dir = Path(args.data_dir)
    names = scan_clouds(data_dir)
    if not names:
        sys.exit(f"no {{Cat}}_{{id}}_{{cam}}_{{render}} clouds under {data_dir}")
    id_lines, split_json, file_lists = make_splits(
        names, args.unseen_category_frac, args.unseen_instance_frac,
        args.val_view_frac, args.seed,
    )

    (data_dir / "all_id_list.txt").write_text("\n".join(id_lines) + "\n")
    (data_dir / "all_split.json").write_text(json.dumps(split_json, indent=2))
    suffix = next(iter(names))  # preserve each file's own extension below
    ext = ".npz" if (data_dir / (suffix + ".npz")).exists() else ".pth"
    for split, lst in file_lists.items():
        (data_dir / f"{split}.json").write_text(
            json.dumps([n + ext for n in lst], indent=1)
        )
    print(
        f"[make_splits] {len(names)} clouds, "
        f"{len(split_json['seen_category'])} seen / "
        f"{len(split_json['unseen_category'])} unseen categories; "
        + ", ".join(f"{k}={len(v)}" for k, v in file_lists.items())
    )


if __name__ == "__main__":
    main()
