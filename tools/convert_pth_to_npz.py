#!/usr/bin/env python
"""One-shot conversion of reference .pth point-cloud files to .npz.

The reference stores samples as torch.save tuples
(convert_rendered_into_input.py:156-158).  The training framework reads both
formats (data/loader.py); this tool converts a tree of .pth files to
torch-free .npz so the data path has no torch dependency at all.

    python tools/convert_pth_to_npz.py --root data/GAPartNet_All [--splits train val ...]
"""

import argparse
import os
from glob import glob
from pathlib import Path

import numpy as np


def convert_file(path: str, out_path: str):
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    np.savez(
        out_path,
        xyz=np.asarray(data[0], np.float32),
        rgb=np.asarray(data[1], np.float32),
        sem_labels=np.asarray(data[2], np.int32),
        instance_labels=np.asarray(data[3], np.int32),
        gt_npcs=np.asarray(data[4], np.float32),
        **({"pixel_idx": np.asarray(data[5], np.int32)} if len(data) > 5 else {}),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument(
        "--splits", nargs="*", default=["train", "val", "test_intra", "test_inter"]
    )
    args = ap.parse_args()
    total = 0
    for split in args.splits:
        d = Path(args.root) / split / "pth"
        if not d.exists():
            continue
        for p in sorted(glob(str(d / "*.pth"))):
            out = p[:-4] + ".npz"
            if not os.path.exists(out):
                convert_file(p, out)
                total += 1
    print(f"converted {total} files")


if __name__ == "__main__":
    main()
