#!/usr/bin/env python
"""Standalone visualization tool.

Equivalent of the reference gapartnet/tools/visu.py (which had bit-rotted
import paths, SURVEY.md section 2.1): load a checkpoint, run inference on a
.pth/.npz cloud (or a real-world OBJ with vertex colors), and dump the panel
images (sem / ins / npcs / bbox).

    python tools/visu.py --input cloud.pth [--ckpt CKPT] [--out visu_out]
    python tools/visu.py --obj scan.obj --ckpt CKPT
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_obj_points(path: str) -> np.ndarray:
    """Read 'v x y z r g b' lines from an OBJ (misc/visu_util.OBJfile2points

    semantics)."""
    pts = []
    with open(path) as f:
        for line in f:
            s = line.split()
            if not s:
                continue
            if s[0] == "v":
                pts.append([float(x) for x in s[1:7]])
            elif s[0] == "vt":
                break
    return np.asarray(pts, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="", help=".pth/.npz cloud")
    ap.add_argument("--obj", default="", help="real-world OBJ with vertex colors")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--out", default="visu_out")
    ap.add_argument("--name", default="")
    args = ap.parse_args()

    from gapartnet_tpu.infer.api import GAPartNetInference, ball_space_normalize, fps_downsample
    from gapartnet_tpu.utils import visu

    infer = GAPartNetInference(ckpt_path=args.ckpt or None)
    cfg = infer.cfg

    if args.obj:
        raw = load_obj_points(args.obj)
        xyz, rgb = raw[:, :3], raw[:, 3:6]
        idx = fps_downsample(xyz, cfg.max_points)
        xyz_n, trans = ball_space_normalize(xyz[idx])
        pts = np.concatenate([xyz_n, rgb[idx]], axis=1)
        name = args.name or Path(args.obj).stem
        gt = {}
    else:
        from gapartnet_tpu.data.loader import load_cloud_file

        d = load_cloud_file(args.input)
        pts = d["points"][: cfg.max_points]
        trans = None
        name = args.name or d["pc_id"]
        gt = dict(
            sem_gt=d["sem_labels"][: cfg.max_points],
            ins_gt=d["instance_labels"][: cfg.max_points],
            npcs_gt=d["gt_npcs"][: cfg.max_points] + 0.5,
        )

    result = infer.predict(pts)
    print(
        f"[visu] {name}: {len(result.bboxes)} boxes, "
        f"classes {result.proposal_classes.tolist()}"
    )
    visu.visualize_gapartnet(
        save_root=args.out,
        name=name,
        split="tool",
        points=pts,
        trans=trans,
        sem_preds=result.sem_preds,
        ins_preds=result.ins_preds,
        npcs_preds=result.npcs_map,
        bboxes=result.bboxes,
        save_option=(
            "pc", "sem_pred", "ins_pred", "npcs_pred", "bbox_pred",
            "bbox_pred_pure", "sem_gt", "ins_gt", "npcs_gt",
        ),
        **gt,
    )
    print(f"[visu] wrote panels under {args.out}/tool/")


if __name__ == "__main__":
    main()
