#!/usr/bin/env python
"""Offline visualizer for rendered dataset outputs.

Equivalent of dataset/render_tools/visualize.py (reference uses open3d +
cv2; this version is cv2-only — 2D panels: depth colormap, semantic /
instance maps, NPCS map, projected part bboxes — the open3d interactive 3D
views do not apply headless).

    python tools/visualize_render.py --render_dir example_rendered \
        --name Box_100_0_0 --out visu_render
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gapartnet_tpu.utils.visu import COLOR20, OTHER_COLOR  # noqa: E402


def colorize_seg(seg: np.ndarray) -> np.ndarray:
    h, w = seg.shape
    img = np.zeros((h, w, 3), np.uint8)
    img[seg == -2] = (255, 255, 255)
    img[seg == -1] = OTHER_COLOR
    for v in np.unique(seg):
        if v >= 0:
            img[seg == v] = COLOR20[v % len(COLOR20)]
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--render_dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--out", default="visu_render")
    args = ap.parse_args()
    import cv2

    rd = Path(args.render_dir)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    depth = np.load(rd / "depth" / f"{args.name}.npz")["depth_map"]
    seg = np.load(rd / "segmentation" / f"{args.name}.npz")
    npcs = np.load(rd / "npcs" / f"{args.name}.npz")["npcs_map"]
    with open(rd / "metafile" / f"{args.name}.json") as f:
        meta = json.load(f)
    K = np.array(meta["camera_intrinsic"]).reshape(3, 3)

    # depth colormap
    d = depth.copy()
    valid = d > 0
    if valid.any():
        d[valid] = (d[valid] - d[valid].min()) / max(np.ptp(d[valid]), 1e-6)
    depth_img = cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_JET)
    depth_img[~valid] = 255
    cv2.imwrite(str(out / f"{args.name}_depth.png"), depth_img)

    cv2.imwrite(
        str(out / f"{args.name}_sem.png"),
        colorize_seg(seg["semantic_segmentation"])[..., ::-1],
    )
    cv2.imwrite(
        str(out / f"{args.name}_ins.png"),
        colorize_seg(seg["instance_segmentation"])[..., ::-1],
    )
    npcs_img = np.clip((npcs + 1) / 2 * 255, 0, 255).astype(np.uint8)
    cv2.imwrite(str(out / f"{args.name}_npcs.png"), npcs_img[..., ::-1])

    # bbox overlay: project world-frame corners through the camera
    rgb_path = rd / "rgb" / f"{args.name}.png"
    img = cv2.imread(str(rgb_path)) if rgb_path.exists() else depth_img.copy()
    with open(rd / "bbox" / f"{args.name}.json") as f:
        bboxes = json.load(f)
    w2c = np.array(meta["world2camera_rotation"]).reshape(3, 3)
    t = np.array(meta["camera2world_translation"])
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for link in bboxes.values():
        corners = np.array(link["bbox"])
        cam = (corners - t) @ w2c  # world -> camera (inverse of pose.py map)
        z = np.maximum(cam[:, 2], 1e-6)
        px = (cam[:, 0] * K[0, 0] / z + K[0, 2]).astype(int)
        py = (cam[:, 1] * K[1, 1] / z + K[1, 2]).astype(int)
        for a, b in edges:
            cv2.line(img, (px[a], py[a]), (px[b], py[b]), (255, 0, 255), 2)
    cv2.imwrite(str(out / f"{args.name}_bbox.png"), img)
    print(f"[visualize_render] wrote panels for {args.name} under {out}")


if __name__ == "__main__":
    main()
