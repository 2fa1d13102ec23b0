#!/usr/bin/env python
"""End-to-end demo (the reference demo.ipynb flow, cells 0-4):

render-or-load an example observation -> back-project -> FPS downsample
-> ball normalize -> GAPartNet inference -> part bboxes -> multi-panel
visualization.  By default it renders a REAL articulated object from the
reference's example assets (SAPIEN-free point-splat renderer,
gapartnet_tpu/datagen/assets.py) when that directory exists, and falls back
to a synthetic articulated object otherwise, so the demo runs anywhere.

    python demo.py [--ckpt CKPT] [--asset ASSET_DIR | --points cloud.npz |
                   --depth depth.npy --rgb rgb.png --K K.npy] [--out demo_out]
"""

import argparse
import os

import numpy as np

DEFAULT_ASSET = "/root/reference/example_assets/45780"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="orbax checkpoint dir (optional)")
    ap.add_argument("--depth", default="", help="depth .npy (meters)")
    ap.add_argument("--rgb", default="", help="rgb image")
    ap.add_argument("--K", default="", help="3x3 intrinsic .npy")
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--points", default="", help=".pth/.npz cloud instead of RGB-D")
    ap.add_argument(
        "--asset", default="",
        help="raw asset dir (URDF + meshes) to render a view of; defaults to "
        f"{DEFAULT_ASSET} when present",
    )
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    from gapartnet_tpu.infer.api import GAPartNetInference
    from gapartnet_tpu.models.gapartnet import GAPartNetConfig
    from gapartnet_tpu.utils import visu

    cfg = GAPartNetConfig()
    # auto_capacity: real clouds overflow the divisor-schedule voxel
    # capacities at the mid levels — size them from the input instead
    infer = GAPartNetInference(
        cfg=cfg, ckpt_path=args.ckpt or None, auto_capacity=True
    )

    trans = None
    if args.depth:
        import cv2

        depth = np.load(args.depth)
        K = np.load(args.K)
        rgb = cv2.imread(args.rgb)[..., ::-1] if args.rgb else None
        result, idx, trans = infer.predict_depth(depth, K, rgb)
        from gapartnet_tpu.infer.api import backproject_depth, ball_space_normalize

        xyz, colors, _ = backproject_depth(depth, K, rgb)
        pts = np.concatenate(
            [ball_space_normalize(xyz[idx])[0],
             colors[idx] if colors is not None else np.zeros((len(idx), 3))],
            axis=1,
        )
    elif args.points:
        from gapartnet_tpu.data.loader import load_cloud_file

        d = load_cloud_file(args.points)
        pts = d["points"][: cfg.max_points]
        result = infer.predict(pts)
    elif args.asset or os.path.isdir(DEFAULT_ASSET):
        # REAL articulated geometry: render one view of a raw reference asset
        # (URDF + OBJ meshes) with the SAPIEN-free point-splat renderer, then
        # run the same RGB-D inference path a real camera would feed
        # (reference demo.ipynb cells 0-4).
        asset = args.asset or DEFAULT_ASSET
        print(f"[demo] rendering a view of real asset {asset}")
        from gapartnet_tpu.datagen.assets import render_view_maps

        maps = render_view_maps(asset, seed=args.seed)
        bgr = maps["rgb"][..., ::-1]  # the RGB-D API expects cv2 BGR images
        result, idx, trans = infer.predict_depth(maps["depth"], maps["K"], bgr)
        from gapartnet_tpu.infer.api import backproject_depth, ball_space_normalize

        xyz, colors, pix = backproject_depth(maps["depth"], maps["K"], bgr)
        pts = np.concatenate(
            [ball_space_normalize(xyz[idx])[0], colors[idx]], axis=1
        )
        gt_sem = maps["sem"][pix[idx, 0], pix[idx, 1]]
        agree = (result.sem_preds == np.clip(gt_sem + 1, 0, None)).mean()
        print(f"[demo] sem agreement vs render labels: {agree:.3f} "
              "(untrained weights ~ chance unless --ckpt given)")
    else:
        print("[demo] no input given; using a synthetic articulated object")
        from gapartnet_tpu.data.synthetic import synthetic_cloud

        c = synthetic_cloud(np.random.RandomState(0), num_points=cfg.max_points)
        pts = c["points"]
        result = infer.predict(pts)

    print(f"[demo] {int((result.ins_preds > 0).sum())} part points, "
          f"{len(result.bboxes)} bboxes, "
          f"classes={result.proposal_classes.tolist()}, "
          f"scores={np.round(result.proposal_scores, 3).tolist()}")

    panels = visu.visualize_gapartnet(
        save_root=args.out,
        name="demo",
        split="demo",
        points=pts,
        trans=trans,
        sem_preds=result.sem_preds,
        ins_preds=result.ins_preds,
        npcs_preds=result.npcs_map,
        bboxes=result.bboxes,
        save_option=("pc", "sem_pred", "ins_pred", "npcs_pred", "bbox_pred"),
    )
    print(f"[demo] wrote {len(panels)} panels under {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
