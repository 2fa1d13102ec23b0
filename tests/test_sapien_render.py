"""SAPIEN rasterizer-path tests — skipped unless sapien imports.

This environment has no SAPIEN/Vulkan, so these are the opt-in CI recipe
for a GPU/Vulkan host (reference render_tools/render.py:15-147 behavior):
run `pip install sapien==2.2.2 transforms3d` and execute this file to
exercise `set_all_scene` + rasterization end to end.
"""

import os

import numpy as np
import pytest

sapien = pytest.importorskip("sapien")

ASSET_ROOT = "/root/reference/example_assets"


@pytest.mark.slow
def test_render_one_image_full_raster(tmp_path):
    from gapartnet_tpu.datagen.render import render_one_image

    # id list mapping the example asset to its category
    id_list = tmp_path / "id_list.txt"
    id_list.write_text("StorageFurniture 45780\n")
    render_one_image(
        "partnet", 45780, camera_idx=0, render_idx=0,
        dataset_path=ASSET_ROOT, id_list_path=str(id_list),
        save_path=str(tmp_path / "out"), height=256, width=256, seed=0,
    )
    out = tmp_path / "out"
    assert list((out / "rgb").iterdir()), "no rgb output written"
    depth = np.load(next((out / "depth").glob("*.npz")))
    assert depth["depth_map"].shape == (256, 256)
    assert np.isfinite(depth["depth_map"]).all()
    seg = np.load(next((out / "segmentation").glob("*.npz")))
    # seg maps carry -2 background / -1 others / >=0 target part ids
    assert (seg["semantic_segmentation"] >= -2).all()
    assert (seg["semantic_segmentation"] >= 0).any(), "no target parts visible"
    npcs = np.load(next((out / "npcs").glob("*.npz")))
    assert np.abs(npcs["npcs_map"]).max() <= 0.5 + 1e-5
