"""Synthetic-asset generator (datagen/synthetic.py) tests.

Checks the generated directories speak the exact asset format the SAPIEN-free
pipeline consumes (reference example_assets layout), that the bbox corner
conventions yield proper NPCS rotations (pose_utils.py:110-137 math), and
that a full render_view_maps pass produces every expected part class.
"""

import collections

import numpy as np
import pytest

from gapartnet_tpu.datagen import assets, synthetic
from gapartnet_tpu.datagen.config import TARGET_GAPARTS
from gapartnet_tpu.datagen.pose import npcs_rts_from_bbox
from gapartnet_tpu.datagen.render import (
    load_target_links,
    read_joints_from_urdf_file,
)


@pytest.fixture(scope="module")
def synth_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return synthetic.generate_assets(
        str(root), {"Box": 1, "Remote": 1, "Microwave": 1}, seed=11
    )


EXPECTED = {
    "Box": {"hinge_door", "line_fixed_handle"},
    "Remote": {"slider_button"},
    "Microwave": {"hinge_door", "line_fixed_handle", "slider_button"},
}


def test_asset_format(synth_dirs):
    for d in synth_dirs:
        joints = read_joints_from_urdf_file(d, synthetic.ANNOTATION_URDF)
        # every link chains to base; at least one movable joint
        types = {j["type"] for j in joints.values()}
        assert types & {"revolute", "prismatic"}, types
        for jd in joints.values():
            if jd["type"] in ("revolute", "prismatic"):
                assert jd["limit"] is not None and jd["axis"] is not None
        target = load_target_links(d, "link_annotation_gapartnet.json")
        cats = {
            TARGET_GAPARTS[v["category_id"]] for v in target.values()
        }
        arch = d.rsplit("/", 1)[-1].split("_")[0]
        assert cats == EXPECTED[arch], (arch, cats)


def test_bbox_frames_are_proper_rotations(synth_dirs):
    for d in synth_dirs:
        target = load_target_links(d, "link_annotation_gapartnet.json")
        for link, v in target.items():
            rts = npcs_rts_from_bbox(v["bbox"])
            R = rts["R"]
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-6), (d, link)
            assert np.linalg.det(R) > 0.99, (d, link)
            assert (rts["S"] > 0).all(), (d, link)
            # bbox edges orthogonal (cuboid corners in canon order)
            b = v["bbox"]
            e01, e12, e04 = b[1] - b[0], b[2] - b[1], b[4] - b[0]
            assert abs(np.dot(e01, e12)) < 1e-6
            assert abs(np.dot(e01, e04)) < 1e-6


def test_determinism(tmp_path):
    a = synthetic.build_cabinet(str(tmp_path / "a"), "90001", seed=5)
    b = synthetic.build_cabinet(str(tmp_path / "b"), "90001", seed=5)
    ja = (tmp_path / "a" / "link_annotation_gapartnet.json").read_text()
    jb = (tmp_path / "b" / "link_annotation_gapartnet.json").read_text()
    assert ja == jb


def test_render_view_all_classes(synth_dirs):
    for d in synth_dirs:
        m = assets.render_view_maps(
            d, camera_idx=0, seed=3, width=320, height=320,
            num_surface_samples=80_000,
        )
        sem, ins, npcs = m["sem"], m["ins"], m["npcs"]
        seen = {
            TARGET_GAPARTS[k]
            for k in collections.Counter(sem[sem >= 0].tolist())
        }
        arch = d.rsplit("/", 1)[-1].split("_")[0]
        assert seen == EXPECTED[arch], (arch, seen)
        lab = ins >= 0
        assert lab.any()
        # NPCS of annotated pixels live in the canonical [-0.5, 0.5]^3 cube
        # (+ small slack for splat depth quantization)
        assert np.abs(npcs[lab]).max() < 0.55, np.abs(npcs[lab]).max()
        # pixels with a part instance always carry a part class
        assert (sem[lab] >= 0).all()
