import json
import os

import numpy as np
import pytest

from gapartnet_tpu.datagen import convert, pose
from gapartnet_tpu.datagen.render import (
    get_cam_pos,
    read_joints_from_urdf_file,
    sample_joint_qpos,
    seg_maps_from_visual_ids,
)


def test_axangle2mat_properties(rng):
    axis = rng.randn(3)
    m = pose.axangle2mat(axis, 0.8)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-10)
    # axis is fixed
    a = axis / np.linalg.norm(axis)
    np.testing.assert_allclose(m @ a, a, atol=1e-10)


def test_fk_prismatic_and_revolute():
    joints = {
        "j_root": dict(type="fixed", parent="world", child="base"),
        "j1": dict(type="prismatic", parent="base", child="link1"),
        "j2": dict(type="revolute", parent="link1", child="link2"),
    }
    states = {
        "j1": dict(origin=np.zeros(3), axis=np.array([0.0, 0, 1])),
        "j2": dict(origin=np.array([1.0, 0, 0]), axis=np.array([0.0, 0, 1])),
    }
    bbox = np.tile(np.array([[1.0, 0, 0]]), (8, 1))
    targets = {"link2": dict(category_id=3, bbox=bbox)}
    qpos = {"j_root": 0.0, "j1": 0.5, "j2": np.pi / 2}
    out = pose.fk_part_bboxes(targets, joints, states, qpos, "world")
    got = out["link2"]["bbox"]
    # revolute about z at origin (1,0,0): bbox at (1,0,0) stays; then
    # prismatic translates +0.5 z
    np.testing.assert_allclose(got[0], [1.0, 0.0, 0.5], atol=1e-6)
    assert out["link2"]["category_id"] == 3


def test_npcs_rts_roundtrip(rng):
    # build an oriented box and verify the NPCS map normalizes its corners
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    size = np.array([0.4, 0.2, 0.1])
    canon = np.array(
        [
            [-1, 1, 1], [1, 1, 1], [1, -1, 1], [-1, -1, 1],
            [-1, 1, -1], [1, 1, -1], [1, -1, -1], [-1, -1, -1],
        ]
    ) * (size / 2)
    center = rng.randn(3)
    bbox = canon @ q + center
    rts = pose.npcs_rts_from_bbox(bbox)
    np.testing.assert_allclose(rts["T"], center, atol=1e-6)
    np.testing.assert_allclose(np.sort(rts["S"]), np.sort(size), atol=1e-5)
    # mapping the corners through (p - T)/scaler @ R.T recovers the canonical
    # scaled corners (up to the box's symmetry)
    mapped = ((bbox - rts["T"]) / rts["scaler"]) @ rts["R"].T
    want = canon / rts["scaler"]
    np.testing.assert_allclose(
        np.sort(np.abs(mapped), axis=0), np.sort(np.abs(want), axis=0), atol=1e-5
    )


def test_seg_maps():
    seg = np.array([[1, 1, 2], [3, 0, 0]], np.uint16)
    vis_to_link = {1: "door", 2: "door", 3: "handle"}
    link_pose = {"door": {"category_id": 3}, "handle": {"category_id": 0}}
    depth = np.array([[1.0, 1.0, 1.0], [1.0, 0.0, 1.0]])
    sem, ins, l2i = seg_maps_from_visual_ids(seg, vis_to_link, link_pose, depth)
    assert l2i == {"door": 0, "handle": 1}
    np.testing.assert_array_equal(sem, [[3, 3, 3], [0, -2, -1]])
    np.testing.assert_array_equal(ins, [[0, 0, 0], [1, -2, -1]])


def test_urdf_parsing(tmp_path):
    urdf = """<robot name="r">
      <joint name="j1" type="revolute">
        <parent link="base"/><child link="door"/>
        <origin xyz="0.1 0 0" rpy="0 0 0"/>
        <axis xyz="0 0 1"/>
        <limit lower="0" upper="1.57"/>
      </joint>
      <joint name="j0" type="fixed">
        <parent link="world"/><child link="base"/>
        <origin xyz="0 0 0"/>
      </joint>
    </robot>"""
    (tmp_path / "m.urdf").write_text(urdf)
    joints = read_joints_from_urdf_file(str(tmp_path), "m.urdf")
    assert joints["j1"]["type"] == "revolute"
    assert joints["j1"]["limit"] == [0.0, 1.57]
    assert joints["j1"]["axis"] == [0.0, 0.0, 1.0]
    assert joints["j0"]["type"] == "fixed"
    qpos = sample_joint_qpos(joints, np.random.RandomState(0))
    assert qpos["j0"] == 0.0
    assert 0.0 <= qpos["j1"] <= 1.57


def test_camera_position_ranges():
    p = get_cam_pos(30, 30, 45, 45, 2, 2, np.random.RandomState(0))
    r = np.linalg.norm(p)
    np.testing.assert_allclose(r, 2.0, atol=1e-6)
    # theta from the xy-plane: z = r sin(30 deg)
    np.testing.assert_allclose(p[2], 2 * np.sin(np.deg2rad(30)), atol=1e-6)


def test_convert_end_to_end(rng, tmp_path):
    h, w = 64, 64
    K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
    depth = np.ones((h, w), np.float32) * 2.0
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    sem = np.full((h, w), -1, np.int32)
    ins = np.full((h, w), -1, np.int32)
    sem[:32], ins[:32] = 2, 0       # one part in the upper half
    sem[40:42, :] = -2              # some empty background
    ins[40:42, :] = -2
    npcs = rng.rand(h, w, 3).astype(np.float32) - 0.5

    ret = convert.sample_and_save(
        "Box_0_0_0", rgb, depth, sem, ins, npcs, K,
        str(tmp_path), num_points=512, save_pth=False,
    )
    assert ret == 0
    d = np.load(tmp_path / "pth" / "Box_0_0_0.npz")
    assert d["xyz"].shape == (512, 3)
    assert np.linalg.norm(d["xyz"], axis=1).max() <= 1 + 1e-5
    assert set(np.unique(d["sem_labels"])) <= {0, 3}
    ins_out = d["instance_labels"]
    assert set(np.unique(ins_out)) == {-100, 0}
    gt = np.loadtxt(tmp_path / "gt" / "Box_0_0_0.txt")
    assert set(np.unique(gt)) == {-100, 3000}
    meta = np.loadtxt(tmp_path / "meta" / "Box_0_0_0.txt", delimiter=",")
    assert meta.shape == (4,)


def test_visualize_render_3d_headless(rng, tmp_path):
    """view_3d without open3d must export valid PLY files (point cloud +

    bbox edge line sets) whose geometry round-trips the projection."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import visualize_render as vr

    h, w = 32, 40
    depth = np.zeros((h, w), np.float32)
    depth[8:24, 10:30] = 1.5
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
    # simple world frame: camera rotated identity, translated
    w2c = np.eye(3)
    t = np.array([0.1, -0.2, 0.3])
    bboxes = {"link_0": {"bbox": (rng.rand(8, 3) * 0.5).tolist()}}

    mode = vr.view_3d(tmp_path, "t0", depth, K, w2c, t, bboxes, rgb=None)
    assert mode == "ply"  # open3d absent in this image
    pc = (tmp_path / "t0_pc_world.ply").read_text().splitlines()
    n_vertex = int([l for l in pc if l.startswith("element vertex")][0].split()[-1])
    assert n_vertex == int((depth > 0).sum())
    # first vertex round-trips backproject: pixel (10, 8) at depth 1.5
    x0 = (10 - K[0, 2]) * 1.5 / K[0, 0] + t[0]
    first = [float(v) for v in pc[pc.index("end_header") + 1].split()]
    np.testing.assert_allclose(first[0], x0, atol=1e-4)
    bb = (tmp_path / "t0_bboxes.ply").read_text()
    assert "element edge 12" in bb
