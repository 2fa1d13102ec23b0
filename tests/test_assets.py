"""SAPIEN-free asset ingestion tests against the REAL reference assets
(/root/reference/example_assets): URDF FK, leaf->link mapping, point_sample
labeling, mesh surface sampling, the point-splat z-buffer camera model, and
the end-to-end render -> converter -> npz path.
"""

import json
import os

import numpy as np
import pytest

from gapartnet_tpu.datagen import assets
from gapartnet_tpu.datagen.render import load_target_links, read_joints_from_urdf_file

ASSET_45780 = "/root/reference/example_assets/45780"
ASSET_102442 = "/root/reference/example_assets/102442"

needs_assets = pytest.mark.skipif(
    not os.path.isdir(ASSET_45780), reason="reference example assets absent"
)


@needs_assets
def test_leaf_to_link_disambiguates_duplicate_visual_names():
    # URDF visual names are 'handle-1' for BOTH link_3 and link_4; the OBJ
    # filename sets disambiguate (result.json leaves 12 / 10)
    m = assets.leaf_to_link(ASSET_45780)
    assert m[11] == "link_0" and m[9] == "link_1"
    assert m[12] == "link_3" and m[10] == "link_4"
    assert m[14] == "link_2"


@needs_assets
def test_yup_matrix_matches_base_joint_rpy():
    j = read_joints_from_urdf_file(ASSET_45780, assets.ANNOTATION_URDF)
    base = next(jd for jd in j.values() if jd["parent"] == "base")
    np.testing.assert_allclose(
        assets.rpy_to_mat(base["rpy"]), assets.YUP_TO_WORLD, atol=1e-12
    )


@needs_assets
def test_canonical_cloud_labels():
    c = assets.canonical_cloud(ASSET_45780)
    assert c["xyz"].shape == (10000, 3)
    # StorageFurniture 45780: 2 hinge doors (class 4) + 2 line_fixed_handles
    # (class 1), everything else 'others' (0)
    assert set(np.unique(c["sem_labels"])) == {0, 1, 4}
    ins = c["instance_labels"]
    assert set(np.unique(ins[ins >= 0])) == {0, 1, 2, 3}
    # NPCS is the box-normalized coordinate: |coord| <= 0.5 for on-part points
    part = ins >= 0
    assert np.abs(c["gt_npcs"][part]).max() <= 0.52
    assert (c["gt_npcs"][~part] == 0).all()
    # sem/ins coupling: every instance point carries a part class
    assert (c["sem_labels"][part] > 0).all()
    assert (ins[c["sem_labels"] == 0] == -100).all()


@needs_assets
def test_point_sample_and_mesh_sampling_agree():
    """The two independent label sources must describe the same geometry:

    per annotated link, the AABB of mesh-surface samples matches the AABB of
    the point_sample points labeled to that link."""
    xyz_ps, _, link_names = assets.load_point_sample(ASSET_45780)
    ln = np.asarray(link_names)
    meshes = assets.load_link_meshes(ASSET_45780)
    xyz_m, _, li, links = assets.sample_surface_points(
        meshes, 50000, np.random.RandomState(0)
    )
    target = load_target_links(ASSET_45780, "link_annotation_gapartnet.json")
    for link in sorted(target):
        a = xyz_ps[ln == link]
        b = xyz_m[li == links.index(link)]
        assert len(a) > 5 and len(b) > 5, link
        np.testing.assert_allclose(a.min(0), b.min(0), atol=0.03, err_msg=link)
        np.testing.assert_allclose(a.max(0), b.max(0), atol=0.03, err_msg=link)


@needs_assets
def test_rest_points_inside_annotation_bboxes():
    meshes = assets.load_link_meshes(ASSET_45780)
    xyz, _, li, links = assets.sample_surface_points(
        meshes, 20000, np.random.RandomState(1)
    )
    target = load_target_links(ASSET_45780, "link_annotation_gapartnet.json")
    for link, t in target.items():
        bb = np.asarray(t["bbox"])
        p = xyz[li == links.index(link)]
        inside = ((p >= bb.min(0) - 0.02) & (p <= bb.max(0) + 0.02)).all(1)
        assert inside.mean() > 0.99, link


@needs_assets
def test_fk_affines_move_points_with_annotation_boxes():
    """Opening a door: points transformed by link_motion_affines stay inside

    the AABB of the fk_part_bboxes-posed annotation box (the two FK paths
    share joint-chain semantics, pose_utils.py:40-72)."""
    joints = read_joints_from_urdf_file(ASSET_45780, assets.ANNOTATION_URDF)
    rest = assets.link_rest_poses(joints)
    jstates = assets.joint_world_states(joints, rest)
    target = load_target_links(ASSET_45780, "link_annotation_gapartnet.json")
    qpos = {jn: 0.0 for jn in joints}
    qpos["joint_0"] = 1.2  # open the first hinge door

    from gapartnet_tpu.datagen.pose import fk_part_bboxes

    posed_boxes = fk_part_bboxes(target, joints, jstates, qpos, "base")
    meshes = assets.load_link_meshes(ASSET_45780)
    xyz, _, li, links = assets.sample_surface_points(
        meshes, 20000, np.random.RandomState(2)
    )
    affines = assets.link_motion_affines(links, joints, jstates, qpos)
    for link in ("link_0", "link_3"):  # the door and ITS handle (child link)
        A, b = affines[link]
        p = xyz[li == links.index(link)] @ A + b
        bb = np.asarray(posed_boxes[link]["bbox"]) if link in posed_boxes \
            else None
        if bb is None:
            continue
        inside = ((p >= bb.min(0) - 0.02) & (p <= bb.max(0) + 0.02)).all(1)
        assert inside.mean() > 0.99, link
    # the rotation actually moved the door
    A0, b0 = affines["link_0"]
    assert not np.allclose(A0, np.eye(3))
    # the static body did not move
    A2, b2 = affines["link_2"]
    np.testing.assert_allclose(A2, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(b2, 0, atol=1e-12)


def test_zbuffer_camera_roundtrip():
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3) * 0.3
    cam_pos = np.array([3.0, 2.0, 2.0])
    K = assets.camera_intrinsics(400, 400)
    depth, winner = assets.splat_zbuffer(pts, cam_pos, K, 400, 400)
    assert (depth > 0).sum() == (winner >= 0).sum() > 100
    ys, xs = np.nonzero(winner >= 0)
    z = depth[ys, xs].astype(np.float64)
    xc = (xs - K[0, 2]) * z / K[0, 0]
    yc = (ys - K[1, 2]) * z / K[1, 1]
    cam = np.stack([xc, yc, z], -1)
    R_c2w, t = assets.camera_extrinsics(cam_pos)
    world = cam @ R_c2w.T + t
    err = np.linalg.norm(world - pts[winner[ys, xs]], axis=1)
    # pixel-rounding bound: half a pixel at depth ~4 with f~646
    assert err.max() < 4.0 * 0.75 / K[0, 0]


def test_zbuffer_occlusion():
    cam_pos = np.array([0.0, -4.0, 0.0])
    K = assets.camera_intrinsics(64, 64)
    # two points on the same ray; the nearer (more negative y) must win
    pts = np.array([[0.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    depth, winner = assets.splat_zbuffer(pts, cam_pos, K, 64, 64)
    assert winner[32, 32] == 1
    np.testing.assert_allclose(depth[32, 32], 3.0, atol=1e-5)


@needs_assets
@pytest.mark.parametrize("asset", [ASSET_45780, ASSET_102442])
def test_render_asset_view_end_to_end(asset, tmp_path):
    name = assets.render_asset_view(
        asset, str(tmp_path), seed=3, width=256, height=256,
        num_surface_samples=150_000, num_points=2000,
    )
    assert name is not None
    d = np.load(tmp_path / "pth" / f"{name}.npz")
    xyz, sem, ins, npcs = (
        d["xyz"], d["sem_labels"], d["instance_labels"], d["gt_npcs"]
    )
    assert xyz.shape == (2000, 3)
    # converter contract (convert_rendered_into_input.py:126-147)
    assert np.linalg.norm(xyz, axis=1).max() <= 1.0 + 1e-5
    assert sem.min() >= 0 and sem.max() <= 9
    part = ins >= 0
    assert part.any() and (sem[part] > 0).all() and (sem[~part] == 0).all()
    # instance ids compact 0..K-1
    k = ins[part].max() + 1
    assert set(np.unique(ins[part])) == set(range(k))
    assert np.abs(npcs[part]).max() <= 0.52
    assert os.path.exists(tmp_path / "gt" / f"{name}.txt")
    assert os.path.exists(tmp_path / "meta" / f"{name}.txt")
