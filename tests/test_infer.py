import numpy as np
import pytest

from gapartnet_tpu.data.synthetic import synthetic_cloud
from gapartnet_tpu.infer.api import (
    GAPartNetInference,
    backproject_depth,
    ball_space_normalize,
    estimate_joint_angle,
    fps_downsample,
)
from tests.test_model_forward import SMALL_CFG


# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def test_backproject_depth_roundtrip(rng):
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.zeros((48, 64), np.float32)
    depth[10, 20] = 2.0
    depth[30, 40] = 1.5
    rgb = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    xyz, colors, pix = backproject_depth(depth, K, rgb)
    assert xyz.shape == (2, 3)
    # pixel (y=10, x=20), z=2 -> x = (20-32)*2/100
    np.testing.assert_allclose(xyz[0], [(20 - 32) * 2 / 100, (10 - 32 + 8) * 2 / 100, 2.0], atol=1e-6)
    assert colors.shape == (2, 3) and (colors <= 1).all()
    np.testing.assert_array_equal(pix[0], [10, 20])


def test_ball_space_normalize(rng):
    xyz = rng.rand(100, 3).astype(np.float32) * 5 + 3
    norm, trans = ball_space_normalize(xyz)
    assert np.linalg.norm(norm, axis=1).max() <= 1.0 + 1e-5
    np.testing.assert_allclose(norm * trans[0] + trans[1:], xyz, atol=1e-4)


def test_fps_downsample_shapes(rng):
    xyz = rng.rand(500, 3).astype(np.float32)
    idx = fps_downsample(xyz, 100)
    assert len(idx) == 100 and len(np.unique(idx)) == 100
    idx2 = fps_downsample(xyz, 600)
    assert len(idx2) == 500  # fewer points than requested -> identity


def test_inference_end_to_end(rng):
    infer = GAPartNetInference(cfg=SMALL_CFG)
    c = synthetic_cloud(rng, num_points=SMALL_CFG.max_points, num_parts=3)
    res = infer.predict(c["points"])
    n = SMALL_CFG.max_points
    assert res.sem_preds.shape == (n,)
    assert res.ins_preds.shape == (n,)
    assert res.npcs_map.shape == (n, 3)
    assert np.isfinite(res.npcs_map).all()
    # instance ids are contiguous from 0
    uids = np.unique(res.ins_preds)
    assert uids[0] == 0 or len(uids) >= 1
    for b in res.bboxes:
        assert b.shape == (8, 3) and np.isfinite(b).all()


def test_joint_angle_recovery(rng):
    # rotate a part cloud around a known axis/pivot by a known angle
    pts = rng.rand(200, 3).astype(np.float64)
    axis = np.array([0.0, 0.0, 1.0])
    angle = 0.7
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])  # row-vector convention
    pivot = np.array([0.5, -0.2, 0.3])
    pts_b = (pts - pivot) @ R + pivot
    est = estimate_joint_angle(pts, pts_b)
    np.testing.assert_allclose(abs(est["angle_rad"]), angle, atol=1e-3)
    np.testing.assert_allclose(np.abs(est["axis"]), np.abs(axis), atol=1e-3)
    # pivot lies on the axis: its xy must match (z is unconstrained)
    np.testing.assert_allclose(est["pivot"][:2], pivot[:2], atol=1e-2)


def test_joint_angle_cpd_correspondence_free(rng):
    """The CPD branch (reference structure/gapartnet.py:861) must recover
    the joint without index correspondence — frame b is an independently
    shuffled sample of the rotated part, which breaks the RANSAC branch's
    paired-Umeyama assumption."""
    pts = rng.rand(300, 3).astype(np.float64)
    axis = np.array([0.0, 0.0, 1.0])
    angle = 0.5
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
    pivot = np.array([0.5, -0.2, 0.3])
    pts_b = (pts - pivot) @ R + pivot
    perm = rng.permutation(len(pts_b))
    est = estimate_joint_angle(pts, pts_b[perm], method="cpd")
    np.testing.assert_allclose(abs(est["angle_rad"]), angle, atol=5e-3)
    np.testing.assert_allclose(np.abs(est["axis"]), np.abs(axis), atol=5e-3)
    np.testing.assert_allclose(est["pivot"][:2], pivot[:2], atol=2e-2)


def test_rigid_cpd_known_transform(rng):
    """rigid_cpd recovers a known similarity transform (row convention
    T(y) = s * y @ R + t) from shuffled clouds."""
    from scipy.spatial.transform import Rotation

    from gapartnet_tpu.ops.cpd import rigid_cpd

    y = rng.rand(250, 3)
    R = Rotation.from_rotvec([0.3, -0.2, 0.4]).as_matrix().T
    s_true, t_true = 1.3, np.array([0.2, -0.1, 0.05])
    x = s_true * (y @ R) + t_true
    s, r, t, sigma2 = map(np.asarray, rigid_cpd(x, y[rng.permutation(len(y))]))
    np.testing.assert_allclose(s, s_true, atol=1e-3)
    np.testing.assert_allclose(r, R, atol=1e-3)
    np.testing.assert_allclose(t, t_true, atol=1e-3)
    assert sigma2 < 1e-4


def test_inference_auto_capacity(rng):
    """auto_capacity sizes level capacities from the input cloud, reuses
    weights across the graph rebuild, and only ever grows capacities."""
    infer = GAPartNetInference(cfg=SMALL_CFG, auto_capacity=True)
    c = synthetic_cloud(rng, num_points=SMALL_CFG.max_points, num_parts=3)
    res = infer.predict(c["points"])
    assert infer._capacity_fitted
    caps1 = infer.cfg.input_capacities()
    # fitted capacities bound the actual cloud occupancy
    from gapartnet_tpu.data.capacity import _unique_counts

    counts = _unique_counts(
        c["points"][:, :3].astype(np.float64), infer.cfg.voxel_size, len(caps1)
    )
    assert all(n <= cap for n, cap in zip(counts, caps1)), (counts, caps1)
    assert res.sem_preds.shape == (SMALL_CFG.max_points,)
    # a second, smaller cloud must NOT shrink capacities (no recompile)
    c2 = synthetic_cloud(rng, num_points=SMALL_CFG.max_points // 2, num_parts=2)
    infer.predict(c2["points"])
    assert infer.cfg.input_capacities() == caps1
