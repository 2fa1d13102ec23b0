import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops.voxelize import voxelize_single, unpack_key, KEY_SENTINEL
from tests.oracles import voxelize_oracle


def _run(pt_xyz, feats, voxel_size, rmin, rmax, mask=None):
    res = voxelize_single(
        jnp.asarray(pt_xyz),
        jnp.asarray(feats),
        jnp.asarray(voxel_size),
        jnp.asarray(rmin),
        jnp.asarray(rmax),
        None if mask is None else jnp.asarray(mask),
    )
    return res


def test_voxelize_matches_oracle(rng):
    n = 500
    pts = rng.rand(n, 3).astype(np.float32) * 2 - 1
    feats = rng.rand(n, 6).astype(np.float32)
    vsize = np.array([0.01, 0.01, 0.01], np.float32)
    rmin = pts.min(0) - 1e-4
    rmax = pts.max(0) + 1e-4

    res = _run(pts, feats, vsize, rmin, rmax)
    of, oc, oid = voxelize_oracle(pts, feats, vsize, rmin, rmax)

    nv = int(res.num_voxels)
    assert nv == of.shape[0]
    np.testing.assert_array_equal(np.asarray(res.pc_voxel_id), oid)
    np.testing.assert_array_equal(np.asarray(res.voxel_coords)[:nv], oc)
    np.testing.assert_allclose(
        np.asarray(res.voxel_features)[:nv], of, rtol=1e-5, atol=1e-5
    )
    # padding is clean
    assert np.all(np.asarray(res.voxel_keys)[nv:] == KEY_SENTINEL)
    assert np.all(np.asarray(res.voxel_mask)[:nv])
    assert not np.any(np.asarray(res.voxel_mask)[nv:])


def test_voxelize_out_of_range_points(rng):
    pts = np.array(
        [[0.5, 0.5, 0.5], [2.0, 0.5, 0.5], [0.8, 0.8, 0.8]], np.float32
    )
    feats = np.eye(3, dtype=np.float32)
    res = _run(pts, feats, [0.25] * 3, [0.0] * 3, [1.0] * 3)
    ids = np.asarray(res.pc_voxel_id)
    assert ids[1] == -1
    assert ids[0] >= 0 and ids[2] >= 0
    assert int(res.num_voxels) == 2


def test_voxelize_respects_point_mask(rng):
    n = 64
    pts = rng.rand(n, 3).astype(np.float32)
    feats = rng.rand(n, 4).astype(np.float32)
    mask = np.arange(n) < 40
    res = _run(pts, feats, [0.1] * 3, [0.0] * 3, [1.0] * 3, mask=mask)
    of, oc, oid = voxelize_oracle(
        pts[:40], feats[:40], np.array([0.1] * 3), np.zeros(3), np.ones(3)
    )
    assert int(res.num_voxels) == of.shape[0]
    np.testing.assert_array_equal(np.asarray(res.pc_voxel_id)[:40], oid)
    assert np.all(np.asarray(res.pc_voxel_id)[40:] == -1)
    nv = of.shape[0]
    np.testing.assert_allclose(
        np.asarray(res.voxel_features)[:nv], of, rtol=1e-5, atol=1e-5
    )


def test_voxelize_duplicate_points_mean(rng):
    pts = np.array([[0.1, 0.1, 0.1], [0.11, 0.11, 0.11], [0.9, 0.9, 0.9]], np.float32)
    feats = np.array([[1.0], [3.0], [5.0]], np.float32)
    res = _run(pts, feats, [0.5] * 3, [0.0] * 3, [1.0] * 3)
    assert int(res.num_voxels) == 2
    np.testing.assert_allclose(
        np.asarray(res.voxel_features)[:2], [[2.0], [5.0]], rtol=1e-6
    )


def test_unpack_roundtrip():
    from gapartnet_tpu.ops.voxelize import pack_coords

    coords = jnp.array([[0, 0, 0], [1023, 1023, 1023], [1, 2, 3], [512, 0, 900]])
    np.testing.assert_array_equal(
        np.asarray(unpack_key(pack_coords(coords))), np.asarray(coords)
    )
