import numpy as np

from gapartnet_tpu.data import native_loader as nl
from gapartnet_tpu.data.loader import generate_instance_info
from tests.oracles import fps_oracle


def test_native_lib_builds():
    lib = nl.get_lib()
    assert lib is not None, "g++ build of libgapdata failed"


def test_fps_cpu_matches_oracle(rng):
    pts = rng.rand(300, 3).astype(np.float32)
    got = nl.fps_cpu(pts, 32)
    want = fps_oracle(pts, 32)
    np.testing.assert_array_equal(got, want)


def test_instance_info_matches_numpy(rng):
    n = 500
    pts = rng.rand(n, 6).astype(np.float32)
    sem = rng.randint(0, 10, n).astype(np.int32)
    ins = rng.randint(-1, 5, n).astype(np.int32)
    ins[ins == -1] = -100
    regions_np, nppi_np, isl_np, num_np = generate_instance_info(pts, sem, ins)
    regions, nppi, isl, num = nl.instance_info(pts, sem, ins, max_instances=8)
    assert num == num_np
    np.testing.assert_allclose(regions, regions_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(nppi[:num], nppi_np[:num])
    np.testing.assert_array_equal(isl[:num], isl_np[:num])


def test_augment_points_matches_numpy(rng):
    pts = rng.rand(200, 6).astype(np.float32)
    m = (np.eye(3) + rng.randn(3, 3) * 0.1).astype(np.float32)
    cd = rng.randn(3).astype(np.float32) * 0.3
    want = pts.copy()
    want[:, :3] = want[:, :3] @ m
    want[:, 3:] += cd[None, :]
    got = nl.augment_points(pts.copy(), m, cd)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
