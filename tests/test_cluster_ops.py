import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops.ball_query import ball_query_single
from gapartnet_tpu.ops.ccl import connected_components_single
from gapartnet_tpu.ops.nms import nms_single, pairwise_pointset_iou
from gapartnet_tpu.ops.iou import instance_seg_iou
from gapartnet_tpu.ops.fps import furthest_point_sampling_single
from tests.oracles import (
    ball_query_oracle,
    ccl_oracle,
    nms_oracle,
    instance_iou_oracle,
    fps_oracle,
)


def test_ball_query_matches_oracle(rng):
    n, k = 200, 8
    pts = rng.rand(n, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    r = 0.15
    idx, counts = ball_query_single(
        jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(valid), r, k,
        query_block=64, point_block=64,
    )
    oidx, ocounts = ball_query_oracle(pts, pts, labels, labels, r, k)
    np.testing.assert_array_equal(np.asarray(counts), ocounts)
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_ball_query_respects_mask(rng):
    n, k = 64, 4
    pts = rng.rand(n, 3).astype(np.float32)
    labels = np.zeros(n, np.int32)
    valid = np.arange(n) < 32
    idx, counts = ball_query_single(
        jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(valid), 0.5, k,
        query_block=32, point_block=32,
    )
    idx = np.asarray(idx)
    # invalid queries have no neighbors; no neighbor refers to invalid points
    assert np.all(idx[32:] == -1)
    assert np.all(idx[idx >= 0] < 32)
    oidx, _ = ball_query_oracle(pts[:32], pts[:32], labels[:32], labels[:32], 0.5, k)
    np.testing.assert_array_equal(idx[:32], oidx)


def test_ccl_matches_oracle(rng):
    n, k = 100, 6
    pts = rng.rand(n, 3).astype(np.float32) * 3
    labels = rng.randint(0, 2, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    idx, _ = ball_query_single(
        jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(valid), 0.35, k,
        query_block=50, point_block=50,
    )
    got = np.asarray(
        connected_components_single(idx, jnp.asarray(valid))
    )
    want = ccl_oracle(np.asarray(idx))
    np.testing.assert_array_equal(got, want)


def test_ccl_two_chains():
    # 0-1-2 chain, 3-4 chain, 5 isolated
    nbr = np.full((6, 2), -1, np.int32)
    nbr[0, 0] = 1
    nbr[1, 0] = 2
    nbr[3, 0] = 4
    got = np.asarray(
        connected_components_single(jnp.asarray(nbr), jnp.ones(6, bool))
    )
    np.testing.assert_array_equal(got, [0, 0, 0, 3, 3, 5])


def test_nms_matches_oracle(rng):
    p = 20
    scores = rng.rand(p).astype(np.float32)
    ious = rng.rand(p, p).astype(np.float32)
    ious = (ious + ious.T) / 2
    np.fill_diagonal(ious, 1.0)
    valid = np.ones(p, bool)
    keep_mask = np.asarray(
        nms_single(jnp.asarray(ious), jnp.asarray(scores), jnp.asarray(valid), 0.3)
    )
    keep_oracle = nms_oracle(ious, scores, 0.3)
    got = np.nonzero(keep_mask)[0]
    np.testing.assert_array_equal(np.sort(got), np.sort(keep_oracle))


def test_pairwise_pointset_iou(rng):
    # proposals: {0,1,2}, {1,2,3}, {5}
    entry_point = np.array([0, 1, 2, 1, 2, 3, 5], np.int32)
    entry_prop = np.array([0, 0, 0, 1, 1, 1, 2], np.int32)
    mask = np.ones(7, bool)
    sizes = np.array([3, 3, 1], np.int32)
    ious = np.asarray(
        pairwise_pointset_iou(
            jnp.asarray(entry_point), jnp.asarray(entry_prop), jnp.asarray(mask),
            jnp.asarray(sizes), num_points=8,
        )
    )
    np.testing.assert_allclose(ious[0, 1], 2 / 4, rtol=1e-5)
    np.testing.assert_allclose(ious[0, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.diag(ious), 1.0, rtol=1e-5)


def test_instance_iou_matches_oracle(rng):
    e, p_cap, i_cap = 64, 6, 4
    entry_prop = rng.randint(0, p_cap, size=e).astype(np.int32)
    entry_inst = rng.randint(-1, i_cap, size=e).astype(np.int32)
    entry_inst[entry_inst < 0] = -100
    mask = np.ones(e, bool)
    sizes_p = np.bincount(entry_prop, minlength=p_cap).astype(np.int32)
    sizes_i = np.zeros(i_cap, np.int32)
    for ins in entry_inst:
        if ins >= 0:
            sizes_i[ins] += 1
    got = np.asarray(
        instance_seg_iou(
            jnp.asarray(entry_prop), jnp.asarray(entry_inst), jnp.asarray(mask),
            jnp.asarray(sizes_p), jnp.asarray(sizes_i),
            num_proposals=p_cap, num_instances=i_cap,
        )
    )
    want = instance_iou_oracle(entry_prop, entry_inst, sizes_i)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fps_matches_oracle(rng):
    n, s = 128, 16
    pts = rng.rand(n, 3).astype(np.float32)
    got = np.asarray(furthest_point_sampling_single(jnp.asarray(pts), s))
    want = fps_oracle(pts, s)
    np.testing.assert_array_equal(got, want)


def test_fps_respects_mask(rng):
    n, s = 64, 8
    pts = rng.rand(n, 3).astype(np.float32)
    valid = np.arange(n) < 32
    got = np.asarray(
        furthest_point_sampling_single(jnp.asarray(pts), s, valid=jnp.asarray(valid))
    )
    assert np.all(got < 32)
    want = fps_oracle(pts[:32], s)
    np.testing.assert_array_equal(got, want)
