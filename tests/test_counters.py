"""Capacity-overflow counters: each overflow is deliberately triggered.

Silent fixed-shape clipping (proposals past max_proposals, hash-CCL node
table, sparse voxel capacities) must surface as nonzero ModelOutput.counters
/ counters/* metrics and trip GAPARTNET_CHECKS=jit (VERDICT round-1 weak #5).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
from gapartnet_tpu.models.grouping import cluster_single
from gapartnet_tpu.ops.hash_ccl import hash_connected_components
from gapartnet_tpu.structures import PointCloudBatch
from gapartnet_tpu.data.synthetic import synthetic_batch

import pytest

# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def _line_cloud(n):
    """n isolated points -> n singleton clusters per set."""
    xyz = (np.arange(n)[:, None] * np.array([1.0, 0, 0])).astype(np.float32)
    return jnp.asarray(xyz)


def test_dropped_proposals_counter():
    n = 24
    xyz = _line_cloud(n)
    prop = cluster_single(
        xyz, jnp.zeros((n, 3)), jnp.ones(n, jnp.int32), jnp.ones(n, bool),
        0.1, 8, 8, 1, max_proposals=4,
    )
    # 2 sets x 24 singletons = 48 kept clusters, capacity 4
    assert int(prop.num_proposals) == 4
    assert int(prop.num_dropped) == 44
    assert int(prop.ccl_overflow) == 0


def test_ccl_node_overflow_counter():
    n = 32
    # spacing 0.02 >> radius 0.01: 32 isolated points in 32 distinct cells,
    # all inside the 128-cell grid (128 * 0.01/sqrt(3) = 0.74 > 0.62 span)
    xyz = _line_cloud(n) * 0.02
    labels, ovf, _ = hash_connected_components(
        xyz, jnp.ones(n, jnp.int32), jnp.ones(n, bool), 0.01,
        node_capacity=8,
    )
    # every point is its own (cell, label) node: 32 nodes vs capacity 8
    assert int(ovf) == 32 - 8
    # overflowed points are isolated singletons labeling themselves
    np.testing.assert_array_equal(np.asarray(labels), np.arange(n))


def _model_counters(cfg, batch):
    model = GAPartNet(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "proposal_jitter": jax.random.PRNGKey(1)}

    @jax.jit
    def run(b):
        v = model.init(rngs, b, train=False, do_cluster=True, do_score=True,
                       do_npcs=True)
        out = model.apply(v, b, train=False, do_cluster=True, do_score=True,
                          do_npcs=True)
        return out.counters

    return {k: np.asarray(v) for k, v in run(batch).items()}


def _tiny_batch(n=96, b=1, max_inst=6):
    d = synthetic_batch(
        np.random.RandomState(5), batch_size=b, num_points=n, num_parts=3,
        max_instances=max_inst,
    )
    ids = d.pop("pc_ids")
    return PointCloudBatch(**{k: jnp.asarray(v) for k, v in d.items()}, pc_ids=ids)


def test_model_counters_zero_when_capacities_ample():
    cfg = GAPartNetConfig(
        channels=(8, 16), max_points=96, max_proposals=16, max_instances=6,
        # full capacity at every level: nothing can be clipped
        level_capacity_divisors=(1, 1), min_num_points_per_proposal=3,
        ball_query_radius=0.1, max_num_points_per_query=8,
        max_num_points_per_query_shift=16, score_fullscale=12.0,
    )
    counters = _model_counters(cfg, _tiny_batch())
    for k, v in counters.items():
        assert (v == 0).all(), (k, v)


def test_model_counters_trip_on_tight_capacities():
    cfg = GAPartNetConfig(
        channels=(8, 16), max_points=96, max_proposals=2, max_instances=6,
        # level-1 capacity 96//48 = 2: the stride-2 downsample must drop voxels
        level_capacity_divisors=(1, 48), min_num_points_per_proposal=3,
        ball_query_radius=0.1, max_num_points_per_query=8,
        max_num_points_per_query_shift=16, score_fullscale=12.0,
    )
    counters = _model_counters(cfg, _tiny_batch())
    assert counters["backbone_voxels_dropped"].sum() > 0
    assert counters["dropped_proposals"].sum() > 0


def test_sparse_proposal_voxel_drop_counter():
    cfg = GAPartNetConfig(
        channels=(8, 16), max_points=96, max_proposals=16, max_instances=6,
        level_capacity_divisors=(1, 2), min_num_points_per_proposal=3,
        ball_query_radius=0.1, max_num_points_per_query=8,
        max_num_points_per_query_shift=16, score_fullscale=12.0,
        proposal_conv_impl="sparse", proposal_voxel_capacity=8,
    )
    counters = _model_counters(cfg, _tiny_batch())
    assert counters["proposal_voxels_dropped"].sum() > 0


def test_train_metrics_carry_counters():
    from gapartnet_tpu.train.loop import adam, create_train_state, make_train_step

    cfg = GAPartNetConfig(
        channels=(8, 16), max_points=96, max_proposals=16, max_instances=6,
        level_capacity_divisors=(1, 2), min_num_points_per_proposal=3,
        ball_query_radius=0.1, max_num_points_per_query=8,
        max_num_points_per_query_shift=16, score_fullscale=12.0,
    )
    model = GAPartNet(cfg)
    batch = _tiny_batch()
    opt = adam(1e-3)
    state = create_train_state(model, batch, opt)
    step = make_train_step(model, opt, do_cluster=True, do_score=True,
                           do_npcs=True, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "counters/dropped_proposals" in metrics
    assert "counters/ccl_node_overflow" in metrics


def test_ccl_degree_drop_counted():
    """Connected edges beyond hash_max_degree are edge losses and must fold
    into the cand_truncated counter (no silent capacity in the clustering
    path) — a dense same-label blob connects every node to many neighbors."""
    import jax.numpy as jnp
    import numpy as np

    from gapartnet_tpu.ops.hash_ccl import hash_connected_components

    rng = np.random.RandomState(0)
    n = 512
    xyz = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 0.08)  # dense blob
    sem = jnp.ones((n,), jnp.int32)
    valid = jnp.ones((n,), bool)

    _, _, trunc_wide = hash_connected_components(
        xyz, sem, valid, 0.04, cand_cap=60, max_degree=60
    )
    _, _, trunc_tight = hash_connected_components(
        xyz, sem, valid, 0.04, cand_cap=60, max_degree=4
    )
    assert int(trunc_tight) > int(trunc_wide)
    # labels must agree anyway on a single fully-connected blob
    lab_w, _, _ = hash_connected_components(
        xyz, sem, valid, 0.04, cand_cap=60, max_degree=60
    )
    lab_t, _, _ = hash_connected_components(
        xyz, sem, valid, 0.04, cand_cap=60, max_degree=4
    )
    assert (np.asarray(lab_w) == np.asarray(lab_t)).all()
