"""Trunk freezing for the warm-start phase (train/loop.adam freeze_prefixes).

The reference's warm-start workflow (model.py:132-143) trains every loaded
weight; at few-hundred-view scale the all-stages loss erodes a warm-started
sem head (PERF.md round 4), so phase B can freeze the trunk.  Frozen modules
must not move — params NOR BatchNorm running stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapartnet_tpu.train.loop import adam, create_train_state, make_train_step


def test_adam_freeze_mask_zeroes_updates():
    params = {
        "backbone": {"w": jnp.ones((3, 3)), "b": jnp.ones((3,))},
        "sem_seg_head": {"kernel": jnp.ones((3, 2))},
        "score_head": {"kernel": jnp.ones((3, 2))},
    }
    grads = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 0.5), params)
    tx = adam(1e-3, freeze_prefixes=("backbone", "sem_seg_head"))
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(updates["backbone"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["b"]).max()) == 0.0
    assert float(jnp.abs(updates["sem_seg_head"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["score_head"]["kernel"]).max()) > 0.0


def test_adam_no_freeze_is_plain_adam():
    params = {"a": jnp.ones((2,))}
    grads = {"a": jnp.full((2,), 0.5)}
    tx0, tx1 = adam(1e-3), adam(1e-3, freeze_prefixes=())
    u0, _ = tx0.update(grads, tx0.init(params), params)
    u1, _ = tx1.update(grads, tx1.init(params), params)
    np.testing.assert_allclose(np.asarray(u0["a"]), np.asarray(u1["a"]))


@pytest.mark.slow
def test_train_step_freeze_trunk_end_to_end():
    from gapartnet_tpu.data.synthetic import synthetic_batch
    from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
    from gapartnet_tpu.structures import PointCloudBatch

    cfg = GAPartNetConfig(
        channels=(8, 16), max_points=96, max_proposals=16, max_instances=6,
        level_capacity_divisors=(1, 1), min_num_points_per_proposal=3,
        ball_query_radius=0.1, max_num_points_per_query=8,
        max_num_points_per_query_shift=16, score_fullscale=12.0,
    )
    d = synthetic_batch(
        np.random.RandomState(5), batch_size=1, num_points=96, num_parts=3,
        max_instances=6,
    )
    ids = d.pop("pc_ids")
    batch = PointCloudBatch(
        **{k: jnp.asarray(v) for k, v in d.items()}, pc_ids=ids
    )

    frozen = ("backbone", "sem_seg_head", "offset_mlp0", "offset_bn",
              "offset_mlp1")
    model = GAPartNet(cfg)
    tx = adam(1e-2, freeze_prefixes=frozen)
    state = create_train_state(model, batch, tx, seed=0)
    step = make_train_step(
        model, tx, do_cluster=True, do_score=True, do_npcs=True,
        donate=False, freeze_prefixes=frozen,
    )
    new_state, _ = step(state, batch, jax.random.PRNGKey(3))

    def leaf_delta(tree_a, tree_b):
        return max(
            float(jnp.abs(a - b).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(tree_a),
                jax.tree_util.tree_leaves(tree_b),
            )
        )

    for mod in frozen:
        assert leaf_delta(state.params[mod], new_state.params[mod]) == 0.0, mod
        if mod in state.batch_stats:
            assert leaf_delta(
                state.batch_stats[mod], new_state.batch_stats[mod]
            ) == 0.0, mod
    # heads must actually train
    moved = leaf_delta(state.params["score_head"], new_state.params["score_head"])
    assert moved > 0.0
