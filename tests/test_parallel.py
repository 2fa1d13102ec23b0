"""Data-parallel correctness: a batch sharded over 8 virtual devices must

produce the same loss/gradient step as the same batch on one device (XLA
inserts the all-reduce; parallel/mesh.py).  Uses the 8-device CPU mesh from
conftest."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapartnet_tpu.data.synthetic import synthetic_batch
from gapartnet_tpu.models.gapartnet import GAPartNet
from gapartnet_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from gapartnet_tpu.structures import PointCloudBatch
from gapartnet_tpu.train.loop import adam, create_train_state, make_train_step
from tests.test_model_forward import SMALL_CFG


# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_matches_single_device(rng):
    cfg = dataclasses.replace(
        SMALL_CFG, max_points=256, channels=(8, 16),
        level_capacity_divisors=(1, 2),
    )
    model = GAPartNet(cfg)
    d = synthetic_batch(rng, batch_size=8, num_points=256, num_parts=3, max_instances=8)
    ids = d.pop("pc_ids")
    batch = PointCloudBatch(**{k: jnp.asarray(v) for k, v in d.items()}, pc_ids=ids)

    opt = adam(1e-3)
    state = create_train_state(model, batch, opt, seed=0)
    step = make_train_step(
        model, opt, do_cluster=True, do_score=True, do_npcs=True, donate=False
    )
    rng_key = jax.random.PRNGKey(3)

    # single device
    s1, m1 = step(state, batch, rng_key)

    # sharded over the 8-device mesh
    mesh = make_mesh(8)
    state_r = replicate_tree(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s2, m2 = step(state_r, batch_s, rng_key)

    np.testing.assert_allclose(
        float(m1["loss/total_loss"]), float(m2["loss/total_loss"]), rtol=1e-4
    )
    # updated parameters agree (spot-check a few leaves + global norm)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    n1 = float(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in p1))
    n2 = float(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in p2))
    np.testing.assert_allclose(n1, n2, rtol=1e-5)
    for a, b in list(zip(p1, p2))[::7]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )
