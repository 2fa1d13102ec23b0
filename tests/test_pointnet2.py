import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops import pointnet2 as p2


def test_gather_and_group(rng):
    pts = rng.rand(2, 50, 3).astype(np.float32)
    idx = rng.randint(0, 50, (2, 10)).astype(np.int32)
    g = np.asarray(p2.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(g[b], pts[b][idx[b]])


def test_knn_and_three_nn(rng):
    pts = rng.rand(100, 3).astype(np.float32)
    q = rng.rand(20, 3).astype(np.float32)
    d, i = p2.knn(jnp.asarray(q), jnp.asarray(pts), 4)
    d, i = np.asarray(d), np.asarray(i)
    full = np.linalg.norm(q[:, None] - pts[None], axis=-1)
    want_i = np.argsort(full, axis=1)[:, :4]
    np.testing.assert_allclose(np.sort(d, axis=1), np.sort(full[np.arange(20)[:, None], want_i], axis=1), rtol=1e-4)
    # sets of neighbors agree
    for r in range(20):
        assert set(i[r]) == set(want_i[r])


def test_three_interpolate(rng):
    feats = rng.rand(30, 8).astype(np.float32)
    idx = rng.randint(0, 30, (10, 3)).astype(np.int32)
    w = rng.rand(10, 3).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    got = np.asarray(
        p2.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
    )
    want = (feats[idx] * w[..., None]).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ball_query_simple_first_hit_padding(rng):
    pts = np.array([[0, 0, 0], [0.01, 0, 0], [5, 5, 5]], np.float32)
    q = np.array([[0, 0, 0]], np.float32)
    idx = np.asarray(p2.ball_query_simple(jnp.asarray(q), jnp.asarray(pts), 0.1, 4))
    # neighbors 0,1; padding repeats first hit (0)
    np.testing.assert_array_equal(idx[0], [0, 1, 0, 0])


def test_sa_and_fp_modules(rng):
    from gapartnet_tpu.models.pointnet2_modules import (
        FeaturePropagation,
        SetAbstraction,
    )

    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
    sa = SetAbstraction(npoint=16, radius=0.3, nsample=8, mlp=(16, 32))
    v = sa.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, new_feats = sa.apply(v, xyz, feats, train=False)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 32)

    fp = FeaturePropagation(mlp=(24,))
    v2 = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, new_feats, train=False)
    up = fp.apply(v2, xyz, new_xyz, feats, new_feats, train=False)
    assert up.shape == (2, 64, 24)
    assert np.isfinite(np.asarray(up)).all()
