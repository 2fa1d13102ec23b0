import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops.umeyama import umeyama_masked, ransac_pose_from_npcs
from tests.oracles import umeyama_oracle


def _random_similarity(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    scale = 0.5 + rng.rand() * 2
    t = rng.randn(3) * 0.3
    return scale, q, t


def test_umeyama_matches_oracle(rng):
    src = rng.rand(50, 3).astype(np.float64)
    scale, q, t = _random_similarity(rng)
    tgt = scale * src @ q + t
    s_np, r_np, t_np = umeyama_oracle(src, tgt)
    s_j, r_j, t_j = umeyama_masked(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(tgt, jnp.float32),
        jnp.ones(50, bool),
    )
    np.testing.assert_allclose(float(s_j), s_np, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_j), r_np, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_j), t_np, atol=1e-3)
    # recovers the ground-truth transform
    np.testing.assert_allclose(float(s_j), scale, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_j), q, atol=1e-3)


def test_umeyama_masked_ignores_outliers(rng):
    src = rng.rand(64, 3)
    scale, q, t = _random_similarity(rng)
    tgt = scale * src @ q + t
    tgt[50:] += 100.0  # corrupt masked-out rows
    mask = np.arange(64) < 50
    s_j, r_j, t_j = umeyama_masked(
        jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(s_j), scale, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_j), q, atol=1e-3)


def test_ransac_pose_recovers_transform(rng):
    m = 200
    npcs = (rng.rand(m, 3) - 0.5).astype(np.float32)
    scale, q, t = _random_similarity(rng)
    xyz = (scale * npcs @ q + t).astype(np.float32)
    # 10% outliers
    xyz[:20] += rng.randn(20, 3).astype(np.float32) * 5
    fit = ransac_pose_from_npcs(
        jnp.asarray(npcs), jnp.asarray(xyz), jnp.ones(m, bool),
        jax.random.PRNGKey(0), max_iters=100,
    )
    assert bool(fit.ok)
    np.testing.assert_allclose(float(fit.scale), scale, rtol=0.05)
    # bbox corners should be finite and centered near translation
    bbox = np.asarray(fit.bbox)
    assert np.isfinite(bbox).all()
    np.testing.assert_allclose(bbox.mean(0), t, atol=0.2)
