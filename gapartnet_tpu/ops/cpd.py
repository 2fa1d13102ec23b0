"""Rigid Coherent Point Drift registration (TPU-native).

The reference's two-frame joint-angle estimator runs BOTH a RANSAC-Umeyama
fit and a pycpd ``RigidRegistration`` EM fit between the part clouds
(reference structure/gapartnet.py:861-875; the pycpd import is shipped
commented-out at :12).  This module provides the CPD branch as a jitted
fixed-iteration EM loop: the E-step responsibilities are one (M, N)
pairwise-distance kernel (two matmuls + row softmax-style normalization)
and the M-step is a 3x3 SVD — all MXU-friendly, no data-dependent shapes.

Algorithm: Myronenko & Song, "Point Set Registration: Coherent Point
Drift", TPAMI 2010, rigid case.  Convention matches ops/umeyama.py
(row vectors): the moving cloud ``y`` is aligned to ``x`` via
``T(y) = s * y @ R + t``.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["rigid_cpd"]


def _estep(x, y_t, sigma2, w, n, m):
    """Responsibilities P (M, N): p(m | x_n) under isotropic Gaussians.

    ``y_t`` is the transformed moving cloud.  ``w`` is the uniform-outlier
    weight (reference/pycpd default 0).
    """
    d2 = (
        jnp.sum(x * x, axis=1)[None, :]
        - 2.0 * (y_t @ x.T)
        + jnp.sum(y_t * y_t, axis=1)[:, None]
    )
    # f32 rounding can leave d2 slightly negative at convergence, where
    # sigma2 is at its floor — exp(+eps/sigma2) overflows.  Clamp, then
    # shift each column by its min (softmax-style; exact, the shift
    # multiplies into the outlier constant below).
    d2 = jnp.maximum(d2, 0.0)
    dmin = jnp.min(d2, axis=0, keepdims=True)
    kern = jnp.exp(-(d2 - dmin) / (2.0 * sigma2))
    c = (2.0 * jnp.pi * sigma2) ** 1.5 * (w / jnp.maximum(1.0 - w, 1e-9)) * (m / n)
    c = c * jnp.exp(jnp.minimum(dmin / (2.0 * sigma2), 80.0))
    denom = jnp.sum(kern, axis=0, keepdims=True) + jnp.maximum(c, 1e-30)
    return kern / denom


@partial(jax.jit, static_argnames=("n_iters", "with_scale"))
def rigid_cpd(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_iters: int = 80,
    w: float = 0.0,
    with_scale: bool = True,
):
    """Align ``y`` (M, 3) onto ``x`` (N, 3); returns ``(s, R, t, sigma2)``.

    Fixed-iteration EM (``lax.fori_loop`` keeps the jitted graph static;
    CPD converges geometrically, so 80 iterations is far past convergence
    at the ~500-point sample size the joint-angle path uses).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n, m = x.shape[0], y.shape[0]
    d2_init = (
        jnp.sum(x * x, axis=1)[None, :]
        - 2.0 * (y @ x.T)
        + jnp.sum(y * y, axis=1)[:, None]
    )
    sigma2 = jnp.sum(d2_init) / (3.0 * n * m)

    def body(_, carry):
        s, r, t, sigma2 = carry
        y_t = s * (y @ r) + t
        p = _estep(x, y_t, sigma2, w, n, m)
        np_ = jnp.maximum(jnp.sum(p), 1e-9)
        p1 = jnp.sum(p, axis=1)          # (M,)
        pt1 = jnp.sum(p, axis=0)         # (N,)
        mu_x = (pt1 @ x) / np_
        mu_y = (p1 @ y) / np_
        xh = x - mu_x
        yh = y - mu_y
        a = xh.T @ (p.T @ yh)            # (3, 3) cross-covariance
        u, sv, vt = jnp.linalg.svd(a)
        det = jnp.linalg.det(u @ vt)
        c = jnp.array([1.0, 1.0, 1.0]).at[2].set(det)
        # row-vector convention: y_new = y @ R with R = (U diag(c) Vt)^T
        r_new = (u * c[None, :]) @ vt
        tr_ac = jnp.sum(sv * c)
        yy = jnp.sum(p1 * jnp.sum(yh * yh, axis=1))
        s_new = jnp.where(with_scale, tr_ac / jnp.maximum(yy, 1e-12), 1.0)
        xx = jnp.sum(pt1 * jnp.sum(xh * xh, axis=1))
        sigma2_new = (xx - s_new * tr_ac) / (3.0 * np_)
        sigma2_new = jnp.maximum(sigma2_new, 1e-8)
        t_new = mu_x - s_new * (mu_y @ r_new.T)
        return s_new, r_new.T, t_new, sigma2_new

    init = (jnp.float32(1.0), jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), sigma2)
    s, r, t, sigma2 = jax.lax.fori_loop(0, n_iters, body, init)
    return s, r, t, sigma2
