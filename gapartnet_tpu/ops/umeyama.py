"""Batched Umeyama similarity fitting + RANSAC 9-DoF pose estimation.

TPU-native replacement for the reference's CPU NumPy pose fitting
(gapartnet/misc/pose_fitting.py:4-147): RANSAC (default 100 iterations,
5-point minimal samples) over a similarity transform NPCS -> camera, then a
refit on inliers and an oriented bounding box from inlier NPCS extents.

Design: all RANSAC hypotheses are fit in one vmapped batch of 3x3 SVDs (MXU /
VPU friendly, no host round-trip), residual evaluation is one broadcasted
matmul per hypothesis, and the winner selection reproduces the reference's
early-stop semantics (first iteration whose running-best residual drops below
stop_thrsh wins; see pose_fitting.py:62-79) without data-dependent control
flow.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def umeyama_masked(source, target, mask):
    """Similarity transform source -> target (pose_fitting.py:4-39 semantics).

    source, target: (M, 3); mask: (M,) bool — masked rows ignored.
    Returns (scale, rotation(3,3), translation(3,)); apply as
    target ~= scale * source @ rotation + translation (row-vector convention,
    matching the reference's `source.dot(scale * rotation)` usage).
    """
    w = mask.astype(source.dtype)
    cnt = jnp.maximum(w.sum(), 1.0)
    sc = (source * w[:, None]).sum(0) / cnt
    tc = (target * w[:, None]).sum(0) / cnt
    cs = (source - sc) * w[:, None]
    ct = (target - tc) * w[:, None]
    cov = ct.T @ cs / cnt
    U, D, Vh = jnp.linalg.svd(cov, full_matrices=True)
    neg = (jnp.linalg.det(U) * jnp.linalg.det(Vh)) < 0.0
    D = jnp.where(neg, D.at[-1].multiply(-1.0), D)
    U = jnp.where(neg, U.at[:, -1].multiply(-1.0), U)
    var = ((cs**2) * w[:, None]).sum() / cnt  # sum over axes of masked variance
    scale = jnp.sum(D) / jnp.maximum(var, 1e-12)
    rotation = (U @ Vh).T
    translation = tc - (sc * scale) @ rotation
    return scale, rotation, translation


class PoseFit(NamedTuple):
    bbox: jnp.ndarray         # (8, 3) oriented box corners in camera frame
    scale: jnp.ndarray        # ()
    rotation: jnp.ndarray     # (3, 3)
    translation: jnp.ndarray  # (3,)
    inlier_mask: jnp.ndarray  # (M,) bool
    ok: jnp.ndarray           # () bool — inlier ratio >= 1% (reference gate)


@partial(jax.jit, static_argnames=("max_iters",))
def ransac_pose_from_npcs(
    npcs: jnp.ndarray,
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    max_iters: int = 100,
    stop_thrsh: float = 0.5,
) -> PoseFit:
    """estimate_pose_from_npcs semantics (pose_fitting.py:83-147), one proposal.

    npcs: (M, 3) NPCS coords (already centered, i.e. npcs_pred - 0.5).
    xyz:  (M, 3) camera-frame points.  mask: (M,) validity.
    vmap over proposals for batched fitting.
    """
    m = npcs.shape[0]
    fm = mask.astype(jnp.float32)
    cnt = jnp.maximum(fm.sum(), 1.0)

    # pass threshold heuristic (pose_fitting.py:95-101)
    s_norm = (jnp.linalg.norm(npcs, axis=1) * fm).sum() / cnt
    t_norm = (jnp.linalg.norm(xyz, axis=1) * fm).sum() / cnt
    ratio_st = s_norm / jnp.maximum(t_norm, 1e-12)
    ratio_ts = t_norm / jnp.maximum(s_norm, 1e-12)
    pass_thrsh = jnp.maximum(ratio_st, ratio_ts)

    # minimal-sample hypotheses: sample entry slots uniformly among valid ones
    probs = fm / cnt
    idx = jax.random.choice(key, m, shape=(max_iters, 5), replace=True, p=probs)

    def fit_one(sample_idx):
        s = npcs[sample_idx]
        t = xyz[sample_idx]
        return umeyama_masked(s, t, jnp.ones((5,), bool))

    scales, rots, trans = jax.vmap(fit_one)(idx)  # (I,), (I,3,3), (I,3)

    # residuals of every hypothesis against all valid points
    pred = (
        jnp.einsum("mi,kij->kmj", npcs, rots * scales[:, None, None])
        + trans[:, None, :]
    )
    diff = xyz[None, :, :] - pred                      # (I, M, 3)
    res_vec = jnp.linalg.norm(diff, axis=-1)           # (I, M)
    res_vec = jnp.where(mask[None, :], res_vec, 0.0)
    residual = jnp.linalg.norm(res_vec, axis=-1)       # (I,)
    residual = jnp.where(jnp.isfinite(residual), residual, jnp.inf)

    # winner: first iteration whose residual beats stop_thrsh, else argmin
    below = residual < stop_thrsh
    first_below = jnp.argmax(below)
    winner = jnp.where(jnp.any(below), first_below, jnp.argmin(residual))

    inliers = (res_vec[winner] < pass_thrsh) & mask
    inlier_ratio = inliers.sum() / cnt
    ok = inlier_ratio >= 0.01

    # refit on inliers (pose_fitting.py:108-117)
    scale, rotation, translation = umeyama_masked(npcs, xyz, inliers)

    # oriented bbox from inlier NPCS extents (pose_fitting.py:121-147):
    # back-project all points into NPCS via the fitted transform, take the
    # max |coord| over inliers, build the 8 corners, map to camera frame.
    rot_inv = jnp.linalg.pinv(rotation)
    trans_seg = ((xyz - translation) @ rot_inv) / jnp.maximum(scale, 1e-12)
    ext = jnp.max(
        jnp.where(inliers[:, None], jnp.abs(trans_seg), 0.0), axis=0
    )  # (3,)
    signs = jnp.array(
        [
            [-1, -1, -1],
            [1, -1, -1],
            [-1, 1, -1],
            [-1, -1, 1],
            [1, 1, -1],
            [1, -1, 1],
            [-1, 1, 1],
            [1, 1, 1],
        ],
        jnp.float32,
    )
    bbox_raw = signs * ext[None, :]
    bbox = (bbox_raw * scale) @ rotation + translation

    return PoseFit(
        bbox=bbox,
        scale=scale,
        rotation=rotation,
        translation=translation,
        inlier_mask=inliers,
        ok=ok,
    )
