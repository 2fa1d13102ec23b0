import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.models.grouping import cluster_single, segmented_voxelize_single
from tests.oracles import ball_query_oracle, ccl_oracle

import pytest

# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def _cluster_oracle(xyz, shifted, sem, valid, radius, k1, k2, min_pts):
    """Reference dual-set semantics (model.py:228-314): per-set components on

    valid points, concat label spaces, drop proposals with < min_pts points.
    Returns list of (set_id, sorted point indices) proposals ordered by
    (set, component label)."""
    n = len(xyz)
    props = []
    for set_id, (pts, k) in enumerate(((xyz, k1), (shifted, k2))):
        pts_v = pts[valid]
        idx_map = np.nonzero(valid)[0]
        nbr, _ = ball_query_oracle(pts_v, pts_v, sem[valid], sem[valid], radius, k)
        labels = ccl_oracle(nbr)
        for lab in sorted(set(labels)):
            members = idx_map[np.nonzero(labels == lab)[0]]
            if len(members) >= min_pts:
                props.append((set_id, np.sort(members)))
    return props


def test_cluster_single_matches_oracle(rng):
    n = 120
    xyz = rng.rand(n, 3).astype(np.float32) * 2
    offsets = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.1
    sem = rng.randint(0, 3, n).astype(np.int32)
    valid = sem > 0
    radius, k1, k2, min_pts, pmax = 0.3, 8, 16, 3, 32

    prop = cluster_single(
        jnp.asarray(xyz), jnp.asarray(offsets), jnp.asarray(sem),
        jnp.asarray(valid), radius, k1, k2, min_pts, pmax,
    )
    want = _cluster_oracle(xyz, xyz + offsets, sem, valid, radius, k1, k2, min_pts)

    ep = np.asarray(prop.entry_point)
    pid = np.asarray(prop.entry_proposal)
    em = np.asarray(prop.entry_mask)
    nprop = int(prop.num_proposals)
    assert nprop == len(want)

    got = []
    for p in range(nprop):
        members = np.sort(ep[em & (pid == p)])
        got.append(members)
    # proposals are ordered by (set, component); compare as sets of pointsets
    want_sets = [tuple(m.tolist()) for _, m in want]
    got_sets = [tuple(m.tolist()) for m in got]
    assert sorted(want_sets) == sorted(got_sets)
    # and the per-proposal sizes agree
    sizes = np.asarray(prop.proposal_size)[:nprop]
    assert sorted(sizes.tolist()) == sorted(len(m) for _, m in want)


def test_segmented_voxelize_cube_bounds(rng):
    n = 64
    xyz = rng.rand(n, 3).astype(np.float32)
    offsets = np.zeros((n, 3), np.float32)
    sem = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    prop = cluster_single(
        jnp.asarray(xyz), jnp.asarray(offsets), jnp.asarray(sem),
        jnp.asarray(valid), 0.5, 8, 8, 2, 16,
    )
    grid = segmented_voxelize_single(
        jnp.asarray(xyz), prop,
        jnp.asarray([0.3, 0.6, 0.9], jnp.float32),
        jnp.asarray([0.8, 0.1, 0.4], jnp.float32),
        max_proposals=16, score_fullscale=28.0, score_scale=50.0,
    )
    em = np.asarray(prop.entry_mask)
    vid = np.asarray(grid.entry_voxel_id)
    # every valid entry maps to a voxel
    assert (vid[em] >= 0).all()
    assert (vid[~em] == -1).all()
    nv = int(grid.num_voxels)
    assert 0 < nv <= em.sum()
    # voxel coords decompose into (proposal cell, in-cube coord < 28)
    from gapartnet_tpu.ops.voxelize import unpack_key

    coords = np.asarray(unpack_key(jnp.asarray(grid.keys[:nv])))
    in_cube = coords % 32
    assert (in_cube < 28).all()


def test_cluster_respects_capacity(rng):
    # many tiny clusters -> capacity cap kicks in
    n = 60
    xyz = (np.arange(n)[:, None] * np.array([1.0, 0, 0])).astype(np.float32)
    offsets = np.zeros((n, 3), np.float32)
    sem = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    # radius 0.1: every point isolated -> 60 clusters of size 1 per set
    prop = cluster_single(
        jnp.asarray(xyz), jnp.asarray(offsets), jnp.asarray(sem),
        jnp.asarray(valid), 0.1, 4, 4, 1, 16,
    )
    assert int(prop.num_proposals) == 16  # capped
    pid = np.asarray(prop.entry_proposal)
    assert pid.max() < 16
