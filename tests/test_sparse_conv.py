import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops.sparse_conv import (
    build_subm_rulebook,
    build_downsample,
    build_hierarchy,
    subm_conv_apply,
    downsample_conv_apply,
    inverse_conv_apply,
    kernel_offsets,
)
from gapartnet_tpu.ops.voxelize import KEY_SENTINEL, pack_coords


def _make_grid(rng, num_active, capacity, grid=8):
    """Random sparse grid: sorted keys + features, capacity-padded."""
    all_coords = np.stack(
        np.meshgrid(*[np.arange(grid)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    sel = rng.choice(len(all_coords), size=num_active, replace=False)
    coords = all_coords[np.sort(sel)]
    keys = (coords[:, 0] << 20) | (coords[:, 1] << 10) | coords[:, 2]
    keys = np.sort(keys)
    pad = np.full(capacity - num_active, KEY_SENTINEL, np.int64)
    keys_padded = np.concatenate([keys, pad]).astype(np.int32)
    return keys_padded, coords


def _coords_of(keys):
    return np.stack([keys >> 20, (keys >> 10) & 1023, keys & 1023], -1)


def subm_oracle(coords, feats, weights):
    """Dense submanifold conv oracle: out sites == in sites."""
    table = {tuple(c): f for c, f in zip(coords, feats)}
    offs = kernel_offsets(3)
    out = np.zeros((len(coords), weights.shape[-1]), np.float64)
    for i, c in enumerate(coords):
        for k, off in enumerate(offs):
            nb = (c[0] + off[0], c[1] + off[1], c[2] + off[2])
            if nb in table:
                out[i] += table[nb] @ weights[k]
    return out


def test_subm_rulebook_and_conv(rng):
    cap, na = 64, 40
    keys, coords = _make_grid(rng, na, cap)
    cin, cout = 5, 7
    feats = np.zeros((cap, cin), np.float32)
    feats[:na] = rng.rand(na, cin)
    w = rng.rand(27, cin, cout).astype(np.float32) - 0.5

    nbr = build_subm_rulebook(jnp.asarray(keys), 3)
    out = subm_conv_apply(
        jnp.asarray(feats)[None], jnp.asarray(nbr)[None], jnp.asarray(w)
    )[0]
    want = subm_oracle(coords, feats[:na], w)
    np.testing.assert_allclose(np.asarray(out)[:na], want, rtol=1e-4, atol=1e-5)
    # padded outputs only see zero-gathered inputs
    assert np.allclose(np.asarray(out)[na:], np.asarray(out)[na:])


def test_downsample_geometry(rng):
    cap, na = 64, 40
    keys, coords = _make_grid(rng, na, cap)
    ds = build_downsample(jnp.asarray(keys), 32)
    parents = {tuple(c // 2) for c in coords}
    assert int(ds.out_num_voxels) == len(parents)
    assert int(ds.num_dropped) == 0
    out_coords = _coords_of(np.asarray(ds.out_keys)[: len(parents)])
    assert {tuple(c) for c in out_coords} == parents
    # every child maps to the right parent
    cp = np.asarray(ds.child_parent)
    pos = np.asarray(ds.child_pos)
    key_coords = _coords_of(keys[:na])
    for i in range(na):
        p = cp[i]
        assert p >= 0
        np.testing.assert_array_equal(out_coords[p], key_coords[i] // 2)
        want_pos = (
            ((key_coords[i][0] & 1) << 2)
            | ((key_coords[i][1] & 1) << 1)
            | (key_coords[i][2] & 1)
        )
        assert pos[i] == want_pos


def test_downsample_and_inverse_conv(rng):
    cap, na, out_cap = 64, 40, 32
    keys, coords = _make_grid(rng, na, cap)
    cin, cout = 4, 6
    feats = np.zeros((cap, cin), np.float32)
    feats[:na] = rng.rand(na, cin)
    w = rng.rand(8, cin, cout).astype(np.float32) - 0.5

    ds = build_downsample(jnp.asarray(keys), out_cap)
    ds_b = jax.tree.map(lambda x: x[None], ds)
    out = downsample_conv_apply(jnp.asarray(feats)[None], ds_b, jnp.asarray(w), out_cap)[0]

    # oracle
    nv = int(ds.out_num_voxels)
    out_coords = _coords_of(np.asarray(ds.out_keys)[:nv])
    table = {tuple(c): f for c, f in zip(coords, feats[:na])}
    offs = kernel_offsets(2)
    want = np.zeros((nv, cout), np.float64)
    for i, pc in enumerate(out_coords):
        for k, off in enumerate(offs):
            child = (2 * pc[0] + off[0], 2 * pc[1] + off[1], 2 * pc[2] + off[2])
            if child in table:
                want[i] += table[child] @ w[k]
    np.testing.assert_allclose(np.asarray(out)[:nv], want, rtol=1e-4, atol=1e-5)

    # inverse conv: out[child] = coarse[parent] @ w2[pos(child)]
    w2 = rng.rand(8, cout, cin).astype(np.float32) - 0.5
    coarse = np.zeros((out_cap, cout), np.float32)
    coarse[:nv] = rng.rand(nv, cout)
    up = inverse_conv_apply(jnp.asarray(coarse)[None], ds_b, jnp.asarray(w2))[0]
    ptable = {tuple(c): coarse[i] for i, c in enumerate(out_coords)}
    for i, c in enumerate(coords):
        pos = ((c[0] & 1) << 2) | ((c[1] & 1) << 1) | (c[2] & 1)
        wantrow = ptable[tuple(c // 2)] @ w2[pos]
        np.testing.assert_allclose(np.asarray(up)[i], wantrow, rtol=1e-4, atol=1e-5)


def test_downsample_capacity_overflow(rng):
    cap, na = 64, 40
    keys, coords = _make_grid(rng, na, cap)
    parents = {tuple(c // 2) for c in coords}
    small = max(1, len(parents) - 3)
    ds = build_downsample(jnp.asarray(keys), small)
    assert int(ds.num_dropped) == len(parents) - small
    assert int(ds.out_num_voxels) == small
    # children of dropped parents are marked invalid
    cp = np.asarray(ds.child_parent)[:na]
    assert (cp >= -1).all() and (cp < small).all()


def test_build_hierarchy_shapes(rng):
    cap = 64
    keys1, _ = _make_grid(rng, 40, cap)
    keys2, _ = _make_grid(rng, 30, cap)
    keys = jnp.asarray(np.stack([keys1, keys2]))
    nv = jnp.asarray([40, 30], jnp.int32)
    h = build_hierarchy(keys, nv, capacities=[64, 32, 16])
    assert len(h.levels) == 3
    assert len(h.downsamples) == 2
    assert h.levels[0].subm_nbr.shape == (2, 27, 64)
    assert h.levels[1].keys.shape == (2, 32)
    assert h.levels[2].keys.shape == (2, 16)
    # num voxels decrease monotonically
    nv0 = np.asarray(h.levels[0].num_voxels)
    nv1 = np.asarray(h.levels[1].num_voxels)
    nv2 = np.asarray(h.levels[2].num_voxels)
    assert (nv1 <= nv0).all() and (nv2 <= nv1).all() and (nv2 > 0).all()


def test_downsample_sortfree_matches_sort_oracle(rng):
    """Sort-oracle parity for build_downsample, including capacity overflow.

    Regression guard for the lex-order pitfall: per-axis >>1 does NOT
    preserve x-major key order (children (0,0,7) < (0,1,4) halve to parents
    (0,0,3) > (0,0,2)), so the dedup argsort cannot be elided.  This test
    caught exactly that attempted 'optimization'."""
    for na, cap, out_cap, grid in ((40, 64, 32, 8), (200, 256, 16, 16),
                                   (500, 512, 64, 32)):
        keys, coords = _make_grid(rng, na, cap, grid=grid)
        ds = build_downsample(jnp.asarray(keys), out_cap)

        pk = np.where(keys[:na] != KEY_SENTINEL,
                      (coords[:, 0] >> 1) << 20 | (coords[:, 1] >> 1) << 10
                      | (coords[:, 2] >> 1), KEY_SENTINEL)
        uniq = np.unique(pk)
        kept = uniq[:out_cap]
        assert int(ds.out_num_voxels) == min(len(uniq), out_cap)
        assert int(ds.num_dropped) == max(0, len(uniq) - out_cap)
        got_keys = np.asarray(ds.out_keys)
        np.testing.assert_array_equal(got_keys[: len(kept)], kept)
        assert np.all(got_keys[len(kept):] == KEY_SENTINEL)
        # child -> parent rank agrees with searchsorted into the kept keys
        cp = np.asarray(ds.child_parent)[:na]
        want = np.searchsorted(kept, pk)
        in_kept = (want < len(kept)) & (kept[np.minimum(want, len(kept) - 1)] == pk)
        np.testing.assert_array_equal(cp, np.where(in_kept, want, -1))
