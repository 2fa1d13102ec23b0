"""Mechanical proof of the spconv->flax weight-layout conversion.

The reference stores conv weights in spconv2's KRSC layout
``(out, k0, k1, k2, in)`` where kernel spatial dim i aligns with coordinate
column i of the SparseConvTensor indices, and computes cross-correlation —
spconv's own dense-equivalence contract (its test suite asserts equality with
torch dense convs after a channel-only permute, no spatial flip).  The
reference feeds voxel coords in point-axis order (x, y, z): epic_ops voxelize
of pt_xyz (/root/reference/gapartnet/dataset/gapartnet.py:179-205) goes
directly into SparseConvTensor (structure/point_cloud.py:145-162).  So the
ground truth for a SubMConv3d on a FULLY-OCCUPIED grid is a plain dense 3D
cross-correlation over (x, y, z) with that weight.

These tests pin `ckpt_convert._conv_kernel` against that oracle through the
real conv ops (`subm_conv_apply`, `downsample_conv_apply`,
`inverse_conv_apply`) and prove the test discriminates: the "xyz" order
matches exactly, the "zyx" order does NOT.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops.sparse_conv import (
    build_downsample,
    build_subm_rulebook,
    downsample_conv_apply,
    inverse_conv_apply,
    subm_conv_apply,
)
from gapartnet_tpu.ops.voxelize import pack_coords
from gapartnet_tpu.train.ckpt_convert import _conv_kernel


def _dense_grid_keys(n):
    """Sorted packed keys of a fully-occupied n^3 grid + the coord list."""
    coords = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    keys = np.asarray(pack_coords(jnp.asarray(coords, jnp.int32)))
    order = np.argsort(keys)
    return jnp.asarray(keys[order]), coords[order]


def _subm_ours(w_spconv, grid, spatial_order):
    """Converted weights through the real submanifold conv on a dense grid."""
    n = grid.shape[0]
    keys, coords = _dense_grid_keys(n)
    feats = grid.reshape(-1, grid.shape[-1])[
        np.ravel_multi_index((coords[:, 0], coords[:, 1], coords[:, 2]), (n, n, n))
    ]
    nbr = build_subm_rulebook(keys, 3)
    w = jnp.asarray(_conv_kernel(w_spconv, spatial_order), jnp.float32)
    out = subm_conv_apply(jnp.asarray(feats, jnp.float32)[None], nbr[None], w)[0]
    dense = np.zeros((n, n, n, w_spconv.shape[0]), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = np.asarray(out)
    return dense


def _conv3d_oracle(grid, w_spconv, stride=1, padding=1):
    """out[x,y,z,o] = sum_{a,b,c,i} W[o,a,b,c,i] * in[x*s+a-p, y*s+b-p, z*s+c-p, i]."""
    rhs = jnp.asarray(np.transpose(w_spconv, (1, 2, 3, 4, 0)), jnp.float32)
    return np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(grid, jnp.float32)[None],
            rhs,
            window_strides=(stride,) * 3,
            padding=[(padding, padding)] * 3,
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )[0]
    )


def test_subm_layout_xyz_matches_dense_conv(rng):
    n, cin, cout = 5, 3, 4
    grid = rng.randn(n, n, n, cin).astype(np.float32)
    w_spconv = rng.randn(cout, 3, 3, 3, cin).astype(np.float32)

    oracle = _conv3d_oracle(grid, w_spconv)
    ours = _subm_ours(w_spconv, grid, "xyz")
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_subm_layout_zyx_discriminated(rng):
    """The oracle must reject the wrong order (the test is not vacuous)."""
    n, cin, cout = 5, 3, 4
    grid = rng.randn(n, n, n, cin).astype(np.float32)
    w_spconv = rng.randn(cout, 3, 3, 3, cin).astype(np.float32)

    oracle = _conv3d_oracle(grid, w_spconv)
    wrong = _subm_ours(w_spconv, grid, "zyx")
    assert np.abs(wrong - oracle).max() > 1e-2


def test_strided_layout_matches_dense_conv(rng):
    """SparseConv3d(k=2, s=2, pad=0) on a dense even grid == strided conv."""
    n, cin, cout = 4, 3, 5
    grid = rng.randn(n, n, n, cin).astype(np.float32)
    w_spconv = rng.randn(cout, 2, 2, 2, cin).astype(np.float32)

    keys, coords = _dense_grid_keys(n)
    feats = grid[coords[:, 0], coords[:, 1], coords[:, 2]]
    cap = (n // 2) ** 3
    ds = build_downsample(keys, cap)
    w = jnp.asarray(_conv_kernel(w_spconv, "xyz"), jnp.float32)
    out = downsample_conv_apply(
        jnp.asarray(feats, jnp.float32)[None],
        jax.tree_util.tree_map(lambda x: x[None], ds),
        w,
        cap,
    )[0]
    from gapartnet_tpu.ops.voxelize import unpack_key

    out_coords = np.asarray(unpack_key(ds.out_keys))
    dense = np.zeros((n // 2, n // 2, n // 2, cout), np.float32)
    nv = int(np.asarray(ds.out_num_voxels))
    dense[out_coords[:nv, 0], out_coords[:nv, 1], out_coords[:nv, 2]] = np.asarray(
        out
    )[:nv]

    oracle = _conv3d_oracle(grid, w_spconv, stride=2, padding=0)
    np.testing.assert_allclose(dense, oracle, rtol=1e-4, atol=1e-4)


def test_inverse_layout_matches_conv_transpose(rng):
    """SparseInverseConv3d reuses the strided pairs as their adjoint: for the
    forward pair (tap k: child 2p+k -> parent p), the inverse layer computes
    out[2p+k] = W[k] @ in[p] — exactly ConvTranspose3d(k=2, s=2, pad=0) with
    weight (out, k0, k1, k2, in), tap = child corner, unflipped."""
    n, cc, cf = 4, 4, 3  # coarse grid n/2, coarse channels cc, fine channels cf
    grid = rng.randn(n, n, n, 1).astype(np.float32)  # fine sites (all occupied)
    coarse = rng.randn(n // 2, n // 2, n // 2, cc).astype(np.float32)
    w_spconv = rng.randn(cf, 2, 2, 2, cc).astype(np.float32)

    keys, coords = _dense_grid_keys(n)
    cap = (n // 2) ** 3
    ds = build_downsample(keys, cap)
    from gapartnet_tpu.ops.voxelize import unpack_key

    out_coords = np.asarray(unpack_key(ds.out_keys))
    nv = int(np.asarray(ds.out_num_voxels))
    coarse_feats = coarse[out_coords[:nv, 0], out_coords[:nv, 1], out_coords[:nv, 2]]

    w = jnp.asarray(_conv_kernel(w_spconv, "xyz"), jnp.float32)
    out = inverse_conv_apply(
        jnp.asarray(coarse_feats, jnp.float32)[None],
        jax.tree_util.tree_map(lambda x: x[None], ds),
        w,
    )[0]
    dense = np.zeros((n, n, n, cf), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = np.asarray(out)

    # numpy ConvTranspose oracle: out[2p+k] += W[:, k, :] @ in[p]
    oracle = np.zeros((n, n, n, cf), np.float32)
    for a in range(2):
        for b in range(2):
            for c in range(2):
                oracle[a::2, b::2, c::2] = np.einsum(
                    "xyzi,oi->xyzo", coarse, w_spconv[:, a, b, c, :]
                )
    np.testing.assert_allclose(dense, oracle, rtol=1e-4, atol=1e-4)
