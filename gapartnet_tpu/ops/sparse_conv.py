"""Rulebook sparse 3D convolution: sorted gather-GEMM-scatter.

TPU-native replacement for spconv (SubMConv3d / SparseConv3d / SparseInverseConv3d,
used by the reference backbone /root/reference/gapartnet/network/backbone.py:19-108
and model heads model.py:113-122).

Design
------
A sparse grid is a per-sample sorted array of packed int32 voxel keys
(ops/voxelize.pack_coords) with KEY_SENTINEL padding and a feature matrix.
All geometry ("rulebooks") is computed once per grid with sorts and
searchsorted lookups; every convolution is then a dense gather + one large
matmul that maps straight onto the MXU:

  * submanifold conv (k=3, output sites == input sites): neighbor table
    nbr (27, V) via searchsorted of neighbor keys; conv is
    (V, 27*Cin) @ (27*Cin, Cout) with zeros gathered for missing neighbors.
    Rulebooks are shared by every submanifold conv on the same grid, mirroring
    spconv's `indice_key="subm{i}"` reuse (backbone.py:26-37,66-70).
  * strided conv (k=2, s=2): each input voxel has exactly one output parent
    (coord >> 1) and one kernel position (coord & 1); conv is 8 matmuls
    + segment-sum scatter into parents.
  * inverse conv (k=2): exact transpose of the stored strided pairs, mirroring
    spconv's `indice_key="spconv{i}"` reuse (backbone.py:73-93): gather parent
    features, apply the per-position weight.

Everything is fixed-shape; downsampled grids get a static voxel capacity and
overflow drops the highest keys (tracked in `num_dropped` for debugging).
"""

from functools import partial
from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp

from gapartnet_tpu.ops.voxelize import (
    COORD_BITS,
    COORD_MAX,
    KEY_SENTINEL,
    pack_coords,
    unpack_key,
)


# ---------------------------------------------------------------------------
# rulebook construction (per sample; vmap over batch)
# ---------------------------------------------------------------------------

def _window_gather(arr, starts, window: int):
    """Gather `window` consecutive rows of arr at each start index.

    arr (R, ...) + starts (...) -> (*starts.shape, window, *arr.shape[1:]).
    One native gather-of-slices: vmap batches it via gather batching dims,
    which the TPU backend lowers directly.  (An earlier vmap(vmap(
    dynamic_slice)) formulation materialized a padded s32[B, starts, 4]
    index tensor at batch — 17 GB at B8 — and OOMed HBM.)
    Starts must already be clipped to [0, R - window].
    """
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=tuple(range(starts.ndim, starts.ndim + arr.ndim)),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    return jax.lax.gather(
        arr, starts[..., None], dn,
        slice_sizes=(window,) + arr.shape[1:],
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )

def kernel_offsets(kernel_size: int) -> List[tuple]:
    """Kernel offset enumeration, x-major (dx slowest, dz fastest), matching

    the coordinate packing order.  For k=3 the range is [-1, 0, 1]; for k=2
    (stride 2) it is [0, 1] relative to parent*2.
    """
    if kernel_size == 3:
        r = (-1, 0, 1)
    elif kernel_size == 2:
        r = (0, 1)
    else:
        raise NotImplementedError(kernel_size)
    return [(dx, dy, dz) for dx in r for dy in r for dz in r]


@partial(jax.jit, static_argnames=("kernel_size", "extent"))
def build_subm_rulebook(
    keys: jnp.ndarray, kernel_size: int = 3, extent=None
) -> jnp.ndarray:
    """Neighbor table for submanifold conv.

    keys: (V,) sorted packed keys, KEY_SENTINEL padded.
    Returns nbr: (K, V) int32 index of each voxel's neighbor at each kernel
    offset, or -1 when absent.  The center offset maps to the voxel itself.

    extent: optional static (ex, ey, ez) coordinate bound.  When given, the
    lookup uses a dense int16 coordinate table (one scatter + 27 direct
    gathers) instead of a sort-based searchsorted — much faster on TPU, at
    ex*ey*ez*2 bytes of memory.  Voxels outside the extent fall back to
    "no neighbor" (only reachable under extreme augmentation).
    """
    v = keys.shape[0]
    coords = unpack_key(keys)  # (V, 3); sentinel unpacks to garbage, masked below
    valid = keys != KEY_SENTINEL
    offs = jnp.asarray(kernel_offsets(kernel_size), jnp.int32)  # (K, 3)

    tgt = coords[None, :, :] + offs[:, None, :]                  # (K, V, 3)
    in_bounds = jnp.all((tgt >= 0) & (tgt < COORD_MAX), axis=-1) & valid[None, :]

    if extent is not None:
        ex, ey, ez = extent
        assert v < (1 << 15), "int16 rank table requires V < 32768"
        src_in = valid & jnp.all(coords < jnp.asarray(extent), axis=-1)
        lin = (coords[:, 0] * ey + coords[:, 1]) * ez + coords[:, 2]
        # the table is built PRE-PADDED (one front + two back sentinel slots,
        # entry i at tpad[i+1]) so the z-window probe below needs no
        # concatenate — a concat would copy the whole ex*ey*ez*2-byte table
        # (~48 MB at 288^3) through HBM every call
        tsize = ex * ey * ez
        tpad = jnp.full((tsize + 3,), -1, jnp.int16).at[
            jnp.where(src_in, lin + 1, tsize + 3)
        ].set(jnp.arange(v, dtype=jnp.int16), mode="drop")
        tin = in_bounds & jnp.all(tgt < jnp.asarray(extent), axis=-1)
        if kernel_size == 3:
            # z-window probe: the table is z-contiguous, so the three
            # (dz=-1,0,1) taps of each (dx,dy) column are one 3-slice — 9
            # slice-gathers instead of 27 element gathers (gathers are
            # row-rate-bound on TPU, so 3x fewer rows ~= 3x faster)
            tgt9 = tgt.reshape(9, 3, v, 3)[:, 0]      # (9, V, 3) at dz = -1
            base = (
                (tgt9[..., 0] * ey + tgt9[..., 1]) * ez + tgt9[..., 2]
            )  # lin of the dz=-1 cell; may be -1 at column start
            win = _window_gather(
                tpad, jnp.clip(base, -1, tsize - 1) + 1, 3
            )  # (9, V, 3)
            idx = win.transpose(0, 2, 1).reshape(27, v).astype(jnp.int32)
        else:
            tlin = (tgt[..., 0] * ey + tgt[..., 1]) * ez + tgt[..., 2]
            idx = tpad[jnp.where(tin, tlin, 0) + 1].astype(jnp.int32)
        return jnp.where(tin & (idx >= 0), idx, -1)

    tgt_key = jnp.where(in_bounds, pack_coords(tgt), KEY_SENTINEL - 1)
    # one batched lookup over all K*V targets; method="sort" lowers to one
    # fused sort instead of log2(V) serial gather rounds
    idx = jnp.clip(
        jnp.searchsorted(keys, tgt_key.reshape(-1), method="sort").astype(jnp.int32),
        0, v - 1,
    ).reshape(tgt_key.shape)
    found = (keys[idx] == tgt_key) & in_bounds
    return jnp.where(found, idx, -1)


class DownsampleMap(NamedTuple):
    """Geometry of one stride-2 downsample (spconv indice_key='spconv{i}')."""

    out_keys: jnp.ndarray        # (V_out,) sorted packed keys of the coarse grid
    out_num_voxels: jnp.ndarray  # () int32
    child_parent: jnp.ndarray    # (V_in,) index into coarse grid, -1 invalid
    child_pos: jnp.ndarray       # (V_in,) kernel position in [0, 8)
    num_dropped: jnp.ndarray     # () int32 voxels lost to capacity overflow


@partial(jax.jit, static_argnames=("out_capacity",))
def build_downsample(keys: jnp.ndarray, out_capacity: int) -> DownsampleMap:
    """Stride-2 kernel-2 downsample geometry for one sample.

    The argsort below is REQUIRED even though `keys` arrive sorted: per-axis
    `>> 1` is monotone componentwise but does NOT preserve lexicographic
    order under x-major packing — children (0,0,7) < (0,1,4) halve to parents
    (0,0,3) > (0,0,2).  Morton (bit-interleaved) keys would make the parent
    map `key >> 3` (monotone, sort-free), but Morton breaks the z-window
    slice-gather in `_gather_taps_windowed`, which relies on the three
    (dz=-1,0,1) neighbor KEYS being numerically consecutive so the existing
    ones occupy consecutive ranks — a far bigger win than these six sorts
    (gathers are row-rate-bound; see PERF.md).  Tested against a sort oracle
    in test_sparse_conv.test_downsample_sortfree_matches_sort_oracle.
    """
    valid = keys != KEY_SENTINEL
    coords = unpack_key(keys)
    parent_coords = coords >> 1
    # kernel position: which corner of the 2x2x2 cell the child occupies
    pos = ((coords[:, 0] & 1) << 2) | ((coords[:, 1] & 1) << 1) | (coords[:, 2] & 1)
    parent_key = jnp.where(valid, pack_coords(parent_coords), KEY_SENTINEL)

    order = jnp.argsort(parent_key)
    sorted_pk = parent_key[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_pk[1:] != sorted_pk[:-1]]
    ) & (sorted_pk != KEY_SENTINEL)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = first.sum().astype(jnp.int32)
    num_out = jnp.minimum(num_unique, out_capacity)
    num_dropped = num_unique - num_out

    out_keys = jnp.full((out_capacity,), KEY_SENTINEL, jnp.int32).at[
        jnp.where(first & (rank < out_capacity), rank, out_capacity)
    ].set(sorted_pk, mode="drop")

    # child -> parent rank (ascending-key rank == index into out_keys)
    parent_rank_sorted = jnp.where(
        (sorted_pk != KEY_SENTINEL) & (rank < out_capacity), rank, -1
    )
    child_parent = jnp.zeros_like(keys).at[order].set(parent_rank_sorted)

    return DownsampleMap(
        out_keys=out_keys,
        out_num_voxels=num_out,
        child_parent=child_parent,
        child_pos=pos.astype(jnp.int32),
        num_dropped=num_dropped,
    )


# ---------------------------------------------------------------------------
# convolution application (batched: leading B dimension everywhere)
# ---------------------------------------------------------------------------

def _gather_taps_windowed(feats, nbr_s):
    """(V, Cin) + (27, V) -> (V, 27*Cin) via 9 slice-gathers of 3 ranks.

    Voxel keys sort z-fastest, so the existing neighbors of a voxel within
    one (dx,dy) column at dz in {-1,0,1} occupy CONSECUTIVE ranks; each
    column is one 3-row slice-gather starting at the smallest existing
    neighbor rank, and each tap selects its slot (its rank minus the window
    start).  3x fewer gather rows than per-tap element gathers — gathers are
    row-rate-bound on TPU.
    """
    v, cin = feats.shape
    trip = nbr_s.reshape(9, 3, v)                        # taps g-major, dz fast
    valid = trip >= 0
    r0 = jnp.min(jnp.where(valid, trip, jnp.int32(v)), axis=1)   # (9, V)
    r0c = jnp.where(r0 < v, r0, 0)
    fp = jnp.concatenate([feats, jnp.zeros((2, cin), feats.dtype)], axis=0)
    win = _window_gather(fp, r0c, 3)                     # (9, V, 3, Cin)
    slot = jnp.clip(trip - r0[:, None, :], 0, 2)         # (9, 3, V)
    taps = []
    for j in range(3):
        sj = slot[:, j, :][..., None]                    # (9, V, 1)
        pick = jnp.where(
            sj == 0, win[:, :, 0, :],
            jnp.where(sj == 1, win[:, :, 1, :], win[:, :, 2, :]),
        )
        taps.append(
            jnp.where(valid[:, j, :][..., None], pick, jnp.zeros((), feats.dtype))
        )
    g = jnp.stack(taps, axis=1)                          # (9, 3, V, Cin)
    return g.transpose(2, 0, 1, 3).reshape(v, 27 * cin)


def _subm_conv_forward(features, nbr, weights):
    """Fused window gather, then a single (V, K*Cin) matmul on the MXU.

    (Per-tap gathers with sorted hints were measured slower at batch; the
    windowed slice-gather is the fast path for k=3.)"""
    k, cin, cout = weights.shape

    if k == 27:
        gathered = jax.vmap(_gather_taps_windowed)(features, nbr)
    else:
        def one(feats, nbr_s):
            g = feats[nbr_s.clip(0)]                   # (K, V, Cin)
            g = jnp.where((nbr_s >= 0)[..., None], g, jnp.zeros((), g.dtype))
            return jnp.transpose(g, (1, 0, 2)).reshape(-1, k * cin)

        gathered = jax.vmap(one)(features, nbr)        # (B, V, K*Cin)
    w = weights.reshape(k * cin, cout)
    return jax.lax.dot_general(
        gathered, w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.custom_vjp
def _subm_conv(features, nbr, weights):
    return _subm_conv_forward(features, nbr, weights)


def _subm_conv_fwd(features, nbr, weights):
    # save ONLY the inputs: the (B, V, K*Cin) gathered tensor (~0.5 GB per
    # conv at training shapes) is recomputed in backward instead of stored —
    # without this a batch-16 training step overflows HBM
    return _subm_conv_forward(features, nbr, weights), (features, nbr, weights)


def _subm_conv_bwd(res, g):
    features, nbr, weights = res
    k, cin, cout = weights.shape
    g = g.astype(features.dtype)
    # d_feats[j] = sum_m g[nbr_m(j)] @ W[26-m]^T: the pair (i reads j at
    # offset o) transposes to (j reads i at -o), and reversing the x-major
    # tap enumeration negates offsets — so backward is the same conv with
    # tap-reversed transposed weights (no scatter needed)
    w_rev_t = jnp.flip(weights, axis=0).transpose(0, 2, 1)
    d_feats = _subm_conv_forward(g, nbr, w_rev_t).astype(features.dtype)

    # dW = gathered^T @ g with the forward's (B, V, K*Cin) gather recomputed
    # ONCE via the windowed slice-gather (k=27), then one MXU contraction over
    # (B, V); the transient is freed right after the matmul.  (A fused
    # ELEMENT-gather variant was tried and reverted in round 1 — the windowed
    # gather is what makes the single regather cheaper than 27 per-tap
    # gathers.)
    if k == 27:
        gathered = jax.vmap(_gather_taps_windowed)(features, nbr)
    else:
        def regather(f, n):
            gk = f[n.clip(0)]
            gk = jnp.where((n >= 0)[..., None], gk, jnp.zeros((), gk.dtype))
            return jnp.transpose(gk, (1, 0, 2)).reshape(-1, k * cin)

        gathered = jax.vmap(regather)(features, nbr)       # (B, V, K*Cin)
    d_w = jax.lax.dot_general(
        gathered, g,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),    # contract B and V
        preferred_element_type=jnp.float32,
    ).reshape(k, cin, cout).astype(weights.dtype)
    return d_feats, None, d_w


_subm_conv.defvjp(_subm_conv_fwd, _subm_conv_bwd)


@jax.custom_vjp
def _subm_conv_sg(features, nbr, weights):
    return _subm_conv_forward(features, nbr, weights)


def _subm_conv_sg_fwd(features, nbr, weights):
    # save-gather variant: keep the forward's (B, V, 27*Cin) windowed gather
    # as the residual so dW needs NO regather in backward (d_feats still costs
    # one conv on g, which is unavoidable).  Trades ~27x the activation HBM of
    # the regather VJP for one fewer V-row gather per conv per backward —
    # worth it only while the batch fits; opt-in via GAPARTNET_SUBM_SAVE_GATHER.
    k, cin, cout = weights.shape
    gathered = jax.vmap(_gather_taps_windowed)(features, nbr)  # k == 27 only
    out = jax.lax.dot_general(
        gathered, weights.reshape(k * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out, (gathered, nbr, weights)


def _subm_conv_sg_bwd(res, g):
    gathered, nbr, weights = res
    k, cin, cout = weights.shape
    g = g.astype(gathered.dtype)
    w_rev_t = jnp.flip(weights, axis=0).transpose(0, 2, 1)
    d_feats = _subm_conv_forward(g, nbr, w_rev_t).astype(gathered.dtype)
    d_w = jax.lax.dot_general(
        gathered, g,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),    # contract B and V
        preferred_element_type=jnp.float32,
    ).reshape(k, cin, cout).astype(weights.dtype)
    return d_feats, None, d_w


_subm_conv_sg.defvjp(_subm_conv_sg_fwd, _subm_conv_sg_bwd)


def _save_gather_enabled() -> bool:
    """Opt-in A/B switch for the save-gather VJP (read at trace time)."""
    import os

    return os.environ.get("GAPARTNET_SUBM_SAVE_GATHER", "0") not in ("", "0")


def subm_conv_apply(
    features: jnp.ndarray,  # (B, V, Cin)
    nbr: jnp.ndarray,       # (B, K, V)
    weights: jnp.ndarray,   # (K, Cin, Cout)
    compute_dtype=None,     # e.g. jnp.bfloat16: halves gather bytes, 2x MXU
) -> jnp.ndarray:
    """Submanifold conv: gather-GEMM with a memory-lean custom VJP."""
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    if weights.shape[0] == 27 and _save_gather_enabled():
        return _subm_conv_sg(features, nbr, weights)
    return _subm_conv(features, nbr, weights)


def linear_conv_apply(features: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """k=1 submanifold conv == pointwise linear (reference ResBlock shortcut)."""
    return jax.lax.dot_general(
        features, weights,
        dimension_numbers=(((features.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def downsample_conv_apply(
    features: jnp.ndarray,      # (B, V_in, Cin)
    ds: DownsampleMap,          # batched (leading B on array fields)
    weights: jnp.ndarray,       # (8, Cin, Cout)
    out_capacity: int,
) -> jnp.ndarray:
    """Strided conv: per-position matmuls + scatter-add into parents."""
    proj = jnp.einsum(
        "bvc,pcd->bvpd", features, weights,
        preferred_element_type=jnp.float32,
    )  # (B, V_in, 8, Cout)
    contrib = jnp.take_along_axis(
        proj, ds.child_pos[:, :, None, None], axis=2
    ).squeeze(2)  # (B, V_in, Cout)

    def scatter_one(contrib_s, parent_s):
        ok = parent_s >= 0
        tgt = jnp.where(ok, parent_s, out_capacity)
        return jax.ops.segment_sum(
            jnp.where(ok[:, None], contrib_s, 0.0), tgt,
            num_segments=out_capacity + 1,
        )[:out_capacity]

    return jax.vmap(scatter_one)(contrib, ds.child_parent)


def inverse_conv_apply(
    coarse_features: jnp.ndarray,  # (B, V_out, Cin)
    ds: DownsampleMap,             # batched
    weights: jnp.ndarray,          # (8, Cin, Cout)
) -> jnp.ndarray:
    """Inverse (transposed) conv back onto the stored finer grid."""
    def gather_one(feats_s, parent_s):
        g = feats_s[parent_s.clip(0)]
        return jnp.where((parent_s >= 0)[:, None], g, 0.0)

    gathered = jax.vmap(gather_one)(coarse_features, ds.child_parent)  # (B, V_in, Cin)
    proj = jnp.einsum(
        "bvc,pcd->bvpd", gathered, weights,
        preferred_element_type=jnp.float32,
    )
    out = jnp.take_along_axis(
        proj, ds.child_pos[:, :, None, None], axis=2
    ).squeeze(2)
    return jnp.where((ds.child_parent >= 0)[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# grid hierarchy: geometry for a whole UNet, built once per step
# ---------------------------------------------------------------------------

class GridLevel(NamedTuple):
    keys: jnp.ndarray        # (B, V_l)
    num_voxels: jnp.ndarray  # (B,)
    subm_nbr: jnp.ndarray    # (B, 27, V_l)

    @property
    def voxel_mask(self):
        v = self.keys.shape[-1]
        return jnp.arange(v)[None, :] < self.num_voxels[:, None]


class GridHierarchy(NamedTuple):
    """Static geometry for a SparseUNet forward: per-level submanifold

    rulebooks plus the stride-2 maps linking consecutive levels.  Mirrors the
    spconv indice-key sharing structure (one rulebook per `subm{i}`, one pair
    set per `spconv{i}`).
    """

    levels: Any            # tuple[GridLevel]
    downsamples: Any       # tuple[DownsampleMap], len = len(levels) - 1


def build_hierarchy(
    keys: jnp.ndarray,        # (B, V0) sorted packed keys
    num_voxels: jnp.ndarray,  # (B,)
    capacities: List[int],    # per-level voxel capacity, len = num UNet levels
    extent=None,              # optional static (ex, ey, ez) level-0 coordinate
                              # bound: dense-table rulebooks (fast path)
) -> GridHierarchy:
    levels = []
    downsamples = []
    cur_keys, cur_nv = keys, num_voxels
    cur_extent = tuple(extent) if extent is not None else None
    for li, cap in enumerate(capacities):
        e = cur_extent
        nbr = jax.vmap(lambda k: build_subm_rulebook(k, 3, extent=e))(cur_keys)
        levels.append(GridLevel(keys=cur_keys, num_voxels=cur_nv, subm_nbr=nbr))
        if li + 1 < len(capacities):
            ds = jax.vmap(
                lambda k: build_downsample(k, capacities[li + 1])
            )(cur_keys)
            downsamples.append(ds)
            cur_keys, cur_nv = ds.out_keys, ds.out_num_voxels
            if cur_extent is not None:
                cur_extent = tuple(-(-x // 2) for x in cur_extent)
    return GridHierarchy(levels=tuple(levels), downsamples=tuple(downsamples))
