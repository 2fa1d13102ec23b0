"""Dual-set proposal clustering, compaction, and segmented re-voxelization.

Fixed-shape re-architecture of the reference instance-grouping pipeline
(gapartnet/network/model.py:228-346 + grouping_utils.py:47-140):

  1. label-constrained ball query + connected components on xyz (K=50) and on
     xyz+offset (K=300) — the "dual set" (model.py:263-278)
  2. concatenate the two cluster-label spaces, compact ids, drop proposals
     with < min_pts points (model.py:281-314)
  3. per-proposal normalize into a `score_fullscale`^3 cube with clamped
     scale and a shared random placement jitter, then voxelize with unit
     voxels (grouping_utils.py:47-104)

The reference's shrinking-tensor cascade becomes masked fixed capacities:
every sample owns exactly 2N proposal-point "entries" (each valid point
appears once per set) and at most P proposals; everything downstream indexes
through (entry_point, entry_proposal, masks).

Proposal voxel grids are embedded in one virtual 1024^3 key space: proposal p
gets the 32^3 cell at ((p%32), (p//32)%32, p//1024) * 32, so the generic
rulebook machinery (ops/sparse_conv.py) runs unchanged.  Cube coords stay in
[0, 28) < 32, so kernels never alias across cells (one-voxel guard margin on
both sides, and stride-2 halving keeps cells disjoint at the coarser level).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gapartnet_tpu.ops.ball_query import ball_query_single
from gapartnet_tpu.ops.ccl import connected_components_single
from gapartnet_tpu.ops.segment import (
    segment_count,
    segment_max,
    segment_mean,
    segment_min,
    segment_sum,
)
from gapartnet_tpu.ops.voxelize import dedup_keys, pack_coords

PROPOSAL_CELL = 32  # virtual cell edge per proposal (> score_fullscale 28)


class SampleProposals(NamedTuple):
    """Per-sample clustering output (leading axis 2N entries / P proposals)."""

    entry_point: jnp.ndarray     # (2N,) point index in [0, N)
    entry_proposal: jnp.ndarray  # (2N,) compact proposal id, -1 invalid
    entry_mask: jnp.ndarray      # (2N,) bool
    proposal_size: jnp.ndarray   # (P,) int32
    proposal_mask: jnp.ndarray   # (P,) bool
    num_proposals: jnp.ndarray   # () int32
    # overflow counters (silent-capacity diagnostics; zero in healthy runs)
    num_dropped: jnp.ndarray     # () int32 proposals beyond max_proposals
    ccl_overflow: jnp.ndarray    # () int32 hash-CCL node-table overflow
    ccl_cand_truncated: jnp.ndarray  # () int32 hash-CCL candidate-cap drops


def cluster_single(
    pt_xyz: jnp.ndarray,
    offsets: jnp.ndarray,
    sem_preds: jnp.ndarray,
    valid: jnp.ndarray,
    ball_query_radius: float,
    max_num_points_per_query: int,
    max_num_points_per_query_shift: int,
    min_num_points_per_proposal: int,
    max_proposals: int,
    impl: str = "hash",
    hash_node_capacity: int = 0,
    probe_impl: str = "sort",
    hash_cand_cap: int = 0,
    hash_max_degree: int = 24,
):
    """One sample; vmap over the batch.  Returns SampleProposals.

    impl="hash" (default): hash-grid CCL (ops/hash_ccl.py) — the fast TPU
    path, density-capped per cell instead of the reference's per-query K cap.
    impl="exact": first-K ball query + list CCL, bit-matching the reference
    neighbor semantics (kept for parity testing; O(N^2)).
    """
    n = pt_xyz.shape[0]

    if impl == "hash":
        from gapartnet_tpu.ops.hash_ccl import hash_connected_components

        # ONE merged call clusters both sets: set-2 cells are displaced past
        # the set-1 grid (hash_ccl SET_STRIDE), so no cross-set edges exist
        # and the sort / probe dispatch / propagation-loop latencies are paid
        # once.  (NOTE: vmap-stacking the two sets was measured SLOWER,
        # 238 -> 340 ms B1 full — the extra vmap layer degrades the dense-
        # table scatter/gather layouts; concatenation keeps layouts flat.)
        both = jnp.concatenate([pt_xyz, pt_xyz + offsets])
        set_mask = jnp.arange(2 * n) >= n
        lab, ccl_overflow, ccl_cand_truncated = hash_connected_components(
            both,
            jnp.concatenate([sem_preds, sem_preds]),
            jnp.concatenate([valid, valid]),
            ball_query_radius,
            node_capacity=2 * hash_node_capacity if hash_node_capacity else 0,
            set_mask=set_mask,
            probe_impl=probe_impl,
            cand_cap=hash_cand_cap,
            max_degree=hash_max_degree,
        )
        # labels are min point indices in the 2N space; components never span
        # sets, so set-2 labels map back by -n (invalid selves included)
        lab1, lab2 = lab[:n], lab[n:] - n
    else:
        nbr1, _ = ball_query_single(
            pt_xyz, sem_preds, valid, ball_query_radius, max_num_points_per_query
        )
        lab1 = connected_components_single(nbr1, valid)
        nbr2, _ = ball_query_single(
            pt_xyz + offsets, sem_preds, valid, ball_query_radius,
            max_num_points_per_query_shift,
        )
        lab2 = connected_components_single(nbr2, valid)
        ccl_overflow = jnp.zeros((), jnp.int32)
        ccl_cand_truncated = jnp.zeros((), jnp.int32)

    # entries: set-1 clusters keyed by [0, N), set-2 by [N, 2N).  Labels are
    # min-point-index keys, so compact proposal ids come from a scatter +
    # cumsum over the dense key table — no sort (TPU sorts are expensive;
    # entries stay in natural point order, and every downstream consumer is
    # a segment reduce or gather, which is order-independent).  Proposal
    # numbering (ascending key = (set, component label)) matches the
    # reference's unique_consecutive compaction order (model.py:281-314).
    m = 2 * n
    keys = jnp.concatenate(
        [jnp.where(valid, lab1, m), jnp.where(valid, n + lab2, m)]
    )
    sp = jnp.concatenate([jnp.arange(n, dtype=jnp.int32)] * 2)
    entry_valid = keys < m

    sizes_raw = jnp.zeros((m + 1,), jnp.int32).at[keys].add(1)[:m]
    keep_raw = sizes_raw >= min_num_points_per_proposal
    compact_of_raw = jnp.cumsum(keep_raw.astype(jnp.int32)) - 1
    kc = jnp.clip(keys, 0, m - 1)
    keep_entry = entry_valid & keep_raw[kc]
    pid = jnp.where(keep_entry, compact_of_raw[kc], -1)
    pid = jnp.where(pid < max_proposals, pid, -1)
    entry_mask = pid >= 0

    num_kept = keep_raw.sum().astype(jnp.int32)
    num_proposals = jnp.minimum(num_kept, max_proposals)
    proposal_size = segment_sum(
        jnp.ones((m,), jnp.int32), pid, max_proposals, mask=entry_mask
    )
    proposal_mask = jnp.arange(max_proposals) < num_proposals

    return SampleProposals(
        entry_point=sp,
        entry_proposal=pid,
        entry_mask=entry_mask,
        proposal_size=proposal_size,
        proposal_mask=proposal_mask,
        num_proposals=num_proposals,
        num_dropped=num_kept - num_proposals,
        ccl_overflow=ccl_overflow,
        ccl_cand_truncated=ccl_cand_truncated,
    )


class ProposalGrid(NamedTuple):
    keys: jnp.ndarray          # (2N,) sorted proposal-grid voxel keys
    num_voxels: jnp.ndarray    # ()
    entry_voxel_id: jnp.ndarray  # (2N,) voxel id per entry, -1 invalid


def proposal_cube_coords(
    pt_xyz: jnp.ndarray,           # (N, 3)
    prop: SampleProposals,
    rand_a: jnp.ndarray,           # (3,) uniform [0,1) — min-clamp jitter draw
    rand_b: jnp.ndarray,           # (3,) uniform [0,1) — max-clamp jitter draw;
                                   # the reference draws TWO independent
                                   # torch.rand(3) (grouping_utils.py:86-91)
    max_proposals: int,
    score_fullscale: float = 28.0,
    score_scale: float = 50.0,
):
    """Per-entry integer cube coordinates in [0, fullscale)^3.

    Normalizes each proposal into the `score_fullscale` cube with clamped
    scale and random placement jitter, exactly mirroring the reference's
    segmented_voxelize (grouping_utils.py:47-104).  Returns
    (coords (2N, 3) int32, pidc (2N,) clipped proposal id, mask (2N,)).
    """
    p = max_proposals
    exyz = pt_xyz[prop.entry_point]  # (2N, 3)
    pidc = jnp.clip(prop.entry_proposal, 0, p - 1)
    mask = prop.entry_mask

    mean = segment_mean(exyz, pidc, p, mask=mask)
    centered = exyz - mean[pidc]
    cmin = segment_min(centered, pidc, p, mask=mask)
    cmax = segment_max(centered, pidc, p, mask=mask)
    # guard empty proposals (segment_min/max identities are +/- inf)
    ok_p = prop.proposal_size > 0
    cmin = jnp.where(ok_p[:, None], cmin, 0.0)
    cmax = jnp.where(ok_p[:, None], cmax, 0.0)

    extent = jnp.max(cmax - cmin, axis=-1)
    scales = 1.0 / jnp.maximum(extent / score_fullscale, 1e-12) - 0.01
    scales = jnp.minimum(scales, score_scale)

    min_xyz = cmin * scales[:, None]
    max_xyz = cmax * scales[:, None]
    scaled = centered * scales[pidc][:, None]

    range_xyz = max_xyz - min_xyz
    offs = (
        -min_xyz
        + jnp.clip(score_fullscale - range_xyz - 0.001, min=0.0) * rand_a[None, :]
        + jnp.clip(score_fullscale - range_xyz + 0.001, max=0.0) * rand_b[None, :]
    )
    scaled = scaled + offs[pidc]

    coords = jnp.clip(
        jnp.floor(scaled).astype(jnp.int32), 0, int(score_fullscale) - 1
    )
    return coords, pidc, mask


def segmented_voxelize_single(
    pt_xyz: jnp.ndarray,           # (N, 3)
    prop: SampleProposals,
    rand_a: jnp.ndarray,
    rand_b: jnp.ndarray,
    max_proposals: int,
    score_fullscale: float = 28.0,
    score_scale: float = 50.0,
) -> ProposalGrid:
    """Normalize each proposal into the fullscale cube and voxelize (unit
    voxel) into the virtual PROPOSAL_CELL key space (sparse conv path)."""
    coords, pidc, mask = proposal_cube_coords(
        pt_xyz, prop, rand_a, rand_b, max_proposals, score_fullscale, score_scale
    )
    cell = jnp.stack(
        [pidc % PROPOSAL_CELL, (pidc // PROPOSAL_CELL) % PROPOSAL_CELL,
         pidc // (PROPOSAL_CELL * PROPOSAL_CELL)],
        axis=-1,
    )
    full_coords = cell * PROPOSAL_CELL + coords
    keys = pack_coords(full_coords)
    unique_keys, entry_voxel_id, num_voxels = dedup_keys(keys, mask)
    return ProposalGrid(
        keys=unique_keys, num_voxels=num_voxels, entry_voxel_id=entry_voxel_id
    )


def segmented_dense_voxelize_single(
    pt_xyz: jnp.ndarray,           # (N, 3)
    prop: SampleProposals,
    rand_a: jnp.ndarray,
    rand_b: jnp.ndarray,
    max_proposals: int,
    score_fullscale: float = 28.0,
    score_scale: float = 50.0,
) -> jnp.ndarray:
    """Per-entry linear site index into the dense (P, S, S, S) proposal grid.

    The dense conv path (models/dense_unet.py) needs no dedup, no sort, and
    no rulebooks: the dense grid IS the voxel table.  Returns entry_cell
    (2N,) int32 = ((pid*S + x)*S + y)*S + z, or -1 for invalid entries.
    """
    s = int(score_fullscale)
    coords, pidc, mask = proposal_cube_coords(
        pt_xyz, prop, rand_a, rand_b, max_proposals, score_fullscale, score_scale
    )
    lin = ((pidc * s + coords[:, 0]) * s + coords[:, 1]) * s + coords[:, 2]
    return jnp.where(mask, lin, -1)
