"""Hash-grid connected components for radius clustering (fast path).

Replaces the O(N^2) ball-query + list-based CCL pipeline for the dual-set
clustering hot loop (reference epic_ops ball_query + ccl,
grouping_utils.py:108-140).  This is also how the CUDA originals scale — via a
spatial hash — re-thought for TPU:

  * cell size s = radius / sqrt(3): all same-cell same-label points are
    mutually within `radius` (cell diagonal == radius), so each (cell, label)
    pair collapses into ONE graph node whose points form a clique.
  * nodes are deduplicated packed keys (7-bit cell coords + 4-bit label); each
    node keeps its first `reps` member points ("representatives").
  * edges: the 5^3 neighborhood (|d|inf <= 2 covers every pair of cells whose
    points can be within radius) is probed HALF-sided — only the 62
    lexicographically-positive offsets, since the edge relation is symmetric
    and positive offsets strictly increase the x-major packed key.  Nodes
    with the same label are connected iff any representative pair lies
    within radius — a (N, reps, reps) distance check per offset chunk inside
    a lax.scan.  The reverse direction is restored afterwards by one
    edge-list sort (transpose adjacency), halving probe + distance work.
  * CCL: pull-only min-label propagation with pointer jumping over the
    concatenated forward+reverse neighbor table.

Deviations from the reference semantics (documented): the reference caps each
point's neighbor list at K (50/300) in scan order; here density is capped by
`reps` per (cell, label) node instead.  Both sparsify the same radius graph;
components agree except when a single beyond-cap point is the only bridge
between two otherwise-disconnected blobs.  Labels are normalized to the
minimum member point index per component, matching the representative-id
labeling the pipeline relies on.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

CELL_BITS = 7          # 128 cells per axis; extent 128 * r/sqrt(3) covers the
                       # augmented unit-ball clouds for r = 0.04
LABEL_BITS = 4         # < 16 semantic classes
KEY_SENTINEL = jnp.iinfo(jnp.int32).max
# dual-set mode: set-2 cells are shifted by SET_STRIDE along x — a >2-cell
# gap past the 128-cell set-1 region, so the 125 probe offsets (|d|inf <= 2)
# can never connect nodes across sets; one call clusters both sets at once
# (one sort, one probe, one label-propagation loop instead of two)
SET_STRIDE = 131
CELL_X_EXTENT = SET_STRIDE + (1 << CELL_BITS)  # 259


def _pack_node(cell: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    c = 1 << CELL_BITS
    return (
        (((cell[..., 0] * c + cell[..., 1]) * c + cell[..., 2]) << LABEL_BITS)
        | label
    )


@partial(jax.jit, static_argnames=(
    "reps", "max_iters", "max_degree", "node_capacity", "debug_stage",
    "probe_impl", "cand_cap", "symmetrize", "jumps"))
def hash_connected_components(
    pt_xyz: jnp.ndarray,
    sem_labels: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    reps: int = 8,
    max_iters: int = 32,
    max_degree: int = 24,
    node_capacity: int = 0,
    debug_stage: str = "",
    set_mask: jnp.ndarray = None,
    probe_impl: str = "sort",
    cand_cap: int = 0,
    symmetrize: str = "push",
    jumps: int = 4,
):
    """One sample; vmap over the batch.

    Returns (labels (N,) int32, node_overflow () int32, cand_truncated ()
    int32): labels are the minimum point index of each connected component
    (invalid points label themselves); node_overflow counts (cell, label)
    nodes beyond node_capacity whose points were isolated into singletons;
    cand_truncated counts nodes whose 5^3-neighborhood probe found more than
    cand_k same-label candidate nodes, so edges beyond the cap were dropped
    before the distance check (debug_stage paths return it as 0).

    node_capacity caps the (cell, label) node table (0 = N).  Real clouds
    occupy a few thousand nodes; a tight cap (e.g. N//2) shrinks every
    probe/edge structure proportionally.  Points whose node overflows the cap
    become isolated singletons — surface the overflow counter as a metric
    (models/gapartnet.py counters) so this never silently depresses AP.

    set_mask (N,) bool, optional: dual-set mode.  True points belong to an
    independent second point set (the offset-shifted set of the dual-set
    clustering, model.py:263-278); their cells are displaced by SET_STRIDE
    along x, so both sets cluster in ONE call with no cross-set edges —
    halving the fixed costs (sort, probe dispatch, propagation-loop latency)
    vs two calls.
    """
    n = pt_xyz.shape[0]
    m = node_capacity or n
    r2 = jnp.float32(radius * radius)
    s = radius / (3.0**0.5)
    big = jnp.float32(1e9)

    mn = jnp.min(jnp.where(valid[:, None], pt_xyz, big), axis=0) - s
    cell = jnp.floor((pt_xyz - mn) / s).astype(jnp.int32)
    in_grid = jnp.all((cell >= 0) & (cell < (1 << CELL_BITS)), axis=-1)
    ok = valid & in_grid & (sem_labels >= 0) & (sem_labels < (1 << LABEL_BITS))
    if set_mask is not None:
        cell = cell.at[:, 0].add(jnp.where(set_mask, SET_STRIDE, 0))

    keys = jnp.where(ok, _pack_node(cell, sem_labels), KEY_SENTINEL)
    order = jnp.argsort(keys)  # stable: point order preserved within a node
    sk = keys[order]
    sorted_ok = sk != KEY_SENTINEL
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & sorted_ok
    node_of_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    if set_mask is None:
        in_cap_sorted = node_of_sorted < m
    else:
        # PER-SET capacity (round-4 fix): set-2 keys (x >= SET_STRIDE) always
        # sort AFTER set 1, so a single global `node_id < m` cap starves
        # set 2 first whenever set 1 is large — and set 2 (the offset-shifted
        # clustering) is precisely what recovers small parts (model.py:
        # 263-278 dual-set rationale).  Each set gets m//2 slots; dropped
        # nodes are remapped out so the table stays compact.
        is_set2 = ((sk >> LABEL_BITS) // ((1 << CELL_BITS) ** 2)) >= SET_STRIDE
        set2_nodes = jnp.cumsum((first & is_set2).astype(jnp.int32))
        rank_in_set = jnp.where(
            is_set2, set2_nodes - 1, node_of_sorted - set2_nodes
        )
        in_cap_sorted = rank_in_set < (m // 2)
    kept = first & in_cap_sorted
    # compact node ids over KEPT nodes only (dropped ids leave no gaps)
    new_id = jnp.cumsum(kept.astype(jnp.int32)) - 1
    num_nodes = jnp.minimum(kept.sum(), m).astype(jnp.int32)
    in_cap = in_cap_sorted & (new_id < m)
    point_node = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(sorted_ok & in_cap, new_id, -1)
    )
    node_keys = jnp.full((m,), KEY_SENTINEL, jnp.int32).at[
        jnp.where(kept & in_cap, new_id, m)
    ].set(sk, mode="drop")

    # rank of each point within its node (scan-order == point-index order)
    node_start = jnp.zeros((m,), jnp.int32).at[
        jnp.where(kept & in_cap, new_id, m)
    ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - node_start[
        jnp.clip(new_id, 0, m - 1)
    ]
    # representative table: first `reps` member points of each node
    rep_table = jnp.full((m, reps), -1, jnp.int32).at[
        jnp.where(sorted_ok & in_cap & (rank_sorted < reps), new_id, m),
        jnp.clip(rank_sorted, 0, reps - 1),
    ].set(order.astype(jnp.int32), mode="drop")

    rep_ok = rep_table >= 0
    rep_xyz = pt_xyz[rep_table.clip(0)]              # (N, reps, 3)
    if debug_stage == "nodes":  # stage profiling (tools/ccl_bench.py)
        return point_node, node_keys, rep_xyz

    node_cell_key = node_keys >> LABEL_BITS
    c = 1 << CELL_BITS
    # x is NOT masked by % c: in dual-set mode it ranges up to CELL_X_EXTENT
    node_cell = jnp.stack(
        [node_cell_key // (c * c), (node_cell_key // c) % c, node_cell_key % c],
        axis=-1,
    )
    node_label = node_keys & ((1 << LABEL_BITS) - 1)
    node_valid = jnp.arange(m) < num_nodes

    # Neighbor-node lookup, two implementations (probe_impl):
    #
    # "sort": sorted key membership — nodes are unique (cell, label) keys in
    #   ascending order, so a probe is one searchsorted + equality check and
    #   the insertion rank IS the node id.  One fused sort of keys+queries;
    #   TPU sorts scale linearly in batch.  Best at batch (B8: 270 ms vs
    #   557 ms table).
    # "table": O(1) dense cell_start table (rank-1!  a (num_cells, 4)
    #   packed variant tile-pads 4 -> 128 lanes, 17 GB at B8) + a small
    #   (M, 4) rolling-window key fetch.  Fastest single-sample (B1: 23 ms
    #   vs 67 ms sort), but every probe element-gather pulls a fresh HBM
    #   tile of the 259*128^2-entry table, scaling ~24x from B1 to B8.
    #
    # Callers pick per static batch size (models/gapartnet.py).
    #
    # HALF-NEIGHBORHOOD probing (round 3): the edge relation is symmetric, so
    # each unordered cell pair needs probing from only ONE side.  Keep the 62
    # lexicographically-POSITIVE offsets of the 5^3 neighborhood (positive
    # offsets strictly increase the x-major packed cell key, so every forward
    # hit points to a HIGHER node id); the reverse direction is restored
    # after the distance check by one grouping sort (cheaper than probing:
    # halves the probe searchsorted, the candidate sort, and the rep-distance
    # gathers).
    import numpy as _np

    offs = [
        (dx, dy, dz)
        for dx in range(-2, 3)
        for dy in range(-2, 3)
        for dz in range(-2, 3)
        if (dx, dy, dz) > (0, 0, 0)
    ]
    offsets = jnp.asarray(_np.asarray(offs, _np.int32))            # (62, 3)
    noff = offsets.shape[0]

    tgt_cell = node_cell[None, :, :] + offsets[:, None, :]         # (62, N, 3)
    bound = jnp.asarray([CELL_X_EXTENT, c, c], jnp.int32)
    tin = jnp.all((tgt_cell >= 0) & (tgt_cell < bound), axis=-1) & node_valid[None, :]
    tgt_key = jnp.where(
        tin, _pack_node(tgt_cell, node_label[None, :]), KEY_SENTINEL - 1
    )
    if probe_impl == "sort":
        idx = jnp.clip(
            jnp.searchsorted(
                node_keys, tgt_key.reshape(-1), method="sort"
            ).astype(jnp.int32),
            0, m - 1,
        ).reshape(noff, m)
        found_all = (node_keys[idx] == tgt_key) & tin
        vid_all = idx
    elif probe_impl == "bsearch":
        # per-query binary search against the VMEM-resident (M,) key table —
        # avoids method="sort"'s full sort of keys + 62*M queries
        idx = jnp.clip(
            jnp.searchsorted(node_keys, tgt_key).astype(jnp.int32), 0, m - 1
        )
        found_all = (node_keys[idx] == tgt_key) & tin
        vid_all = idx
    elif probe_impl in ("table", "window"):
        window = 4  # a 2.3 cm cell rarely holds > 4 distinct part labels
        num_cells = CELL_X_EXTENT * c * c
        first_in_cell = jnp.concatenate(
            [jnp.ones((1,), bool), node_cell_key[1:] != node_cell_key[:-1]]
        ) & node_valid
        cell_start = jnp.full((num_cells,), -1, jnp.int32).at[
            jnp.where(first_in_cell, node_cell_key, num_cells)
        ].set(jnp.arange(m, dtype=jnp.int32), mode="drop")
        if probe_impl == "table":
            tgt_cell_key = (
                tgt_cell[..., 0] * c + tgt_cell[..., 1]
            ) * c + tgt_cell[..., 2]
            start = cell_start[jnp.where(tin, tgt_cell_key, 0)]     # (62, N)
        else:
            # "window" (round 4): cell keys pack z-fastest, so the 5 dz
            # targets of one (dx, dy) column are CONSECUTIVE cell keys —
            # fetch each column's starts with ONE 5-wide slice-gather
            # instead of 5 element gathers.  Every element gather pulls a
            # fresh ~4 KB HBM tile of the 4.2M-entry cell_start table, so
            # this cuts the probe's dominant tile traffic 62 -> 13 rows
            # per node (the sparse-conv _gather_taps_windowed trick applied
            # to the cell-key space; PERF.md round-4 candidate).
            from gapartnet_tpu.ops.sparse_conv import _window_gather

            pair_list = [(0, 0)] + [
                (dx, dy)
                for dx in range(3)
                for dy in range(-2, 3)
                if (dx, dy) > (0, 0)
            ]  # 13 columns, in `offs` group order
            pairs = jnp.asarray(_np.asarray(pair_list, _np.int32))  # (13, 2)
            bk = (
                (node_cell[None, :, 0] + pairs[:, 0, None]) * c
                + (node_cell[None, :, 1] + pairs[:, 1, None])
            ) * c + (node_cell[None, :, 2] - 2)                     # (13, M)
            # 4 sentinel pad rows keep bk+4 in bounds without shifting the
            # window (a shifted window would misalign the dz slot index);
            # out-of-grid targets are masked by `tin` downstream anyway
            cell_start_p = jnp.concatenate(
                [cell_start, jnp.full((4,), -1, jnp.int32)]
            )
            wg = _window_gather(
                cell_start_p, bk.clip(0, num_cells - 1), 5
            )                                                       # (13, M, 5)
            g0 = wg[0, :, 3:5].T                                    # dz = +1, +2
            rest = wg[1:].transpose(0, 2, 1).reshape(60, m)
            start = jnp.concatenate([g0, rest], axis=0)             # (62, M)
        # probe the `window` nodes at ranks [start, start+window) via
        # `window` gathers from SHIFTED rank-1 key arrays: a direct
        # (62, M, window) window-gather ends in a trailing dim of 4, which
        # tile-pads 4 -> 128 lanes (32x physical HBM; the round-2 lesson,
        # PERF.md "tile-padding fix").  Shifted (M,) arrays keep every
        # gather's trailing dim at M and stay VMEM-resident.
        start_ok = (start >= 0) & tin
        sc = start.clip(0)
        hits = jnp.stack(
            [
                (jnp.roll(node_keys, -j)[sc] == tgt_key) & start_ok
                for j in range(window)
            ],
            axis=0,
        )  # (window, 62, M)
        found_all = jnp.any(hits, axis=0)
        off_in_window = jnp.argmax(hits, axis=0).astype(jnp.int32)
        vid_all = jnp.clip(start + off_in_window, 0, m - 1)
    else:
        raise ValueError(probe_impl)
    if debug_stage == "probe":
        return vid_all, found_all

    # candidate compaction BEFORE the distance check: most of the 62 probe
    # slots are empty, and the rep-coordinate gather pulls a fresh HBM tile
    # per (candidate, node) row — so sort each node's candidates ascending
    # (found first, lowest node rank first: exactly the edges that carry the
    # minimum in propagation) and distance-check only the first cand_k.
    # Same cap semantics as max_degree, applied one stage earlier.
    # max_degree caps each DIRECTION since half-neighborhood probing: total
    # degree <= 2 * max_degree, so the default 24 matches the former
    # full-neighborhood 48 while keeping the propagation table equally wide.
    cand_k = cand_cap or max(4, min(32, max_degree))
    cand_k = ((cand_k + 3) // 4) * 4  # edge scan chunks offsets in fours
    if cand_k >= found_all.shape[0]:
        # a cap at or ABOVE the probe's 62-offset row count makes candidate
        # truncation structurally impossible (found <= 62 <= cand_k) — the
        # unconditional eval contract (trainer.eval_capacity_config asks for
        # 64).  Pad the probe rows with not-found sentinels so the chunked
        # reshape below stays exact.
        pad = cand_k - found_all.shape[0]
        found_all = jnp.concatenate(
            [found_all, jnp.zeros((pad, m), bool)], axis=0
        )
        vid_all = jnp.concatenate(
            [vid_all, jnp.full((pad, m), m - 1, vid_all.dtype)], axis=0
        )
    # nodes with more found candidates than the cap silently lose edges the
    # distance check never sees — count them (ADVICE r2: the only capacity
    # without an overflow counter)
    cand_truncated = jnp.sum(found_all.sum(axis=0) > cand_k).astype(jnp.int32)
    cand = jnp.sort(jnp.where(found_all, vid_all, m), axis=0)[:cand_k]
    cfound = cand < m                                     # (cand_k, M)
    cvid = jnp.where(cfound, cand, 0)

    def edge_step(_, args):
        vid, found = args                                 # (G, M), (G, M)
        # any representative pair within radius? (mask padded rep slots —
        # they share a coordinate and would alias to distance 0)
        v_xyz = rep_xyz[vid]                              # (G, M, reps, 3)
        v_ok = rep_ok[vid]
        d2 = jnp.sum(
            (rep_xyz[None, :, :, None, :] - v_xyz[:, :, None, :, :]) ** 2,
            axis=-1,
        )
        pair_ok = rep_ok[None, :, :, None] & v_ok[:, :, None, :]
        connected = found & jnp.any(pair_ok & (d2 <= r2), axis=(2, 3))
        return None, (jnp.where(connected, vid, -1),)

    # chunk the offsets into groups of 4: fewer sequential loop steps
    # (latency) while keeping per-step tensors modest
    _, (nbr_g,) = lax.scan(
        edge_step, None,
        (cvid.reshape(cand_k // 4, 4, m), cfound.reshape(cand_k // 4, 4, m)),
    )
    nbr_ids = nbr_g.reshape(cand_k, m)

    # degree compaction: keep the `max_degree` lowest-rank neighbors per node
    # (candidates were rank-sorted above, so connected entries are already
    # ascending; compact the -1 holes out with one more sort)
    nbr_sorted = jnp.sort(jnp.where(nbr_ids >= 0, nbr_ids, m), axis=0)
    if max_degree < cand_k:
        # connected edges beyond max_degree are dropped from propagation —
        # a real edge loss exactly like the candidate cap; fold nodes that
        # lost >= 1 connected edge into the same truncation counter
        # (ADVICE r2 / VERDICT r3: no silent capacity without a counter)
        cand_truncated = cand_truncated + jnp.sum(
            nbr_sorted[max_degree] < m
        ).astype(jnp.int32)
    nbr_ids = jnp.where(
        nbr_sorted[:max_degree] < m, nbr_sorted[:max_degree], -1
    )  # (max_degree, M)

    # restore the reverse direction (half-neighborhood probing): every
    # forward edge points to a HIGHER node id, so min-label information
    # could never flow upward through a pull-only loop.  Two modes:
    #   "transpose": build the reverse adjacency once, with one sort of the
    #     (max_degree * M) edge list by destination + rank-in-group scatter;
    #     the loop stays pull-only over the doubled table.
    #   "push": keep the forward table only; each loop iteration adds one
    #     scatter-min push along forward edges (no edge loss, no sort).
    #     DEFAULT: measured 136 vs 169 ms at B8 model shape (PERF.md r3).
    if symmetrize == "transpose":
        src = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.int32)[None, :], nbr_ids.shape
        )
        flat_dst = jnp.where(nbr_ids >= 0, nbr_ids, m).reshape(-1)
        eorder = jnp.argsort(flat_dst)
        sd = flat_dst[eorder]
        ss = src.reshape(-1)[eorder]
        e_idx = jnp.arange(sd.shape[0], dtype=jnp.int32)
        firste = jnp.concatenate([jnp.ones((1,), bool), sd[1:] != sd[:-1]])
        rank_e = e_idx - lax.cummax(jnp.where(firste, e_idx, 0))
        rev_real = sd < m
        rev_kept = rev_real & (rank_e < max_degree)
        rev_ids = jnp.full((max_degree, m), -1, jnp.int32).at[
            jnp.where(rev_kept, rank_e, 0),
            jnp.where(rev_kept, sd, m),
        ].set(ss, mode="drop")
        # reverse-degree truncation is a real edge loss like the candidate
        # cap — fold it into the same counter
        cand_truncated = cand_truncated + jnp.sum(
            rev_real & ~rev_kept
        ).astype(jnp.int32)
        nbr_ids = jnp.concatenate([nbr_ids, rev_ids], axis=0)
    elif symmetrize != "push":
        raise ValueError(symmetrize)
    if debug_stage == "edges":
        return nbr_ids

    # pull-only CCL with pointer jumping (edge relation is symmetric)
    labels0 = jnp.arange(m, dtype=jnp.int32)

    def make_loop(table):
        def cond(state):
            labels, prev, it = state
            return (it < max_iters) & jnp.any(labels != prev)

        def body(state):
            labels, _, it = state
            prev = labels
            nl = jnp.where(table >= 0, labels[table.clip(0)], m)
            labels = jnp.minimum(labels, jnp.min(nl, axis=0))
            if symmetrize == "push":
                # push the (updated) source labels along forward edges so
                # minima also flow toward higher node ids
                labels = labels.at[
                    jnp.where(table >= 0, table, m)
                ].min(
                    jnp.broadcast_to(labels[None, :], table.shape),
                    mode="drop",
                )
            # pointer jumping: labels index labels, each jump composes the
            # pointer function (cheap (M,) gathers vs the wide edge gather);
            # `jumps` trades (M,) gathers for whole wide-table iterations
            for _ in range(jumps):
                labels = labels[labels]
            return labels, prev, it + 1

        return cond, body

    # Two-phase propagation (round 5): the per-iteration cost is the wide
    # (max_degree, M) pull gather + push scatter, and convergence needs
    # ~12 iterations on real clouds (long chains across big parts).  The
    # LOWEST-id neighbors (rank-sorted first rows) carry almost all the
    # long-distance connectivity, so a first fixpoint over a narrow prefix
    # of the table does the chain-chasing at `narrow/max_degree` of the
    # cost, and the full-width loop then needs only the local stitch-up
    # (~2-3 iterations).  Correctness is unaffected: the SECOND loop runs
    # to ITS OWN fixpoint over the complete edge table, and min-label
    # propagation is monotone (any warm start below the identity labeling
    # converges to the same component minima).
    narrow = 8
    if max_degree > narrow:
        c0, b0 = make_loop(nbr_ids[:narrow])
        labels0, _, _ = lax.while_loop(
            c0, b0, (labels0, jnp.full((m,), -1, jnp.int32), jnp.int32(0))
        )
    cond, body = make_loop(nbr_ids)
    node_root, _, _ = lax.while_loop(
        cond, body, (labels0, jnp.full((m,), -1, jnp.int32), jnp.int32(0))
    )

    # normalize: min point index per component (points whose node overflowed
    # the capacity are isolated and label themselves)
    has_node = ok & (point_node >= 0)
    root_per_point = jnp.where(has_node, node_root[point_node.clip(0)], -1)
    min_point = jnp.full((m,), n, jnp.int32).at[
        jnp.where(has_node, root_per_point.clip(0), m)
    ].min(jnp.arange(n, dtype=jnp.int32), mode="drop")
    out = jnp.where(
        has_node,
        min_point[root_per_point.clip(0)],
        jnp.arange(n, dtype=jnp.int32),
    )
    node_overflow = (first.sum() - num_nodes).astype(jnp.int32)
    return out, node_overflow, cand_truncated
