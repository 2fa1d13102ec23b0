"""Data-driven fixed-shape capacity sizing.

TPU graphs are compiled at static shapes, so every level of the sparse
hierarchy carries a fixed voxel capacity and silently-counted overflow
(ops/sparse_conv.py `num_dropped`).  The round-2 defaults were rightsized
against synthetic Gaussian-blob clouds; real articulated-object surfaces
occupy far more voxels at the intermediate strides (a surface loses only
~3-4x voxels per stride-2, not 8x), so the divisor schedule
(1, 2, 4, ...) clipped ~13% of real voxels at level 1.

This module sizes capacities from the data itself: scan a sample of the
dataset *through the real loading + augmentation pipeline*, take the
per-level max unique-voxel count, add headroom, and round up to a
TPU-friendly multiple.  The result plugs into
`GAPartNetConfig.level_capacities` (checked before the divisor schedule)
and is enabled end-to-end with `DataConfig.auto_capacity`.

Reference context: the reference never needed this — spconv grids are
dynamically shaped (gapartnet/network/backbone.py uses whatever indices
arrive).  Static capacity + overflow counters + this scan is the
TPU-native equivalent contract.
"""

from typing import Iterable, Sequence, Tuple

import numpy as np


def _unique_counts(xyz: np.ndarray, voxel_size, num_levels: int):
    """Unique voxel count of `xyz` at each stride-2 level."""
    return _counts_and_span(xyz, voxel_size, num_levels)[0]


def _counts_and_span(xyz: np.ndarray, voxel_size, num_levels: int):
    """(per-level unique voxel counts, level-0 per-axis span in cells)."""
    if len(xyz) == 0:
        return [0] * num_levels, np.zeros(3, np.int64)
    vox = np.floor(
        (xyz - xyz.min(0)) / np.asarray(voxel_size, np.float64)
    ).astype(np.int64)
    out = []
    for lvl in range(num_levels):
        c = vox >> lvl
        key = (c[:, 0] << 42) + (c[:, 1] << 21) + c[:, 2]
        out.append(len(np.unique(key)))
    return out, vox.max(0) + 1


def scan_level_capacities(
    datasets: Iterable,
    voxel_size: Sequence[float],
    num_levels: int,
    max_points: int,
    *,
    augment_trials: int = 3,
    headroom: float = 1.08,
    round_to: int = 128,
    max_samples: int = 48,
) -> Tuple[int, ...]:
    """Measure per-level voxel occupancy over dataset samples.

    `datasets` are GAPartNetDataset-likes (len / __getitem__ / .epoch /
    .augmentation).  Augmenting datasets are sampled `augment_trials`
    times at distinct epochs so jitter/rotation draws widen the envelope
    the way a real training run would.  Returns per-level capacities:
    max observed count x headroom, rounded up to `round_to`, clamped to
    [64, max_points].
    """
    return scan_dataset_shapes(
        datasets, voxel_size, num_levels, max_points,
        augment_trials=augment_trials, headroom=headroom,
        round_to=round_to, max_samples=max_samples,
    )[0]


def scan_dataset_shapes(
    datasets: Iterable,
    voxel_size: Sequence[float],
    num_levels: int,
    max_points: int,
    *,
    augment_trials: int = 3,
    headroom: float = 1.08,
    aug_headroom: float = 1.16,
    round_to: int = 128,
    extent_round_to: int = 16,
    max_samples: int = 48,
) -> Tuple[Tuple[int, ...], Tuple[int, int, int]]:
    """One data pass -> (per-level capacities, level-0 grid extent).

    The extent bounds the dense rulebook coordinate table
    (GAPartNetConfig.input_grid_extent, a ~2-byte entry per cell): fitting
    it to the observed per-axis span (x headroom, rounded to
    `extent_round_to`) shrinks the per-call table memset — real clouds
    span ~(210, 245, 222) cells vs the conservative 288^3 default.
    Out-of-extent voxels only lose neighbor links, so a rare outlier
    degrades gracefully rather than crashing.

    Augmented datasets get `aug_headroom` instead of `headroom`: the scan
    sees `augment_trials` random draws per sample, but a long run sees
    hundreds — round-4 training measured ~0.1%% of voxels dropped at deep
    levels under jitter/rotation draws the 3-trial scan missed.
    """
    mx = np.zeros(num_levels, np.int64)
    mx_hr = float(headroom)
    span = np.zeros(3, np.int64)
    for ds in datasets:
        if ds is None or len(ds) == 0:
            continue
        idxs = np.unique(
            np.linspace(0, len(ds) - 1, min(len(ds), max_samples)).astype(int)
        )
        trials = augment_trials if getattr(ds, "augmentation", False) else 1
        if trials > 1:
            mx_hr = max(mx_hr, float(aug_headroom))
        epoch0 = getattr(ds, "epoch", 0)
        try:
            for t in range(trials):
                ds.epoch = epoch0 + t
                for i in idxs:
                    item = ds[int(i)]
                    xyz = item["points"][item["point_mask"]][:, :3]
                    counts, sp = _counts_and_span(xyz, voxel_size, num_levels)
                    mx = np.maximum(mx, counts)
                    span = np.maximum(span, sp)
        finally:
            ds.epoch = epoch0
    caps = np.ceil(mx * mx_hr / round_to).astype(np.int64) * round_to
    caps = np.minimum(np.maximum(caps, 64), max_points)
    ext = np.ceil(span * headroom / extent_round_to).astype(np.int64)
    ext = np.maximum(ext * extent_round_to, 32)
    return (
        tuple(int(c) for c in caps),
        (int(ext[0]), int(ext[1]), int(ext[2])),
    )


def _hash_occupancy(xyz: np.ndarray, labels: np.ndarray, radius: float):
    """(node count, max same-label candidates over the 62 positive probe
    offsets) of one clustered point set — the quantities that size the
    hash-CCL tables (ops/hash_ccl.py)."""
    if len(xyz) == 0:
        return 0, 0
    s = radius / np.sqrt(3.0)
    cell = np.floor((xyz - xyz.min(0) + s) / s).astype(np.int64)
    key = ((cell[:, 0] << 34) + (cell[:, 1] << 17) + cell[:, 2]) * 16 + labels
    uniq = np.unique(key)
    lab = uniq % 16
    ck = uniq // 16
    cz, cy, cx = ck & 0x1FFFF, (ck >> 17) & 0x1FFFF, ck >> 34
    cand = np.zeros(len(uniq), np.int64)
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            for dz in range(-2, 3):
                if (dx, dy, dz) <= (0, 0, 0):
                    continue
                tk = (((cx + dx) << 34) + ((cy + dy) << 17) + (cz + dz)) * 16 + lab
                cand += np.isin(tk, uniq, assume_unique=True)
    return len(uniq), int(cand.max(initial=0))


def _hash_connected_degree(
    xyz: np.ndarray, labels: np.ndarray, radius: float, reps: int = 8
) -> int:
    """Max forward-CONNECTED node degree of one clustered point set.

    Counts, per (cell, label) node, the same-label nodes among the 62
    lexicographically-positive probe offsets with any representative pair
    within `radius` — exactly the edges that survive ops/hash_ccl.py's
    distance check and land in the propagation table.  This is the quantity
    that sizes `hash_max_degree`: the candidate count (`_hash_occupancy`)
    bounds the PRE-distance-check probe width, but most candidates fail the
    distance check (round-5 measurement on the real bench cloud: max 48
    candidates vs max 18 connected), so sizing the propagation table from
    candidates left its per-iteration wide gather ~2.6x oversized — and the
    propagation loop is the CCL pole at honest shapes (PERF.md round 5).
    """
    if len(xyz) == 0:
        return 0
    s = radius / np.sqrt(3.0)
    cell = np.floor((xyz - xyz.min(0) + s) / s).astype(np.int64)
    key = ((cell[:, 0] << 34) + (cell[:, 1] << 17) + cell[:, 2]) * 16 + labels
    order = np.argsort(key, kind="stable")
    sk = key[order]
    uniq, start = np.unique(sk, return_index=True)
    n_nodes = len(uniq)
    counts = np.diff(np.append(start, len(sk)))
    rep = np.zeros((n_nodes, reps, 3), np.float64)
    rep_ok = np.zeros((n_nodes, reps), bool)
    for j in range(reps):
        has = counts > j
        rep[has, j] = xyz[order[start[has] + j]]
        rep_ok[has, j] = True
    lab = uniq % 16
    ck = uniq // 16
    cz, cy, cx = ck & 0x1FFFF, (ck >> 17) & 0x1FFFF, ck >> 34
    deg = np.zeros(n_nodes, np.int64)
    r2 = radius * radius
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            for dz in range(-2, 3):
                if (dx, dy, dz) <= (0, 0, 0):
                    continue
                tk = (((cx + dx) << 34) + ((cy + dy) << 17) + (cz + dz)) * 16 + lab
                pos = np.clip(np.searchsorted(uniq, tk), 0, n_nodes - 1)
                hit = uniq[pos] == tk
                src = np.nonzero(hit)[0]
                if len(src) == 0:
                    continue
                dst = pos[src]
                d2 = ((rep[src][:, :, None, :] - rep[dst][:, None, :, :]) ** 2).sum(-1)
                ok = rep_ok[src][:, :, None] & rep_ok[dst][:, None, :]
                deg[src] += (ok & (d2 <= r2)).any(axis=(1, 2))
    return int(deg.max(initial=0))


def _hash_components(
    xyz: np.ndarray,
    labels: np.ndarray,
    radius: float,
    reps: int = 8,
    min_points: int = 5,
) -> int:
    """Number of LIVE proposals one clustered point set yields: connected
    components of the (cell, label) node graph (same edge semantics as
    ops/hash_ccl.py, via `reps` representatives) whose total member-point
    count is >= `min_points` (models/grouping.py min_num_points_per_proposal
    filter).  Sizes the dense proposal-grid pool
    (GAPartNetConfig.dense_grid_capacity): the Score/NPCS UNets convolve
    every pool slot, so a pool sized to the static cap instead of the live
    count multiplies their cost for nothing."""
    if len(xyz) == 0:
        return 0
    s = radius / np.sqrt(3.0)
    cell = np.floor((xyz - xyz.min(0) + s) / s).astype(np.int64)
    key = ((cell[:, 0] << 34) + (cell[:, 1] << 17) + cell[:, 2]) * 16 + labels
    order = np.argsort(key, kind="stable")
    sk = key[order]
    uniq, start = np.unique(sk, return_index=True)
    n_nodes = len(uniq)
    counts = np.diff(np.append(start, len(sk)))
    rep = np.zeros((n_nodes, reps, 3), np.float64)
    rep_ok = np.zeros((n_nodes, reps), bool)
    for j in range(reps):
        has = counts > j
        rep[has, j] = xyz[order[start[has] + j]]
        rep_ok[has, j] = True
    lab = uniq % 16
    ck = uniq // 16
    cz, cy, cx = ck & 0x1FFFF, (ck >> 17) & 0x1FFFF, ck >> 34
    parent = np.arange(n_nodes)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    r2 = radius * radius
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            for dz in range(-2, 3):
                if (dx, dy, dz) <= (0, 0, 0):
                    continue
                tk = (((cx + dx) << 34) + ((cy + dy) << 17) + (cz + dz)) * 16 + lab
                pos = np.clip(np.searchsorted(uniq, tk), 0, n_nodes - 1)
                hit = uniq[pos] == tk
                src = np.nonzero(hit)[0]
                if len(src) == 0:
                    continue
                dst = pos[src]
                d2 = ((rep[src][:, :, None, :] - rep[dst][:, None, :, :]) ** 2).sum(-1)
                ok = rep_ok[src][:, :, None] & rep_ok[dst][:, None, :]
                conn = (ok & (d2 <= r2)).any(axis=(1, 2))
                for a, b in zip(src[conn], dst[conn]):
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(n_nodes)])
    comp_points = np.zeros(n_nodes, np.int64)
    np.add.at(comp_points, roots, counts)
    return int((comp_points[np.unique(roots)] >= min_points).sum())


def scan_hash_capacities(
    datasets: Iterable,
    radius: float,
    *,
    node_headroom: float = 1.3,
    cand_margin: int = 8,
    degree_margin: int = 6,
    round_to: int = 256,
    max_samples: int = 48,
    max_points: int = 20000,
) -> Tuple[int, int, int]:
    """Size the hash-CCL clustering tables from the data.

    Returns (hash_node_capacity PER SET, cand cap, max_degree):

    * node capacity: max measured (cell, label) node count over samples
      (GT labels) x `node_headroom` for label-noise fragmentation at the
      trained-model operating point, clamped to the foreground point count
      (nodes can never outnumber clustered points).  Each set gets its own
      cap inside hash_connected_components, so a large xyz set can never
      starve the offset-shifted set; overflow stays loudly counted either
      way (counters/ccl_node_overflow, asserted under GAPARTNET_CHECKS).
      Probe/edge/propagation costs scale ~linearly with the cap (measured
      0.06 ms/node at B8 on v5e), which is why this is sized from occupancy
      rather than set to the worst-case 2N bound.
    * cand cap: max same-label candidates over the 62 positive probe
      offsets, measured with GT labels (the upper bound: label noise only
      fragments same-label neighborhoods) + `cand_margin`, clamped to 62.
    * max_degree: max forward-CONNECTED degree (candidates that also pass
      the representative distance check) + `degree_margin`, clamped to the
      cand cap.  Measured over BOTH clustering sets — raw xyz and the
      offset-shifted set xyz + (instance center - xyz), the densest
      geometry the trained offset head can produce (model.py:263-278
      dual-set semantics) — because the shifted set compresses instances
      toward their centers.  Sizing the propagation table from connected
      degree instead of candidate count halves its per-iteration gather at
      real occupancies; any overshoot at run time still lands in the
      ccl_cand_truncated counter (asserted zero under GAPARTNET_CHECKS),
      so this stays an honest capacity, not a silent cap.
    """
    max_fg = 0
    max_nodes = 0
    max_cand = 0
    max_deg = 0
    for ds in datasets:
        if ds is None or len(ds) == 0:
            continue
        idxs = np.unique(
            np.linspace(0, len(ds) - 1, min(len(ds), max_samples)).astype(int)
        )
        for i in idxs:
            item = ds[int(i)]
            mask = item["point_mask"]
            sem = item["sem_labels"][mask]
            xyz = item["points"][mask][:, :3].astype(np.float64)
            fg = sem > 0
            max_fg = max(max_fg, int(fg.sum()))
            n_nodes, cmax = _hash_occupancy(xyz[fg], sem[fg], radius)
            max_nodes = max(max_nodes, n_nodes)
            max_cand = max(max_cand, cmax)
            max_deg = max(
                max_deg, _hash_connected_degree(xyz[fg], sem[fg], radius)
            )
            if "instance_regions" in item:
                shifted = item["instance_regions"][mask][:, :3].astype(np.float64)
                has_inst = item["instance_labels"][mask] >= 0
                shifted = np.where(has_inst[:, None], shifted, xyz)
                max_deg = max(
                    max_deg,
                    _hash_connected_degree(shifted[fg], sem[fg], radius),
                )
    node_cap = int(np.ceil(min(max_nodes * node_headroom, max_fg) / round_to))
    node_cap = min(max(node_cap * round_to, 256), max_points)
    cand_cap = min(max_cand + cand_margin, 62)
    cand_cap = ((cand_cap + 3) // 4) * 4  # hash_ccl chunks offsets in fours
    # the probe has exactly 62 positive offsets, so the largest usable
    # chunked cap is 60 — rounding 62 UP to 64 overran the probe arrays
    cand_cap = min(cand_cap, 60)
    degree = ((max_deg + degree_margin + 3) // 4) * 4
    degree = min(max(degree, 8), cand_cap)
    return node_cap, cand_cap, degree
