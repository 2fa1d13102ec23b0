"""NumPy oracles transcribing the reference CUDA-op semantics.

Each oracle is a direct, slow, obviously-correct NumPy implementation of the
behavior documented in SURVEY.md section 2.4, used to validate the fixed-shape
TPU ops.  (These are test-only; nothing here runs in the framework.)
"""

import numpy as np


def voxelize_oracle(pt_xyz, pt_features, voxel_size, range_min, range_max):
    """epic_ops.voxelize semantics: dedup into voxels, mean features,

    point->voxel map; voxels emitted in ascending packed-key order (x major).
    """
    coords = np.floor((pt_xyz - range_min) / voxel_size).astype(np.int64)
    valid = np.all((pt_xyz >= range_min) & (pt_xyz <= range_max), axis=-1)
    keys = coords[:, 0] * (1 << 20) + coords[:, 1] * (1 << 10) + coords[:, 2]
    uniq = np.unique(keys[valid])
    key_to_vox = {k: i for i, k in enumerate(uniq)}
    pc_voxel_id = np.array(
        [key_to_vox[k] if v else -1 for k, v in zip(keys, valid)], dtype=np.int32
    )
    feats = np.zeros((len(uniq), pt_features.shape[1]), dtype=np.float64)
    counts = np.zeros(len(uniq), dtype=np.int64)
    for i, vid in enumerate(pc_voxel_id):
        if vid >= 0:
            feats[vid] += pt_features[i]
            counts[vid] += 1
    feats = feats / counts[:, None]
    coords_out = np.stack(
        [uniq >> 20, (uniq >> 10) & 1023, uniq & 1023], axis=-1
    ).astype(np.int32)
    return feats.astype(np.float32), coords_out, pc_voxel_id


def ball_query_oracle(points, queries, labels, query_labels, radius, max_pts):
    """epic_ops.ball_query semantics (label-constrained, first-K in index order,

    reference grouping_utils.py:119-128): for each query, the first max_pts
    points (by index) within radius that share the query's label.
    Returns (num_queries, max_pts) indices (-1 pad) and counts.
    """
    nq = queries.shape[0]
    idx = np.full((nq, max_pts), -1, dtype=np.int32)
    counts = np.zeros(nq, dtype=np.int32)
    r2 = radius * radius
    for q in range(nq):
        c = 0
        for j in range(points.shape[0]):
            if labels[j] != query_labels[q]:
                continue
            d = queries[q] - points[j]
            if (d * d).sum() <= r2:
                if c < max_pts:
                    idx[q, c] = j
                    c += 1
                else:
                    break
        counts[q] = c
    return idx, counts


def ccl_oracle(neighbor_idx):
    """Connected components over the (symmetrized) ball-query graph

    (epic_ops.ccl semantics, reference grouping_utils.py:130-137).  Returns the
    min point index of each node's component (isolated nodes label themselves).
    neighbor_idx: (N, K) with -1 padding; row i lists i's out-neighbors.
    """
    n = neighbor_idx.shape[0]
    adj = [[] for _ in range(n)]
    for i in range(n):
        for j in neighbor_idx[i]:
            if j >= 0:
                adj[i].append(int(j))
                adj[int(j)].append(i)
    labels = np.full(n, -1, dtype=np.int64)
    for s in range(n):
        if labels[s] >= 0:
            continue
        stack, comp = [s], [s]
        labels[s] = s
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if labels[v] < 0:
                    labels[v] = s
                    stack.append(v)
                    comp.append(v)
        m = min(comp)
        for u in comp:
            labels[u] = m
    return labels


def nms_oracle(ious, scores, threshold):
    """epic_ops.nms semantics (reference grouping_utils.py:221-246): greedy keep

    by descending score, suppress proposals with IoU > threshold vs a kept one.
    """
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(scores), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and ious[i, j] > threshold:
                suppressed[j] = True
    return np.array(keep, dtype=np.int32)


def instance_iou_oracle(point_proposal, point_instance, num_points_per_instance):
    """epic_ops.iou.batch_instance_seg_iou semantics for ONE sample

    (reference model.py:373-378): IoU of each proposal point-set vs each GT
    instance point-set.
    point_proposal: (M,) proposal id per entry (>=0)
    point_instance: (M,) instance label per entry (-100 = none)
    """
    num_p = point_proposal.max() + 1 if len(point_proposal) else 0
    num_i = len(num_points_per_instance)
    inter = np.zeros((num_p, num_i), dtype=np.int64)
    prop_size = np.zeros(num_p, dtype=np.int64)
    for p, ins in zip(point_proposal, point_instance):
        prop_size[p] += 1
        if ins >= 0:
            inter[p, ins] += 1
    union = prop_size[:, None] + np.asarray(num_points_per_instance)[None, :] - inter
    return inter / np.maximum(union, 1)


def fps_oracle(points, num_samples, start_idx=0):
    """pointnet2 furthest_point_sampling semantics

    (reference pointnet_lib sampling_gpu.cu:93-253): greedy max-min distance,
    seeded at index start_idx (CUDA uses 0).
    """
    n = points.shape[0]
    dists = np.full(n, np.inf)
    out = np.zeros(num_samples, dtype=np.int32)
    out[0] = start_idx
    last = start_idx
    for i in range(1, num_samples):
        d = ((points - points[last]) ** 2).sum(-1)
        dists = np.minimum(dists, d)
        last = int(np.argmax(dists))
        out[i] = last
    return out


def umeyama_oracle(source, target):
    """misc/pose_fitting.py:4-39 semantics: similarity transform source->target

    with SVD sign fix and scale = sum(D)/var(source).
    """
    n = source.shape[0]
    sc = source.mean(0)
    tc = target.mean(0)
    cov = (target - tc).T @ (source - sc) / n
    U, D, Vh = np.linalg.svd(cov)
    d = (np.linalg.det(U) * np.linalg.det(Vh)) < 0.0
    if d:
        D[-1] = -D[-1]
        U[:, -1] = -U[:, -1]
    var = source.var(0).sum()
    scale = D.sum() / var
    rotation = (U @ Vh).T
    translation = tc - sc @ (scale * rotation)
    return scale, rotation, translation
