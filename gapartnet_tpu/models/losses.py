"""Loss functions and segmentation metrics.

Transcribed semantics from the reference (gapartnet/network/losses.py and the
NPCS loss in grouping_utils.py:14-43 / model.py:398-462), re-expressed with
masks over fixed shapes.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from gapartnet_tpu.constants import MAX_SYMMETRY_ORBIT, SYMMETRY_ORBITS
from gapartnet_tpu.ops.segment import segment_count, segment_sum


def focal_loss(
    logits: jnp.ndarray,      # (M, C)
    targets: jnp.ndarray,     # (M,) int
    mask: jnp.ndarray,        # (M,) bool
    gamma: float = 2.0,
    ignore_index: int = -100,
    alpha=None,               # optional (C,) per-class weights
) -> jnp.ndarray:
    """Multi-class focal loss, mean over valid targets (losses.py:35-64).

    `alpha` matches the reference exactly: losses.py:38,53-55 passes it as
    the `weight` of a reduction="none" nll_loss, so it scales each sample's
    CE by alpha[target] while the final .mean() denominator stays the plain
    valid count (NOT the weighted count torch would use under
    reduction="mean").  The reference config ships alpha=None; nonzero
    weights are used by the few-shot artifact runs (tools/sustained_run.py)
    where the 90%-background class imbalance otherwise traps the sem head
    in the all-background valley.
    """
    valid = mask & (targets != ignore_index)
    t = jnp.clip(targets, 0, logits.shape[-1] - 1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    log_p_t = jnp.take_along_axis(log_p, t[:, None], axis=-1)[:, 0]
    ce = -log_p_t
    if alpha is not None:
        ce = ce * jnp.asarray(alpha, logits.dtype)[t]
    loss = ce * (1.0 - jnp.exp(log_p_t)) ** gamma
    loss = jnp.where(valid, loss, 0.0)
    cnt = jnp.maximum(valid.sum(), 1)
    return loss.sum() / cnt


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
) -> jnp.ndarray:
    """RetinaNet-style sigmoid focal loss (losses.py:67-107; exported by the

    reference but unused in the shipped pipeline)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    loss = jnp.where(mask, loss, 0.0)
    if reduction == "mean":
        return loss.sum() / jnp.maximum(mask.sum(), 1)
    if reduction == "sum":
        return loss.sum()
    return loss


def dice_loss(
    logits: jnp.ndarray,   # (M, C)
    targets: jnp.ndarray,  # (M,) int (assumed >= 0 on valid points)
    mask: jnp.ndarray,     # (M,) bool
    eps: float = 1e-8,
    one_hot_eps: float = 1e-6,
) -> jnp.ndarray:
    """Reference dice loss (losses.py:110-158): called with (N, C, 1, 1)

    inputs, so the reduction dims collapse to per-point terms:
      dice_p = 2 * sum_c softmax_c * (onehot_c + 1e-6) / sum_c(softmax_c + onehot_c + 1e-6)
      loss = mean_p (1 - dice_p)
    """
    c = logits.shape[-1]
    p = jax.nn.softmax(logits, axis=-1)
    t = jnp.clip(targets, 0, c - 1)
    onehot = jax.nn.one_hot(t, c, dtype=logits.dtype) + one_hot_eps
    inter = jnp.sum(p * onehot, axis=-1)
    card = jnp.sum(p + onehot, axis=-1)
    dice = 2.0 * inter / (card + eps)
    per_point = jnp.where(mask, 1.0 - dice, 0.0)
    cnt = jnp.maximum(mask.sum(), 1)
    return per_point.sum() / cnt


def offset_loss(
    offsets: jnp.ndarray,     # (M, 3) predictions
    gt_offsets: jnp.ndarray,  # (M, 3)
    valid: jnp.ndarray,       # (M,) bool  (sem>0 & instance>=0 & point_mask)
):
    """L1-distance + cosine-direction losses (model.py:204-226)."""
    cnt = jnp.maximum(valid.sum(), 1)
    dist = jnp.sum(jnp.abs(offsets - gt_offsets), axis=-1)
    loss_dist = jnp.where(valid, dist, 0.0).sum() / cnt

    # guarded norms: jnp.linalg.norm has a NaN gradient at 0 (torch's
    # subgradient there is 0); max() zeroes the gradient below the guard
    gt_norm = jnp.sqrt(jnp.maximum(jnp.sum(gt_offsets**2, axis=-1), 1e-16))
    gt_dir = gt_offsets / (gt_norm[:, None] + 1e-8)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(offsets**2, axis=-1), 1e-16))
    pred_dir = offsets / (norm[:, None] + 1e-8)
    dir_diff = -jnp.sum(gt_dir * pred_dir, axis=-1)
    loss_dir = jnp.where(valid, dir_diff, 0.0).sum() / cnt
    return loss_dist, loss_dir


def sigmoid_bce(logits, targets, mask):
    """binary_cross_entropy_with_logits, mean over valid (model.py:385)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    cnt = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, loss, 0.0).sum() / cnt


def get_gt_scores(ious, fg_thresh: float = 0.75, bg_thresh: float = 0.25):
    """Soft score targets from max-IoU (grouping_utils.py:144-156)."""
    fg = ious > fg_thresh
    bg = ious < bg_thresh
    k = 1.0 / (fg_thresh - bg_thresh)
    b = bg_thresh / (bg_thresh - fg_thresh)
    mid = ious * k + b
    return jnp.where(fg, 1.0, jnp.where(bg, 0.0, mid))


def npcs_loss(
    npcs_preds: jnp.ndarray,      # (E, 3) selected-class NPCS predictions
    gt_npcs: jnp.ndarray,         # (E, 3)
    sym_types: jnp.ndarray,       # (E,) int in [0, 5): symmetry type per entry
    proposal_ids: jnp.ndarray,    # (E,) int, -1 / masked ignored
    entry_mask: jnp.ndarray,      # (E,) bool
    num_proposals: int,
):
    """Symmetry-aware NPCS loss (grouping_utils.py:14-43, model.py:423-462).

    Per point: squared distance to the best orbit image of the GT NPCS,
    smooth-L1-like:  d2 <= 0.01 ? 5*d2 : sqrt(d2) - 0.05.  The reference
    partitions ENTRIES by each point's symmetry group (types {0,1,2} / {3} /
    {4} from the point's predicted class), segment-means within each
    (proposal, group) run, takes min over the orbit columns, means over the
    group's segments, and sums the three group terms — so a mixed-class
    proposal contributes one segment per group it touches.  Orbits are padded
    to MAX_SYMMETRY_ORBIT with their first element (the identity, also every
    orbit's column 0), so padded columns replicate column 0's segment mean
    and leave the min unchanged even in type-mixed group-1 segments.
    """
    orbits = jnp.asarray(SYMMETRY_ORBITS)  # (5, M, 3, 3)
    morb = orbits.shape[1]
    # d2[e, m] = |q_e - gt_e @ R_m|^2 with q = preds - 0.5.  Orbit matrices
    # are orthogonal (norm-preserving), so this expands to
    # |q|^2 + |gt|^2 - 2 * (gt (x) q) . vec(R): ONE (E, 9) @ (9, 5M) MXU
    # matmul against the flattened orbit bank + a per-entry type select.
    # (The direct form gathers a per-entry (M, 3, 3) matrix tensor whose
    # trailing (3, 3) dims tile-pad 7x on TPU — 3.7 GB at train batch 16.)
    q = npcs_preds - 0.5
    outer = (gt_npcs[:, :, None] * q[:, None, :]).reshape(-1, 9)   # (E, 9)
    bank = orbits.reshape(5 * morb, 9)
    t_all = jax.lax.dot_general(
        outer, bank,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                              # (E, 5M)
    norms = jnp.sum(q * q, axis=-1) + jnp.sum(gt_npcs * gt_npcs, axis=-1)
    d2_all = norms[:, None] - 2.0 * t_all
    d2 = jnp.take_along_axis(
        d2_all.reshape(-1, 5, morb),
        jnp.clip(sym_types, 0, 4)[:, None, None], axis=1,
    )[:, 0]                                                        # (E, M)
    d2 = jnp.maximum(d2, 0.0)  # guard float cancellation near zero
    per_point = jnp.where(d2 <= 0.01, 5.0 * d2, jnp.sqrt(jnp.maximum(d2, 1e-12)) - 0.05)

    ok = entry_mask & (proposal_ids >= 0)
    # (proposal, group) segment id; group 0 for types {0,1,2}, 1 {3}, 2 {4}
    group = jnp.where(sym_types < 3, 0, jnp.where(sym_types == 3, 1, 2))
    seg = proposal_ids * 3 + group
    num_segs = num_proposals * 3
    total = segment_sum(per_point, seg, num_segs, mask=ok)  # (P*3, M)
    count = segment_count(seg, num_segs, mask=ok)
    per_seg = total / jnp.maximum(count, 1)[:, None].astype(per_point.dtype)
    per_seg_min = jnp.min(per_seg, axis=-1)  # (P*3,)

    has_points = count > 0
    seg_group = jnp.arange(num_segs, dtype=jnp.int32) % 3
    loss = jnp.float32(0.0)
    for g in range(3):
        sel = has_points & (seg_group == g)
        cnt = jnp.maximum(sel.sum(), 1)
        loss = loss + jnp.where(sel, per_seg_min, 0.0).sum() / cnt
    return loss


def pixel_accuracy(preds, labels, mask):
    cnt = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, (preds == labels), False).sum() / cnt


def mean_iou(preds, labels, mask, num_classes: int):
    """mIoU over classes, matching kornia.metrics.mean_iou semantics as used

    by the reference (losses.py:22-32): confusion over valid (label >= 0)
    elements.  Deviation: classes absent from both prediction and label get
    IoU 1.0 here, where kornia produces 0/0 = NaN (which would poison the
    reference's mean on degenerate batches; on full eval splits all classes
    appear and the two agree).
    """
    valid = mask & (labels >= 0)
    l = jnp.clip(labels, 0, num_classes - 1)
    p = jnp.clip(preds, 0, num_classes - 1)
    fused = l * num_classes + p
    conf = segment_sum(
        jnp.ones_like(fused, dtype=jnp.float32).reshape(-1),
        fused.reshape(-1),
        num_classes * num_classes,
        mask=valid.reshape(-1),
    ).reshape(num_classes, num_classes)
    tp = jnp.diag(conf)
    total = conf.sum(0) + conf.sum(1) - tp
    iou = jnp.where(total > 0, tp / jnp.maximum(total, 1e-8), 1.0)
    return iou.mean()
