"""Loss semantics vs torch transcriptions of the reference formulas

(gapartnet/network/losses.py:35-158, grouping_utils.py:14-43,144-156)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gapartnet_tpu.models import losses as L


def torch_focal(logits, targets, gamma=2.0, ignore_index=-100):
    t = torch.as_tensor(targets, dtype=torch.int64)
    x = torch.as_tensor(logits)
    valid = t != ignore_index
    t, x = t[valid], x[valid]
    log_p = F.log_softmax(x, dim=-1)
    ce = F.nll_loss(log_p, t, reduction="none")
    log_p_t = log_p.gather(1, t[:, None]).squeeze(-1)
    loss = ce * ((1 - log_p_t.exp()) ** gamma)
    return float(loss.mean())


def torch_dice(logits, targets, eps=1e-8):
    x = torch.as_tensor(logits)[:, :, None, None]
    t = torch.as_tensor(targets, dtype=torch.int64)[:, None, None]
    p = F.softmax(x, dim=1)
    onehot = torch.zeros_like(p).scatter_(1, t.unsqueeze(1), 1.0) + 1e-6
    dims = (1, 2, 3)
    inter = torch.sum(p * onehot, dims)
    card = torch.sum(p + onehot, dims)
    dice = 2.0 * inter / (card + eps)
    return float(torch.mean(-dice + 1.0))


def test_focal_loss_matches_torch(rng):
    logits = rng.randn(100, 10).astype(np.float32)
    targets = rng.randint(0, 10, 100).astype(np.int32)
    targets[::7] = -100
    got = float(
        L.focal_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.ones(100, bool))
    )
    want = torch_focal(logits, targets)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_loss_matches_torch(rng):
    logits = rng.randn(64, 10).astype(np.float32)
    targets = rng.randint(0, 10, 64).astype(np.int32)
    got = float(
        L.dice_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.ones(64, bool))
    )
    want = torch_dice(logits, targets)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gt_scores_ramp():
    ious = jnp.asarray([0.1, 0.25, 0.5, 0.75, 0.9])
    got = np.asarray(L.get_gt_scores(ious, 0.75, 0.25))
    np.testing.assert_allclose(got, [0.0, 0.0, 0.5, 0.75 * 2 - 0.5, 1.0], atol=1e-6)


def test_offset_loss_matches_reference_formula(rng):
    offsets = rng.randn(50, 3).astype(np.float32)
    gt = rng.randn(50, 3).astype(np.float32)
    valid = rng.rand(50) > 0.3
    dist, direc = L.offset_loss(
        jnp.asarray(offsets), jnp.asarray(gt), jnp.asarray(valid)
    )
    o, g = torch.as_tensor(offsets)[valid], torch.as_tensor(gt)[valid]
    want_dist = float((o - g).abs().sum(-1).mean())
    gn = g / (g.norm(dim=-1, keepdim=True) + 1e-8)
    on = o / (o.norm(dim=-1, keepdim=True) + 1e-8)
    want_dir = float((-(gn * on).sum(-1)).mean())
    np.testing.assert_allclose(float(dist), want_dist, rtol=1e-5)
    np.testing.assert_allclose(float(direc), want_dir, rtol=1e-4)


def test_npcs_loss_symmetry_invariance(rng):
    """Rotating the GT NPCS of a z-symmetric class by a multiple of pi/6 must

    not change the loss (the min over the orbit finds the aligned image)."""
    n = 40
    preds = (rng.rand(n, 3).astype(np.float32) - 0.5) + 0.5
    gt = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.4
    # class 3 (slider_button) has symmetry type 3: 12 z-rotations
    sym_types = np.full(n, 3, np.int32)
    pids = np.zeros(n, np.int32)
    mask = np.ones(n, bool)

    base = float(
        L.npcs_loss(
            jnp.asarray(preds), jnp.asarray(gt), jnp.asarray(sym_types),
            jnp.asarray(pids), jnp.asarray(mask), 4,
        )
    )
    th = np.pi / 3
    rot = np.array(
        [[np.cos(th), np.sin(th), 0], [-np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    rotated = gt @ rot
    rot_loss = float(
        L.npcs_loss(
            jnp.asarray(preds), jnp.asarray(rotated), jnp.asarray(sym_types),
            jnp.asarray(pids), jnp.asarray(mask), 4,
        )
    )
    np.testing.assert_allclose(base, rot_loss, rtol=1e-4)


def torch_npcs_loss(preds, gt, sym_types, pids):
    """Transcription of the reference loss_proposal_npcs + compute_npcs_loss

    (model.py:423-460, grouping_utils.py:14-43): entries partitioned by each
    POINT's symmetry group, unique_consecutive segments within the group
    subset, segment mean -> orbit min -> mean over segments, groups summed."""
    from gapartnet_tpu.constants import SYMMETRY_ORBIT_SIZES, SYMMETRY_ORBITS

    preds = torch.as_tensor(preds)
    gt = torch.as_tensor(gt)
    sym_types = torch.as_tensor(sym_types, dtype=torch.int64)
    pids = torch.as_tensor(pids, dtype=torch.int64)
    total = 0.0
    for g, types in ((0, (0, 1, 2)), (1, (3,)), (2, (4,))):
        gm = torch.isin(sym_types, torch.as_tensor(types))
        if not bool(gm.any()):
            continue
        p, q, st, pi = preds[gm], gt[gm], sym_types[gm], pids[gm]
        m = max(SYMMETRY_ORBIT_SIZES[t] for t in types)
        mats = torch.as_tensor(np.asarray(SYMMETRY_ORBITS))[st][:, :m]  # (n,m,3,3)
        gt_orbit = (q[:, None, None, :] @ mats).squeeze(2)
        d2 = ((p[:, None, :] - gt_orbit - 0.5) ** 2).sum(-1)
        loss = torch.where(d2 <= 0.01, 5 * d2, d2.sqrt() - 0.05)
        _, counts = torch.unique_consecutive(pi, return_counts=True)
        seg = torch.segment_reduce(loss, "mean", lengths=counts)
        total += float(seg.min(dim=-1).values.mean())
    return total


def test_npcs_loss_mixed_class_proposals_vs_torch(rng):
    """A proposal whose points span symmetry groups must contribute one

    segment per group it touches (the reference's entry-level partition)."""
    n, num_props = 60, 5
    preds = rng.rand(n, 3).astype(np.float32)
    gt = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.4
    # sorted proposal ids with mixed symmetry types inside each proposal
    pids = np.sort(rng.randint(0, num_props, n)).astype(np.int32)
    sym_types = rng.randint(0, 5, n).astype(np.int32)
    mask = np.ones(n, bool)

    got = float(
        L.npcs_loss(
            jnp.asarray(preds), jnp.asarray(gt), jnp.asarray(sym_types),
            jnp.asarray(pids), jnp.asarray(mask), num_props,
        )
    )
    want = torch_npcs_loss(preds, gt, sym_types, pids)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mean_iou_perfect_and_mixed(rng):
    preds = np.array([0, 1, 1, 2])
    labels = np.array([0, 1, 1, 2])
    got = float(
        L.mean_iou(jnp.asarray(preds), jnp.asarray(labels), jnp.ones(4, bool), 3)
    )
    np.testing.assert_allclose(got, 1.0, atol=1e-6)
    labels2 = np.array([0, 1, 2, 2])
    got2 = float(
        L.mean_iou(jnp.asarray(preds), jnp.asarray(labels2), jnp.ones(4, bool), 3)
    )
    # class0: 1/1; class1: 1/2; class2: 1/2 -> mean 2/3
    np.testing.assert_allclose(got2, 2 / 3, atol=1e-6)


def test_focal_loss_alpha_matches_torch(rng):
    """alpha semantics == reference losses.py:53-55: nll_loss weight scales
    each sample's CE, but the final .mean() denominator stays the plain
    valid count (reduction='none' then .mean())."""
    import jax.numpy as jnp

    from gapartnet_tpu.models.losses import focal_loss

    m, c = 200, 10
    logits = rng.randn(m, c).astype("float32")
    targets = rng.randint(0, c, size=m)
    targets[rng.rand(m) < 0.1] = -100
    alpha = (rng.rand(c).astype("float32") + 0.1)

    t = torch.as_tensor(targets, dtype=torch.int64)
    x = torch.as_tensor(logits)
    valid = t != -100
    tv, xv = t[valid], x[valid]
    log_p = F.log_softmax(xv, dim=-1)
    ce = F.nll_loss(log_p, tv, weight=torch.as_tensor(alpha), reduction="none")
    log_p_t = log_p.gather(1, tv[:, None]).squeeze(-1)
    want = float((ce * (1 - log_p_t.exp()) ** 2.0).mean())

    got = float(focal_loss(
        jnp.asarray(logits), jnp.asarray(targets),
        jnp.ones((m,), bool), gamma=2.0, alpha=tuple(alpha.tolist()),
    ))
    assert abs(got - want) < 1e-5
