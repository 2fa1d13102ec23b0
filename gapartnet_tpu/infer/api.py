"""Single-object inference API.

TPU re-architecture of the reference application layer (structure/utils.py:118-192
`_inference_perception_model`, structure/gapartnet.py:466-705 `ObjIns` pipeline):
RGB-D back-projection, FPS downsampling + ball-space normalization, the full
perception forward, NPCS scatter back to the full cloud, and per-proposal
RANSAC/Umeyama 9-DoF bounding boxes.

Host-side Python loops of the reference (per-pixel back-projection, per-proposal
CPU RANSAC) are vectorized / vmapped onto the device.
"""

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
from gapartnet_tpu.ops.fps import furthest_point_sampling_single
from gapartnet_tpu.ops.umeyama import ransac_pose_from_npcs
from gapartnet_tpu.structures import PointCloudBatch

NPCS_BACKGROUND = 230.0 / 255.0  # reference fill (structure/utils.py:155)


def backproject_depth(
    depth: np.ndarray,
    K: np.ndarray,
    rgb: Optional[np.ndarray] = None,
    flip_yz: bool = False,
):
    """Depth map -> camera-frame point cloud (vectorizes the reference's

    per-pixel loop, structure/gapartnet.py:557-586).  Zero-depth pixels are
    dropped.  Returns (xyz (M,3), rgb (M,3) in [0,1] or None, pixel (M,2) yx).
    """
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w]
    z = depth.astype(np.float64)
    x = (xs - K[0, 2]) * z / K[0, 0]
    y = (ys - K[1, 2]) * z / K[1, 1]
    xyz = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (depth != 0).reshape(-1)
    xyz = xyz[valid]
    if flip_yz:  # mode==2 in the reference
        xyz[:, 1] = -xyz[:, 1]
        xyz[:, 2] = -xyz[:, 2]
    pix = np.stack([ys, xs], axis=-1).reshape(-1, 2)[valid]
    colors = None
    if rgb is not None:
        colors = (rgb.reshape(-1, rgb.shape[-1])[valid] / 255.0)[:, ::-1]
    return xyz.astype(np.float32), colors, pix


def ball_space_normalize(xyz: np.ndarray):
    """WorldSpaceToBallSpace: center at mean, scale by max radius.

    Returns (normalized xyz, trans = [max_radius, cx, cy, cz]) matching the
    dataset converter (convert_rendered_into_input.py:79-87)."""
    center = xyz.mean(0)
    centered = xyz - center
    max_radius = np.linalg.norm(centered, axis=1).max()
    return (centered / max_radius).astype(np.float32), np.array(
        [max_radius, *center], np.float32
    )


def fps_downsample(
    xyz: np.ndarray,
    num_samples: int = 20000,
    pre_cap_factor: int = 4,
    seed: int = 0,
):
    """Random pre-crop to 4*n then FPS to n (structure/gapartnet.py:588-615).

    Returns indices into the input array."""
    n = xyz.shape[0]
    if n <= num_samples:
        return np.arange(n)
    rng = np.random.RandomState(seed)
    if n > pre_cap_factor * num_samples:
        pre = rng.choice(n, pre_cap_factor * num_samples, replace=False)
    else:
        pre = np.arange(n)
    idx = np.asarray(
        furthest_point_sampling_single(jnp.asarray(xyz[pre]), num_samples)
    )
    return pre[idx]


@dataclasses.dataclass
class InferenceResult:
    """Per-object outputs (reference Result, structure/instances.py:38-44,

    plus bboxes as in tools/visu.py / demo.ipynb)."""

    sem_preds: np.ndarray          # (N,) part class per point
    ins_preds: np.ndarray          # (N,) instance id per point (0 = none)
    npcs_map: np.ndarray           # (N, 3), background = 230/255
    proposal_scores: np.ndarray    # (P,)
    proposal_classes: np.ndarray   # (P,)
    bboxes: List[np.ndarray]       # per kept proposal: (8, 3) corners


class GAPartNetInference:
    """Loads a trained model and runs single-object inference.

    Replaces _load_perception_model + _inference_perception_model
    (structure/utils.py:118-192, 324-343): eval mode, schedule [0,0]
    (all stages on), no gradient.
    """

    def __init__(
        self,
        cfg: Optional[GAPartNetConfig] = None,
        ckpt_path: Optional[str] = None,
        variables=None,
        seed: int = 0,
        auto_capacity: bool = False,
    ):
        # auto_capacity: size the per-level voxel capacities from the first
        # input cloud instead of the synthetic-tuned divisor schedule (real
        # surfaces overflow it at the mid levels; data/capacity.py).  Params
        # are capacity-independent, so graphs rebuild but weights carry over;
        # capacities only ever grow afterwards (recompiles are bounded by the
        # 1024-bucket rounding).
        self.auto_capacity = auto_capacity
        self._capacity_fitted = False
        self.cfg = cfg or GAPartNetConfig()
        self.model = GAPartNet(self.cfg)
        if variables is None:
            if ckpt_path:
                from gapartnet_tpu.train.trainer import CkptManager

                restored = CkptManager.restore(ckpt_path)
                variables = {
                    "params": restored["params"],
                    "batch_stats": restored.get("batch_stats", {}),
                }
            else:
                # fresh init (useful for tests / benchmarking); jitted — an
                # eager init is pathologically slow on remote devices
                dummy = self._wrap_points(
                    np.zeros((self.cfg.max_points, 6), np.float32)
                )

                def _init(b):
                    return self.model.init(
                        {
                            "params": jax.random.PRNGKey(seed),
                            "proposal_jitter": jax.random.PRNGKey(seed + 1),
                        },
                        b, train=False, do_cluster=True, do_score=True,
                        do_npcs=True,
                    )

                variables = jax.jit(_init)(dummy)
        self.variables = variables
        self._build_graphs()

    def _build_graphs(self):
        self._forward = jax.jit(
            lambda b: self.model.apply(
                self.variables, b, train=False,
                do_cluster=True, do_score=True, do_npcs=True,
            )
        )
        from gapartnet_tpu.eval.ap import select_eval_proposals

        self._select = jax.jit(
            lambda out: select_eval_proposals(out, self.cfg, self.cfg.max_points)
        )

    def _ensure_capacity(self, points: np.ndarray) -> None:
        """Grow level capacities to cover this cloud (auto_capacity mode)."""
        if not self.auto_capacity:
            return
        import dataclasses

        from gapartnet_tpu.data.capacity import _counts_and_span

        levels = len(self.cfg.level_capacity_divisors)
        counts, span = _counts_and_span(
            points[:, :3].astype(np.float64), self.cfg.voxel_size, levels
        )
        needed = tuple(
            min(max(-(-int(c * 1.08) // 1024) * 1024, 128), self.cfg.max_points)
            for c in counts
        )
        # grid extent for the dense rulebook table: 32-cell buckets
        ext = tuple(max(-(-int(s * 1.08) // 32) * 32, 32) for s in span)
        cur = self.cfg.input_capacities()
        cur_ext = self.cfg.input_grid_extent
        if self._capacity_fitted:
            if all(n <= c for n, c in zip(needed, cur)) and all(
                e <= c for e, c in zip(ext, cur_ext)
            ):
                return
            needed = tuple(max(n, c) for n, c in zip(needed, cur))
            ext = tuple(max(e, c) for e, c in zip(ext, cur_ext))
        self.cfg = dataclasses.replace(
            self.cfg, level_capacities=needed, input_grid_extent=ext
        )
        self.model = GAPartNet(self.cfg)
        self._capacity_fitted = True
        self._build_graphs()

    def _wrap_points(self, points: np.ndarray) -> PointCloudBatch:
        n, cap = points.shape[0], self.cfg.max_points
        assert n <= cap, (n, cap)
        pad = cap - n
        pts = np.pad(points.astype(np.float32), ((0, pad), (0, 0)))
        mask = np.arange(cap) < n
        return PointCloudBatch(
            points=jnp.asarray(pts)[None],
            point_mask=jnp.asarray(mask)[None],
            pc_ids=["inference"],
        )

    def predict(
        self,
        points: np.ndarray,
        ransac_iters: int = 100,
        min_bbox_points: int = 10,
        seed: int = 0,
    ) -> InferenceResult:
        """points: (N, 6) xyz (ball-normalized) + rgb.  Full pipeline:

        forward -> score/size filter + NMS -> NPCS scatter -> RANSAC bboxes.
        """
        n = points.shape[0]
        self._ensure_capacity(points)
        batch = self._wrap_points(points)
        out = self._forward(batch)
        keep = np.asarray(self._select(out))[0]

        prop = out.proposals
        ep = np.asarray(prop.entry_point)[0]
        pid = np.asarray(prop.entry_proposal)[0]
        em = np.asarray(prop.entry_mask)[0]
        scores = np.asarray(out.score_preds)[0]
        npcs = np.asarray(out.npcs_preds)[0]
        sem_preds = np.asarray(out.sem_preds)[0][:n]

        # instance map + NPCS scatter (structure/utils.py:153-157 semantics)
        ins_preds = np.zeros(n, np.int64)
        npcs_map = np.full((n, 3), NPCS_BACKGROUND, np.float32)
        kept_ids = np.nonzero(keep)[0]
        bboxes: List[np.ndarray] = []
        kept_scores, kept_classes = [], []

        xyz = points[:, :3]
        fit_jobs = []
        for rank, p in enumerate(kept_ids):
            sel = em & (pid == p)
            pts_idx = ep[sel]
            in_range = pts_idx < n
            ins_preds[pts_idx[in_range]] = rank + 1
            npcs_map[pts_idx[in_range]] = npcs[sel][in_range]
            if len(pts_idx) > min_bbox_points:
                fit_jobs.append((rank, pts_idx))

        # batched RANSAC pose fitting on device (pads proposals to one shape)
        if fit_jobs:
            cap = max(len(idx) for _, idx in fit_jobs)
            src = np.zeros((len(fit_jobs), cap, 3), np.float32)
            tgt = np.zeros((len(fit_jobs), cap, 3), np.float32)
            msk = np.zeros((len(fit_jobs), cap), bool)
            for j, (rank, idx) in enumerate(fit_jobs):
                sel = em & (pid == kept_ids[rank])
                src[j, : len(idx)] = npcs[sel] - 0.5
                tgt[j, : len(idx)] = xyz[np.clip(idx, 0, n - 1)]
                msk[j, : len(idx)] = idx < n
            keys = jax.random.split(jax.random.PRNGKey(seed), len(fit_jobs))
            fits = jax.vmap(
                lambda s, t, m, k: ransac_pose_from_npcs(
                    s, t, m, k, max_iters=ransac_iters
                )
            )(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(msk), keys)
            ok = np.asarray(fits.ok)
            boxes = np.asarray(fits.bbox)
            for j, (rank, _) in enumerate(fit_jobs):
                if ok[j]:
                    bboxes.append(boxes[j])

        from gapartnet_tpu.eval.ap import _proposal_pred_classes

        cls = _proposal_pred_classes(prop, np.asarray(out.sem_preds))[0]
        for p in kept_ids:
            kept_scores.append(scores[p])
            kept_classes.append(cls[p])

        return InferenceResult(
            sem_preds=sem_preds,
            ins_preds=ins_preds,
            npcs_map=npcs_map,
            proposal_scores=np.asarray(kept_scores),
            proposal_classes=np.asarray(kept_classes),
            bboxes=bboxes,
        )

    def predict_with_masks(
        self,
        points: np.ndarray,
        masks: np.ndarray,
        ransac_iters: int = 100,
        min_bbox_points: int = 10,
        seed: int = 0,
    ):
        """Mask-conditioned pose estimation (reference _estimate_pose_with_masks,

        structure/utils.py:195-322): external instance masks (e.g. SAM masks
        projected to points) replace the network's clustering; ScoreNet and
        NPCSNet run on the given groups, and a 9-DoF box is fitted per mask.

        points: (N, 6); masks: (M, N) bool.  Returns (scores (M,), classes
        (M,), npcs_map (N, 3), bboxes list of (8,3) or None per mask).
        """
        from gapartnet_tpu.models.grouping import SampleProposals

        self._ensure_capacity(points)
        cfg = self.cfg
        n = points.shape[0]
        cap = 2 * cfg.max_points
        p = cfg.max_proposals
        m = min(masks.shape[0], p)

        entry_point = np.zeros(cap, np.int32)
        entry_prop = np.full(cap, -1, np.int32)
        sizes = np.zeros(p, np.int32)
        pos = 0
        for i in range(m):
            idxs = np.nonzero(masks[i][:n])[0]
            k = min(len(idxs), cap - pos)
            entry_point[pos : pos + k] = idxs[:k]
            entry_prop[pos : pos + k] = i
            sizes[i] = k
            pos += k
        prop = SampleProposals(
            entry_point=jnp.asarray(entry_point)[None],
            entry_proposal=jnp.asarray(entry_prop)[None],
            entry_mask=jnp.asarray(entry_prop >= 0)[None],
            proposal_size=jnp.asarray(sizes)[None],
            proposal_mask=jnp.asarray(np.arange(p) < m)[None],
            num_proposals=jnp.asarray([m], jnp.int32),
            num_dropped=jnp.asarray([max(masks.shape[0] - m, 0)], jnp.int32),
            ccl_overflow=jnp.zeros((1,), jnp.int32),
            ccl_cand_truncated=jnp.zeros((1,), jnp.int32),
        )
        batch = self._wrap_points(points)
        out = jax.jit(
            lambda b, pr: self.model.apply(
                self.variables, b, train=False,
                do_cluster=True, do_score=True, do_npcs=True,
                proposals_override=pr,
            )
        )(batch, prop)

        scores = np.asarray(out.score_preds)[0][:m]
        npcs = np.asarray(out.npcs_preds)[0]
        npcs_map = np.full((n, 3), NPCS_BACKGROUND, np.float32)
        ep = np.asarray(prop.entry_point)[0]
        pid = np.asarray(prop.entry_proposal)[0]
        em = np.asarray(prop.entry_mask)[0]
        bboxes = []
        for i in range(m):
            sel = em & (pid == i)
            idxs = ep[sel]
            npcs_map[idxs] = npcs[sel]
            if len(idxs) > min_bbox_points:
                fit = ransac_pose_from_npcs(
                    jnp.asarray(npcs[sel] - 0.5),
                    jnp.asarray(points[idxs, :3]),
                    jnp.ones(len(idxs), bool),
                    jax.random.PRNGKey(seed + i),
                    max_iters=ransac_iters,
                )
                bboxes.append(np.asarray(fit.bbox) if bool(fit.ok) else None)
            else:
                bboxes.append(None)
        from gapartnet_tpu.eval.ap import _proposal_pred_classes

        classes = _proposal_pred_classes(prop, np.asarray(out.sem_preds))[0][:m]
        return scores, classes, npcs_map, bboxes

    def predict_depth(
        self, depth: np.ndarray, K: np.ndarray, rgb: Optional[np.ndarray] = None,
        **kw,
    ) -> Tuple[InferenceResult, np.ndarray, np.ndarray]:
        """RGB-D entry point (ObjIns.get_pc + get_downsampled_pc +

        inference_GAPartNet): back-project, FPS to max_points, ball-normalize,
        predict.  Returns (result, sampled point indices, trans)."""
        xyz, colors, _ = backproject_depth(depth, K, rgb)
        idx = fps_downsample(xyz, self.cfg.max_points)
        xyz_n, trans = ball_space_normalize(xyz[idx])
        cols = colors[idx] if colors is not None else np.zeros_like(xyz_n)
        pts = np.concatenate([xyz_n, cols], axis=1)
        return self.predict(pts, **kw), idx, trans


class KNNPartClassifier:
    """k-NN classifier over cached part-feature banks.

    Replaces the reference's sklearn-KNN over DINO features
    (structure/utils.py:499-528): given a bank of (feature, part-label) pairs
    (e.g. DINOv2 crops of known parts), classifies query features by majority
    vote among the k nearest neighbors.  Pure NumPy (no sklearn dependency).
    """

    def __init__(self, features: np.ndarray, labels: np.ndarray, k: int = 5):
        self.features = np.asarray(features, np.float32)
        self.labels = np.asarray(labels)
        self.k = min(k, len(self.labels))

    def predict(self, queries: np.ndarray) -> np.ndarray:
        q = np.asarray(queries, np.float32)
        d2 = ((q[:, None, :] - self.features[None, :, :]) ** 2).sum(-1)
        nn = np.argsort(d2, axis=1)[:, : self.k]
        out = np.empty(len(q), self.labels.dtype)
        for i, row in enumerate(nn):
            vals, counts = np.unique(self.labels[row], return_counts=True)
            out[i] = vals[np.argmax(counts)]
        return out

    @classmethod
    def from_file(cls, path: str, k: int = 5):
        """Load a cached feature bank (.npz with 'features', 'labels')."""
        d = np.load(path)
        return cls(d["features"], d["labels"], k=k)


def relabel_feature_bank(path: str, out_path: str, old_to_new: dict):
    """Remap part ids in a cached feature bank (the reference's one-off

    structure/test.py relabel script, minus its pdb trap)."""
    d = dict(np.load(path))
    labels = d["labels"]
    d["labels"] = np.vectorize(lambda x: old_to_new.get(int(x), int(x)))(labels)
    np.savez(out_path, **d)


def estimate_joint_angle(
    xyz_a: np.ndarray, xyz_b: np.ndarray, seed: int = 0,
    method: str = "ransac",
):
    """Two-frame revolute joint estimation (structure/gapartnet.py:819-963

    semantics): fit a rigid rotation between the two part clouds, extract
    axis (eigvec of R for eigenvalue 1), angle, and a pivot point from the
    least-squares fixed-point equation.  The reference runs two rotation
    estimators side by side — RANSAC-Umeyama (:848) and pycpd
    RigidRegistration (:861); ``method`` selects the branch:

    * ``"ransac"`` — direct Umeyama fit on index-paired points (requires
      the two frames to be roughly correspondence-ordered).
    * ``"cpd"`` — correspondence-free Coherent Point Drift EM
      (ops/cpd.rigid_cpd); use when the two clouds are independent samples
      of the part surface.

    Returns dict(axis (3,), angle_rad, pivot (3,), rotation (3,3)).
    """
    m = min(len(xyz_a), len(xyz_b))
    a, b = xyz_a[:m].astype(np.float32), xyz_b[:m].astype(np.float32)
    if method == "cpd":
        from gapartnet_tpu.ops.cpd import rigid_cpd

        # CPD aligns the moving cloud onto the target: frame a -> frame b
        # (the reference registers X=pc1 normalized, Y=pc2, then reads the
        # rotation between frames off reg.R).
        _, rot, trans, _ = rigid_cpd(jnp.asarray(b), jnp.asarray(a))
    else:
        from gapartnet_tpu.ops.umeyama import umeyama_masked

        _, rot, trans = umeyama_masked(
            jnp.asarray(a), jnp.asarray(b), jnp.ones(m, bool)
        )
    r = np.asarray(rot, np.float64)
    angle = float(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
    w, v = np.linalg.eig(r.T)
    axis = np.real(v[:, np.argmin(np.abs(w - 1))])
    axis /= np.linalg.norm(axis)
    # pivot: fixed point of x -> x @ R + t, i.e. pivot @ (I - R) = t;
    # transposing the row-vector system gives (I - R)^T pivot = t
    t = np.asarray(trans, np.float64)
    A = np.eye(3) - r.T
    # (I - R^T) is exactly rank-2 (the axis direction is null); with an
    # ESTIMATED rotation the third singular value is ~1e-7 instead of 0,
    # and the default machine-precision rcond inverts it — blowing the
    # pivot up by ~1/sv3 along the axis.  Truncate it explicitly: the
    # axis component of the pivot is unobservable anyway.
    pivot, *_ = np.linalg.lstsq(A, t, rcond=1e-3)
    return dict(axis=axis, angle_rad=angle, pivot=pivot, rotation=r)
