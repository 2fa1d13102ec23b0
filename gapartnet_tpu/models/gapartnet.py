"""GAPartNet model: backbone + semantic / offset / score / NPCS heads.

TPU re-architecture of the reference LightningModule
(/root/reference/gapartnet/network/model.py:27-1055).  The module is a pure
flax network; staged-training gating (model.py:528-601: clustering from epoch
`start_clustering`, ScoreNet from `start_scorenet`, NPCS from `start_npcs`)
becomes three static flags (do_cluster / do_score / do_npcs) selected by the
trainer per epoch — each stage is its own compiled graph.

The whole forward, including input voxelization, dual-set clustering,
per-proposal re-voxelization, and both proposal UNets, is a single jittable
function with static shapes.
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from gapartnet_tpu.constants import SYMMETRY_INDICES
from gapartnet_tpu.models import losses as L
from gapartnet_tpu.models.backbone import SparseUNet
from gapartnet_tpu.models.dense_unet import DenseProposalUNet
from gapartnet_tpu.models.grouping import (
    SampleProposals,
    cluster_single,
    segmented_dense_voxelize_single,
    segmented_voxelize_single,
)
from gapartnet_tpu.models.norm import MaskedBatchNorm
from gapartnet_tpu.ops.iou import instance_seg_iou
from gapartnet_tpu.ops.segment import segment_max, segment_mean, segment_min
from gapartnet_tpu.ops.sparse_conv import build_hierarchy
from gapartnet_tpu.ops.voxelize import voxelize_single
from gapartnet_tpu.structures import PointCloudBatch
from gapartnet_tpu.utils import invariants as inv


@dataclasses.dataclass(frozen=True)
class GAPartNetConfig:
    """Static model configuration (mirrors gapartnet.yaml model.init_args)."""

    in_channels: int = 6
    num_part_classes: int = 10
    backbone_type: str = "SparseUNet"  # or "PointNet" (model.py:88-102)
    channels: Tuple[int, ...] = (16, 32, 48, 64, 80, 96, 112)
    block_repeat: int = 2
    # instance_seg_cfg (gapartnet.yaml:20-26)
    ball_query_radius: float = 0.04
    max_num_points_per_query: int = 50
    min_num_points_per_proposal: int = 5
    max_num_points_per_query_shift: int = 300
    score_fullscale: float = 28.0
    score_scale: float = 50.0
    # semantic losses
    ignore_sem_label: int = -100
    use_sem_focal_loss: bool = True
    # optional per-class focal weights (reference losses.py:38 `alpha`; its
    # config ships None).  Few-shot runs use inverse-frequency weights to
    # escape the all-background valley (PERF.md round 3).
    sem_focal_alpha: Optional[Tuple[float, ...]] = None
    use_sem_dice_loss: bool = True
    # symmetry (gapartnet.yaml:34)
    symmetry_indices: Tuple[int, ...] = SYMMETRY_INDICES
    # validation / inference (model.py:46-49)
    val_score_threshold: float = 0.09
    val_min_num_points_per_proposal: int = 3
    val_nms_iou_threshold: float = 0.3
    val_ap_iou_threshold: float = 0.5
    # clustering implementation: "hash" (fast TPU path) or "exact"
    # (reference first-K semantics; O(N^2), for parity testing)
    clustering_impl: str = "hash"
    # (cell, label) node-table capacity PER SET for the hash clustering
    # (0 = N).  Node count is bounded by the CLUSTERED (predicted-foreground)
    # point count per set, whatever the label noise — real eval clouds
    # measure 0.25-5.3k nodes/set at the reference envelope (round-4 probe;
    # the round-3 2048 default was sized on synthetic blobs and overflowed
    # by 143-253 nodes on real data).  Overflow is counted in
    # counters/ccl_node_overflow and asserted zero under GAPARTNET_CHECKS,
    # so a tight cap fails loudly, not silently.  DataConfig.auto_capacity
    # sizes this from the data (data/capacity.scan_dataset_shapes measures
    # foreground occupancy — the label-noise-proof bound).
    hash_node_capacity: int = 2048
    # same-label candidate cap per node in the hash-CCL half-neighborhood
    # probe (<= 62 possible; 0 = derive from hash_max_degree as before).
    # Real clouds measure up to 45 found candidates (gt labels are the upper
    # bound: label noise only fragments same-label neighborhoods); beyond-cap
    # candidates lose edges before the distance check and are counted in
    # counters/ccl_cand_truncated.  auto_capacity sizes this from the data.
    hash_cand_cap: int = 0
    # post-distance-check neighbor-table width; connected edges beyond it are
    # dropped from propagation and folded into ccl_cand_truncated.  Auto-
    # sizing sets it equal to the sized cand cap (no silent degree drops).
    hash_max_degree: int = 24
    # hash-CCL neighbor-probe implementation: "auto" picks per batch size
    # (O(1) table at B1, fused-sort membership at batch); explicit values
    # ("sort" | "table" | "window" | "bsearch") pin one — the perf-campaign
    # A/B knob for ops/hash_ccl.py probe variants
    hash_probe_impl: str = "auto"
    # offset-loss scale (1.0 = reference: losses summed unweighted,
    # model.py:604).  Diagnostic knob for backbone-coupling probes
    # (tools/valley_probe.py); not a reference configuration when != 1
    offset_loss_weight: float = 1.0
    # conv gather/matmul precision: "float32" or "bfloat16" (f32 accumulate)
    conv_compute_dtype: str = "float32"
    # rematerialize backbone ResBlocks in backward (larger train batches)
    remat_blocks: bool = False
    # rulebook neighbor lookup: "dense" = O(1) int16 coordinate tables
    # (fast; bounded by input_grid_extent), "sort" = searchsorted (no bound)
    rulebook_impl: str = "dense"
    # ScoreNet/NPCSNet conv implementation: "dense" runs the proposal UNets
    # as XLA conv3d over dense (P, 28^3) grids — MXU path, no rulebooks, no
    # dedup sort, no voxel-capacity overflow (models/dense_unet.py); "sparse"
    # is the rulebook gather-GEMM path (numerically equal, gather-bound);
    # "auto" = dense at eval, sparse at train: saving the dense conv
    # activations for backward costs (B*P, 28^3, C) tensors at ~2% occupancy
    # (27 GB at B8 — exceeds HBM), while the sparse path's residuals scale
    # with the 2N real entries
    proposal_conv_impl: str = "auto"
    # dense-path live-grid capacity PER CLOUD: only ~45-84 of the
    # max_proposals=128 slots are live on real clouds, so live proposals'
    # grids are compacted into a shared (B * this, S^3) space and the UNets
    # convolve no dead grids.  Overflow (more live proposals than this)
    # is counted in counters/dense_grids_dropped and asserted under
    # GAPARTNET_CHECKS.
    dense_grid_capacity: int = 96
    # level-0 coordinate bound for dense rulebooks; 1 cm voxels on
    # ball-normalized clouds span <= ~260 cells (reference envelope);
    # out-of-extent voxels (extreme augmentation) lose neighbor links only
    input_grid_extent: Tuple[int, int, int] = (288, 288, 288)
    # fixed-shape capacities (TPU-specific)
    voxel_size: Tuple[float, float, float] = (0.01, 0.01, 0.01)
    max_points: int = 20000
    max_proposals: int = 128
    max_instances: int = 64
    # per-UNet-level voxel capacity schedule (fractions of the input capacity)
    level_capacity_divisors: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)
    # explicit per-level capacities (overrides the divisor schedule when
    # set).  Real articulated surfaces keep far more voxels per stride-2
    # level than the synthetic blobs the divisors were tuned on; size this
    # from the data with data/capacity.scan_level_capacities (enabled
    # end-to-end via DataConfig.auto_capacity)
    level_capacities: Optional[Tuple[int, ...]] = None
    proposal_level_divisors: Tuple[int, ...] = (1, 2)
    # voxel capacity of the proposal (ScoreNet/NPCS) grid on the sparse
    # (train) path.  Entries are 2N (every valid point appears once per
    # cluster set) but distinct proposal voxels are far fewer after dedup +
    # the min-points filter — measured 3.4-4.5k at the reference envelope
    # with 45-84 live proposals.  Overflow drops the highest keys and is
    # counted in counters/proposal_voxels_dropped (asserted zero under
    # GAPARTNET_CHECKS).  0 means "use max_points".
    proposal_voxel_capacity: int = 8192

    def input_capacities(self) -> Tuple[int, ...]:
        if self.level_capacities is not None:
            assert len(self.level_capacities) == len(
                self.level_capacity_divisors
            ), (self.level_capacities, self.level_capacity_divisors)
            return tuple(
                min(max(int(c), 64), self.max_points)
                for c in self.level_capacities
            )
        return tuple(
            max(self.max_points // d, 64) for d in self.level_capacity_divisors
        )

    def proposal_capacities(self) -> Tuple[int, ...]:
        # clamped to the 2N entry count (each valid point appears once per
        # cluster set): voxels cannot outnumber entries, and small test
        # configs must not inflate to the flagship default
        v0 = min(
            self.proposal_voxel_capacity or self.max_points,
            2 * self.max_points,
        )
        return tuple(max(v0 // d, 64) for d in self.proposal_level_divisors)


@struct.dataclass
class ModelOutput:
    sem_logits: jnp.ndarray            # (B, N, C)
    sem_preds: jnp.ndarray             # (B, N) int32
    offset_preds: jnp.ndarray          # (B, N, 3)
    pc_features: jnp.ndarray           # (B, N, fea)
    # clustering stage
    proposals: Optional[SampleProposals] = None   # batched (leading B)
    proposal_sem: Optional[jnp.ndarray] = None    # (B, P) class used for heads
    # score stage
    score_logits: Optional[jnp.ndarray] = None    # (B, P) selected-class logits
    score_preds: Optional[jnp.ndarray] = None     # (B, P) sigmoid
    ious: Optional[jnp.ndarray] = None            # (B, P, I) vs GT instances
    # npcs stage
    npcs_preds: Optional[jnp.ndarray] = None      # (B, 2N, 3) per entry
    npcs_valid: Optional[jnp.ndarray] = None      # (B, 2N)
    # capacity-overflow counters, (B,) each; all-zero in healthy runs.
    # Surfaced as metrics (train/loop.py) and asserted zero under
    # GAPARTNET_CHECKS so fixed-shape overflows never silently depress AP.
    counters: Optional[Any] = None
    # losses (scalars; 0 where stage off)
    loss_sem_seg: jnp.ndarray = 0.0
    loss_offset_dist: jnp.ndarray = 0.0
    loss_offset_dir: jnp.ndarray = 0.0
    loss_prop_score: jnp.ndarray = 0.0
    loss_prop_npcs: jnp.ndarray = 0.0
    # metrics
    all_accu: jnp.ndarray = 0.0
    pixel_accu: jnp.ndarray = 0.0

    @property
    def total_loss(self):
        return (
            self.loss_sem_seg
            + self.loss_offset_dist
            + self.loss_offset_dir
            + self.loss_prop_score
            + self.loss_prop_npcs
        )


def prepare_input_grid(points: jnp.ndarray, point_mask: jnp.ndarray, cfg: GAPartNetConfig):
    """Voxelize each sample (1 cm voxels over its own bbox +-1e-4, reference

    dataset/gapartnet.py:179-205) — runs on device inside the jitted step
    instead of in dataloader workers.
    Returns (voxel_keys (B,V), voxel_feats (B,V,6), num_voxels (B,), pc_voxel_id (B,N)).
    """
    vsize = jnp.asarray(cfg.voxel_size, jnp.float32)

    def one(pts, mask):
        xyz = pts[:, :3]
        big = jnp.float32(1e9)
        rmin = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0) - 1e-4
        rmax = jnp.max(jnp.where(mask[:, None], xyz, -big), axis=0) + 1e-4
        res = voxelize_single(xyz, pts, vsize, rmin, rmax, point_mask=mask)
        return res.voxel_keys, res.voxel_features, res.num_voxels, res.pc_voxel_id

    return jax.vmap(one)(points, point_mask)


def _gather_per_point(voxel_feats, pc_voxel_id):
    """(B, V, C) + (B, N) -> (B, N, C), zeros at invalid points."""
    def one(f, vid):
        g = f[vid.clip(0)]
        return jnp.where((vid >= 0)[:, None], g, 0.0)

    return jax.vmap(one)(voxel_feats, pc_voxel_id)


def _gather_entries(per_point, entry_point, entry_mask):
    """(B, N, ...) + (B, 2N) -> (B, 2N, ...)."""
    def one(x, ep, m):
        g = x[ep]
        shape = (-1,) + (1,) * (g.ndim - 1)
        return jnp.where(m.reshape(shape), g, 0)

    return jax.vmap(one)(per_point, entry_point, entry_mask)


class GAPartNet(nn.Module):
    """The full network.  Stage flags are static; labels are optional.

    __call__ returns a ModelOutput with predictions, losses and base metrics.
    """

    cfg: GAPartNetConfig

    @nn.compact
    def __call__(
        self,
        batch: PointCloudBatch,
        train: bool = True,
        do_cluster: bool = False,
        do_score: bool = False,
        do_npcs: bool = False,
        proposals_override: Optional[SampleProposals] = None,
        frozen_bn: Tuple[str, ...] = (),
        cluster_sem_override: Optional[jnp.ndarray] = None,
        cluster_offset_override: Optional[jnp.ndarray] = None,
    ) -> ModelOutput:
        """frozen_bn: module names whose BatchNorm runs with running
        averages even when train=True.  Used by trunk-frozen phase-B
        training (loop.make_train_step freeze_prefixes): a frozen module's
        params AND running stats are pinned, so normalizing with current
        batch statistics would make downstream heads train on features that
        differ from eval-time features (ADVICE r4)."""
        cfg = self.cfg
        c = cfg.num_part_classes
        points = batch.points
        point_mask = batch.point_mask
        b, n = point_mask.shape
        pt_xyz = points[..., :3]
        has_labels = batch.sem_labels is not None

        # ------------------------------------------------------------------
        # input grid + backbone
        # ------------------------------------------------------------------
        fea = cfg.channels[0]
        counters = {}
        if cfg.backbone_type == "SparseUNet":
            keys, vfeats, nvox, pc_voxel_id = prepare_input_grid(
                points, point_mask, cfg
            )
            hierarchy = build_hierarchy(
                keys, nvox, list(cfg.input_capacities()),
                extent=cfg.input_grid_extent
                if cfg.rulebook_impl == "dense" else None,
            )
            counters["backbone_voxels_dropped"] = sum(
                ds.num_dropped for ds in hierarchy.downsamples
            )
            cdtype = (
                jnp.bfloat16 if cfg.conv_compute_dtype == "bfloat16" else None
            )
            voxel_out = SparseUNet(
                cfg.channels, cfg.block_repeat, compute_dtype=cdtype,
                remat=cfg.remat_blocks, name="backbone",
            )(vfeats, hierarchy, train and "backbone" not in frozen_bn)
            pc_feats = _gather_per_point(voxel_out, pc_voxel_id)  # (B, N, fea)
        elif cfg.backbone_type == "PointNet":
            from gapartnet_tpu.models.pointnet import PointNetSegBackbone

            pc_feats = PointNetSegBackbone(fea, name="backbone")(
                points, point_mask, train and "backbone" not in frozen_bn
            )
        else:
            raise NotImplementedError(cfg.backbone_type)

        # ------------------------------------------------------------------
        # semantic segmentation head (model.py:104,160-194)
        # ------------------------------------------------------------------
        sem_logits = nn.Dense(c, name="sem_seg_head")(pc_feats)
        sem_preds = jnp.argmax(
            jax.lax.stop_gradient(sem_logits), axis=-1
        ).astype(jnp.int32)

        loss_sem = jnp.float32(0.0)
        all_accu = jnp.float32(0.0)
        pixel_accu = jnp.float32(0.0)
        if has_labels:
            flat_logits = sem_logits.reshape(-1, c)
            flat_labels = batch.sem_labels.reshape(-1)
            flat_mask = point_mask.reshape(-1)
            if cfg.use_sem_focal_loss:
                loss_sem = L.focal_loss(
                    flat_logits, flat_labels, flat_mask,
                    gamma=2.0, ignore_index=cfg.ignore_sem_label,
                    alpha=cfg.sem_focal_alpha,
                )
            else:
                valid = flat_mask & (flat_labels != cfg.ignore_sem_label)
                t = jnp.clip(flat_labels, 0, c - 1)
                ce = -jnp.take_along_axis(
                    jax.nn.log_softmax(flat_logits, -1), t[:, None], -1
                )[:, 0]
                # class-weighted CE: the reference's non-focal branch is
                # plain unweighted CE (model.py:369-371); when
                # sem_focal_alpha is set it acts here as per-class CE
                # weights (the focal branch's alpha semantics minus the
                # (1-p)^gamma dynamic term), so the class-balance lever
                # works on both loss branches.  Denominator stays the
                # valid count, matching the focal branch's convention
                # (losses.py:23-45).
                if cfg.sem_focal_alpha is not None:
                    aw = jnp.asarray(cfg.sem_focal_alpha, jnp.float32)
                    ce = ce * aw[t]
                loss_sem = jnp.where(valid, ce, 0.0).sum() / jnp.maximum(valid.sum(), 1)
            if cfg.use_sem_dice_loss:
                loss_sem = loss_sem + L.dice_loss(flat_logits, flat_labels, flat_mask)

            all_accu = L.pixel_accuracy(
                sem_preds.reshape(-1), flat_labels, flat_mask
            )
            inst_mask = flat_mask & (flat_labels > 0)
            pixel_accu = L.pixel_accuracy(
                sem_preds.reshape(-1), flat_labels, inst_mask
            )

        # ------------------------------------------------------------------
        # offset head (model.py:106-111,196-226)
        # ------------------------------------------------------------------
        x = nn.Dense(fea, name="offset_mlp0")(pc_feats)
        x = MaskedBatchNorm(name="offset_bn")(
            x, point_mask, train and "offset_bn" not in frozen_bn)
        x = nn.relu(x)
        offset_preds = nn.Dense(3, name="offset_mlp1")(x)

        loss_off_dist = jnp.float32(0.0)
        loss_off_dir = jnp.float32(0.0)
        if has_labels and batch.instance_regions is not None:
            gt_offsets = batch.instance_regions[..., :3] - pt_xyz
            valid_inst = (
                (batch.sem_labels > 0) & (batch.instance_labels >= 0) & point_mask
            )
            loss_off_dist, loss_off_dir = L.offset_loss(
                offset_preds.reshape(-1, 3),
                gt_offsets.reshape(-1, 3),
                valid_inst.reshape(-1),
            )
            if cfg.offset_loss_weight != 1.0:
                loss_off_dist = loss_off_dist * cfg.offset_loss_weight
                loss_off_dir = loss_off_dir * cfg.offset_loss_weight

        out = ModelOutput(
            sem_logits=sem_logits,
            sem_preds=sem_preds,
            offset_preds=offset_preds,
            pc_features=pc_feats,
            loss_sem_seg=loss_sem,
            loss_offset_dist=loss_off_dist,
            loss_offset_dir=loss_off_dir,
            all_accu=all_accu,
            pixel_accu=pixel_accu,
            counters=counters,
        )
        if not do_cluster:
            return out

        # ------------------------------------------------------------------
        # dual-set clustering (model.py:228-346)
        # ------------------------------------------------------------------
        cluster_sem = sem_preds
        if cluster_sem_override is not None:
            # Clustering driven by externally supplied labels instead of the
            # sem head (bench.py): an untrained head's argmax marks far more
            # foreground than any trained operating point, so benchmarking
            # with random weights either overflows the data-sized node table
            # (loudly, counters) or silently mis-measures the clustering
            # load.  The override array is a traced input and sem_preds
            # remains a returned output, so the sem head is never
            # dead-code-eliminated; every shape in the graph is unchanged.
            cluster_sem = cluster_sem_override
        cluster_valid = (cluster_sem > 0) & point_mask
        if has_labels and batch.instance_labels is not None:
            cluster_valid = cluster_valid & (batch.instance_labels >= 0)

        stop_offsets = jax.lax.stop_gradient(offset_preds)
        if cluster_offset_override is not None:
            # companion to cluster_sem_override: the clustering LOAD is set
            # by (labels, offsets) together — an untrained offset head
            # scatters the shifted set instead of pulling it toward instance
            # centers, inflating its node count past any trained operating
            # point (round-5 bench measured +126 nodes over the GT-sized
            # cap).  offset_preds stays a live output either way.
            stop_offsets = cluster_offset_override
        if proposals_override is not None:
            # externally supplied point groups (e.g. SAM masks: the reference's
            # mask-conditioned pose estimation, structure/utils.py:195-322)
            prop = proposals_override
        else:
            prop = jax.vmap(
                lambda xyz, off, sem, val: cluster_single(
                    xyz, off, sem, val,
                    cfg.ball_query_radius,
                    cfg.max_num_points_per_query,
                    cfg.max_num_points_per_query_shift,
                    cfg.min_num_points_per_proposal,
                    cfg.max_proposals,
                    impl=cfg.clustering_impl,
                    hash_node_capacity=min(cfg.hash_node_capacity, cfg.max_points)
                    if cfg.hash_node_capacity else 0,
                    # probe by O(1) table at B1 (fastest single-sample), by
                    # fused-sort membership at batch (the table's HBM
                    # tile-fetch per element scales ~24x B1 -> B8)
                    probe_impl=(
                        cfg.hash_probe_impl if cfg.hash_probe_impl != "auto"
                        else ("table" if b == 1 else "sort")
                    ),
                    hash_cand_cap=cfg.hash_cand_cap,
                    hash_max_degree=cfg.hash_max_degree,
                )
            )(pt_xyz, stop_offsets, cluster_sem, cluster_valid)

        # random cube-placement jitter: two independent uniform(3) draws,
        # matching the reference's two torch.rand(3) (grouping_utils.py:86-91)
        if train:
            rand = jax.random.uniform(self.make_rng("proposal_jitter"), (2, 3))
            rand_a, rand_b = rand[0], rand[1]
        else:
            rand_a = rand_b = jnp.full((3,), 0.5, jnp.float32)

        dense_mode = cfg.proposal_conv_impl == "dense" or (
            cfg.proposal_conv_impl == "auto" and not train
        )
        entry_feats = _gather_entries(pc_feats, prop.entry_point, prop.entry_mask)
        s = int(cfg.score_fullscale)
        p_cap = cfg.max_proposals
        if dense_mode:
            # dense path: entries map straight to sites of the (P, S^3) grid —
            # no dedup sort, no rulebooks, no voxel-capacity overflow
            entry_cell = jax.vmap(
                lambda xyz, pr: segmented_dense_voxelize_single(
                    xyz, pr, rand_a, rand_b, p_cap,
                    cfg.score_fullscale, cfg.score_scale,
                )
            )(pt_xyz, prop)  # (B, 2N)
            entry_ok = prop.entry_mask & (entry_cell >= 0)
            s3 = s * s * s
            # global live-grid compaction: route live proposals' grids into a
            # shared (B * dense_grid_capacity, S^3) space, so the UNets
            # convolve no dead grids (live proposals measure ~45-84 of the
            # P=128 slots per cloud)
            gcap = b * min(cfg.dense_grid_capacity, p_cap)
            live = prop.proposal_mask.reshape(-1)  # (B*P,)
            g_of = jnp.cumsum(live.astype(jnp.int32)) - 1
            g_of = jnp.where(live & (g_of < gcap), g_of, -1).reshape(b, p_cap)
            counters["dense_grids_dropped"] = (
                prop.proposal_mask & (g_of < 0)
            ).sum(axis=1).astype(jnp.int32)
            e_gid = jnp.take_along_axis(
                g_of, prop.entry_proposal.clip(0), axis=1
            )  # (B, 2N)
            cell_within = entry_cell - prop.entry_proposal.clip(0) * s3
            entry_site = jnp.where(
                entry_ok & (e_gid >= 0), e_gid * s3 + cell_within, -1
            )  # (B, 2N) global site ids, -1 = dropped
            site_flat = entry_site.reshape(-1)
            nsites = gcap * s3
            # voxel features = mean of entry features (reduction="mean")
            grid_flat = segment_mean(
                entry_feats.reshape(-1, fea), site_flat.clip(0), nsites,
                mask=site_flat >= 0,
            )  # (gcap*S^3, C)
            occ_flat = jnp.zeros((nsites,), bool).at[
                jnp.where(site_flat >= 0, site_flat, nsites)
            ].set(True, mode="drop")
            # store the (mostly-zero) dense grid in the conv compute dtype:
            # the UNets cast to it per conv anyway, and the (G, S^3, C)
            # zero-init + scatter traffic is pure HBM bandwidth
            gdtype = (
                jnp.bfloat16 if cfg.conv_compute_dtype == "bfloat16"
                else grid_flat.dtype
            )
            grid_feats = grid_flat.astype(gdtype).reshape(gcap, s, s, s, fea)
            occ = occ_flat.reshape(gcap, s, s, s)
            prop_hier = prop_vfeats = entry_voxel_id = None
            counters["proposal_voxels_dropped"] = jnp.zeros((b,), jnp.int32)
        else:
            grid = jax.vmap(
                lambda xyz, pr: segmented_voxelize_single(
                    xyz, pr, rand_a, rand_b, p_cap,
                    cfg.score_fullscale, cfg.score_scale,
                )
            )(pt_xyz, prop)

            # cap the proposal-grid voxel capacity (keys are sorted, so slicing
            # keeps the lowest keys deterministically; overflow entries detach)
            vcap = cfg.proposal_capacities()[0]
            grid_keys = grid.keys[:, :vcap]
            grid_nvox = jnp.minimum(grid.num_voxels, vcap)
            entry_voxel_id = jnp.where(
                grid.entry_voxel_id < vcap, grid.entry_voxel_id, -1
            )

            # proposal-grid extent: 32^3 cell per proposal laid out on a
            # (32, 32, 32)-cell super-grid (grouping.PROPOSAL_CELL layout)
            pext = (
                1024,
                32 * min(-(-cfg.max_proposals // 32), 32),
                32 * (-(-cfg.max_proposals // 1024)),
            )
            prop_hier = build_hierarchy(
                grid_keys, grid_nvox, list(cfg.proposal_capacities()),
                extent=pext if cfg.rulebook_impl == "dense" else None,
            )
            entry_voxel_ok = prop.entry_mask & (entry_voxel_id >= 0)
            # voxel features = mean of entry features (reduction="mean")
            prop_vfeats = jax.vmap(
                lambda f, vid, m: segment_mean(f, vid.clip(0), vcap, mask=m)
            )(entry_feats, entry_voxel_id, entry_voxel_ok)
            grid_feats = occ = entry_site = g_of = None
            counters["proposal_voxels_dropped"] = (
                grid.num_voxels - grid_nvox
            ) + sum(ds.num_dropped for ds in prop_hier.downsamples)

        # proposal representative point (min point index; the reference takes
        # its first entry after sorting, model.py:552-557)
        rep_point = jax.vmap(
            lambda ep, pid, m: segment_min(
                jnp.where(m, ep, n), pid.clip(0), cfg.max_proposals, mask=m
            )
        )(prop.entry_point, prop.entry_proposal, prop.entry_mask)
        rep_point = jnp.clip(rep_point, 0, n - 1)
        if has_labels:
            proposal_sem = jnp.take_along_axis(batch.sem_labels, rep_point, axis=1)
        else:
            proposal_sem = jnp.take_along_axis(sem_preds, rep_point, axis=1)
        proposal_sem = jnp.clip(proposal_sem, 1, c - 1)

        # IoU vs GT instances — needed for the score loss and for AP eval
        ious = None
        if has_labels and batch.instance_labels is not None:
            entry_inst = _gather_entries(
                batch.instance_labels, prop.entry_point, prop.entry_mask
            )
            entry_inst = jnp.where(prop.entry_mask, entry_inst, -100)
            ious = jax.vmap(
                lambda pid, ei, m, sp, si: instance_seg_iou(
                    pid, ei, m, sp, si,
                    num_proposals=cfg.max_proposals,
                    num_instances=cfg.max_instances,
                )
            )(
                prop.entry_proposal,
                entry_inst,
                prop.entry_mask,
                prop.proposal_size,
                batch.num_points_per_instance[:, : cfg.max_instances],
            )

        counters["dropped_proposals"] = prop.num_dropped
        counters["ccl_node_overflow"] = prop.ccl_overflow
        counters["ccl_cand_truncated"] = prop.ccl_cand_truncated
        for cname, cval in counters.items():
            inv.check_traced(
                jnp.all(cval == 0), "capacity overflow in " + cname
            )
        out = out.replace(
            proposals=prop, proposal_sem=proposal_sem, ious=ious,
            counters=counters,
        )

        # ------------------------------------------------------------------
        # ScoreNet (model.py:113-116,348-385)
        # ------------------------------------------------------------------
        if do_score:
            cdtype = (
                jnp.bfloat16 if cfg.conv_compute_dtype == "bfloat16" else None
            )
            c0 = cfg.channels[0]
            if dense_mode:
                sfeat = DenseProposalUNet(
                    cfg.channels[:2], cfg.block_repeat, compute_dtype=cdtype,
                    # keep inter-layer activations in the compute dtype at
                    # eval (the stage is HBM-bound; AD needs f32 at train)
                    act_dtype=cdtype if not train else None,
                    remat=cfg.remat_blocks, name="score_unet",
                )(grid_feats, occ, train)  # (G, S, S, S, C0)
                # segmented maxpool (model.py:360-362) = masked max over
                # sites of each live grid, mapped back to (B, P) slots
                pooled_g = jnp.where(
                    occ[..., None], sfeat, jnp.asarray(-jnp.inf, sfeat.dtype)
                ).reshape(-1, s * s * s, c0).max(axis=1)  # (G, C0)
                pooled = pooled_g[g_of.clip(0)].astype(jnp.float32)
                pooled = jnp.where((g_of >= 0)[..., None], pooled, 0.0)
            else:
                sfeat = SparseUNet(
                    cfg.channels[:2], cfg.block_repeat, without_stem=True,
                    compute_dtype=cdtype, remat=cfg.remat_blocks,
                    name="score_unet",
                )(prop_vfeats, prop_hier, train)
                entry_sf = _gather_entries_from_voxels(
                    sfeat, entry_voxel_id, prop.entry_mask
                )
                pooled = jax.vmap(
                    lambda f, pid, m: segment_max(
                        f, pid.clip(0), cfg.max_proposals, mask=m
                    )
                )(entry_sf, prop.entry_proposal, prop.entry_mask)
            pooled = jnp.where(prop.proposal_mask[..., None], pooled, 0.0)
            score_all = nn.Dense(c - 1, name="score_head")(pooled)  # (B, P, 9)
            score_logits = jnp.take_along_axis(
                score_all, (proposal_sem - 1)[..., None], axis=-1
            )[..., 0]
            score_preds = jax.nn.sigmoid(jax.lax.stop_gradient(score_logits))

            loss_score = jnp.float32(0.0)
            if ious is not None:
                ious_max = jnp.max(ious, axis=-1)
                gt_scores = L.get_gt_scores(ious_max, 0.75, 0.25)
                loss_score = L.sigmoid_bce(
                    score_logits.reshape(-1),
                    gt_scores.reshape(-1),
                    prop.proposal_mask.reshape(-1),
                )
            out = out.replace(
                score_logits=score_logits,
                score_preds=score_preds,
                loss_prop_score=loss_score,
            )

        # ------------------------------------------------------------------
        # NPCSNet (model.py:119-122,387-462)
        # ------------------------------------------------------------------
        if do_npcs:
            cdtype = (
                jnp.bfloat16 if cfg.conv_compute_dtype == "bfloat16" else None
            )
            if dense_mode:
                nfeat = DenseProposalUNet(
                    cfg.channels[:2], cfg.block_repeat, compute_dtype=cdtype,
                    act_dtype=cdtype if not train else None,
                    remat=cfg.remat_blocks, name="npcs_unet",
                )(grid_feats, occ, train)  # (G, S, S, S, C0)
                nf_flat = nfeat.reshape(-1, cfg.channels[0])  # (G*S^3, C0)
                # gather per entry BEFORE the (linear) head — identical result,
                # 27x fewer head FLOPs than head-on-grid
                sflat = entry_site.reshape(-1)
                entry_nf = jnp.where(
                    (sflat >= 0)[:, None],
                    nf_flat[sflat.clip(0)].astype(jnp.float32),
                    0.0,
                ).reshape(b, -1, cfg.channels[0])  # (B, 2N, C0)
                entry_npcs = nn.Dense(3 * (c - 1), name="npcs_head")(entry_nf)
            else:
                nfeat = SparseUNet(
                    cfg.channels[:2], cfg.block_repeat, without_stem=True,
                    compute_dtype=cdtype, remat=cfg.remat_blocks,
                    name="npcs_unet",
                )(prop_vfeats, prop_hier, train)
                npcs_all = nn.Dense(3 * (c - 1), name="npcs_head")(nfeat)
                entry_npcs = _gather_entries_from_voxels(
                    npcs_all, entry_voxel_id, prop.entry_mask
                )  # (B, 2N, 27)
            entry_npcs = entry_npcs.reshape(b, -1, c - 1, 3)
            entry_sem_pred = _gather_entries(
                sem_preds, prop.entry_point, prop.entry_mask
            )
            sel = jnp.clip(entry_sem_pred - 1, 0, c - 2)
            npcs_preds = jnp.take_along_axis(
                entry_npcs, sel[..., None, None], axis=2
            )[:, :, 0, :]  # (B, 2N, 3)

            loss_npcs = jnp.float32(0.0)
            npcs_valid = None
            if has_labels and batch.gt_npcs is not None:
                entry_sem_label = _gather_entries(
                    batch.sem_labels, prop.entry_point, prop.entry_mask
                )
                entry_gt_npcs = _gather_entries(
                    batch.gt_npcs, prop.entry_point, prop.entry_mask
                )
                npcs_valid = (
                    prop.entry_mask
                    & (entry_sem_pred == entry_sem_label)
                    & jnp.any(entry_gt_npcs != 0, axis=-1)
                )
                sym_idx = jnp.asarray(cfg.symmetry_indices, jnp.int32)
                entry_sym = sym_idx[jnp.clip(entry_sem_pred, 0, c - 1)]
                # flatten batch into one segment space
                p = cfg.max_proposals
                gpid = jnp.where(
                    prop.entry_proposal >= 0,
                    prop.entry_proposal + jnp.arange(b, dtype=jnp.int32)[:, None] * p,
                    -1,
                )
                loss_npcs = L.npcs_loss(
                    npcs_preds.reshape(-1, 3),
                    entry_gt_npcs.reshape(-1, 3),
                    entry_sym.reshape(-1),
                    gpid.reshape(-1),
                    npcs_valid.reshape(-1),
                    b * p,
                )
            out = out.replace(
                npcs_preds=npcs_preds,
                npcs_valid=npcs_valid,
                loss_prop_npcs=loss_npcs,
            )

        return out


def _gather_entries_from_voxels(voxel_feats, entry_voxel_id, entry_mask):
    """(B, V, C) + (B, 2N) voxel ids -> (B, 2N, C)."""
    def one(f, vid, m):
        g = f[vid.clip(0)]
        return jnp.where((m & (vid >= 0))[:, None], g, 0.0)

    return jax.vmap(one)(voxel_feats, entry_voxel_id, entry_mask)
