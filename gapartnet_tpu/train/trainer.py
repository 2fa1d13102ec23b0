"""Fit / test driver.

Replaces the reference's LightningCLI + Trainer stack (gapartnet/train.py:43-69
+ LightningModule hooks in network/model.py):

  * fit: staged training (schedule [start_scorenet, start_npcs]), validation
    over the three dataloaders (val / test_intra / test_inter) each epoch,
    top-k orbax checkpointing on monitor_metrics/mean_mAP.
  * test: restore a checkpoint, evaluate the three splits, report the exact
    metric-name contract of the reference (model.py:694-805, 859-1049).

Logging goes to a JSONL file (and optionally wandb when available), replacing
WandbLogger; metric names are identical so dashboards port over.
"""

import dataclasses
import json
import os
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.constants import PART_ID2NAME
from gapartnet_tpu.data.loader import GAPartNetDataset, collate
from gapartnet_tpu.eval.ap import APEvaluator, select_eval_proposals
from gapartnet_tpu.models.gapartnet import GAPartNet, GAPartNetConfig
from gapartnet_tpu.structures import HostList, PointCloudBatch
from gapartnet_tpu.train.config import Config
from gapartnet_tpu.train.loop import (
    TrainState,
    adam,
    create_train_state,
    make_eval_step,
    make_train_step,
    stage_flags,
)

SPLITS = ("val", "test_intra", "test_inter")


def run_name(cfg: Config) -> str:
    """Config-derived run name (reference train.py:7-41 semantics:

    backbone tag + focal/dice flags + batch size + augmentation params +
    timestamp)."""
    model_str = {"SparseUNet": "SU", "PointNet": "PN"}.get(
        cfg.model.backbone_type, cfg.model.backbone_type
    )
    model_str += "_" + ("T" if cfg.model.use_sem_focal_loss else "F")
    model_str += "T" if cfg.model.use_sem_dice_loss else "F"
    d = cfg.data
    data_str = (
        f"BS{d.train_batch_size}_"
        f"Aug{d.pos_jitter}-{d.color_jitter}-{d.flip_prob}-{d.rotate_prob}"
    )
    from datetime import datetime

    return f"{model_str}_{data_str}_{datetime.now().strftime('%m-%d-%H-%M')}"


class MetricLogger:
    def __init__(self, log_file: str, use_wandb: bool = False, run_name: str = ""):
        self.path = Path(log_file)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project="gapartnet_tpu", name=run_name or None)
            except Exception:
                self.wandb = None

    def log(self, metrics: Dict[str, float], step: int):
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)


def _np_batch_to_device(raw: dict, mesh=None) -> PointCloudBatch:
    ids = raw.get("pc_ids")
    arrays = {k: jnp.asarray(v) for k, v in raw.items() if k != "pc_ids"}
    # HostList: constant-equality wrapper so per-batch ids don't split the
    # jit trace cache (a distinct treedef per batch = ~20 s cache miss/step)
    batch = PointCloudBatch(
        **arrays, pc_ids=HostList(ids) if ids is not None else None
    )
    if mesh is not None:
        from gapartnet_tpu.parallel.mesh import shard_batch

        batch = shard_batch(batch, mesh)
    return batch


class Prefetcher:
    """Decouples host-side batch production from device dispatch: a producer

    thread drains the (already worker-parallel, see _iter_batches) batch
    generator into a bounded queue so the next batch is collated while the
    device crunches the current one.

    `transform` (if given) also runs in the producer thread — passing
    `_np_batch_to_device` there starts the host->device transfer of batch
    N+1 while the device computes batch N.  Through the remote tunnel the
    upload runs at ~12 MB/s (PERF.md), so an 8 MB real-data batch costs
    ~0.7 s when issued synchronously; overlapped, it hides behind the step.
    jax.device_put is thread-safe and the queue preserves order."""

    def __init__(self, gen, depth: int = 2, transform=None):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._done = object()

        def run():
            try:
                for item in gen:
                    self._q.put(item if transform is None else transform(item))
                self._q.put(self._done)
            except BaseException as e:  # re-raised on the consumer side
                self._q.put(e)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


def _pad_trailing(samples, batch_size):
    # pad the trailing partial batch by repeating the last sample with an
    # all-false point mask so batch shape stays static
    while len(samples) < batch_size:
        filler = {k: np.copy(v) if isinstance(v, np.ndarray) else v
                  for k, v in samples[-1].items()}
        filler["point_mask"] = np.zeros_like(filler["point_mask"])
        filler["num_points_per_instance"] = np.zeros_like(
            filler["num_points_per_instance"]
        )
        filler["instance_sem_labels"] = np.full_like(
            filler["instance_sem_labels"], -1
        )
        filler["pc_id"] = "__pad__"
        samples.append(filler)
    return samples


def _iter_batches(dataset: GAPartNetDataset, batch_size: int, drop_last: bool,
                  shuffle_seed: Optional[int] = None, workers: int = 0,
                  lookahead: int = 3):
    """Batch iterator with parallel sample loading.

    `workers` threads load/augment samples concurrently (the reference's
    num_workers=16 dataloader processes, gapartnet.py:457 — threads suffice
    here because loading is NumPy/IO bound and releases the GIL), keeping
    `lookahead` batches in flight.  Augmentation randomness is per-sample
    deterministic (loader.GAPartNetDataset.epoch), so worker count and
    scheduling do not change the data stream.
    """
    order = np.arange(len(dataset))
    if shuffle_seed is not None:
        np.random.RandomState(shuffle_seed).shuffle(order)
        if hasattr(dataset, "epoch"):
            dataset.epoch = shuffle_seed
    n = len(order)
    end = n - (n % batch_size) if drop_last else n
    starts = list(range(0, end, batch_size))
    if workers and workers > 1:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = deque()
            bi = 0
            while bi < len(starts) or pending:
                while bi < len(starts) and len(pending) <= lookahead:
                    idxs = order[starts[bi] : starts[bi] + batch_size]
                    pending.append(
                        [pool.submit(dataset.__getitem__, int(i)) for i in idxs]
                    )
                    bi += 1
                yield collate(
                    _pad_trailing([f.result() for f in pending.popleft()],
                                  batch_size)
                )
        return
    for s in starts:
        idxs = order[s : s + batch_size]
        yield collate(_pad_trailing([dataset[int(i)] for i in idxs], batch_size))


@dataclasses.dataclass
class CkptManager:
    """Top-k checkpointing on a monitored metric (ModelCheckpoint semantics,

    gapartnet.yaml:77-84) via orbax."""

    ckpt_dir: str
    save_top_k: int = 5
    save_last: bool = True
    # monitored metric whose scores the filenames encode.  The slug lives IN
    # the checkpoint name so scores from different monitors (e.g. a
    # percent-scale val/recall_min run extended under val/recall_gmp) can
    # never be compared against each other by filename (ADVICE r4 medium).
    monitor: str = "monitor_metrics/mean_mAP"
    kept: List = dataclasses.field(default_factory=list)  # (score, epoch, path)

    def __post_init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        Path(self.ckpt_dir).mkdir(parents=True, exist_ok=True)

    def save(self, state: TrainState, epoch: int, score: float,
             rng=None, gstep: int = 0):
        slug = self.monitor.rsplit("/", 1)[-1]
        name = f"epoch_{epoch:03d}_{slug}_{score:.2f}"
        path = os.path.abspath(os.path.join(self.ckpt_dir, name))
        ckptr = self._ocp.StandardCheckpointer()
        from flax import serialization as _ser

        payload = dict(
            params=jax.device_get(state.params),
            batch_stats=jax.device_get(state.batch_stats),
            # full-resume extras (Lightning ckpt_path semantics): optimizer
            # moments/count as a pure state dict, the epoch-loop RNG, and the
            # global step — enough to continue bit-identically after a kill
            opt_state=jax.device_get(_ser.to_state_dict(state.opt_state)),
            step=int(jax.device_get(state.step)),
            epoch=epoch,
            gstep=int(gstep),
        )
        if rng is not None:
            payload["rng"] = jax.device_get(rng)
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
        # later epochs win monitor ties (a run whose metric has not moved yet
        # must still keep its NEWEST checkpoints, or resume-from-latest breaks)
        self.kept.append((score, epoch, path))
        self.kept.sort(key=lambda t: (-t[0], -t[1]))
        while len(self.kept) > self.save_top_k:
            worst = self.kept.pop()[-1]
            import shutil

            shutil.rmtree(worst, ignore_errors=True)
        if self.save_last:
            # always-current "last" checkpoint outside the top-k pool
            # (ModelCheckpoint save_last semantics): write fresh, then
            # atomically swap in place of the previous one
            import shutil

            last = os.path.abspath(os.path.join(self.ckpt_dir, "last"))
            tmp = last + f".tmp_{epoch:03d}"
            shutil.rmtree(tmp, ignore_errors=True)
            ckptr.save(tmp, payload)
            ckptr.wait_until_finished()
            shutil.rmtree(last, ignore_errors=True)
            os.rename(tmp, last)

    @staticmethod
    def restore(path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))


def load_warm_start(params, batch_stats, ckpt_path: str):
    """strict=False warm start (reference model.py:132-143): restore matching

    keys, keep fresh values for missing ones, ignore unexpected ones."""
    restored = CkptManager.restore(ckpt_path)
    rp, rb = restored["params"], restored.get("batch_stats", {})

    def merge(dst, src, trail=""):
        if not isinstance(dst, dict):
            return src if src is not None else dst
        out = {}
        for k, v in dst.items():
            if isinstance(src, dict) and k in src:
                out[k] = merge(v, src[k], trail + "/" + k)
            else:
                print(f"missing key (kept init): {trail}/{k}")
                out[k] = v
        return out

    import flax

    params = merge(flax.core.unfreeze(params), rp)
    batch_stats = merge(flax.core.unfreeze(batch_stats), rb)
    return params, batch_stats


def build_datasets(cfg: Config, stage: str,
                   process_index: Optional[int] = None,
                   process_count: Optional[int] = None):
    """Construct the split datasets; under multi-host execution every split's

    file list is sharded round-robin by process (reference
    DistributedShardingFilter, dataset/data_utils.py:15-37) — train shards so
    the global batch covers distinct files, eval shards so each process
    evaluates a disjoint subset (metrics are then averaged in
    evaluate_splits)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    d = cfg.data
    root = Path(d.root_dir)
    common = dict(
        max_points=d.max_points,
        max_instances=d.max_instances,
        few_shot_num=d.few_shot_num,
        nopart_path=d.nopart_path,
    )
    datasets = {}
    if stage == "fit":
        roots = (
            [root / s / "pth" for s in ("train", "val", "test_intra", "test_inter")]
            if d.train_with_all
            else root / "train" / "pth"
        )
        datasets["train"] = GAPartNetDataset(
            roots, shuffle=True, augmentation=True,
            few_shot=d.train_few_shot,
            pos_jitter=d.pos_jitter, color_jitter=d.color_jitter,
            flip_prob=d.flip_prob, rotate_prob=d.rotate_prob, **common,
        )
    for split, few in (
        ("val", d.val_few_shot),
        ("test_intra", d.intra_few_shot),
        ("test_inter", d.inter_few_shot),
    ):
        sub = "val" if split == "val" else split
        datasets[split] = GAPartNetDataset(
            root / sub / "pth", shuffle=False, augmentation=False,
            few_shot=few, **common,
        )
    if process_count > 1:
        from gapartnet_tpu.data.loader import shard_files

        for ds in datasets.values():
            ds.paths = shard_files(ds.paths, process_index, process_count)
    return datasets


def visualize_samples(out, keep, batch, cfg: Config, split: str, limit: int):
    """Test-time qualitative dumps (reference on_test_epoch_end,

    model.py:930-999): per sampled cloud render sem/ins/npcs/bbox panels with
    RANSAC-fitted boxes."""
    import jax as _jax

    from gapartnet_tpu.ops.umeyama import ransac_pose_from_npcs
    from gapartnet_tpu.utils import visu

    prop = out.proposals
    keep = np.asarray(keep)
    ep = np.asarray(prop.entry_point)
    pid = np.asarray(prop.entry_proposal)
    em = np.asarray(prop.entry_mask)
    npcs = np.asarray(out.npcs_preds) if out.npcs_preds is not None else None
    pts = np.asarray(batch.points)
    gt_npcs = np.asarray(batch.gt_npcs) if batch.gt_npcs is not None else None
    ins_gt_all = (
        np.asarray(batch.instance_labels)
        if batch.instance_labels is not None else None
    )
    pmask = np.asarray(batch.point_mask)
    n = pts.shape[1]

    count = 0
    for bi in range(pts.shape[0]):
        if count >= limit or (batch.pc_ids and batch.pc_ids[bi] == "__pad__"):
            continue
        ins_map = np.zeros(n, np.int64)
        npcs_map = np.full((n, 3), 230.0 / 255.0, np.float32)
        bboxes = []
        # GT boxes RANSAC-fit from gt NPCS per GT instance (reference
        # model.py:954-972 renders bbox_gt the same way from gt fields)
        gt_bboxes = []
        if gt_npcs is not None and ins_gt_all is not None:
            for gi in np.unique(ins_gt_all[bi][pmask[bi]]):
                if gi < 0:
                    continue
                sel = pmask[bi] & (ins_gt_all[bi] == gi)
                if sel.sum() <= 10:
                    continue
                fit = ransac_pose_from_npcs(
                    jnp.asarray(gt_npcs[bi][sel]),
                    jnp.asarray(pts[bi, sel, :3]),
                    jnp.ones(int(sel.sum()), bool),
                    _jax.random.PRNGKey(int(gi)),
                )
                if bool(fit.ok):
                    gt_bboxes.append(np.asarray(fit.bbox))
        for rank, p in enumerate(np.nonzero(keep[bi])[0]):
            sel = em[bi] & (pid[bi] == p)
            idxs = ep[bi][sel]
            ins_map[idxs] = rank + 1
            if npcs is not None:
                npcs_map[idxs] = npcs[bi][sel]
                if len(idxs) > 10:
                    fit = ransac_pose_from_npcs(
                        jnp.asarray(npcs[bi][sel] - 0.5),
                        jnp.asarray(pts[bi, idxs, :3]),
                        jnp.ones(len(idxs), bool),
                        _jax.random.PRNGKey(rank),
                    )
                    if bool(fit.ok):
                        bboxes.append(np.asarray(fit.bbox))
        visu.visualize_gapartnet(
            save_root=cfg.trainer.visualize_dir,
            name=batch.pc_ids[bi] if batch.pc_ids else f"sample_{bi}",
            split=split,
            points=pts[bi],
            sem_preds=np.asarray(out.sem_preds)[bi],
            ins_preds=ins_map,
            npcs_preds=npcs_map,
            bboxes=bboxes,
            sem_gt=np.asarray(batch.sem_labels)[bi]
            if batch.sem_labels is not None else None,
            ins_gt=np.asarray(batch.instance_labels)[bi]
            if batch.instance_labels is not None else None,
            npcs_gt=np.asarray(batch.gt_npcs)[bi] + 0.5
            if batch.gt_npcs is not None else None,
            gt_bboxes=gt_bboxes,
            # full 12-panel reference option list (misc/visu.py:66-251);
            # "raw" resolves via visualize_raw_root when the renders kept
            # their camera RGB images (datagen save_maps)
            save_option=visu.ALL_SAVE_OPTIONS,
            raw_img_root=cfg.trainer.visualize_raw_root,
        )
        count += 1
    return count


def eval_capacity_config(mcfg):
    """Eval-path capacity overrides for the zero-overflow contract
    (VERDICT r4 #4).

    Evals cluster and propose from PREDICTED sem labels, which no GT-label
    scan can bound, so the eval graphs pay for headroom the train step does
    not:

    * hash-CCL node table: the unconditional hard bound — nodes per set <=
      clustered points <= max_points (cost linear in the cap, borne only by
      eval steps);
    * max_proposals: 2x the train cap (reference grouping_utils.py:119-137
      never drops proposals; a degraded sem head measured ~1.5x the train
      cap in r4's val split, and the overflow counter + run_test's
      RuntimeError keep this loud if 2x is ever exceeded);
    * dense_grid_capacity >= the ORIGINAL per-cloud proposal cap: the
      batch-pooled live-grid compaction (gcap = B * cap) then covers every
      cloud in the batch running at the original cap SIMULTANEOUSLY.
      A full per-cloud-maximum pool (B * 2 * max_proposals) was measured to
      OOM HBM at B8 — the (gcap, 28^3, C) scatter transients alone are
      ~3 GB — so dense grids keep 2x-headroom-with-counter status rather
      than unconditional, enforced by run_test's RuntimeError.
    """
    if mcfg.clustering_impl == "hash":
        # node cap: unconditional.  cand/degree cap 64 >= the 62-offset
        # probe width: candidate and degree truncation become structurally
        # impossible (ops/hash_ccl.py pads the probe rows to the cap).
        mcfg = dataclasses.replace(
            mcfg, hash_node_capacity=mcfg.max_points,
            hash_cand_cap=64, hash_max_degree=64,
        )
    return dataclasses.replace(
        mcfg,
        max_proposals=2 * mcfg.max_proposals,
        dense_grid_capacity=max(mcfg.dense_grid_capacity, mcfg.max_proposals),
    )


def make_reduced_eval_step(model, cfg: Config, do_instance: bool):
    """Eval step that reduces on DEVICE and returns only small arrays.

    Fetching whole ModelOutputs per eval batch moves (B, N)-sized tensors
    host-side (slow through a remote-device tunnel); AP/mIoU only need the
    per-proposal keep mask, scores, classes, IoUs and the (C, C) confusion
    matrix, all computed here inside the jitted step.
    """
    import jax.numpy as jnp

    from gapartnet_tpu.ops.segment import segment_min, segment_sum

    flags = dict(do_cluster=do_instance, do_score=do_instance, do_npcs=do_instance)
    c = cfg.model.num_part_classes

    @jax.jit
    def step(state: TrainState, batch: PointCloudBatch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, **flags,
        )
        labels = batch.sem_labels
        valid = batch.point_mask & (labels >= 0)
        fused = jnp.clip(labels, 0, c - 1) * c + jnp.clip(out.sem_preds, 0, c - 1)
        conf = segment_sum(
            jnp.ones(fused.size, jnp.float32), fused.reshape(-1), c * c,
            mask=valid.reshape(-1),
        ).reshape(c, c)
        res = dict(all_accu=out.all_accu, pixel_accu=out.pixel_accu, conf=conf)
        for cname in sorted(out.counters or ()):
            res[f"counters/{cname}"] = jnp.sum(out.counters[cname]).astype(
                jnp.float32
            )
        if do_instance:
            prop = out.proposals
            n = batch.point_mask.shape[1]
            # capacities come from the MODEL's config, not cfg.model: the
            # eval model may carry widened eval-path caps (see
            # eval_capacity_config) while cfg.model keeps the train shapes
            keep = select_eval_proposals(out, model.cfg, model.cfg.max_points)
            # predicted class per proposal = sem pred at its lowest-index
            # point (reference model.py:825)
            rep_point = jax.vmap(
                lambda ep, pid, m: segment_min(
                    jnp.where(m, ep, n), pid.clip(0), model.cfg.max_proposals,
                    mask=m,
                )
            )(prop.entry_point, prop.entry_proposal, prop.entry_mask)
            rep_cls = jnp.take_along_axis(
                out.sem_preds, jnp.clip(rep_point, 0, n - 1), axis=1
            )
            res.update(
                keep=keep, rep_cls=rep_cls, scores=out.score_preds,
                ious=out.ious,
            )
        return res

    return step


def _records_from_reduced(r) -> tuple:
    """Host-side flattening of a reduced eval batch for APEvaluator.add

    (same semantics as eval/ap.batch_to_records)."""
    keep = np.asarray(r["keep"])
    scores = np.asarray(r["scores"])
    rep_cls = np.asarray(r["rep_cls"])
    ious = np.asarray(r["ious"]) if r.get("ious") is not None else None
    flat_scores, flat_cls, flat_sample, flat_ious = [], [], [], []
    for bi in range(keep.shape[0]):
        sel = np.nonzero(keep[bi])[0]
        flat_scores.append(scores[bi, sel])
        flat_cls.append(rep_cls[bi, sel])
        flat_sample.append(np.full(len(sel), bi))
        if ious is not None:
            flat_ious.append(ious[bi, sel])
    return (
        np.concatenate(flat_scores),
        np.concatenate(flat_cls),
        np.concatenate(flat_sample),
        np.concatenate(flat_ious) if ious is not None else None,
    )


def _expected_eval_keys(eval_step, state, cfg: Config, do_instance: bool):
    """Deterministic global metric key set for the cross-process mean.

    jax.eval_shape (abstract trace, no compile or execution) discovers the
    reduced eval step's counter keys so every process agrees on the gather
    vector layout regardless of which of its file shards were empty.
    """
    b = max(cfg.data.val_batch_size, 1)
    n = cfg.model.max_points
    mi = cfg.model.max_instances

    def f32(*s):
        return jax.ShapeDtypeStruct(s, jnp.float32)

    def i32(*s):
        return jax.ShapeDtypeStruct(s, jnp.int32)

    dummy = PointCloudBatch(
        points=f32(b, n, cfg.model.in_channels),
        point_mask=jax.ShapeDtypeStruct((b, n), jnp.bool_),
        sem_labels=i32(b, n),
        instance_labels=i32(b, n),
        gt_npcs=f32(b, n, 3),
        instance_regions=f32(b, n, 9),
        num_points_per_instance=i32(b, mi),
        instance_sem_labels=i32(b, mi),
        num_instances=i32(b),
    )
    out = jax.eval_shape(eval_step, state, dummy)
    counter_keys = sorted(k for k in out if k.startswith("counters/"))

    per_split = ["AP@50", "mAP", "all_accu", "pixel_accu", "miou"]
    # per-class recall diagnostics + balance monitors (locally absent GT
    # classes ride as NaN and drop out of the cross-process nanmean)
    per_split += [
        f"recall_{PART_ID2NAME[ci]}"
        for ci in range(1, cfg.model.num_part_classes)
    ] + ["recall_macro", "recall_min", "recall_gmp"]
    if do_instance:
        per_split += [
            f"AP@50_{PART_ID2NAME[ci]}"
            for ci in range(1, cfg.model.num_part_classes)
        ]
    keys = []
    for split in SPLITS:
        keys += [f"{split}/{m}" for m in per_split]
        keys += [f"{split}/{c}" for c in counter_keys]
    keys += [
        f"monitor_metrics/mean_{m}"
        for m in ("all_accu", "pixel_accu", "imou", "AP@50", "mAP")
    ]
    return keys


def evaluate_splits(model, state, cfg: Config, datasets, epoch: int,
                    logger: MetricLogger, step: int, do_instance: bool,
                    mesh=None, step_cache: Optional[dict] = None):
    """Validation/test over the three splits; returns the monitor metric.

    Metric names follow model.py:694-805/859-1049 exactly.  When a device
    mesh is given, eval batches are sharded over it (the trailing batch is
    padded to full size, so shapes stay divisible).  Under multi-host
    execution each process evaluates its file shard and scalar metrics are
    averaged across processes — the reference's `sync_dist=True` mean
    (model.py:609-657).
    """
    # re-use jitted step functions across eval calls: a fresh jit wrapper per
    # call has an empty trace cache, so each per-epoch validation would pay a
    # retrace + XLA persistent-cache deserialization (tens of seconds on the
    # single-core tunnel host)
    if step_cache is None:
        step_cache = {}
    if ("reduced", do_instance) not in step_cache:
        step_cache[("reduced", do_instance)] = make_reduced_eval_step(
            model, cfg, do_instance
        )
    eval_step = step_cache[("reduced", do_instance)]
    full_step = step_cache.get("full")  # built lazily, only for visualization
    num_classes = cfg.model.num_part_classes

    split_stats: Dict[str, Dict[str, float]] = {}
    metrics: Dict[str, float] = {}
    for split in SPLITS:
        ds = datasets[split]
        evaluator = APEvaluator(num_classes)
        conf = np.zeros((num_classes, num_classes), np.int64)
        accu_sum, pix_sum, batches = 0.0, 0.0, 0
        counter_sums: Dict[str, float] = {}
        visualized = 0
        # dispatch every batch, queue the (small, reduced) device results,
        # fetch ONCE per split: each per-batch float()/asarray() here used to
        # cost a full device->host round trip (~150 ms through the remote
        # tunnel), making batched eval round-trip-bound
        pending = []
        for batch in Prefetcher(
            _iter_batches(ds, cfg.data.val_batch_size, drop_last=False,
                          workers=cfg.data.num_workers),
            transform=lambda raw: _np_batch_to_device(raw, mesh),
        ):
            r = eval_step(state, batch)
            pending.append((r, batch.instance_sem_labels))
            batches += 1
            if (
                do_instance
                and cfg.trainer.visualize
                and visualized < cfg.trainer.visualize_sample_num
            ):
                if full_step is None:
                    full_step = step_cache["full"] = make_eval_step(
                        model, do_cluster=True, do_score=True, do_npcs=True
                    )
                out = full_step(state, batch)
                visualized += visualize_samples(
                    out, r["keep"], batch, cfg, split,
                    cfg.trainer.visualize_sample_num - visualized,
                )
        if batches == 0:
            continue
        for r, inst_sem_labels in jax.device_get(pending):
            accu_sum += float(r["all_accu"])
            pix_sum += float(r["pixel_accu"])
            conf += np.asarray(r["conf"]).astype(np.int64)
            for k in r:
                if k.startswith("counters/"):
                    counter_sums[k] = counter_sums.get(k, 0.0) + float(r[k])
            if do_instance and r.get("ious") is not None:
                s, c, si, io = _records_from_reduced(r)
                evaluator.add(s, c, si, io, np.asarray(inst_sem_labels))
        all_accu = accu_sum / batches
        pixel_accu = pix_sum / batches
        # THE mIoU definition (one definition, used everywhere): a single
        # confusion matrix over the whole split's valid (label >= 0) points,
        # IoU = tp/union per class, classes absent from preds AND labels
        # count as 1.0.  This equals the reference's kornia mean_iou over the
        # concatenated split predictions (model.py:878-883, losses.py:21-31)
        # except for the absent-class case, where kornia yields 0/0 = NaN;
        # models/losses.mean_iou implements the same definition on device.
        tp = np.diag(conf)
        total = conf.sum(0) + conf.sum(1) - tp
        iou = np.where(total > 0, tp / np.maximum(total, 1e-8), 1.0)
        miou = float(iou.mean())
        # per-class sem recall (beyond the reference's aggregate metrics):
        # conf rows are GT classes, so recall_c = tp_c / gt_c.  This is the
        # first-line diagnostic for the all-background valley — a collapse
        # shows every part-class recall falling together while all_accu
        # (background-dominated) rises
        gt_count = conf.sum(1)
        class_recalls = []
        for ci in range(1, num_classes):
            if gt_count[ci] > 0:
                rec = float(tp[ci] / gt_count[ci]) * 100
                metrics[f"{split}/recall_{PART_ID2NAME[ci]}"] = rec
                class_recalls.append(rec)
        if class_recalls:
            # macro (class-balanced) recall over present part classes: the
            # monitor for sem-phase checkpoint selection — pixel_accu is
            # dominated by the largest class (doors), so its best checkpoint
            # can be the WORST for small-part recall (phase-A finding,
            # PERF.md round 4)
            metrics[f"{split}/recall_macro"] = float(np.mean(class_recalls))
            # maximin recall: macro's best checkpoint can be a knife-edge
            # winner-take-all state (79/7/6 beats 30/20/10 on the mean);
            # the min over present part classes only scores states that
            # predict EVERY class at once (phase-A handoff finding,
            # PERF.md round 4 part 5)
            metrics[f"{split}/recall_min"] = float(np.min(class_recalls))
            # balance-gated monitor: geometric mean of (1 + recall_c) scaled
            # by foreground pixel accuracy.  recall_min alone selected a
            # DEGENERATE all-handle epoch-1 state (min recall nonzero there
            # only because every point was called "handle"; pixel_accu 3.6%
            # == the all-handle value) over the genuinely learned endpoint
            # (PERF.md round 4 part 5).  The pixel_accu factor zeroes out
            # predict-one-class-everywhere states while the geometric mean
            # still rewards covering every class at once.
            metrics[f"{split}/recall_gmp"] = float(
                np.exp(np.mean(np.log1p(class_recalls))) * pixel_accu
            )

        if do_instance:
            m = evaluator.compute_map()
            ap50, mAP, per_class = m["AP50"], m["mAP"], m["AP50_per_class"]
            for ci in range(1, num_classes):
                metrics[f"{split}/AP@50_{PART_ID2NAME[ci]}"] = per_class[ci - 1] * 100
        else:
            ap50, mAP = 0.0, 0.0
        # capacity-overflow counters: nonzero means a fixed-shape capacity
        # clipped real eval data and AP may be silently depressed — warn
        # loudly instead of relying on metric-stream readers
        for k, v in counter_sums.items():
            metrics[f"{split}/{k}"] = v
            if v > 0:
                print(
                    f"[gapartnet_tpu] WARNING {split}/{k} = {v:.0f}: a "
                    "fixed-shape capacity clipped real data this eval"
                )
        metrics[f"{split}/AP@50"] = ap50 * 100
        metrics[f"{split}/mAP"] = mAP * 100
        metrics[f"{split}/all_accu"] = all_accu * 100
        metrics[f"{split}/pixel_accu"] = pixel_accu * 100
        metrics[f"{split}/miou"] = miou * 100
        split_stats[split] = dict(
            all_accu=all_accu, pixel_accu=pixel_accu, miou=miou,
            ap50=ap50, mAP=mAP,
        )

    # monitor metrics = mean(test_intra, test_inter), keyed by split NAME so
    # an empty val split cannot shift which splits are averaged
    # (model.py:1024-1046)
    if "test_intra" in split_stats and "test_inter" in split_stats:
        intra, inter = split_stats["test_intra"], split_stats["test_inter"]
        metrics["monitor_metrics/mean_all_accu"] = (intra["all_accu"] + inter["all_accu"]) / 2 * 100
        metrics["monitor_metrics/mean_pixel_accu"] = (intra["pixel_accu"] + inter["pixel_accu"]) / 2 * 100
        metrics["monitor_metrics/mean_imou"] = (intra["miou"] + inter["miou"]) / 2 * 100
        metrics["monitor_metrics/mean_AP@50"] = (intra["ap50"] + inter["ap50"]) / 2 * 100
        metrics["monitor_metrics/mean_mAP"] = (intra["mAP"] + inter["mAP"]) / 2 * 100

    if jax.process_count() > 1:
        # cross-process metric mean (reference sync_dist=True): every process
        # evaluated its own file shard (build_datasets), average the scalars.
        # The key set is built deterministically from (cfg, do_instance) — NOT
        # from the locally observed metrics — so processes whose file shard
        # left some split empty (few-shot val smaller than process_count)
        # still enter the collective with an identically-shaped vector;
        # locally missing entries ride as NaN and drop out of the nanmean.
        from jax.experimental import multihost_utils

        keys = _expected_eval_keys(eval_step, state, cfg, do_instance)
        vec = np.asarray([metrics.get(k, np.nan) for k in keys], np.float32)
        gathered = np.asarray(multihost_utils.process_allgather(vec))
        with np.errstate(invalid="ignore"):
            means = np.nanmean(gathered, axis=0)
        metrics = {
            k: float(v) for k, v in zip(keys, means) if not np.isnan(v)
        }

    logger.log(metrics, step)
    # checkpoint-selection metric: ModelCheckpoint `monitor` semantics
    # (reference gapartnet.yaml:79); configurable so staged warm-start
    # workflows can pick e.g. val/pixel_accu for a sem-only phase
    return metrics.get(cfg.trainer.monitor, 0.0), metrics


def _apply_auto_capacity(cfg: Config, datasets) -> None:
    """Size model.level_capacities from the real datasets (data/capacity.py).

    Mutates cfg.model (dataclasses.replace — the model config is frozen) so
    every graph built afterwards compiles at data-fitted voxel capacities.
    """
    if not cfg.data.auto_capacity or cfg.model.backbone_type != "SparseUNet":
        return
    from gapartnet_tpu.data.capacity import (
        scan_dataset_shapes,
        scan_hash_capacities,
    )

    caps, extent = scan_dataset_shapes(
        [d for d in datasets.values() if d is not None],
        cfg.model.voxel_size,
        len(cfg.model.level_capacity_divisors),
        cfg.model.max_points,
    )
    # hash-CCL clustering tables: sized so the round-4 contract holds — the
    # clustering path has NO capacity that drops graph structure silently on
    # this data (counters stay zero under GAPARTNET_CHECKS; VERDICT r3 #2)
    node_cap, cand_cap, degree = scan_hash_capacities(
        [d for d in datasets.values() if d is not None],
        cfg.model.ball_query_radius,
        max_points=cfg.model.max_points,
    )
    cfg.model = dataclasses.replace(
        cfg.model, level_capacities=caps, input_grid_extent=extent,
        hash_node_capacity=node_cap, hash_cand_cap=cand_cap,
        hash_max_degree=degree,
    )
    print(
        f"[gapartnet_tpu] auto_capacity: level capacities {caps}, "
        f"grid extent {extent}, hash nodes/set {node_cap}, "
        f"hash cand cap {cand_cap}, max degree {degree}", flush=True,
    )


def fit(cfg: Config):
    import jax as _jax

    datasets = build_datasets(cfg, "fit")
    _apply_auto_capacity(cfg, datasets)
    model = GAPartNet(cfg.model)
    # fit-time evals cluster with PREDICTED sem labels, whose (cell, label)
    # fragmentation no GT-label scan bounds — the same failure that
    # overflowed test_intra by 1113 nodes in the r4 artifact.  Evals
    # (not train steps) therefore pay for the unconditional hard bound the
    # standalone test() path uses: nodes/set <= clustered points <=
    # max_points (VERDICT r4 #4).  Param shapes are config-independent, so
    # the eval model shares the train state.
    eval_model = (
        GAPartNet(eval_capacity_config(cfg.model))
        if cfg.data.auto_capacity else model
    )
    logger = MetricLogger(
        cfg.trainer.log_file, cfg.trainer.use_wandb, run_name=run_name(cfg)
    )
    optimizer = adam(cfg.trainer.learning_rate, cfg.trainer.freeze_prefixes)

    # data-parallel mesh over all local devices (batch must divide evenly)
    mesh = None
    if _jax.device_count() > 1 and cfg.data.train_batch_size % _jax.device_count() == 0:
        from gapartnet_tpu.parallel.mesh import make_mesh, replicate_tree

        mesh = make_mesh()

    example = _np_batch_to_device(
        next(_iter_batches(datasets["train"], cfg.data.train_batch_size, True, 0)),
        mesh,
    )
    state = create_train_state(model, example, optimizer, seed=cfg.trainer.seed)

    rng = jax.random.PRNGKey(cfg.trainer.seed)
    gstep = 0
    start_epoch = 0
    if cfg.trainer.ckpt_path:
        # FULL resume: params + batch_stats + opt_state + rng + epoch/step,
        # continuing the run bit-identically (Lightning `fit --ckpt_path`)
        from flax import serialization as _ser

        restored = CkptManager.restore(cfg.trainer.ckpt_path)
        state = state._replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=_ser.from_state_dict(state.opt_state, restored["opt_state"]),
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        if "rng" in restored:
            rng = jnp.asarray(restored["rng"])
        gstep = int(restored.get("gstep", 0))
        start_epoch = int(restored["epoch"]) + 1
        print(f"[gapartnet_tpu] full resume from {cfg.trainer.ckpt_path} "
              f"at epoch {start_epoch}")
    if mesh is not None:
        from gapartnet_tpu.parallel.mesh import replicate_tree

        state = replicate_tree(state, mesh)
    if cfg.trainer.resume_ckpt:
        p, b = load_warm_start(state.params, state.batch_stats, cfg.trainer.resume_ckpt)
        state = state._replace(params=p, batch_stats=b)

    ckpts = CkptManager(cfg.trainer.ckpt_dir, cfg.trainer.save_top_k,
                        monitor=cfg.trainer.monitor)
    step_fns = {}
    eval_step_cache: dict = {}
    for epoch in range(start_epoch, cfg.trainer.max_epochs):
        flags = stage_flags(epoch, cfg.trainer.training_schedule)
        key = tuple(sorted(flags.items()))
        if key not in step_fns:
            step_fns[key] = make_train_step(
                model, optimizer,
                freeze_prefixes=cfg.trainer.freeze_prefixes, **flags,
            )
        train_step = step_fns[key]

        t0 = time.time()
        losses = []
        batches = Prefetcher(
            _iter_batches(
                datasets["train"], cfg.data.train_batch_size, drop_last=True,
                shuffle_seed=cfg.trainer.seed + epoch,
                workers=cfg.data.num_workers,
            ),
            transform=lambda raw: _np_batch_to_device(raw, mesh),
        )
        for batch in batches:
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, batch, sub)
            losses.append(m)
            gstep += 1
        if losses:
            # ONE batched transfer for the whole epoch's metric dicts: a
            # per-key float() here would cost a ~150 ms tunnel round trip per
            # scalar (keys x batches fetches), dwarfing the steps themselves
            losses = jax.device_get(losses)
            mean = {
                "train_" + k if not k.startswith("loss") else f"train_loss/{k.split('/')[-1]}":
                    float(np.mean([float(x[k]) for x in losses]))
                for k in losses[0]
            }
            mean["epoch"] = epoch
            mean["epoch_time_s"] = time.time() - t0
            for k, v in mean.items():
                if "counters/" in k and v > 0:
                    print(
                        f"[gapartnet_tpu] WARNING {k} = {v:.1f}/step: a "
                        "fixed-shape capacity clipped real data this epoch"
                    )
            logger.log(mean, gstep)

        if (epoch + 1) % cfg.trainer.val_every_n_epochs == 0:
            # eval batches shard over the mesh only when val_batch_size is
            # itself divisible (fit() gates the mesh on train_batch_size;
            # test() already applies this guard)
            eval_mesh = (
                mesh
                if mesh is not None
                and cfg.data.val_batch_size % _jax.device_count() == 0
                else None
            )
            monitor, _ = evaluate_splits(
                eval_model, state, cfg, datasets, epoch, logger, gstep,
                do_instance=flags["do_score"], mesh=eval_mesh,
                step_cache=eval_step_cache,
            )
            ckpts.save(state, epoch, monitor, rng=rng, gstep=gstep)
    return state


def test(cfg: Config):
    datasets = build_datasets(cfg, "test")
    _apply_auto_capacity(cfg, datasets)
    if cfg.data.auto_capacity:
        # Eval clusters and proposes with PREDICTED sem labels, so no
        # GT-label scan bounds it — a degraded sem head overflowed the
        # scanned 6144 nodes/set by 1113 AND dropped 69 proposals in the r4
        # artifact (runs/sustained_r4/test_last.jsonl).  The eval path pays
        # for the headroom instead (node cap unconditional, proposal caps
        # 2x + counters; see eval_capacity_config).  Node-cap cost is
        # linear (~0.06 ms/node at B8, PERF.md round 4) and borne only by
        # eval graphs; fit-time train steps keep the scanned caps.
        cfg.model = eval_capacity_config(cfg.model)
    model = GAPartNet(cfg.model)
    logger = MetricLogger(cfg.trainer.log_file, cfg.trainer.use_wandb)
    optimizer = adam(cfg.trainer.learning_rate)

    mesh = None
    if jax.device_count() > 1 and cfg.data.val_batch_size % jax.device_count() == 0:
        from gapartnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    first_split = next(s for s in SPLITS if len(datasets[s]) > 0)
    example = _np_batch_to_device(
        next(_iter_batches(datasets[first_split], cfg.data.val_batch_size, False)),
        mesh,
    )
    state = create_train_state(model, example, optimizer, seed=cfg.trainer.seed)
    if mesh is not None:
        from gapartnet_tpu.parallel.mesh import replicate_tree

        state = replicate_tree(state, mesh)
    if cfg.trainer.resume_ckpt:
        p, b = load_warm_start(state.params, state.batch_stats, cfg.trainer.resume_ckpt)
        state = state._replace(params=p, batch_stats=b)

    _, metrics = evaluate_splits(
        model, state, cfg, datasets, 0, logger, 0, do_instance=True, mesh=mesh,
    )
    for k in sorted(metrics):
        print(f"{k}: {metrics[k]:.2f}")
    return metrics
