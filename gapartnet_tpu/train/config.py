"""Configuration: gapartnet.yaml-compatible schema + dotted CLI overrides.

Reads the reference's LightningCLI YAML layout (gapartnet/gapartnet.yaml:
model.class_path/init_args, data.init_args, trainer, seed_everything) into
plain dataclasses, and accepts the same dotted override syntax
(--model.init_args.X val) the reference CLI uses (train.sh:1-18).
"""

import ast
import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import yaml

from gapartnet_tpu.models.gapartnet import GAPartNetConfig


@dataclasses.dataclass
class DataConfig:
    root_dir: str = "data/GAPartNet_All"
    max_points: int = 20000
    voxel_size: Tuple[float, float, float] = (0.01, 0.01, 0.01)
    train_batch_size: int = 64
    val_batch_size: int = 32
    test_batch_size: int = 32
    num_workers: int = 16
    pos_jitter: float = 0.1
    color_jitter: float = 0.3
    flip_prob: float = 0.3
    rotate_prob: float = 0.3
    train_few_shot: bool = False
    val_few_shot: bool = False
    intra_few_shot: bool = False
    inter_few_shot: bool = False
    few_shot_num: int = 640
    train_with_all: bool = False
    nopart_path: str = "data/nopart.txt"
    max_instances: int = 64
    # scan the datasets at setup and size model.level_capacities from real
    # per-level voxel occupancy (data/capacity.py) instead of the divisor
    # schedule.  Costs one pass over <=48 samples/split on the host.
    auto_capacity: bool = False


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 700
    learning_rate: float = 1e-3
    training_schedule: Tuple[int, int] = (5, 10)
    seed: int = 23333
    ckpt_dir: str = "checkpoints"
    save_top_k: int = 5
    monitor: str = "monitor_metrics/mean_mAP"
    log_file: str = "metrics.jsonl"
    resume_ckpt: str = ""           # warm-start (reference model.py:132-143)
    # top-level param modules excluded from optimization (and from BN-stat
    # updates): e.g. ("backbone", "sem_seg_head", "offset_mlp0",
    # "offset_bn", "offset_mlp1") freezes the warm-started trunk so the
    # all-stages phase can only ADD instance AP (see train/loop.adam)
    freeze_prefixes: Tuple[str, ...] = ()
    ckpt_path: str = ""             # FULL resume: params+opt_state+rng+epoch
                                    # (Lightning `fit --ckpt_path` semantics)
    val_every_n_epochs: int = 1
    use_wandb: bool = False
    debug: bool = True
    # test-time visualization (reference visualize_cfg, gapartnet.yaml:35-42)
    visualize: bool = False
    visualize_dir: str = "visu"
    visualize_sample_num: int = 10
    # raw camera RGB renders for the "raw" panel, looked up as
    # <root>/<name>.png (reference visualize_cfg.RAW_IMG_ROOT)
    visualize_raw_root: str = ""


@dataclasses.dataclass
class Config:
    model: GAPartNetConfig
    data: DataConfig
    trainer: TrainerConfig


_MODEL_KEY_MAP = {
    # init_args name (reference) -> GAPartNetConfig field
    "in_channels": "in_channels",
    "num_part_classes": "num_part_classes",
    "ignore_sem_label": "ignore_sem_label",
    "use_sem_focal_loss": "use_sem_focal_loss",
    "sem_focal_alpha": "sem_focal_alpha",
    "use_sem_dice_loss": "use_sem_dice_loss",
    "symmetry_indices": "symmetry_indices",
    "val_score_threshold": "val_score_threshold",
    "val_min_num_points_per_proposal": "val_min_num_points_per_proposal",
    "val_nms_iou_threshold": "val_nms_iou_threshold",
    "val_ap_iou_threshold": "val_ap_iou_threshold",
    # TPU-specific extensions, allowed in yaml too
    "max_points": "max_points",
    "max_proposals": "max_proposals",
    "max_instances": "max_instances",
    "voxel_size": "voxel_size",
    "backbone_type": "backbone_type",
    "clustering_impl": "clustering_impl",
    "hash_node_capacity": "hash_node_capacity",
    "hash_cand_cap": "hash_cand_cap",
    "hash_max_degree": "hash_max_degree",
    "conv_compute_dtype": "conv_compute_dtype",
    "rulebook_impl": "rulebook_impl",
    "input_grid_extent": "input_grid_extent",
    "proposal_voxel_capacity": "proposal_voxel_capacity",
    "dense_grid_capacity": "dense_grid_capacity",
    "remat_blocks": "remat_blocks",
}

_INSTANCE_SEG_KEYS = {
    "ball_query_radius",
    "max_num_points_per_query",
    "min_num_points_per_proposal",
    "max_num_points_per_query_shift",
    "score_fullscale",
    "score_scale",
}


def _coerce(value: Any):
    if isinstance(value, str):
        try:
            return ast.literal_eval(value)
        except (ValueError, SyntaxError):
            return value
    return value


def _to_tuple(x):
    return tuple(x) if isinstance(x, (list, tuple)) else x


def config_from_yaml_dict(raw: Dict[str, Any]) -> Config:
    model_args = dict((raw.get("model") or {}).get("init_args") or {})
    data_args = dict((raw.get("data") or {}).get("init_args") or {})
    trainer_args = dict(raw.get("trainer") or {})

    mkw: Dict[str, Any] = {}
    if "backbone_type" in model_args:
        mkw["backbone_type"] = model_args["backbone_type"]
    backbone_cfg = model_args.pop("backbone_cfg", {}) or {}
    if "channels" in backbone_cfg:
        mkw["channels"] = _to_tuple(backbone_cfg["channels"])
    if "block_repeat" in backbone_cfg:
        mkw["block_repeat"] = backbone_cfg["block_repeat"]
    iseg = model_args.pop("instance_seg_cfg", {}) or {}
    for k, v in iseg.items():
        if k in _INSTANCE_SEG_KEYS:
            mkw[k] = v
    for k, v in model_args.items():
        if k in _MODEL_KEY_MAP:
            mkw[_MODEL_KEY_MAP[k]] = _to_tuple(v)
    model = GAPartNetConfig(**mkw)

    dkw = {
        f.name: _to_tuple(data_args[f.name])
        for f in dataclasses.fields(DataConfig)
        if f.name in data_args
    }
    dkw.setdefault("max_points", model.max_points)
    data = DataConfig(**dkw)

    tkw: Dict[str, Any] = {}
    if "max_epochs" in trainer_args:
        tkw["max_epochs"] = trainer_args["max_epochs"]
    tkw["learning_rate"] = model_args.get("learning_rate", 1e-3)
    tkw["training_schedule"] = _to_tuple(
        model_args.get("training_schedule", (5, 10))
    )
    tkw["seed"] = raw.get("seed_everything", 23333)
    tkw["resume_ckpt"] = model_args.get("ckpt", "")
    tkw["ckpt_path"] = trainer_args.get("ckpt_path", "")
    tkw["debug"] = model_args.get("debug", True)
    vcfg = model_args.get("visualize_cfg", {}) or {}
    if vcfg:
        tkw["visualize"] = bool(vcfg.get("visualize", False))
        tkw["visualize_dir"] = vcfg.get("SAVE_ROOT", vcfg.get("visualize_dir", "visu"))
        tkw["visualize_sample_num"] = vcfg.get("sample_num", 10)
        tkw["visualize_raw_root"] = vcfg.get(
            "RAW_IMG_ROOT", vcfg.get("visualize_raw_root", "")
        )
    for cb in trainer_args.get("callbacks", []) or []:
        if "ModelCheckpoint" in str(cb.get("class_path", "")):
            ia = cb.get("init_args", {}) or {}
            tkw["save_top_k"] = ia.get("save_top_k", 5)
            tkw["monitor"] = ia.get("monitor", "monitor_metrics/mean_mAP")
    trainer = TrainerConfig(**tkw)

    return Config(model=model, data=data, trainer=trainer)


def load_config(path: Optional[str], overrides: Optional[List[str]] = None) -> Config:
    """Load YAML + apply dotted overrides like

    --model.init_args.training_schedule [0,0] (the reference CLI syntax)."""
    raw: Dict[str, Any] = {}
    if path:
        raw = yaml.safe_load(Path(path).read_text()) or {}
    for item in overrides or []:
        key, value = item
        parts = key.lstrip("-").split(".")
        node = raw
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _coerce(value)
    return config_from_yaml_dict(raw)


def parse_cli(argv: List[str]):
    """(subcommand, config_path, [(dotted_key, value), ...])."""
    if not argv or argv[0] not in ("fit", "test"):
        raise SystemExit("usage: train.py {fit,test} [-c config.yaml] [--dotted.key value]")
    sub = argv[0]
    cfg_path = None
    overrides = []
    i = 1
    while i < len(argv):
        a = argv[i]
        if a in ("-c", "--config"):
            cfg_path = argv[i + 1]
            i += 2
        elif a.startswith("--"):
            overrides.append((a[2:], argv[i + 1]))
            i += 2
        else:
            raise SystemExit(f"unexpected argument {a}")
    return sub, cfg_path, overrides
