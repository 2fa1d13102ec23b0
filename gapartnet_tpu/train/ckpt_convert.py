"""Reference (torch/Lightning) checkpoint -> flax parameter conversion.

Maps the reference GAPartNet state_dict naming (network/model.py module tree:
backbone / sem_seg_head / offset_head / score_unet / score_head / npcs_unet /
npcs_head, with spconv SparseSequential indices) onto this framework's
parameter tree (models/gapartnet.py + models/backbone.py), for AP-parity
evaluation with the released `release.ckpt` / `all_best_7816.ckpt`
(structure/utils.py:325, README "Inference").

Layout notes
------------
* torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose.
* spconv SubMConv3d k=3 weight: spconv2 stores KRSC (out, k0, k1, k2, in)
  with kernel spatial dim i aligned to coordinate column i of the indices —
  which the reference feeds in point-axis order (x, y, z): epic_ops voxelize
  output goes straight into SparseConvTensor (dataset/gapartnet.py:188-195,
  structure/point_cloud.py:145-162).  Our kernel is (27, in, out) with taps
  enumerated x-major ((dx,dy,dz), dz fastest) over [-1,0,1], applied as
  cross-correlation — so the correct `spatial_order` is "xyz" (keep the
  stored spatial axes; no flip).  PROVEN mechanically by the dense-grid
  oracle tests in tests/test_ckpt_layout.py: on a fully-occupied grid the
  "xyz" conversion equals lax.conv_general_dilated for subm/strided/inverse
  convs and "zyx" does not.  "zyx" is kept only as an A/B escape hatch.
* SparseConv3d / SparseInverseConv3d k=2 weights -> our (8, in, out) with
  pos = x<<2 | y<<1 | z.
* BatchNorm: weight->scale, bias->bias, running_mean/var -> batch_stats.
"""

from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray, spatial_order: str = "xyz") -> np.ndarray:
    """(out, k, k, k, in) -> (k^3, in, out) with x-major tap enumeration."""
    assert w.ndim == 5, w.shape
    out_c, k0, k1, k2, in_c = w.shape
    if spatial_order == "zyx":
        # stored dims are (kz, ky, kx): transpose to (kx, ky, kz)
        w = np.transpose(w, (3, 2, 1, 0, 4))  # kx, ky, kz, out, in
    else:
        w = np.transpose(w, (1, 2, 3, 0, 4))  # kx, ky, kz, out, in
    k3 = k0 * k1 * k2
    w = w.reshape(k3, out_c, in_c)
    return np.transpose(w, (0, 2, 1))  # (k^3, in, out)


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _bn(prefix: str, sd: Dict[str, np.ndarray]):
    params = {
        "scale": sd[prefix + ".weight"],
        "bias": sd[prefix + ".bias"],
    }
    stats = {
        "mean": sd[prefix + ".running_mean"],
        "var": sd[prefix + ".running_var"],
    }
    return params, stats


def _resblock(prefix: str, sd, spatial_order):
    """ResBlock (backbone.py:8-49): conv1/conv2 SparseSequential(SubM, BN);

    shortcut either Identity or SparseSequential(SubM k=1, BN)."""
    p: Dict = {}
    s: Dict = {}
    p["conv1"] = {"kernel": _conv_kernel(sd[prefix + ".conv1.0.weight"], spatial_order)}
    p["bn1"], s["bn1"] = _bn(prefix + ".conv1.1", sd)
    p["conv2"] = {"kernel": _conv_kernel(sd[prefix + ".conv2.0.weight"], spatial_order)}
    p["bn2"], s["bn2"] = _bn(prefix + ".conv2.1", sd)
    if prefix + ".shortcut.0.weight" in sd:
        w = sd[prefix + ".shortcut.0.weight"]
        # k=1 subm conv: (out, 1, 1, 1, in) -> (in, out)
        p["shortcut_kernel"] = np.transpose(w.reshape(w.shape[0], w.shape[-1]))
        sp, ss = _bn(prefix + ".shortcut.1", sd)
        p["shortcut_bn"] = sp
        s["shortcut_bn"] = ss
    return p, s


def _ublock(prefix: str, sd, num_levels: int, block_repeat: int, spatial_order):
    p: Dict = {}
    s: Dict = {}
    for r in range(block_repeat):
        p[f"enc{r}"], s[f"enc{r}"] = _resblock(
            f"{prefix}.encoder_blocks.{r}", sd, spatial_order
        )
    if num_levels > 1:
        p["down_kernel"] = _conv_kernel(
            sd[prefix + ".downsample.0.weight"], spatial_order
        )
        p["down_bn"], s["down_bn"] = _bn(prefix + ".downsample.1", sd)
        p["ublock"], s["ublock"] = _ublock(
            prefix + ".ublock", sd, num_levels - 1, block_repeat, spatial_order
        )
        p["up_kernel"] = _conv_kernel(
            sd[prefix + ".upsample.0.weight"], spatial_order
        )
        p["up_bn"], s["up_bn"] = _bn(prefix + ".upsample.1", sd)
        for r in range(block_repeat):
            p[f"dec{r}"], s[f"dec{r}"] = _resblock(
                f"{prefix}.decoder_blocks.{r}", sd, spatial_order
            )
    return p, s


def _sparse_unet(prefix: str, sd, num_levels, block_repeat, spatial_order,
                 without_stem: bool):
    p: Dict = {}
    s: Dict = {}
    if without_stem:
        p["stem_bn"], s["stem_bn"] = _bn(prefix + ".stem.0", sd)
    else:
        p["stem_conv"] = {
            "kernel": _conv_kernel(sd[prefix + ".stem.0.weight"], spatial_order)
        }
        p["stem_bn"], s["stem_bn"] = _bn(prefix + ".stem.1", sd)
    p["ublock"], s["ublock"] = _ublock(
        prefix + ".ublock", sd, num_levels, block_repeat, spatial_order
    )
    return p, s


def convert_reference_state_dict(
    sd: Dict[str, np.ndarray],
    channels=(16, 32, 48, 64, 80, 96, 112),
    block_repeat: int = 2,
    spatial_order: str = "xyz",
) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) flax trees for models/gapartnet.GAPartNet."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    params["backbone"], stats["backbone"] = _sparse_unet(
        "backbone", sd, len(channels), block_repeat, spatial_order, False
    )
    params["sem_seg_head"] = {
        "kernel": _linear(sd["sem_seg_head.weight"]),
        "bias": sd["sem_seg_head.bias"],
    }
    params["offset_mlp0"] = {
        "kernel": _linear(sd["offset_head.0.weight"]),
        "bias": sd["offset_head.0.bias"],
    }
    op, os_ = _bn("offset_head.1", sd)
    params["offset_bn"] = op
    stats["offset_bn"] = os_
    params["offset_mlp1"] = {
        "kernel": _linear(sd["offset_head.3.weight"]),
        "bias": sd["offset_head.3.bias"],
    }
    for unet, head, out_name in (
        ("score_unet", "score_head", "score_head"),
        ("npcs_unet", "npcs_head", "npcs_head"),
    ):
        if f"{head}.weight" not in sd:
            continue  # staged checkpoints may lack late heads (strict=False)
        params[unet], stats[unet] = _sparse_unet(
            unet, sd, 2, block_repeat, spatial_order, True
        )
        params[out_name] = {
            "kernel": _linear(sd[f"{head}.weight"]),
            "bias": sd[f"{head}.bias"],
        }
    return params, stats


def load_reference_ckpt(path: str, **kw):
    """Load a Lightning .ckpt and convert (torch host-side only)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_reference_state_dict(sd, **kw)
