"""Round-trip the reference state_dict naming through the converter and load

the result into the actual model (shape/name agreement is the test; numeric
parity vs the real release.ckpt needs the checkpoint file, absent here)."""

import jax
import numpy as np
import pytest

from gapartnet_tpu.train.ckpt_convert import convert_reference_state_dict


# full-model jit compiles dominate: run with -m 'not slow' for the fast suite
pytestmark = pytest.mark.slow


def _bn_entries(sd, prefix, c):
    sd[prefix + ".weight"] = np.random.rand(c).astype(np.float32)
    sd[prefix + ".bias"] = np.random.rand(c).astype(np.float32)
    sd[prefix + ".running_mean"] = np.random.rand(c).astype(np.float32)
    sd[prefix + ".running_var"] = np.random.rand(c).astype(np.float32) + 0.5


def _resblock_entries(sd, prefix, cin, cout):
    sd[prefix + ".conv1.0.weight"] = np.random.rand(cout, 3, 3, 3, cin).astype(np.float32)
    _bn_entries(sd, prefix + ".conv1.1", cout)
    sd[prefix + ".conv2.0.weight"] = np.random.rand(cout, 3, 3, 3, cout).astype(np.float32)
    _bn_entries(sd, prefix + ".conv2.1", cout)
    if cin != cout:
        sd[prefix + ".shortcut.0.weight"] = np.random.rand(cout, 1, 1, 1, cin).astype(np.float32)
        _bn_entries(sd, prefix + ".shortcut.1", cout)


def _ublock_entries(sd, prefix, channels, block_repeat):
    c = channels[0]
    for r in range(block_repeat):
        _resblock_entries(sd, f"{prefix}.encoder_blocks.{r}", c, c)
    if len(channels) > 1:
        sd[prefix + ".downsample.0.weight"] = np.random.rand(
            channels[1], 2, 2, 2, c
        ).astype(np.float32)
        _bn_entries(sd, prefix + ".downsample.1", channels[1])
        _ublock_entries(sd, prefix + ".ublock", channels[1:], block_repeat)
        sd[prefix + ".upsample.0.weight"] = np.random.rand(
            c, 2, 2, 2, channels[1]
        ).astype(np.float32)
        _bn_entries(sd, prefix + ".upsample.1", c)
        _resblock_entries(sd, f"{prefix}.decoder_blocks.0", 2 * c, c)
        for r in range(1, block_repeat):
            _resblock_entries(sd, f"{prefix}.decoder_blocks.{r}", c, c)


def make_reference_state_dict(channels=(8, 16), block_repeat=2, num_classes=10):
    np.random.seed(0)
    sd = {}
    fea = channels[0]
    sd["backbone.stem.0.weight"] = np.random.rand(fea, 3, 3, 3, 6).astype(np.float32)
    _bn_entries(sd, "backbone.stem.1", fea)
    _ublock_entries(sd, "backbone.ublock", channels, block_repeat)
    sd["sem_seg_head.weight"] = np.random.rand(num_classes, fea).astype(np.float32)
    sd["sem_seg_head.bias"] = np.random.rand(num_classes).astype(np.float32)
    sd["offset_head.0.weight"] = np.random.rand(fea, fea).astype(np.float32)
    sd["offset_head.0.bias"] = np.random.rand(fea).astype(np.float32)
    _bn_entries(sd, "offset_head.1", fea)
    sd["offset_head.3.weight"] = np.random.rand(3, fea).astype(np.float32)
    sd["offset_head.3.bias"] = np.random.rand(3).astype(np.float32)
    for unet, head, odim in (
        ("score_unet", "score_head", num_classes - 1),
        ("npcs_unet", "npcs_head", 3 * (num_classes - 1)),
    ):
        _bn_entries(sd, unet + ".stem.0", fea)
        _ublock_entries(sd, unet + ".ublock", channels[:2], block_repeat)
        sd[f"{head}.weight"] = np.random.rand(odim, fea).astype(np.float32)
        sd[f"{head}.bias"] = np.random.rand(odim).astype(np.float32)
    return sd


def test_converted_tree_loads_into_model(rng):
    from tests.test_model_forward import SMALL_CFG, _batch
    import dataclasses
    from gapartnet_tpu.models.gapartnet import GAPartNet

    cfg = dataclasses.replace(SMALL_CFG, channels=(8, 16), level_capacity_divisors=(1, 2))
    sd = make_reference_state_dict(channels=cfg.channels, block_repeat=cfg.block_repeat)
    params, stats = convert_reference_state_dict(
        sd, channels=cfg.channels, block_repeat=cfg.block_repeat
    )

    model = GAPartNet(cfg)
    batch = _batch(rng, b=1, n=cfg.max_points)
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0), "proposal_jitter": jax.random.PRNGKey(1)},
        batch, train=False, do_cluster=True, do_score=True, do_npcs=True,
    )

    # every init param must exist in the converted tree with identical shape
    flat_init = jax.tree_util.tree_leaves_with_path(init_vars["params"])
    flat_conv = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(params)
    )
    missing = []
    for k, v in flat_init:
        ks = jax.tree_util.keystr(k)
        if ks not in flat_conv:
            missing.append(ks)
        else:
            assert flat_conv[ks].shape == v.shape, (ks, flat_conv[ks].shape, v.shape)
    assert not missing, f"missing converted params: {missing}"

    # the converted tree actually runs
    out = model.apply(
        {"params": params, "batch_stats": stats},
        batch, train=False, do_cluster=True, do_score=True, do_npcs=True,
    )
    assert np.isfinite(np.asarray(out.sem_logits)).all()


def test_staged_ckpt_without_npcs_head():
    sd = make_reference_state_dict(channels=(8, 16))
    for k in list(sd):
        if k.startswith("npcs"):
            del sd[k]
    params, stats = convert_reference_state_dict(sd, channels=(8, 16))
    assert "npcs_head" not in params
    assert "score_head" in params
