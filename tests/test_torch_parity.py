"""Whole-model numerical parity against a torch transcription of the
reference network, through the checkpoint converter.

Extends the per-conv dense-grid oracle technique of tests/test_ckpt_layout.py
to the FULL module tree: a torch nn.Conv3d replica of the reference
SparseUNet (backbone.py:8-165 — stem, ResBlocks with BN+shortcut, recursive
UBlock with strided down / transposed up / skip concat) plus the heads
(model.py:104-122), built with the reference's exact state_dict naming.  On a
FULLY-OCCUPIED grid, submanifold conv == dense conv, SparseConv3d(k2,s2) ==
strided conv, SparseInverseConv3d == ConvTranspose3d (proven per-op in
test_ckpt_layout), so the dense torch forward is a ground-truth oracle for
the whole network.  The torch replica's randomly-initialized state_dict runs
through `convert_reference_state_dict` into our flax modules; activations
must match through every level and head.

This retires the converter/network-semantics risk end-to-end without the
(unavailable) release.ckpt: if this passes, loading the real checkpoint is a
pure IO exercise.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gapartnet_tpu.models.backbone import SparseUNet  # noqa: E402
from gapartnet_tpu.ops.sparse_conv import build_hierarchy  # noqa: E402
from gapartnet_tpu.ops.voxelize import pack_coords  # noqa: E402
from gapartnet_tpu.train.ckpt_convert import convert_reference_state_dict  # noqa: E402

# ---------------------------------------------------------------------------
# torch replica with the reference's exact module tree / state_dict naming
# ---------------------------------------------------------------------------


def _norm(c):
    return tnn.BatchNorm3d(c, eps=1e-5, momentum=0.1)


class TorchResBlock(tnn.Module):
    """backbone.py:8-49 on dense grids (channel-first NCXYZ)."""

    def __init__(self, cin, cout):
        super().__init__()
        if cin == cout:
            self.shortcut = tnn.Identity()
        else:
            self.shortcut = tnn.Sequential(
                tnn.Conv3d(cin, cout, 1, bias=False), _norm(cout)
            )
        self.conv1 = tnn.Sequential(
            tnn.Conv3d(cin, cout, 3, padding=1, bias=False), _norm(cout)
        )
        self.conv2 = tnn.Sequential(
            tnn.Conv3d(cout, cout, 3, padding=1, bias=False), _norm(cout)
        )

    def forward(self, x):
        shortcut = self.shortcut(x)
        x = torch.relu(self.conv1(x))
        return torch.relu(self.conv2(x) + shortcut)


class TorchUBlock(tnn.Module):
    """backbone.py:51-123 on dense grids."""

    def __init__(self, channels, block_repeat):
        super().__init__()
        self.channels = channels
        self.encoder_blocks = tnn.Sequential(
            *[TorchResBlock(channels[0], channels[0]) for _ in range(block_repeat)]
        )
        if len(channels) > 1:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(channels[0], channels[1], 2, stride=2, bias=False),
                _norm(channels[1]),
                tnn.ReLU(),
            )
            self.ublock = TorchUBlock(channels[1:], block_repeat)
            self.upsample = tnn.Sequential(
                tnn.ConvTranspose3d(channels[1], channels[0], 2, stride=2,
                                    bias=False),
                _norm(channels[0]),
                tnn.ReLU(),
            )
            blocks = [TorchResBlock(channels[0] * 2, channels[0])]
            blocks += [
                TorchResBlock(channels[0], channels[0])
                for _ in range(block_repeat - 1)
            ]
            self.decoder_blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        x = self.encoder_blocks(x)
        shortcut = x
        if len(self.channels) > 1:
            x = self.downsample(x)
            x = self.ublock(x)
            x = self.upsample(x)
            x = torch.cat([x, shortcut], dim=1)  # model order: [up, skip]
            x = self.decoder_blocks(x)
        return x


class TorchSparseUNet(tnn.Module):
    """backbone.py:125-165 (build): stem + UBlock; without_stem = BN+ReLU."""

    def __init__(self, in_channels, channels, block_repeat, without_stem=False):
        super().__init__()
        if without_stem:
            self.stem = tnn.Sequential(_norm(channels[0]), tnn.ReLU())
        else:
            self.stem = tnn.Sequential(
                tnn.Conv3d(in_channels, channels[0], 3, padding=1, bias=False),
                _norm(channels[0]),
                tnn.ReLU(),
            )
        self.ublock = TorchUBlock(list(channels), block_repeat)

    def forward(self, x):
        return self.ublock(self.stem(x))


def to_spconv_state_dict(model: tnn.Module, prefix: str = "") -> dict:
    """torch dense layouts -> spconv KRSC layouts, reference key names.

    Conv3d (out, in, kx, ky, kz) -> (out, kx, ky, kz, in);
    ConvTranspose3d (in, out, k, k, k) -> (out, k, k, k, in); BN unchanged.
    """
    out = {}
    convs = {
        name: type(mod)
        for name, mod in model.named_modules()
        if isinstance(mod, (tnn.Conv3d, tnn.ConvTranspose3d))
    }
    for key, v in model.state_dict().items():
        v = v.detach().numpy()
        mod_name = key.rsplit(".", 1)[0]
        if mod_name in convs and key.endswith("weight"):
            if convs[mod_name] is tnn.Conv3d:
                v = np.transpose(v, (0, 2, 3, 4, 1))
            else:
                v = np.transpose(v, (1, 2, 3, 4, 0))
        out[prefix + key] = v
    return out


# ---------------------------------------------------------------------------
# shared helpers: fully-occupied grid through our sparse path
# ---------------------------------------------------------------------------


def _full_grid(n):
    coords = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    keys = np.asarray(pack_coords(jnp.asarray(coords, jnp.int32)))
    order = np.argsort(keys)
    return jnp.asarray(keys[order])[None], coords[order]


def _run_ours(flax_model, params, stats, grid_np, n, levels):
    keys, coords = _full_grid(n)
    feats = grid_np[coords[:, 0], coords[:, 1], coords[:, 2]]
    caps = [max((n // 2**li) ** 3, 1) for li in range(levels)]
    hier = build_hierarchy(keys, jnp.asarray([keys.shape[-1]]), caps)
    out = flax_model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats, jnp.float32)[None], hier, train=False,
    )[0]
    dense = np.zeros((n, n, n, out.shape[-1]), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = np.asarray(out)
    return dense


def _randomize_bn_stats(model, rng):
    """Non-trivial running stats so BN conversion is actually exercised."""
    for mod in model.modules():
        if isinstance(mod, (tnn.BatchNorm3d, tnn.BatchNorm1d)):
            c = mod.running_mean.shape[0]
            mod.running_mean.copy_(torch.tensor(rng.randn(c) * 0.1))
            mod.running_var.copy_(torch.tensor(1.0 + rng.rand(c)))


@pytest.mark.slow
def test_full_backbone_and_heads_match_torch(rng):
    """4-level SparseUNet + sem/offset heads: converted weights, same input,

    activation equality (reference model.py:145-226 eval path)."""
    n, cin = 8, 6
    channels = (4, 6, 8, 10)
    torch.manual_seed(0)
    tb = TorchSparseUNet(cin, channels, block_repeat=2)
    sem_head = tnn.Linear(channels[0], 10)
    offset_head = tnn.Sequential(
        tnn.Linear(channels[0], channels[0]),
        tnn.BatchNorm1d(channels[0]),
        tnn.ReLU(),
        tnn.Linear(channels[0], 3),
    )
    with torch.no_grad():
        _randomize_bn_stats(tb, rng)
        _randomize_bn_stats(offset_head, rng)
    tb.eval(), sem_head.eval(), offset_head.eval()

    sd = to_spconv_state_dict(tb, "backbone.")
    sd.update(to_spconv_state_dict(sem_head, "sem_seg_head."))
    sd.update(to_spconv_state_dict(offset_head, "offset_head."))
    params, stats = convert_reference_state_dict(
        sd, channels=channels, block_repeat=2
    )

    grid = rng.randn(n, n, n, cin).astype(np.float32)
    with torch.no_grad():
        tin = torch.tensor(np.transpose(grid, (3, 0, 1, 2))[None])
        tfeat = tb(tin)[0].permute(1, 2, 3, 0).numpy()  # (n,n,n,C0)
        tsem = sem_head(torch.tensor(tfeat.reshape(-1, channels[0]))).numpy()
        toff = offset_head(
            torch.tensor(tfeat.reshape(-1, channels[0]))
        ).numpy()

    ours_feat = _run_ours(
        SparseUNet(channels=channels, block_repeat=2),
        params["backbone"], stats["backbone"], grid, n, len(channels),
    )
    np.testing.assert_allclose(ours_feat, tfeat, rtol=1e-3, atol=1e-4)

    # heads: plain affine math on the converted params (model.py:104-111)
    flat = ours_feat.reshape(-1, channels[0])
    sem = flat @ params["sem_seg_head"]["kernel"] + params["sem_seg_head"]["bias"]
    np.testing.assert_allclose(sem, tsem, rtol=1e-3, atol=1e-4)

    x = flat @ params["offset_mlp0"]["kernel"] + params["offset_mlp0"]["bias"]
    bnp, bns = params["offset_bn"], stats["offset_bn"]
    x = (x - bns["mean"]) / np.sqrt(bns["var"] + 1e-5) * bnp["scale"] + bnp["bias"]
    x = np.maximum(x, 0)
    off = x @ params["offset_mlp1"]["kernel"] + params["offset_mlp1"]["bias"]
    np.testing.assert_allclose(off, toff, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_score_npcs_unets_match_torch(rng):
    """The stemless 2-level Score/NPCS UNets + heads (model.py:113-122)."""
    n = 4
    channels = (4, 6)
    torch.manual_seed(1)
    # the converter maps the FULL reference state_dict; give it a (tiny)
    # backbone + heads alongside the score/npcs modules under test
    base = TorchSparseUNet(6, channels, 2)
    sem = tnn.Linear(channels[0], 10)
    off = tnn.Sequential(
        tnn.Linear(channels[0], channels[0]),
        tnn.BatchNorm1d(channels[0]),
        tnn.ReLU(),
        tnn.Linear(channels[0], 3),
    )
    base_sd = to_spconv_state_dict(base, "backbone.")
    base_sd.update(to_spconv_state_dict(sem, "sem_seg_head."))
    base_sd.update(to_spconv_state_dict(off, "offset_head."))

    for head_dim, prefix in ((9, "score"), (27, "npcs")):
        tu = TorchSparseUNet(channels[0], channels, 2, without_stem=True)
        th = tnn.Linear(channels[0], head_dim)
        with torch.no_grad():
            _randomize_bn_stats(tu, rng)
        tu.eval(), th.eval()

        sd = dict(base_sd)
        sd.update(to_spconv_state_dict(tu, f"{prefix}_unet."))
        sd.update(to_spconv_state_dict(th, f"{prefix}_head."))
        params, stats = convert_reference_state_dict(
            sd, channels=channels, block_repeat=2
        )
        # converter only emits the unet when the head exists
        assert f"{prefix}_unet" in params

        grid = rng.randn(n, n, n, channels[0]).astype(np.float32)
        with torch.no_grad():
            tin = torch.tensor(np.transpose(grid, (3, 0, 1, 2))[None])
            tfeat = tu(tin)[0].permute(1, 2, 3, 0).numpy()
            tout = th(torch.tensor(tfeat.reshape(-1, channels[0]))).numpy()

        ours = _run_ours(
            SparseUNet(channels=channels, block_repeat=2, without_stem=True),
            params[f"{prefix}_unet"], stats[f"{prefix}_unet"], grid, n, 2,
        )
        np.testing.assert_allclose(ours, tfeat, rtol=1e-3, atol=1e-4)
        hp = params[f"{prefix}_head"]
        np.testing.assert_allclose(
            ours.reshape(-1, channels[0]) @ hp["kernel"] + hp["bias"],
            tout, rtol=1e-3, atol=1e-4,
        )
