"""Real SMP UNet++ .pth import: structure, name mapping, forward parity.

The reference trains smp.UnetPlusPlus (/root/reference/src/models/
unet_model.py:29-73) and saves its state_dict (/root/reference/src/
train.py:425-460). These tests build a hand-written torch mirror of that
exact model (smp's decoder structure and nn.Sequential naming are fixed by
its published source; smp itself is not installed here), randomize it, save
a reference-layout .pth, and verify our SMP-compat flax model imports it
with ZERO unmapped tensors and produces per-pixel identical masks.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.models import SMPModelFactory, init_model
from unet_watermark_tpu.models.torch_import import (
    detect_decoder_impl,
    import_pth,
    load_pth,
)


# ---------------------------------------------------------------------------
# torch mirror of smp.UnetPlusPlus(encoder_name="resnet34")
# ---------------------------------------------------------------------------

class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        self.relu = nn.ReLU()

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class TorchResNetEncoder(nn.Module):
    """torchvision-resnet-shaped encoder (BasicBlock family)."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for i, (cout, n) in enumerate(zip(widths, layers)):
            stride = 1 if i == 0 else 2
            blocks = [TorchBasicBlock(cin, cout, stride)]
            blocks += [TorchBasicBlock(cout, cout) for _ in range(n - 1)]
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
            cin = cout

    def forward(self, x):
        feats = [x]
        y = self.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for i in range(4):
            y = getattr(self, f"layer{i + 1}")(y)
            feats.append(y)
        return feats


class Conv2dReLU(nn.Sequential):
    """smp.base.modules.Conv2dReLU with use_batchnorm=True: indices 0/1."""

    def __init__(self, cin, cout):
        super().__init__(
            nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True))


class TorchDecoderBlock(nn.Module):
    """smp DecoderBlock: nearest-up2x → cat([up, skip]) → conv1 → conv2."""

    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.conv1 = Conv2dReLU(cin + cskip, cout)
        self.conv2 = Conv2dReLU(cout, cout)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class TorchSMPUnetPlusPlusDecoder(nn.Module):
    """smp UnetPlusPlusDecoder: ModuleDict blocks x_{depth}_{layer},
    deepest-first feature indexing, interior widths = encoder skip widths."""

    def __init__(self, encoder_channels=(3, 64, 64, 128, 256, 512),
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]
        self.in_channels = [enc[0]] + list(decoder_channels[:-1])
        self.skip_channels = enc[1:] + [0]
        self.out_channels = list(decoder_channels)
        blocks = {}
        for layer in range(len(self.in_channels) - 1):
            for d in range(layer + 1):
                if d == 0:
                    cin = self.in_channels[layer]
                    cskip = self.skip_channels[layer] * (layer + 1)
                    cout = self.out_channels[layer]
                else:
                    cout = self.skip_channels[layer]
                    cskip = self.skip_channels[layer] * (layer + 1 - d)
                    cin = self.skip_channels[layer - 1]
                blocks[f"x_{d}_{layer}"] = TorchDecoderBlock(cin, cskip, cout)
        depth = len(self.in_channels) - 1
        blocks[f"x_0_{depth}"] = TorchDecoderBlock(
            self.in_channels[-1], 0, self.out_channels[-1])
        self.blocks = nn.ModuleDict(blocks)
        self.depth = depth

    def forward(self, features):
        features = features[1:][::-1]
        dense = {}
        for layer in range(self.depth):
            for d in range(self.depth - layer):
                li = d + layer
                if layer == 0:
                    dense[f"x_{d}_{d}"] = self.blocks[f"x_{d}_{d}"](
                        features[d], features[d + 1])
                else:
                    cat = [dense[f"x_{i}_{li}"] for i in range(d + 1, li + 1)]
                    cat = torch.cat(cat + [features[li + 1]], dim=1)
                    dense[f"x_{d}_{li}"] = self.blocks[f"x_{d}_{li}"](
                        dense[f"x_{d}_{li - 1}"], cat)
        return self.blocks[f"x_0_{self.depth}"](
            dense[f"x_0_{self.depth - 1}"])


class TorchSMPUnetPlusPlus(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TorchResNetEncoder()
        self.decoder = TorchSMPUnetPlusPlusDecoder()
        # smp SegmentationHead: Sequential(conv3x3(bias), identity, identity)
        self.segmentation_head = nn.Sequential(nn.Conv2d(16, 1, 3, 1, 1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(self.encoder(x)))


def _randomized_reference_pth(tmp_path, seed=0):
    torch.manual_seed(seed)
    model = TorchSMPUnetPlusPlus()
    # randomize bn running stats so bn parity is actually exercised
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    0.3 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    1.0 + 0.3 * torch.rand(m.running_var.shape, generator=g))
    path = str(tmp_path / "reference_unetpp.pth")
    torch.save({
        "epoch": 42,
        "model_state_dict": model.state_dict(),
        "val_loss": 0.123,
        "val_metrics": {"iou": 0.8},
        "config": {},
    }, path)
    return model, path


def test_detect_decoder_impl(tmp_path):
    _, path = _randomized_reference_pth(tmp_path)
    assert detect_decoder_impl(load_pth(path)) == "smp"
    assert detect_decoder_impl({"decoder.block0.conv1.conv.weight": 0}) == \
        "canonical"


def test_smp_pth_imports_with_zero_unmapped(tmp_path):
    _, path = _randomized_reference_pth(tmp_path)
    model = SMPModelFactory.create_model(
        model_name="UnetPlusPlus", encoder_name="resnet34",
        dtype=jnp.float32, decoder_impl="smp")
    variables = init_model(model, 64, seed=9)
    imported, report = import_pth(path, variables)
    assert not report["missing"], \
        f"{len(report['missing'])} unmapped: {report['missing'][:8]}"
    assert not report["unused"], \
        f"{len(report['unused'])} unused: {report['unused'][:8]}"


def test_smp_full_model_forward_parity(tmp_path):
    """Per-pixel parity of logits and masks vs the torch reference model on
    a fixed seed set (BASELINE.md third target)."""
    tmodel, path = _randomized_reference_pth(tmp_path)
    model = SMPModelFactory.create_model(
        model_name="UnetPlusPlus", encoder_name="resnet34",
        dtype=jnp.float32, decoder_impl="smp")
    imported, report = import_pth(path, init_model(model, 64, seed=9))
    assert not report["missing"] and not report["unused"]

    tmodel.eval()
    for seed in (0, 1, 2):
        x = np.random.default_rng(seed).standard_normal(
            (2, 64, 64, 3)).astype(np.float32) * 0.5
        ours = np.asarray(model.apply(imported, jnp.asarray(x), train=False))
        with torch.no_grad():
            theirs = tmodel(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)
        # per-pixel mask parity away from the knife edge of the threshold
        pa = 1 / (1 + np.exp(-ours)) > 0.5
        pb = 1 / (1 + np.exp(-theirs)) > 0.5
        decisive = np.abs(theirs) > 1e-3
        assert decisive.mean() > 0.999
        np.testing.assert_array_equal(pa[decisive], pb[decisive])


def test_predictor_autodetects_smp_checkpoint(tmp_path):
    """WatermarkPredictor rebuilds the model with the smp decoder when the
    .pth is a reference checkpoint (predict.py:68-112 drop-in behavior)."""
    from unet_watermark_tpu.inference.predict import WatermarkPredictor

    _, path = _randomized_reference_pth(tmp_path)
    cfg = get_cfg_defaults()
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = 64
    pred = WatermarkPredictor(model_path=path, config=cfg)
    assert pred.cfg.MODEL.DECODER_IMPL == "smp"
    assert pred.model_info["epoch"] == 42
    x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(pred._forward(jnp.asarray(x)))
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(out).all()
