""".pth interop: export → torch model → numerical forward parity.

Validates the BASELINE.json "drop-in .pth loading" requirement end to end:
our flax encoder exports to torchvision/SMP state_dict names, a real torch
ResNet consumes it strictly, and both frameworks produce the same features.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.models import SMPModelFactory, init_model
from unet_watermark_tpu.models.encoders import ResNetEncoder
from unet_watermark_tpu.models.torch_import import (
    export_pth,
    import_pth,
    load_pth,
)


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


class TorchResNet18Encoder(nn.Module):
    """torchvision-resnet18-shaped encoder (state_dict-name compatible)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, s) in enumerate(cfg):
            setattr(self, f"layer{i + 1}", nn.Sequential(
                TorchBasicBlock(cin, cout, s), TorchBasicBlock(cout, cout)))

    def forward(self, x):
        feats = [x]
        y = self.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for i in range(4):
            y = getattr(self, f"layer{i + 1}")(y)
            feats.append(y)
        return feats


def _rand_params_encoder():
    enc = ResNetEncoder(variant="resnet18", dtype=jnp.float32)
    rng = jax.random.PRNGKey(7)
    variables = enc.init(rng, jnp.zeros((1, 64, 64, 3)), False)
    # randomize batch stats a bit so bn parity is actually exercised
    bs = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        if x.ndim > 0 else x, variables["batch_stats"])
    var = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.random.default_rng(2).standard_normal(
            x.shape).astype(np.float32), variables["params"])
    return enc, {"params": var, "batch_stats": bs}


def test_encoder_pth_roundtrip_and_torch_parity(tmp_path):
    enc, variables = _rand_params_encoder()
    cfg = get_cfg_defaults()
    path = str(tmp_path / "enc.pth")
    # export with encoder.* prefix by nesting under 'encoder'
    export_pth(path, cfg,
               {"encoder": variables["params"]},
               {"encoder": variables["batch_stats"]})

    sd = load_pth(path)
    tmodel = TorchResNet18Encoder()
    tsd = {k.removeprefix("encoder."): torch.tensor(v)
           for k, v in sd.items()}
    missing, unexpected = tmodel.load_state_dict(tsd, strict=False)
    assert not unexpected, unexpected
    # only num_batches_tracked may be missing
    assert all("num_batches_tracked" in m for m in missing), missing

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    ours = enc.apply(variables, jnp.asarray(x), False)
    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    for i in range(1, 6):
        a = np.asarray(ours[i])
        b = np.transpose(theirs[i].numpy(), (0, 2, 3, 1))
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-2)


def test_import_pth_into_model(tmp_path):
    """Full model export → import into fresh variables → equality."""
    model = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32)
    variables = init_model(model, 64, seed=0)
    cfg = get_cfg_defaults()
    path = str(tmp_path / "model.pth")
    export_pth(path, cfg, variables["params"], variables["batch_stats"],
               epoch=3, best_val_loss=0.25)

    fresh = init_model(model, 64, seed=99)
    leaves_a = jax.tree_util.tree_leaves(variables["params"])
    leaves_f = jax.tree_util.tree_leaves(fresh["params"])
    assert any(not np.allclose(a, f) for a, f in zip(leaves_a, leaves_f))

    imported, report = import_pth(path, fresh)
    assert not report["missing"], report["missing"][:10]
    assert not report["unused"], report["unused"][:10]
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(imported["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                    jax.tree_util.tree_leaves(imported["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_load_bare_state_dict(tmp_path):
    """predict.py:80-91 compat: bare state_dict (no wrapper dict) loads."""
    model = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32)
    variables = init_model(model, 64, seed=0)
    cfg = get_cfg_defaults()
    path = str(tmp_path / "full.pth")
    export_pth(path, cfg, variables["params"], variables["batch_stats"])
    sd = load_pth(path)
    bare = str(tmp_path / "bare.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, bare)
    imported, report = import_pth(bare, init_model(model, 64, seed=5))
    assert not report["missing"]


def test_dataparallel_prefix_stripped(tmp_path):
    model = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32)
    variables = init_model(model, 64, seed=0)
    cfg = get_cfg_defaults()
    path = str(tmp_path / "m.pth")
    export_pth(path, cfg, variables["params"], variables["batch_stats"])
    sd = load_pth(path)
    wrapped = str(tmp_path / "dp.pth")
    torch.save({"model_state_dict": {
        "module." + k: torch.tensor(v) for k, v in sd.items()}}, wrapped)
    imported, report = import_pth(wrapped, init_model(model, 64, seed=5))
    assert not report["missing"]
