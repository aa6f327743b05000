import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.ops import losses, metrics


def _fake(shape=(2, 16, 16, 1), seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=shape), jnp.float32)
    targets = jnp.asarray((rng.random(shape) > 0.7), jnp.float32)
    return logits, targets


@pytest.mark.parametrize("fn", [
    losses.dice_loss, losses.jaccard_loss, losses.bce_loss,
    losses.focal_loss, losses.tversky_loss, losses.lovasz_hinge_loss,
    losses.edge_loss,
])
def test_losses_finite_positive(fn):
    logits, targets = _fake()
    v = float(fn(logits, targets))
    assert np.isfinite(v)
    assert v >= 0


def test_perfect_prediction_near_zero():
    _, targets = _fake()
    logits = (targets * 2 - 1) * 20.0  # saturated correct logits
    assert float(losses.dice_loss(logits, targets)) < 1e-3
    assert float(losses.bce_loss(logits, targets)) < 1e-3
    assert float(losses.focal_loss(logits, targets)) < 1e-4
    assert float(losses.jaccard_loss(logits, targets)) < 1e-3


def test_bce_matches_torch_formula():
    import torch
    logits, targets = _fake()
    ours = float(losses.bce_loss(logits, targets))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(np.asarray(logits)), torch.tensor(np.asarray(targets)))
    assert abs(ours - float(ref)) < 1e-6


def test_dice_matches_manual():
    logits, targets = _fake()
    probs = jax.nn.sigmoid(logits)
    p = np.asarray(probs).reshape(2, -1)
    t = np.asarray(targets).reshape(2, -1)
    inter = (p * t).sum(1)
    manual = float(np.mean(1 - (2 * inter + 1e-5) /
                           (p.sum(1) + t.sum(1) + 1e-5)))
    assert abs(float(losses.dice_loss(logits, targets)) - manual) < 1e-6


def test_get_loss_function_variants():
    cfg = get_cfg_defaults()
    logits, targets = _fake()
    for name in ["DiceLoss", "JaccardLoss", "BCELoss", "FocalLoss",
                 "TverskyLoss", "LovaszLoss", "CombinedLoss"]:
        cfg.LOSS.NAME = name
        fn = losses.get_loss_function(cfg)
        assert np.isfinite(float(fn(logits, targets))), name


def test_combined_loss_weighting():
    logits, targets = _fake()
    c = losses.CombinedLoss(bce_weight=1.0, dice_weight=0.0)
    assert abs(float(c(logits, targets)) -
               float(losses.bce_loss(logits, targets))) < 1e-6


def test_metrics_perfect_and_worst():
    _, targets = _fake()
    logits = (targets * 2 - 1) * 20.0
    m = metrics.compute_metrics(logits, targets)
    assert float(m["iou"]) > 0.999
    assert float(m["f1"]) > 0.999
    assert float(m["accuracy"]) > 0.999
    inv = -logits
    m2 = metrics.compute_metrics(inv, targets)
    assert float(m2["iou"]) < 1e-3


def test_confusion_stats_counts():
    logits = jnp.asarray([[10.0, -10.0], [10.0, -10.0]]).reshape(1, 2, 2, 1)
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]]).reshape(1, 2, 2, 1)
    s = metrics.confusion_stats(logits, targets)
    assert float(s["tp"]) == 1 and float(s["tn"]) == 1
    assert float(s["fp"]) == 1 and float(s["fn"]) == 1


def test_dice_iou_standalone():
    pred = jnp.ones((4, 4))
    target = jnp.ones((4, 4))
    assert float(metrics.dice_coef(pred, target)) > 0.999
    assert float(metrics.iou_score(pred, target)) > 0.999
