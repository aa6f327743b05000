"""bf16 .npz weight shipping (utils/shipping.py) + engine npz loading."""
import os

import numpy as np
import jax.numpy as jnp

from unet_watermark_tpu.utils import shipping


def _tree():
    return {
        "params": {
            "conv": {"kernel": jnp.arange(12, dtype=jnp.float32)
                     .reshape(3, 4) / 7.0},
            "bn": {"scale": jnp.ones((4,), jnp.float32)},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros((4,), jnp.float32)}},
        "step": jnp.asarray(7, jnp.int32),
    }


def test_npz_roundtrip(tmp_path):
    tree = _tree()
    path = str(tmp_path / "w.npz")
    shipping.save_params_npz(path, tree)
    out = shipping.load_params_npz(path, _tree())
    # floats survive at bf16 precision; ints exactly
    np.testing.assert_allclose(
        np.asarray(out["params"]["conv"]["kernel"], np.float32),
        np.asarray(tree["params"]["conv"]["kernel"], np.float32),
        rtol=1e-2)
    assert int(out["step"]) == 7


def test_npz_shape_mismatch_raises(tmp_path):
    import pytest

    tree = _tree()
    path = str(tmp_path / "w.npz")
    shipping.save_params_npz(path, tree)
    bad = _tree()
    bad["params"]["bn"]["scale"] = jnp.ones((5,), jnp.float32)
    with pytest.raises(ValueError):
        shipping.load_params_npz(path, bad)


def test_npz_roundtrip_bf16_tree(tmp_path):
    """A tree ALREADY holding bf16 leaves must ship loadably (ml_dtypes
    bfloat16 fails np.issubdtype(np.floating) — the advisor's latent
    silently-unloadable-artifact finding)."""
    tree = {"w": jnp.arange(8, dtype=jnp.bfloat16) / 7.0,
            "b": jnp.ones((3,), jnp.bfloat16)}
    path = str(tmp_path / "bf16.npz")
    shipping.save_params_npz(path, tree)
    out = shipping.load_params_npz(path, tree)
    np.testing.assert_allclose(np.asarray(out["w"], np.float32),
                               np.asarray(tree["w"], np.float32))


def test_seg_filename_canonicalizes_alias():
    """NAME: unet++ must map to the same shipped file as UnetPlusPlus
    (advisor finding: raw-name lookup missed the shipped weights and
    silently fell back to random init)."""
    from unet_watermark_tpu.configs import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "unet++"
    assert shipping.seg_weights_filename(cfg) == \
        "seg_unetplusplus_resnet34.npz"
    cfg.MODEL.NAME = "UnetPlusPlus"
    assert shipping.seg_weights_filename(cfg) == \
        "seg_unetplusplus_resnet34.npz"


def test_resolve_precedence(tmp_path, monkeypatch):
    from unet_watermark_tpu.configs import get_cfg_defaults

    cfg = get_cfg_defaults()
    monkeypatch.delenv("PREDICT_INPAINT_WEIGHTS", raising=False)
    cfg.PREDICT.INPAINT_WEIGHTS = "/cfg/path"
    assert shipping.resolve("inpaint", cfg, "/explicit") == "/explicit"
    assert shipping.resolve("inpaint", cfg) == "/cfg/path"
    cfg.PREDICT.INPAINT_WEIGHTS = None
    monkeypatch.setenv("PREDICT_INPAINT_WEIGHTS", "/env/path")
    assert shipping.resolve("inpaint", cfg) == "/env/path"
    monkeypatch.delenv("PREDICT_INPAINT_WEIGHTS")
    # default: the shipped file
    assert shipping.resolve("inpaint", cfg) == os.path.join(
        shipping.weights_dir(), "lama_ffc.npz")
    import pytest

    with pytest.raises(ValueError):
        shipping.resolve("nonsense")


def test_every_shipped_weight_is_resolvable_and_loadable():
    """Every file committed under unet_watermark_tpu/weights/ must be
    reachable through the unified registry AND load into its engine's
    template — the test that would have caught the round-2 fused-path
    bug (shipped npz unreadable by the path that benched)."""
    wdir = shipping.weights_dir()
    shipped = sorted(os.listdir(wdir))
    assert shipped, "no shipped weights?!"
    covered = set()

    for fname in shipped:
        full = os.path.join(wdir, fname)
        if fname.endswith(".quant.json"):
            # int8 PTQ calibration sidecar (ops/quant.py): must sit next
            # to an existing shipped weight and parse into positive scales
            from unet_watermark_tpu.ops import quant

            base = fname[:-len(".quant.json")] + ".npz"
            assert base in shipped, \
                f"{fname} is a sidecar for a weight that does not ship"
            scales = quant.load_scales(full)
            assert scales and all(v > 0 for v in scales.values())
            covered.add(fname)
        elif fname.startswith("seg_"):
            from unet_watermark_tpu.configs import get_cfg_defaults
            from unet_watermark_tpu.models import (
                create_model_from_config, init_model)

            # filename encodes the config: seg_<model>_<encoder>.npz
            # (both the UNet++ quality tier and the Unet speed tier ship)
            model_name, _, encoder = fname[4:-4].rpartition("_")
            cfg = get_cfg_defaults()
            cfg.MODEL.NAME = model_name
            cfg.MODEL.ENCODER_NAME = encoder
            assert shipping.resolve("seg", cfg) == full, \
                f"{fname} not the registry's seg resolution"
            model = create_model_from_config(cfg)
            template = init_model(model, 64, seed=0)
            out = shipping.load_variables(full, template)
            assert set(out) == set(template)
            covered.add(fname)
        elif fname.startswith("lama"):
            from unet_watermark_tpu.inference.engines import (
                load_lama_variables)

            assert shipping.resolve("inpaint") == full
            model, variables, name = load_lama_variables(full)
            assert variables is not None, f"{fname} loads into no variant"
            covered.add(fname)
        elif fname.startswith("latent_diffusion"):
            from unet_watermark_tpu.diffusion.latent_diffusion import (
                LatentDenoiser, TinyAutoencoder, init_ld_variables)

            assert shipping.resolve("diffusion") == full
            template = init_ld_variables(
                TinyAutoencoder(), LatentDenoiser(), img_size=64)
            out = shipping.load_variables(full, template)
            assert set(out) == {"ae", "denoiser"}
            covered.add(fname)
    missing = set(shipped) - covered
    assert not missing, (
        f"shipped weights {missing} are not covered by the registry — "
        "add a kind to utils/shipping._KINDS and a branch here")


def test_engine_loads_npz(tmp_path):
    """get_engine('lama') with an npz checkpoint compiles the FFC engine,
    not the pushpull fallback."""
    from unet_watermark_tpu.models.lama import create_lama, init_lama
    from unet_watermark_tpu.inference import engines

    model = create_lama("lama")
    variables = init_lama(model, img_size=64, seed=0)
    path = str(tmp_path / "lama_ffc.npz")
    shipping.save_params_npz(path, dict(variables))
    eng = engines.get_engine("lama", weights_path=path)
    img = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    msk = jnp.zeros((1, 64, 64, 1), jnp.float32)
    out = eng(img, msk)
    assert out.shape == img.shape
    # known pixels pass through exactly (composited output)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-3)


def test_load_variables_training_checkpoint_dir(tmp_path):
    """load_variables on a training checkpoint dir (the `tree/` layout of
    training/checkpoint.save_checkpoint) restores params/batch_stats and
    drops opt_state/step — so auto-train's per-cycle held-out eval can
    point eval_segmentation at a cycle checkpoint directly."""
    import orbax.checkpoint as ocp

    tree = _tree()
    tree["opt_state"] = {"mu": jnp.zeros((4,), jnp.float32)}
    path = str(tmp_path / "checkpoint_epoch_0003")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "tree"), tree)
    ckptr.wait_until_finished()

    template = {"params": _tree()["params"],
                "batch_stats": _tree()["batch_stats"]}
    out = shipping.load_variables(path, template)
    assert set(out) == {"params", "batch_stats"}
    np.testing.assert_allclose(
        np.asarray(out["params"]["conv"]["kernel"], np.float32),
        np.asarray(tree["params"]["conv"]["kernel"], np.float32))
