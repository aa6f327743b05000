"""Driver entry points: single-chip entry + multi-chip dryrun (CPU mesh)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_compile_check_small():
    """entry() returns a jittable fn; exercise it at a reduced size via the
    same model pathway (full 512 compile is covered by bench on TPU)."""
    import jax
    import jax.numpy as jnp

    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import create_model_from_config, init_model

    cfg = get_cfg_defaults()
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = 64
    model = create_model_from_config(cfg)
    variables = init_model(model, 64)
    fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    out = fn(jnp.zeros((2, 64, 64, 3), jnp.float32))
    assert out.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_entry_signature():
    import __graft_entry__ as g

    assert callable(g.entry)
    assert callable(g.dryrun_multichip)
