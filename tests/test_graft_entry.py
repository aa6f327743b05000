"""Driver entry points: single-chip entry + multi-chip dryrun (CPU mesh)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_dryrun_multichip_driver_call_path():
    """Reproduce the driver's exact invocation: a fresh process that does NOT
    force the CPU platform, imports the module, and calls the function.
    Round-1 regression: this initialized the real TPU backend and died
    (MULTICHIP_r01.json rc=1). The function must self-contain the virtual
    CPU mesh setup."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    code = ("import __graft_entry__ as g\n"
            "g.dryrun_multichip(4)\n")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(4): ok" in proc.stdout, proc.stdout
    # the flagship inference product must also be multichip-validated:
    # fused detect→inpaint under DP sharding, learned engine when the
    # shipped weights resolve
    assert "fused-repair[ffc-lama] 4-way DP ok" in proc.stdout, proc.stdout


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
