"""Third bt probe: full model at BATCH 32 — the latency regime.

exp_bt_conv2 settled batch 128 (parity per-shape, net loss full-model:
XLA's b128 strategies already fill the MXU). But the b32 microbench won
1.18-1.44x, and batch 32 is the small-job predictor regime where the
round-3 numbers sit at 457 (UNet++) / 951 (UNet) img/s. Does bt lift
the small-batch model?
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.models import create_model_from_config, init_model
from unet_watermark_tpu.ops import bt_conv
from unet_watermark_tpu.utils.benchmarking import (make_chained_forward,
                                                   time_chained)

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)


def run(name, lowering, batch=32):
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    cfg.MODEL.NAME = name
    model = create_model_from_config(cfg)
    v = init_model(model, 512, seed=0)
    bt_conv.LOWERING_OVERRIDE = lowering
    try:
        fwd = make_chained_forward(
            lambda images: model.apply(v, images, train=False))
        x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
        compile_s, per_iter = time_chained(fwd, x, iters=20)
    finally:
        bt_conv.LOWERING_OVERRIDE = None
    rate = batch / per_iter
    tag = lowering or "direct"
    print(f"{name} {tag} b{batch}: {rate:.1f} img/s "
          f"({per_iter * 1e3:.1f} ms, compile {compile_s:.0f}s)", flush=True)
    return rate


for name in ("Unet", "UnetPlusPlus"):
    d = run(name, None)
    b = run(name, "bt")
    print(f"{name} b32 bf16: bt/direct = {b / d:.3f}x", flush=True)
