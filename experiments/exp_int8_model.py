"""Full-model A/B: bf16 vs int8-PTQ forward, UNet and UNet++ @512² b128.

Scales come from a quick eager observe pass on CPU-sized input? No — the
model must be observed at the real shape for amax fidelity, but for a
THROUGHPUT A/B any positive scales give identical kernels; use an eager
observe on a small 64² input to get every path, which is enough here.
Chained dispatches per docs/PERFORMANCE.md.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.models import create_model_from_config, init_model
from unet_watermark_tpu.ops import quant

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)


def bench(name, gflop, batch=128):
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    cfg.MODEL.NAME = name
    model = create_model_from_config(cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        pass  # init on TPU is fine
    v = init_model(model, 512, seed=0)

    # observe scales eagerly at 64² on the TPU (few hundred eager ops)
    store = {}
    x_small = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    with quant.quant_observe(store):
        model.apply(v, x_small, train=False)
    print(f"{name}: observed {len(store)} conv paths", flush=True)

    from unet_watermark_tpu.utils.benchmarking import (
        make_chained_forward, time_chained)

    def make(quantized):
        def apply_model(images):
            if quantized:
                with quant.quant_int8(store):
                    return model.apply(v, images, train=False)
            return model.apply(v, images, train=False)
        return make_chained_forward(apply_model)

    for tag, quantized in (("bf16", False), ("int8", True)):
        fwd = make(quantized)
        x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
        compile_s, per_iter = time_chained(fwd, x, iters=20)
        rate = batch / per_iter
        print(f"{name} {tag} compile {compile_s:.0f}s", flush=True)
        print(f"{name} {tag} b{batch}: {rate:.1f} img/s "
              f"({per_iter * 1e3:.1f} ms)  "
              f"nominal-MFU {rate * gflop / 1e3 / 197:.1%}", flush=True)


bench("Unet", 54.5)
bench("UnetPlusPlus", 105.4)
