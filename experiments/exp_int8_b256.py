"""Batch sweep for the int8 speed tier: does batch >128 keep scaling?

Batch 128 was the single biggest round-2 lever (super-linear over 64:
XLA picks MXU-saturating conv strategies for the thin-channel decoder
stages). This checks whether 192/256 buy more on the int8 Unet tier
(the bench headline) before we pin the bench batch list.
Chained dispatches per docs/PERFORMANCE.md "Measurement validity".
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

cfg = get_cfg_defaults()
cfg.DATA.IMG_SIZE = 512
cfg.MODEL.NAME = "Unet"
model = create_model_from_config(cfg)
v = init_model(model, 512, seed=0)

store = {}
x_small = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
with quant.quant_observe(store):
    model.apply(v, x_small, train=False)
print(f"observed {len(store)} conv paths", flush=True)


from unet_watermark_tpu.utils.benchmarking import (  # noqa: E402
    make_chained_forward, time_chained)


def make():
    def apply_model(images):
        with quant.quant_int8(store):
            return model.apply(v, images, train=False)
    return make_chained_forward(apply_model)


for batch in (128, 192, 256):
    fwd = make()
    x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
    compile_s, per_iter = time_chained(fwd, x, iters=20)
    print(f"int8 Unet b{batch} compile {compile_s:.0f}s", flush=True)
    print(f"int8 Unet b{batch}: {batch / per_iter:.1f} img/s "
          f"({per_iter * 1e3:.1f} ms)", flush=True)
