"""Batch sweep extension + timing validity cross-check.

1. batch 256 @512^2 direct lowering (does the 128-batch win extend?)
2. batch 128 re-run with a PER-ITERATION host fetch of the counts
   (tunnel round-trip inside the timed loop) — if the rate holds within
   ~10%, the block_until_ready timing is real, not dedup/laziness.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.models import create_model_from_config, init_model

print(f"device: {jax.devices()[0]}", flush=True)
cfg = get_cfg_defaults()
cfg.DATA.IMG_SIZE = 512
model = create_model_from_config(cfg)
variables = init_model(model, 512, seed=0)


@jax.jit
def chained(images):
    logits = model.apply(variables, images, train=False)
    counts = jnp.sum(jax.nn.sigmoid(logits) > 0.5, axis=(1, 2, 3))
    scale = (1.0 + (jnp.sum(counts).astype(jnp.float32) % 0.003) + 0.004)
    return images * scale, counts


rng = np.random.default_rng(0)
for batch, fetch in ((256, False), (128, True), (192, False)):
    try:
        x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
        t0 = time.time()
        x2, out = chained(x)
        jax.block_until_ready((x2, out))
        print(f"batch {batch} compile {time.time() - t0:.1f}s", flush=True)
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            x, out = chained(x)
            if fetch:
                _ = int(np.asarray(out[0]))  # D2H inside the loop
        jax.block_until_ready((x, out))
        dt = time.time() - t0
        rate = batch * iters / dt
        mfu = rate * 105.4 / 1e3 / 197.0
        tag = " [host-fetch each iter]" if fetch else ""
        print(f"batch {batch}: {rate:7.1f} img/s  ({dt/iters*1e3:6.1f} ms)"
              f"  MFU {mfu*100:.1f}%{tag}", flush=True)
    except Exception as e:
        print(f"batch {batch}: FAILED {type(e).__name__}: {e}", flush=True)
