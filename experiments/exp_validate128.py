"""Validity check for the batch-128 throughput: in-graph chained loop.

One jit dispatch runs the full flagship forward K times chained (each
iteration's input is perturbed by the previous output — strictly
sequential on device). Per-forward time = slope between K=4 and K=16:
(t16 - t4) / 12. No per-iteration host involvement at all, so tunnel
latency/dedup cannot bias it in either direction.
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


def loop_fn(k):
    def body(_, x):
        logits = model.apply(variables, x, train=False)
        counts = jnp.sum(jax.nn.sigmoid(logits) > 0.5, axis=(1, 2, 3))
        scale = (1.0 + (jnp.sum(counts).astype(jnp.float32) % 0.003)
                 + 0.004)
        return x * scale

    return jax.jit(lambda x: jax.lax.fori_loop(0, k, body, x))


rng = np.random.default_rng(0)
batch = 128
x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
times = {}
for k in (4, 16):
    f = loop_fn(k)
    t0 = time.time()
    f(x).block_until_ready()
    print(f"K={k} compile+run {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        f(x).block_until_ready()
        best = min(best, time.time() - t0)
    times[k] = best
    print(f"K={k}: {best:.3f}s", flush=True)

per_fwd = (times[16] - times[4]) / 12
rate = batch / per_fwd
print(f"slope per forward: {per_fwd * 1e3:.1f} ms -> {rate:.1f} img/s "
      f"(MFU {rate * 105.4 / 1e3 / 197.0 * 100:.1f}%)", flush=True)
