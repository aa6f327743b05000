"""Measured like-for-like CPU-LaMa vs on-chip fused repair (VERDICT r2 #4).

The round-2 bench line compared against a folklore "~2000-10000 ms/img"
CPU-LaMa range. This measures it: the SAME FFC-LaMa generator (shipped
weights, 512² input, batch 1) timed on the host CPU backend — the honest
stand-in for the reference's iopaint-LaMa-on-CPU path — vs the fused
detect→optimize→inpaint graph on the TPU chip (batch 16, chained
dispatches per docs/PERFORMANCE.md Measurement validity).

Run phases separately (1-core host; JAX can't host two backends in one
process cleanly):
    python workspace/exp_cpu_lama.py cpu
    python workspace/exp_cpu_lama.py tpu
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if MODE == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

print(f"mode={MODE} device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(0)


def time_cpu_lama():
    from unet_watermark_tpu.inference.engines import (
        load_lama_variables, resolve_inpaint_weights)

    wp = resolve_inpaint_weights()
    model, variables, name = load_lama_variables(wp, "lama")
    assert variables is not None, wp
    print(f"engine: ffc-{name} from {wp}", flush=True)

    @jax.jit
    def fill(im, mk):
        return model.apply(variables, im, mk, train=False)

    im = jnp.asarray(rng.random((1, 512, 512, 3)), jnp.float32)
    mk = jnp.asarray(rng.random((1, 512, 512, 1)) > 0.9, jnp.float32)
    t0 = time.time()
    jax.block_until_ready(fill(im, mk))
    print(f"  compile: {time.time() - t0:.1f}s", flush=True)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = fill(im, mk)
    jax.block_until_ready(out)
    per = (time.time() - t0) / iters * 1e3
    print(f"  CPU FFC-LaMa 512^2 batch1: {per:.0f} ms/img", flush=True)


def time_tpu_fused():
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.inference.predict import WatermarkPredictor

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    predictor = WatermarkPredictor(model_path=None, config=cfg)
    fused = predictor.make_fused_repair_fn()
    print(f"engine_used: {fused.engine_used}", flush=True)

    @jax.jit
    def chained(images):
        out = fused(images)
        scale = 1.0 + (jnp.mean(out).astype(jnp.float32) % 0.003) + 0.004
        return images * scale, out

    x = jnp.asarray(rng.random((16, 512, 512, 3)), jnp.float32)
    t0 = time.time()
    jax.block_until_ready(chained(x))
    print(f"  compile: {time.time() - t0:.1f}s", flush=True)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        x, out = chained(x)
    jax.block_until_ready((x, out))
    per = (time.time() - t0) / iters / 16 * 1e3
    print(f"  TPU fused detect+optimize+inpaint [{fused.engine_used}] "
          f"512^2: {per:.1f} ms/img", flush=True)


if MODE == "cpu":
    time_cpu_lama()
else:
    time_tpu_fused()
print("done", flush=True)
