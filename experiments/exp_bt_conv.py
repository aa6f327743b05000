"""On-chip A/B: block-Toeplitz lane packing (ops/bt_conv.py) vs direct.

Two levels, per docs/PERFORMANCE.md's round-3 analysis (the documented
next lever for the thin-channel tail):
  1. per-shape microbench on the actual hot tail shapes from the
     round-3 xplane trace (UNet++ row-0 nodes, final_block convs)
  2. full-model A/B (UNet + UNet++, bf16 + int8, batch 128 @512²)
Chained dispatches via the shared harness (utils/benchmarking.py).
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
from unet_watermark_tpu.models.unet import fuse_up_kernel
from unet_watermark_tpu.ops import bt_conv, quant
from unet_watermark_tpu.utils.benchmarking import (make_chained_forward,
                                                   time_chained)

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)


def time_conv(tag, fn, x, iters=20):
    """Chained conv microbench: perturb the input from the output mean."""

    @jax.jit
    def step(a):
        y = fn(a)
        scale = 1.0 + (jnp.abs(jnp.mean(y)).astype(jnp.float32)
                       % 0.003) - 0.0015
        return a * scale.astype(a.dtype), y

    t0 = time.time()
    out = step(x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    a = out[0]
    t0 = time.time()
    for _ in range(iters):
        a, y = step(a)
    jax.block_until_ready((a, y))
    ms = (time.time() - t0) / iters * 1e3
    print(f"  {tag}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


# ---- level 1: the hot tail shapes (batch 32 to keep HBM happy; the
# ratio is what matters) ----------------------------------------------
B = 32
SHAPES = [
    # (label, H, W, Cin, Cout) — stride-1 3x3 tail convs
    ("final conv2 [512²,16->16]", 512, 512, 16, 16),
    ("x_0_* conv2 [256²,32->32]", 256, 256, 32, 32),
    ("skip conv1 [256²,64->32]", 256, 256, 64, 32),
]
for label, h, w, cin, cout in SHAPES:
    print(label, flush=True)
    x = jnp.asarray(rng.random((B, h, w, cin)), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
    d = time_conv("direct", lambda a: jax.lax.conv_general_dilated(
        a, wt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
    pack = bt_conv.choose_pack(cout, w)
    b = time_conv(f"bt(p={pack})",
                  lambda a: bt_conv.bt_conv3x3(a, wt, pack), x)
    print(f"  -> bt/direct = {d / b:.2f}x", flush=True)

# up-conv shape: final_block up [256²,32 -> 512²,16]
print("final up-conv [256²,32 -> 512²,16]", flush=True)
x = jnp.asarray(rng.random((B, 256, 256, 32)), jnp.bfloat16)
w3 = jnp.asarray(rng.normal(size=(3, 3, 32, 16)) * 0.1, jnp.bfloat16)
k4 = fuse_up_kernel(w3)
d = time_conv("direct lhs-dilated", lambda a: jax.lax.conv_general_dilated(
    a, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
    dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
pack = bt_conv.choose_pack(16, 512)
b = time_conv(f"bt(p={pack})", lambda a: bt_conv.bt_upconv(a, k4, pack), x)
print(f"  -> bt/direct = {d / b:.2f}x", flush=True)


# ---- level 2: full model A/B ----------------------------------------
def model_ab(name, batch=128):
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    cfg.MODEL.NAME = name
    model = create_model_from_config(cfg)
    v = init_model(model, 512, seed=0)
    store = {}
    x_small = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    with quant.quant_observe(store):
        model.apply(v, x_small, train=False)

    def run(tag, lowering, quantized):
        bt_conv.LOWERING_OVERRIDE = lowering

        def apply_model(images):
            if quantized:
                with quant.quant_int8(store):
                    return model.apply(v, images, train=False)
            return model.apply(v, images, train=False)

        try:
            fwd = make_chained_forward(apply_model)
            x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
            compile_s, per_iter = time_chained(fwd, x, iters=20)
        finally:
            bt_conv.LOWERING_OVERRIDE = None
        rate = batch / per_iter
        print(f"{name} {tag} b{batch}: {rate:.1f} img/s "
              f"({per_iter * 1e3:.1f} ms, compile {compile_s:.0f}s)",
              flush=True)
        return rate

    for quantized in (False, True):
        q = "int8" if quantized else "bf16"
        d = run(f"direct-{q}", None, quantized)
        b = run(f"bt-{q}", "bt", quantized)
        print(f"{name} {q}: bt/direct = {b / d:.3f}x", flush=True)


model_ab("Unet")
model_ab("UnetPlusPlus")
