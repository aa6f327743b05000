"""Follow-up to exp_bt_conv.py: resolve the micro-vs-model contradiction.

Round-4 first pass: per-shape at batch 32 bt wins 1.18-1.44x, but the
batch-128 full model LOSES (0.89x bf16, 0.57-0.61x int8). Two probes:
  1. the same tail shapes at batch 128 — does the micro win survive the
     batch regime where XLA picks its MXU-saturating direct strategies?
  2. full model with packing restricted to the pack=8 (Cout=16) final
     block only (MIN_PACK=8) — is the loss from packing the mid convs?
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
from unet_watermark_tpu.ops import bt_conv, quant
from unet_watermark_tpu.utils.benchmarking import (make_chained_forward,
                                                   time_chained)

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)


def time_conv(tag, fn, x, iters=20):
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


# probe 1: tail shapes at BATCH 128 (bf16), the bench regime
B = 128
for label, h, w, cin, cout in [
        ("final conv2 [512²,16->16]", 512, 512, 16, 16),
        ("x_0_* conv2 [256²,32->32]", 256, 256, 32, 32)]:
    print(f"b128 {label}", flush=True)
    x = jnp.asarray(rng.random((B, h, w, cin)), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
    d = time_conv("direct", lambda a: jax.lax.conv_general_dilated(
        a, wt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
    pack = bt_conv.choose_pack(cout, w)
    b = time_conv(f"bt(p={pack})",
                  lambda a: bt_conv.bt_conv3x3(a, wt, pack), x)
    print(f"  -> bt/direct = {d / b:.2f}x", flush=True)


# probe 2: full Unet, packing restricted to pack=8 (final block only)
def model_ab(name, min_pack, batch=128):
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
        bt_conv.MIN_PACK = min_pack

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
            bt_conv.MIN_PACK = 4
        rate = batch / per_iter
        print(f"{name} {tag} b{batch} min_pack={min_pack}: {rate:.1f} img/s "
              f"({per_iter * 1e3:.1f} ms, compile {compile_s:.0f}s)",
              flush=True)
        return rate

    run("bt-bf16", "bt", False)
    run("bt-int8", "bt", True)


model_ab("Unet", min_pack=8)
