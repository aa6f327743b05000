"""Throughput probe for the UnetTPU lane-aligned tier (round-4 verdict
task 3) BEFORE spending TPU hours training it.

Random weights, dummy per-conv amax scales (throughput is weight-value
independent): measures bf16 and int8 512² forward throughput with the
shared chained-dispatch harness (utils/benchmarking.py), the same
method as bench.py. Decision rule: the architecture is worth training
only if int8 throughput clearly beats the shipped Unet int8 tier
(~2,911 img/s round 4) on the way to the >=4,000 img/s target.

Run: python experiments/exp_unettpu_probe.py [--batches 128,192]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

GFLOP_PER_IMG = 44.3   # slim plan: XLA cost_analysis @128² ×16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128")
    ap.add_argument("--model", default="UnetTPU")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import create_model_from_config, init_model
    from unet_watermark_tpu.ops.quant import quant_int8, quant_observe
    from unet_watermark_tpu.utils.benchmarking import make_chained_forward

    print("device:", jax.devices()[0].device_kind, flush=True)
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    cfg.MODEL.NAME = args.model
    model = create_model_from_config(cfg)
    variables = init_model(model, 512, seed=0)

    # collect conv paths via one eager observed forward at tiny res
    store = {}
    small = init_model(model, 64, seed=0)
    with quant_observe(store):
        model.apply(small, jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                    train=False)
    scales = {k: 1.0 for k in store}
    print(f"{len(scales)} quantizable convs", flush=True)

    threshold = cfg.PREDICT.THRESHOLD
    rng = np.random.default_rng(0)

    for tag, ctx in (("bf16", None), ("int8", scales)):
        def apply_model(images, ctx=ctx):
            if ctx is not None:
                with quant_int8(ctx):
                    return model.apply(variables, images, train=False)
            return model.apply(variables, images, train=False)

        fwd = make_chained_forward(apply_model, threshold)
        for batch in batches:
            x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
            t0 = time.time()
            jax.block_until_ready(fwd(x))
            print(f"{args.model}-{tag} b{batch} compile "
                  f"{time.time() - t0:.1f}s", flush=True)
            iters = 20
            t0 = time.time()
            for _ in range(iters):
                x, out = fwd(x)
            jax.block_until_ready((x, out))
            dt = time.time() - t0
            rate = batch * iters / dt
            mfu = rate * GFLOP_PER_IMG / 1e3 / (
                197.0 if tag == "bf16" else 394.0)
            print(f"{args.model}-{tag} b{batch}: {rate:.1f} img/s "
                  f"({dt / iters * 1e3:.1f} ms) MFU {mfu * 100:.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()
