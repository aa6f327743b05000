"""Round-3 step re-timing with the separable (gather-free) warp.

Phases (fault-isolated, serial):
  A. full train step @512^2 batch 32 — separable-warp augmentation
     (the round-2 gather warp measured 1100 ms/step post-rot90-fold).
  B. batch 64, no remat (does the smaller aug footprint fix the OOM?)
  C. batch 64 with MODEL.REMAT=True (round-2 fallback: 827 ms/step).
  D. augmentation alone @batch 32 (vmapped augment_sample, separable).
"""
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.ops import augment as aug
from unet_watermark_tpu.ops import losses as losses_lib
from unet_watermark_tpu.training.train import (create_train_state,
                                               make_train_step)

print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(0)


def train_phase(batch, remat):
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    cfg.LOSS.NAME = "CombinedLoss"
    cfg.TRAIN.BATCH_SIZE = batch
    cfg.MODEL.REMAT = remat
    model, state = create_train_state(cfg, seed=0)
    loss_fn = losses_lib.get_loss_function(cfg)
    step = make_train_step(model, loss_fn, "transparent_watermark")
    images = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
    masks = jnp.asarray(
        (rng.random((batch, 512, 512, 1)) > 0.9), jnp.float32)
    b = {"image": images, "mask": masks,
         "valid": jnp.ones((batch,), jnp.float32)}
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, m = step(state, b, key)
    jax.block_until_ready(m["loss"])
    print(f"  compile {time.time() - t0:.1f}s", flush=True)
    iters = 15
    t0 = time.time()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    rate = batch * iters / dt
    print(f"  TRAIN batch {batch} remat={remat}: {rate:7.1f} img/s "
          f"({dt / iters * 1e3:6.1f} ms/step)", flush=True)
    del state


def aug_phase(batch):
    policy = aug.POLICIES["transparent_watermark"]

    @jax.jit
    def aug_only(key, images, masks):
        keys = jax.random.split(key, images.shape[0])
        im, mk = jax.vmap(
            lambda k, i, m: aug.augment_sample(k, i, m, policy))(
                keys, images, masks)
        # data-dependent chain so dispatches can't dedup
        s = 1.0 + (jnp.mean(im).astype(jnp.float32) % 0.003) + 0.004
        return im * s, mk

    images = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
    masks = jnp.asarray(
        (rng.random((batch, 512, 512, 1)) > 0.9), jnp.float32)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    im, mk = aug_only(key, images, masks)
    jax.block_until_ready((im, mk))
    print(f"  compile {time.time() - t0:.1f}s", flush=True)
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        images, masks = aug_only(sub, images, masks)
    jax.block_until_ready((images, masks))
    dt = time.time() - t0
    print(f"  AUG-ONLY batch {batch}: {dt / iters * 1e3:6.1f} ms/batch",
          flush=True)


for label, fn, args in (
        ("A train b32 separable", train_phase, (32, False)),
        ("B train b64 no-remat", train_phase, (64, False)),
        ("C train b64 remat", train_phase, (64, True)),
        ("D aug-only b32", aug_phase, (32,)),
):
    print(f"phase {label}:", flush=True)
    try:
        fn(*args)
    except Exception:
        traceback.print_exc()
        print(f"  phase {label} FAILED (continuing)", flush=True)
print("all phases done", flush=True)
