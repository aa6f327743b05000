"""Round-3 timing sweep (real chip, serial phases, each fault-isolated).

A. full train step @512^2 batch 32, post-rot90-fold augmentation — the
   re-timing PERFORMANCE.md:142 left pending.
B. batch-64 train step with MODEL.REMAT=True — attacks the round-2 OOM
   (15.76G > 15.75G from lane-padded thin-channel activations).
C. plain UNet/resnet34 fused inference @batch 128 — speed-tier candidate
   (951 img/s @batch 32; UNet++ gained 2.5x going 32->128).

Timing validity: train steps chain through state (plain loop valid);
inference uses the chained-dispatch perturbation (see bench.py).
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
    policy = cfg.DATA.AUGMENTATION_TYPE
    if policy not in aug.POLICIES:
        policy = "transparent_watermark"
    step = make_train_step(model, loss_fn, policy)
    images = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
    masks = jnp.asarray(
        (rng.random((batch, 512, 512, 1)) > 0.9), jnp.float32)
    b = {"image": images, "mask": masks,
         "valid": jnp.ones((batch,), jnp.float32)}
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, m = step(state, b, key)
    jax.block_until_ready(m["loss"])
    print(f"  train batch {batch} remat={remat} "
          f"compile {time.time() - t0:.1f}s", flush=True)
    iters = 15
    t0 = time.time()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    rate = batch * iters / dt
    mfu = rate * 3 * 105.4 / 1e3 / 197.0
    print(f"  TRAIN batch {batch} remat={remat}: {rate:7.1f} img/s "
          f"({dt / iters * 1e3:6.1f} ms/step)  ~MFU {mfu * 100:.1f}%",
          flush=True)
    del state


def infer_phase(name, batch):
    from unet_watermark_tpu.models import (create_model_from_config,
                                           init_model)

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = name
    cfg.DATA.IMG_SIZE = 512
    model = create_model_from_config(cfg)
    variables = init_model(model, 512, seed=0)
    threshold = cfg.PREDICT.THRESHOLD

    @jax.jit
    def fwd_chained(images):
        logits = model.apply(variables, images, train=False)
        counts = jnp.sum(jax.nn.sigmoid(logits) > threshold, axis=(1, 2, 3))
        ratio = jnp.sum(counts).astype(jnp.float32) / (
            images.shape[0] * images.shape[1] * images.shape[2])
        return images * (1.0 + ratio % 0.003 + 0.004), counts

    x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
    t0 = time.time()
    x2, c = fwd_chained(x)
    jax.block_until_ready((x2, c))
    print(f"  infer {name} batch {batch} compile {time.time() - t0:.1f}s",
          flush=True)
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        x, c = fwd_chained(x)
    jax.block_until_ready((x, c))
    dt = time.time() - t0
    rate = batch * iters / dt
    print(f"  INFER {name} batch {batch}: {rate:7.1f} img/s "
          f"({dt / iters * 1e3:6.1f} ms/batch)", flush=True)


for label, fn, args in (
        ("A train b32 post-fold", train_phase, (32, False)),
        ("B train b64 remat", train_phase, (64, True)),
        ("C unet b128", infer_phase, ("Unet", 128)),
        ("C2 unet b64", infer_phase, ("Unet", 64)),
):
    print(f"phase {label}:", flush=True)
    try:
        fn(*args)
    except Exception:
        traceback.print_exc()
        print(f"  phase {label} FAILED (continuing)", flush=True)
print("all phases done", flush=True)
