"""Time the separable matmul+roll warp vs the old gather warp, plus the
full aug policy and full train step at b32/b64 (512^2, real chip)."""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses
from unet_watermark_tpu.ops import augment as aug

print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(0)
B, S = 32, 512
imgs = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)
masks = jnp.asarray((rng.random((B, S, S, 1)) > 0.9), jnp.float32)

def time_policy(name, policy):
    f = jax.jit(lambda k, i, m: aug.augment_batch(k, i, m, policy))
    k = jax.random.PRNGKey(0)
    t0 = time.time()
    o = f(k, imgs, masks); jax.block_until_ready(o)
    ct = time.time() - t0
    iters = 10
    t0 = time.time()
    for i in range(iters):
        o = f(jax.random.PRNGKey(i), imgs, masks)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:28s}: {dt:8.1f} ms  (compile {ct:.0f}s)", flush=True)

base = aug.POLICIES["transparent_watermark"]
for label, pol in (
    ("full separable (new)", base),
    ("full gather (old)", dataclasses.replace(base, interpolation="nearest_gather")),
    ("warp-only separable", dataclasses.replace(base, affine_p=1.0, rot90_p=0.0, hflip_p=0, vflip_p=0, bc_p=0, hsv_p=0, noise_p=0, blur_p=0, jpeg_p=0)),
):
    try:
        time_policy(label, pol)
    except Exception:
        traceback.print_exc()

# full train step b32 + b64 with new warp
from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.ops import losses as losses_lib
from unet_watermark_tpu.training.train import create_train_state, make_train_step

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
    ms = jnp.asarray((rng.random((batch, 512, 512, 1)) > 0.9), jnp.float32)
    b = {"image": images, "mask": ms, "valid": jnp.ones((batch,), jnp.float32)}
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, m = step(state, b, key)
    jax.block_until_ready(m["loss"])
    ct = time.time() - t0
    iters = 15
    t0 = time.time()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    print(f"TRAIN b{batch} remat={remat}: {batch*iters/dt:7.1f} img/s "
          f"({dt/iters*1e3:6.1f} ms/step, compile {ct:.0f}s)", flush=True)
    del state

for b, r in ((32, False), (64, True), (128, True)):
    try:
        train_phase(b, r)
    except Exception:
        traceback.print_exc()
        print(f"TRAIN b{b} FAILED (continuing)", flush=True)
print("done", flush=True)
