"""Training throughput on the real chip: fused train step, 512^2 bf16.

img/s/chip at batch {16, 32, 64}; train steps chain naturally through the
updated state (no two dispatches identical), so plain loop timing is valid
under the dedup'ing tunnel. Reference projected 100->140 img/s on GPU
(OPTIMIZATION_README.md:179-188).

Also A/B's the conv lowering via UWT_CONV_LOWERING when set.
"""
import os
import sys
import time

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

print(f"device: {jax.devices()[0]}  "
      f"lowering={os.environ.get('UWT_CONV_LOWERING', '(auto)')}",
      flush=True)

cfg = get_cfg_defaults()
cfg.DATA.IMG_SIZE = 512
cfg.LOSS.NAME = "CombinedLoss"  # flagship training config (cache hit)
rng = np.random.default_rng(0)

for batch in (32, 64, 128):
    cfg.TRAIN.BATCH_SIZE = batch
    model, state = create_train_state(cfg, seed=0)
    loss_fn = losses_lib.get_loss_function(cfg)
    policy = cfg.DATA.AUGMENTATION_TYPE
    if policy not in aug.POLICIES:
        policy = "transparent_watermark"
    step = make_train_step(model, loss_fn, policy)
    images = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
    masks = jnp.asarray(
        (rng.random((batch, 512, 512, 1)) > 0.9), jnp.float32)
    valid = jnp.ones((batch,), jnp.float32)
    b = {"image": images, "mask": masks, "valid": valid}
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, m = step(state, b, key)
    jax.block_until_ready(m["loss"])
    print(f"  batch {batch} compile {time.time() - t0:.1f}s", flush=True)
    iters = 15
    t0 = time.time()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    rate = batch * iters / dt
    # fwd+bwd ~ 3x fwd FLOPs: 3 * 105.4 GF/img
    mfu = rate * 3 * 105.4 / 1e3 / 197.0
    print(f"  batch {batch}: {rate:7.1f} img/s  ({dt/iters*1e3:6.1f} "
          f"ms/step)  ~MFU {mfu*100:.1f}%", flush=True)
    del state
