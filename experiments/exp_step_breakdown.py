"""Train-step cost breakdown @512^2 batch 32: where do 1527 ms go?

Variants (each chained through state updates, so timing is valid):
  full      — augment + fwd/bwd + optimizer (the production step)
  no-aug    — normalize only, no augmentation pipeline
  fwd-bwd   — no-aug without the optimizer update (grads only)
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
from unet_watermark_tpu.ops import augment as aug
from unet_watermark_tpu.ops import losses as losses_lib
from unet_watermark_tpu.training.train import create_train_state

print(f"device: {jax.devices()[0]}", flush=True)
cfg = get_cfg_defaults()
cfg.DATA.IMG_SIZE = 512
cfg.LOSS.NAME = "CombinedLoss"
cfg.TRAIN.BATCH_SIZE = 32

model, state0 = create_train_state(cfg, seed=0)
loss_fn = losses_lib.get_loss_function(cfg)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((32, 512, 512, 3)), jnp.float32)
masks = jnp.asarray((rng.random((32, 512, 512, 1)) > 0.95), jnp.float32)


def make_step(do_aug: bool, do_opt: bool):
    def step(state, images, masks, rngk):
        if do_aug:
            im, mk = aug.augment_batch(rngk, images, masks,
                                       "transparent_watermark")
        else:
            im, mk = aug.normalize(images), masks

        def loss_of(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                im, train=True, mutable=["batch_stats"])
            return loss_fn(logits, mk), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        if do_opt:
            state = state.apply_gradients(grads, new_bs)
        else:
            # consume grads so they aren't DCE'd; perturb params trivially
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            state = state.replace(params=jax.tree_util.tree_map(
                lambda p: p * (1.0 + 1e-12 * gsum.astype(p.dtype)),
                state.params), batch_stats=new_bs)
        return state, loss

    return jax.jit(step)


for tag, do_aug, do_opt in (("full", True, True),
                            ("no-aug", False, True),
                            ("fwd-bwd only", False, False)):
    step = make_step(do_aug, do_opt)
    state = state0
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, loss = step(state, images, masks, key)
    jax.block_until_ready(loss)
    print(f"{tag}: compile {time.time() - t0:.1f}s", flush=True)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, loss = step(state, images, masks, sub)
    jax.block_until_ready(loss)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{tag}: {ms:7.1f} ms/step  ({32e3 / ms:.1f} img/s)", flush=True)
    del state
