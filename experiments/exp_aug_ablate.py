"""Ablate policy pieces to find the remaining train-step aug cost."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unet_watermark_tpu.ops import augment as aug

print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((32, 512, 512, 3)), jnp.float32)
masks = jnp.asarray((rng.random((32, 512, 512, 1)) > 0.95), jnp.float32)

BASE = aug.POLICIES["transparent_watermark"]


def timeit(tag, policy):
    aug.POLICIES["_ablate"] = policy

    def fn(k, x, m):
        return aug.augment_batch(k, x, m, "_ablate")

    f = jax.jit(fn)
    x = images
    k = jax.random.PRNGKey(0)
    t0 = time.time()
    jax.block_until_ready(f(k, x, masks))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        k, sub = jax.random.split(k)
        out, _ = f(sub, x, masks)
        x = x * (1.0 + (jnp.mean(out).astype(jnp.float32) % 0.001) + 0.001)
    jax.block_until_ready(x)
    print(f"{tag:28s}: {(time.time() - t0) / 10 * 1e3:8.1f} ms  "
          f"(compile {c:.0f}s)", flush=True)


timeit("full", BASE)
timeit("no affine", dataclasses.replace(BASE, affine_p=0.0, scale_limit=0.0,
                                        rotate_limit=0.0, shear_limit=0.0))
timeit("no rot90", dataclasses.replace(BASE, rot90_p=0.0))
timeit("no flips", dataclasses.replace(BASE, hflip_p=0.0, vflip_p=0.0))
timeit("no jpeg", dataclasses.replace(BASE, jpeg_p=0.0))
timeit("geo only", dataclasses.replace(BASE, bc_p=0.0, hsv_p=0.0,
                                       noise_p=0.0, blur_p=0.0, jpeg_p=0.0))
