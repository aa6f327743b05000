"""Which augmentation op burns the 1.28 s/step? Time each internal
standalone @512^2 batch 32 with chained inputs."""
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


def timeit(tag, fn):
    f = jax.jit(fn)
    x = images
    k = jax.random.PRNGKey(0)
    t0 = time.time()
    jax.block_until_ready(f(k, x, masks))
    compile_s = time.time() - t0
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        k, sub = jax.random.split(k)
        out = f(sub, x, masks)
        ref = out[0] if isinstance(out, tuple) else out
        x = x * (1.0 + (jnp.mean(ref).astype(jnp.float32) % 0.001) + 0.001)
    jax.block_until_ready(x)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{tag:22s}: {ms:8.1f} ms  (compile {compile_s:.0f}s)", flush=True)


timeit("full policy", lambda k, x, m: aug.augment_batch(
    k, x, m, "transparent_watermark"))


def vmapped(op):
    def run(k, x, m):
        keys = jax.random.split(k, x.shape[0])
        return jax.vmap(op)(keys, x)
    return run


def affine_op(k, im):
    ks = jax.random.split(k, 4)
    scale = 1.0 + jax.random.uniform(ks[0], minval=-0.1, maxval=0.1)
    ang = jax.random.uniform(ks[1], minval=-15.0, maxval=15.0)
    shr = jax.random.uniform(ks[2], minval=-5.0, maxval=5.0)
    sy, sx = aug._affine_grid(512, 512, scale, ang, shr, jnp.zeros(2))
    return aug._bilinear_sample(im, sy, sx)


def jpeg_op(k, im):
    q = jax.random.uniform(k, minval=60.0, maxval=100.0)
    return aug.jpeg_compression_sim(im, q)


def hsv_op(k, im):
    ks = jax.random.split(k, 3)
    return aug._hsv_shift(im, jax.random.uniform(ks[0]) * 15,
                          jax.random.uniform(ks[1]) * 30,
                          jax.random.uniform(ks[2]) * 20)


timeit("affine+bilinear", vmapped(affine_op))
timeit("jpeg dct sim", vmapped(jpeg_op))
timeit("hsv shift", vmapped(hsv_op))
timeit("blur3", vmapped(lambda k, im: aug._blur3(im)))
timeit("noise", vmapped(
    lambda k, im: jnp.clip(im + jax.random.normal(k, im.shape) * 0.03,
                           0, 1)))
