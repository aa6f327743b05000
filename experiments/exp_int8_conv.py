"""Microbenchmark: does this TPU backend run int8 convs on the MXU at 2x?

Times bf16 vs s8xs8->s32 conv_general_dilated at two representative
shapes: an MXU-bound mid-stage conv and a thin-channel decoder conv.
Chained dispatches (see docs/PERFORMANCE.md 'Measurement validity').
"""
import sys
import time

sys.path.insert(0, "/root/.axon_site")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("device:", jax.devices()[0], flush=True)


def time_conv(name, x, w, dtype, pet, iters=20):
    x = x.astype(dtype)
    w = w.astype(dtype)

    @jax.jit
    def step(x):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)
        # chain: perturb input with a data-dependent scalar so the tunnel
        # cannot dedup identical dispatches
        s = (jnp.sum(y[0, 0, 0, :8]).astype(jnp.int32) % 3).astype(x.dtype)
        if jnp.issubdtype(dtype, jnp.integer):
            xn = jnp.clip(x.astype(jnp.int32) + s, -127, 127).astype(dtype)
        else:
            xn = x * (1.0 + s.astype(jnp.float32) * 1e-3).astype(dtype)
        return xn, y[0, 0, 0, 0]

    try:
        t0 = time.time()
        xx, _ = step(x)
        jax.block_until_ready(xx)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            xx, out = step(xx)
        jax.block_until_ready((xx, out))
        dt = (time.time() - t0) / iters * 1e3
        b, h, ww, ci = x.shape
        kh, kw, _, co = w.shape
        tflops = 2 * b * h * ww * ci * co * kh * kw / (dt / 1e3) / 1e12
        print(f"{name:44s} {dt:8.2f} ms  {tflops:7.1f} T(fl)op/s "
              f"(compile {compile_s:.0f}s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


rng = np.random.default_rng(0)

# MXU-bound mid stage: [128,64,64,128] x 3x3 128->128
xm = rng.integers(-100, 100, (128, 64, 64, 128)).astype(np.float32)
wm = rng.integers(-4, 4, (3, 3, 128, 128)).astype(np.float32)
# thin-channel decoder stage: [128,256,256,32] x 3x3 32->32
xt = rng.integers(-100, 100, (128, 256, 256, 32)).astype(np.float32)
wt = rng.integers(-4, 4, (3, 3, 32, 32)).astype(np.float32)

for nm, x, w in (("mid 64x64x128", xm, wm), ("thin 256x256x32", xt, wt)):
    a = time_conv(f"{nm} bf16", jnp.asarray(x), jnp.asarray(w),
                  jnp.bfloat16, jnp.float32)
    b = time_conv(f"{nm} int8->int32", jnp.asarray(x, jnp.int8),
                  jnp.asarray(w, jnp.int8), jnp.int8, jnp.int32)
    if a and b:
        print(f"  -> int8 speedup {a / b:.2f}x", flush=True)

# also a plain dot_general check
xd = jnp.asarray(rng.integers(-100, 100, (8192, 512)), jnp.int8)
wd = jnp.asarray(rng.integers(-4, 4, (512, 512)), jnp.int8)


def time_dot(name, x, w, pet, iters=30):
    @jax.jit
    def step(x):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=pet)
        s = (jnp.sum(y[0, :8]).astype(jnp.int32) % 3).astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer):
            xn = jnp.clip(x.astype(jnp.int32) + s, -127, 127).astype(x.dtype)
        else:
            xn = x * (1 + s.astype(x.dtype) * 1e-3)
        return xn, y[0, 0]

    xx, _ = step(x)
    jax.block_until_ready(xx)
    t0 = time.time()
    for _ in range(iters):
        xx, out = step(xx)
    jax.block_until_ready((xx, out))
    dt = (time.time() - t0) / iters * 1e3
    tops = 2 * x.shape[0] * x.shape[1] * w.shape[1] / (dt / 1e3) / 1e12
    print(f"{name:44s} {dt:8.3f} ms  {tops:7.1f} Top/s", flush=True)


time_dot("dot 8192x512x512 int8->int32", xd, wd, jnp.int32)
time_dot("dot 8192x512x512 bf16", xd.astype(jnp.bfloat16),
         wd.astype(jnp.bfloat16), jnp.float32)
