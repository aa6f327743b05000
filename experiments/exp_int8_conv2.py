"""Derisk #2 for the int8 inference tier: heavy encoder shapes, the
lhs-dilated fused up-conv, stride-2 and 7x7 stem convs in s8xs8->s32."""
import sys
import time

sys.path.insert(0, "/root/.axon_site")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("device:", jax.devices()[0], flush=True)


def time_conv(name, x, w, pet, iters=20, strides=(1, 1), lhs_dilation=None,
              padding="SAME"):
    @jax.jit
    def step(x):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            lhs_dilation=lhs_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)
        s = (jnp.sum(y[0, 0, 0, :8]).astype(jnp.int32) % 3)
        if jnp.issubdtype(x.dtype, jnp.integer):
            xn = jnp.clip(x.astype(jnp.int32) + s, -127, 127).astype(x.dtype)
        else:
            xn = x * (1.0 + s.astype(jnp.float32) * 1e-3).astype(x.dtype)
        return xn, y[0, 0, 0, 0]

    try:
        t0 = time.time()
        xx, _ = step(x)
        jax.block_until_ready(xx)
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            xx, out = step(xx)
        jax.block_until_ready((xx, out))
        dt = (time.time() - t0) / iters * 1e3
        b, h, ww, ci = x.shape
        kh, kw, _, co = w.shape
        oh = h * (lhs_dilation[0] if lhs_dilation else 1) // strides[0]
        ow = ww * (lhs_dilation[1] if lhs_dilation else 1) // strides[1]
        tflops = 2 * b * oh * ow * ci * co * kh * kw / (dt / 1e3) / 1e12
        print(f"{name:46s} {dt:8.2f} ms  {tflops:6.1f} T/s (c {comp:.0f}s)",
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


rng = np.random.default_rng(0)
B = 128


def pair(name, xshape, wshape, **kw):
    x = rng.integers(-100, 100, xshape).astype(np.float32)
    w = rng.integers(-4, 4, wshape).astype(np.float32)
    a = time_conv(f"{name} bf16", jnp.asarray(x, jnp.bfloat16),
                  jnp.asarray(w, jnp.bfloat16), jnp.float32, **kw)
    b = time_conv(f"{name} int8", jnp.asarray(x, jnp.int8),
                  jnp.asarray(w, jnp.int8), jnp.int32, **kw)
    if a and b:
        print(f"  -> int8 speedup {a / b:.2f}x", flush=True)


# resnet34 heavy stages
pair("layer3 32x32x256", (B, 32, 32, 256), (3, 3, 256, 256))
pair("layer4 16x16x512", (B, 16, 16, 512), (3, 3, 512, 512))
# stem: 7x7/2 on 3 channels
pair("stem 512x512x3 7x7/2", (B, 512, 512, 3), (7, 7, 3, 64),
     strides=(2, 2))
# layer1 high-res 128x128x64
pair("layer1 128x128x64", (B, 128, 128, 64), (3, 3, 64, 64))
# fused up-conv: lhs-dilated 4x4, 32->16 at 256->512
pair("upconv 256->512 lhsdil 32->16", (B, 256, 256, 32), (4, 4, 32, 16),
     lhs_dilation=(2, 2), padding=[(2, 2), (2, 2)])
# decoder thin 512x512x16
pair("final 512x512x16", (B, 512, 512, 16), (3, 3, 16, 16))
