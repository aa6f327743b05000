"""Conv controls with FETCH-FORCED timing.

Each iteration fetches float(sum(y)) — a lazy/deferring runtime must
execute the conv to produce it; chained inputs prevent result caching.
Round-trip overhead measured with a trivial graph and reported.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)
ITERS = 10


def timeit_fetch(make_step, x, *args):
    step = jax.jit(make_step)
    x2, s = step(x, *args)
    float(s)
    t0 = time.time()
    for _ in range(ITERS):
        x, s = step(x, *args)
        float(s)          # host fetch forces execution
    return (time.time() - t0) / ITERS


# tunnel round-trip floor: trivial graph + scalar fetch
def triv(x):
    return x * (1.0 + 0.004), jnp.sum(x[0, 0, 0])

xs = jnp.asarray(rng.random((32, 128, 128, 128)), jnp.bfloat16)
rt = timeit_fetch(triv, xs)
print(f"roundtrip floor (trivial graph): {rt*1e3:.2f} ms", flush=True)


def conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def upconv_dilated(x, k4):
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


cases = [
    ((32, 128, 128, 128), 2, 256, "fat 2x2 128->256 @128^2"),
    ((32, 128, 128, 128), 3, 128, "fat 3x3 128->128 @128^2"),
    ((32, 256, 256, 128), 3, 128, "fat 3x3 128->128 @256^2"),
    ((32, 256, 256, 32), 3, 16,  "thin 3x3 32->16 @256^2"),
    ((32, 256, 256, 32), 3, 32,  "thin 3x3 32->32 @256^2"),
    ((32, 512, 512, 16), 3, 16,  "thin 3x3 16->16 @512^2"),
    ((32, 256, 256, 96), 3, 32,  "grid 3x3 96->32 @256^2"),
]
for shape, k, cout, tag in cases:
    x = jnp.asarray(rng.random(shape), jnp.bfloat16)
    w = jnp.asarray(rng.random((k, k, shape[-1], cout)) - 0.5, jnp.bfloat16)
    pad = (k - 1) // 2

    def step(x, w, pad=pad):
        y = conv(x, w, pad)
        s = jnp.sum(y.astype(jnp.float32))
        xn = x * (1.0 + (jnp.abs(s) % 0.003) + 0.004).astype(x.dtype)
        return xn, s

    dt = timeit_fetch(step, x, w)
    flops = 2 * shape[0] * shape[1] * shape[2] * k * k * shape[3] * cout
    net = max(dt - rt, 1e-9)
    print(f"{tag:28s}: {dt*1e3:7.2f} ms  net {flops/net/1e12:6.1f} TFLOP/s",
          flush=True)

for shape, cout, tag in [((32, 128, 128, 64), 32, "upconv dil 64->32 @128^2"),
                         ((32, 256, 256, 32), 16, "upconv dil 32->16 @256^2")]:
    x = jnp.asarray(rng.random(shape), jnp.bfloat16)
    k4 = jnp.asarray(rng.random((4, 4, shape[-1], cout)) - 0.5, jnp.bfloat16)

    def step(x, k4):
        y = upconv_dilated(x, k4)
        s = jnp.sum(y.astype(jnp.float32))
        xn = x * (1.0 + (jnp.abs(s) % 0.003) + 0.004).astype(x.dtype)
        return xn, s

    dt = timeit_fetch(step, x, k4)
    flops = 2 * shape[0] * shape[1] * shape[2] * 4 * 9 * shape[3] * cout
    net = max(dt - rt, 1e-9)
    print(f"{tag:28s}: {dt*1e3:7.2f} ms  net {flops/net/1e12:6.1f} "
          f"eff TFLOP/s", flush=True)
