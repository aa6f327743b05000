"""Conv controls with IN-GRAPH chained loops (the reliable methodology).

K chained iterations inside one jit: each consumes a full reduction of the
previous conv output (no DCE, no dedup, no laziness — the single fetch at
the end forces the whole graph). Baseline loop without the conv isolates
loop/reduce overhead. net_conv = (tA - tB) / K.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)
K = 32
REPS = 3


def timed(f, x):
    y = f(x)
    _ = np.asarray(y[0, 0, 0, :4])  # force
    best = 1e9
    for _ in range(REPS):
        t0 = time.time()
        y = f(x)
        _ = np.asarray(y[0, 0, 0, :4])
        best = min(best, time.time() - t0)
    return best


def loop_with(op_or_none, x, w=None):
    def body(i, x):
        if op_or_none is None:
            s = jnp.sum(x.astype(jnp.float32))
        else:
            y = op_or_none(x, w)
            s = jnp.sum(y.astype(jnp.float32))
        return x * (1.0 + (jnp.abs(s) % 0.003) + 0.004).astype(x.dtype)
    return jax.jit(lambda x: jax.lax.fori_loop(0, K, body, x))


def conv(k, pad):
    return lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def upconv(x, k4):
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run_case(tag, x, w, op, flops):
    tA = timed(loop_with(op, x, w), x)
    tB = timed(loop_with(None, x), x)
    net = max((tA - tB) / K, 1e-9)
    print(f"{tag:28s}: {net*1e3:7.3f} ms/op  {flops/net/1e12:6.1f} TFLOP/s  "
          f"(loop {tA:.2f}s vs base {tB:.2f}s)", flush=True)


cases = [
    ((32, 128, 128, 128), 3, 128, "fat 3x3 128->128 @128^2"),
    ((32, 256, 256, 128), 3, 128, "fat 3x3 128->128 @256^2"),
    ((32, 256, 256, 32), 3, 32,  "thin 3x3 32->32 @256^2"),
    ((32, 512, 512, 16), 3, 16,  "thin 3x3 16->16 @512^2"),
    ((32, 256, 256, 96), 3, 32,  "grid 3x3 96->32 @256^2"),
]
for shape, k, cout, tag in cases:
    x = jnp.asarray(rng.random(shape), jnp.bfloat16)
    w = jnp.asarray(rng.random((k, k, shape[-1], cout)) - 0.5, jnp.bfloat16)
    if cout != shape[-1]:
        # chain needs shape-preserving x; pad w to square ch for simplicity
        w = jnp.asarray(rng.random((k, k, shape[-1], shape[-1])) - 0.5,
                        jnp.bfloat16)
        cout = shape[-1]
        tag = tag.split("(")[0]
    flops = 2 * shape[0] * shape[1] * shape[2] * k * k * shape[3] * cout
    run_case(tag, x, w, conv(k, (k - 1) // 2), flops)

# upconv: output is 2x spatial — chain via strided slice back to x shape
for shape, cout, tag in [((32, 128, 128, 64), 32, "upconv dil 64->32 @128^2"),
                         ((32, 256, 256, 32), 16, "upconv dil 32->16 @256^2")]:
    x = jnp.asarray(rng.random(shape), jnp.bfloat16)
    k4 = jnp.asarray(rng.random((4, 4, shape[-1], cout)) - 0.5, jnp.bfloat16)

    def op(x, w):
        y = upconv(x, w)
        return y  # reduced fully in body

    tA = timed(loop_with(op, x, k4), x)
    tB = timed(loop_with(None, x), x)
    net = max((tA - tB) / K, 1e-9)
    flops = 2 * shape[0] * shape[1] * shape[2] * 4 * 9 * shape[3] * cout
    print(f"{tag:28s}: {net*1e3:7.3f} ms/op  {flops/net/1e12:6.1f} "
          f"eff TFLOP/s", flush=True)
