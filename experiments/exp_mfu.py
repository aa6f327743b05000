"""MFU experiments on the real chip (VERDICT round-1 item #2).

Measures, steady-state with block_until_ready:
  1. UNet++/resnet34 fused, batch {32, 64, 128}
  2. UNet/resnet34 fused, batch {32, 64, 128}
  3. isolated up-conv variants at the dense-grid hot shape:
     a. lhs-dilated 4x4 fused kernel (current)
     b. polyphase decomposition: 4 standard 2x2 convs + interleave
     c. naive: materialized nearest-up + 3x3 conv
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
from unet_watermark_tpu.models import create_model_from_config, init_model

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)


def timeit(fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.time() - t0) / iters


def model_bench(arch, batches=(32, 64, 128)):
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    cfg.MODEL.NAME = arch
    model = create_model_from_config(cfg)
    variables = init_model(model, 512, seed=0)

    @jax.jit
    def forward(images):
        logits = model.apply(variables, images, train=False)
        mask = jax.nn.sigmoid(logits) > 0.5
        return jnp.sum(mask, axis=(1, 2, 3))

    for b in batches:
        x = jnp.asarray(rng.random((b, 512, 512, 3)), jnp.float32)
        t0 = time.time()
        forward(x).block_until_ready()
        print(f"  {arch} b{b} compile {time.time()-t0:.0f}s", flush=True)
        dt = timeit(forward, x)
        gflop_img = 105.4 if arch == "unetplusplus" else 63.0  # approx
        print(f"  {arch} b{b}: {b/dt:.1f} img/s ({dt*1e3:.1f} ms) "
              f"~{b/dt*gflop_img/1000:.1f} TFLOP/s", flush=True)


# --- isolated up-conv variants --------------------------------------------
def fuse_up_kernel_np(w3):
    k = np.zeros((4, 4) + w3.shape[2:], w3.dtype)
    for da in (0, 1):
        for db in (0, 1):
            k[da:da+3, db:db+3] += w3
    return k


def upconv_dilated(x, k4):
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def upconv_polyphase(x, k4):
    """Same math as upconv_dilated via 4 standard 2x2 convs + interleave.

    out[2i+a, 2j+b] uses kernel taps K[a::2, b::2] (2x2 each) over
    x[i-1+ta, j-1+tb] — i.e. phase (a,b) is conv2x2(x, K[a::2,b::2]) with
    padding chosen so tap t maps to x[i + t - 1 + a'] correctly.
    Derivation: out[u] taps a ≡ u (mod 2); u=2i:   x[i-1], x[i]   (K[0],K[2])
                                  u=2i+1: x[i],  x[i+1]  (K[1],K[3]).
    """
    n, h, w, cin = x.shape
    cout = k4.shape[-1]
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            kk = k4[a::2, b::2]  # (2,2,cin,cout)
            pad_h = (1, 0) if a == 0 else (0, 1)
            pad_w = (1, 0) if b == 0 else (0, 1)
            y = jax.lax.conv_general_dilated(
                x, kk, (1, 1), [pad_h, pad_w],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            phases.append(y)
    # interleave: phases[2a+b][n,i,j,c] -> out[n,2i+a,2j+b,c]
    y = jnp.stack(phases, axis=0).reshape(2, 2, n, h, w, cout)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(n, 2 * h, 2 * w, cout)
    return y


def upconv_naive(x, w3):
    n, h, w, c = x.shape
    y = x[:, :, None, :, None, :]
    y = jnp.broadcast_to(y, (n, h, 2, w, 2, c)).reshape(n, 2*h, 2*w, c)
    return jax.lax.conv_general_dilated(
        y, w3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def upconv_bench():
    # dense-grid hot shape: x_0_j up-convs take [32,128,128,C]-ish inputs
    # producing [32,256,256,32]; final block [32,256,256,32]->[32,512,512,16]
    shapes = [
        ((32, 128, 128, 64), 32),   # row-0 grid node
        ((32, 256, 256, 32), 16),   # final block
    ]
    for (shape, cout) in shapes:
        x = jnp.asarray(rng.random(shape), jnp.bfloat16)
        w3 = jnp.asarray(rng.random((3, 3, shape[-1], cout)) - 0.5,
                         jnp.bfloat16)
        k4 = jnp.asarray(fuse_up_kernel_np(np.asarray(w3, np.float32)),
                         jnp.bfloat16)
        f_dil = jax.jit(upconv_dilated)
        f_pol = jax.jit(upconv_polyphase)
        f_nai = jax.jit(upconv_naive)
        # correctness
        a = np.asarray(f_dil(x, k4), np.float32)
        bq = np.asarray(f_pol(x, k4), np.float32)
        c = np.asarray(f_nai(x, w3), np.float32)
        print(f"  shape {shape}->{cout}: poly-vs-dil max err "
              f"{np.abs(a-bq).max():.4f}, naive-vs-dil {np.abs(a-c).max():.4f}",
              flush=True)
        for name, f, arg in (("dilated", f_dil, k4), ("polyphase", f_pol, k4),
                             ("naive", f_nai, w3)):
            dt = timeit(f, x, arg)
            macs = shape[0]*shape[1]*shape[2]*4*9*shape[3]*cout
            print(f"    {name:10s}: {dt*1e3:6.2f} ms  "
                  f"({macs*2/dt/1e12:.1f} eff TFLOP/s)", flush=True)


# --- phase-packed up-conv: one 3x3 conv -> 4*Cout channels + d2s ---------
def pack_phase_kernel(k4):
    """[4,4,Cin,Cout] fused kernel -> [3,3,Cin,4*Cout] phase-packed P.
    P[u+a, v+b, ci, (a,b,co)] = K4[2u+a, 2v+b, ci, co], u,v,a,b in {0,1}.
    conv(x, P, SAME)[n,i,j,(a,b,co)] == upconv_dilated(x,K4)[n,2i+a,2j+b,co]
    """
    cin, cout = k4.shape[2], k4.shape[3]
    P = jnp.zeros((3, 3, cin, 2, 2, cout), k4.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for u in (0, 1):
                for v in (0, 1):
                    P = P.at[u + a, v + b, :, a, b, :].add(
                        k4[2 * u + a, 2 * v + b])
    return P.reshape(3, 3, cin, 4 * cout)


def upconv_phased(x, k4):
    n, h, w, cin = x.shape
    cout = k4.shape[-1]
    P = pack_phase_kernel(k4)
    y4 = jax.lax.conv_general_dilated(
        x, P, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y4 = y4.reshape(n, h, w, 2, 2, cout)
    return y4.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)


def phased_bench():
    shapes = [
        ((32, 128, 128, 64), 32),   # row-0 grid node
        ((32, 256, 256, 32), 16),   # final block
        ((32, 256, 256, 32), 32),   # UNet block3-like
    ]
    for (shape, cout) in shapes:
        x = jnp.asarray(rng.random(shape), jnp.bfloat16)
        w3 = jnp.asarray(rng.random((3, 3, shape[-1], cout)) - 0.5,
                         jnp.bfloat16)
        k4 = jnp.asarray(fuse_up_kernel_np(np.asarray(w3, np.float32)),
                         jnp.bfloat16)
        f_dil = jax.jit(upconv_dilated)
        f_pha = jax.jit(upconv_phased)
        a = np.asarray(f_dil(x, k4), np.float32)
        b = np.asarray(f_pha(x, k4), np.float32)
        print(f"  shape {shape}->{cout}: phased-vs-dil max err "
              f"{np.abs(a-b).max():.4f}", flush=True)
        for name, f in (("dilated", f_dil), ("phased", f_pha)):
            dt = timeit(f, x, k4)
            macs = shape[0]*shape[1]*shape[2]*4*9*shape[3]*cout
            print(f"    {name:10s}: {dt*1e3:6.2f} ms  "
                  f"({macs*2/dt/1e12:.1f} eff TFLOP/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "phased"):
        print("=== phase-packed up-conv ===", flush=True)
        phased_bench()
    if which in ("all", "upconv"):
        print("=== isolated up-conv variants ===", flush=True)
        upconv_bench()
    if which in ("all", "unetpp"):
        print("=== UNet++ batch sweep ===", flush=True)
        model_bench("unetplusplus")
    if which in ("all", "unet"):
        print("=== UNet batch sweep ===", flush=True)
        model_bench("unet")
