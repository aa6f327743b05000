"""A/B: flagship UNet++ forward, direct vs auto (s2d) conv lowering.

Run me twice via the wrapper __main__: it re-execs itself in two
subprocesses with UWT_CONV_LOWERING=direct and =auto.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import create_model_from_config, init_model

    mode = os.environ.get("UWT_CONV_LOWERING", "auto?")
    print(f"--- lowering={mode} device={jax.devices()[0]}", flush=True)
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    model = create_model_from_config(cfg)
    variables = init_model(model, 512, seed=0)

    def forward(images):
        logits = model.apply(variables, images, train=False)
        probs = jax.nn.sigmoid(logits)
        return jnp.sum(probs > 0.5, axis=(1, 2, 3))

    @jax.jit
    def chained(images):
        counts = forward(images)
        scale = (1.0 + (jnp.sum(counts).astype(jnp.float32) % 0.003) + 0.004)
        return images * scale, counts

    rng = np.random.default_rng(0)
    for batch in (32, 64, 128):
        x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
        t0 = time.time()
        x2, out = chained(x)
        jax.block_until_ready((x2, out))
        print(f"  batch {batch} compile {time.time() - t0:.1f}s", flush=True)
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            x, out = chained(x)
        jax.block_until_ready((x, out))
        dt = time.time() - t0
        rate = batch * iters / dt
        mfu = rate * 105.4 / 1e3 / 197.0
        print(f"  batch {batch}: {rate:7.1f} img/s  ({dt/iters*1e3:6.1f} ms)"
              f"  MFU {mfu*100:.1f}%", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one()
    else:
        for mode in ("direct", "auto"):
            env = dict(os.environ, UWT_CONV_LOWERING=mode)
            r = subprocess.run([sys.executable, __file__, "one"], env=env)
            print(f"=== {mode}: rc={r.returncode}", flush=True)
