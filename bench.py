"""Benchmark: 512² segmentation inference throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: BASELINE.json north star = 5,000 images/s/chip at 512×512
(UNet++/resnet34 segmentation, IoU parity assumed via golden tests).
vs_baseline = value / 5000.

Method: flagship model, bf16 NHWC, steady-state batched forward with the
output reduced on device (mask threshold + per-image sum) so the timing
includes mask extraction but not a 512²-per-image D2H copy — matching how
the batched predict pipeline consumes logits.
"""
from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def claim_jax(retries: int = 4, wait: float = 15.0):
    """Initialize jax; if the axon plugin missed registration (e.g. a
    clobbered PYTHONPATH dropped /root/.axon_site/sitecustomize.py),
    re-register it manually and retry."""
    if "/root/.axon_site" not in sys.path:
        sys.path.insert(0, "/root/.axon_site")
    import jax
    for i in range(retries):
        try:
            jax.devices()
            return jax
        except RuntimeError as e:
            log(f"jax init attempt {i + 1} failed: {e}")
            try:
                import os
                import uuid
                from axon.register import register
                register(
                    None,
                    f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
                    so_path="/opt/axon/libaxon_pjrt.so",
                    session_id=str(uuid.uuid4()),
                    remote_compile=os.environ.get(
                        "PALLAS_AXON_REMOTE_COMPILE") == "1")
            except Exception as e2:  # noqa: BLE001
                log(f"axon re-register failed: {e2}")
            time.sleep(wait)
    jax.devices()  # raise
    return jax


def main():
    jax = claim_jax()
    # persistent compile cache: the 512² UNet++ graph takes minutes to
    # compile through the remote-compile tunnel; cache it across runs.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        log(f"compilation cache unavailable: {e}")
    import jax.numpy as jnp
    import numpy as np

    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import create_model_from_config, init_model

    dev = jax.devices()[0]
    log(f"device: {dev}")

    threshold = get_cfg_defaults().PREDICT.THRESHOLD

    def make_chained(model, variables, quant_scales=None):
        """Chained timing step — the shared measurement-validity harness
        (utils/benchmarking.py; docs/PERFORMANCE.md 'Measurement
        validity')."""
        from unet_watermark_tpu.utils.benchmarking import (
            make_chained_forward)

        def apply_model(images):
            if quant_scales:
                from unet_watermark_tpu.ops.quant import quant_int8
                with quant_int8(quant_scales):
                    return model.apply(variables, images, train=False)
            return model.apply(variables, images, train=False)

        return make_chained_forward(apply_model, threshold)

    rng = np.random.default_rng(0)

    def sweep(name, gflop_per_img, batches, quant=False):
        cfg = get_cfg_defaults()
        cfg.DATA.IMG_SIZE = 512
        cfg.MODEL.NAME = name
        model = create_model_from_config(cfg)
        variables = init_model(model, 512, seed=0)
        quant_scales = None
        if quant:
            # the shipped calibration sidecar (quality-qualified on the
            # frozen held-out protocol, docs/QUALITY.md int8 rows)
            from unet_watermark_tpu.ops.quant import load_scales
            from unet_watermark_tpu.scripts.calibrate_quant import (
                quant_sidecar_path)
            from unet_watermark_tpu.utils.shipping import resolve

            wp = resolve("seg", cfg=cfg)
            sidecar = quant_sidecar_path(wp) if wp else None
            if not sidecar or not __import__("os").path.exists(sidecar):
                log(f"{name} int8 tier skipped: no calibration sidecar")
                return 0.0, batches[0]
            quant_scales = load_scales(sidecar)
            name += "-int8"
        fwd = make_chained(model, variables, quant_scales)
        best_rate, best_batch = 0.0, batches[0]
        for batch in batches:
            x = jnp.asarray(rng.random((batch, 512, 512, 3)), jnp.float32)
            t0 = time.time()
            jax.block_until_ready(fwd(x))
            log(f"{name} batch {batch} compile: {time.time() - t0:.1f}s")
            iters = 20
            t0 = time.time()
            for _ in range(iters):
                x, out = fwd(x)
            jax.block_until_ready((x, out))
            dt = time.time() - t0
            rate = batch * iters / dt
            mfu = rate * gflop_per_img / 1e3 / 197.0  # v5e peak 197 TF/s
            log(f"{name} batch {batch}: {rate:.1f} img/s "
                f"({dt / iters * 1e3:.1f} ms) MFU {mfu * 100:.1f}%")
            if rate > best_rate:
                best_rate, best_batch = rate, batch
        return best_rate, best_batch

    def shipped_weights_exist(name):
        from unet_watermark_tpu.utils.shipping import resolve
        cfg = get_cfg_defaults()
        cfg.MODEL.NAME = name
        return bool(resolve("seg", cfg=cfg))

    # quality tier: UNet++ (the reference's flagship architecture)
    pp_rate, pp_batch = sweep("UnetPlusPlus", 105.4, (32, 128))
    log(f"UnetPlusPlus best: batch {pp_batch} at {pp_rate:.1f} img/s "
        f"[fused decoder: upsample+concat folded into lhs-dilated convs]")
    # speed tier: plain UNet — qualified at quality parity on the frozen
    # held-out protocol (docs/QUALITY.md: raw IoU 0.843/F1 0.914 vs the
    # UNet++ 0.833/0.909; weights ship for both)
    un_rate, un_batch = sweep("Unet", 54.5, (128,))
    log(f"Unet speed tier: batch {un_batch} at {un_rate:.1f} img/s")
    # int8 PTQ tier (ops/quant.py): s8xs8->s32 on the MXU with the shipped
    # calibration sidecar; quality-qualified on the frozen held-out
    # protocol (docs/QUALITY.md int8 rows)
    q_rate, q_batch = sweep("Unet", 54.5, (128,), quant=True)
    if q_rate:
        log(f"Unet int8 tier: batch {q_batch} at {q_rate:.1f} img/s")
    # UnetTPU lane-aligned tier (LaneAlignedDecoder + pixel-shuffle head,
    # 44.3 GF/img): counted toward the headline only once its weights ship
    # quality-qualified (experiments/run_unettpu_gate.py two-tier rule)
    tpu_rate = tq_rate = 0.0
    if shipped_weights_exist("UnetTPU"):
        tpu_rate, tpu_batch = sweep("UnetTPU", 44.3, (128,))
        log(f"UnetTPU lane-aligned tier: batch {tpu_batch} at "
            f"{tpu_rate:.1f} img/s")
        tq_rate, tq_batch = sweep("UnetTPU", 44.3, (128,), quant=True)
        if tq_rate:
            log(f"UnetTPU int8 tier: batch {tq_batch} at {tq_rate:.1f} img/s")
    else:
        log("UnetTPU tier skipped: no shipped weights")
    img_per_s, tier = max(
        (pp_rate, "UNet++/resnet34 quality tier, bf16"),
        (un_rate, "Unet/resnet34 speed tier, bf16"),
        (q_rate, "Unet/resnet34 int8-PTQ tier, calibrated sidecar"),
        (tpu_rate, "UnetTPU/resnet34 lane-aligned tier, bf16"),
        (tq_rate, "UnetTPU/resnet34 lane-aligned int8-PTQ tier"))

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    model = create_model_from_config(cfg)
    variables = init_model(model, 512, seed=0)
    x = jnp.asarray(rng.random((32, 512, 512, 3)), jnp.float32)

    # secondary: fused detect→optimize→inpaint e2e (BASELINE "mask+repair
    # e2e latency per image"; CPU-LaMa reference is ~2-10 s/img)
    try:
        from unet_watermark_tpu.inference.predict import WatermarkPredictor

        predictor = WatermarkPredictor(model_path=None, config=cfg)
        predictor.variables = variables  # reuse initialized weights
        fused = predictor.make_fused_repair_fn(smooth_iterations=16)
        engine_used = getattr(fused, "engine_used", "pushpull")

        @jax.jit
        def fused_chained(images):
            # chain dispatches (tunnel dedups identical repeats — see
            # forward_chained above)
            out = fused(images)
            # mean is already in [0,1] so the fmod is well-conditioned;
            # zero-mean so chained inputs don't drift (ADVICE.md round 3)
            scale = (1.0 + (jnp.mean(out).astype(jnp.float32) % 0.003)
                     - 0.0015)
            return images * scale, out

        xb = x[:16] / 1.0
        jax.block_until_ready(fused_chained(xb))
        t0 = time.time()
        for _ in range(5):
            xb, out2 = fused_chained(xb)
        jax.block_until_ready((xb, out2))
        per_img_ms = (time.time() - t0) / 5 / 16 * 1e3
        # 5612 ms/img = the SAME shipped FFC generator on the host CPU
        # backend, measured (workspace/exp_cpu_lama.py, batch 1 @512²)
        log(f"fused mask+inpaint e2e [{engine_used}]: {per_img_ms:.1f} "
            f"ms/img ({1e3 / per_img_ms:.0f} img/s) — "
            f"{5612.0 / per_img_ms:.0f}x measured CPU-LaMa (5612 ms/img)")
    except Exception as e:  # noqa: BLE001
        log(f"fused e2e bench skipped: {e}")

    print(json.dumps({
        "metric": "512x512 seg inference throughput (best quality-"
                  f"qualified config: {tier}; all tiers benched alongside)",
        "value": round(img_per_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
