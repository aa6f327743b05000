"""Inpainting-model training (LaMa-style FFC generator).

No direct reference counterpart — the reference downloads pretrained LaMa
weights through iopaint at runtime (/root/reference/src/predict.py:771),
which a zero-egress TPU pod cannot. This trainer produces those weights
in-framework: self-supervised inpainting on any clean-image folder with
LaMa's random mask protocol (irregular strokes + rectangles), L1 +
high-receptive-field perceptual-proxy (gradient) losses, bf16 on the MXU.

Usage:
    python -m unet_watermark_tpu.training.train_inpaint \
        --clean-dir data/clean --output models/lama_ckpt --steps 2000
"""
from __future__ import annotations

import argparse
import functools
import logging
import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import metrics as metrics_lib

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# LaMa-style random masks (strokes + boxes), generated on device
# ---------------------------------------------------------------------------

def random_mask_batch(key: jax.Array, n: int, size: int,
                      max_boxes: int = 3, max_strokes: int = 4) -> jax.Array:
    """(N, size, size, 1) random hole masks: rectangles + thick line
    strokes, 5-35% coverage typical (the big-lama mask recipe shape)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)

    def one(key):
        mask = jnp.zeros((size, size), jnp.float32)
        keys = jax.random.split(key, max_boxes + max_strokes + 1)
        # rectangles
        for i in range(max_boxes):
            k = jax.random.split(keys[i], 5)
            use = jax.random.uniform(k[0]) < 0.7
            bw = jax.random.randint(k[1], (), size // 8, size // 3)
            bh = jax.random.randint(k[2], (), size // 8, size // 3)
            x0 = jax.random.randint(k[3], (), 0, size - size // 3)
            y0 = jax.random.randint(k[4], (), 0, size - size // 3)
            box = ((ys >= y0) & (ys < y0 + bh) &
                   (xs >= x0) & (xs < x0 + bw)).astype(jnp.float32)
            mask = jnp.maximum(mask, box * use)
        # strokes: thick line segments via distance-to-segment
        for i in range(max_strokes):
            k = jax.random.split(keys[max_boxes + i], 6)
            use = jax.random.uniform(k[0]) < 0.6
            x0 = jax.random.uniform(k[1], minval=0.0, maxval=float(size))
            y0 = jax.random.uniform(k[2], minval=0.0, maxval=float(size))
            ang = jax.random.uniform(k[3], minval=0.0, maxval=2 * np.pi)
            ln = jax.random.uniform(k[4], minval=size / 8, maxval=size / 2)
            wd = jax.random.uniform(k[5], minval=size / 64, maxval=size / 16)
            x1 = x0 + jnp.cos(ang) * ln
            y1 = y0 + jnp.sin(ang) * ln
            px = xs.astype(jnp.float32)
            py = ys.astype(jnp.float32)
            dx, dy = x1 - x0, y1 - y0
            t = jnp.clip(((px - x0) * dx + (py - y0) * dy) /
                         jnp.maximum(dx * dx + dy * dy, 1e-6), 0, 1)
            dist = jnp.sqrt((px - (x0 + t * dx)) ** 2 +
                            (py - (y0 + t * dy)) ** 2)
            mask = jnp.maximum(mask, (dist < wd).astype(jnp.float32) * use)
        return mask[..., None]

    return jax.vmap(one)(jax.random.split(key, n))


def _gradient(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return x[:, 1:, :, :] - x[:, :-1, :, :], x[:, :, 1:, :] - x[:, :, :-1, :]


def inpaint_loss(pred: jax.Array, target: jax.Array,
                 mask: jax.Array) -> jax.Array:
    """L1 (hole-weighted) + gradient-consistency loss."""
    hole_w = 1.0 + 9.0 * mask  # focus on the hole
    l1 = jnp.mean(jnp.abs(pred - target) * hole_w)
    gy_p, gx_p = _gradient(pred)
    gy_t, gx_t = _gradient(target)
    grad = jnp.mean(jnp.abs(gy_p - gy_t)) + jnp.mean(jnp.abs(gx_p - gx_t))
    return l1 + 0.5 * grad


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

def device_clean_sampler(clean_dir: str, batch: int, size: int,
                         seed: int = 0, max_mb: int = 2048):
    """Device-resident clean corpus: upload every image to HBM once
    (uint8), return a jitted `sample(key) -> (batch, size, size, 3) f32`
    of random crops taken ON DEVICE — zero per-step H2D.

    Rationale: the host iterator ships ~12 MB fp32 batches per step;
    through this environment's ~7 MB/s device tunnel that made the GAN /
    diffusion trainers transfer-bound (~2 s/step against a ~50 ms step).
    Mirrors data/pipeline.DeviceDataPipeline for the seg trainer.

    Returns (sample_fn, n_images), or None when the corpus has mixed
    shapes or exceeds `max_mb` (callers fall back to load_clean_batches).
    """
    import cv2

    files = sorted(
        os.path.join(clean_dir, f) for f in os.listdir(clean_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
    if not files:
        raise FileNotFoundError(f"no images in {clean_dir}")
    imgs, shape, total = [], None, 0
    for p in files:
        img = cv2.imread(p)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if min(img.shape[:2]) < size:
            return None
        if shape is None:
            shape = img.shape
        if img.shape != shape:
            return None
        total += img.nbytes
        if total > max_mb * (1 << 20):
            return None
        imgs.append(img)
    if not imgs:
        return None
    data = jax.device_put(np.stack(imgs))
    h, w = shape[:2]
    n = len(imgs)

    # the corpus must be a jit ARGUMENT, not a closure capture: captured
    # arrays are treated as program constants and embedded in the compile
    # payload (a 0.9 GB corpus overflows any remote-compile transport)
    @jax.jit
    def _sample(corpus, key):
        ki, ky, kx = jax.random.split(key, 3)
        idx = jax.random.randint(ki, (batch,), 0, n)
        ys = jax.random.randint(ky, (batch,), 0, h - size + 1)
        xs = jax.random.randint(kx, (batch,), 0, w - size + 1)

        def crop(i, y, x):
            sl = jax.lax.dynamic_slice(
                corpus, (i, y, x, 0), (1, size, size, 3))
            return sl[0]

        out = jax.vmap(crop)(idx, ys, xs)
        return out.astype(jnp.float32) / 255.0

    def sample(key):
        return _sample(data, key)

    logger.info("device-resident clean corpus: %d images (%.2f GB uint8)",
                n, total / 2 ** 30)
    return sample, n


def load_clean_batches(clean_dir: str, batch: int, size: int,
                       seed: int = 0,
                       cache_mb: int = 4096) -> Iterator[np.ndarray]:
    """Endless host iterator of (batch, size, size, 3) float [0,1] crops.

    Decoded images are kept in RAM (uint8, up to `cache_mb`) so each file
    pays JPEG decode once — on the 1-core TPU host, per-batch decode made
    the round-2 GAN training host-bound (~2 s/step at batch 16)."""
    import cv2

    files = sorted(
        os.path.join(clean_dir, f) for f in os.listdir(clean_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
    if not files:
        raise FileNotFoundError(f"no images in {clean_dir}")
    rng = np.random.default_rng(seed)
    cache: dict = {}
    cache_bytes = 0
    budget = cache_mb * (1 << 20)

    def decoded(p: str):
        nonlocal cache_bytes
        img = cache.get(p)
        if img is not None:
            return img
        img = cv2.imread(p)
        if img is None:
            return None
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        if min(h, w) < size:
            img = cv2.resize(img, (max(size, w), max(size, h)))
        if cache_bytes + img.nbytes <= budget:
            cache[p] = img
            cache_bytes += img.nbytes
        return img

    while True:
        out = []
        for _ in range(batch):
            img = decoded(files[rng.integers(len(files))])
            if img is None:
                continue
            h, w = img.shape[:2]
            y0 = rng.integers(0, h - size + 1)
            x0 = rng.integers(0, w - size + 1)
            out.append(img[y0:y0 + size, x0:x0 + size].astype(
                np.float32) / 255.0)
        while len(out) < batch:
            out.append(out[-1])
        yield np.stack(out)


def train_inpaint(clean_dir: str, output_dir: str,
                  variant: str = "lama", img_size: int = 256,
                  batch_size: int = 8, steps: int = 2000,
                  lr: float = 2e-4, seed: int = 0,
                  log_every: int = 50,
                  gan: bool = True, warmup_steps: int = 500,
                  adv_weight: float = 0.05, fm_weight: float = 10.0,
                  d_lr: float = 1e-4,
                  resume_from: Optional[str] = None,
                  snapshot_every: int = 0) -> Dict:
    """Adversarially-trained FFC inpainting (the real LaMa recipe minus
    the pretrained-HRF perceptual net, which a zero-egress pod cannot
    download): hole-weighted L1 + gradient consistency, plus — after an
    L1-only warmup — PatchGAN hinge adversarial loss and discriminator
    feature matching. Saves a generator checkpoint loadable by
    inference/engines.py."""
    from ..models.lama import LamaDiscriminator, create_lama, init_lama

    model = create_lama(variant)
    variables = init_lama(model, img_size=img_size, seed=seed)
    if resume_from:
        if resume_from.endswith(".npz"):
            from ..utils.shipping import load_params_npz

            variables = load_params_npz(resume_from, dict(variables))
        else:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            variables = ckptr.restore(os.path.abspath(resume_from),
                                      dict(variables))
        logger.info("resumed generator from %s", resume_from)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = tx.init(variables["params"])

    disc = LamaDiscriminator()
    d_vars = disc.init(jax.random.PRNGKey(seed + 1),
                       jnp.zeros((1, img_size, img_size, 3)))
    d_params = d_vars["params"]
    d_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(d_lr))
    d_opt = d_tx.init(d_params)

    @functools.partial(jax.jit, static_argnames=("use_gan",))
    def step(params, batch_stats, opt_state, d_params, d_opt, images, key,
             use_gan: bool):
        masks = random_mask_batch(key, images.shape[0], img_size)

        def g_loss_of(p, dp):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, masks,
                train=True, mutable=["batch_stats"])
            loss = inpaint_loss(out, images, masks)
            if use_gan:
                fake_logits, fake_feats = disc.apply({"params": dp}, out)
                _, real_feats = disc.apply({"params": dp}, images)
                # non-saturating hinge generator term + feature matching
                adv = -jnp.mean(fake_logits)
                fm = sum(jnp.mean(jnp.abs(f.astype(jnp.float32) -
                                          r.astype(jnp.float32)))
                         for f, r in zip(fake_feats, real_feats))
                loss = loss + adv_weight * adv + fm_weight * fm
            return loss, (out, mutated["batch_stats"])

        (g_loss, (fake, new_bs)), g_grads = jax.value_and_grad(
            g_loss_of, has_aux=True)(params, d_params)
        g_updates, new_opt = tx.update(g_grads, opt_state, params)
        new_params = optax.apply_updates(params, g_updates)

        if use_gan:
            def d_loss_of(dp):
                real_logits, _ = disc.apply({"params": dp}, images)
                fake_logits, _ = disc.apply(
                    {"params": dp}, jax.lax.stop_gradient(fake))
                return jnp.mean(jax.nn.relu(1.0 - real_logits)) + \
                    jnp.mean(jax.nn.relu(1.0 + fake_logits))

            d_loss, d_grads = jax.value_and_grad(d_loss_of)(d_params)
            d_updates, new_d_opt = d_tx.update(d_grads, d_opt, d_params)
            new_d_params = optax.apply_updates(d_params, d_updates)
        else:
            d_loss = jnp.float32(0.0)
            new_d_params, new_d_opt = d_params, d_opt
        return (new_params, new_bs, new_opt, new_d_params, new_d_opt,
                g_loss, d_loss)

    # fixed validation batch + masks for hole-PSNR tracking
    val_iter = load_clean_batches(clean_dir, batch_size, img_size,
                                  seed + 99)
    val_images = jnp.asarray(next(val_iter))
    val_masks = random_mask_batch(jax.random.PRNGKey(seed + 7),
                                  batch_size, img_size)

    @jax.jit
    def val_psnr(params, batch_stats):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          val_images, val_masks, train=False)
        return metrics_lib.psnr(out, val_images, mask=val_masks)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    key = jax.random.PRNGKey(seed)
    # device-resident corpus when it fits: random crops on device, H2D
    # per step = one PRNG key (the seg trainer's DEVICE_CACHE treatment;
    # the host iterator is the fallback for oversized/mixed corpora)
    sampler = device_clean_sampler(clean_dir, batch_size, img_size, seed)
    if sampler is None:
        batches = load_clean_batches(clean_dir, batch_size, img_size, seed)
        sample = None
    else:
        sample, _ = sampler
    history = []
    t0 = time.time()
    for i in range(steps):
        key, sub = jax.random.split(key)
        if sample is not None:
            key, kcrop = jax.random.split(key)
            images = sample(kcrop)
        else:
            images = jnp.asarray(next(batches))
        use_gan = bool(gan) and i >= warmup_steps
        (params, batch_stats, opt_state, d_params, d_opt,
         g_loss, d_loss) = step(params, batch_stats, opt_state,
                                d_params, d_opt, images, sub, use_gan)
        if (i + 1) % log_every == 0:
            gl, dl = float(g_loss), float(d_loss)
            pv = float(val_psnr(params, batch_stats))
            history.append({"step": i + 1, "g_loss": gl, "d_loss": dl,
                            "hole_psnr": pv})
            rate = (i + 1) * batch_size / (time.time() - t0)
            logger.info(
                "step %d: g_loss=%.4f d_loss=%.4f hole_psnr=%.2f dB "
                "(%.1f img/s)%s", i + 1, gl, dl, pv, rate,
                " [gan]" if use_gan else " [warmup]")
        if snapshot_every and (i + 1) % snapshot_every == 0:
            from ..utils.shipping import save_params_npz

            os.makedirs(os.path.dirname(os.path.abspath(output_dir)) or ".",
                        exist_ok=True)
            save_params_npz(os.path.abspath(output_dir) + ".snap.npz",
                            {"params": params, "batch_stats": batch_stats})
            logger.info("snapshot at step %d", i + 1)

    # save as an orbax checkpoint loadable by inference/engines.py
    import orbax.checkpoint as ocp

    path = os.path.abspath(output_dir)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, {"params": params, "batch_stats": batch_stats})
    ckptr.wait_until_finished()
    logger.info("inpaint weights saved: %s", path)
    # compact distribution copy (bf16 .npz, ~half the orbax size) — the
    # format shipped in-repo under unet_watermark_tpu/weights/
    from ..utils.shipping import save_params_npz

    npz_path = save_params_npz(path + ".npz",
                               {"params": params,
                                "batch_stats": batch_stats})
    logger.info("shipping copy saved: %s", npz_path)
    final = history[-1] if history else {}
    return {"final_loss": final.get("g_loss"),
            "final_hole_psnr": final.get("hole_psnr"),
            "history": history, "checkpoint": path}


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache

    # force=True: the axon plugin import already installs a root handler
    # at WARNING, which makes a plain basicConfig a silent no-op
    logging.basicConfig(level=logging.INFO, force=True)
    enable_compile_cache()
    p = argparse.ArgumentParser(description="train FFC inpainting model")
    p.add_argument("--clean-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--variant", default="lama",
                   choices=["lama", "big-lama", "mat"])
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--no-gan", action="store_true",
                   help="L1+gradient only (round-1 recipe)")
    p.add_argument("--warmup-steps", type=int, default=500)
    p.add_argument("--adv-weight", type=float, default=0.05)
    p.add_argument("--fm-weight", type=float, default=10.0)
    p.add_argument("--d-lr", type=float, default=1e-4)
    p.add_argument("--resume-from", type=str, default=None)
    p.add_argument("--snapshot-every", type=int, default=0)
    args = p.parse_args(argv)
    r = train_inpaint(args.clean_dir, args.output, args.variant,
                      args.img_size, args.batch_size, args.steps, args.lr,
                      gan=not args.no_gan, warmup_steps=args.warmup_steps,
                      adv_weight=args.adv_weight, fm_weight=args.fm_weight,
                      d_lr=args.d_lr, resume_from=args.resume_from,
                      snapshot_every=args.snapshot_every)
    print({"final_loss": r["final_loss"],
           "final_hole_psnr": r["final_hole_psnr"],
           "checkpoint": r["checkpoint"]})


if __name__ == "__main__":
    main()
