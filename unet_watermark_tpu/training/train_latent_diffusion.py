"""Trainer for the native latent-diffusion inpainting backend.

Two stages in one run: (1) the TinyAutoencoder learns a /8 latent by L1
reconstruction; (2) with the AE frozen, the conditioned LatentDenoiser
learns eps-prediction on cosine-schedule noised latents, conditioned on
the masked-image latent + hole mask (SD-inpaint recipe; masks follow the
LaMa random-mask protocol). Produces the checkpoint LatentInpainter loads.

    python -m unet_watermark_tpu.training.train_latent_diffusion \
        --clean-dir workspace/train/clean --output models/latent_diffusion \
        --img-size 256 --ae-steps 2000 --dn-steps 6000
"""
from __future__ import annotations

import argparse
import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.latent_diffusion import (
    LATENT_CHANNELS,
    DOWN_FACTOR,
    T_TRAIN,
    LatentDenoiser,
    TinyAutoencoder,
    alpha_bars,
    init_ld_variables,
)
from .train_inpaint import (device_clean_sampler, load_clean_batches,
                            random_mask_batch)

logger = logging.getLogger(__name__)


def train_latent_diffusion(clean_dir: str, output_dir: str,
                           img_size: int = 256, batch_size: int = 16,
                           ae_steps: int = 2000, dn_steps: int = 6000,
                           lr: float = 2e-4, seed: int = 0,
                           log_every: int = 100) -> Dict:
    ae = TinyAutoencoder()
    denoiser = LatentDenoiser()
    variables = init_ld_variables(ae, denoiser, img_size=img_size, seed=seed)
    ab = jnp.asarray(alpha_bars())

    # ---- stage 1: autoencoder ------------------------------------------
    ae_tx = optax.adam(lr)
    ae_opt = ae_tx.init(variables["ae"])

    @jax.jit
    def ae_step(params, opt_state, images):
        def loss_of(p):
            recon = ae.apply({"params": p}, images)
            return jnp.mean(jnp.abs(recon - images))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, new_opt = ae_tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_opt, loss

    # device-resident corpus when it fits: crops are generated on device,
    # so each step's H2D is one PRNG key instead of a ~12 MB fp32 batch
    # (transfer-bound through a device tunnel; see device_clean_sampler)
    sampler = device_clean_sampler(clean_dir, batch_size, img_size, seed)
    if sampler is not None:
        sample_fn, _ = sampler
        skey = jax.random.PRNGKey(seed + 11)

        def next_images(i):
            return sample_fn(jax.random.fold_in(skey, i))
    else:
        batches = load_clean_batches(clean_dir, batch_size, img_size, seed)

        def next_images(i):
            return jnp.asarray(next(batches))

    t0 = time.time()
    ae_params = variables["ae"]
    for i in range(ae_steps):
        images = next_images(i)
        ae_params, ae_opt, loss = ae_step(ae_params, ae_opt, images)
        if (i + 1) % log_every == 0:
            logger.info("[ae] step %d: l1=%.4f (%.1f img/s)", i + 1,
                        float(loss),
                        (i + 1) * batch_size / (time.time() - t0))

    # ---- stage 2: denoiser (AE frozen) ----------------------------------
    dn_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    dn_opt = dn_tx.init(variables["denoiser"])
    ae_v = {"params": ae_params}

    @jax.jit
    def dn_step(params, opt_state, images, key):
        k_mask, k_t, k_eps = jax.random.split(key, 3)
        masks = random_mask_batch(k_mask, images.shape[0], img_size)
        z0 = ae.apply(ae_v, images, method=TinyAutoencoder.encode)
        n, h, w, _ = z0.shape
        mask_lat = jax.image.resize(masks, (n, h, w, 1), "nearest")
        z_masked = z0 * (1.0 - mask_lat)
        t = jax.random.randint(k_t, (n,), 0, T_TRAIN)
        a = ab[t + 1][:, None, None, None]
        eps = jax.random.normal(k_eps, z0.shape)
        z_t = jnp.sqrt(a) * z0 + jnp.sqrt(1.0 - a) * eps

        def loss_of(p):
            pred = denoiser.apply({"params": p}, z_t, z_masked, mask_lat, t)
            return jnp.mean((pred - eps) ** 2)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, new_opt = dn_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    dn_params = variables["denoiser"]
    key = jax.random.PRNGKey(seed + 5)
    t0 = time.time()
    for i in range(dn_steps):
        key, sub = jax.random.split(key)
        images = next_images(ae_steps + i)
        dn_params, dn_opt, loss = dn_step(dn_params, dn_opt, images, sub)
        if (i + 1) % log_every == 0:
            logger.info("[denoiser] step %d: mse=%.4f (%.1f img/s)", i + 1,
                        float(loss),
                        (i + 1) * batch_size / (time.time() - t0))

    import orbax.checkpoint as ocp

    path = os.path.abspath(output_dir)
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"ae": ae_params, "denoiser": dn_params})
    ckptr.wait_until_finished()
    logger.info("latent-diffusion weights saved: %s", path)
    return {"checkpoint": path,
            "params": {"ae": ae_params, "denoiser": dn_params}}


def ship_weights(params, dest: str = None) -> str:
    """Write the trained tree as the shipped bf16 .npz distribution file
    (default: unet_watermark_tpu/weights/latent_diffusion.npz — the path
    utils/shipping.resolve('diffusion') finds first)."""
    from ..utils.shipping import save_params_npz, weights_dir

    dest = dest or os.path.join(weights_dir(), "latent_diffusion.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    save_params_npz(dest, params)
    logger.info("shipped diffusion weights: %s", dest)
    return dest


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache

    logging.basicConfig(level=logging.INFO, force=True)
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--clean-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--ae-steps", type=int, default=2000)
    p.add_argument("--dn-steps", type=int, default=6000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--ship", action="store_true",
                   help="also write the bf16 .npz distribution file "
                        "under unet_watermark_tpu/weights/")
    args = p.parse_args(argv)
    r = train_latent_diffusion(args.clean_dir, args.output, args.img_size,
                               args.batch_size, args.ae_steps, args.dn_steps,
                               args.lr)
    if args.ship:
        r["shipped"] = ship_weights(r.pop("params"))
    else:
        r.pop("params", None)
    print({k: v for k, v in r.items() if k != "params"})


if __name__ == "__main__":
    main()
