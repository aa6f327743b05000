"""In-framework latent-diffusion inpainting (TPU-native).

The reference's diffusion repair backends are hosted models it downloads at
runtime (SD3: /root/reference/src/sd3/inpaint.py:200-360, FLUX:
src/flux/flux_process.py:82-246) — impossible on a zero-egress TPU pod.
This module provides the same capability natively: a compact latent
diffusion model (conv VAE to a /8 latent + conditioned denoiser UNet +
DDIM sampler, the SD-inpaint architecture recipe at small scale) trained
in-framework on clean images, so SDWatermarkRemover / FluxProcessor have a
REAL generative engine to dispatch to when diffusers is absent.

Everything jits: the sampler runs its DDIM loop as one lax.scan on device,
bf16 convs on the MXU with fp32 schedule math.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger(__name__)

Dtype = Any

LATENT_CHANNELS = 4
DOWN_FACTOR = 8
T_TRAIN = 1000


# ---------------------------------------------------------------------------
# schedule (cosine, Nichol & Dhariwal 2021)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=2)
def alpha_bars(T: int = T_TRAIN) -> np.ndarray:
    t = np.linspace(0, 1, T + 1)
    f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    ab = np.clip(f / f[0], 1e-5, 1.0)
    return ab.astype(np.float32)  # length T+1, ab[0] = 1


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

class TinyAutoencoder(nn.Module):
    """3-stage conv autoencoder to a /8 latent (no KL — plain AE; at this
    scale a deterministic latent trains stabler and DDIM never samples the
    prior end-to-end from pure noise in the inpainting use)."""

    base: int = 64
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.enc = Encoder(self.base, dtype=self.dtype)
        self.dec = Decoder(self.base, dtype=self.dtype)

    def encode(self, x):
        return self.enc(x)

    def decode(self, z):
        return self.dec(z)

    def __call__(self, x):
        return self.decode(self.encode(x))


class Encoder(nn.Module):
    base: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = x.astype(self.dtype) * 2.0 - 1.0
        ch = self.base
        for i in range(3):
            y = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"down{i}")(y)
            y = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"norm{i}")(y)
            y = nn.silu(y)
            ch = min(ch * 2, 256)
        z = nn.Conv(LATENT_CHANNELS, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="to_latent")(y)
        return jnp.tanh(z.astype(jnp.float32))  # bounded latent in [-1,1]


class Decoder(nn.Module):
    base: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        chs = [min(self.base * 2 ** i, 256) for i in range(3)][::-1]
        y = nn.Conv(chs[0], (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="from_latent")(
                        z.astype(self.dtype))
        for i, ch in enumerate(chs):
            y = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"up{i}")(y)
            y = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"norm{i}")(y)
            y = nn.silu(y)
        x = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="to_rgb")(y)
        return nn.sigmoid(x.astype(jnp.float32))


def timestep_embedding(t: jax.Array, dim: int = 128) -> jax.Array:
    """Sinusoidal embedding of integer timesteps (N,) → (N, dim)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class ResBlock(nn.Module):
    ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, emb):
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="n1")(x)
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="c1")(nn.silu(h))
        # FiLM conditioning on the timestep
        scale_shift = nn.Dense(self.ch * 2, dtype=self.dtype,
                               name="emb")(nn.silu(emb))
        scale, shift = jnp.split(scale_shift[:, None, None, :], 2, axis=-1)
        h = h * (1.0 + scale) + shift
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="n2")(h)
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="c2")(nn.silu(h))
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class LatentDenoiser(nn.Module):
    """Small UNet over latents, conditioned on the masked-image latent and
    the downsampled hole mask (SD-inpaint's 9-channel input recipe)."""

    base: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z_t, z_masked, mask_lat, t):
        emb = nn.Dense(256, name="emb1")(timestep_embedding(t))
        emb = nn.Dense(256, name="emb2")(nn.silu(emb))

        x = jnp.concatenate(
            [z_t, z_masked, mask_lat], axis=-1).astype(self.dtype)
        x = nn.Conv(self.base, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="stem")(x)
        skips = []
        ch = self.base
        for i in range(2):  # two downsamples: latent /8 → /32 of pixels
            x = ResBlock(ch, dtype=self.dtype, name=f"down{i}a")(x, emb)
            skips.append(x)
            ch *= 2
            x = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"down{i}")(x)
        x = ResBlock(ch, dtype=self.dtype, name="mid1")(x, emb)
        x = ResBlock(ch, dtype=self.dtype, name="mid2")(x, emb)
        for i in range(2):
            ch //= 2
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"up{i}")(x)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResBlock(ch, dtype=self.dtype, name=f"up{i}a")(x, emb)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="out_norm")(x)
        eps = nn.Conv(LATENT_CHANNELS, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype, name="out")(nn.silu(x))
        return eps.astype(jnp.float32)


# ---------------------------------------------------------------------------
# inpainter (load + jitted DDIM sampling)
# ---------------------------------------------------------------------------

def default_weights_path() -> Optional[str]:
    """Shipped weights via the unified registry (utils/shipping.resolve):
    unet_watermark_tpu/weights/latent_diffusion.npz first — the same
    convention as the LaMa weights — then the legacy
    <repo>/models/latent_diffusion orbax dir."""
    from ..utils.shipping import resolve

    return resolve("diffusion")


class LatentInpainter:
    """Loads trained AE+denoiser weights; `inpaint` runs the full DDIM
    hole-fill as one jitted graph per (batch, size, steps)."""

    def __init__(self, weights_path: Optional[str] = None):
        from ..utils.shipping import load_variables, resolve

        path = resolve("diffusion", explicit=weights_path)
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "no latent-diffusion weights; train with "
                "training/train_latent_diffusion.py")
        self.ae = TinyAutoencoder()
        self.denoiser = LatentDenoiser()
        template = init_ld_variables(self.ae, self.denoiser, img_size=64)
        self.variables = load_variables(path, template)
        self._jitted: Dict = {}

    def _sampler(self, steps: int):
        if steps in self._jitted:
            return self._jitted[steps]
        ae_v = {"params": self.variables["ae"]}
        dn_v = {"params": self.variables["denoiser"]}
        ab = jnp.asarray(alpha_bars())

        def run(images, masks, key):
            z0 = self.ae.apply(ae_v, images, method=TinyAutoencoder.encode)
            n, h, w, _ = z0.shape
            mask_lat = jax.image.resize(masks, (n, h, w, 1), "nearest")
            z_masked = z0 * (1.0 - mask_lat)
            ts = jnp.linspace(T_TRAIN - 1, 1, steps).astype(jnp.int32)
            z_t = jax.random.normal(key, z0.shape)

            def body(z_t, i):
                t = ts[i]
                t_next = jnp.where(i + 1 < steps, ts[jnp.minimum(
                    i + 1, steps - 1)], 0)
                a_t, a_n = ab[t + 1], ab[t_next + 1]
                # known region follows the forward process of z0 exactly
                z_known = jnp.sqrt(a_t) * z0 + jnp.sqrt(1 - a_t) * \
                    jax.random.normal(jax.random.fold_in(key, i), z0.shape)
                z_in = z_known * (1 - mask_lat) + z_t * mask_lat
                eps = self.denoiser.apply(
                    dn_v, z_in, z_masked, mask_lat,
                    jnp.full((n,), t, jnp.int32))
                z0_hat = (z_in - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
                z0_hat = jnp.clip(z0_hat, -1.5, 1.5)
                z_next = jnp.sqrt(a_n) * z0_hat + jnp.sqrt(1 - a_n) * eps
                return z_next, None

            z_t, _ = jax.lax.scan(body, z_t, jnp.arange(steps))
            z_fill = z0 * (1 - mask_lat) + z_t * mask_lat
            out = self.ae.apply(ae_v, z_fill,
                                method=TinyAutoencoder.decode)
            m3 = jnp.broadcast_to(masks, images.shape)
            return out * m3 + images * (1 - m3)

        fn = jax.jit(run)
        self._jitted[steps] = fn
        return fn

    def inpaint(self, images, masks, steps: int = 20,
                seed: int = 0) -> np.ndarray:
        """images (N,H,W,3) float [0,1]; masks (N,H,W,1) {0,1}, 1=hole.
        H, W must be multiples of 32 (latent /8 then two denoiser halvings).
        """
        images = jnp.asarray(images, jnp.float32)
        masks = jnp.asarray(masks, jnp.float32)
        out = self._sampler(int(steps))(images, masks,
                                        jax.random.PRNGKey(seed))
        return np.asarray(out)


def init_ld_variables(ae: TinyAutoencoder, denoiser: LatentDenoiser,
                      img_size: int = 64, seed: int = 0) -> Dict:
    """Parameter template: {"ae": ..., "denoiser": ...}."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    ae_vars = ae.init(k1, x)
    s = img_size // DOWN_FACTOR
    z = jnp.zeros((1, s, s, LATENT_CHANNELS), jnp.float32)
    m = jnp.zeros((1, s, s, 1), jnp.float32)
    dn_vars = denoiser.init(k2, z, z, m, jnp.zeros((1,), jnp.int32))
    return {"ae": ae_vars["params"], "denoiser": dn_vars["params"]}


def available() -> bool:
    """True if trained native diffusion weights are shipped/resolvable."""
    path = default_weights_path()  # registry already honors DIFFUSION_WEIGHTS
    return bool(path and os.path.exists(path))


_singleton: Optional[LatentInpainter] = None
_singleton_failed = False


def get_inpainter() -> Optional[LatentInpainter]:
    """Cached LatentInpainter, or None when no weights are trained yet.
    SDWatermarkRemover / FluxProcessor call this as the second rung of
    their fallback chain (diffusers pipe → native diffusion → fast fill)."""
    global _singleton, _singleton_failed
    if _singleton is not None or _singleton_failed:
        return _singleton
    if not available():
        _singleton_failed = True
        return None
    try:
        _singleton = LatentInpainter()
    except Exception as e:  # noqa: BLE001
        logger.warning("native latent diffusion unavailable: %s", e)
        _singleton_failed = True
    return _singleton


def diffusion_inpaint_bgr(image_bgr: np.ndarray, mask: np.ndarray,
                          steps: int = 20) -> Optional[np.ndarray]:
    """Convenience: BGR uint8 image + uint8 mask → inpainted BGR, through
    the native latent diffusion engine; None if it is not available."""
    import cv2

    from ..inference.tiled import pad_to_multiple

    inp = get_inpainter()
    if inp is None:
        return None
    rgb = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB).astype(
        np.float32) / 255.0
    padded, (h, w) = pad_to_multiple(rgb, 32)
    pmask, _ = pad_to_multiple((mask > 127).astype(np.float32), 32)
    out = inp.inpaint(padded[None], pmask[None, ..., None], steps=steps)
    out = (np.clip(out[0][:h, :w], 0, 1) * 255).astype(np.uint8)
    return cv2.cvtColor(out, cv2.COLOR_RGB2BGR)
