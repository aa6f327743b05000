"""Small JAX runtime helpers shared by every entry point."""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_compile_cache(cache_dir: str = None) -> None:
    """Persistent XLA compile cache. Graph compiles through this image's
    remote-compile tunnel take minutes; caching them makes every CLI and
    script usable interactively. Safe to call multiple times."""
    try:
        import jax
        cache_dir = cache_dir or os.environ.get(
            "UNET_WATERMARK_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "unet_watermark_tpu", "jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        logger.debug("compile cache unavailable: %s", e)
