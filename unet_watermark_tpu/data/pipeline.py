"""Double-buffered host→device input pipeline.

Replaces the reference's torch DataLoader stack — worker processes,
pin_memory, prefetch_factor (/root/reference/src/train.py:240-260) and the
thread-prefetch/async-transform machinery of optimized_dataloader.py
(:127-310) — with the TPU-shaped equivalent:

  * a thread pool decodes/loads samples and assembles fixed-size uint8
    numpy batches (static shapes → one compiled program)
  * batches are device_put with the mesh's batch sharding while the
    previous step computes (double buffering), so HBM never waits on PCIe
  * remainder batches are padded and carry a validity mask; losses and
    metrics weight by it (parallel/mesh.py:pad_batch_to)

Augmentation and normalization happen on device (ops/augment.py), so the
host does IO only.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from ..parallel.mesh import pad_batch_to, shard_batch


class Batch(dict):
    """Dict pytree: image (N,H,W,3) f32 [0,1], mask (N,H,W,1) f32,
    valid (N,) f32."""


def _assemble(samples) -> dict:
    """Batches stay uint8 on the host: the H2D copy is 4x smaller than
    fp32 (this matters double when the TPU is reached through a network
    tunnel); normalization happens on device in the train/eval steps."""
    imgs = np.stack([s[0] for s in samples]).astype(np.uint8)
    masks = np.stack([s[1] for s in samples])
    masks = (masks > (127 if masks.dtype == np.uint8 else 0.5)).astype(
        np.uint8)[..., None]
    return {"image": imgs, "mask": masks}


class DataPipeline:
    """Epoch iterator yielding device-resident, mesh-sharded batches."""

    def __init__(self, dataset, batch_size: int, mesh=None,
                 shuffle: bool = True, seed: int = 42,
                 num_workers: int = 8, prefetch: int = 2,
                 drop_remainder: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_remainder = drop_remainder
        self._epoch = 0
        # padded batch size: static shape divisible by the mesh's leading
        # (data) axis so every device gets an equal shard; the validity
        # mask covers the extra rows
        self._padded_bs = batch_size
        if mesh is not None:
            ndev = int(np.prod(list(mesh.shape.values())))
            self._padded_bs = -(-batch_size // ndev) * ndev

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        order = self._index_order()
        self._epoch += 1
        n = len(order)
        bs = self.batch_size
        batches = [order[i:i + bs] for i in range(0, n, bs)]
        if self.drop_remainder and batches and len(batches[-1]) < bs:
            batches.pop()

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that keeps observing `stop` — an abandoned
            consumer (early break / generator GC) must not leave this
            thread blocked in q.put forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(
                            self.dataset.__getitem__, batch_idx.tolist()))
                        host = _assemble(samples)
                        host, valid = pad_batch_to(host, self._padded_bs)
                        host["valid"] = valid
                        # device_put here (producer thread) = double buffer:
                        # the H2D copy overlaps the consumer's compute.
                        if self.mesh is not None:
                            dev = shard_batch(host, self.mesh)
                        else:
                            dev = jax.tree_util.tree_map(jax.device_put, host)
                        if not put(dev):
                            return
                put(None)
            except Exception as e:  # noqa: BLE001
                put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def unpack_mask_bits(packed):
    """Device-side inverse of np.packbits(axis=-1, big bitorder):
    (..., S, S//8) uint8 -> (..., S, S) uint8 in {0,1}. Bit-packing the
    resident masks is a free 8x on their HBM footprint (0.54 -> 0.07 GB
    for a 2048-image 512² corpus) — the margin that lets the batch-128
    epoch-scan train step coexist with a device-resident corpus on a
    16 GB chip; the unpack is a handful of VPU ops fused into the batch
    gather."""
    import jax.numpy as jnp

    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # big bitorder
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))


class DeviceDataPipeline:
    """Whole-corpus-in-HBM pipeline: the decoded uint8 dataset is uploaded
    to the device ONCE, then every batch is a jitted on-device gather —
    zero per-step H2D traffic.

    Rationale: with the TPU reached through a network tunnel (or any
    bandwidth-starved host link), per-batch H2D dominates the epoch — a
    512²×32 uint8 batch is ~33 MB, measured ~7 s/batch through this
    environment's tunnel vs a 0.32 s train step. A 1,200-image 512²
    corpus is only ~1.26 GB as uint8 (image + mask), a fraction of HBM;
    paying one upload per run turns epochs device-bound. This has no
    reference counterpart (torch DataLoaders assume a local PCIe GPU,
    /root/reference/src/train.py:240-260).

    Single-device only (the host DataPipeline remains the multi-device
    path: sharding a resident corpus per-device needs index-aligned
    placement, not worth it below multi-GB corpora). Upload happens
    lazily on first iteration; samples come from `dataset[i]` (uint8 HWC
    image, uint8 HW mask) — with the decoded disk cache in front, the
    one-time upload pass is also the cache warm.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 42, drop_remainder: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self._epoch = 0
        self._images = None  # device uint8 (N,S,S,3)
        self._masks = None   # device uint8 (N,S,S) or bit-packed (N,S,S//8)
        self.masks_packed = False
        import jax.numpy as jnp  # local: keep module import light

        def gather(images, masks, idx):
            m = jnp.take(masks, idx, axis=0)
            if self.masks_packed:
                m = unpack_mask_bits(m)
            return {"image": jnp.take(images, idx, axis=0),
                    "mask": m[..., None]}

        self._gather = jax.jit(gather)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _ensure_device(self):
        if self._images is not None:
            return
        import logging
        import time
        logger = logging.getLogger(__name__)
        t0 = time.time()
        imgs, msks = [], []
        for i in range(len(self.dataset)):
            im, mk = self.dataset[i]
            imgs.append(np.asarray(im, dtype=np.uint8))
            mk = np.asarray(mk)
            msks.append((mk > (127 if mk.dtype == np.uint8 else 0.5))
                        .astype(np.uint8))
        host_i = np.stack(imgs)
        host_m = np.stack(msks)
        if host_m.shape[-1] % 8 == 0:
            host_m = np.packbits(host_m, axis=-1)  # 8 mask px per byte
            self.masks_packed = True
        self._images = jax.device_put(host_i)
        self._masks = jax.device_put(host_m)
        jax.block_until_ready((self._images, self._masks))
        logger.info(
            "device-resident dataset: %d samples, %.2f GB uint8 uploaded "
            "in %.1fs%s", len(imgs),
            (host_i.nbytes + host_m.nbytes) / 2 ** 30, time.time() - t0,
            " (masks bit-packed)" if self.masks_packed else "")

    def __iter__(self) -> Iterator[dict]:
        self._ensure_device()
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1
        bs = self.batch_size
        for i in range(0, len(idx), bs):
            chunk = idx[i:i + bs]
            if len(chunk) < bs:
                if self.drop_remainder:
                    return
                valid = np.zeros((bs,), np.float32)
                valid[:len(chunk)] = 1.0
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - len(chunk),), chunk.dtype)])
            else:
                valid = np.ones((bs,), np.float32)
            batch = self._gather(self._images, self._masks,
                                 jax.device_put(chunk.astype(np.int32)))
            batch["valid"] = jax.device_put(valid)
            yield batch


def _device_cache_fits(cfg, *datasets) -> bool:
    budget = getattr(cfg.DATA, "DEVICE_CACHE_MB", 3072) * (1 << 20)
    s = cfg.DATA.IMG_SIZE
    total = sum(len(d) for d in datasets) * s * s * 4  # u8 RGB + mask
    return total <= budget


def make_pipelines(cfg, train_ds, val_ds, mesh=None
                   ) -> Tuple[DataPipeline, DataPipeline]:
    ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    if (getattr(cfg.DATA, "DEVICE_CACHE", True) and ndev == 1
            and _device_cache_fits(cfg, train_ds, val_ds)):
        train = DeviceDataPipeline(
            train_ds, cfg.TRAIN.BATCH_SIZE, shuffle=True,
            seed=cfg.DATA.SEED)
        val = DeviceDataPipeline(
            val_ds, cfg.TRAIN.BATCH_SIZE, shuffle=False,
            seed=cfg.DATA.SEED)
        return train, val
    train = DataPipeline(
        train_ds, cfg.TRAIN.BATCH_SIZE, mesh=mesh, shuffle=True,
        seed=cfg.DATA.SEED, num_workers=cfg.DATA.NUM_WORKERS,
        prefetch=cfg.DATA.PREFETCH_FACTOR)
    val = DataPipeline(
        val_ds, cfg.TRAIN.BATCH_SIZE, mesh=mesh, shuffle=False,
        seed=cfg.DATA.SEED, num_workers=cfg.DATA.NUM_WORKERS,
        prefetch=cfg.DATA.PREFETCH_FACTOR)
    return train, val
