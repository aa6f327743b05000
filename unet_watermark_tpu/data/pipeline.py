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


def make_pipelines(cfg, train_ds, val_ds, mesh=None
                   ) -> Tuple[DataPipeline, DataPipeline]:
    train = DataPipeline(
        train_ds, cfg.TRAIN.BATCH_SIZE, mesh=mesh, shuffle=True,
        seed=cfg.DATA.SEED, num_workers=cfg.DATA.NUM_WORKERS,
        prefetch=cfg.DATA.PREFETCH_FACTOR)
    val = DataPipeline(
        val_ds, cfg.TRAIN.BATCH_SIZE, mesh=mesh, shuffle=False,
        seed=cfg.DATA.SEED, num_workers=cfg.DATA.NUM_WORKERS,
        prefetch=cfg.DATA.PREFETCH_FACTOR)
    return train, val
