"""Threaded prefetching batch loader (host side).

Replaces torch DataLoader worker processes (`/root/reference/train.py:44-53`)
with a thread pool: OpenCV decode releases the GIL, so threads saturate the
host cores without fork overhead, and batches are assembled into pinned
numpy arrays ready for a single device_put.  A small prefetch queue keeps
decode ahead of the TPU step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from medical_image_classification_tpu.data.image_folder import (
    ImageFolder,
    load_eval_image,
    load_train_image,
)


class BatchLoader:
    """Deterministic, epoch-seeded, prefetching loader.

    Per-epoch shuffling is seeded with (seed, epoch) — the JAX-side analogue
    of DistributedSampler.set_epoch (`ddp_train.py:152-154`).  With
    ``shard_index/shard_count`` set, each host reads a disjoint shard
    (multi-host DP).
    """

    def __init__(self, dataset: ImageFolder, batch_size: int, image_size: int,
                 train: bool, seed: int = 0, num_threads: int = 8,
                 prefetch: int = 4, drop_last: Optional[bool] = None,
                 shard_index: int = 0, shard_count: int = 1,
                 use_native: Optional[bool] = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.image_size = image_size
        self.train = train
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = train if drop_last is None else drop_last
        self.shard_index = shard_index
        self.shard_count = shard_count
        if use_native is None:
            from medical_image_classification_tpu.data import native_loader
            use_native = native_loader.native_available()
        self.use_native = use_native

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.ds)
        idx = np.arange(n)
        if self.train:
            rng = np.random.default_rng((self.seed, epoch))
            rng.shuffle(idx)
        if self.shard_count > 1:
            # pad to equal shards (wrap-around), then take our slice
            per = -(-n // self.shard_count)
            idx = np.concatenate([idx, idx[: per * self.shard_count - n]])
            idx = idx[self.shard_index::self.shard_count]
        return idx

    def steps_per_epoch(self) -> int:
        n = len(self._epoch_indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (images uint8 [B,H,W,3], labels int32 [B])."""
        idx = self._epoch_indices(epoch)
        nb = self.steps_per_epoch()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_one(args):
            i, (sample_idx, seed) = args
            path, label = self.ds.samples[sample_idx]
            if self.train:
                rng = np.random.default_rng(seed)
                img = load_train_image(path, self.image_size, rng)
            else:
                img = load_eval_image(path, self.image_size)
            return i, img, label

        def producer():
            if self.use_native:
                from medical_image_classification_tpu.data.native_loader import (
                    decode_batch)
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    paths = [self.ds.samples[i][0] for i in sel]
                    labels = np.asarray([self.ds.samples[i][1] for i in sel],
                                        dtype=np.int32)
                    seed = hash((self.seed, epoch, b)) & (2**63 - 1)
                    imgs = decode_batch(paths, self.image_size, self.train,
                                        seed, threads=self.num_threads)
                    out_q.put((imgs, labels))
                out_q.put(None)
                return
            with ThreadPoolExecutor(self.num_threads) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    seeds = [(self.seed, epoch, b, int(s)) for s in sel]
                    imgs = np.empty((len(sel), self.image_size,
                                     self.image_size, 3), dtype=np.uint8)
                    labels = np.empty((len(sel),), dtype=np.int32)
                    work = list(enumerate(zip(sel, seeds)))
                    for i, img, label in pool.map(load_one, work):
                        imgs[i] = img
                        labels[i] = label
                    out_q.put((imgs, labels))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


class SyntheticLoader:
    """Fixed-shape random batches for benchmarking / tests (no disk)."""

    def __init__(self, batch_size: int, image_size: int, num_classes: int,
                 steps: int = 16, seed: int = 0):
        self.batch_size, self.image_size = batch_size, image_size
        self.num_classes, self.steps, self.seed = num_classes, steps, seed

    def steps_per_epoch(self):
        return self.steps

    def epoch(self, epoch: int = 0):
        rng = np.random.default_rng((self.seed, epoch))
        for _ in range(self.steps):
            imgs = rng.integers(0, 256, (self.batch_size, self.image_size,
                                         self.image_size, 3), dtype=np.uint8)
            labels = rng.integers(0, self.num_classes,
                                  (self.batch_size,), dtype=np.int32)
            yield imgs, labels
