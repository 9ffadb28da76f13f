"""Batching + async device prefetch.

Replaces the reference's DataLoader worker processes (num_workers 4-10,
/root/reference/main.py:415, DenseFusion/tools/train.py:36) with a
thread-pool batch assembler and a one-deep device prefetch queue: batch i+1
is assembled and transferred while batch i computes.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import jax
import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into a batch dict."""
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples])
    return out


class Loader:
    """Shuffling batch iterator over an indexable dataset. Samples returning
    None (degenerate masks) are skipped and replaced."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 num_workers: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        pool = ThreadPoolExecutor(self.num_workers) if self.num_workers else None
        try:
            batch = []
            fetch = (pool.map if pool else map)
            for sample in fetch(self.dataset.__getitem__, order.tolist()):
                if sample is None:
                    continue
                batch.append(sample)
                if len(batch) == self.batch_size:
                    yield collate(batch)
                    batch = []
            if batch and not self.drop_last:
                yield collate(batch)
        finally:
            if pool:
                pool.shutdown(wait=False, cancel_futures=True)


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Prefetch batches onto device ahead of consumption."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
