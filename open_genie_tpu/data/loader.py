"""Prefetching batch loader: host decode threads -> device HBM.

Replaces the reference's torch DataLoader + Lightning DataModule plumbing
(`/root/reference/genie/module/data.py:26-137`) with a TPU-shaped pipeline:
worker threads (or the native C++ prefetcher, `open_genie_tpu.data.native`)
fill a bounded queue of pinned host batches while `device_put` (optionally
sharded over the mesh `data` axis) overlaps the next batch's H2D transfer
with the current step's compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from open_genie_tpu.data.video import VideoDataset


class BatchLoader:
    """Iterate `(B, T, H, W, C)` float32 batches from a VideoDataset."""

    def __init__(
        self,
        dataset: VideoDataset,
        batch_size: int = 8,
        shuffle: bool = True,
        num_workers: int = 2,
        prefetch: int = 2,
        drop_last: bool = True,
        seed: int = 0,
        sharding=None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.seed = seed
        self.sharding = sharding
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        nb = len(self)
        for i in range(nb):
            yield order[i * self.batch_size : (i + 1) * self.batch_size]

    def __iter__(self) -> Iterator:
        self._epoch += 1
        batches = list(self._batch_indices())
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        idx_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            idx_q.put((bi, b))
        results = {}
        lock = threading.Lock()

        def worker():
            while True:
                try:
                    bi, idxs = idx_q.get_nowait()
                except queue.Empty:
                    return
                batch = np.stack([self.dataset[int(i)] for i in idxs])
                with lock:
                    results[bi] = batch

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        served = 0
        while served < len(batches):
            with lock:
                ready = served in results
            if ready:
                with lock:
                    batch = results.pop(served)
                if self.sharding is not None:
                    batch = jax.device_put(batch, self.sharding)
                else:
                    batch = jax.device_put(batch)
                yield batch
                served += 1
            else:
                # Yield the GIL briefly; decode threads are working.
                threading.Event().wait(0.002)


def device_prefetch(iterator, size: int = 2):
    """Keep `size` device batches in flight ahead of the consumer."""
    buf = []
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(next(it))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(next(it))
        except StopIteration:
            pass
        yield nxt
