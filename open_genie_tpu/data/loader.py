"""Prefetching batch loader: host decode threads -> device HBM.

Replaces the reference's torch DataLoader + Lightning DataModule plumbing
(`/root/reference/genie/module/data.py:26-137`) with a TPU-shaped pipeline:
worker threads (or the native C++ prefetcher, `open_genie_tpu.data.native`)
fill a bounded queue of pinned host batches while `device_put` (optionally
sharded over the mesh `data` axis) overlaps the next batch's H2D transfer
with the current step's compute.
"""
from __future__ import annotations

import threading
from typing import Iterator

import jax
import numpy as np

from open_genie_tpu.data.video import VideoDataset


class DatasetShard:
    """Strided per-process view of a dataset: process p of N sees items
    p, p+N, p+2N, ... -- the multi-host equivalent of DDP's per-rank
    sampler split. Wraps any map-style dataset."""

    def __init__(self, dataset, shard: int, num_shards: int) -> None:
        assert 0 <= shard < num_shards
        self.dataset = dataset
        self.shard = shard
        self.num_shards = num_shards

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n - self.shard + self.num_shards - 1) // self.num_shards

    def __getitem__(self, i: int):
        return self.dataset[i * self.num_shards + self.shard]


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
        """Bounded in-order prefetch: at most `prefetch + num_workers`
        decoded batches exist at any time (a worker claims an index only
        when its slot is within the window), so host memory is bounded by
        construction rather than by the epoch length. A condition variable
        coordinates workers and the consumer -- no polling."""
        self._epoch += 1
        pending = list(enumerate(self._batch_indices()))
        pending.reverse()  # pop() from the front of the epoch
        window = max(1, self.prefetch) + self.num_workers
        results: dict = {}
        cond = threading.Condition()
        state = {"served": 0, "abort": False, "error": None}

        def worker():
            try:
                while True:
                    with cond:
                        # Claim the next index only once it is inside the
                        # prefetch window; blocks the *claim*, not the
                        # decode, so decoded batches stay bounded.
                        while (
                            pending
                            and pending[-1][0] >= state["served"] + window
                            and not state["abort"]
                        ):
                            cond.wait()
                        if state["abort"] or not pending:
                            return
                        bi, idxs = pending.pop()
                    items = [self.dataset[int(i)] for i in idxs]
                    if isinstance(items[0], dict):  # token shards etc.
                        batch = {k: np.stack([it[k] for it in items])
                                 for k in items[0]}
                    else:
                        batch = np.stack(items)
                    with cond:
                        results[bi] = batch
                        cond.notify_all()
            except Exception as e:  # propagate decode errors to the consumer
                with cond:
                    state["error"] = e
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        n_batches = len(self)
        try:
            for served in range(n_batches):
                with cond:
                    while served not in results and state["error"] is None:
                        cond.wait()
                    if state["error"] is not None:
                        raise state["error"]
                    batch = results.pop(served)
                    state["served"] = served + 1
                    cond.notify_all()
                from open_genie_tpu.parallel.mesh import place_batch

                yield place_batch(batch, self.sharding)
        finally:
            with cond:
                state["abort"] = True
                cond.notify_all()


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
