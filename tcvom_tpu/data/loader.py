"""Prefetching data loader with deterministic per-process sharding.

The TPU-native replacement for the reference's DataLoader +
DistributedSampler (train_ddp.py:171-176, 233-240): a single-controller
process strides the globally-shuffled index list by ``jax.process_index()``
and worker threads run the cv2 pipeline (cv2 releases the GIL, so threads
scale like the reference's worker processes without fork hazards).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

import numpy as np


def epoch_indices(n: int, epoch: int, shuffle: bool, seed: int = 0,
                  num_shards: int = 1, shard: int = 0,
                  drop_last: bool = True) -> np.ndarray:
    """Deterministic per-epoch shuffle, padded & strided across shards —
    DistributedSampler semantics (same list on every process, disjoint
    slices)."""
    idx = np.arange(n)
    if shuffle:
        idx = np.random.RandomState(seed + epoch).permutation(n)
    if num_shards > 1:
        total = ((n + num_shards - 1) // num_shards) * num_shards
        idx = np.concatenate([idx, idx[: total - n]])
        idx = idx[shard::num_shards]
    return idx


class DataLoader:
    """Iterate a map-style dataset in collated batches with thread
    prefetch. ``dataset[i]`` must return a dict of numpy arrays."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True, seed: int = 0,
                 num_shards: int = 1, shard: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard = shard
        self.prefetch = max(1, prefetch)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(epoch_indices(len(self.dataset), 0, False,
                              num_shards=self.num_shards, shard=self.shard))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = epoch_indices(len(self.dataset), self.epoch, self.shuffle,
                            self.seed, self.num_shards, self.shard,
                            self.drop_last)
        nb = len(idx) // self.batch_size if self.drop_last else \
            -(-len(idx) // self.batch_size)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        task_q: "queue.Queue" = queue.Queue()
        results: dict[int, Any] = {}
        cond = threading.Condition()
        state = {"served": 0, "abort": False}

        for bi, b in enumerate(batches):
            task_q.put((bi, b))

        def worker():
            while True:
                try:
                    bi, b = task_q.get_nowait()
                except queue.Empty:
                    return
                # enforce the prefetch bound BEFORE materializing: at most
                # ``prefetch`` batches are ever computed-or-stored ahead of
                # the consumer, so a slow consumer cannot blow host RAM
                with cond:
                    while (bi >= state["served"] + self.prefetch
                           and not state["abort"]):
                        cond.wait()
                    if state["abort"]:
                        return
                try:
                    items = [self.dataset[int(i)] for i in b]
                    batch = {k: np.stack([it[k] for it in items])
                             for k in items[0]}
                except Exception as e:           # propagate to the consumer
                    batch = e
                with cond:
                    results[bi] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for served in range(nb):
                with cond:
                    while served not in results:
                        cond.wait()
                    batch = results.pop(served)
                    state["served"] = served + 1
                    cond.notify_all()
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:       # consumer stopped early: release blocked workers
            with cond:
                state["abort"] = True
                cond.notify_all()
