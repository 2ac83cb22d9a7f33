"""Prefetching data loader with deterministic per-process sharding.

The TPU-native replacement for the reference's DataLoader +
DistributedSampler (train_ddp.py:171-176, 233-240): a single-controller
process takes its per-batch contiguous block of the globally-shuffled
index list by ``jax.process_index()`` (see ``epoch_indices``)
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
                  drop_last: bool = True, block: int = 1) -> np.ndarray:
    """Deterministic per-epoch shuffle, padded (wrapping) & sharded —
    DistributedSampler semantics (same list on every process, disjoint
    slices).

    ``block``: each shard takes contiguous runs of ``block`` out of every
    ``num_shards * block`` chunk. With block = the per-process batch size,
    the concatenation of all processes' k-th batches equals the k-th
    global batch of a single-process run — the global sample ORDER is
    placement-invariant, so per-position preprocessing randomness (e.g.
    the per-sample trimap dilation radius) pairs with the same sample on
    any process count and losses match exactly (test_multihost.py).
    ``block=1`` is plain DistributedSampler striding.

    ``drop_last=True`` (the training loaders) wraps the list up to a full
    chunk even at ``num_shards=1``: DistributedSampler pads rather than
    drops (the reference applies it unconditionally, train_ddp.py:171-176),
    so a 4-device single-process epoch sees the same wrapped global
    batches as 2 coordinated processes of 2 devices — and the same step
    count. ``drop_last=False`` (eval/pred loaders, which the reference
    drives without a sampler) never wraps at num_shards=1, so inference
    outputs are not duplicated."""
    idx = np.arange(n)
    if shuffle:
        idx = np.random.RandomState(seed + epoch).permutation(n)
    if num_shards > 1 or (drop_last and n % (num_shards * block)):
        chunk = num_shards * block
        total = ((n + chunk - 1) // chunk) * chunk
        reps = -(-(total - n) // max(n, 1)) + 1
        idx = np.tile(idx, reps)[:total]
        idx = idx.reshape(-1, num_shards, block)[:, shard].reshape(-1)
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
                              num_shards=self.num_shards, shard=self.shard,
                              drop_last=self.drop_last,
                              block=self.batch_size))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = epoch_indices(len(self.dataset), self.epoch, self.shuffle,
                            self.seed, self.num_shards, self.shard,
                            self.drop_last, block=self.batch_size)
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
