"""Batching + device feeding: threaded loader, host-shard, double-buffer.

TPU-first replacement for torch DataLoader (reference lib/trainer_temp.py:600-614):
a background-threaded batch assembler producing fixed-shape numpy batches, a
``shard_batch`` that lays each batch out over the mesh's data axis, and
``prefetch_to_device`` double-buffering so the host pipeline overlaps device
compute (SURVEY.md §2.6 "LMDB → double-buffered device batches").
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Iterator

import jax
import numpy as np


def _stack_batch(items: list[dict]) -> dict:
    """Collate dict items; numeric leaves stacked, str/list leaves listed."""
    out: dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class BatchLoader:
    """Epoch-cycling, optionally shuffled, background-threaded batch loader.

    Drops the last partial batch (static shapes for jit). ``num_workers``
    threads decode images concurrently (PIL decode releases the GIL).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 2,
        drop_last: bool = True,
        collate: Callable[[list[dict]], dict] = _stack_batch,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate = collate
        self.num_workers = max(0, num_workers)
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def _index_batches(self) -> list[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(nb)]

    def epoch(self) -> Iterator[dict]:
        """One pass over the dataset.

        With ``num_workers`` > 0, that many pool threads decode batches
        concurrently (PIL/numpy decode releases the GIL); delivery order is
        deterministic (submission order) and at most ``num_workers + 2``
        batches are in flight.
        """
        batches = self._index_batches()
        if self.num_workers == 0:
            for b in batches:
                yield self.collate([self.dataset[int(i)] for i in b])
            return

        from concurrent.futures import ThreadPoolExecutor

        def load(b):
            return self.collate([self.dataset[int(i)] for i in b])

        inflight: collections.deque = collections.deque()
        ex = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            for b in batches:
                inflight.append(ex.submit(load, b))
                if len(inflight) > self.num_workers + 2:
                    yield inflight.popleft().result()
            while inflight:
                yield inflight.popleft().result()
        finally:
            # consumers abandon the generator mid-epoch (step-counted
            # training loops); release the pool immediately, not at GC
            ex.shutdown(wait=False, cancel_futures=True)

    def __iter__(self) -> Iterator[dict]:
        """Endless epoch-cycling iterator (the trainer counts steps, not
        epochs — reference lib/trainer_temp.py:283-461 loops while
        step < n_iter)."""
        if len(self) == 0:
            raise ValueError(
                f"BatchLoader yields zero batches (dataset "
                f"{len(self.dataset)} < batch_size {self.batch_size} with "
                f"drop_last) — an endless iterator would spin forever")
        while True:
            yield from self.epoch()


def shard_batch(batch: dict, sharding) -> dict:
    """Place every array leaf with the given sharding (non-arrays pass
    through host-side)."""
    def place(x):
        if isinstance(x, np.ndarray) and x.dtype != object:
            return jax.device_put(x, sharding)
        return x
    return {k: place(v) for k, v in batch.items()}


def prefetch_to_device(iterator: Iterator[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Double-buffer: keep ``size`` batches in flight on device."""
    buf: collections.deque = collections.deque()

    def put(batch):
        if sharding is not None:
            buf.append(shard_batch(batch, sharding))
        else:
            buf.append(jax.tree.map(
                lambda x: jax.device_put(x)
                if isinstance(x, np.ndarray) and x.dtype != object else x,
                batch))

    for batch in iterator:
        put(batch)
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
