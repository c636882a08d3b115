"""Threaded data loader and device prefetcher.

Replaces torch.utils.data.DataLoader + the reference's prefetchers
(reference: basicsr/data/prefetch_dataloader.py): worker threads decode
items (cv2 releases the GIL) with a bounded in-order pipeline; the
DevicePrefetcher overlaps host->HBM transfer of the next batch with the
current step, the TPU analogue of the CUDAPrefetcher's side-stream
copies (prefetch_dataloader.py:84-126).
"""

from __future__ import annotations

import collections
import random
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(items: list) -> dict:
    """Stack dict items: arrays stack on a new batch dim; everything
    else becomes a list."""
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Map-style dataset loader with worker threads.

    Args:
        dataset: object with __getitem__/__len__ returning dicts.
        batch_size: items per batch.
        shuffle: shuffle each epoch (ignored when sampler given).
        num_workers: decode threads; 0 = synchronous.
        sampler: optional index-iterable (e.g. EnlargedSampler).
        drop_last: drop the final partial batch.
        seed: base seed for the epoch shuffle when no sampler is given.
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=0,
                 sampler=None, drop_last=False, seed=None,
                 collate_fn=default_collate, prefetch_batches=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.sampler = sampler
        self.drop_last = drop_last
        self.seed = seed
        self.collate_fn = collate_fn
        self.prefetch_batches = max(prefetch_batches, 1)
        self._epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(
            self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(
                (self.seed or 0) + self._epoch) if self.seed is not None \
                else random
            rng.shuffle(indices)
        self._epoch += 1
        return indices

    def __iter__(self):
        indices = self._indices()
        batches = [
            indices[i:i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(
                batches[-1]) < self.batch_size:
            batches.pop()

        if self.num_workers <= 0:
            for b in batches:
                yield self.collate_fn([self.dataset[i] for i in b])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            window = collections.deque()
            max_inflight = self.prefetch_batches
            bi = 0
            while bi < len(batches) or window:
                while bi < len(batches) and len(window) < max_inflight:
                    futs = [ex.submit(self.dataset.__getitem__, i)
                            for i in batches[bi]]
                    window.append(futs)
                    bi += 1
                futs = window.popleft()
                yield self.collate_fn([f.result() for f in futs])


class DevicePrefetcher:
    """Keep N batches in flight to the device mesh.

    The host thread shards/uploads the next batch while the device
    computes on the current one (TPU equivalent of CUDAPrefetcher,
    reference: prefetch_dataloader.py:84-126).
    """

    def __init__(self, loader, put_fn, depth: int = 2):
        self.loader = loader
        self.put_fn = put_fn
        self.depth = depth
        self._queue = collections.deque()
        self._iter = None

    def reset(self):
        self._iter = iter(self.loader)
        self._queue.clear()
        self._fill()

    def _fill(self):
        while len(self._queue) < self.depth:
            try:
                batch = next(self._iter)
            except StopIteration:
                return
            self._queue.append(self.put_fn(batch))

    def next(self):
        if self._iter is None:
            self.reset()
        if not self._queue:
            return None
        batch = self._queue.popleft()
        self._fill()
        return batch


class CPUPrefetcher:
    """Plain iterator facade (reference: prefetch_dataloader.py:63-81)."""

    def __init__(self, loader):
        self.ori_loader = loader
        self.loader = iter(loader)

    def next(self):
        try:
            return next(self.loader)
        except StopIteration:
            return None

    def reset(self):
        self.loader = iter(self.ori_loader)
