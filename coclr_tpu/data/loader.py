"""Threaded, prefetching batch loader.

Replaces the reference's FastDataLoader (persistent torch worker processes,
utils/utils.py:233-260) + DistributedSampler (main_nce.py:414-424): one
process feeds all chips, decode parallelism comes from a thread pool (cv2
JPEG decode releases the GIL), and a producer thread keeps a prefetch queue
of collated numpy batches ahead of the device.

Shuffle semantics: per-epoch reshuffle with seed=epoch like
DistributedSampler.set_epoch (main_nce.py:255-260); drop_last=True.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples])
    return out


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 3):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for bi in range(nb):
                    if stop.is_set():
                        return
                    ids = order[bi * self.batch_size:(bi + 1) * self.batch_size]
                    samples = list(self._pool.map(self.dataset.__getitem__, ids))
                    q.put(collate(samples))
                q.put(None)
            except BaseException as e:  # surface worker errors to consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
