"""Batched data loading with background prefetch.

Replaces torch DataLoader worker processes (train.py:180-195) with a
thread-pool map + a prefetch queue: samples are built in parallel threads
(cv2/numpy release the GIL for the heavy parts), collated to numpy, and
handed to the training loop which overlaps host batch assembly with device
compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict]) -> Dict:
    """Stack sample dicts; non-array values collect into lists."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals).astype(np.float32)
        elif isinstance(vals[0], (int, float)):
            out[key] = np.asarray(vals, dtype=np.float32)
        else:
            out[key] = vals
    return out


class DataLoader:
    """``batch_size`` is the GLOBAL batch; under multi-host training
    (``num_shards`` = jax.process_count()) every process draws the same
    global index sequence (same seed) and loads only its contiguous
    per-process slice of each batch -- the slice that
    parallel.mesh.shard_batch places on this process's devices."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0,
                 drop_last: bool = True, prefetch: int = 2,
                 shard_id: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        assert 0 <= shard_id < num_shards, (shard_id, num_shards)
        assert batch_size % num_shards == 0, \
            f"{num_shards} processes must divide global batch {batch_size}"
        # with a short final batch the [lo:lo+k] slices would be unequal
        # (possibly empty) across processes, breaking shard_batch's global
        # shape assembly -- multi-host loading requires full batches
        assert num_shards == 1 or drop_last, \
            "num_shards > 1 requires drop_last=True (equal per-process shards)"
        self.shard_id = shard_id
        self.num_shards = num_shards

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _index_batches(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        nb = len(self)
        k = self.batch_size // self.num_shards
        lo = self.shard_id * k
        return [idx[i * self.batch_size:(i + 1) * self.batch_size]
                [lo:lo + k].tolist() for i in range(nb)]

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        self.epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, idx))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class InfiniteLoader:
    """Cycles a DataLoader forever (reference restarts the iterator on
    StopIteration, netinterface.py:246-252)."""

    def __init__(self, loader: DataLoader):
        self.loader = loader
        self._it: Optional[Iterator] = None

    def __next__(self):
        if self._it is None:
            self._it = iter(self.loader)
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)
