"""Host-side data loading: shuffling, batching, threaded prefetch.

Replaces torch DataLoader + ignite auto_dataloader (reference
models/bts/trainer.py:388-390). Workers are threads (the datasets are
numpy/cv2-bound and release the GIL in the hot parts); batches are collated
on the host and handed to JAX as numpy arrays, with an optional device
prefetch queue to overlap H2D transfer with compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from behindthescenes_tpu.datasets.synthetic import collate


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 2,
                 seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 131071 + self._epoch)
            rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, end, self.batch_size):
            yield order[i:i + self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers == 0:
            for idxs in self._index_batches():
                yield collate([self.dataset[int(i)] for i in idxs])
            return

        # Sample-level thread pool with in-order batch delivery: all
        # `num_workers` threads decode concurrently (cv2/numpy release the
        # GIL), both within a batch and across the prefetch window — a
        # batch-16 KITTI sample set decodes 16-wide instead of serially.
        from concurrent.futures import ThreadPoolExecutor
        from collections import deque

        batches = list(self._index_batches())
        out_q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()
        # Enough batch groups in flight to keep every worker busy even at
        # batch_size 1, without holding unbounded decoded samples.
        window = max(self.prefetch,
                     -(-2 * self.num_workers // self.batch_size))

        def coordinator():
            try:
                with ThreadPoolExecutor(
                        max_workers=self.num_workers) as ex:
                    in_flight = deque()
                    bi = 0
                    while bi < len(batches) and len(in_flight) < window:
                        in_flight.append([
                            ex.submit(self.dataset.__getitem__, int(i))
                            for i in batches[bi]])
                        bi += 1
                    while in_flight:
                        batch = collate([f.result()
                                         for f in in_flight.popleft()])
                        while not stop.is_set():
                            try:
                                out_q.put(batch, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
                        if bi < len(batches):
                            in_flight.append([
                                ex.submit(self.dataset.__getitem__, int(i))
                                for i in batches[bi]])
                            bi += 1
                out_q.put(None)
            except BaseException as e:  # surface loader errors to consumer
                out_q.put(e)

        t = threading.Thread(target=coordinator, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def shard_for_host(dataset, host_id: int, num_hosts: int):
    """Per-host dataset sharding for multi-host training (replaces
    DistributedSampler)."""
    class _Shard:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds) // num_hosts

        def __getitem__(self, i):
            return self.ds[i * num_hosts + host_id]

    return _Shard(dataset)
