"""DataLoader: thread-pool decode (num_workers honored), in-order delivery,
error propagation (replaces reference idist.auto_dataloader workers)."""
import time

import numpy as np
import pytest

from behindthescenes_tpu.datasets.loader import DataLoader


class _ArrayDataset:
    def __init__(self, n=16, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return {"imgs": np.full((2, 4, 4, 3), float(i), np.float32),
                "poses": np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
                "projs": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))}


@pytest.mark.parametrize("num_workers", [1, 3, 8])
def test_loader_matches_serial_order(num_workers):
    ds = _ArrayDataset(n=13)
    serial = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                             num_workers=0))
    pooled = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                             num_workers=num_workers))
    assert len(serial) == len(pooled) == 4
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a["imgs"], b["imgs"])


def test_loader_actually_parallel():
    """8 workers over 16 x 50ms samples must take far less than serial
    (~800ms); allow generous CI slack."""
    ds = _ArrayDataset(n=16, delay=0.05)
    t0 = time.perf_counter()
    out = list(DataLoader(ds, batch_size=8, num_workers=8))
    elapsed = time.perf_counter() - t0
    assert len(out) == 2
    assert elapsed < 0.5, f"loader not parallel: {elapsed:.2f}s"


def test_loader_single_sample_batches_keep_workers_busy():
    """batch_size=1 (eval) still decodes ahead across batches."""
    ds = _ArrayDataset(n=16, delay=0.05)
    t0 = time.perf_counter()
    out = list(DataLoader(ds, batch_size=1, num_workers=8))
    elapsed = time.perf_counter() - t0
    assert len(out) == 16
    assert elapsed < 0.5, f"no cross-batch prefetch: {elapsed:.2f}s"


def test_loader_propagates_errors():
    class _Boom(_ArrayDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("decode failed")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="decode failed"):
        list(DataLoader(_Boom(), batch_size=4, num_workers=4))


def test_loader_early_stop_no_hang():
    ds = _ArrayDataset(n=64, delay=0.01)
    it = iter(DataLoader(ds, batch_size=4, num_workers=4))
    next(it)
    it.close()   # generator finalizer must stop the coordinator promptly
