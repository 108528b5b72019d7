"""Prefetch loader: batch parity with the synchronous path + overlap."""

import time

import numpy as np

from vdetr_tpu.data.loader import prefetch_loader
from vdetr_tpu.data.synthetic import make_loader


class SlowDataset:
    """Deterministic dataset with a simulated per-sample load cost."""

    def __init__(self, n=16, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if self.delay:
            time.sleep(self.delay)
        rng = np.random.RandomState(idx)
        return {"x": rng.rand(8).astype(np.float32),
                "scan_idx": np.int64(idx)}


def test_prefetch_matches_sync_order():
    ds = SlowDataset(n=11)
    for kwargs in (
        dict(batch_size=4, shuffle=False, pad_last=True),
        dict(batch_size=4, shuffle=True, seed=3, drop_last=True),
        dict(batch_size=4, shuffle=False, drop_last=False),
    ):
        sync = list(prefetch_loader(ds, num_workers=0, **kwargs))
        threaded = list(prefetch_loader(ds, num_workers=4, **kwargs))
        assert len(sync) == len(threaded)
        for a, b in zip(sync, threaded):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def test_prefetch_matches_make_loader():
    """The prefetch loader must produce the exact batches of the original
    synchronous make_loader (same shuffle, same padding contract)."""
    ds = SlowDataset(n=10)
    a = list(make_loader(ds, 4, shuffle=True, seed=7, pad_last=True))
    b = list(prefetch_loader(ds, 4, shuffle=True, seed=7, pad_last=True,
                             num_workers=3))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_prefetch_overlaps_consumer():
    """With per-sample delay d, batch b, the threaded loader must beat the
    serial lower bound n*d when the consumer also spends time per batch."""
    d = 0.02
    ds = SlowDataset(n=16, delay=d)
    t0 = time.time()
    for _ in prefetch_loader(ds, 4, shuffle=False, num_workers=8,
                             prefetch_batches=2):
        time.sleep(4 * d)  # consumer work per batch
    elapsed = time.time() - t0
    serial = 16 * d + 4 * 4 * d  # fetch-then-consume, no overlap
    assert elapsed < serial * 0.8, (elapsed, serial)
