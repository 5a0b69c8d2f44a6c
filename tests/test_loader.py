"""Threaded prefetch loader (datasets/loader.py)."""

import threading
import time

import numpy as np

from opendwm_tpu.datasets.loader import PrefetchLoader


class SlowDataset:
    def __init__(self, n=32, delay=0.01):
        self.n = n
        self.delay = delay
        self.lock = threading.Lock()
        self.concurrent = 0
        self.max_concurrent = 0

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self.lock:
            self.concurrent += 1
            self.max_concurrent = max(self.max_concurrent, self.concurrent)
        time.sleep(self.delay)
        with self.lock:
            self.concurrent -= 1
        return {"x": np.full((2,), float(i))}


def collate(items):
    return {"x": np.stack([i["x"] for i in items])}


class TestPrefetchLoader:
    def test_batches_match_sequential_order(self):
        ds = SlowDataset(delay=0.0)
        loader = PrefetchLoader(
            ds, batch_size=4, collate_fn=collate, seed=7, num_workers=3
        )
        it = iter(loader)
        got = [next(it)["x"][:, 0] for _ in range(8)]
        loader.close()
        rng = np.random.default_rng(7)
        order = rng.permutation(32)
        want = [order[i: i + 4] for i in range(0, 32, 4)]
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w.astype(float))

    def test_items_fetched_concurrently(self):
        ds = SlowDataset(delay=0.05)
        loader = PrefetchLoader(
            ds, batch_size=8, collate_fn=collate, num_workers=8
        )
        it = iter(loader)
        next(it)
        loader.close()
        assert ds.max_concurrent >= 2

    def test_worker_error_propagates(self):
        class Broken(SlowDataset):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = PrefetchLoader(
            Broken(), batch_size=2, collate_fn=collate, num_workers=2
        )
        it = iter(loader)
        try:
            next(it)
            raise AssertionError("expected RuntimeError")
        except RuntimeError as e:
            assert "boom" in str(e)

    def test_infinite_iteration_wraps_epochs(self):
        ds = SlowDataset(n=8, delay=0.0)
        loader = PrefetchLoader(
            ds, batch_size=4, collate_fn=collate, num_workers=2
        )
        it = iter(loader)
        batches = [next(it) for _ in range(5)]  # > one epoch (2 batches)
        loader.close()
        assert len(batches) == 5

    def test_reiteration_replaces_producer(self):
        ds = SlowDataset(n=16, delay=0.0)
        loader = PrefetchLoader(
            ds, batch_size=4, collate_fn=collate, seed=3, num_workers=2
        )
        it1 = iter(loader)
        next(it1)
        # Re-iterating stops the first producer and starts clean: the new
        # stream must reproduce the same deterministic batch sequence.
        it2 = iter(loader)
        first = next(it2)
        rng = np.random.default_rng(3)
        order = rng.permutation(16)
        expected = np.stack(
            [np.full((2,), float(j)) for j in order[:4]]
        )
        np.testing.assert_array_equal(first["x"], expected)
        loader.close()

    def test_abandoned_consumer_does_not_hang_producer(self):
        class Broken(SlowDataset):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = PrefetchLoader(
            Broken(n=8), batch_size=2, collate_fn=collate,
            num_workers=1, prefetch_batches=1,
        )
        it = iter(loader)
        try:
            next(it)
        except RuntimeError:
            pass
        del it  # consumer walks away without draining the sentinel
        time.sleep(0.2)
        loader.close()  # must return promptly (no blocked put inside)
        assert not loader._thread.is_alive()
