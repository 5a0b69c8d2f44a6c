"""Threaded prefetching data loader.

Capability parity with the reference's torch DataLoader configs
(``training_dataloader: {batch_size, num_workers, prefetch_factor,
collate_fn, persistent_workers}`` — e.g. reference
configs/ctsd/multi_datasets/*.json). torch's loader forks worker
processes; here a thread pool fetches dataset items concurrently — the
hot work (PIL decode, zlib inflate, numpy, the C++ data plane in
opendwm_tpu/native) releases the GIL, so threads overlap IO/decode with
the accelerator step without fork/CoW hazards — and a producer thread
keeps a bounded queue of collated batches ahead of the training loop.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional

import numpy as np

_SENTINEL = object()


class PrefetchLoader:
    """Iterate collated batches with background item fetch + batch queue.

    Mirrors ``train.batch_iterator`` semantics (sampler epochs or
    seeded shuffle) while keeping ``prefetch_batches`` ready. The
    iterator is infinite, like the step-based training loop expects.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        sampler=None,
        seed: int = 0,
        num_workers: int = 4,
        prefetch_batches: int = 2,
        to_device: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.sampler = sampler
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.to_device = to_device
        self._queue: queue.Queue = queue.Queue(self.prefetch_batches)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- index stream (matches train.batch_iterator) ------------------------

    def _index_batches(self, stop: threading.Event):
        if self.sampler is not None:
            while not stop.is_set():
                for micro in self.sampler:
                    yield list(micro)
                self.sampler.set_epoch(
                    getattr(self.sampler, "epoch", 0) + 1
                )
            return
        rng = np.random.default_rng(self.seed)
        n = len(self.dataset)
        while not stop.is_set():
            order = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield [int(j) for j in order[i: i + self.batch_size]]

    def _produce(self, stop: threading.Event, out_queue: queue.Queue):
        # stop/out_queue are passed in (not read off self) so a producer
        # orphaned by re-iteration can never feed the replacement queue.
        def put_with_stop_check(item):
            # Bounded put that gives up when the consumer abandoned
            # iteration (a blocking put on a full queue would hang the
            # thread forever).
            while not stop.is_set():
                try:
                    out_queue.put(item, timeout=0.5)
                    return
                except queue.Full:
                    continue

        with ThreadPoolExecutor(self.num_workers) as pool:
            try:
                for indices in self._index_batches(stop):
                    if stop.is_set():
                        break
                    items = list(
                        pool.map(self.dataset.__getitem__, indices)
                    )
                    batch = self.collate_fn(items)
                    if self.to_device is not None:
                        batch = self.to_device(batch)
                    put_with_stop_check(batch)
            except Exception as e:  # surface worker errors to the consumer
                put_with_stop_check(e)
            finally:
                put_with_stop_check(_SENTINEL)

    def __iter__(self):
        if self._thread is not None and self._thread.is_alive():
            # Two producers feeding one queue would interleave batches;
            # stop the previous iteration's producer first.
            self.close()
        if self._stop.is_set():
            # Fresh stop/queue after close() (explicit or via the branch
            # above) — a producer started with a set stop flag would exit
            # without ever enqueuing the sentinel, hanging the consumer.
            self._stop = threading.Event()
            self._queue = queue.Queue(self.prefetch_batches)
        self._thread = threading.Thread(
            target=self._produce, args=(self._stop, self._queue), daemon=True
        )
        self._thread.start()
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()
        # drain so the producer can observe the stop flag
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        if self._thread is not None:
            self._thread.join(timeout=5)
