"""Host-side input pipeline: threaded sample preparation + batch prefetch.

The reference hides its ray-prep cost in torch DataLoader worker processes
(survey §3.1: num_workers=16 subprocesses each running the full ray prep).
The equivalent here is a thread pool preparing samples concurrently (the prep
is numpy/cv2 which releases the GIL for the heavy parts) plus a bounded
prefetch queue so the accelerator never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor


class PrefetchBatcher:
    """Iterates batches of prepared rows ahead of consumption.

    prepare_fn(idx) -> row dict; collate_fn(list_of_rows) -> device batch.
    """

    def __init__(self, prepare_fn, collate_fn, indices, batch_size: int,
                 num_workers: int = 8, prefetch: int = 2, drop_last: bool = True,
                 batch_prepare_fn=None):
        self.prepare_fn = prepare_fn
        self.collate_fn = collate_fn
        self.indices = list(indices)
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        # batch_prepare_fn(idxs) -> rows: one call per batch instead of a
        # per-row pool.map — lets the trainer run its pose-init / projection
        # math as ONE jitted CPU call per batch (on a 1-CPU host the per-row
        # eager dispatch dominates and thread workers cannot parallelize it)
        self.batch_prepare_fn = batch_prepare_fn

    def __len__(self):
        n = len(self.indices) // self.batch_size
        if not self.drop_last and len(self.indices) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item):
            # bounded-wait put that re-checks stop: a plain q.put can block
            # forever on the full queue when the consumer exited early
            # (step failure / generator closed), leaking this thread and the
            # worker pool for the life of the process
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return
                except queue.Full:
                    continue

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(len(self)):
                        if stop.is_set():
                            return
                        idxs = self.indices[b * self.batch_size:(b + 1) * self.batch_size]
                        if self.batch_prepare_fn is not None:
                            rows = self.batch_prepare_fn(idxs)
                        else:
                            rows = list(pool.map(self.prepare_fn, idxs))
                        put(self.collate_fn(rows))
            except Exception as e:  # surfaced on the consumer side
                put(e)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
