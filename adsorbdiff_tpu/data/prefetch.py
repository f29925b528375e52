"""Background batch prefetcher: overlap host-side collation + host->device
transfer with the device step.

The reference gets input pipelining from torch DataLoader worker processes
(ref: adsorbdiff/datasets/lmdb_dataset.py + common/data_parallel.py via
trainers/base_trainer.py dataloaders).  Single-controller JAX has no implicit
workers: without this, every train step serializes [collate -> device_put ->
step].  ``jax.device_put`` is async (it returns a future-backed Array), so
issuing it from a worker thread one step ahead hides the transfer entirely
behind the previous device step; the GIL is released during the copy.

Depth 2 (double buffering) is enough: deeper queues only add host memory.
Abandoning the iterator early (generator close / break / early return, e.g.
the trainer's NaN-loss stop) signals the worker and drains the queue, so
no device-resident batches stay pinned behind a parked ``q.put``.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional


class Prefetcher:
    """Iterate ``iterable`` on a worker thread, applying ``transform``
    (e.g. ``lambda b: shard_batch(b, mesh)``) ahead of the consumer."""

    def __init__(self, iterable: Iterable, transform: Optional[Callable[[Any], Any]] = None,
                 depth: int = 2) -> None:
        self._iterable = iterable
        self._transform = transform
        self._depth = max(1, int(depth))

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        stop = object()
        cancel = threading.Event()
        err: list = []

        def put(item) -> bool:
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker() -> None:
            try:
                for item in self._iterable:
                    if not put(self._transform(item) if self._transform else item):
                        return
            except BaseException as e:  # re-raised on the consumer thread
                err.append(e)
            finally:
                put(stop)

        threading.Thread(target=worker, daemon=True, name="batch-prefetch").start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # early exit: release the worker and drop queued (device) buffers
            cancel.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
