"""Background-thread batch prefetch for the training loop.

The reference overlaps host-side data work with device compute via torch
DataLoader worker processes (``sft_3b.sh --dataloader_num_workers 4``,
HF Trainer's loader). The JAX-native equivalent is simpler: device
dispatch is already asynchronous, so one background thread that builds
(tokenize/PIL/patchify/pack) and ``device_put``s the NEXT batch while
the device executes the current step recovers the same overlap without
worker processes or shared-memory tensors.

``device_put`` from a secondary thread is supported by JAX; transfers
are enqueued on the host-to-device stream and do not block device
compute.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Optional


class BatchPrefetcher:
    """Pull batches from ``make_batch`` in a daemon thread, ``size`` ahead.

    ``make_batch`` must be self-contained (own the data-stream cursor)
    and is only ever called from the prefetch thread, so un-thread-safe
    generators are fine. Exceptions raised by ``make_batch`` are
    re-raised in the consumer on the next ``next()``.
    """

    _SENTINEL = object()

    def __init__(self, make_batch: Callable[[], object], size: int = 2):
        if size < 1:
            raise ValueError("prefetch size must be >= 1")
        self._make = make_batch
        self._q: queue.Queue = queue.Queue(maxsize=size)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, name="batch-prefetch", daemon=True
        )
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._make()
                # bounded put that still honors stop requests
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            self._err = e
            try:
                self._q.put(self._SENTINEL, timeout=0.1)
            except queue.Full:
                pass

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if self._err is not None and self._q.empty():
                    raise self._err
        if item is self._SENTINEL:
            raise self._err
        return item

    def close(self, timeout: float = 60.0):
        """Stop the worker and wait until it has provably exited.

        The worker may be deep inside ``make_batch`` (e.g. a slow data
        source) when close() is called; a single drain+join(5s) could
        return while the thread is still alive, consuming the sample
        stream and enqueueing afterwards. Instead, drain + join in a
        loop until the thread exits, bounded by ``timeout`` seconds; if
        it is still alive then, log a warning so the non-quiescent
        stream cursor is visible instead of silent."""
        self._stop.set()
        deadline = time.monotonic() + timeout
        while self._thread.is_alive():
            # drain so the worker's blocked put can observe the stop flag
            while True:
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    break
            self._thread.join(timeout=0.5)
            if time.monotonic() >= deadline:
                break
        if self._thread.is_alive():
            import logging

            logging.getLogger(__name__).warning(
                "BatchPrefetcher.close(): worker still inside make_batch "
                "after %.0fs; the sample-stream cursor may advance once "
                "more before the daemon thread exits", timeout)
