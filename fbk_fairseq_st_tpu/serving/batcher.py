"""Cross-request dynamic batching for the serving front end.

The TPU-idiomatic counterpart of TF-Serving-style request batching
(a capability the reference's TorchScript/ONNX serving story leaves to
external infrastructure): the exported AOT buckets make every shape
static, so under concurrent load the only throughput lever is filling a
bucket's batch rows with OTHER requests' instances instead of padding.

``DynamicBatcher`` queues instances from all HTTP handler threads, lets
a single dispatcher wait up to ``window_ms`` for co-travelers (or until
the widest bucket would fill), then runs ONE ``translate_many`` over the
union and scatters per-instance results back to the waiting threads.
With one in-flight dispatch the device is never idle while requests
queue — and because results come from the same compiled programs, a
batched reply is token-identical to an unbatched one (asserted in
tests/test_serving.py).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence

import numpy as np


class _Entry:
    __slots__ = ("array", "nbest", "event", "result", "error")

    def __init__(self, array: np.ndarray, nbest: int):
        self.array = array
        self.nbest = nbest
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class DynamicBatcher:
    """Batch concurrent translate requests through one dispatcher thread.

    window_ms: how long the dispatcher waits for additional instances
        after the first one arrives (0 still coalesces whatever queued
        while the previous dispatch was running — "continuous batching").
    max_items: dispatch as soon as this many instances are queued
        (default: the widest exported bucket).
    """

    def __init__(self, model, window_ms: float = 5.0,
                 max_items: Optional[int] = None):
        self.model = model
        self.window = max(float(window_ms), 0.0) / 1e3
        self.max_items = max_items or max(
            r["batch"] for r in model.meta["programs"]
        )
        self._cond = threading.Condition()
        self._queue: List[_Entry] = []
        self._closed = False
        # observability (read by tests and /meta consumers)
        self.batches_dispatched = 0
        self.items_dispatched = 0
        self._thread = threading.Thread(
            target=self._loop, name="serving-batcher", daemon=True
        )
        self._thread.start()

    # -- client side (HTTP handler threads) ---------------------------------

    def submit_many(self, arrays: Sequence[np.ndarray],
                    nbest: int = 1) -> List[List[dict]]:
        """Enqueue instances and block until their results arrive."""
        entries = [_Entry(np.asarray(a), int(nbest)) for a in arrays]
        with self._cond:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._queue.extend(entries)
            self._cond.notify_all()
        for e in entries:
            e.event.wait()
            if e.error is not None:
                raise e.error
        return [e.result for e in entries]

    # -- dispatcher -----------------------------------------------------------

    def _take_batch(self) -> List[_Entry]:
        import time

        with self._cond:
            while not self._queue and not self._closed:
                self._cond.wait()
            if self._closed and not self._queue:
                return []
            deadline = time.monotonic() + self.window
            while (
                len(self._queue) < self.max_items
                and not self._closed
            ):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cond.wait(timeout=remaining)
            batch, self._queue = self._queue, []
            return batch

    def _dispatch(self, batch: List[_Entry]) -> None:
        try:
            results = self.model.translate_many(
                [e.array for e in batch],
                nbest=max(e.nbest for e in batch),
            )
        except BaseException as exc:
            self.batches_dispatched += 1  # the failed attempt
            if len(batch) > 1:
                # FAULT ISOLATION: one bad co-batched instance (no fitting
                # bucket, nbest > exported beam, ...) must not fail other
                # tenants' valid requests — retry each instance alone so
                # only the offender errors (batched == unbatched outcomes)
                for e in batch:
                    self._dispatch([e])
                return
            self.items_dispatched += 1
            batch[0].error = exc
            return
        self.batches_dispatched += 1
        self.items_dispatched += len(batch)
        for e, hyps in zip(batch, results):
            e.result = hyps[: e.nbest]

    def _loop(self) -> None:
        while True:
            batch = self._take_batch()
            if not batch:
                return
            try:
                self._dispatch(batch)
            finally:
                for e in batch:
                    e.event.set()

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._thread.join(timeout=10)
