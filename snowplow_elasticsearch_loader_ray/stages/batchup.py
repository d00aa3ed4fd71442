"""Size+time micro-batching for unbounded payload sources (A1).

The reference accumulates parse results into super-batches that flush
on EITHER a byte budget or an age timeout —
``BatchUp.withTimeout(env.batching.maxBytes, env.batching.maxDelay)``
(``Processing.scala:80``, combiner at ``:274-298``; defaults 10 MB /
1 second, ``reference.conf:27-30``). Ray Data's block/batch sizing
covers the size half for bounded corpora; this module supplies the
missing TIME half for the streaming-ingest surface: a micro-batcher a
tailing source drives, flushing a partial batch once its oldest item
exceeds ``max_delay_s`` even when the byte budget isn't met.

Design notes (pull model, not fs2 concurrency): the batcher is driven
by the source loop. ``add`` returns a flushed batch when the new item
trips the byte budget; ``poll`` returns one when the clock trips the
age timeout (sources call it between reads / on idle ticks);
``close`` flushes the remainder. The clock is injectable so tests pin
the timeout semantics deterministically — no sleeps.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Iterator


@dataclass
class Batch:
    items: list[Any]
    n_bytes: int
    opened_at: float
    reason: str = ""                       # "size" | "delay" | "close"


@dataclass
class BatchUp:
    """Accumulate (item, n_bytes) pairs; flush on size OR age.

    Mirrors the reference semantics:
    - a single item larger than ``max_bytes`` still flushes as its own
      batch (the budget caps accumulation, it never drops items);
    - the age clock starts when the FIRST item of a batch arrives
      (an empty batcher never times out — no empty flushes);
    - flush order is arrival order.
    """

    max_bytes: int = 10_000_000
    max_delay_s: float = 1.0
    clock: Callable[[], float] = time.monotonic
    _items: list[Any] = field(default_factory=list)
    _bytes: int = 0
    _opened_at: float = 0.0

    def _take(self, reason: str) -> Batch:
        b = Batch(self._items, self._bytes, self._opened_at, reason)
        self._items, self._bytes = [], 0
        return b

    def add(self, item: Any, n_bytes: int) -> Batch | None:
        """Add one item; returns a flushed batch if the size budget
        tripped (the flushed batch always INCLUDES the new item —
        the reference combines then checks size)."""
        if not self._items:
            self._opened_at = self.clock()
        self._items.append(item)
        self._bytes += n_bytes
        if self._bytes >= self.max_bytes:
            return self._take("size")
        return None

    def poll(self) -> Batch | None:
        """Flush the open batch if its first item is older than
        ``max_delay_s``; otherwise None. Call between source reads."""
        if self._items and self.clock() - self._opened_at >= self.max_delay_s:
            return self._take("delay")
        return None

    def close(self) -> Batch | None:
        """Flush whatever remains (end of stream)."""
        return self._take("close") if self._items else None

    def feed(self, source: Iterable[tuple[Any, int]],
             timely: bool = False) -> Iterator[Batch]:
        """Drive the batcher over a (item, n_bytes) iterable, yielding
        flushed batches; polls the age timeout between items and
        flushes the tail on exhaustion.

        ``timely=False`` (default): pull-driven — the age timeout is
        only observed when the next item arrives or the source ends.
        Deterministic (no threads), right for bounded replays and
        scripted-clock tests.

        ``timely=True``: the reference's actual ``maxDelay`` contract
        for a TAILING source — a partial batch flushes within
        ``max_delay_s`` of its first item even while the source blocks.
        The source is drained by a reader thread into a queue and the
        age timeout is enforced with a timed queue read, so this mode
        requires a real-time ``clock`` (the timeout and the clock must
        share a time base; scripted clocks pair with the pull mode)."""
        if not timely:
            for item, n in source:
                b = self.poll()
                if b is not None:
                    yield b
                b = self.add(item, n)
                if b is not None:
                    yield b
            b = self.close()
            if b is not None:
                yield b
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=1024)
        _END = object()

        def drain():
            try:
                for rec in source:
                    q.put(rec)
            finally:
                q.put(_END)

        t = threading.Thread(target=drain, daemon=True,
                             name="batchup-feed")
        t.start()
        done = False
        while not done:
            if self._items:
                remaining = self.max_delay_s - (self.clock()
                                                - self._opened_at)
                if remaining <= 0:
                    yield self._take("delay")
                    continue
                try:
                    rec = q.get(timeout=remaining)
                except queue.Empty:
                    continue                  # re-check the age budget
            else:
                rec = q.get()                 # empty batcher never ages
            if rec is _END:
                done = True
                continue
            item, n = rec
            b = self.add(item, n)
            if b is not None:
                yield b
        b = self.close()
        if b is not None:
            yield b
