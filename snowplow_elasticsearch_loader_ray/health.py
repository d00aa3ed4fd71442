"""Health / liveness monitoring (H1).

The reference exposes an HTTP health probe that turns unhealthy when a
runtime service reports a failure (``RuntimeService.scala`` — BadSink /
ElasticsearchSink; wired via ``Environment.scala:53-56``) or when a
sink operation has been in flight longer than the configured
``unhealthyLatency`` (2 minutes, ``reference.conf:49-52``). There is no
HTTP server in this engine; the same state machine backs a ``healthy()``
predicate the serving layer (and the bench harness) can poll, plus a
``status()`` dict for the metrics rollup.

Semantics mirrored:
- a service failure marks the probe unhealthy until the SAME service
  reports a success (AppHealth's become-healthy-again rule);
- an in-flight operation older than ``unhealthy_latency_s`` makes the
  probe unhealthy for as long as it is still running;
- the clock is injectable for deterministic tests.
"""

from __future__ import annotations

import itertools
import threading
import time
from typing import Callable


class HealthMonitor:
    def __init__(self, unhealthy_latency_s: float = 120.0,
                 clock: Callable[[], float] = time.monotonic):
        self.unhealthy_latency_s = unhealthy_latency_s
        self.clock = clock
        self._lock = threading.Lock()
        self._failed: dict[str, str] = {}          # service -> last error
        self._inflight: dict[int, tuple[str, float]] = {}
        self._op_ids = itertools.count()
        self._counts = {"success": 0, "failure": 0}

    # -- operation tracking (the unhealthyLatency rule) ------------------
    def begin(self, service: str) -> int:
        op = next(self._op_ids)
        with self._lock:
            self._inflight[op] = (service, self.clock())
        return op

    def end(self, op: int, ok: bool = True, error: str = "") -> None:
        with self._lock:
            service, _t0 = self._inflight.pop(op, ("?", 0.0))
            if ok:
                self._failed.pop(service, None)
                self._counts["success"] += 1
            else:
                self._failed[service] = error or "failure"
                self._counts["failure"] += 1

    # -- direct service reports (the RuntimeService channel) -------------
    def report_failure(self, service: str, error: str = "") -> None:
        with self._lock:
            self._failed[service] = error or "failure"
            self._counts["failure"] += 1

    def report_success(self, service: str) -> None:
        with self._lock:
            self._failed.pop(service, None)
            self._counts["success"] += 1

    # -- the probe --------------------------------------------------------
    def healthy(self) -> bool:
        now = self.clock()
        with self._lock:
            if self._failed:
                return False
            return all(now - t0 < self.unhealthy_latency_s
                       for _svc, t0 in self._inflight.values())

    def status(self) -> dict:
        now = self.clock()
        with self._lock:
            ok = not self._failed and all(
                now - t0 < self.unhealthy_latency_s
                for _s, t0 in self._inflight.values())
            return {
                "healthy": ok,
                "failed_services": dict(self._failed),
                "inflight": len(self._inflight),
                "oldest_inflight_s": max(
                    (now - t0 for _s, t0 in self._inflight.values()),
                    default=0.0),
                **self._counts,
            }
