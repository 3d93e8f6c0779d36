"""Adaptive QPS rate limiter (reference ST7: AdaptiveRateLimiter,
src/enhanced_production_mediawiki_client.py:32-94; config
config/config_enhanced_parallel.yaml:24-28).

Semantics reproduced:
- sliding window (default 60 s) of request timestamps;
- burst cap (default 5 in-flight within the last second);
- QPS cap (default 2.0) over the window;
- adaptive throttle: ≥3 consecutive 429s → qps ×0.8 (floor 0.5);
- recovery: after 300 s without a 429, qps ×1.1 back toward the cap.

Fixes reference bug §2.11: ``_adjust_rate`` referenced an unset
``self.logger`` → AttributeError after 3 consecutive 429s; here the
adjustment path has no such dependency.

In the engine this is a driver-side gate (foreachBatch admission) or a
per-partition budget inside enrichment closures: each partition gets
``qps / num_partitions`` (operators/enrichment.py). A clock is
injectable so tests don't sleep."""

from __future__ import annotations

import threading
import time
from collections import deque
from collections.abc import Callable


class AdaptiveRateLimiter:
    def __init__(
        self,
        qps_limit: float = 2.0,
        burst_limit: int = 5,
        window_size: float = 60.0,
        min_qps: float = 0.5,
        backoff_factor: float = 0.8,
        recovery_factor: float = 1.1,
        recovery_after: float = 300.0,
        consecutive_429_threshold: int = 3,
        time_fn: Callable[[], float] = time.monotonic,
    ) -> None:
        self.configured_qps = qps_limit
        self.current_qps = qps_limit
        self.burst_limit = burst_limit
        self.window_size = window_size
        self.min_qps = min_qps
        self.backoff_factor = backoff_factor
        self.recovery_factor = recovery_factor
        self.recovery_after = recovery_after
        self.consecutive_429_threshold = consecutive_429_threshold
        self._time = time_fn
        self._lock = threading.Lock()
        self._requests: deque[float] = deque()
        self._consecutive_429 = 0
        self._last_429: float | None = None

    def _prune(self, now: float) -> None:
        cutoff = now - self.window_size
        while self._requests and self._requests[0] < cutoff:
            self._requests.popleft()

    def should_wait(self) -> float:
        """Seconds the caller must wait before issuing the next request
        (0.0 = go now). Reference should_wait :43-64."""
        with self._lock:
            now = self._time()
            self._prune(now)
            # burst: no more than burst_limit requests in the last second
            recent = [t for t in self._requests if t > now - 1.0]
            if len(recent) >= self.burst_limit:
                return max(0.0, recent[0] + 1.0 - now)
            # qps over the window
            allowed = self.current_qps * self.window_size
            if len(self._requests) >= allowed and self._requests:
                return max(0.0, self._requests[0] + self.window_size - now)
            # steady-state pacing: at most current_qps per second
            if recent and len(recent) >= self.current_qps:
                return max(0.0, recent[0] + 1.0 / self.current_qps - now)
            return 0.0

    def acquire(self) -> float:
        """Block (sleep) until a slot is free; returns total waited
        seconds. Convenience wrapper used by enrichment closures."""
        waited = 0.0
        while True:
            w = self.should_wait()
            if w <= 0:
                break
            time.sleep(w)
            waited += w
        self.record_request()
        return waited

    def record_request(self) -> None:
        """Reference record_request :66-73."""
        with self._lock:
            now = self._time()
            self._requests.append(now)
            self._prune(now)
            self._maybe_recover(now)

    def record_429(self) -> None:
        """A throttled response: count toward adaptive backoff."""
        with self._lock:
            now = self._time()
            self._consecutive_429 += 1
            self._last_429 = now
            if self._consecutive_429 >= self.consecutive_429_threshold:
                # reference _adjust_rate :75-84 (sans the logger crash)
                self.current_qps = max(
                    self.min_qps, self.current_qps * self.backoff_factor
                )
                self._consecutive_429 = 0

    def record_success(self) -> None:
        with self._lock:
            self._consecutive_429 = 0
            self._maybe_recover(self._time())

    def _maybe_recover(self, now: float) -> None:
        """Reference recovery :86-94: ×1.1 toward cap after a clean
        recovery window."""
        if (
            self.current_qps < self.configured_qps
            and (self._last_429 is None or now - self._last_429 >= self.recovery_after)
        ):
            self.current_qps = min(
                self.configured_qps, self.current_qps * self.recovery_factor
            )

    @property
    def stats(self) -> dict[str, float]:
        with self._lock:
            return {
                "current_qps": self.current_qps,
                "configured_qps": self.configured_qps,
                "window_requests": float(len(self._requests)),
            }
