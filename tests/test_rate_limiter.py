"""AdaptiveRateLimiter semantics (reference ST7 + its test strategy:
wall-clock floor assertions, test_enhanced_parallel_client.py:171-174,
and the adaptive down/up factors, SURVEY.md §6)."""

from __future__ import annotations

import time

from wiki_data_pipeline_spark.streaming.rate_limiter import AdaptiveRateLimiter


class FakeClock:
    def __init__(self) -> None:
        self.t = 1000.0

    def __call__(self) -> float:
        return self.t


def test_backoff_after_three_429s_no_crash():
    """Reference bug §2.11: _adjust_rate crashed on an unset logger —
    ours must adjust cleanly: ×0.8 after 3 consecutive 429s."""
    rl = AdaptiveRateLimiter(qps_limit=2.0)
    for _ in range(3):
        rl.record_429()
    assert abs(rl.current_qps - 1.6) < 1e-9


def test_backoff_floor():
    rl = AdaptiveRateLimiter(qps_limit=2.0, min_qps=0.5)
    for _ in range(100):
        rl.record_429()
    assert rl.current_qps >= 0.5


def test_success_resets_consecutive_counter():
    rl = AdaptiveRateLimiter(qps_limit=2.0)
    rl.record_429()
    rl.record_429()
    rl.record_success()
    rl.record_429()
    assert rl.current_qps == 2.0  # never reached 3 consecutive


def test_recovery_toward_cap():
    clock = FakeClock()
    rl = AdaptiveRateLimiter(qps_limit=2.0, recovery_after=300.0, time_fn=clock)
    for _ in range(3):
        rl.record_429()
    assert rl.current_qps < 2.0
    clock.t += 301.0
    rl.record_request()
    assert abs(rl.current_qps - 1.6 * 1.1) < 1e-9
    # never exceeds the configured cap
    for _ in range(100):
        clock.t += 301.0
        rl.record_request()
    assert rl.current_qps <= 2.0


def test_burst_cap_forces_wait():
    clock = FakeClock()
    rl = AdaptiveRateLimiter(qps_limit=100.0, burst_limit=5, time_fn=clock)
    for _ in range(5):
        rl.record_request()
    assert rl.should_wait() > 0.0
    clock.t += 1.5
    assert rl.should_wait() == 0.0


def test_wall_clock_floor():
    """3 acquires at 1 QPS must take ≥ ~2 s (the reference asserts
    3 articles ≥ 3×0.8 s at qps=1; same tolerance factor)."""
    rl = AdaptiveRateLimiter(qps_limit=1.0, burst_limit=1)
    t0 = time.monotonic()
    for _ in range(3):
        rl.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 2 * 0.8
