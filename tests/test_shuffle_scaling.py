"""Shuffle-volume scaling sample (r9): pin the mechanism and the
linearity bound for representative shuffle-bearing queries.

tools/shuffle_audit.py measures, registry-wide, how each query's
shuffle-write bytes grow when the data grows 10x — the axis neither
the plan manifest (same Exchange count, any byte volume) nor the
wall-clock gates (small-SF shuffles hide in page cache) can see. This
test keeps a 4-query sample wired into the default suite at
sf0.001 -> sf0.01 (10x rows), asserting:

- growth ≤ 20x (linear in data with 2x margin) for every sample —
  a quadratic shuffle (self-join blowup, lost partial aggregation)
  reads ~100x and fails loudly;
- the mechanism actually measures: the groupBy-heavy queries report
  nonzero shuffle bytes at both scales.

Sample spans the shuffle families: hash-groupBy dedup (map-side
partial agg), banded LSH signatures (shuffle on (band, sig)),
fact-side star aggregation (bounded group keys -> near-constant
shuffle, the map-side-combine claim), and session windowing (shuffle
on user, growth tracks events).

Needs its own JVM (spark.ui.enabled is a static conf, off in the
shared session) -> subprocess child, the tests/_task_retry_child.py
pattern.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
BIG = "/root/testdata/sf0.01"

SAMPLE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "q9_product_profit",
    "window_session_30m",
]
GROWTH_CEILING = 20.0  # 10x rows; 2x margin on linear


@pytest.fixture(scope="module")
def shuffle_bytes() -> dict[str, dict[str, int]]:
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "_shuffle_child.py"),
         SMALL, BIG, *SAMPLE],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, proc.stdout[-3000:]
    return json.loads(line[-1][len("RESULT "):])


@pytest.mark.parametrize("name", SAMPLE)
def test_shuffle_growth_is_at_most_linear(shuffle_bytes, name):
    b = shuffle_bytes[name]
    if b["small"] == 0:
        # zero-shuffle at fixture SF: the 10x run must stay tiny too
        # (a broadcast plan growing a shuffle would show here)
        assert b["big"] < 1 * 1024 * 1024, b
        return
    growth = b["big"] / b["small"]
    assert growth <= GROWTH_CEILING, (
        f"{name}: shuffle bytes grew {growth:.1f}x for 10x rows "
        f"({b['small']} -> {b['big']}) — superlinear intermediate "
        f"volume is a 100 TB scale-killer"
    )


def test_mechanism_measures_nonzero_shuffles(shuffle_bytes):
    grouped = ["dedup_exact", "dedup_minhash_lsh"]
    for name in grouped:
        assert shuffle_bytes[name]["big"] > 0, (
            f"{name} reported zero shuffle bytes at sf0.01 — the REST "
            f"stage-metrics diff is not measuring"
        )
