"""Inactivity-gap sessionization (engine extension per SURVEY.md §2.9
— the event-level complement to ``session_window``'s aggregate form).

One definition shared by every sessionizing query (``sessionize_events``,
``sessionize_session_stats``, ``path_common_triples``,
``join_interval_overlap``, and the streaming funnel): ``lag()`` marks a
session start wherever the gap to the previous event exceeds
``gap_sec`` (STRICTLY greater — a gap of exactly ``gap_sec`` stays in
the session; the boundary is cross-engine fuzzed in
tests/test_join_fuzz.py), a running sum numbers sessions per key.
Session ids are per-key sequence numbers, so the global id is
``(key, session_seq)`` — no cross-partition coordination at 100 TB,
and every consumer rides the same single (key)-partitioned sort.

Gap arithmetic runs on ``cast(ts as long)`` = epoch SECONDS
(truncating), matching the DuckDB oracles' ``epoch()`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_seq(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_sec: int = 1800,
    tiebreak: tuple[str, ...] = ("event_id",),
    out_col: str = "session_seq",
) -> DataFrame:
    """Add ``out_col`` (BIGINT, 1-based per ``key``): the session
    number under the ``gap_sec`` inactivity rule. ``tiebreak`` columns
    order equal-ts events deterministically (both engines must slice
    sessions identically for cross-engine hashing)."""
    w = Window.partitionBy(key).orderBy(ts, *tiebreak)
    ts_sec = F.col(ts).cast("long")
    gap = ts_sec - F.lag(ts_sec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
