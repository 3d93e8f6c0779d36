"""Cross-engine fuzzing for event-time window binning — the exact
expressions the registered queries use (`window_tumbling_hourly`,
`window_sliding_1h_30m`, `window_session_30m` in
plans/streaming_ops.py and their streaming twins in streaming/jobs.py):
Spark's native ``window()`` / ``session_window()`` vs the DuckDB
``time_bucket`` / gaps-and-islands mirrors the oracles are built from.

The fixture events are uniform; here seeded corpora land timestamps
EXACTLY on hour / half-hour boundaries and ±1 second / ±1 microsecond
around them (the off-by-one surface: Spark windows are [start, end)
left-closed, time_bucket floors — a boundary event must bin forward in
both), duplicate timestamps, and session gaps drawn from
{1799, 1800, 1801} seconds so both sides of the boundary rule occur:
an event at EXACTLY last+gap MERGES into the running session (Spark
session_window extends while ``ts <= last + gap``); only a strictly
greater gap opens a new session. Pinned by
``test_session_window_pinned_boundary`` and the `window_session_30m`
oracle's strict ``>`` new-session flag.

Alignment caveat pinned by `test_bucket_origin_alignment_assumption`:
time_bucket's origin is 2000-01-01, Spark window's is 1970-01-01 —
identical binning ONLY for widths dividing the 946684800-second span
(true for every production width: 30 min, 1 h, 1 day). A 7-minute
width would diverge; the assumption is asserted, not assumed.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

SEED = 0x3140
BASE = pd.Timestamp("2024-01-01 00:00:00")
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# offsets (seconds, microseconds) hugging the 30-min / 1-h boundaries
_BOUNDARY_S = [0, 1, 1799, 1800, 1801, 3599, 3600, 3601, 5400, 7200]
_JITTER_US = [0, 0, 1, -1, 999999]


def _gen_events(rng: random.Random, n: int = 300) -> pd.DataFrame:
    rows = []
    for i in range(n):
        s = rng.choice(_BOUNDARY_S) + 3600 * rng.randint(0, 5)
        us = rng.choice(_JITTER_US)
        ts = BASE + pd.Timedelta(seconds=s, microseconds=us)
        if ts < BASE:  # keep the domain non-negative relative to BASE
            ts = BASE
        rows.append((i, ts, rng.randint(1, 99)))
    # forced exact duplicates on a boundary
    rows.append((n, BASE + pd.Timedelta(hours=2), 7))
    rows.append((n + 1, BASE + pd.Timedelta(hours=2), 7))
    return pd.DataFrame(rows, columns=["event_id", "ts", "cents"])


def _duck(pdf: pd.DataFrame, sql: str):
    con = duckdb.connect()
    con.register("events", pdf)
    rows = con.execute(sql).fetchall()
    con.close()
    return sorted(rows)


def _spark_df(spark, pdf):
    return spark.createDataFrame(
        pdf, "event_id BIGINT, ts TIMESTAMP, cents BIGINT"
    )


def test_tumbling_window_fuzz_vs_duckdb(spark):
    rng = random.Random(SEED)
    pdf = _gen_events(rng)
    for width_spark, width_duck in [
        ("1 hour", "1 hour"),
        ("30 minutes", "30 minutes"),
    ]:
        got = sorted(
            tuple(r)
            for r in _spark_df(spark, pdf)
            .groupBy(F.window("ts", width_spark).alias("w"))
            .agg(F.count("*").alias("n"), F.sum("cents").alias("c"))
            .select(
                F.date_format("w.start", TS_FMT_SPARK).alias("ws"),
                "n",
                "c",
            )
            .collect()
        )
        want = _duck(
            pdf,
            f"""
            SELECT strftime(time_bucket(INTERVAL '{width_duck}', ts),
                            '{TS_FMT_DUCK}') AS ws,
              count(*) AS n, sum(cents) AS c
            FROM events GROUP BY 1
            """,
        )
        assert got == want, width_spark


def test_sliding_window_fuzz_vs_duckdb(spark):
    """1-hour length / 30-minute slide: every event in exactly 2
    windows; the mirror assigns each event to its 30-min bucket and
    that bucket minus 30 min."""
    rng = random.Random(SEED + 1)
    pdf = _gen_events(rng)
    sdf = _spark_df(spark, pdf)
    assigned = sdf.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("w")
    ).agg(F.count("*").alias("n"), F.sum("cents").alias("c"))
    got = sorted(
        tuple(r)
        for r in assigned.select(
            F.date_format("w.start", TS_FMT_SPARK).alias("ws"), "n", "c"
        ).collect()
    )
    want = _duck(
        pdf,
        f"""
        WITH a AS (
          SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, cents
          FROM events
          UNION ALL
          SELECT time_bucket(INTERVAL '30 minutes', ts)
                 - INTERVAL '30 minutes', cents
          FROM events
        )
        SELECT strftime(ws, '{TS_FMT_DUCK}') AS ws,
          count(*) AS n, sum(cents) AS c
        FROM a GROUP BY 1
        """,
    )
    assert got == want
    # conservation: each event lands in exactly length/slide = 2 windows
    n_assignments = sum(n for _, n, _ in got)
    assert n_assignments == 2 * len(pdf)


def test_session_window_fuzz_vs_duckdb(spark):
    """Native session_window(30 min) vs gaps-and-islands: gap values
    straddle the boundary — 1800 MERGES (sessions merge when the next
    start <= current end; pinned 1800→1 session, 1801→2 below via the
    generator), so the mirror's new-session flag must be STRICT >.
    This fuzz found the production oracle using >= — a latent boundary
    bug invisible to the fixture's microsecond-grained timestamps,
    fixed in plans/streaming_ops.py window_session_30m. Also covers
    zero gaps (equal-ts duplicates) and multi-user interleaving."""
    rng = random.Random(SEED + 2)
    rows = []
    eid = 0
    for user in range(12):
        t = BASE + pd.Timedelta(minutes=rng.randint(0, 120))
        for _ in range(rng.randint(0, 12)):
            rows.append((eid, user, t, rng.randint(1, 99)))
            eid += 1
            t = t + pd.Timedelta(
                seconds=rng.choice([0, 1, 60, 1799, 1800, 1801, 7200])
            )
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "cents"])
    assert (
        pdf.groupby("user_id")["ts"].apply(
            lambda s: s.diff().dt.total_seconds().eq(1800).any()
        )
    ).any()  # the exact-boundary gap actually occurs
    sdf = spark.createDataFrame(
        pdf, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, cents BIGINT"
    )
    got = sorted(
        tuple(r)
        for r in sdf.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"), F.sum("cents").alias("c"))
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT_SPARK).alias("ss"),
            F.date_format("w.end", TS_FMT_SPARK).alias("se"),
            "n",
            "c",
        )
        .collect()
    )
    want = _duck(
        pdf,
        f"""
        WITH flagged AS (
          SELECT user_id, ts, cents, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, ts, cents,
            sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id,
          strftime(min(ts), '{TS_FMT_DUCK}') AS ss,
          strftime(max(ts) + INTERVAL '30 minutes', '{TS_FMT_DUCK}') AS se,
          count(*) AS n, sum(cents) AS c
        FROM s GROUP BY user_id, sid
        """,
    )
    assert got == want


def test_session_window_pinned_boundary(spark):
    """Deterministic micro-cases for the exact rule the fuzz mirror
    encodes: gap of exactly the 30-min window MERGES (1 session);
    one second more SPLITS (2 sessions)."""
    for gap_s, n_sessions in [(1799, 1), (1800, 1), (1801, 2)]:
        pdf = pd.DataFrame(
            [(0, BASE), (1, BASE + pd.Timedelta(seconds=gap_s))],
            columns=["id", "ts"],
        )
        got = (
            spark.createDataFrame(pdf, "id BIGINT, ts TIMESTAMP")
            .groupBy(F.session_window("ts", "30 minutes"))
            .count()
            .count()
        )
        assert got == n_sessions, gap_s


def test_bucket_origin_alignment_assumption():
    """The oracles' time_bucket mirror is valid ONLY because every
    production width divides time_bucket's 2000-01-01 origin offset
    from Spark's 1970-01-01 epoch (946684800 s). Assert it for the
    widths in use — and that the guard actually discriminates (a
    7-minute width would NOT pass)."""
    origin_gap_s = 946_684_800
    for width_s in (1800, 3600, 86400):
        assert origin_gap_s % width_s == 0
    assert origin_gap_s % 420 != 0
