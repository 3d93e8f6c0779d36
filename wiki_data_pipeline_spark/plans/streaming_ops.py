"""Incremental / event-time semantics as batch-checkable queries
(SURVEY.md §2.9, Phase 3).

The reference is a resumable batch job (checkpoint/queue JSON files);
its incremental machinery maps to high-watermark predicates and
event-time windows here, and to real Structured Streaming jobs in
``wiki_data_pipeline_spark/streaming/`` (exercised by tests — streaming
itself can't be DuckDB-oracled, but these batch twins share the same
expressions).

Timestamps are emitted as formatted strings: Spark collects
TimestampType via the driver's local zone while DuckDB returns naive
datetimes — strings sidestep the mismatch (session tz pinned to UTC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wiki_data_pipeline_spark.io import read_table
from wiki_data_pipeline_spark.plans.registry import query
from wiki_data_pipeline_spark.plans.star_schema import _davg_sql, _dsum_sql, dsum

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
TS_US_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_US_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# ---------------------------------------------------------------------------
# ST2 — checkpoint/resume as a high-watermark predicate (batch form).
# ---------------------------------------------------------------------------


@query(
    "st2_highwatermark_resume",
    oracle=f"""
    SELECT
      event_type,
      count(*) AS n_events,
      {_dsum_sql('value', 'total_value')},
      CAST(min(event_id) AS BIGINT) AS first_event_id,
      CAST(max(event_id) AS BIGINT) AS last_event_id
    FROM events
    WHERE event_id > 500
    GROUP BY event_type
    """,
)
def st2_highwatermark_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-resume as a high-watermark scan (reference ST2:
    can_resume/get_resume_info, src/checkpoint_manager.py:96-108 —
    'skip already-processed rows'). The imperative index skip becomes
    ``WHERE seq > last_committed`` — a pushed-down range predicate, so
    resume cost is proportional to NEW data only (partition pruning on
    a date/seq-partitioned layout at scale)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") > 500)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value"), "total_value"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
            F.max("event_id").cast("bigint").alias("last_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# ST2 companion — incremental aggregate maintenance (merge partials).
# ---------------------------------------------------------------------------


@query(
    "incr_agg_merge",
    oracle=f"""
    SELECT event_type,
      count(*) AS n_events,
      {_dsum_sql('value', 'total_value')},
      {_davg_sql('value', 'avg_value')}
    FROM events
    GROUP BY event_type
    """,
)
def incr_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate (materialized-view) maintenance — the
    scale companion to ST2's high-watermark resume: instead of
    re-aggregating the whole corpus each run, merge the PERSISTED
    per-group partials (count, sum) of already-processed data
    (event_id ≤ 500, standing in for the stored MV) with the partials
    of the new slice (event_id > 500), then finalize. Works because
    count and DECIMAL sum are algebraic/commutative-monoid aggregates
    — and the decimal representation is what makes the merge EXACT:
    partial DOUBLE sums would not re-associate bitwise, so the
    refreshed MV would drift from a full recompute. The oracle IS the
    full recompute — the hash match proves merge ≡ recompute. At
    100 TB this turns a daily full-corpus aggregation into
    O(new data) + O(|groups|)."""
    events = read_table(spark, sf_dir, "events")

    def partials(df: DataFrame) -> DataFrame:
        # Keep the sum IN decimal — the mergeable representation.
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("s"),
        )

    state = partials(events.filter(F.col("event_id") <= 500))
    delta = partials(events.filter(F.col("event_id") > 500))
    return (
        state.unionAll(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("s").alias("s"))
        .select(
            "event_type",
            "n_events",
            F.col("s").cast("double").alias("total_value"),
            (F.col("s").cast("double") / F.col("n_events")).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# ST4 — dead-letter routing.
# ---------------------------------------------------------------------------

_DLQ_MIN_CHARS = 100


@query(
    "st4_dead_letter_split",
    oracle=f"""
    SELECT
      doc_id,
      CASE WHEN n_chars < {_DLQ_MIN_CHARS} THEN 'dead_letter' ELSE 'ok' END AS route,
      CASE WHEN n_chars < {_DLQ_MIN_CHARS}
           THEN 'content_too_short: ' || n_chars ELSE NULL END AS error
    FROM documents
    """,
)
def st4_dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing (reference ST4 mark_failed,
    src/queue_manager.py:80-84 — which DROPS the error reason, a bug
    per SURVEY.md §2.11; we keep it). One pass tags every row with its
    route + error; sinks filter by route — the split is two filters on
    one cached scan, not two scans."""
    docs = read_table(spark, sf_dir, "documents")
    bad = F.col("n_chars") < _DLQ_MIN_CHARS
    return docs.select(
        "doc_id",
        F.when(bad, F.lit("dead_letter")).otherwise(F.lit("ok")).alias("route"),
        F.when(
            bad, F.concat(F.lit("content_too_short: "), F.col("n_chars").cast("string"))
        ).alias("error"),
    )


# ---------------------------------------------------------------------------
# A6 — duration aggregate over event time.
# ---------------------------------------------------------------------------


@query(
    "a6_event_span",
    oracle=f"""
    SELECT
      strftime(min(ts), '{TS_US_DUCK}') AS first_ts,
      strftime(max(ts), '{TS_US_DUCK}') AS last_ts,
      CAST(floor(date_part('epoch', max(ts))) - floor(date_part('epoch', min(ts)))
           AS BIGINT) AS span_seconds
    FROM events
    """,
)
def a6_event_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Processing-duration aggregate (reference A6,
    src/checkpoint_manager.py:123-138: last_updated − start_time).
    min/max + epoch diff — single global aggregate."""
    events = read_table(spark, sf_dir, "events")
    return events.agg(
        F.date_format(F.min("ts"), TS_US_SPARK).alias("first_ts"),
        F.date_format(F.max("ts"), TS_US_SPARK).alias("last_ts"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("bigint")
        .alias("span_seconds"),
    )


# ---------------------------------------------------------------------------
# Event-time windows (tumbling / sliding / session) — batch twins of the
# streaming jobs in streaming/jobs.py.
# ---------------------------------------------------------------------------


@query(
    "window_tumbling_hourly",
    oracle=f"""
    SELECT
      strftime(time_bucket(INTERVAL '1 hour', ts), '{TS_FMT_DUCK}') AS window_start,
      event_type,
      count(*) AS n_events,
      {_dsum_sql('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window × event_type (SURVEY.md §2.9:
    the engine adds event-time windows the reference lacks). Same
    ``window()`` expression runs under Structured Streaming with a
    watermark (streaming/jobs.py); here the batch twin is
    oracle-checked against time_bucket."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "total_value"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "window_sliding_1h_30m",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
      FROM events
    )
    SELECT
      strftime(window_start, '{TS_FMT_DUCK}') AS window_start,
      count(*) AS n_events,
      {_dsum_sql('value', 'total_value')}
    FROM assigned
    GROUP BY 1
    """,
)
def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute slide (engine extension
    per SURVEY.md §2.9 — the reference has no event-time windows; added
    alongside ST1's micro-batch admission). Each event lands
    in exactly 2 windows; Spark's window() generates the assignment,
    the oracle mirrors it with two bucket offsets. Sliding windows
    multiply data by length/slide — at scale prefer tumbling + rollup
    unless the overlap is semantically required."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "total_value"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "window_session_30m",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE user_id % 7 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT
      user_id,
      strftime(min(ts), '{TS_US_DUCK}') AS session_start,
      strftime(max(ts) + INTERVAL '30 minutes', '{TS_US_DUCK}') AS session_end,
      count(*) AS n_events,
      {_dsum_sql('value', 'total_value')}
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: 30-minute inactivity gap per user (engine
    extension per SURVEY.md §2.9 — no event-time in the reference).
    Spark side uses the native ``session_window`` (merges in the
    aggregate, streaming-capable with watermark); the oracle rebuilds
    sessions via gaps-and-islands. Session end = last event + gap
    (Spark semantics, pinned by tests/test_window_fuzz.py micro-cases:
    an event at exactly last+gap MERGES — sessions merge when the next
    start is <= the current end — so the oracle's new-session flag is
    STRICT ``>``; the ``>=`` this oracle originally used was a latent
    boundary bug the fixture's microsecond-grained timestamps never
    exposed, found by the exact-1800s fuzz). Matches the strict rule
    operators/sessions.py uses. A deterministic
    user_id % 7 filter bounds the output for cross-engine hashing;
    sessions merge per user, so dropping whole users leaves the
    remaining sessions unchanged."""
    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "total_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_US_SPARK).alias("session_start"),
            F.date_format(F.col("w.end"), TS_US_SPARK).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# props JSON extraction (events.props exercises from_json).
# ---------------------------------------------------------------------------


@query(
    "st_props_json_extract",
    oracle="""
    SELECT
      CASE WHEN props IS NOT NULL AND json_valid(props)
           THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
      count(*) AS n,
      CAST(min(event_id) AS BIGINT) AS min_event_id
    FROM events
    GROUP BY 1
    """,
)
def st_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON payload with
    an explicit schema (reference boundary: json.loads at ingest,
    src/azure_manager.py:133 → from_json with a fixed StructType —
    schema-on-read made explicit, SURVEY.md §1.3). from_json is
    tolerant by design (malformed/non-object → NULL struct → NULL k,
    still counted); the oracle needs an explicit json_valid guard +
    TRY_CAST to match, since DuckDB's json_extract/CAST throw on the
    garbage rows a corpus-scale props column contains (adversarial
    fixture finding)."""
    events = read_table(spark, sf_dir, "events")
    parsed = events.select(
        F.from_json("props", "k BIGINT").alias("p"), F.col("event_id")
    )
    return parsed.groupBy(F.col("p.k").alias("k")).agg(
        F.count("*").alias("n"),
        F.min("event_id").cast("bigint").alias("min_event_id"),
    )


# ---------------------------------------------------------------------------
# Hypertable-style hierarchical rollup: day-grain aggregates computed
# FROM the hour-grain aggregates (continuous-aggregate pattern).
# ---------------------------------------------------------------------------


@query(
    "rollup_hour_to_day",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
      CAST(sum(n) AS BIGINT) AS n_events,
      CAST(sum(v) AS DOUBLE) AS total_value,
      count(*) AS n_hours_active
    FROM hourly GROUP BY 1, 2
    """,
)
def rollup_hour_to_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup (engine extension,
    SURVEY.md §2.5/§2.9 — the time-series materialized-rollup pattern):
    day-grain metrics re-aggregated FROM the hour-grain aggregate, not
    from raw rows. At 100 TB the hourly aggregate is the materialized
    continuous view that each micro-batch upserts (foreachBatch MERGE);
    coarser grains read ~24× fewer rows than raw re-scans, and
    decomposable aggregates (sum/count) roll up exactly. The hour→day
    re-aggregation is its own tiny shuffle — cardinality |days×types|."""
    events = read_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("v"),
    )
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
        F.count("*").alias("n_hours_active"),
    )


# ---------------------------------------------------------------------------
# Sketch: approximate distinct (HLL++). LIBRARY surface, not a
# registered query (r12): the raw HLL estimate is engine-specific by
# construction, so a registry entry could only ever be a rows-only
# check — a permanent non-green row in the driver's CORRECTNESS
# artifact. Its hash-checked correctness surface is
# sketch_approx_distinct_check below (exact count + ε-bound flag),
# and tests/test_operators_unit.py bounds the estimate directly.
# ---------------------------------------------------------------------------


def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting via HyperLogLog++ (engine
    extension per SURVEY.md §2.5 — the sketch family for 100 TB cardinality estimation:
    fixed-size state, mergeable across partitions, no exact-distinct
    shuffle of the value set). Library surface — not registered (see
    block comment above); tests/test_operators_unit.py
    bounds relative error ≤5% against the exact count."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "sketch_approx_distinct_check",
    oracle="""
    SELECT event_type,
      CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      TRUE AS within_eps
    FROM events GROUP BY event_type
    """,
)
def sketch_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic companion to sketch_approx_distinct (SURVEY.md
    §2.5 sketch family): emits the
    exact distinct count plus ``within_eps`` = |HLL++ estimate − exact|
    / exact ≤ 0.05 (2.5× the sketch's rsd=0.02). The oracle asserts
    exact_users and a literal TRUE, so the cross-engine hash compare
    carries the ε bound: a sketch drifting past 5% flips within_eps and
    reds the row. This is how an engine-specific estimator gets a
    value-checked driver row without pretending estimates are portable.
    Same sketch scale story as sketch_approx_distinct (fixed-size
    mergeable state, no exact-distinct shuffle); the exact side here is
    verification scaffolding, not the 100 TB plan."""
    events = read_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_eps"),
    )


@query(
    "sketch_hll_mergeable_rollup",
    oracle="""
    SELECT event_type,
      CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      TRUE AS within_eps
    FROM events GROUP BY event_type
    """,
)
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (SURVEY.md §2.5 sketch family — the
    hypertable-rollup pattern): per-day HLL++ sketches of distinct
    users are built once (hll_sketch_agg), then UNIONED across days
    per event_type (hll_union_agg) — the merged estimate equals
    sketching the raw stream, which is the whole point: daily sketch
    partitions are the persistable rollup artifact, and any coarser
    grain (week/month/all-time) is a cheap union over them instead of
    a re-scan of raw events. Like sketch_approx_distinct_check, the
    driver row carries the ε bound (|merged estimate − exact|/exact ≤
    0.05) plus deterministic exact counts, so the engine-specific
    sketch bytes never enter the hash compare.

    Scale: the daily sketch table is |days × types| rows of fixed-size
    binary state — the 100 TB path reads THAT, not raw events; the
    exact side here is verification scaffolding only."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return merged.join(exact, on="event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_eps"),
    )


# ---------------------------------------------------------------------------
# Exact discrete percentiles per group.
# ---------------------------------------------------------------------------


@query(
    "agg_value_percentiles",
    oracle="""
    SELECT event_type,
      quantile_disc(value, 0.5)  AS p50,
      quantile_disc(value, 0.95) AS p95,
      quantile_disc(value, 0.99) AS p99,
      count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles per group (engine extension per
    SURVEY.md §2.5 — the latency/value-distribution summary every
    monitoring pipeline needs). percentile_disc picks an actual data
    value (no interpolation) so both engines agree bit-for-bit. At
    100 TB exact percentiles sort within each group partition;
    approx_percentile (sketch_approx_distinct's t-digest cousin) is
    the constant-memory fallback when groups outgrow that."""
    events = read_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("_ev_pct")
    return events.sparkSession.sql(
        """
        SELECT event_type,
          percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
          percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95,
          percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
          count(*) AS n
        FROM _ev_pct GROUP BY event_type
        """
    )


# ---------------------------------------------------------------------------
# Conversion funnel: view → click → purchase in event-time order.
# ---------------------------------------------------------------------------


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT v.user_id, v.v_ts, min(e.ts) AS c_ts
      FROM v JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY v.user_id, v.v_ts
    ),
    p AS (
      SELECT c.user_id, min(e.ts) AS p_ts
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY c.user_id
    )
    SELECT
      (SELECT count(*) FROM v) AS n_viewed,
      (SELECT count(*) FROM c) AS n_clicked_after_view,
      (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel over event time (engine extension per SURVEY.md
    §2.9 — the sessionized-behavior query a training-data/analytics
    pipeline runs on its events): users who viewed, then clicked after
    their first view, then purchased after that first click. Each stage
    is a conditional-min aggregate joined forward — per-user state
    carried relationally, no per-user loop. Joins shuffle on user_id
    once each; at 100 TB the stage frames are tiny relative to raw
    events (one row per converting user)."""
    events = read_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("e_ts")
    )
    c = (
        v.join(clicks, on="user_id")
        .filter(F.col("e_ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("e_ts").alias("c_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("e_ts")
    )
    p = (
        c.join(purchases, on="user_id")
        .filter(F.col("e_ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("e_ts").alias("p_ts"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


# ---------------------------------------------------------------------------
# Sessionization: explicit session ids from inactivity gaps.
# ---------------------------------------------------------------------------


@query(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WHERE user_id % 7 = 0
    )
    SELECT event_id, user_id,
      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS session_seq
    FROM g
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit per-event session ids from 30-minute inactivity gaps
    (engine extension per SURVEY.md §2.9 — the event-level complement
    to window_session_30m's session_window AGGREGATE): lag() marks
    session starts, a running sum numbers them. Both windows share one
    (user_id)-partitioned sort — a single shuffle; session ids are
    per-user sequence numbers so the global id is (user_id,
    session_seq), with no cross-partition coordination at 100 TB.
    A deterministic partition-key filter (user_id % 7) bounds the
    output for cross-engine hashing; it commutes with the per-user
    windows."""
    from wiki_data_pipeline_spark.operators.sessions import with_session_seq

    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    return with_session_seq(events).select(
        "event_id", "user_id", "session_seq"
    )


# ---------------------------------------------------------------------------
# VariantType: schema-FLEXIBLE semi-structured extraction (the Spark 4
# complement to st_props_json_extract's fixed-StructType parse).
# ---------------------------------------------------------------------------


@query(
    "st_props_variant_extract",
    oracle="""
    WITH p AS (
      SELECT event_id,
        CASE WHEN props IS NOT NULL AND json_valid(props)
             THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
        CASE WHEN props IS NOT NULL AND json_valid(props)
             THEN TRY_CAST(json_extract(props, '$.missing') AS BIGINT)
        END AS missing_field
      FROM events
    )
    SELECT event_id, k, missing_field FROM p WHERE k >= 90
    """,
)
def st_props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType extraction (engine extension per SURVEY.md §1.3's
    schema-on-read boundary — S8's json.loads where the key set is NOT
    known up front): try_parse_json keeps the full payload as a binary
    variant (NULL for malformed text — a corpus-scale props column WILL
    contain garbage rows, and plain parse_json throws on the first one;
    caught by the adversarial fixture); try_variant_get extracts typed
    paths lazily, yielding null for absent paths AND for type-drifted
    values a strict variant_get cast would throw on — the open-schema
    analog of from_json's fixed StructType, tolerant end-to-end. The
    oracle mirrors the tolerance with a json_valid guard + TRY_CAST.

    Scale: variant is columnar-binary (no per-row Python, no string
    re-parse per path access); predicates on extracted paths evaluate
    post-scan but stay in whole-stage codegen. When one path is hot,
    materialize it as a real column at write time — variant is for the
    long tail, not the filter key."""
    events = read_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    out = events.select(
        "event_id",
        # try_variant_get for BOTH paths: a type-drifted k (valid JSON,
        # '{"k": "abc"}') would make the strict variant_get's bigint
        # cast throw — same garbage-row argument as try_parse_json, and
        # it keeps the Spark side aligned with the oracle's TRY_CAST
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_field"),
    )
    return out.filter(F.col("k") >= 90)


# ---------------------------------------------------------------------------
# CDC latest-state compaction: per-key latest row.
# ---------------------------------------------------------------------------


@query(
    "cdc_latest_state",
    oracle=f"""
    SELECT user_id, CAST(event_id AS BIGINT) AS last_event_id,
      strftime(ts, '{TS_US_DUCK}') AS last_ts,
      event_type AS last_event_type,
      value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-state compaction — collapse an event/changelog stream
    to one current row per key (the batch form of the reference's
    mutate-state-per-row queue/checkpoint files, K3/K4 + ST2: instead
    of rewriting state on every row — SURVEY.md §2.11's O(n²) I/O —
    the log is append-only and the state table is derived by
    compaction, which is how a changelog becomes a serving table at
    100 TB). Latest = max version-leading struct (operators/cdc.py
    compact_latest — the same definition cdc_merge_apply merges, fuzzed
    cross-engine in tests/test_cdc_fuzz.py): ONE hash aggregate with
    map-side partials — not the row_number window the oracle spells
    (value-equivalent), which would sort every partition; event_id
    uniqueness makes the tie-break total, so both engines pick the
    identical row."""
    from wiki_data_pipeline_spark.operators.cdc import compact_latest

    events = read_table(spark, sf_dir, "events")
    return compact_latest(events, out="last").select(
        "user_id",
        F.col("last.event_id").cast("bigint").alias("last_event_id"),
        F.date_format("last.ts", TS_US_SPARK).alias("last_ts"),
        F.col("last.event_type").alias("last_event_type"),
        F.col("last.value").alias("last_value"),
    )


# ---------------------------------------------------------------------------
# CDC → SCD2 history: change-compressed validity intervals per key.
# ---------------------------------------------------------------------------


@query(
    "cdc_scd2_history",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
        lag(event_type) OVER w AS prev_type
      FROM events WHERE user_id % 7 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type AS state,
      strftime(ts, '{TS_US_DUCK}') AS valid_from,
      strftime(lead(ts) OVER w2, '{TS_US_DUCK}') AS valid_to,
      (lead(ts) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history construction from a changelog (the
    warehouse-side complement of cdc_latest_state, SURVEY.md §2.11
    state-log family): change-compress consecutive same-state rows per
    key (lag ≠ current keeps only transitions), then close each
    version with the next transition's timestamp — valid_from /
    valid_to intervals, open interval = current state. The standard
    dimension-history table every CDC sink materializes.

    Both window passes share ONE (user_id)-partitioned sort — Spark
    plans a single shuffle+sort and reuses it (same discipline as
    sessionize_events); event_id makes the sort total so both engines
    compress identical runs. The deterministic user_id % 7 filter
    bounds driver output and commutes with per-user windows. At
    100 TB: one shuffle on the key, per-key state is O(1) per row —
    and keys are users, so no planet-scale skew."""
    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", TS_US_SPARK).alias("valid_from"),
        F.date_format(nxt, TS_US_SPARK).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Time-series downsampling: per-minute OHLC bars.
# ---------------------------------------------------------------------------


@query(
    "events_minute_ohlc",
    oracle=f"""
    SELECT event_type,
      strftime(date_trunc('minute', ts), '{TS_FMT_DUCK}') AS minute,
      count(*) AS n_events,
      arg_min(value, strftime(ts, '{TS_US_DUCK}') ||
              lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open_value,
      arg_max(value, strftime(ts, '{TS_US_DUCK}') ||
              lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close_value,
      max(value) AS high_value,
      min(value) AS low_value
    FROM events
    WHERE user_id % 11 = 0
    GROUP BY event_type, date_trunc('minute', ts)
    """,
)
def events_minute_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute OHLC downsampling bars per event_type (engine
    extension per SURVEY.md §2.9 — the hypertable continuous-aggregate
    shape: raw events roll up into fixed-grain bars that coarser grains
    re-aggregate from without touching raw data; open/close re-derive
    exactly because the bar carries its boundary values). first/last
    within a bar are order-dependent, so both engines select them with
    min_by/arg_min over one fixed-width sort key
    (microsecond-timestamp string ++ zero-padded event_id) — totally
    ordered, hence deterministic under any partitioning; DuckDB's
    arg_min takes no struct ordering key, which is why the key is a
    string on both sides.

    Scale: one shuffle on (event_type, minute) with map-side partial
    min_by/max_by — per-group state is O(1), no sort, no window. The
    user_id filter bounds driver output and commutes with grouping."""
    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 11 == 0
    )
    key = F.concat(
        F.date_format("ts", TS_US_SPARK),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return events.groupBy(
        "event_type",
        F.date_format(F.date_trunc("minute", F.col("ts")), TS_FMT_SPARK).alias(
            "minute"
        ),
    ).agg(
        F.count("*").alias("n_events"),
        F.min_by("value", key).alias("open_value"),
        F.max_by("value", key).alias("close_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
    )


# ---------------------------------------------------------------------------
# Sketch: approximate quantiles with a rank-error bound.
# ---------------------------------------------------------------------------


@query(
    "sketch_quantile_rank_check",
    oracle="""
    SELECT event_type, count(*) AS n_events,
      TRUE AS within_p50, TRUE AS within_p95
    FROM events GROUP BY event_type
    """,
)
def sketch_quantile_rank_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile sketch with its guarantee carried in the
    driver row (SURVEY.md §2.5 sketch family, same contract as
    sketch_approx_distinct_check): approx_percentile (Greenwald-Khanna,
    accuracy=10000 → rank error ≤ 1e-4) estimates p50/p95 of value per
    event_type; a second pass computes the TRUE rank of each estimate
    (fraction of rows ≤ it) and asserts |rank − q| ≤ 0.02. GK bounds
    RANK error, not value error, so the check is rank-based — a value
    bound would be skew-fragile and algorithm-specific. The oracle
    pins exact counts plus literal TRUEs, so a sketch drifting past
    its bound reds the row cross-engine.

    Scale: the sketch is fixed-size mergeable state (one shuffle,
    map-side partial); the verification rank pass broadcasts the tiny
    per-type threshold table back over events — scaffolding, not the
    100 TB serving path (which ships only the sketch)."""
    events = read_table(spark, sf_dir, "events")
    thr = (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95], 10000).alias("ap")
        )
        .select(
            "event_type",
            F.col("ap")[0].alias("a50"),
            F.col("ap")[1].alias("a95"),
        )
    )
    ranked = events.join(F.broadcast(thr), on="event_type").groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        (
            F.sum(F.when(F.col("value") <= F.col("a50"), 1).otherwise(0))
            / F.count("*")
        ).alias("r50"),
        (
            F.sum(F.when(F.col("value") <= F.col("a95"), 1).otherwise(0))
            / F.count("*")
        ).alias("r95"),
    )
    return ranked.select(
        "event_type",
        "n_events",
        (F.abs(F.col("r50") - 0.5) <= 0.02).alias("within_p50"),
        (F.abs(F.col("r95") - 0.95) <= 0.02).alias("within_p95"),
    )


# ---------------------------------------------------------------------------
# Data layout: z-order (Morton) file assignment with per-file bounds.
# ---------------------------------------------------------------------------

# Morton interleave of two 8-bit dims: x bits at even positions, y at
# odd. The same expression is generated for both engines from one
# formula so the layouts are bitwise identical.
_Z_SQL = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)


def _z_col(x: Column, y: Column) -> Column:
    bits = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(8)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


@query(
    "layout_zorder_files",
    oracle=f"""
    WITH d AS (
      SELECT user_id % 256 AS x,
        (CAST(floor(date_part('epoch', ts)) AS BIGINT) // 3600) % 256 AS y
      FROM events
    ),
    z AS (SELECT x, y, ({_Z_SQL}) AS zval FROM d)
    SELECT zval >> 8 AS file_id, count(*) AS n_rows,
      min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
      (max(x) - min(x) <= 15 AND max(y) - min(y) <= 15) AS tile_bounded
    FROM z GROUP BY zval >> 8
    """,
)
def layout_zorder_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) file layout planning (engine extension per
    SURVEY.md §2.1 sink/layout family —
    the write-side data-skipping organizer Delta/Iceberg OPTIMIZE
    ZORDER implements): interleave the bits of two query dimensions
    (user bucket ×  epoch-hour bucket) and assign rows to files by
    z-prefix (top 8 of 16 bits → ≤256 files). The payoff is in the
    emitted per-file min/max column stats: every file is confined to a
    ≤16×16 tile in BOTH dimensions (``tile_bounded``, asserted
    cross-engine), so a point/range predicate on EITHER column prunes
    ~15/16 of files from footer stats alone — a linear sort bounds one
    dimension and leaves the other unbounded per file.

    Scale: z-value is a map-only bit expression; the real writer is
    ``df.repartitionByRange(n, zval).sortWithinPartitions(zval)
    .write`` — one range shuffle, same as any sorted write. This query
    materializes the resulting layout manifest (file → bounds), i.e.
    the statistics table a 100 TB reader would prune against."""
    events = read_table(spark, sf_dir, "events")
    d = events.select(
        (F.col("user_id") % 256).alias("x"),
        (
            F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("bigint") % 256
        ).alias("y"),
    )
    z = d.select("x", "y", _z_col(F.col("x"), F.col("y")).alias("zval"))
    return z.groupBy(F.shiftright(F.col("zval"), 8).alias("file_id")).agg(
        F.count("*").alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        (
            (F.max("x") - F.min("x") <= 15) & (F.max("y") - F.min("y") <= 15)
        ).alias("tile_bounded"),
    )


# ---------------------------------------------------------------------------
# Skew audit: heavy-hitter keys (the pre-flight for salted joins).
# ---------------------------------------------------------------------------


@query(
    "skew_heavy_hitters",
    oracle="""
    WITH keyed AS (
      SELECT CASE WHEN user_id % 10 = 0 THEN -1
                  WHEN user_id % 10 = 1 THEN -2
                  ELSE user_id END AS join_key
      FROM events
    ),
    counts AS (
      SELECT join_key, count(*) AS n_events FROM keyed GROUP BY join_key
    ),
    stats AS (
      SELECT CAST(sum(n_events) AS DOUBLE) / count(*) AS mean_n,
             CAST(sum(n_events) AS BIGINT) AS total_n
      FROM counts
    )
    SELECT join_key, n_events,
      CAST(n_events AS DOUBLE) / total_n AS share,
      CAST(n_events AS DOUBLE) / mean_n AS skew_ratio
    FROM counts, stats
    WHERE CAST(n_events AS DOUBLE) >= 3.0 * mean_n
    """,
)
def skew_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter key audit (engine extension per SURVEY.md §2.4 join
    family — the pre-flight that
    decides WHERE the salted-join path in star_schema.join_skew_salted
    is worth its extra shuffle): per-key frequencies, then keys whose
    count is ≥3× the mean key load, with their share of total rows.
    At 100 TB this manifest — a handful of rows — is what picks the
    salting key list and the salt factor; running it is one groupBy
    plus an O(#keys) aggregate, vastly cheaper than discovering skew
    by watching one straggler task run for an hour.

    The events fixture is deliberately uniform (FIXTURES.md), so the
    audited key synthesizes the classic production skew shape the same
    way _dedup_corpus synthesizes duplicates: sentinel/default ids
    (the "unknown user" −1 / "bot traffic" −2 every real event log
    accumulates) absorb 10% of rows each — exactly the hot-key
    pattern that melts an unsalted shuffle join.

    mean is computed as explicit double division of exact integer sums
    on both engines (not avg()) so the 3× threshold compares bitwise
    identically."""
    events = read_table(spark, sf_dir, "events")
    join_key = (
        F.when(F.col("user_id") % 10 == 0, F.lit(-1))
        .when(F.col("user_id") % 10 == 1, F.lit(-2))
        .otherwise(F.col("user_id"))
    )
    counts = (
        events.select(join_key.alias("join_key"))
        .groupBy("join_key")
        .agg(F.count("*").alias("n_events"))
    )
    stats = counts.agg(
        (
            F.sum("n_events").cast("double") / F.count("*")
        ).alias("mean_n"),
        F.sum("n_events").cast("bigint").alias("total_n"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .filter(F.col("n_events").cast("double") >= 3.0 * F.col("mean_n"))
        .select(
            "join_key",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total_n")).alias(
                "share"
            ),
            (F.col("n_events").cast("double") / F.col("mean_n")).alias(
                "skew_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Retention cohorts: first-seen day × activity-day offsets.
# ---------------------------------------------------------------------------


@query(
    "retention_cohorts",
    oracle="""
    WITH fa AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
      CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
      count(*) AS n_active
    FROM act JOIN fa USING (user_id)
    GROUP BY cohort_day, date_diff('day', cohort_day, day)
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort triangle (engine extension per SURVEY.md §2.9
    — the activity analysis every event pipeline reports): users
    bucketed by first-seen day; for each cohort × day-offset, how many
    of its users were active that day. Day-level distinct first
    (collapses raw events to ≤ users × days rows), THEN the
    cohort join — at 100 TB the join input is the compact activity
    matrix, not the raw stream, and the final (cohort, offset) rollup
    aggregates a users×days frame, so every shuffle after the first
    touches reduced data."""
    events = read_table(spark, sf_dir, "events")
    fa = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    act = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(fa, on="user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Data-quality profiling: one-pass per-column stats.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


@query(
    "quality_column_profile",
    oracle="""
    SELECT 'event_id' AS col_name, count(*) - count(event_id) AS n_null,
      CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
    UNION ALL
    SELECT 'ts', count(*) - count(ts), count(DISTINCT ts) FROM events
    UNION ALL
    SELECT 'user_id', count(*) - count(user_id),
      count(DISTINCT user_id) FROM events
    UNION ALL
    SELECT 'event_type', count(*) - count(event_type),
      count(DISTINCT event_type) FROM events
    UNION ALL
    SELECT 'value', count(*) - count(value),
      count(DISTINCT value) FROM events
    UNION ALL
    SELECT 'props', count(*) - count(props),
      count(DISTINCT props) FROM events
    """,
)
def quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (engine extension per SURVEY.md §2.5
    aggregate family — the
    Deequ/GreatExpectations-style drift audit a pipeline runs before
    trusting a new data drop): per column, null count and exact
    distinct count. The whole profile is ONE aggregate over one scan —
    2·|cols| aggregate expressions computed together — then the 1-row
    wide result is exploded into the (col_name, metric…) long format
    consumers diff against yesterday's profile. The oracle spells it
    as per-column UNION ALL scans, which is exactly the naive shape
    this operator exists to avoid at 100 TB (6 scans → 1).

    Exact countDistinct per column does shuffle each column's value
    set; for TB-wide profiling swap in approx_count_distinct and carry
    the ε like sketch_approx_distinct_check — the profile schema stays
    identical."""
    events = read_table(spark, sf_dir, "events")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append((F.count("*") - F.count(c)).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"dist_{c}"))
    wide = events.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.col_name", "r.n_null", "r.n_distinct"
    )


# ---------------------------------------------------------------------------
# Second-moment aggregates: decimal-exact variance / stddev.
# ---------------------------------------------------------------------------


@query(
    "agg_value_moments",
    oracle=f"""
    SELECT event_type,
      count(*) AS n_events,
      {_davg_sql('value', 'mean_value')},
      round(
        (CAST(sum(CAST(value AS DECIMAL(28,6)) * CAST(value AS DECIMAL(28,6)))
              AS DOUBLE)
         - CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
           * CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*))
        / (count(*) - 1) * 1000000) / 1000000.0 AS var_value,
      round(sqrt(
        (CAST(sum(CAST(value AS DECIMAL(28,6)) * CAST(value AS DECIMAL(28,6)))
              AS DOUBLE)
         - CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
           * CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*))
        / (count(*) - 1)) * 1000000) / 1000000.0 AS stddev_value
    FROM events GROUP BY event_type
    """,
)
def agg_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev per group with ORDER-PROOF summation
    (engine extension per SURVEY.md §2.5 aggregate family — the
    second-moment stats every quality dashboard wants next to
    count/sum/avg): built-in var_samp sums doubles in partition order,
    so its low bits change with partitioning and can never hash-match
    a single-threaded oracle; here both moments (Σx, Σx²) accumulate
    as exact DECIMAL — associative and partitioning-independent — and
    only the final var = (Σx² − (Σx)²/n)/(n−1) runs in double, an
    identical scalar computation on both engines. The same
    representation is what makes the moments MERGEABLE for the
    incremental-MV path (incr_agg_merge): partial (n, Σx, Σx²)
    triples merge exactly.

    Scale: one shuffle with map-side partial decimal sums — identical
    cost to the existing _dsum pattern; no second pass, no sort."""
    events = read_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(28,6)")
    agg = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(dec).alias("sx"),
        F.sum(dec * dec).alias("sx2"),
    )
    sx = F.col("sx").cast("double")
    sx2 = F.col("sx2").cast("double")
    n = F.col("n_events")
    var = (sx2 - sx * sx / n) / (n - 1)
    return agg.select(
        "event_type",
        "n_events",
        (sx / n).alias("mean_value"),
        # round(x*1e6)/1e6: both engines round the same double — var of
        # short-decimal inputs is itself boundary-prone rational
        (F.round(var * 1000000, 0) / 1000000.0).alias("var_value"),
        (F.round(F.sqrt(var) * 1000000, 0) / 1000000.0).alias(
            "stddev_value"
        ),
    )


# ---------------------------------------------------------------------------
# Data layout: small-file compaction planning.
# ---------------------------------------------------------------------------

_COMPACT_TARGET_CHARS = 64_000


@query(
    "layout_compaction_plan",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
        sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id)
          - n_chars AS start_off
      FROM documents
    )
    SELECT source,
      CAST(floor(start_off / {_COMPACT_TARGET_CHARS}) AS BIGINT) AS file_group,
      count(*) AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS total_chars,
      CAST(min(doc_id) AS BIGINT) AS min_doc_id,
      CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM c GROUP BY source, floor(start_off / {_COMPACT_TARGET_CHARS})
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (engine extension per SURVEY.md
    §2.1 sink/layout family — the OPTIMIZE/bin-packing pass every
    long-lived 100 TB table needs: streaming ingest leaves thousands
    of KB-sized files per partition; readers want hundreds of MB):
    within each source partition, docs are laid out in doc_id order
    and cut into target-size groups by their cumulative-size START
    offset — each group is one planned output file, emitted with its
    id-range manifest so the rewrite is resumable/idempotent per
    group. Greedy start-offset cutting = first-fit-decreasing-free:
    deterministic, single pass, no global state.

    Scale: ONE window pass partitioned by source (never a global
    sort); the cumsum is per-partition-key, exactly the
    pack_training_sequences discipline. The plan table is tiny
    (#files rows); the rewrite it drives is embarrassingly parallel
    per group."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    c = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.sum("n_chars").over(w) - F.col("n_chars")).alias("start_off"),
    )
    return c.groupBy(
        "source",
        F.floor(F.col("start_off") / _COMPACT_TARGET_CHARS)
        .cast("bigint")
        .alias("file_group"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection: median / MAD outliers.
# ---------------------------------------------------------------------------


@query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_disc(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
        abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_disc(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
      round((d.value - d.med) / m.mad * 1000000) / 1000000.0 AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND abs(d.value - d.med) > 5 * m.mad
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median/MAD (engine extension per
    SURVEY.md §2.5 aggregate family — the anomaly gate a pipeline
    puts on metric streams, robust where mean/stddev (agg_value_moments)
    are dragged by the very outliers being hunted: median and MAD have
    50% breakdown). Flags events with |value − median| > 5·MAD and
    emits the robust z-score (value − med)/MAD. Exact discrete
    percentiles on both engines (percentile_disc ≡ quantile_disc, the
    agg_value_percentiles-proven pair), so thresholding is
    deterministic — no float summation anywhere.

    Scale: two percentile passes + two broadcast joins of the 5-row
    stats tables back over events; exact per-group percentiles sort
    within groups — swap approx_percentile + the rank-check pattern
    (sketch_quantile_rank_check) when groups stop fitting a sort."""
    events = read_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "med"
        )
    )
    dev = events.join(F.broadcast(med), on="event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias(
            "mad"
        )
    )
    # mad > 0 guard: a group where ≥50% of values are identical has
    # MAD 0, which would flood the filter with every nonzero deviation
    # and divide by zero (Spark NULL vs DuckDB inf — engines disagree).
    return (
        dev.join(F.broadcast(mad), on="event_type")
        .filter((F.col("mad") > 0) & (F.col("adev") > 5 * F.col("mad")))
        .select(
            "event_id",
            "event_type",
            "value",
            # round(x*1e6)/1e6, not round(x, 6): both engines then
            # round the SAME double product — round(x, 6) rounds
            # different intermediates (Spark: exact binary; DuckDB: a
            # float multiply) and splits on 7th-decimal .5 boundaries.
            (
                F.round(
                    (F.col("value") - F.col("med")) / F.col("mad") * 1000000,
                    0,
                )
                / 1000000.0
            ).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# Sequential pattern mining: most common 3-step paths within sessions.
# ---------------------------------------------------------------------------

_PATH_TOPN = 20


@query(
    "path_common_triples",
    oracle=f"""
    WITH g AS (
      SELECT event_id, user_id, ts, event_type,
        CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WHERE user_id % 7 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT event_id, user_id, ts, event_type,
        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM g
    ),
    t AS (
      SELECT event_type AS t1,
        lead(event_type, 1) OVER w2 AS t2,
        lead(event_type, 2) OVER w2 AS t3
      FROM s
      WINDOW w2 AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, count(*) AS n_paths
    FROM t WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n_paths DESC, t1, t2, t3 LIMIT {_PATH_TOPN}
    """,
)
def path_common_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining — top 3-step event paths WITHIN
    sessions (engine extension per SURVEY.md §2.9 — funnel DISCOVERY,
    where funnel_view_click_purchase measures one funnel someone
    already hypothesized, this surfaces which paths exist and how
    often): sessionize (same 30-min-gap spec as sessionize_events),
    slide a lead/lead² window along each session, count distinct
    ordered triples, keep the top 20 with full-column tie-break so
    both engines cut the same set.

    Scale: the sessionize pass and the triple window share ONE
    (user_id[, session])-sorted shuffle lineage; triples aggregate
    with map-side partials onto a tiny (|types|³ ≤ 125-row) key space;
    top-N is TakeOrderedAndProject. The classic n-gram-over-sequences
    shape — same cost as sessionizing itself."""
    from wiki_data_pipeline_spark.operators.sessions import with_session_seq

    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    s = with_session_seq(events)
    w2 = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    t = s.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w2).alias("t2"),
        F.lead("event_type", 2).over(w2).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        t.groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(
            F.desc("n_paths"), F.asc("t1"), F.asc("t2"), F.asc("t3")
        )
        .limit(_PATH_TOPN)
    )


# ---------------------------------------------------------------------------
# Ranking-function breadth: rank / dense_rank / percent_rank /
# cume_dist / ntile in one windowed pass.
# ---------------------------------------------------------------------------


@query(
    "window_rank_functions",
    oracle=f"""
    WITH totals AS (
      SELECT event_type, user_id,
        {_dsum_sql('value', 'total_value')}
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, total_value,
      CAST(rank() OVER w AS BIGINT) AS rnk,
      CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      round(percent_rank() OVER w * 1000000) / 1000000.0 AS prnk,
      round(cume_dist() OVER w * 1000000) / 1000000.0 AS cdist,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM totals
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY total_value DESC, user_id)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface in one windowed pass
    (SURVEY.md §2.6 ordering family breadth — L1-L3 cover top-k /
    FIFO / global index; this adds rank, dense_rank, percent_rank,
    cume_dist, ntile, the leaderboard/quartile shapes every analytics
    consumer asks for): per-user spend totals ranked within
    event_type. The window order is TOTAL (value desc, then user_id),
    so every function — including ntile's bucket boundaries — is
    deterministic on both engines; totals use the decimal-sum
    discipline so the ordering keys themselves are exact.

    Scale: one shuffle for the totals agg, one per-type sort for the
    shared window (all five functions evaluate in a single Window
    node — Spark computes them in one pass over each partition).
    Partitions are per-type user sets; if one type's user set outgrows
    a sort, pre-bucket by hash(user) and rank within buckets + merge
    offsets (the L3 two-pass pattern)."""
    events = read_table(spark, sf_dir, "events")
    totals = events.groupBy("event_type", "user_id").agg(
        dsum(F.col("value"), "total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return totals.select(
        "event_type",
        "user_id",
        "total_value",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        # round(x*1e6)/1e6: both engines round the same double — rank
        # ratios are short-decimal rationals, the boundary-prone class
        (F.round(F.percent_rank().over(w) * 1000000, 0) / 1000000.0).alias(
            "prnk"
        ),
        (F.round(F.cume_dist().over(w) * 1000000, 0) / 1000000.0).alias(
            "cdist"
        ),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct: rolling 7-day active users (WAU per day).
# ---------------------------------------------------------------------------


@query(
    "window_rolling_distinct_users",
    oracle="""
    WITH expanded AS (
      SELECT DISTINCT CAST(ts AS DATE) + CAST(i AS INTEGER) AS window_end_day,
        user_id
      FROM events, (SELECT unnest(generate_series(0, 6)) AS i) t
    )
    SELECT strftime(window_end_day, '%Y-%m-%d') AS day,
      CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM expanded
    GROUP BY window_end_day
    """,
)
def window_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct actives per day — WAU, the canonical
    sliding-window DISTINCT (engine extension per SURVEY.md §2.9
    window family; tumbling/session/moving-sum exist, but distinct
    does NOT decompose into partial sums, so it gets its own shape):
    each (day, user) activity row is replicated to the 7 window-end
    days it supports, then count(DISTINCT) per window-end day. The
    replicate-then-group form is the distributable one — a per-row
    7-window fan-out of the already-day-deduped activity set, vs a
    self-join of events against a day grid.

    Scale: fan-out is 7× the (day, user) activity matrix (≪ raw
    events), one shuffle on window_end_day; for planetary user counts
    swap count(DISTINCT) for the mergeable HLL rollup
    (sketch_hll_mergeable_rollup) — per-day sketches union across any
    window length without re-reading events. Days past the corpus
    edge correctly report the trailing-window tail."""
    events = read_table(spark, sf_dir, "events")
    act = events.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    expanded = act.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "d",
        "user_id",
    ).select(F.date_add(F.col("d"), F.col("i")).alias("wend"), "user_id")
    return (
        expanded.distinct()
        .groupBy(F.date_format("wend", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )


@query(
    "window_rolling_distinct_hll",
    oracle="""
    WITH expanded AS (
      SELECT DISTINCT CAST(ts AS DATE) + CAST(i AS INTEGER) AS window_end_day,
        user_id
      FROM events, (SELECT unnest(generate_series(0, 6)) AS i) t
    )
    SELECT strftime(window_end_day, '%Y-%m-%d') AS day,
      CAST(count(DISTINCT user_id) AS BIGINT) AS exact_wau,
      TRUE AS within_eps
    FROM expanded
    GROUP BY window_end_day
    """,
)
def window_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planetary-scale form of window_rolling_distinct_users
    (SURVEY.md §2.9 window family × §2.5 sketch family): rolling 7-day
    WAU from MERGED per-day HLL sketches instead of exact
    count(DISTINCT). One hll_sketch_agg pass builds a |days| row
    sketch table; each day's sketch is fanned out to the 7 window-end
    days it supports and hll_union_agg merges them — so the window
    never touches raw events or the (day, user) matrix, and ANY window
    length is the same cheap union over the persisted daily sketches.
    Like sketch_hll_mergeable_rollup, the driver row carries the ε
    bound (|merged estimate − exact WAU|/exact ≤ 0.05) plus the
    deterministic exact count, so engine-specific sketch bytes never
    enter the hash compare.

    Scale: sketch table is |days| rows of fixed-size binary state; the
    fan-out is 7×|days| rows regardless of user count — this is the
    swap the window_rolling_distinct_users docstring promises for
    planetary user counts. The exact side here is verification
    scaffolding only, not the 100 TB plan."""
    events = read_table(spark, sf_dir, "events")
    daily_sk = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = (
        daily_sk.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "d", "sk"
        )
        .select(F.date_add(F.col("d"), F.col("i")).alias("wend"), "sk")
        .groupBy("wend")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_wau"))
    )
    exact = (
        events.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "d",
            "user_id",
        )
        .select(F.date_add(F.col("d"), F.col("i")).alias("wend"), "user_id")
        .distinct()
        .groupBy("wend")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_wau"))
    )
    return merged.join(exact, on="wend").select(
        F.date_format("wend", "yyyy-MM-dd").alias("day"),
        "exact_wau",
        (
            F.abs(F.col("approx_wau") - F.col("exact_wau"))
            / F.col("exact_wau")
            <= 0.05
        ).alias("within_eps"),
    )


# ---------------------------------------------------------------------------
# Compliance: targeted-delete (right-to-be-forgotten) rewrite plan.
# ---------------------------------------------------------------------------


@query(
    "compliance_delete_plan",
    oracle="""
    WITH blocklist AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 101 = 0
    )
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
      count(*) AS n_rows,
      CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM blocklist)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
      round(CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM blocklist)
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 1000000)
        / 1000000.0 AS affected_frac,
      sum(CASE WHEN user_id IN (SELECT user_id FROM blocklist)
          THEN 1 ELSE 0 END) > 0 AS rewrite_needed
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def compliance_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted-delete rewrite planning (engine extension per
    SURVEY.md §2.1 sink/layout family — the right-to-be-forgotten /
    retention-purge pass every stored 100 TB corpus eventually owes:
    deletes are rare and row-level, parquet is immutable, so the
    executable question is WHICH date partitions must be rewritten and
    how much of each survives): a deterministic deletion blocklist
    (user_id % 101 — the reference has no PII store to derive one
    from) is broadcast-semi-joined onto the date-partitioned layout;
    the emitted manifest (rows, affected count/fraction,
    rewrite_needed) is the work list the rewrite job executes
    partition-by-partition, idempotently.

    Scale: blocklists are small (requests, not corpus) → broadcast;
    one date-keyed aggregate over one scan. Partitions with
    rewrite_needed=false are untouched — the plan's whole point:
    delete cost scales with affected partitions, not table size."""
    events = read_table(spark, sf_dir, "events")
    blocklist = (
        events.select("user_id")
        .filter(F.col("user_id") % 101 == 0)
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    tagged = events.join(F.broadcast(blocklist), on="user_id", how="left")
    hit = F.when(F.col("blocked"), 1).otherwise(0)
    return tagged.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("event_date")
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(hit).cast("bigint").alias("n_affected"),
        # round(x*1e6)/1e6: both engines round the same double — count
        # ratios are short-decimal rationals, the boundary-prone class
        (
            F.round(F.sum(hit).cast("double") / F.count("*") * 1000000, 0)
            / 1000000.0
        ).alias("affected_frac"),
        (F.sum(hit) > 0).alias("rewrite_needed"),
    )


# ---------------------------------------------------------------------------
# ST2 companion — incremental TOP-K maintenance (merge per-slice top-ks).
# ---------------------------------------------------------------------------

_TOPK_MAINT = 10


@query(
    "incr_topk_maintenance",
    oracle=f"""
    SELECT event_type, event_id, value, rnk FROM (
      SELECT event_type, CAST(event_id AS BIGINT) AS event_id, value,
        CAST(row_number() OVER (PARTITION BY event_type
          ORDER BY value DESC, event_id) AS BIGINT) AS rnk
      FROM events
    ) WHERE rnk <= {_TOPK_MAINT}
    """,
)
def incr_topk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental TOP-K maintenance — the mergeable-MV form of a
    leaderboard (SURVEY.md §2.9 ST2 family, the top-k sibling of
    incr_agg_merge): top-k is a monoid under 'union then re-top-k'
    (top-k(A∪B) = top-k(top-k(A) ∪ top-k(B))), so the stored MV keeps
    only k rows per group and each refresh re-ranks the OLD top-k
    unioned with the new slice's top-k — never re-reading history.
    Here the persisted state is the event_id ≤ 500 slice's top-10 and
    the delta is the > 500 slice; the oracle is the full recompute, so
    the hash match proves merge ≡ recompute (exact, because the
    ranking order (value desc, event_id) is total).

    Scale: each slice's top-k is a per-group WindowGroupLimit (k rows
    survive map-side on both sides of its shuffle); the merge ranks
    2k rows per group. Refresh cost is O(delta + k·|groups|) vs
    O(history) for the naive recompute."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.select("event_type", "event_id", "value")
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= _TOPK_MAINT)
            .drop("r")
        )

    state = topk(events.filter(F.col("event_id") <= 500))
    delta = topk(events.filter(F.col("event_id") > 500))
    return (
        state.unionAll(delta)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TOPK_MAINT)
        .select(
            "event_type",
            F.col("event_id").cast("bigint").alias("event_id"),
            "value",
            "rnk",
        )
    )
