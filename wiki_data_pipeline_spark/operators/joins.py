"""Generic time-travel join compositions (engine extensions per
SURVEY.md §2.4 — the reference has no theta/range/as-of joins; these
are the Spark-lacks-it operators built as compositions of built-ins).

``asof_join`` is the single formulation behind both registered as-of
queries (`plans/star_schema.py` ``join_asof``,
`plans/pipeline_ops.py` ``join_asof_forward``): union both sides,
order by (ts, side) within each key partition, and pick the nearest
non-null right value with ``last``/``first(ignorenulls)`` over a
half-open row frame — ONE shuffle on the key, no per-row range probe,
no cross product. Tie semantics match DuckDB ASOF: the side ordering
makes an equal-ts right row visible to the left row in both
directions (backward ``l.ts >= r.ts``, forward ``l.ts <= r.ts``).

Scale: identical to any partitioned window — shuffle on the key +
local sort; skewed keys fall under the salting story in
``operators/skew.py``. This is the standard scalable as-of
formulation (a range-join would explode; a point self-join can't
express "nearest preceding/following").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    value_col: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``value_col`` from
    the nearest ``right`` row within the same ``on`` key — latest
    ``right.ts <= left.ts`` for ``backward``, earliest
    ``right.ts >= left.ts`` for ``forward``; null when no such row
    (left-outer semantics). Equal-ts rows MATCH in both directions
    (DuckDB ASOF tie semantics). ``right`` should be unique per
    (key, ts) — among exact duplicates the picked row is tie-broken
    arbitrarily, exactly as in any engine's ASOF.

    Returns ``left``'s columns plus ``value_col``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_col in left.columns:
        raise ValueError(
            f"left already has a column named {value_col!r}; project it "
            "away (or rename the right value) before the as-of join"
        )
    lcols = left.columns
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts, so the
        # unbounded-preceding frame at a left row sees the tie
        l_side, r_side = 1, 0
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        # left rows sort BEFORE right rows at equal ts, so the
        # unbounded-following frame at a left row sees the tie
        l_side, r_side = 0, 1
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    r = right.select(
        *keys, ts, F.col(value_col).alias("__asof_val")
    ).withColumn("__side", F.lit(r_side))
    l = left.withColumn("__side", F.lit(l_side))
    u = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(ts, "__side").rowsBetween(*frame)
    return (
        u.withColumn(
            "__matched", pick("__asof_val", ignorenulls=True).over(w)
        )
        .filter(F.col("__side") == l_side)
        .select(*lcols, F.col("__matched").alias(value_col))
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    ts: str,
    start: str,
    end: str,
    bucket_width: int,
    start_open: bool = False,
    end_open: bool = False,
) -> DataFrame:
    """Scalable point-in-interval join over LONG columns: a naive
    theta-join (``key equal AND start < ts <= end``) is a per-key
    cross product; here the interval side explodes to the
    ``bucket_width``-grain buckets it covers (``floor(start/w) ..
    floor(end/w)`` — ≤ ``1 + ceil(interval/width)`` rows), the point
    side maps to its single bucket, and the join becomes an EQUI-join
    on (keys, bucket) + the exact range filter re-applied. Each point
    lands in exactly one bucket so no dedup pass is needed; pick the
    grain ≈ the interval width to balance replication factor vs
    candidate count (SCALE.md).

    ``start_open``/``end_open`` select strict endpoints (the
    attribution shape is ``start < ts <= end``:
    ``start_open=True``). Endpoint/bucket-edge behavior is
    cross-engine fuzzed in tests/test_join_fuzz.py — bucket-boundary
    off-by-ones are exactly the bug class this composition can hide.

    Returns both sides' columns (bucket column dropped)."""
    keys = [on] if isinstance(on, str) else list(on)

    def _bucket(col: str):
        # integer-exact floor division (pmod keeps it correct for
        # negative values): FLOOR(x / w) through a double would be
        # one-off at magnitudes where the division isn't representable
        # — epoch-microsecond longs live exactly there
        # `div` keeps the whole computation in integer arithmetic;
        # Spark's `/` casts both sides to double, which rounds at
        # |values| > 2^53 (epoch-NANOsecond longs) and can shift a row
        # to the wrong bucket, silently dropping matches.
        return F.expr(
            f"(({col}) - pmod({col}, {bucket_width})) div {bucket_width}"
        )

    p_b = points.withColumn("__bucket", _bucket(ts))
    iv_b = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(start), _bucket(end))),
    )
    lo = (
        F.col(ts) > F.col(start)
        if start_open
        else F.col(ts) >= F.col(start)
    )
    hi = F.col(ts) < F.col(end) if end_open else F.col(ts) <= F.col(end)
    return (
        p_b.join(iv_b, keys + ["__bucket"]).filter(lo & hi).drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """Inner join on closed-interval overlap:
    ``l_start <= r_end AND l_end >= r_start`` (touching endpoints DO
    overlap). The predicate is evaluated map-side when ``right`` is
    broadcast (the few-windows impact-analysis shape of
    ``join_interval_overlap``); for large×large interval joins,
    pre-bucket both sides by a time grain and equi-join on the bucket
    first (the ``join_range_bucketed`` pattern) instead of disabling
    the broadcast here."""
    cond = (F.col(l_start) <= F.col(r_end)) & (
        F.col(l_end) >= F.col(r_start)
    )
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, cond)
