"""Skew mitigation: key salting for joins and non-decomposable
aggregates (SCALE.md 'Joins' — the manual complement to AQE's
skew-join splitting, for when skew is known ahead of time).

Salting spreads a hot key across ``n_salts`` shuffle partitions:
- join: the fact side gets a deterministic per-row salt; the dim side
  is exploded into ``n_salts`` replicas so every (key, salt) pair
  still matches. One fact-side shuffle on (key, salt) replaces the
  single overloaded (key) partition with n evenly-loaded ones, at the
  price of an n-times-replicated (small) build side.
- aggregate: decomposable aggregates don't need salting (map-side
  partial aggregation already collapses hot groups per-partition);
  ``salted_distinct_count`` handles the non-decomposable case —
  count(DISTINCT x) for a hot group — by de-duplicating on
  (key, salt-of-value) first, so no single reducer sees the whole
  group's value set.

Salts are deterministic (hash of a per-row column, not rand()) so
re-runs and retried tasks produce identical partitioning — the same
idempotence rule the reference's sink relies on (SURVEY.md ST3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, of: Column | str, n_salts: int, col: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from ``of``."""
    c = F.col(of) if isinstance(of, str) else of
    return df.withColumn(col, F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_row_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted by
    ``fact_row_key`` (any well-distributed per-row column, e.g. the
    fact table's primary key) and the dim side replicated n_salts
    times. Result is row-identical to the unsalted join for the
    fact-preserving modes (inner / left / left_semi / left_anti).

    right / full outer are rejected: the replicated dim side would
    emit each unmatched dim row once PER SALT (n_salts null-padded
    duplicates). Salt the dim side instead (swap the arguments)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            f"across salts; use one of {sorted(allowed)} or salt the other side"
        )
    f = with_salt(fact, fact_row_key, n_salts)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")


# --- the skew DECISION RULE (r9 verdict item 4) ----------------------
# Diagnostic -> gate -> plan -> execution, each a named artifact:
#   1. gini_micro(df, key) is the fleet-level PRESCREEN (exact integer
#      micro-Gini, the skew_gini_coefficient formula) — cheap to rank
#      many tables by concentration and decide which to inspect;
#   2. the GATE is needs_salting(): does ANY key exceed the per-slice
#      row target? Gini alone cannot gate — it measures relative
#      concentration, so one 30%-hot key among 200k uniform cold keys
#      reads "only" ~0.35 while its task runs 13x the mean (measured:
#      tools/skew_probe.py at 20M rows — salting cut max-task runtime
#      2.4x on a corpus BELOW the 0.40 Gini line). Absolute per-key
#      volume, not relative inequality, is what melts a reducer;
#   3. plan_salts() emits ceil(n/target) per hot key (the
#      skew_salting_plan shape, heavy-hitter-sized and broadcastable) —
#      the gate and the plan are the same aggregate, so gating is free;
#   4. salted_join_planned() executes with PER-KEY salt factors — hot
#      keys spread across exactly their planned slices, cold keys pay
#      zero replication (vs salted_join's uniform n_salts, which
#      replicates the whole dim n times).
# End-to-end wall-clock evidence: tools/skew_probe.py, table in
# SCALE.md §r9; per-task balance pinned in tests/test_skew_validation.py.

GINI_SALT_TRIGGER_MICRO = 400_000  # prescreen: Gini >= 0.40 -> inspect


def needs_salting(df: DataFrame, key: str, target_rows: int) -> bool:
    """The salting GATE: true iff some key's row count exceeds the
    per-slice target (== :func:`plan_salts` would be non-empty). One
    aggregate whose result the plan reuses."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > target_rows)
        .take(1)
    ) != []


def gini_micro(df: DataFrame, key: str) -> int:
    """Exact integer micro-Gini of per-``key`` row counts (0 uniform,
    -> 1e6 concentrated): G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over
    counts ranked ascending, every term BIGINT, half-up division —
    the skew_gini_coefficient discipline on an arbitrary frame.

    Σi·x is computed over the COUNT-OF-COUNTS frame, not per key
    (ADVICE r9: a high-cardinality key column made the diagnostic's
    own global rank window a straggler): keys sharing a count value x
    occupy a consecutive rank block [R+1, R+m], and since their x is
    equal, Σi·x over the block is x·(m·R + m(m+1)/2) regardless of
    order within the tie — identical to the per-key ranking, exactly.
    The one remaining global window runs over DISTINCT count values
    (≤ a few thousand for any realistic corpus, vs n keys before);
    every term stays BIGINT."""
    from pyspark.sql import Window

    per_key = df.groupBy(key).agg(F.count("*").alias("x"))
    coc = per_key.groupBy("x").agg(F.count("*").cast("bigint").alias("m"))
    w = (
        Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = coc.withColumn(
        "r0", F.coalesce(F.sum("m").over(w), F.lit(0)).cast("bigint")
    )
    row = blocks.agg(
        F.sum("m").cast("bigint").alias("n"),
        F.sum(F.col("x") * F.col("m")).cast("bigint").alias("sx"),
        F.sum(
            F.expr("x * (m * r0 + (m * (m + 1)) div 2)")
        ).cast("bigint").alias("six"),
    ).select(
        F.expr(
            "(2 * 1000000 * (2 * six - (n + 1) * sx) + n * sx)"
            " div (2 * n * sx)"
        ).cast("bigint").alias("g")
    ).first()
    return int(row["g"])


def plan_salts(
    df: DataFrame, key: str, target_rows: int
) -> DataFrame:
    """(key, n_rows, salt_factor) for every key whose row count
    exceeds ``target_rows``: salt_factor = ceil(n/target) via the
    integer identity (n + t - 1) div t. Heavy-hitter-sized output —
    broadcast it into :func:`salted_join_planned`."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > target_rows)
        .withColumn(
            "salt_factor",
            F.expr(f"(n_rows + {target_rows} - 1) div {target_rows}").cast(
                "int"
            ),
        )
    )


def salted_join_planned(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_row_key: str,
    plan: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with PER-KEY salt factors from ``plan`` (the
    :func:`plan_salts` shape). Hot keys split into exactly
    ``salt_factor`` slices; keys absent from the plan get factor 1 —
    no dim replication, no extra shuffle width. Row-identical to the
    plain join for the fact-preserving modes (same restriction as
    :func:`salted_join`).

    Scale: the plan is heavy-hitter-sized, so both plan joins are
    broadcasts; the only big-data movement is the one fact shuffle on
    (key, salt) — which is the point."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join_planned: how={how!r} would duplicate unmatched "
            f"dim rows across salts; use one of {sorted(allowed)}"
        )
    p = F.broadcast(plan.select(on, "salt_factor"))
    f = (
        fact.join(p, on, "left")
        .withColumn("_sf", F.coalesce("salt_factor", F.lit(1)))
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(fact_row_key)), F.col("_sf")).cast("int"),
        )
        .drop("salt_factor", "_sf")
    )
    d = (
        dim.join(p, on, "left")
        .withColumn("_sf", F.coalesce("salt_factor", F.lit(1)))
        .withColumn(
            # generators can't nest in expressions; _sf is int so the
            # sequence elements are already int
            "_salt",
            F.explode(F.sequence(F.lit(0), F.col("_sf") - 1)),
        )
        .drop("salt_factor", "_sf")
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, group_col: str, value_col: str, n_salts: int = 8
) -> DataFrame:
    """count(DISTINCT value) per group without routing any group's full
    value set through one reducer: phase 1 dedups (group, value) pairs
    shuffled on (group, salt-of-value); phase 2 sums per-salt distinct
    counts (a value lands in exactly one salt, so the sum is exact)."""
    salted = with_salt(df.select(group_col, value_col), value_col, n_salts)
    per_salt = (
        salted.dropDuplicates([group_col, "_salt", value_col])
        .groupBy(group_col, "_salt")
        .agg(F.count("*").alias("_n"))
    )
    return per_salt.groupBy(group_col).agg(
        F.sum("_n").alias(f"n_distinct_{value_col}")
    )
