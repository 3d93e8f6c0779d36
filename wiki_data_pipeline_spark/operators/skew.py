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
