"""Sequence-packing / global-offset operators (SURVEY.md §2.6 L3/L4
lineage — the reference's consecutive file indices and fixed-size batch
cutter, src/azure_manager.py:66-67 and src/main.py:137-142 — plus the
concatenate-and-chunk packing a pretraining loader needs).

One definition shared by the registered queries
(`l3_global_index_scalable`, `pack_sequences_concat`,
`pack_training_sequences` ride these) and by the cross-engine fuzz in
tests/test_pack_fuzz.py, which drives adversarial corpora — zero-token
docs, docs wider than the bin capacity, offsets landing exactly on bin
edges, empty inputs — through the SAME code path and asserts both
DuckDB row-for-row equality and the conservation laws (every interior
bin exactly full; token totals preserved).

Scale shapes:
- ``with_global_offsets`` is the two-pass zipWithIndex pattern,
  DataFrame-native: range-partition on the order key (distributed
  sort), per-partition size sums (tiny job — one row per partition,
  the ONLY driver-side state), cumulative offsets broadcast back,
  intra-partition running sum via a per-partition window. Never a
  single-partition global window.
- ``with_stream_offsets`` is one window per stream partition — shuffle
  on the stream key, in-partition sort; at 100 TB shard the stream key
  further (stream, order // N) to bound partition size.
- ``with_bin_spans`` is a narrow sequence+explode fan-out — no
  shuffle; each row emits only the bins it touches.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wiki_data_pipeline_spark.operators.pin import pin


def with_global_offsets(
    df: DataFrame,
    order: str,
    size: Optional[str] = None,
    out: str = "start",
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Adds ``out`` = the GLOBAL running sum, in ``order`` order, of
    ``size`` over all rows strictly before this row (exclusive prefix
    sum). With ``size=None`` every row weighs 1, so ``out`` is the
    0-based global index (zipWithIndex). The order key must be unique
    for the result to be deterministic.

    Two passes: a per-partition reduction (collects #partitions rows,
    never data) feeds broadcast cumulative offsets; the heavy work is
    the range partitioning and one intra-partition window.

    The ranged frame is pinned with ``localCheckpoint`` BEFORE the
    per-partition sums are collected: Spark's range exchange picks its
    split bounds by reservoir-sampling with a fresh seed per
    evaluation (seeded off the new RDD id), so the psums job and the
    returned frame's job would otherwise see DIFFERENT partition
    boundaries and the broadcast offsets silently desynchronize
    (rows slip one partition; every downstream index after the first
    moved boundary is wrong). The fixture SFs masked this — small
    inputs are sampled exhaustively (sample cap ≥ partition rows ⇒
    deterministic bounds) — but any input wide enough for real
    reservoir sampling (e.g. a groupBy output at sf0.01, or ANY input
    at cluster scale) hits it; caught building
    ``range_partition_plan``'s cumulative-quantile stage."""
    spark = df.sparkSession
    n_parts = n_partitions or max(2, spark.sparkContext.defaultParallelism)
    size_col = F.col(size).cast("bigint") if size else F.lit(1).cast("bigint")
    ranged = (
        df.repartitionByRange(n_parts, order)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__sz", size_col)
        .transform(pin)
    )
    psums = (
        ranged.groupBy("__pid").agg(F.sum("__sz").alias("s"))
        .orderBy("__pid").collect()
    )
    offsets, acc = [], 0
    for r in psums:
        offsets.append((r["__pid"], acc))
        acc += int(r["s"])
    off = spark.createDataFrame(offsets, "__pid int, __offset bigint")
    local_before = F.coalesce(
        F.sum("__sz").over(
            Window.partitionBy("__pid")
            .orderBy(order)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("bigint"),
    )
    return (
        ranged.withColumn("__before", local_before)
        .join(F.broadcast(off), on="__pid")
        .withColumn(out, (F.col("__offset") + F.col("__before")).cast("bigint"))
        .drop("__pid", "__sz", "__before", "__offset")
    )


def with_stream_offsets(
    df: DataFrame,
    stream: str,
    order: str,
    size: str,
    out: str = "offset_tokens",
) -> DataFrame:
    """Adds ``out`` = the PER-STREAM exclusive prefix sum of ``size``
    in ``order`` order — the packing offset when each ``stream`` value
    is an independent concatenation (per-language token streams). One
    shuffle on the stream key; the window sorts within partitions."""
    w = (
        Window.partitionBy(stream)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out,
        (F.sum(F.col(size).cast("bigint")).over(w) - F.col(size)).cast("bigint"),
    )


def with_bin_spans(
    df: DataFrame,
    cap: int,
    start: str = "start",
    n: str = "n",
    out_bin: str = "bin_id",
    out_tokens: str = "tokens_in_bin",
) -> DataFrame:
    """Fan each row out to every fixed-``cap`` bin its token interval
    ``[start, start+n)`` touches, with the tokens contributed to each
    bin (concatenate-and-chunk packing: the bin is the training
    sequence). Rows with ``n <= 0`` occupy no bin and are dropped —
    REQUIRED, not an optimization: ``sequence(first, last)`` runs
    DESCENDING when last < first (exactly the n=0, boundary-start
    case), which would fabricate two phantom bins per empty doc.
    Integer ``div`` arithmetic end-to-end."""
    first_bin = F.expr(f"{start} div {cap}")
    last_bin = F.expr(f"({start} + {n} - 1) div {cap}")
    cap_l = F.lit(cap).cast("bigint")
    return (
        df.filter(F.col(n) > 0)
        .select(
            "*", F.explode(F.sequence(first_bin, last_bin)).alias(out_bin)
        )
        .withColumn(out_bin, F.col(out_bin).cast("bigint"))
        .withColumn(
            out_tokens,
            (
                F.least((F.col(out_bin) + 1) * cap_l, F.col(start) + F.col(n))
                - F.greatest(F.col(out_bin) * cap_l, F.col(start))
            ).cast("bigint"),
        )
    )
