"""Date-partitioned parquet layout writer (reference K1/L4 scaled up:
src/azure_manager.py:37-44 writes ``batch_NNN/`` directories purely by
arrival order — at 100 TB the layout that actually matters is
PREDICATE-ALIGNED physical partitioning, so time-ranged queries prune
whole directories instead of listing/reading every file).

Design choices, each load-bearing at scale:

- ``partitionBy(date_col)``: Hive-style ``event_date=YYYY-MM-DD/``
  directories; any reader filtering on the partition column gets
  partition pruning (PartitionFilters in the scan node — zero I/O for
  pruned dates) for free, from Spark, DuckDB, Trino, etc.
- pre-shuffle by the partition column before the write: without it,
  every task holding rows of D dates opens D files → tasks × dates
  small files (the classic small-file explosion); with it, each date's
  rows are co-located so each date directory gets ~1 file per shuffle
  partition holding that date.
- ``maxRecordsPerFile`` caps file size from above; AQE coalescing
  bounds file count from below — together they keep files in the
  'hundreds of MB' sweet spot that object stores and scan planners
  want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    out_dir: str,
    ts_col: str = "ts",
    date_col: str = "event_date",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write ``df`` as parquet partitioned by the date of ``ts_col``.

    Idempotent per run (``overwrite``); on a cluster the same call
    targets abfs:// / s3:// paths unchanged."""
    dated = df.withColumn(date_col, F.date_format(F.date_trunc("day", ts_col), "yyyy-MM-dd"))
    (
        dated.repartition(date_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(date_col)
        .parquet(out_dir)
    )


def read_pruned(
    spark: SparkSession, out_dir: str, date_col: str, date_value: str
) -> DataFrame:
    """Read one date partition; the filter resolves against the Hive
    partition column so the scan lists only that directory."""
    return spark.read.parquet(out_dir).filter(F.col(date_col) == date_value)
