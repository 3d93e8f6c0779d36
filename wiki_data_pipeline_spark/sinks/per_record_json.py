"""One-file-per-record JSON sink (reference K1/K2/T9/L3:
src/azure_manager.py:33-78 — pretty JSON per article at
``batch_{b:03d}/article_{i:06d}.json``, consecutive global indices,
idempotent overwrite).

Scalable indexing: the reference's global counter (and the naive
``row_number()`` over an unpartitioned window) serializes on one
partition. Here indices come from ``zipWithIndex`` — one extra count
job to compute per-partition offsets, then fully parallel writes with
globally consecutive ids. Deterministic order: sort by the order
column first (range partitioning keeps the sort distributed).

Paths are deterministic → re-running after a crash overwrites the same
files (the reference's at-least-once + idempotent-sink story, ST3).
Local filesystem here; on a cluster the same writer targets any
Hadoop-visible path (abfs://, s3://) via fsspec-style mounts."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_per_record_json(
    df: DataFrame,
    out_dir: str,
    order_col: str,
    batch_size: int = 1000,
    indent: int = 2,
    start_index: int = 0,
) -> int:
    """Write each row as a pretty JSON file; returns rows written.

    ``start_index`` continues the global numbering across resumed runs
    (reference ``start_index + i``, src/azure_manager.py:66-67 +
    resume_info's last index) — without it a resume restarts at
    article_000000 and silently overwrites the previous run's files."""
    ordered = df.repartitionByRange(df.rdd.getNumPartitions(), order_col).sortWithinPartitions(
        order_col
    )
    n_written = ordered.rdd.zipWithIndex().mapPartitions(
        _make_writer(out_dir, batch_size, indent, start_index)
    ).sum()
    return int(n_written)


def _make_writer(out_dir: str, batch_size: int, indent: int, start_index: int = 0):
    """Build the partition writer as a self-contained closure
    (cloudpickle by value — workers can't import this package)."""

    def _write(rows):
        import json
        import os

        count = 0
        for row, rel_idx in rows:
            idx = rel_idx + start_index
            batch = idx // batch_size
            d = os.path.join(out_dir, f"batch_{batch:03d}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"article_{idx:06d}.json")
            payload = json.dumps(
                row.asDict(recursive=True),
                ensure_ascii=False,
                indent=indent,
                default=str,
            )
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(payload)
            os.replace(tmp, path)  # atomic, idempotent overwrite (ST3)
            count += 1
        yield count

    return _write
