"""End-to-end batch pipeline — the reference's top-level user API
(src/main.py:194-228 ``run()``: populate → process → validate → batch
→ sink → checkpoint → summary), recomposed as ONE declarative Spark
job over the document corpus.

Reference flow mapped (SURVEY.md §3 entry point 1):

- populate_queue + --limit (S1/L1, src/main.py:63-85)  →  scan +
  ``limit`` pushdown; the work queue IS the incremental scan.
- resume short-circuit (ST2, src/main.py:68-72)  →  high-watermark
  predicate (`streaming/checkpoint.py`): rerun cost ∝ NEW rows only.
- per-row fetch→process→validate loop (src/main.py:99-135)  →  the
  F7 validate split + T1 normalize projection, whole-stage-codegen'd.
- mark_failed dead-letters (ST4, src/main.py:122-133 — the reference
  DROPS the error reason, §2.11)  →  invalid rows keep an ``error``
  column and append to a dead-letter parquet table.
- batch flush + K1 JSON sink (L4/K1, src/main.py:137-142)  →
  `sinks/per_record_json.py` (zipWithIndex consecutive ids,
  batch_NNN dirs, idempotent overwrite).
- final checkpoint + summary (src/main.py:157-167, 213-221)  →
  watermark commit AFTER the sink succeeds (at-least-once +
  idempotent sink ≡ ST3), then an A2-style summary dict.

At 100 TB: everything before the sink is narrow (no shuffle); the
sink's range-repartition is the only exchange. Resume is a pushed-down
range predicate — no driver-side work list, no per-row state writes
(the reference rewrote its queue JSON on EVERY row, §2.11's O(n²)
I/O).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_data_pipeline_spark.functions.text import build_url, is_valid_content
from wiki_data_pipeline_spark.io import read_table
from wiki_data_pipeline_spark.sinks.per_record_json import write_per_record_json
from wiki_data_pipeline_spark.streaming.checkpoint import HighWatermarkCheckpoint


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    limit: int | None = None,
    reset: bool = False,
    batch_size: int = 1000,
    docs: DataFrame | None = None,
) -> dict:
    """Run the article pipeline; returns the summary dict (reference
    src/main.py:213-221 shape). ``docs`` overrides the corpus for
    tests; default reads ``documents`` from ``sf_dir``."""
    ckpt_path = os.path.join(out_dir, "_checkpoint", "progress.json")
    ckpt = HighWatermarkCheckpoint(ckpt_path)
    if reset and os.path.exists(ckpt_path):
        os.remove(ckpt_path)  # reference --reset, src/main.py:244-248

    if docs is None:
        docs = read_table(spark, sf_dir, "documents")
    if limit is not None:
        # L1 early-exit: LocalLimit pushes below the scan; orderBy keeps
        # the "first N" deterministic like the reference's FIFO queue.
        docs = docs.orderBy("doc_id").limit(limit)

    pending = ckpt.incremental(docs, "doc_id")

    valid_pred = is_valid_content("text")
    ok = pending.filter(valid_pred)
    dlq = pending.filter(~valid_pred).select(
        "doc_id",
        "source",
        F.lit("validation_failed: empty or null content").alias("error"),
    )

    title = F.concat(F.lit("Doc "), F.col("doc_id"))
    normalized = ok.select(
        "doc_id",
        title.alias("title"),
        build_url(title).alias("url"),
        F.col("text").alias("content"),
        F.lit(None).cast("string").alias("author"),
        F.length("text").cast("bigint").alias("content_length"),
        "lang",
        "source",
    )

    # Continue the global file numbering where the last run stopped
    # (reference L3 consecutive indices across batches/resumes).
    start_index = ckpt.load().total_processed
    n_written = write_per_record_json(
        normalized,
        out_dir,
        order_col="doc_id",
        batch_size=batch_size,
        start_index=start_index,
    )
    n_failed = dlq.count()
    if n_failed:
        dlq.write.mode("append").parquet(os.path.join(out_dir, "_dead_letter"))

    state = ckpt.commit(normalized, "doc_id")
    n_batches = (
        (start_index + n_written - 1) // batch_size - start_index // batch_size + 1
        if n_written
        else 0
    )
    return {
        "processed": n_written,
        "failed": n_failed,
        "batches": n_batches,
        "watermark": state.watermark,
        "total_processed": state.total_processed,
        "runs": state.runs,
        "status": "completed",
    }


def reset_output(out_dir: str) -> None:
    """Full reset (reference reset_checkpoint + reset_all)."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
