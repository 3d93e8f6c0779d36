"""Per-batch streaming progress emitter (reference
``src/logging_manager.py:84-88`` console-progress surface mapped to
Spark's native observability hook).

The reference logs one progress line per processed page batch
(``log_progress``: items done, rate). The Spark-first analog is a
``StreamingQueryListener``: the engine already emits a structured
progress event per micro-batch, so the emitter just records it — no
instrumentation inside job code, works for every query in the session
at once.

Rows are appended driver-side to an in-memory list and (optionally) a
JSONL metrics file; ``metrics_df`` reloads the file as a typed
DataFrame for the "metrics table" view. The listener deliberately does
NOT touch the SparkSession inside callbacks — Python listener
callbacks run on a separate delivery thread, and launching jobs from
there can deadlock the stream that is being observed.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_name STRING, query_id STRING, run_id STRING, batch_id BIGINT, "
    "event_ts STRING, num_input_rows BIGINT, input_rows_per_second DOUBLE, "
    "process_rows_per_second DOUBLE, trigger_duration_ms BIGINT, "
    "watermark STRING, state_rows_total BIGINT"
)


class ProgressRecorder(StreamingQueryListener):
    """Session-wide per-batch progress recorder.

    Usage::

        rec = ProgressRecorder(metrics_path="/tmp/metrics.jsonl")
        spark.streams.addListener(rec)
        ...run streaming jobs...
        rec.wait_for_rows(1)          # listener delivery is async
        spark.streams.removeListener(rec)

    Each micro-batch produces one row: (query_name, batch_id,
    num_input_rows, rates, trigger duration, watermark, state rows) —
    the same fields the reference prints per page batch, plus the
    streaming-specific ones it can't see.
    """

    def __init__(self, metrics_path: str | None = None) -> None:
        self.metrics_path = metrics_path
        self.rows: list[dict[str, Any]] = []
        self.lifecycle: list[tuple[str, str]] = []  # (event, query_id)
        self._lock = threading.Lock()
        self._have_rows = threading.Event()

    # -- listener callbacks (async delivery thread) --------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.lifecycle.append(("started", str(event.id)))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = sum(
            (s.numRowsTotal or 0) for s in (p.stateOperators or [])
        )
        row = {
            "query_name": p.name,
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": p.batchId,
            "event_ts": p.timestamp,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "process_rows_per_second": p.processedRowsPerSecond,
            "trigger_duration_ms": (p.durationMs or {}).get(
                "triggerExecution"
            ),
            "watermark": (p.eventTime or {}).get("watermark"),
            "state_rows_total": state_rows,
        }
        with self._lock:
            self.rows.append(row)
            if self.metrics_path:
                with open(self.metrics_path, "a", encoding="utf-8") as f:
                    f.write(json.dumps(row) + "\n")
        self._have_rows.set()

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.lifecycle.append(("terminated", str(event.id)))
        self._have_rows.set()

    # -- driver-side helpers -------------------------------------------
    def wait_for_rows(self, n: int = 1, timeout: float = 30.0) -> bool:
        """Block until ≥n progress rows arrived (delivery is async)."""
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                if len(self.rows) >= n:
                    return True
            self._have_rows.wait(0.2)
            self._have_rows.clear()
        with self._lock:
            return len(self.rows) >= n

    def wait_for_terminated(
        self, query_id: str, timeout: float = 30.0
    ) -> bool:
        """Block until the terminated lifecycle event for ``query_id``
        arrives. The listener bus delivers a query's events in order,
        so terminated arriving guarantees every progress event for that
        query was already recorded — the correct barrier before
        detaching the listener. (``wait_for_rows(1)`` only proves the
        FIRST micro-batch landed; an availableNow run over many source
        files produces several, and later async events would be
        silently dropped.)"""
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                if ("terminated", query_id) in self.lifecycle:
                    return True
            self._have_rows.wait(0.2)
            self._have_rows.clear()
        with self._lock:
            return ("terminated", query_id) in self.lifecycle

    def snapshot(self) -> list[dict[str, Any]]:
        with self._lock:
            return list(self.rows)


def metrics_df(spark: SparkSession, metrics_path: str) -> DataFrame:
    """Load the JSONL metrics file as a typed DataFrame (the 'metrics
    table'). Explicit schema: json inference would type empty files as
    corrupt-record and rates as strings."""
    if not os.path.exists(metrics_path):
        return spark.createDataFrame([], PROGRESS_SCHEMA)
    return spark.read.schema(PROGRESS_SCHEMA).json(metrics_path)
