"""Pins for the ANSI divide-by-zero guards (Spark 4 runs ANSI mode,
where a plain ``/`` throws DIVIDE_BY_ZERO even on doubles — so any
division by a data-derived quantity that CAN be zero is a latent
job-killer at scale; DuckDB NULLs the same division, so try_divide is
the one spelling where both engines agree). The embedding-family twins
live in tests/test_degenerate_embeddings.py; this file pins the
scan-shaped one: a5_progress_pct over an EMPTY events table (a global
aggregate emits its single row even on an empty scan, so count(*)=0
reaches the divisor)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _empty_events(tmp_path) -> str:
    table = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_a5_progress_pct_empty_scan_cross_engine(spark, tmp_path):
    import __spark_entry__ as mod

    sf = _empty_events(tmp_path)
    rows = mod.queries()["a5_progress_pct"](spark, sf).collect()
    assert len(rows) == 1  # global agg emits its row even on nothing
    assert rows[0].total == 0
    assert rows[0].processed is None  # SQL sum over nothing is NULL
    assert rows[0].progress_pct is None  # try_divide, not a crash

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(mod.oracle_sql()["a5_progress_pct"]).fetchall()
    con.close()
    assert len(want) == 1
    # identical degenerate row in DuckDB: (0, NULL, NULL)
    assert want[0][0] == 0
    assert want[0][1] is None and want[0][2] is None
