"""Parity harness: run a registered query on Spark AND its DuckDB
oracle, compare row-count + schema-insensitive sorted values — a local
mirror of the driver's CORRECTNESS check so failures surface before the
round gate."""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from wiki_data_pipeline_spark.io import TABLES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v):
    if v is None:
        return ("n", "")
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            # own tag: ("f", "nan") made sorted() compare str vs float
            # against ordinary ("f", x) tuples and raise TypeError
            return ("fn", "")
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    if isinstance(v, (_dt.datetime, _dt.date)):
        return ("t", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    return ("s", str(v))


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    details: list[str] = field(default_factory=list)
    # structured flag for artifact writers — consumers must not parse
    # the human-readable details strings
    schema_ok: bool = True


def compare_query(
    spark: SparkSession, name: str, sf_dir: str, max_diff_report: int = 5
) -> ParityResult:
    from wiki_data_pipeline_spark.plans.registry import get

    spec = get(name)
    sdf = spec.fn(spark, sf_dir)
    s_cols = sorted(sdf.columns)
    s_rows = [tuple(_norm(row[c]) for c in s_cols) for row in sdf.collect()]

    con = duck_connect(sf_dir)
    try:
        rel = con.execute(spec.oracle)
        d_cols_raw = [d[0] for d in rel.description]
        d_order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
        d_cols = [d_cols_raw[i] for i in d_order]
        d_rows = [tuple(_norm(r[i]) for i in d_order) for r in rel.fetchall()]
    finally:
        con.close()

    res = ParityResult(name, True, len(s_rows), len(d_rows))
    if s_cols != d_cols:
        res.ok = False
        res.schema_ok = False
        res.details.append(f"columns differ: spark={s_cols} duck={d_cols}")
        return res
    if len(s_rows) != len(d_rows):
        res.ok = False
        res.details.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    s_sorted = sorted(s_rows)
    d_sorted = sorted(d_rows)
    if s_sorted != d_sorted:
        res.ok = False
        shown = 0
        for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
            if a != b:
                res.details.append(f"row[{i}] spark={a}\n        duck ={b}")
                shown += 1
                if shown >= max_diff_report:
                    break
        if not res.details:
            res.details.append("row multiset mismatch (length tail)")
    return res


def pin_using_queries(
    spark,
    sf_dir: str,
    names: list[str] | None = None,
    strict: bool = True,
    errors: dict[str, str] | None = None,
) -> set[str]:
    """The LIVE set of registered queries that route through
    ``operators.pin.pin`` (r13, verdict item 2). Builds every query's
    DataFrame with the pin observer installed — pin() is invoked at
    plan-construction time at every site (eager pins materialize
    there; lazy ones still CALL pin() to wrap the frame), so building
    the frame is sufficient and no query result is consumed. Because
    the hook sits inside the single shared pin() implementation, a new
    call site anywhere in the package is discovered automatically —
    this is what the RELIABLE_PARITY meta-test compares the committed
    artifact against, so a new pin site cannot dodge the per-round
    reliable-tier sweep.

    ``strict=True`` (the meta-test's mode) propagates a query-builder
    exception — a broken builder should fail the test loudly.
    ``strict=False`` (the check_parity --pin-sites tool mode, r13
    review fix) records the error in ``errors`` and CONSERVATIVELY
    includes the failing query in the returned set instead of letting
    one unrelated builder regression block the whole artifact
    regeneration: the sweep then runs it and records the honest err
    row."""
    from wiki_data_pipeline_spark.operators import pin as pin_mod
    from wiki_data_pipeline_spark.plans.registry import all_queries

    queries = all_queries()
    selected = names or list(queries)
    hits: set[str] = set()
    current: dict[str, str] = {}

    def _observe() -> None:
        hits.add(current["name"])

    pin_mod._observer = _observe
    try:
        for name in selected:
            current["name"] = name
            try:
                queries[name](spark, sf_dir)
            except Exception as e:  # noqa: BLE001
                if strict:
                    raise
                if errors is not None:
                    errors[name] = f"{type(e).__name__}: {e}"[:200]
                hits.add(name)
    finally:
        pin_mod._observer = None
    return hits
