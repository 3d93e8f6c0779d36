"""Every registered query must match its DuckDB oracle at sf0.001 —
the local mirror of the driver's CORRECTNESS gate (which runs the same
comparison at sf0.01)."""

from __future__ import annotations

import pytest

# heavy tier (r16): the full 209-query sweep is the same comparison the
# driver's own CORRECTNESS gate runs every round (at sf0.01); builders
# run it before shipping (pytest -m heavy), the default tier keeps the
# targeted parity guards (hand goldens, fuzz, adversarial fixtures)
pytestmark = pytest.mark.heavy

from wiki_data_pipeline_spark.plans.registry import all_oracles, all_queries
from wiki_data_pipeline_spark.testing import compare_query

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, name, sf_dir)
    assert res.ok, f"{name}: {res.details}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_coverage_total():
    """Oracle-discipline meta-test: EVERY registered query has a
    DuckDB oracle — the rows-only set is empty, so every row the
    driver samples can read green. (r12: the one historical
    exception, sketch_approx_distinct, became a library-only surface;
    its ε-bound companion sketch_approx_distinct_check is the
    hash-checked row.) A new query landing without an oracle silently
    downgrades its driver check to rows-only; this test makes that a
    conscious, visible decision."""
    assert set(_QUERIES) - set(_ORACLES) == set()


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
