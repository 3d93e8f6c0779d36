"""Bucketed co-located join: SCALE.md claims bucketing both sides of
lineitem⋈orders by orderkey turns the sort-merge join's two exchanges
into zero — this test proves it on real bucketed tables."""

from __future__ import annotations

import pytest

from wiki_data_pipeline_spark.io import read_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    """Write lineitem + orders bucketed by the join key (8 buckets)."""
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); dropped on teardown.
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    read_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("li_bucketed")
    read_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("ord_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    """Both sides bucketed on the key → join plan contains NO Exchange
    (the shuffle SCALE.md promises to eliminate at 100 TB)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            spark.table("li_bucketed").l_orderkey
            == spark.table("ord_bucketed").o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the unbucketed equivalent DOES shuffle
        li = read_table(spark, sf_dir, "lineitem")
        orders = read_table(spark, sf_dir, "orders")
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        # same row count either way
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
