"""Persisted IVF index: build once, probe many (engine extension per
SURVEY.md §2 similarity family — the serving architecture behind the
``sim_ann_ivf`` query, which recomputes its index inline for the
oracle's sake; a deployment builds the index OFFLINE and ships only
probes).

The inverted file is materialized as a Hive-partitioned parquet layout
``postings/cid=<cell>/`` — so "search only the probed cells" is not an
in-plan filter but literal PARTITION PRUNING: a probe reads nprobe
directories and never lists the rest. The same idea at 100 TB: posting
lists are the bucketed artifact; centroids are a broadcast-sized side
table; index build cost (one assignment pass) is amortized over every
query batch. Mirrors the persisted-store discipline of
``streaming.jobs.run_streaming_incremental_dedup``."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wiki_data_pipeline_spark.functions.vectors import as_double, cosine
from wiki_data_pipeline_spark.io import read_table


def build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    centroid_mod: int = 100,
    n_centroids: int = 20,
) -> None:
    """Assign every embedding to its nearest deterministic centroid
    (the first ``n_centroids`` vectors at vec_id % ``centroid_mod``
    == 0 — the k-means stand-in of sim_ann_ivf; k is FIXED, an index
    parameter independent of corpus size, else assignment is
    O(N²/mod)) and persist centroids + cid-partitioned postings."""
    emb = read_table(spark, sf_dir, "embeddings")
    cent = emb.filter(
        (F.col("vec_id") % centroid_mod == 0)
        & (F.col("vec_id") < centroid_mod * n_centroids)
    ).select(F.col("vec_id").alias("cid"), as_double("embedding").alias("ce"))
    v = emb.select("vec_id", as_double("embedding").alias("ve"))
    # Narrow argmax fold over a one-row broadcast centroid array —
    # same ordering as the max_by(cid, struct(s, nc)) aggregate it
    # replaces (see sim_ann_ivf), minus that form's SortAggregate of
    # N·k scored rows, its exchange, and the join back to v for a
    # column the projection already holds.
    cents = cent.agg(
        F.sort_array(F.collect_list(F.struct("cid", "ce"))).alias("cents")
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                F.round(cosine(F.col("ve"), c.ce), 6).alias("s"),
                (-c.cid).alias("nc"),
            ),
        )
    )
    assign = (
        v.crossJoin(F.broadcast(cents))
        .select("vec_id", "ve", best.alias("best"))
        .filter(F.col("best").isNotNull())
        .select("vec_id", "ve", (-F.col("best.nc")).alias("cid"))
    )
    cent.write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))
    (
        assign.repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(index_dir, "postings"))
    )


def probe_ivf(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    nprobe: int | None = None,
    topk: int = 5,
) -> DataFrame:
    """Top-k cosine search over the persisted index for a
    (query_id, qe) DataFrame. The probed-cell restriction reaches the
    postings scan as DYNAMIC partition pruning: the broadcast probe
    set becomes a ``dynamicpruningexpression(cid IN ...)`` partition
    filter, so only probed directories are read and no centroid id is
    collected driver-side. Scoring, rounding
    and tie-breaks replicate sim_ann_ivf exactly; ``nprobe`` defaults
    to the SAME constant the inline query uses so index probes and
    sim_ann_ivf stay result-identical."""
    if nprobe is None:
        from wiki_data_pipeline_spark.plans.llm_ops import _NPROBE

        nprobe = _NPROBE
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    score_qc = F.round(cosine(F.col("qe"), F.col("ce")), 6)
    w_probe = Window.partitionBy("query_id").orderBy(
        score_qc.desc(), F.col("cid")
    )
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "cid")
    )
    # Join-based pruning (r9 verdict item 7): broadcasting the probe
    # set makes Catalyst's Dynamic Partition Pruning inject the
    # broadcast result as a partition filter on the cid-partitioned
    # postings scan (`dynamicpruningexpression(cid IN ...)` in
    # PartitionFilters) — unprobed directories are never read, and no
    # centroid id round-trips through the driver, so a large probe
    # batch stays fully distributed.
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    cand = (
        F.broadcast(probes)
        .join(postings, on="cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "ve")
    )
    scored = cand.join(queries, on="query_id").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("qe"), F.col("ve")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= topk)
