"""The conditional fan-out gate (operators/spread.py, r13 verdict
item 1): ``spread`` repartitions ONLY an under-partitioned input.

The unconditional form it replaced round-robin-shuffled the full
input in front of ~23 compute-heavy map stages — a wasted full-corpus
exchange on any pre-split (i.e. production) scan. These tests pin the
plan invariant from both sides: a pre-split input passes through
IDENTICALLY (no exchange inserted, same object), while the fixture's
single-split parquet scans still get the fan-out the fixture needs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wiki_data_pipeline_spark.io import read_table
from wiki_data_pipeline_spark.operators.spread import spread

from conftest import SF_DIR


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spread_is_identity_on_presplit_input(spark):
    """An input already at (or above) target parallelism passes
    through untouched — not merely exchange-free, the SAME DataFrame
    object, so no plan node of any kind is inserted. Range sources
    carry their partition count like file splits do."""
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, max(target, 2))
    assert wide.rdd.getNumPartitions() >= target
    out = spread(wide)
    assert out is wide


def test_spread_is_identity_on_post_exchange_input(spark):
    """A frame whose plan already contains an Exchange is returned
    as-is WITHOUT the partition probe: its parallelism belongs to
    that shuffle + AQE, and under AQE the probe itself (df.rdd)
    would materialize the exchange's query stages — a measured extra
    job. Asserted via the job counter: spread() on a post-shuffle
    frame must run zero jobs."""
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup() or [])

    shuffled = spark.range(1_000).groupBy((F.col("id") % 5)).count()
    before = njobs()
    assert spread(shuffled) is shuffled
    assert njobs() == before, "spread() ran a job on a shuffled input"
    # the scan-stage probe is job-free too
    docs = read_table(spark, SF_DIR, "documents")
    before = njobs()
    spread(docs)
    assert njobs() == before, "spread() ran a job probing a scan frame"


def test_spread_fans_out_single_split_input(spark):
    """The fixture case: a single-file parquet scan has one split, and
    spread manufactures full core parallelism via one round-robin
    exchange (this is what keeps explode/md5 pipelines off one core at
    fixture scale)."""
    docs = read_table(spark, SF_DIR, "documents")
    n_in = docs.rdd.getNumPartitions()
    target = spark.sparkContext.defaultParallelism
    if n_in >= target:  # fixture regenerated multi-file: gate flips
        assert spread(docs) is docs
        return
    out = spread(docs)
    assert out.rdd.getNumPartitions() == target
    assert "RoundRobinPartitioning" in _physical(out)


def test_spread_explicit_target(spark):
    df3 = spark.range(0, 100, 1, 3)
    assert spread(df3, target=2) is df3
    assert spread(df3, target=5).rdd.getNumPartitions() == 5


def test_spread_gate_adds_no_exchange_to_presplit_plan(spark):
    """The full plan-invariant: building a spread-fronted pipeline
    over a PRE-SPLIT replica of the documents table yields a physical
    plan with NO round-robin exchange (the scan's own splits stand),
    while the same pipeline over the single-file fixture keeps it."""
    target = spark.sparkContext.defaultParallelism

    def pipeline(df):
        return (
            spread(df)
            .select("doc_id", F.md5("text").alias("h"))
            .groupBy("h")
            .agg(F.count("*").alias("n"))
        )

    # pre-split source with NO exchange of its own: a 64-partition
    # Range scan (numPartitions is a property of the source, the way
    # file splits are for a production parquet scan)
    presplit = spark.range(0, 10_000, 1, max(target, 2)).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    assert "RoundRobinPartitioning" not in _physical(pipeline(presplit))

    single = read_table(spark, SF_DIR, "documents")
    if single.rdd.getNumPartitions() < target:
        assert "RoundRobinPartitioning" in _physical(pipeline(single))


def test_spread_memoizes_equivalent_plans(spark):
    """r14: the probe decision is memoized on (exprId-normalized
    analyzed plan, sizeInBytes, target, maxPartitionBytes) — the
    measured fix for the r13 drift (~115 ms of py4j probing per call
    on every query construction). Two independently-built but
    equivalent frames must share ONE cache entry and the SAME
    decision; a different target must key separately."""
    from wiki_data_pipeline_spark.operators import spread as mod

    mod._clear_decision_cache()
    target = spark.sparkContext.defaultParallelism

    def fresh():
        return read_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        )

    out1 = spread(fresh())
    assert len(mod._DECISIONS) == 1
    out2 = spread(fresh())
    assert len(mod._DECISIONS) == 1  # hit, not a second probe
    # same decision both times (both repartition or both pass)
    assert ("Repartition" in out1._jdf.queryExecution().analyzed().treeString()) == (
        "Repartition" in out2._jdf.queryExecution().analyzed().treeString()
    )
    spread(fresh(), target=target + 7)  # different target -> new key
    assert len(mod._DECISIONS) == 2


def test_spread_memo_keys_on_packing_confs(spark):
    """r15 (ADVICE): the split count is FilePartition packing math, so
    every packing input keys separately — a mid-session change to
    openCostInBytes (or maxPartitionBytes) must MISS the memo, not
    serve the decision computed under the old conf."""
    from wiki_data_pipeline_spark.operators import spread as mod

    mod._clear_decision_cache()
    docs = read_table(spark, SF_DIR, "documents")
    old = spark.conf.get("spark.sql.files.openCostInBytes", None)
    try:
        spread(docs)
        assert len(mod._DECISIONS) == 1
        spark.conf.set("spark.sql.files.openCostInBytes", str(64 << 20))
        spread(read_table(spark, SF_DIR, "documents"))
        assert len(mod._DECISIONS) == 2, (
            "openCostInBytes change reused the stale decision key"
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.openCostInBytes")
        else:
            spark.conf.set("spark.sql.files.openCostInBytes", old)
        mod._clear_decision_cache()


def test_spread_decision_flips_after_layout_rewrite(spark, tmp_path):
    """r15 (verdict item 4): a table rewritten in-process into a
    different number of files — same path, ~same bytes, IDENTICAL plan
    text — must not be served the pre-rewrite decision. File count is
    deliberately not in the memo key (recovering it per call would
    re-introduce the probe cost the memo exists to remove), so the
    rewrite path calls note_layout_rewrite(); this pins both the flip
    and the hook's contract."""
    from wiki_data_pipeline_spark.operators import spread as mod

    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "t.parquet")
    base = spark.range(0, 50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    base.coalesce(1).write.mode("overwrite").parquet(path)

    mod._clear_decision_cache()
    single = spark.read.parquet(path)
    out1 = spread(single)
    assert out1 is not single, "single-file scan should repartition"
    stale_key = next(iter(mod._DECISIONS))

    # rewrite IN PLACE to many files (same rows, plan text identical
    # modulo exprIds; byte size shifts only by per-file footer
    # overhead — the hazard is precisely that the key may not change)
    base.repartition(max(target, 32)).write.mode("overwrite").parquet(path)
    mod.note_layout_rewrite()
    assert not mod._DECISIONS, "rewrite hook must drop ALL decisions"

    multi = spark.read.parquet(path)
    out2 = spread(multi)
    assert out2 is multi, (
        "post-rewrite multi-file scan must pass through — a stale "
        "memoized decision would have repartitioned it"
    )
    # the recomputed decision must not have landed under the stale key
    # with the old value (guards against a future key regression IF
    # the sizes happen to collide)
    if stale_key in mod._DECISIONS:
        assert mod._DECISIONS[stale_key] is True
    mod._clear_decision_cache()
