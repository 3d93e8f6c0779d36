"""End-to-end skew validation (r9 verdict item 4): the decision rule
diagnostic -> trigger -> plan -> execution, pinned on a REAL hot-key
corpus (one key owns 30% of all rows), plus the per-task balance claim
the salted path exists for. Wall-clock evidence (plain vs salted vs
AQE max-task-runtime) is measured by tools/skew_probe.py and recorded
in SCALE.md — this file pins everything deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wiki_data_pipeline_spark.operators.skew import (
    GINI_SALT_TRIGGER_MICRO,
    gini_micro,
    needs_salting,
    plan_salts,
    salted_join,
    salted_join_planned,
)

N_ROWS = 100_000
HOT_SHARE = 0.30
N_COLD_KEYS = 5_000
TARGET = 1_000


@pytest.fixture(scope="module")
def hot_fact(spark):
    """100k fact rows: key 0 owns 30%, the rest uniform over 5k keys.
    row_id is the unique per-row salt source."""
    n_hot = int(N_ROWS * HOT_SHARE)
    return (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS)))
            .cast("long")
            .alias("key"),
            (F.col("id") % 97).alias("payload"),
        )
        .localCheckpoint()  # freeze: both join paths see identical rows
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(N_COLD_KEYS + 1).select(
        F.col("id").alias("key"), (F.col("id") * 3).alias("dim_val")
    )


def test_skew_gate_and_gini_prescreen(spark, hot_fact):
    """The GATE (needs_salting: any key past the per-slice target)
    fires on the hot corpus and stays quiet on a uniform one. The
    Gini prescreen agrees here (5k cold keys) — but the gate, not
    Gini, is the decision: gini is RELATIVE concentration and reads
    below the prescreen line when the same 30%-hot key hides among
    200k cold keys (measured in tools/skew_probe.py at 20M rows,
    where salting still cut max-task runtime 2.4x)."""
    assert needs_salting(hot_fact, "key", TARGET)
    g_hot = gini_micro(hot_fact, "key")
    assert g_hot >= GINI_SALT_TRIGGER_MICRO, g_hot
    uniform = spark.range(N_ROWS).select(
        F.col("id").alias("row_id"),
        F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS)).alias("key"),
    )
    assert not needs_salting(uniform, "key", TARGET)
    g_uni = gini_micro(uniform, "key")
    assert g_uni < GINI_SALT_TRIGGER_MICRO // 2, g_uni
    # the shape Gini under-fires on: same 30%-hot key, but the cold
    # mass spread at ~50 rows/key (the probe's 20M/200k shape scaled
    # down preserving rows-per-cold-key — low cold-side inequality
    # pulls the corpus Gini under the prescreen line while the hot
    # task is still 400x the target)
    many_cold = spark.range(N_ROWS).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < int(N_ROWS * HOT_SHARE), F.lit(0))
        .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(1_400)))
        .alias("key"),
    )
    assert gini_micro(many_cold, "key") < GINI_SALT_TRIGGER_MICRO
    assert needs_salting(many_cold, "key", TARGET)  # the gate still fires


def test_salting_plan_targets_only_hot_keys(hot_fact):
    """By hand: the hot key has 30,000 rows -> ceil(30000/1000) = 30
    slices; cold keys average 14 rows — far under target — so the
    plan contains EXACTLY the hot key (zero replication tax on the
    cold 99.98%)."""
    plan = plan_salts(hot_fact, "key", TARGET).collect()
    assert len(plan) == 1
    row = plan[0]
    assert row["key"] == 0
    assert row["n_rows"] == 30_000
    assert row["salt_factor"] == 30


def test_planned_salted_join_row_identical(spark, hot_fact, dim):
    """salted_join_planned == plain join, row-for-row (inner + left),
    on the hot corpus — the correctness half of the skew story."""
    plan = plan_salts(hot_fact, "key", TARGET)
    for how in ("inner", "left"):
        plain = hot_fact.join(dim, "key", how)
        salted = salted_join_planned(
            hot_fact, dim, "key", "row_id", plan, how
        )
        cols = sorted(plain.columns)
        assert sorted(salted.columns) == cols
        a = sorted(map(tuple, plain.select(*cols).collect()))
        b = sorted(map(tuple, salted.select(*cols).collect()))
        assert a == b, f"{how}: salted join diverged from plain join"


def test_per_task_balance_plain_vs_salted(spark, hot_fact):
    """The balance half: rows-per-shuffle-partition (the task input
    under hash partitioning) for the three fact-side routings.
    Plain key partitioning routes the whole hot key through ONE task
    (max share >= 30%); planned salting caps every task near the
    uniform share; uniform n_salts=32 salting likewise. Deterministic:
    hash partitioning of fixed data."""
    n_parts = 32

    def max_partition_rows(df, *cols) -> int:
        return (
            df.repartition(n_parts, *cols)
            .withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    plain_max = max_partition_rows(hot_fact, F.col("key"))
    assert plain_max >= N_ROWS * HOT_SHARE  # the hot task

    plan = plan_salts(hot_fact, "key", TARGET)
    planned_fact = (
        hot_fact.join(F.broadcast(plan.select("key", "salt_factor")), "key", "left")
        .withColumn("_sf", F.coalesce("salt_factor", F.lit(1)))
        .withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.col("_sf")))
    )
    salted_max = max_partition_rows(planned_fact, F.col("key"), F.col("_salt"))
    mean = N_ROWS / n_parts
    assert salted_max <= 3 * mean, (
        f"salted max-partition {salted_max} vs mean {mean:.0f} — "
        "the planned salts did not spread the hot key"
    )
    # and the salted path is strictly, massively better than plain
    assert salted_max * 3 < plain_max


def test_uniform_salted_join_row_identical(spark, hot_fact, dim):
    """The fixed-n_salts operator on the same corpus (the pre-r9
    uniform path): still row-identical to the plain join."""
    plain = sorted(
        map(tuple, hot_fact.join(dim, "key").select("row_id", "dim_val").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(hot_fact, dim, "key", "row_id", n_salts=8)
            .select("row_id", "dim_val")
            .collect(),
        )
    )
    assert plain == salted


def test_title_hamming_salted_on_hot_segment_corpus(spark, tmp_path):
    """The r9 verdict's documented-but-unwired hazard, now wired: a
    synthesized corpus where ONE title segment value owns 30% of all
    documents (boilerplate 'aaaaaaaa' prefix). The planned-salted
    candidate join must be row-identical to the plain one (salting is
    row-invisible), and the salting plan must bound every slice of the
    hot block near the per-slice target instead of leaving one
    quadratic 300-row block."""
    import hashlib

    from wiki_data_pipeline_spark.plans.pipeline_ops import (
        dedup_title_hamming,
        dedup_title_hamming_salted_frame,
        title_segments,
    )

    n_docs, n_hot, target = 1_000, 300, 64

    def title(i: int) -> str:
        h = hashlib.md5(str(i).encode()).hexdigest()
        return ("aaaaaaaa" + h[:16]) if i < n_hot else h[:24]

    rows_ = [(i, title(i) + " tail", "en", "g", 29) for i in range(n_docs)]
    spark.createDataFrame(
        rows_,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))

    # 1. row-invisibility: salted ≡ plain on the skewed corpus
    plain = sorted(
        map(tuple, dedup_title_hamming(spark, str(tmp_path)).collect())
    )
    salted = sorted(
        map(
            tuple,
            dedup_title_hamming_salted_frame(docs, target_rows=target)
            .collect(),
        )
    )
    assert plain == salted

    # 2. the plan fires on exactly the hot segment and sizes it
    segs = title_segments(docs)
    plan = {
        r.bk: (r.n_rows, r.salt_factor)
        for r in plan_salts(segs, "bk", target).collect()
    }
    assert plan == {"0:aaaaaaaa": (n_hot, -(-n_hot // target))}  # ceil -> 5

    # 3. bounded max-block probe: after planned salting, no
    # (block key, salt) slice is materially above the per-slice target
    # (hash-split variance allowed; the unsalted block was 300)
    sliced = (
        segs.join(
            F.broadcast(
                spark.createDataFrame(
                    [(k, f) for k, (_, f) in plan.items()],
                    "bk string, salt_factor int",
                )
            ),
            "bk",
            "left",
        )
        .withColumn("_sf", F.coalesce("salt_factor", F.lit(1)))
        .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.col("_sf")))
        .groupBy("bk", "_salt")
        .count()
    )
    max_slice = sliced.agg(F.max("count")).first()[0]
    assert max_slice <= 2 * target, (
        f"max salted slice {max_slice} not bounded near target {target}"
    )


def test_title_hamming_salted_fires_on_mid_hot_block(spark, tmp_path):
    """r10 composition coverage: a block BETWEEN the salting target
    (64) and the refinement cap (256) stays in the cold tier, where
    the planned salting must engage (150 rows -> 3 slices) and remain
    row-invisible vs the plain tiered query."""
    import hashlib

    from wiki_data_pipeline_spark.operators.skew import plan_salts
    from wiki_data_pipeline_spark.plans.pipeline_ops import (
        dedup_title_hamming,
        dedup_title_hamming_salted_frame,
        title_segments,
    )

    n_docs, n_hot, target = 400, 150, 64

    def title(i: int) -> str:
        h = hashlib.md5(str(i).encode()).hexdigest()
        return ("bbbbbbbb" + h[:16]) if i < n_hot else h[:24]

    rows_ = [(i, title(i) + " tail") for i in range(n_docs)]
    rows_.append((n_docs, title(3) + " tail"))  # planted exact dup
    spark.createDataFrame(rows_, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))

    plan = {
        r.bk: (r.n_rows, r.salt_factor)
        for r in plan_salts(title_segments(docs), "bk", target).collect()
    }
    assert plan["0:bbbbbbbb"] == (n_hot + 1, 3)  # the salting engages

    plain = sorted(
        map(tuple, dedup_title_hamming(spark, str(tmp_path)).collect())
    )
    salted = sorted(
        map(
            tuple,
            dedup_title_hamming_salted_frame(
                docs, target_rows=target
            ).collect(),
        )
    )
    assert plain == salted and (3, n_docs, 0) in set(plain)


def test_title_hamming_tiered_prunes_hot_block_candidates(spark, tmp_path):
    """The r10 hierarchical pigeonhole (total-work fix for the sf1
    gate's exponent-1.86 finding): with one segment value owning a
    600-doc block (cap 256), the tiered candidate set must (a) verify
    to exactly the flat spelling's output — double pigeonhole keeps
    recall GUARANTEED — and (b) be materially smaller than the flat
    join's n² block (the hot block fragments by its complement
    chars)."""
    import hashlib

    from wiki_data_pipeline_spark.plans.pipeline_ops import (
        _title_candidates_tiered,
        _title_hamming_verify,
        _title_pair_join,
        title_segments,
    )

    n_hot = 600

    def title(i: int) -> str:
        return "aaaaaaaa" + hashlib.md5(str(i).encode()).hexdigest()[:16]

    rows_ = [(i, title(i) + " tail") for i in range(n_hot)]
    # planted near-dups INSIDE the hot block: one exact copy of doc 0's
    # title and one 2-char complement perturbation of doc 1's — the
    # pairs the refinement must not lose
    rows_.append((n_hot, title(0) + " tail"))
    t1 = title(1)
    rows_.append((n_hot + 1, t1[:10] + "zz" + t1[12:] + " tail"))
    docs = spark.createDataFrame(rows_, "doc_id long, text string")

    segs = title_segments(docs)
    flat_cand = _title_pair_join(segs, "bk").distinct()
    tiered_cand = _title_candidates_tiered(segs, cap=256)

    flat_out = sorted(map(tuple, _title_hamming_verify(flat_cand).collect()))
    tiered_out = sorted(
        map(tuple, _title_hamming_verify(tiered_cand).collect())
    )
    assert tiered_out == flat_out
    assert (n_hot, 0, 0) in {(b, a, h) for a, b, h in tiered_out} or (
        0,
        n_hot,
        0,
    ) in set(tiered_out)
    assert (1, n_hot + 1, 2) in set(tiered_out)

    n_flat = flat_cand.count()  # ~ C(602, 2) from the hot block
    n_tiered = tiered_cand.count()
    assert n_flat > 150_000
    assert n_tiered < n_flat / 100, (
        f"refinement did not fragment the hot block: {n_tiered} vs "
        f"{n_flat} flat candidates"
    )


def test_gini_count_of_counts_matches_per_key_ranking(spark):
    """r10 rewrite equivalence pin: the count-of-counts Σi·x (tie
    blocks contribute x·(m·R + m(m+1)/2)) must equal the per-key
    row_number ranking on a frame dense with ties."""
    from pyspark.sql import Window

    # counts per key: 1,1,1,2,2,5  (ties everywhere)
    rows_ = (
        [(k, 0) for k in (1, 2, 3)]
        + [(k, 0) for k in (4, 5) for _ in range(2)]
        + [(6, 0)] * 5
    )
    df = spark.createDataFrame(rows_, "key long, v int")
    got = gini_micro(df, "key")

    per_key = df.groupBy("key").agg(F.count("*").alias("x"))
    ranked = per_key.withColumn(
        "i", F.row_number().over(Window.orderBy("x", "key"))
    )
    row = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("six"),
    ).select(
        F.expr(
            "(2 * 1000000 * (2 * six - (n + 1) * sx) + n * sx)"
            " div (2 * n * sx)"
        ).alias("g")
    ).first()
    assert got == int(row["g"])
    # and by hand: x asc = [1,1,1,2,2,5], Σx=12, Σi·x=1+2+3+8+10+30=54,
    # G = (2·54 − 7·12)/(6·12) = 24/72 = 1/3 -> 333333 micro
    assert got == 333333


def test_title_hamming_tiered_fuzz_vs_brute_force(spark):
    """Seeded fuzz over the WHOLE tiering lattice (r11 — guards future
    cap/target changes the way the hand goldens guard the boundary):
    random corpora over a 3-letter alphabet (forcing heavy segment
    collisions) with planted near-dup clusters, checked at caps
    {1, 2, 8, 64, default} for the plain tiered join and at
    (target, cap) ∈ {(1, 8), (8, 64)} for the salted twin — every
    spelling must equal an in-test brute-force Hamming scan (no
    Spark/engine code shared with the oracle)."""
    import random

    from wiki_data_pipeline_spark.plans.pipeline_ops import (
        _TITLE_LEN,
        _TITLE_MAX_HAMMING,
        _title_candidates_tiered,
        _title_hamming_verify,
        dedup_title_hamming_salted_frame,
        title_segments,
    )

    rng = random.Random(0x7171)
    alphabet = "abc"
    bases = [
        "".join(rng.choice(alphabet) for _ in range(_TITLE_LEN))
        for _ in range(6)
    ]
    titles: dict[int, str] = {}
    for d in range(120):
        t = list(rng.choice(bases))
        for _ in range(rng.randrange(0, 4)):  # 0-3 mutations
            t[rng.randrange(_TITLE_LEN)] = rng.choice(alphabet)
        titles[d] = "".join(t)

    expected = sorted(
        (a, b, sum(x != y for x, y in zip(titles[a], titles[b])))
        for a in titles
        for b in titles
        if a < b
        and sum(x != y for x, y in zip(titles[a], titles[b]))
        <= _TITLE_MAX_HAMMING
    )
    assert len(expected) > 50  # the corpus really is collision-heavy

    docs = spark.createDataFrame(
        [(d, t + " tail") for d, t in titles.items()],
        "doc_id long, text string",
    )
    segs = title_segments(docs)

    def got(df):
        return sorted(map(tuple, df.collect()))

    for cap in (1, 2, 8, 64, None):
        cand = (
            _title_candidates_tiered(segs)
            if cap is None
            else _title_candidates_tiered(segs, cap=cap)
        )
        assert got(_title_hamming_verify(cand)) == expected, f"cap={cap}"

    for target in (1, 8):
        assert (
            got(dedup_title_hamming_salted_frame(docs, target_rows=target))
            == expected
        ), f"salted target={target}"
