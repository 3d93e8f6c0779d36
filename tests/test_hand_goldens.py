"""Hand-computed golden fixtures (r9 verdict item 5).

The DuckDB oracles for several operator families were DERIVED FROM THE
SAME DESIGN as the Spark plans (fixed-point components, packing
offsets, CDC merge, as-of/range joins, shingle overlap): a subtly
wrong shared formula would pass parity on both engines. These goldens
break the shared assumption: 5–10 row inputs written inline, expected
outputs computed BY HAND from first principles and written as
literals — the pattern of the reference's test_pipeline.py:119-126
(literal in → literal out). If a golden and the parity harness ever
disagree, the golden wins: it has no code in common with either
engine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def rows(df, *cols):
    """Sorted list of plain tuples for literal comparison."""
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


# ---------------------------------------------------------------------
# connected components (fixed-point) — plans/llm_ops.py
# ---------------------------------------------------------------------


def test_golden_min_label_components(spark):
    """Edges 1-2, 2-3 (path), 5-6 (pair), 7-8-9 (cycle). By hand:
    component labels are the min node id reachable: {1,2,3}->1,
    {5,6}->5, {7,8,9}->7."""
    from wiki_data_pipeline_spark.plans.llm_ops import _min_label_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 8), (8, 9), (9, 7)], "a long, b long"
    )
    got = rows(_min_label_components(pairs, "a", "b"), "node", "lbl")
    assert got == [
        (1, 1), (2, 1), (3, 1),
        (5, 5), (6, 5),
        (7, 7), (8, 7), (9, 7),
    ]


# ---------------------------------------------------------------------
# packing offsets — operators/packing.py
# ---------------------------------------------------------------------


def test_golden_global_offsets(spark):
    """Exclusive prefix sum in doc_id order of sizes 5,3,0,7,2:
    starts are 0, 5, 8, 8, 15 (the 0-size row consumes nothing)."""
    from wiki_data_pipeline_spark.operators.packing import with_global_offsets

    df = spark.createDataFrame(
        [(10, 5), (20, 3), (30, 0), (40, 7), (50, 2)], "doc_id long, n long"
    )
    got = rows(with_global_offsets(df, "doc_id", "n"), "doc_id", "start")
    assert got == [(10, 0), (20, 5), (30, 8), (40, 8), (50, 15)]


def test_golden_stream_offsets(spark):
    """Per-stream exclusive prefix sums: en sizes 4,6,2 -> 0,4,10;
    fr sizes 3,5 -> 0,3."""
    from wiki_data_pipeline_spark.operators.packing import with_stream_offsets

    df = spark.createDataFrame(
        [("en", 1, 4), ("en", 2, 6), ("fr", 1, 3), ("en", 3, 2), ("fr", 2, 5)],
        "lang string, seq long, n long",
    )
    got = rows(
        with_stream_offsets(df, "lang", "seq", "n"),
        "lang", "seq", "offset_tokens",
    )
    assert got == [
        ("en", 1, 0), ("en", 2, 4), ("en", 3, 10),
        ("fr", 1, 0), ("fr", 2, 3),
    ]


def test_golden_bin_spans(spark):
    """cap=10. [0,10) -> bin0:10. [10,35) -> bin1:10, bin2:10, bin3:5.
    [35,40) -> bin3:5. n=0 occupies no bin (the phantom-bin hazard)."""
    from wiki_data_pipeline_spark.operators.packing import with_bin_spans

    df = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 25), (3, 35, 5), (4, 40, 0)],
        "doc long, start long, n long",
    )
    got = rows(with_bin_spans(df, 10), "doc", "bin_id", "tokens_in_bin")
    assert got == [
        (1, 0, 10),
        (2, 1, 10), (2, 2, 10), (2, 3, 5),
        (3, 3, 5),
    ]


# ---------------------------------------------------------------------
# CDC latest-state + merge — operators/cdc.py
# ---------------------------------------------------------------------


def test_golden_cdc_compact_latest(spark):
    """u1's latest is (ts=5, event_id=2) — the equal-ts tie resolves
    on event_id, NOT insertion order; u2 has one row."""
    from wiki_data_pipeline_spark.operators.cdc import compact_latest

    log = spark.createDataFrame(
        [
            ("u1", 5, 1, "a", 10),
            ("u1", 5, 2, "b", 20),
            ("u1", 3, 9, "c", 30),
            ("u2", 7, 1, "d", 40),
        ],
        "user_id string, ts long, event_id long, event_type string, value long",
    )
    out = compact_latest(log).select(
        "user_id", F.col("v.event_type").alias("t"), F.col("v.value").alias("x")
    )
    assert rows(out, "user_id", "t", "x") == [("u1", "b", 20), ("u2", "d", 40)]


def test_golden_cdc_merge_latest_stale_replay(spark):
    """MERGE by hand: k1 untouched -> s1; k2's delta (ts4) is a STALE
    replay of state (ts5) -> retain s2 (the case naive upsert corrupts);
    k3 is an insert -> d3."""
    from wiki_data_pipeline_spark.operators.cdc import (
        compact_latest,
        merge_latest,
    )

    state_log = spark.createDataFrame(
        [("k1", 2, 1, "s1", 0), ("k2", 5, 3, "s2", 0)],
        "user_id string, ts long, event_id long, event_type string, value long",
    )
    delta_log = spark.createDataFrame(
        [("k2", 4, 9, "d_stale", 0), ("k3", 1, 1, "d3", 0)],
        "user_id string, ts long, event_id long, event_type string, value long",
    )
    state = compact_latest(state_log, out="hv")
    delta = compact_latest(delta_log, out="dv")
    out = merge_latest(state, delta).select(
        "user_id", F.col("m.event_type").alias("t")
    )
    assert rows(out, "user_id", "t") == [
        ("k1", "s1"), ("k2", "s2"), ("k3", "d3")
    ]


# ---------------------------------------------------------------------
# as-of + range joins — operators/joins.py
# ---------------------------------------------------------------------


def test_golden_asof_join_both_directions(spark):
    """Right rows at ts 0,5,7. Backward (latest right.ts <= left.ts):
    1->a, 5->b (equal-ts MATCHES), 10->c. Forward (earliest right.ts
    >= left.ts): 1->b? no — earliest >= 1 is 5 -> b; 5->b (tie);
    10->None (nothing at or after 10)."""
    from wiki_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("k", 1), ("k", 5), ("k", 10)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 0, "a"), ("k", 5, "b"), ("k", 7, "c")],
        "key string, ts long, val string",
    )
    back = asof_join(left, right, "key", "ts", "val", "backward")
    assert rows(back, "ts", "val") == [(1, "a"), (5, "b"), (10, "c")]
    fwd = asof_join(left, right, "key", "ts", "val", "forward")
    assert rows(fwd, "ts", "val") == [(1, "b"), (5, "b"), (10, None)]


def test_golden_bucketed_range_join_boundaries(spark):
    """start_open=True, end_open=False => (start, end] by hand:
    interval (10, 20] with width 7 (buckets cut at 7,14,21 — edges
    inside the interval): 10 out, 11 in, 14 in (bucket edge), 20 in,
    21 out."""
    from wiki_data_pipeline_spark.operators.joins import bucketed_range_join

    points = spark.createDataFrame(
        [("k", 10), ("k", 11), ("k", 14), ("k", 20), ("k", 21)],
        "key string, ts long",
    )
    iv = spark.createDataFrame(
        [("k", 10, 20, "I")], "key string, lo long, hi long, tag string"
    )
    out = bucketed_range_join(
        points, iv, "key", "ts", "lo", "hi", 7,
        start_open=True, end_open=False,
    )
    assert rows(out, "ts", "tag") == [(11, "I"), (14, "I"), (20, "I")]


def test_golden_bucketed_range_join_past_2_53(spark):
    """Regression for the double-division bucket bug (r8 advice):
    at |values| > 2^53 a floor-through-double can shift a row one
    bucket over and silently DROP matches. base = 2^60; interval
    (base+500, base+1500], width 1000. By hand: base+500 out (open
    start), base+501 in, base+1500 in (closed end), base+1501 out."""
    from wiki_data_pipeline_spark.operators.joins import bucketed_range_join

    base = 1 << 60
    points = spark.createDataFrame(
        [("k", base + d) for d in (500, 501, 1500, 1501)],
        "key string, ts long",
    )
    iv = spark.createDataFrame(
        [("k", base + 500, base + 1500, "I")],
        "key string, lo long, hi long, tag string",
    )
    out = bucketed_range_join(
        points, iv, "key", "ts", "lo", "hi", 1000,
        start_open=True, end_open=False,
    )
    assert rows(out, "ts", "tag") == [
        (base + 501, "I"), (base + 1500, "I")
    ]


# ---------------------------------------------------------------------
# shingle overlap / jaccard / containment — operators/dedup.py
# ---------------------------------------------------------------------


def test_golden_pairwise_jaccard_containment(spark):
    """3-gram shingles by hand: A='a b c d' -> {abc, bcd}; B='a b c e'
    -> {abc, bce}; C='x y z w' -> disjoint. Overlap(A,B): c=1, n_a=2,
    n_b=2 -> Jaccard 1/(2+2-1)=1/3, containment 1/min(2,2)=1/2.
    Disjoint pairs never materialize. D='a b' (<3 tokens) shingles
    nothing."""
    from wiki_data_pipeline_spark.operators.dedup import (
        pairwise_containment,
        pairwise_jaccard,
        pairwise_shingle_overlap,
    )

    corpus = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w"), (4, "a b")],
        "doc_id long, text string",
    )
    ov = rows(
        pairwise_shingle_overlap(corpus), "doc_a", "doc_b", "c", "n_a", "n_b"
    )
    assert ov == [(1, 2, 1, 2, 2)]
    jac = rows(pairwise_jaccard(corpus, 0.3), "doc_a", "doc_b", "jaccard")
    assert jac == [(1, 2, 1 / 3)]
    cont = rows(
        pairwise_containment(corpus, 0.5), "doc_a", "doc_b", "containment"
    )
    assert cont == [(1, 2, 0.5)]


# ---------------------------------------------------------------------
# skew-safe distinct count — operators/skew.py
# ---------------------------------------------------------------------


def test_golden_salted_distinct_count(spark):
    """g1 values {1,2,3} (2 duplicated) -> 3; g2 {5} -> 1. Exact for
    ANY salt count because each value lands in exactly one salt."""
    from wiki_data_pipeline_spark.operators.skew import salted_distinct_count

    df = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", 2), ("g1", 3), ("g2", 5), ("g2", 5)],
        "g string, v long",
    )
    got = rows(salted_distinct_count(df, "g", "v", n_salts=4), "g", "n_distinct_v")
    assert got == [("g1", 3), ("g2", 1)]


# ---------------------------------------------------------------------
# sessionization boundary — operators/sessions.py
# ---------------------------------------------------------------------


def test_golden_session_seq_exact_gap_boundary(spark):
    """gap=1800s. Events at 0, 0 (tie), 1800, 3601. By hand: the
    event at EXACTLY last+gap (1800) MERGES (strict > opens); 3601 is
    1801 after 1800 -> NEW session. Expected session numbers
    1,1,1,2."""
    from wiki_data_pipeline_spark.operators.sessions import with_session_seq

    df = spark.createDataFrame(
        [("u", 0, 1), ("u", 0, 2), ("u", 1800, 3), ("u", 3601, 4)],
        "user_id string, ts long, event_id long",
    )
    got = rows(with_session_seq(df), "event_id", "session_seq")
    assert got == [(1, 1), (2, 1), (3, 1), (4, 2)]


# ---------------------------------------------------------------------
# vector math — functions/vectors.py
# ---------------------------------------------------------------------


def test_golden_cosine(spark):
    """[3,4]·[4,3] = 24, norms 5 and 5 -> cosine exactly 24/25."""
    from wiki_data_pipeline_spark.functions.vectors import cosine

    df = spark.createDataFrame(
        [([3.0, 4.0], [4.0, 3.0])], "a array<double>, b array<double>"
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    assert got == pytest.approx(24 / 25, abs=0, rel=1e-15)


# ---------------------------------------------------------------------
# sorted-array run-length aggregates (r9 map-only rewrites) —
# plans/llm_ops.py quality_gopher_filters, plans/pipeline_ops.py
# text_char_entropy
# ---------------------------------------------------------------------


@pytest.fixture()
def _doc_dir(spark, tmp_path):
    """Write a literal 4-doc documents table and return its sf_dir."""

    def write(texts):
        rows_ = [
            (i, t, "en", "golden", len(t)) for i, t in enumerate(texts, 1)
        ]
        spark.createDataFrame(
            rows_, "doc_id long, text string, lang string, "
            "source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        return str(tmp_path)

    return write


def test_golden_gopher_run_length_metrics(spark, _doc_dir):
    """doc 1: 'the cat the cat the' -> toks [the,cat,the,cat,the]:
    n_words 5, char_sum 3*5=15, mean 3.0, stop_cnt 3 ('the' x3),
    top_cnt 3 (the), bigrams [the cat, cat the, the cat, cat the]:
    n_bi 4, distinct 2, dup ratio (4-2)/4 = 0.5.
    doc 2: 'aa' -> single token: n_words 1, n_bi NULL (no bigrams),
    top_cnt 1, stop 0, mean 2.0; passes is 0 not NULL — the failed
    n_words BETWEEN makes FALSE AND NULL = FALSE (both engines).
    doc 3: 'x y z' -> all distinct: top_cnt 1, n_bi 2, distinct 2,
    dup 0.0."""
    from wiki_data_pipeline_spark.plans.llm_ops import quality_gopher_filters

    sf = _doc_dir(["the cat the cat the", "aa", "x y z"])
    got = {
        r["doc_id"]: r.asDict()
        for r in quality_gopher_filters(spark, sf).collect()
    }
    d1 = got[1]
    assert (d1["n_words"], d1["mean_word_len"], d1["stopword_ratio"]) == (
        5, 3.0, 3 / 5,
    )
    assert (d1["top_unigram_ratio"], d1["dup_bigram_ratio"]) == (3 / 5, 0.5)
    d2 = got[2]
    assert (d2["n_words"], d2["top_unigram_ratio"]) == (1, 1.0)
    assert d2["dup_bigram_ratio"] is None and d2["passes"] == 0
    d3 = got[3]
    assert (d3["top_unigram_ratio"], d3["dup_bigram_ratio"]) == (1 / 3, 0.0)


def test_golden_char_entropy_run_length(spark, _doc_dir):
    """doc 1 'aab': counts a:2 b:1, n=3. By hand:
    term(a) = round(2/3 * -ln(2/3) * 1e6) = round(0.27031007...e6)
            = 270310; term(b) = round(1/3 * -ln(1/3) * 1e6)
            = round(366204.096...) = 366204; sum 636514, distinct 2.
    doc 2 'zzzz': p=1, -p*ln(p)=0 -> entropy 0, distinct 1.
    doc 3 '' (empty): dropped (oracle generate_series(1,0) is empty)."""
    import math

    from wiki_data_pipeline_spark.plans.pipeline_ops import text_char_entropy

    t_a = round(2 / 3 * -math.log(2 / 3) * 1e6)
    t_b = round(1 / 3 * -math.log(1 / 3) * 1e6)
    sf = _doc_dir(["aab", "zzzz", ""])
    got = {
        r["doc_id"]: r.asDict() for r in text_char_entropy(spark, sf).collect()
    }
    assert got[1] == {
        "doc_id": 1, "n_chars": 3, "n_distinct_chars": 2,
        "entropy_micro": t_a + t_b,
    }
    assert got[2] == {
        "doc_id": 2, "n_chars": 4, "n_distinct_chars": 1, "entropy_micro": 0,
    }
    assert 3 not in got


# ---------------------------------------------------------------------
# segment-blocked Hamming title join — plans/pipeline_ops.py
# ---------------------------------------------------------------------


def test_golden_title_hamming_pigeonhole(spark, tmp_path):
    """Titles are the lowercased first 24 chars. By hand (0-indexed
    diffs vs doc 1 'abcdefgh' + 'ijklmnop' + 'qrstuvwx'):
    doc 2 differs at positions 0 and 23 only -> hamming 2 (segments 2
    of 3 intact: candidate found via middle segment), kept;
    doc 3 differs from doc 1 at one position per segment -> hamming 3:
    no segment matches doc 1, so the pair is never even a candidate —
    but doc 3 vs doc 2 share two segments and differ ONLY at position
    15 -> hamming 1, kept;
    doc 4 is an exact duplicate of doc 1 -> hamming 0, kept (and vs
    doc 2 it mirrors doc 1's hamming 2);
    doc 5 is shorter than 24 chars -> excluded entirely."""
    from wiki_data_pipeline_spark.plans.pipeline_ops import (
        dedup_title_hamming,
    )

    t1 = "abcdefghijklmnopqrstuvwx"
    t2 = "XbcdefghijklmnopqrstuvwZ"   # pos 0, 23 (lowercased x/z)
    t3 = "XbcdefghijklmnoxqrstuvwZ"   # one diff in every segment
    rows_ = [
        (1, t1 + " tail", "en", "g", 29),
        (2, t2 + " tail", "en", "g", 29),
        (3, t3 + " tail", "en", "g", 29),
        (4, t1 + " other tail", "en", "g", 35),
        (5, "short text", "en", "g", 10),
    ]
    spark.createDataFrame(
        rows_, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = rows(
        dedup_title_hamming(spark, str(tmp_path)), "doc_a", "doc_b", "hamming"
    )
    assert got == [(1, 2, 2), (1, 4, 0), (2, 3, 1), (2, 4, 2)]


def test_golden_title_hamming_hierarchical_boundary(spark, tmp_path):
    """r11 verdict item 7: the hierarchical (hot-block) pigeonhole's
    recall guarantee AT ITS BOUNDARY — pairs at exactly
    _TITLE_MAX_HAMMING (= 2) whose mismatches are adversarially spread
    across SEGMENTS and across the COMPLEMENT SUB-PIECES of every
    matching segment, so each pair survives via exactly one sub-key.

    cap=1 makes EVERY multi-row block hot: a singleton block can emit
    no pair, so every discovered pair necessarily traveled the
    second-level (bk, sub_i, sub) path — this pins the hierarchy's
    recall, not the flat join's. Layout (24-char titles, 3 segments of
    8; complement of a matched segment = 16 chars split 6/5/5):

    - d2 vs d1: mismatches at positions 8 and 14 — BOTH in segment 1
      (segments 0 and 2 intact). Via seg 0 the complement subs are
      title[8:14]/[14:19]/[19:24): subs 1+2 hit, sub 3 intact. Via
      seg 2 the complement is title[0:16): subs 2+3 hit, sub 1 intact.
    - d3 vs d1: positions 8 and 19 — segments 1 AND 2 hit (one each),
      only seg 0 intact; its complement subs 1+3 hit, ONLY sub 2
      intact — single-witness recall at the exact boundary.
    - d4 vs d1: positions 14 and 19 — segs 1+2 hit, seg 0's subs 2+3
      hit, only sub 1 intact.
    - d5 vs d1: positions 8, 14 AND 19 — seg 0 matches but ALL THREE
      of its complement subs mismatch: hamming 3, correctly invisible
      to the hot tier (the flat join would candidate-then-reject it;
      either way it must not appear).
    - d6 vs d1: positions 0 and 23 — segs 0+2 hit, seg 1 intact; its
      complement (title[0:8) + title[16:24)) subs: pos 0 in sub 1,
      pos 23 in sub 3, sub 2 (pos 6,7,16,17,18) intact.

    Expected output = brute-force Hamming over all pairs (computed in
    the test, no Spark/engine code shared), and the default-cap (all
    cold, flat join) and planned-salted spellings must emit the
    identical set — tying all three tiers to one semantics."""
    from wiki_data_pipeline_spark.plans.pipeline_ops import (
        _TITLE_MAX_HAMMING,
        _title_candidates_tiered,
        _title_hamming_verify,
        dedup_title_hamming_salted_frame,
        title_segments,
    )

    base = "abcdefghijklmnopqrstuvwx"

    def mutate(positions: dict[int, str]) -> str:
        return "".join(positions.get(i, c) for i, c in enumerate(base))

    titles = {
        1: base,
        2: mutate({8: "1", 14: "2"}),
        3: mutate({8: "3", 19: "4"}),
        4: mutate({14: "5", 19: "6"}),
        5: mutate({8: "7", 14: "8", 19: "9"}),
        6: mutate({0: "0", 23: "z"}),
    }
    docs = spark.createDataFrame(
        [(d, t + " tail", "en", "g", len(t) + 5) for d, t in titles.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def brute() -> list[tuple[int, int, int]]:
        out = []
        ids = sorted(titles)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = sum(x != y for x, y in zip(titles[a], titles[b]))
                if h <= _TITLE_MAX_HAMMING:
                    out.append((a, b, h))
        return sorted(out)

    expected = brute()
    # the adversarial cases really are in the fixture: d3 at the exact
    # boundary, d5 just past it
    assert (1, 3, 2) in expected and (1, 5, 3) not in expected

    segs = title_segments(docs)
    hot = rows(
        _title_hamming_verify(_title_candidates_tiered(segs, cap=1)),
        "doc_a", "doc_b", "hamming",
    )
    assert hot == expected, "hierarchical tier lost a boundary pair"

    flat = rows(
        _title_hamming_verify(_title_candidates_tiered(segs)),
        "doc_a", "doc_b", "hamming",
    )
    assert flat == expected

    salted = rows(
        dedup_title_hamming_salted_frame(docs, target_rows=1),
        "doc_a", "doc_b", "hamming",
    )
    assert salted == expected


# ---------------------------------------------------------------------
# A-ES weighted sampling + CMS join cardinality (r10 verdict item 8):
# the plan and oracle share the md5-jitter / salted-bucket derivation,
# so these literals come from a THIRD implementation — calculator math
# over the published md5 digests, no Spark/DuckDB code in common.
# ---------------------------------------------------------------------

# md5("1")[:8]=c4ca4238 -> u=(3301917240+.5)/2^32=0.7687772 -> -ln(u)=0.2629399...
# keys (-ln(u)/w, micro-rounded):
#   doc 1 w=2   -> 131520      doc 2 w=1 -> 246266
#   doc 3 w=10  ->   7798      doc 4 w=1 -> 418243
#   doc 5 w=100 ->   1121      doc 6 w=5 -> 486574
_ES_DOCS = [
    # (doc_id, lang, n_chars=weight)
    (1, "en", 2), (2, "en", 1), (3, "en", 10),
    (4, "de", 1), (5, "de", 100), (6, "de", 5),
]


def _write_es_docs(spark, tmp_path):
    spark.createDataFrame(
        [(d, "x" * w, lang, "g", w) for d, lang, w in _ES_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def test_golden_weighted_topk(spark, tmp_path, monkeypatch):
    """A-ES global top-k with k=2: ascending key order is
    5 (1121) < 3 (7798) < 1 (131520) < 2 < 4 < 6, so the sample is
    docs {5, 3} with the literal micro keys above — the heavy docs
    (w=100, w=10) win exactly as weight-proportional sampling must."""
    from wiki_data_pipeline_spark.plans import llm_ops

    monkeypatch.setattr(llm_ops, "_ES_SAMPLE_K", 2)
    _write_es_docs(spark, tmp_path)
    got = rows(
        llm_ops.sample_weighted_topk(spark, str(tmp_path)),
        "doc_id", "weight", "es_key_micro",
    )
    assert got == [(3, 10, 7798), (5, 100, 1121)]


def test_golden_weighted_per_stratum(spark, tmp_path, monkeypatch):
    """A-ES per-stratum quota with k=1: within en the min key is
    doc 3 (7798 < 131520 < 246266); within de it is doc 5
    (1121 < 418243 < 486574). Exactly one winner per language."""
    from wiki_data_pipeline_spark.plans import llm_ops

    monkeypatch.setattr(llm_ops, "_ES_STRATUM_K", 1)
    _write_es_docs(spark, tmp_path)
    got = rows(
        llm_ops.sample_weighted_per_stratum(spark, str(tmp_path)),
        "doc_id", "lang", "weight",
    )
    assert got == [(3, "en", 10), (5, "de", 100)]


def test_golden_cms_join_cardinality(spark, tmp_path):
    """l_partkey frequencies 3,2,1 -> true self-join cardinality
    3²+2²+1² = 14. The three keys land in distinct buckets in every
    sketch row (md5('1#r')..('3#r') % 1024 checked off-engine:
    {386,785,108}, {745,593,115}, {468,505,948}), so the inner-product
    estimate is exactly 14 and the one-sided error is 0."""
    from wiki_data_pipeline_spark.plans.pipeline_ops import (
        sketch_cms_join_cardinality,
    )

    spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (2,), (3,)], "l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = rows(
        sketch_cms_join_cardinality(spark, str(tmp_path)),
        "true_card", "est_card", "overestimate",
    )
    assert got == [(14, 14, 0)]
