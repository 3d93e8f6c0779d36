"""Cross-engine fuzzing for the packing operators
(operators/packing.py — the code path l3_global_index_scalable /
pack_sequences_concat / pack_training_sequences ride). The fixture
corpus has benign token counts; here seeded adversarial corpora force
every boundary shape — ZERO-token docs (where Spark's
``sequence(first, last)`` would run DESCENDING and fabricate phantom
bins without the operator's n>0 guard), docs exactly cap / cap±1 /
several-caps wide, offsets landing exactly on bin edges, empty inputs,
many range partitions on tiny data — and three properties are asserted:

1. cross-engine: (doc, bin, tokens_in_bin) equals a DuckDB
   prefix-sum + generate_series mirror, row for row;
2. conservation: every bin except the last is exactly full (cap
   tokens) and the per-bin totals sum to the corpus token count;
3. the size=None path IS zipWithIndex: equal to row_number()-1.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd

from wiki_data_pipeline_spark.operators.packing import (
    with_bin_spans,
    with_global_offsets,
    with_stream_offsets,
)

SEED = 0x9ACC
CAP = 8
# adversarial size palette: zero-width, unit, exactly-cap, straddlers,
# several-caps-wide — duplicated so each shape recurs many times
SIZES = [0, 0, 1, 1, CAP - 1, CAP, CAP, CAP + 1, 2 * CAP, 3 * CAP + 1, 2, 5]


def _gen_docs(rng: random.Random, n_docs: int = 200) -> pd.DataFrame:
    rows = [(i, rng.choice(SIZES)) for i in range(n_docs)]
    # guarantee a zero-size doc sitting EXACTLY on a bin edge: doc -1
    # first with size 0 (start 0 ≡ bin edge 0)
    rows.insert(0, (-1, 0))
    return pd.DataFrame(rows, columns=["doc_id", "n"])


def _duck_spans(docs: pd.DataFrame, cap: int):
    con = duckdb.connect()
    con.register("docs", docs)
    rows = con.execute(
        f"""
        WITH c AS (
          SELECT doc_id, n,
            CAST(COALESCE(SUM(n) OVER (
              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS BIGINT) AS start
          FROM docs
        ),
        x AS (
          -- n > 0 mirrors the operator's guard. A NAIVE mirror is
          -- inconsistent for zero-width docs: mid-bin the series
          -- collapses to ONE element (a phantom 0-token row) while at
          -- a bin edge it runs descending and vanishes — the fuzz
          -- found exactly this; "no tokens → no bin" is the one
          -- self-consistent semantic, and both engines must opt into
          -- it explicitly.
          SELECT doc_id, n, start,
            unnest(generate_series(start // {cap},
                                   (start + n - 1) // {cap})) AS bin_id
          FROM c
          WHERE n > 0
        )
        SELECT doc_id, CAST(bin_id AS BIGINT),
          CAST(least((bin_id + 1) * {cap}, start + n)
               - greatest(bin_id * {cap}, start) AS BIGINT)
        FROM x
        """
    ).fetchall()
    con.close()
    return sorted(rows)


def test_bin_spans_fuzz_vs_duckdb(spark):
    rng = random.Random(SEED)
    docs = _gen_docs(rng)
    assert (docs["n"] == 0).sum() >= 2  # zero-width docs actually occur
    sdf = spark.createDataFrame(docs, "doc_id BIGINT, n BIGINT")
    started = with_global_offsets(sdf, order="doc_id", size="n", out="start")
    out = with_bin_spans(started, cap=CAP).select(
        "doc_id", "bin_id", "tokens_in_bin"
    )
    got = sorted(tuple(r) for r in out.collect())
    want = _duck_spans(docs, CAP)
    assert got == want

    # conservation laws: interior bins exactly full; totals preserved
    per_bin = {}
    for _, b, t in got:
        assert t > 0
        per_bin[b] = per_bin.get(b, 0) + t
    last_bin = max(per_bin)
    for b, tot in per_bin.items():
        assert tot == CAP or b == last_bin
    assert sum(per_bin.values()) == int(docs["n"].sum())
    # no phantom bins from zero-width docs (the sequence-descending trap)
    doc_ids_out = {d for d, _, _ in got}
    zero_docs = set(docs.loc[docs["n"] == 0, "doc_id"])
    assert doc_ids_out.isdisjoint(zero_docs)


def test_global_offsets_is_zipwithindex(spark):
    """size=None path ≡ row_number()-1, under deliberately many range
    partitions (more partitions than rows in some ranges), plus the
    empty-frame edge."""
    rng = random.Random(SEED + 1)
    ids = rng.sample(range(10_000), 300)
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id BIGINT")
    out = with_global_offsets(
        sdf, order="doc_id", out="global_idx", n_partitions=64
    )
    got = sorted((r.doc_id, r.global_idx) for r in out.collect())
    want = [(d, i) for i, d in enumerate(sorted(ids))]
    assert got == want

    empty = spark.createDataFrame([], "doc_id BIGINT")
    assert with_global_offsets(empty, order="doc_id").count() == 0


def test_global_offsets_on_shuffled_input(spark):
    """Regression: the input is a groupBy OUTPUT wide enough that the
    range exchange reservoir-samples instead of reading partitions
    exhaustively — before the helper pinned its ranged frame with
    localCheckpoint, the psums job and the consuming job drew
    DIFFERENT sampled split bounds (fresh RDD-id seed per evaluation)
    and the broadcast offsets desynchronized: thousands of cums off by
    the number of slipped boundaries (caught at sf0.01 building
    range_partition_plan's quantile stage). Three evaluations of the
    same frame must all equal ground truth."""
    rng = random.Random(SEED + 7)
    # ~15k rows across 32 shuffle partitions ≈ 470/partition, above
    # the per-partition sample cap at 32 output partitions
    vals = [round(rng.uniform(0, 1e6), 2) for _ in range(15_000)]
    sdf = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    counts = sdf.groupBy("x").count()
    out = with_global_offsets(counts, order="x", size="count", out="cb")
    truth = {}
    acc = 0
    for v, c in sorted(
        (r["x"], r["count"]) for r in counts.collect()
    ):
        truth[v] = acc
        acc += c
    for _ in range(3):
        got = out.collect()
        bad = [r for r in got if truth[r["x"]] != r["cb"]]
        assert not bad, f"{len(bad)} desynchronized offsets, e.g. {bad[:3]}"


def test_stream_offsets_fuzz_vs_duckdb(spark):
    """Per-stream exclusive prefix sums + seq_id binning vs DuckDB,
    over streams with 0-size docs, single-doc streams, and sizes that
    land offsets exactly on budget edges."""
    rng = random.Random(SEED + 2)
    rows = []
    for case in range(25):
        for lang in ("aa", "bb", "cc"):
            for d in range(rng.randint(0, 6)):
                rows.append((case, lang, d, rng.choice(SIZES)))
    pdf = pd.DataFrame(rows, columns=["case_id", "lang", "doc_id", "n"])
    sdf = spark.createDataFrame(
        pdf, "case_id BIGINT, lang STRING, doc_id BIGINT, n BIGINT"
    )
    # stream key = (case, lang): unioned cases stay independent streams
    keyed = sdf.selectExpr(
        "concat(case_id, ':', lang) AS stream", "doc_id", "n"
    )
    out = with_stream_offsets(
        keyed, stream="stream", order="doc_id", size="n", out="off"
    )
    got = sorted((r.stream, r.doc_id, r.off) for r in out.collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(
        con.execute(
            """
            SELECT case_id || ':' || lang AS stream, doc_id,
              CAST(COALESCE(SUM(n) OVER (PARTITION BY case_id, lang
                ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS BIGINT) AS off
            FROM t
            """
        ).fetchall()
    )
    con.close()
    assert len(got) > 100
    assert got == want
