"""Cross-engine fuzzing for the exact n-gram dedup operators
(operators/dedup.py — the code path dedup_ngram_jaccard /
dedup_ngram_containment and, via word_shingles, the whole shingle
stack ride). The fixed sf fixtures exercise one corpus shape; here a
seeded corpus forces the boundary shapes where tokenization and
set-overlap semantics hide off-by-ones: empty / whitespace-only text,
documents BELOW the shingle width (must produce no shingles, not a
partial one), exactly-width documents (exactly one shingle),
all-duplicate-token documents (array_distinct collapse), whitespace
runs and tab/newline separators including a LEADING tab (trim only
strips spaces — both engines must keep the resulting empty token),
identical documents (Jaccard exactly 1.0), and a short document
embedded in a long one (containment 1.0 while Jaccard is small).

Pairs are compared against a DuckDB mirror on (doc_a, doc_b, c, n_a,
n_b) — the exact integer counts — so a score mismatch can't hide in
float formatting; the operator's derived jaccard/containment columns
are checked against the Python ratio of those integers."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from wiki_data_pipeline_spark.operators.dedup import (
    pairwise_containment,
    pairwise_jaccard,
    pairwise_shingle_overlap,
    word_shingles,
)

SEED = 0xDED0
VOCAB = ["w0", "w1", "w2", "w3", "w4", "w5"]


def _gen_corpus(rng: random.Random, n: int = 3) -> pd.DataFrame:
    rows = [
        (0, ""),                      # empty
        (1, "   "),                   # whitespace-only
        (2, "w0"),                    # below width for every n tested
        (3, "w0 w1"),                 # below width for n=3/4
        (4, "w0 w0 w0 w0 w0"),        # one distinct shingle after dedup
        (5, "w0 w1 w2"),              # exactly one 3-shingle
        (6, "  w0\tw1\nw2  w3 "),     # whitespace-run separators
        (7, "\tw0 w1 w2"),            # leading tab -> empty first token
        (8, "w1 w2 w3 w4 w5"),        # identical pair: jaccard == 1
        (9, "w1 w2 w3 w4 w5"),
        (10, "w0 w1 w2 w3"),          # short core ...
        (11, "w5 w5 w0 w1 w2 w3 w4 w4 w4"),  # ... embedded in long
    ]
    doc_id = 12
    # Length and vocab scale with the shingle width so every n gets
    # real collision structure (wider shingles collide less).
    for _ in range(40):
        k = rng.randint(0, 10 + 4 * n)
        sep = rng.choice([" ", "  ", " \t"])
        rows.append(
            (doc_id, sep.join(rng.choice(VOCAB[:4]) for _ in range(k)))
        )
        doc_id += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _duck_overlap(pdf: pd.DataFrame, n: int):
    terms = " || ' ' || ".join(f"tokens[i+{j}]" for j in range(n))
    con = duckdb.connect()
    con.register("corpus", pdf)
    rows = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
          FROM corpus
        ),
        sh AS (
          SELECT DISTINCT doc_id,
            unnest(list_transform(
              generate_series(1, len(tokens) - {n - 1}), i -> {terms}
            )) AS shingle
          FROM tok WHERE len(tokens) >= {n}
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, c, sa.n AS n_a, sb.n AS n_b
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        """
    ).fetchall()
    con.close()
    return sorted(tuple(t) for t in rows)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_pairwise_overlap_fuzz_vs_duckdb(spark, n):
    pdf = _gen_corpus(random.Random(SEED + n), n)
    df = spark.createDataFrame(pdf, "doc_id BIGINT, text STRING")
    got = sorted(
        (r.doc_a, r.doc_b, r.c, r.n_a, r.n_b)
        for r in pairwise_shingle_overlap(df, n).collect()
    )
    want = _duck_overlap(pdf, n)
    assert len(want) > 30  # the generator produced real pair structure
    assert got == want
    # derived scores are the exact ratios of those integers
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in pairwise_jaccard(df, 0.0, n).collect()
    }
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in pairwise_containment(df, 0.0, n).collect()
    }
    for doc_a, doc_b, c, n_a, n_b in want:
        assert jac[(doc_a, doc_b)] == c / (n_a + n_b - c)
        assert cont[(doc_a, doc_b)] == c / min(n_a, n_b)


def test_shingle_and_score_pinned_boundaries(spark):
    """Deterministic micro-cases pinning what the fuzz relies on."""
    pdf = _gen_corpus(random.Random(SEED))
    df = spark.createDataFrame(pdf, "doc_id BIGINT, text STRING")

    sh = word_shingles(df.filter("doc_id < 12"), 3)
    per_doc = {
        r.doc_id: r.cnt
        for r in sh.groupBy("doc_id").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    # sub-width docs produce NO shingles (absent, not zero-row)
    for short_id in (0, 1, 2, 3):
        assert short_id not in per_doc
    # all-duplicate tokens collapse to one distinct shingle
    assert per_doc[4] == 1
    # exactly-width doc: exactly one shingle
    assert per_doc[5] == 1
    # leading tab keeps the empty token: 4 tokens -> 2 shingles
    assert per_doc[7] == 2

    # identical docs: jaccard exactly 1.0
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in pairwise_jaccard(df, 0.0).collect()
    }
    assert jac[(8, 9)] == 1.0
    # embedded short doc: containment exactly 1.0, jaccard well below
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in pairwise_containment(df, 0.0).collect()
    }
    assert cont[(10, 11)] == 1.0
    assert jac[(10, 11)] < 0.5

    with pytest.raises(ValueError, match="n must be"):
        word_shingles(df, 0)


def test_min_label_components_fuzz_vs_union_find(spark):
    """The shared min-label fixpoint core vs a Python union-find, over
    seeded random pair graphs: planted multi-pair clusters, chains
    (short of the round cap), stars, isolated pairs, and a dense
    collision blob — the r11 fused round (one join + one aggregate,
    first round folded into init) must label every node with its
    component's minimum id, for every graph shape."""
    import random

    from wiki_data_pipeline_spark.plans.llm_ops import _min_label_components

    rng = random.Random(0xC0C0)
    for trial in range(6):
        n_nodes = rng.randint(4, 60)
        nodes = list(range(0, n_nodes * 10, 10))
        pairs = set()
        # random edges
        for _ in range(rng.randint(1, n_nodes)):
            a, b = rng.sample(nodes, 2)
            pairs.add((min(a, b), max(a, b)))
        # a planted chain (diameter ≤ 12, under the 20-round cap)
        chain = rng.sample(nodes, min(12, n_nodes))
        pairs.update(
            (min(x, y), max(x, y)) for x, y in zip(chain, chain[1:])
        )
        # a planted star
        hub, *leaves = rng.sample(nodes, min(6, n_nodes))
        pairs.update((min(hub, l), max(hub, l)) for l in leaves)

        # ground truth: union-find
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = sorted((x, find(x)) for x in parent)

        sdf = spark.createDataFrame(
            sorted(pairs), "doc_a BIGINT, doc_b BIGINT"
        )
        got = sorted(
            (r["node"], r["lbl"])
            for r in _min_label_components(sdf, "doc_a", "doc_b").collect()
        )
        assert got == want, f"trial {trial}: {got[:5]} vs {want[:5]}"


def test_min_label_components_raises_on_round_exhaustion(spark):
    """A chain deeper than the 20-round cap must raise, not silently
    return unconverged labels (the star twin covers such graphs in
    O(log²) rounds)."""
    import pytest as _pytest

    from wiki_data_pipeline_spark.plans.llm_ops import _min_label_components

    deep = [(i, i + 1) for i in range(40)]  # path graph, diameter 40
    sdf = spark.createDataFrame(deep, "doc_a BIGINT, doc_b BIGINT")
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        _min_label_components(sdf, "doc_a", "doc_b").collect()
