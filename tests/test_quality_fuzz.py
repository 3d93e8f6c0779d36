"""Cross-engine fuzzing for the r9 map-only quality rewrites
(plans/llm_ops.py quality_gopher_filters, plans/pipeline_ops.py
text_char_entropy). Both now ride sorted-array run-length aggregates
instead of explode→groupBy, so the computation path shares NOTHING
with the DuckDB oracles beyond the spec — exactly what a fuzz should
exploit. The fixture corpus exercises one text shape; this seeded
corpus forces the boundaries where run-length logic hides off-by-ones:
empty text (gopher keeps the [''] token, entropy drops the doc),
whitespace-only text, single-token and single-char docs, all-same
tokens (one run spanning the whole array), all-distinct tokens (every
run length 1), stopword-only docs, multi-byte unicode (substr/substring
are both character-based), tab/newline separators, and random mixes.

Comparison runs the REGISTERED oracle SQL (registry.all_oracles()) on
the same corpus in DuckDB and demands exact equality — the ratios are
int/int doubles and the entropy terms are micro-quantized BIGINTs, so
bitwise match is the contract, not a tolerance.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from wiki_data_pipeline_spark.plans.registry import all_oracles, all_queries

SEED = 0x9C0F
VOCAB = ["the", "a", "cat", "dog", "ému", "naïve", "w0", "w1"]


def _gen_corpus(rng: random.Random) -> pd.DataFrame:
    rows = [
        (0, ""),                       # empty: gopher [''], entropy drop
        (1, "   "),                    # whitespace-only
        (2, "the"),                    # single stopword token
        (3, "é"),                      # single multi-byte char
        (4, "the the the the the"),    # one run = whole array
        (5, "a b c d e f g"),          # every run length 1
        (6, "  the\tcat\nthe  dog "),  # separator runs
        (7, "aa ab aa ab aa"),         # bigram duplicates
        (8, "ééé naïve ééé"),          # unicode runs
    ]
    doc_id = 9
    for _ in range(40):
        k = rng.randint(1, 30)
        sep = rng.choice([" ", "  ", " \t"])
        rows.append(
            (doc_id, sep.join(rng.choice(VOCAB) for _ in range(k)))
        )
        doc_id += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory) -> str:
    rng = random.Random(SEED)
    pdf = _gen_corpus(rng)
    pdf["lang"] = "en"
    pdf["source"] = "fuzz"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    root = tmp_path_factory.mktemp("quality_fuzz")
    spark.createDataFrame(
        pdf, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet")
    )
    # stash the pandas corpus for the DuckDB side
    pdf.to_parquet(str(root / "_corpus_pd.parquet"))
    return str(root)


def _duck_frame(corpus_dir: str, name: str) -> list[tuple]:
    con = duckdb.connect()
    pdf = pd.read_parquet(f"{corpus_dir}/_corpus_pd.parquet")
    con.register("documents", pdf)
    out = con.execute(all_oracles()[name]).fetch_df()
    cols = sorted(out.columns)
    return sorted(
        tuple(None if pd.isna(v) else v for v in row)
        for row in out[cols].itertuples(index=False, name=None)
    )


def _spark_frame(spark, corpus_dir: str, name: str) -> list[tuple]:
    df = all_queries()[name](spark, corpus_dir)
    cols = sorted(df.columns)
    return sorted(
        tuple(row[c] for c in cols) for row in df.select(cols).collect()
    )


@pytest.mark.parametrize("name", ["quality_gopher_filters", "text_char_entropy"])
def test_fuzz_quality_rewrites_match_oracle(spark, corpus_dir, name):
    got = _spark_frame(spark, corpus_dir, name)
    want = _duck_frame(corpus_dir, name)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float) and isinstance(wv, float):
                # int/int doubles: demand bitwise equality, not isclose
                assert (
                    math.isnan(gv) and math.isnan(wv)
                ) or gv == wv, (g, w)
            else:
                assert gv == wv, (g, w)
