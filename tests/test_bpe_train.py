"""bpe_train_merges (plans/llm_ops.py): the fixed-round BPE merge
trainer vs an independent in-test reference implementation.

The DuckDB oracle already hash-checks the query cross-engine; these
goldens pin the SEMANTICS both engines implement — frequency-weighted
pair counts over the current segmentation, total-order merge choice
(count desc, then pair text), and greedy left-to-right merge
application (the fold that turns 'aaa' into ['aa', 'a'], never
['a', 'aa'] or ['aa', 'aa']) — against a dict-and-loop trainer that
shares no code with the engine."""

from __future__ import annotations

import random
from collections import Counter

import pytest


def _ref_bpe(
    words: list[str], rounds: int
) -> list[tuple[int, str, str, str, int]]:
    """Reference trainer: Sennrich-style distinct-word BPE."""
    wf = Counter(w for w in words if len(w) >= 2)
    segs = {w: list(w) for w in wf}
    merges = []
    for rnd in range(1, rounds + 1):
        pc: Counter = Counter()
        for w, f in wf.items():
            t = segs[w]
            for i in range(len(t) - 1):
                pc[(t[i], t[i + 1])] += f
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, a, b, a + b, n))
        if rnd == rounds:
            break
        for w, t in segs.items():
            out = [t[0]]
            for x in t[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            segs[w] = out
    return merges


def _fixture(spark, tmp_path_factory, texts: list[str]) -> str:
    root = tmp_path_factory.mktemp("bpe")
    rows = [
        (i, t, "en", "test", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet")
    )
    return str(root)


def _run(spark, sf_dir: str) -> list[tuple]:
    from wiki_data_pipeline_spark.plans.registry import get

    out = get("bpe_train_merges").fn(spark, sf_dir)
    return sorted(
        (r.merge_round, r.lhs, r.rhs, r.merged, r.n_pairs)
        for r in out.collect()
    )


def test_bpe_greedy_overlap_golden(spark, tmp_path_factory):
    """Runs where the greedy fold is the only correct answer: 'aaaa'
    under ('a','a') yields exactly 2 merged pairs, 'aaa' yields 1 —
    a simultaneous (non-greedy) merge would double-count."""
    texts = [
        "aaaa aaa aa",          # 'aa' dominates round 1
        "aaaa abab abab",       # 'ab' chains for later rounds
        "abab baba",
    ]
    sf = _fixture(spark, tmp_path_factory, texts)
    words = [w for t in texts for w in t.lower().split()]
    assert _run(spark, sf) == sorted(_ref_bpe(words, 3))


def test_bpe_tie_break_golden(spark, tmp_path_factory):
    """Equal-count pairs must resolve by pair text on both sides."""
    texts = ["zy zy", "cd cd", "ab ab"]  # three pairs, count 2 each
    sf = _fixture(spark, tmp_path_factory, texts)
    out = _run(spark, sf)
    # round 1 must pick ('a','b') — smallest (l, r) among the tie
    assert out[0] == (1, "a", "b", "ab", 2)
    words = [w for t in texts for w in t.lower().split()]
    assert out == sorted(_ref_bpe(words, 3))


def test_bpe_fuzz_vs_reference(spark, tmp_path_factory):
    rng = random.Random(412)
    alpha = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(60)
    ]
    sf = _fixture(spark, tmp_path_factory, texts)
    words = [w for t in texts for w in t.lower().split()]
    ref = sorted(_ref_bpe(words, 3))
    got = _run(spark, sf)
    assert got == ref, f"spark={got}\nref={ref}"


def test_bpe_degenerate_corpus(spark, tmp_path_factory):
    """Single-char words only: no pairs exist, the trainer emits zero
    merges instead of crashing (the early-exit branch)."""
    sf = _fixture(spark, tmp_path_factory, ["a b c", "d e"])
    assert _run(spark, sf) == []


@pytest.mark.parametrize("rounds_check", [True])
def test_bpe_round_count_and_monotonic_counts(
    spark, tmp_path_factory, rounds_check
):
    """Merge counts never increase across rounds (the chosen pair is
    the global max, and merging can only remove pair mass)."""
    texts = ["the quick brown fox jumps over the lazy dog"] * 5 + [
        "pack my box with five dozen liquor jugs"
    ] * 3
    sf = _fixture(spark, tmp_path_factory, texts)
    out = _run(spark, sf)
    assert [r[0] for r in out] == [1, 2, 3]
    counts = [r[4] for r in out]
    assert counts == sorted(counts, reverse=True)
    words = [w for t in texts for w in t.lower().split()]
    assert out == sorted(_ref_bpe(words, 3))
