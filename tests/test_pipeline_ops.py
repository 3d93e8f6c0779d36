"""Round-5 pipeline_ops: plan-shape pins for the SCALE.md claims and
semantic invariants the DuckDB hash parity can't express (bounds,
monotonicity, policy logic)."""

from __future__ import annotations

import math

from wiki_data_pipeline_spark.plans.registry import get


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Plan shapes.
# ---------------------------------------------------------------------------


def test_bloom_runtime_filter_broadcasts_bits(spark, sf_dir):
    """SCALE.md claims the m-bit filter (and the truth set) broadcast —
    the fact table must never sort-merge on the probe."""
    df = get("join_bloom_runtime_filter").fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_linear_score_is_map_only(spark, sf_dir):
    """The linear model is plan literals — scoring must be shuffle-free
    (no keyed exchange of any kind)."""
    df = get("quality_linear_score").fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_matryoshka_energy_is_map_only(spark, sf_dir):
    df = get("emb_matryoshka_energy").fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_jl_projection_is_map_only(spark, sf_dir):
    df = get("emb_random_projection").fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_mixture_rates_broadcast_back(spark, sf_dir):
    """The 20-row rates table must broadcast over the corpus for the
    sampling pass, never shuffle the corpus on source."""
    df = get("mixture_token_budget").fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_interval_overlap_window_join_is_broadcast(spark, sf_dir):
    """Maintenance windows are few — the session side must meet them
    via broadcast nested loop (range predicate), not a shuffle."""
    df = get("join_interval_overlap").fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------------------
# Semantic invariants.
# ---------------------------------------------------------------------------


def test_bloom_probe_no_false_negatives(spark, sf_dir):
    """Bloom's contract: every true duplicate must hit the filter
    (n_missed_true == 0), and hits ⊇ true dups."""
    row = get("bloom_filter_probe").fn(spark, sf_dir).collect()[0]
    assert row.n_missed_true == 0
    assert row.n_bloom_hits >= row.n_true_dups
    assert row.n_bloom_hits == row.n_true_dups + row.n_false_pos


def test_runtime_filter_supersets_exact_matches(spark, sf_dir):
    """The runtime filter may over-admit (false passes) but never
    under-admit: pass count ⊇ exact-match count."""
    row = get("join_bloom_runtime_filter").fn(spark, sf_dir).collect()[0]
    assert row.n_pass_bloom >= row.n_true_match
    assert row.n_pass_bloom == row.n_true_match + row.n_false_pass
    assert 0 <= row.pass_frac_micro <= 1_000_000


def test_paragraph_dedup_flags_exact_clones(spark, sf_dir):
    """The synthesized exact clones (doc_id 100000+) must show 100%
    duplicated chunks; every fraction must be a valid micro ratio."""
    rows = get("dedup_paragraph_chunks").fn(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    clones = [r for i, r in by_id.items() if 100000 <= i < 100050]
    assert clones and all(r.dup_frac_micro == 1_000_000 for r in clones)
    assert all(0 <= r.dup_frac_micro <= 1_000_000 for r in rows)
    assert all(0 <= r.n_dup_chunks <= r.n_chunks for r in rows)


def test_triangle_closure_bound(spark, sf_dir):
    """Each triangle closes exactly 3 wedges → 3·triangles ≤ wedges;
    the closed fraction is a valid micro ratio."""
    row = get("graph_triangle_stats").fn(spark, sf_dir).collect()[0]
    assert 3 * row.n_triangles <= row.n_wedges
    assert 0 <= row.closed_frac_micro <= 1_000_000


def test_degree_histogram_accounts_all_endpoints(spark, sf_dir):
    """Σ degree·n_nodes = 2·|edges| (handshake lemma vs the triangle
    query's edge count)."""
    hist = get("graph_degree_histogram").fn(spark, sf_dir).collect()
    tri = get("graph_triangle_stats").fn(spark, sf_dir).collect()[0]
    assert sum(r.degree * r.n_nodes for r in hist) == 2 * tri.n_edges
    assert sum(r.n_nodes for r in hist) == tri.n_nodes


def test_ewma_stays_within_window_envelope(spark, sf_dir):
    """A convex combination of window counts must lie within the
    per-type [min, max] daily-count envelope."""
    rows = get("ts_ewma_daily").fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.n_events)
    for r in rows:
        lo = min(by_type[r.event_type]) * 1_000_000
        hi = max(by_type[r.event_type]) * 1_000_000
        assert lo <= r.ewma_micro <= hi, r


def test_gap_fill_is_dense_and_ffilled(spark, sf_dir):
    """One row per (type, minute) over the full day; gap rows carry a
    previously-seen (or zero) value, and n_events>0 rows are not gaps."""
    rows = get("ts_minute_gap_fill").fn(spark, sf_dir).collect()
    per_type: dict[str, int] = {}
    for r in rows:
        per_type[r.event_type] = per_type.get(r.event_type, 0) + 1
        assert (r.n_events == 0) == (r.is_gap == 1)
    assert all(n == 1440 for n in per_type.values()), per_type


def test_snapshot_expiry_policy(spark, sf_dir):
    """Expired snapshots must be outside BOTH retention rules."""
    rows = get("snapshot_expiry_plan").fn(spark, sf_dir).collect()
    latest = max(r.snap_day for r in rows)
    order = sorted(rows, key=lambda r: -r.snap_day)
    recency = {r.snap_day: i + 1 for i, r in enumerate(order)}
    for r in rows:
        if r.action == "expire":
            assert r.snap_day <= latest - 7
            assert recency[r.snap_day] > 3
        else:
            assert r.snap_day > latest - 7 or recency[r.snap_day] <= 3


def test_gini_bounds(spark, sf_dir):
    row = get("skew_gini_coefficient").fn(spark, sf_dir).collect()[0]
    assert 0 <= row.gini_micro < 1_000_000


def test_char_entropy_bounded_by_log_alphabet(spark, sf_dir):
    """0 ≤ H ≤ ln(#distinct chars) (+1 micro slack for the per-term
    rounding)."""
    rows = get("text_char_entropy").fn(spark, sf_dir).collect()
    for r in rows:
        cap = math.log(max(r.n_distinct_chars, 1)) * 1_000_000
        assert -r.n_distinct_chars <= r.entropy_micro <= cap + r.n_distinct_chars, r


def test_rerank_recall_not_worse_than_adc(spark, sf_dir):
    """The exact-rerank stage reorders the SAME ADC candidate pool, so
    vs the exact-cosine truth its top-k can only gain: recall@k of
    rerank ≥ recall@k of raw ADC order."""
    truth = {
        (r.query_id, r.vec_id)
        for r in get("sim_cosine_topk").fn(spark, sf_dir).collect()
    }
    adc = {
        (r.query_id, r.vec_id)
        for r in get("sim_ann_pq_adc").fn(spark, sf_dir).collect()
    }
    rr = {
        (r.query_id, r.vec_id)
        for r in get("sim_ann_pq_rerank").fn(spark, sf_dir).collect()
    }
    assert len(rr & truth) >= len(adc & truth)


def test_range_partition_buckets_cover_all_rows(spark, sf_dir):
    """Bucket occupancies must sum to the table row count and bounds
    must be monotone."""
    from wiki_data_pipeline_spark.io import read_table

    rows = sorted(
        get("range_partition_plan").fn(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    total = read_table(spark, sf_dir, "orders").count()
    assert sum(r.n_rows for r in rows) == total
    bounds = [r.bound_hi for r in rows if r.bound_hi is not None]
    assert bounds == sorted(bounds)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-Min's one-sided guarantee: est ≥ true for every probed
    heavy hitter."""
    rows = get("sketch_count_min_heavy_hitters").fn(spark, sf_dir).collect()
    assert rows
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.est_count >= r.true_count for r in rows)


def test_cms_join_cardinality_never_underestimates(spark, sf_dir):
    """CMS inner product's one-sided guarantee: colliding keys only
    ADD cross terms, so est_card ≥ true_card always — and the true
    F2 is itself ≥ the table row count (every key contributes at
    least f(k) ≥ 1 pair per row)."""
    from wiki_data_pipeline_spark.io import read_table

    [row] = get("sketch_cms_join_cardinality").fn(spark, sf_dir).collect()
    assert row.overestimate >= 0
    assert row.est_card >= row.true_card
    assert row.true_card >= read_table(spark, sf_dir, "lineitem").count()


def test_cdc_merge_apply_equals_recompute(spark, sf_dir):
    """MERGE ≡ RECOMPUTE (the incr_agg_merge discipline): applying the
    delta batch onto the compacted historical state must produce the
    EXACT table cdc_latest_state computes from scratch over the full
    log — same keys, same winning row per key, byte-identical
    formatted payload. An off-by-one in the version comparison (>= vs
    >) or a dropped stale_skip branch breaks this immediately."""
    merged = get("cdc_merge_apply").fn(spark, sf_dir)
    recomputed = get("cdc_latest_state").fn(spark, sf_dir)
    m = sorted(map(tuple, merged.collect()))
    r = sorted(map(tuple, recomputed.collect()))
    assert len(m) == len(r) > 0
    assert m == r


def test_orc_sink_roundtrip(spark, sf_dir, tmp_path):
    """§2.1 sink-format breadth: events survive an ORC write/read
    bit-for-bit (columnar sibling of the parquet path; ORC ships in
    Spark, no extra package)."""
    from wiki_data_pipeline_spark.io import read_table

    events = read_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_orc")
    events.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == events.count()
    assert set(back.columns) == set(events.columns)
    a = {r.event_id: (r.user_id, r.event_type, r.value) for r in events.collect()}
    b = {r.event_id: (r.user_id, r.event_type, r.value) for r in back.collect()}
    assert a == b
