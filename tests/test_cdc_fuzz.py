"""Cross-engine fuzzing for the CDC operators (operators/cdc.py — the
code path cdc_latest_state / cdc_merge_plan / cdc_merge_apply ride).
The fixture queries split the events table at one fixed cutoff; here
seeded random changelogs force every merge class to occur many times —
insert-only keys, state-only (untouched) keys, genuine updates, STALE
out-of-order replays (delta version older than state — the case naive
upserts corrupt), equal-ts ties broken by the unique id, empty hist,
empty delta — and two properties are asserted per corpus:

1. cross-engine: MERGE(latest(hist), latest(delta)) equals DuckDB's
   row_number mirror over hist ∪ delta, row for row;
2. merge ≡ recompute (the law incr_agg_merge established): the same
   merge equals latest(hist ∪ delta) computed by the SAME Spark
   operator in one pass — compaction and merge cannot disagree.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd

from wiki_data_pipeline_spark.operators.cdc import (
    compact_latest,
    merge_latest,
)

SEED = 0xCDC0
N_CASES = 25
_DDL = "case_id BIGINT, user_id BIGINT, ts BIGINT, event_id BIGINT, value DOUBLE"


def _gen_changelog(rng: random.Random):
    """(hist, delta) frames over a tiny (case, key, ts) domain: keys
    from {0..2} and ts from {0..4} guarantee version collisions and
    stale replays; event_id is globally unique (total tie-break), and
    delta ids are all above hist ids (the high-watermark split) while
    ts stays random — so delta rows are regularly OLDER than state."""
    hrows, drows = [], []
    eid = 0
    for case in range(N_CASES):
        n_h = 0 if case == 0 else rng.randint(0, 8)
        for _ in range(n_h):
            hrows.append(
                (case, rng.randint(0, 2), rng.randint(0, 4), eid,
                 float(rng.randint(1, 99)))
            )
            eid += 1
    eid = 10_000  # delta ids strictly above every hist id
    for case in range(N_CASES):
        n_d = 0 if case == 1 else rng.randint(0, 8)
        for _ in range(n_d):
            drows.append(
                (case, rng.randint(0, 2), rng.randint(0, 4), eid,
                 float(rng.randint(1, 99)))
            )
            eid += 1
    cols = ["case_id", "user_id", "ts", "event_id", "value"]
    return pd.DataFrame(hrows, columns=cols), pd.DataFrame(drows, columns=cols)


def _spark_merge(spark, h_pdf, d_pdf):
    key = ["case_id", "user_id"]
    hist = spark.createDataFrame(h_pdf, _DDL)
    delta = spark.createDataFrame(d_pdf, _DDL)
    from pyspark.sql import functions as F

    # compact_latest/merge_latest take a single key column; the fuzz
    # drives the multi-case corpus through them by keying on a struct
    # of (case, user) — same one-aggregate / one-join shapes.
    pack_key = F.struct(*key)

    def pack(df):
        return df.select(pack_key.alias("k"), "ts", "event_id", "value")
    hv = compact_latest(
        pack(hist), key="k", version=("ts", "event_id"),
        payload=("value",), out="hv",
    )
    dv = compact_latest(
        pack(delta), key="k", version=("ts", "event_id"),
        payload=("value",), out="dv",
    )
    merged = merge_latest(hv, dv, key="k")
    rows = merged.select(
        "k.case_id", "k.user_id", "m.event_id", "m.value"
    ).collect()
    return sorted(tuple(r) for r in rows)


def _duck_latest(h_pdf, d_pdf):
    con = duckdb.connect()
    con.register("h", h_pdf)
    con.register("d", d_pdf)
    rows = con.execute(
        """
        SELECT case_id, user_id, event_id, value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY case_id, user_id ORDER BY ts DESC, event_id DESC
          ) AS rn
          FROM (SELECT * FROM h UNION ALL SELECT * FROM d)
        ) WHERE rn = 1
        """
    ).fetchall()
    con.close()
    return sorted(tuple(t) for t in rows)


def test_cdc_merge_fuzz_vs_duckdb_and_recompute(spark):
    rng = random.Random(SEED)
    h_pdf, d_pdf = _gen_changelog(rng)
    assert len(h_pdf) > 50 and len(d_pdf) > 50

    got = _spark_merge(spark, h_pdf, d_pdf)
    want = _duck_latest(h_pdf, d_pdf)
    assert len(want) > 40
    assert got == want

    # merge ≡ recompute, inside Spark itself: compacting the unioned
    # changelog with the SAME operator must give the identical table.
    from pyspark.sql import functions as F

    allrows = spark.createDataFrame(
        pd.concat([h_pdf, d_pdf], ignore_index=True), _DDL
    ).select(
        F.struct("case_id", "user_id").alias("k"), "ts", "event_id", "value"
    )
    recomputed = compact_latest(
        allrows, key="k", version=("ts", "event_id"),
        payload=("value",), out="m",
    )
    rows = recomputed.select(
        "k.case_id", "k.user_id", "m.event_id", "m.value"
    ).collect()
    assert sorted(tuple(r) for r in rows) == got

    # the fuzz actually produced stale replays: some merged winners
    # must come from HIST despite a delta row existing for the key
    # (delta ids are all >= 10_000, so a winner id below that with the
    # key present in delta is a stale_skip).
    delta_keys = {
        (c, u) for c, u in d_pdf[["case_id", "user_id"]].itertuples(
            index=False
        )
    }
    stale = [
        t for t in got if (t[0], t[1]) in delta_keys and t[2] < 10_000
    ]
    assert len(stale) > 5


def test_cdc_merge_pinned_tie_semantics(spark):
    """Equal-ts tie: the higher event_id wins (total version order) —
    so a delta row at the SAME ts as state always wins (its id is
    newer), and a delta row one tick older always loses."""
    from pyspark.sql import functions as F

    def frame(rows, out):
        df = spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["user_id", "ts", "event_id", "value"]
            ),
            "user_id BIGINT, ts BIGINT, event_id BIGINT, value DOUBLE",
        )
        return compact_latest(
            df, key="user_id", version=("ts", "event_id"),
            payload=("value",), out=out,
        )

    hist = frame([(1, 5, 10, 1.0), (2, 5, 11, 2.0), (3, 5, 12, 3.0)], "hv")
    delta = frame(
        [(1, 5, 100, 10.0),   # tie on ts -> delta id wins
         (2, 4, 101, 20.0),   # older ts  -> stale, state retained
         (4, 0, 102, 40.0)],  # new key   -> insert
        "dv",
    )
    got = {
        r["user_id"]: (r["m"]["event_id"], r["m"]["value"])
        for r in merge_latest(hist, delta, key="user_id").collect()
    }
    assert got == {
        1: (100, 10.0),  # update via tie-break
        2: (11, 2.0),    # stale_skip
        3: (12, 3.0),    # untouched
        4: (102, 40.0),  # insert
    }
