"""CDC changelog operators: latest-state compaction and MERGE-upsert
(SURVEY.md §2.11 state-log family — the batch re-expression of the
reference's mutate-state-per-row queue/checkpoint rewrite loop,
src/wiki_data_processor.py; instead of rewriting state on every row,
the log is append-only and state is DERIVED).

One definition shared by the registered queries (`cdc_latest_state`,
`cdc_merge_apply` ride these; `cdc_merge_plan` rides `compact_latest`)
and by the cross-engine fuzz in tests/test_cdc_fuzz.py, which drives
random changelogs — equal-version ties, delta-only keys, state-only
keys, stale out-of-order replays, empty sides — through the SAME code
path and asserts both DuckDB row-for-row equality and the
merge ≡ recompute law: MERGE(latest(hist), latest(delta)) must equal
latest(hist ∪ delta) exactly.

Scale shape: compaction is ONE hash aggregate with map-side partials
(never a row_number window sort); the merge is a key-equi full-outer
join of two ≤|keys| tables — the delta never joins raw events, and the
merged table writes without any sort. Full-outer cannot broadcast; the
shuffle is on the compacted key tables, the smallest possible input.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def version_struct(
    version: Sequence[str], payload: Sequence[str] = ()
) -> Column:
    """A struct whose FIELD ORDER makes struct comparison be version
    comparison: version columns lead, payload trails. The version order
    must be total (e.g. a unique id as the last column) for the winner
    to be deterministic; payload fields after a total version are never
    reached by the comparison."""
    return F.struct(*version, *payload)


def compact_latest(
    changelog: DataFrame,
    key: str = "user_id",
    version: Sequence[str] = ("ts", "event_id"),
    payload: Sequence[str] = ("event_type", "value"),
    out: str = "v",
) -> DataFrame:
    """(key, out) with out = the version-leading struct of the per-key
    LATEST row — max(struct) over one hash aggregate."""
    return changelog.groupBy(key).agg(
        F.max(version_struct(version, payload)).alias(out)
    )


def merge_latest(
    state: DataFrame,
    delta: DataFrame,
    key: str = "user_id",
    state_col: str = "hv",
    delta_col: str = "dv",
    out: str = "m",
) -> DataFrame:
    """MERGE INTO over two compacted latest-state frames: insert where
    state had no key, update where the delta wins the version order,
    retain state where the delta is a stale replay (the case naive
    upserts corrupt), keep untouched keys. Both inputs carry one row
    per key with a version-leading struct column (compact_latest's
    shape)."""
    hv, dv = F.col(state_col), F.col(delta_col)
    return state.join(delta, on=key, how="full_outer").select(
        key,
        F.when(hv.isNull(), dv)        # insert
        .when(dv.isNull(), hv)         # untouched
        .when(dv > hv, dv)             # update
        .otherwise(hv)                 # stale_skip
        .alias(out),
    )
