"""Staleness floor of the coverage-rotation policy (tools/rotation.py).

The driver samples a fixed-size prefix (historically 50) of the
export order each round; ``rotate`` orders stalest-first, which must
guarantee every registered query is re-sampled at least once every
ceil(N/S) rounds. These tests pin that bound by SIMULATING the
driver loop against synthetic artifacts — so a future registry
growth, sample-size change, or rotation edit that silently strands
queries outside the sampling window fails here, not five rounds
later in a judge's audit — and then assert the bound holds on the
repo's REAL artifact history.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from rotation import correctness_history, rotate  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE_SIZE = 50  # the driver's per-round sampling prefix


def _write_artifact(root: str, rnd: int, sampled: list[str]) -> None:
    rows = {
        name: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "spark_rows": 1,
            "oracle_rows": 1,
            "err": None,
        }
        for name in sampled
    }
    with open(os.path.join(root, f"CORRECTNESS_r{rnd}.json"), "w") as fh:
        json.dump(rows, fh)


def _simulate(
    root: str,
    names: list[str],
    n_rounds: int,
    sample: int,
    grow_at: dict[int, list[str]] | None = None,
) -> tuple[dict[str, int], dict[str, int]]:
    """Run the driver loop: rotate, sample the prefix, write the
    artifact. Returns (name -> first round sampled,
    name -> last round sampled)."""
    oracles = {n: "SELECT 1" for n in names}
    first: dict[str, int] = {}
    last: dict[str, int] = {}
    for rnd in range(1, n_rounds + 1):
        for extra in (grow_at or {}).get(rnd, []):
            names = names + [extra]
            oracles[extra] = "SELECT 1"
        order = rotate(list(names), oracles, root)
        assert sorted(order) == sorted(names), "rotation must be a permutation"
        picked = order[:sample]
        _write_artifact(root, rnd, picked)
        for n in picked:
            first.setdefault(n, rnd)
            last[n] = rnd
    return first, last


def test_staleness_bound_steady_state(tmp_path):
    names = [f"q{i:03d}" for i in range(208)]
    bound = math.ceil(len(names) / SAMPLE_SIZE)  # 5 rounds
    _first, last = _simulate(str(tmp_path), names, n_rounds=20, sample=SAMPLE_SIZE)
    assert set(last) == set(names), "every query must eventually be sampled"
    worst = max(20 - rnd for rnd in last.values())
    assert worst < bound, (
        f"staleness {worst} rounds >= bound {bound}: the rotation is "
        "stranding queries outside the sampling window"
    )


def test_staleness_bound_survives_registry_growth(tmp_path):
    """Queries added mid-history (never-sampled) must jump the queue
    and the bound must hold for the grown registry size."""
    names = [f"q{i:03d}" for i in range(180)]
    growth = {8: [f"new{i:02d}" for i in range(40)]}
    first, last = _simulate(
        str(tmp_path), names, n_rounds=20, sample=SAMPLE_SIZE, grow_at=growth
    )
    all_names = names + growth[8]
    bound = math.ceil(len(all_names) / SAMPLE_SIZE)
    assert set(last) == set(all_names)
    # every new query was sampled promptly after landing (round 8):
    # never-sampled names lead the order, 40 < SAMPLE_SIZE fit in one
    new_last_first = max(r for n, r in first.items() if n.startswith("new"))
    assert new_last_first <= 8, "never-sampled queries must lead the order"
    worst = max(20 - rnd for rnd in last.values())
    assert worst < bound


def test_failing_rows_resample_first(tmp_path):
    """A red row leads the next round's order even over never-sampled
    names — failures re-confirm before anything else."""
    names = [f"q{i:03d}" for i in range(60)]
    oracles = {n: "SELECT 1" for n in names}
    _write_artifact(str(tmp_path), 1, names[:50])
    # overwrite one row as failing
    path = os.path.join(str(tmp_path), "CORRECTNESS_r1.json")
    rows = json.load(open(path))
    rows["q007"]["hash_match"] = False
    json.dump(rows, open(path, "w"))
    order = rotate(list(names), oracles, str(tmp_path))
    assert order[0] == "q007"


def test_round_touched_queries_front_the_order(tmp_path):
    """r15 (verdict item 2): a query whose source fingerprint changed
    AFTER its green row must lead the order — ahead of failed rows and
    never-sampled names — and stop fronting once a row postdating the
    change lands."""
    names = [f"q{i:03d}" for i in range(60)]
    oracles = {n: "SELECT 1" for n in names}
    root = str(tmp_path)
    _write_artifact(root, 7, names[:50])  # q000..q049 green at r7
    # q010 rewritten in round 9: fingerprint snapshot records round 9
    snap = {
        "queries": {
            n: {"src_md5": "irrelevant", "round": 9 if n == "q010" else 0}
            for n in names
        }
    }
    with open(os.path.join(root, "PLAN_FINGERPRINTS.json"), "w") as fh:
        json.dump(snap, fh)
    order = rotate(list(names), oracles, root)
    assert order[0] == "q010", (
        "round-touched green row must front the order"
    )
    # never-sampled q050.. follow AFTER the touched query
    assert set(order[1:11]) == set(names[50:60])
    # a failed row still outranks never-sampled, but not the touched
    path = os.path.join(root, "CORRECTNESS_r7.json")
    rows = json.load(open(path))
    rows["q020"]["hash_match"] = False
    json.dump(rows, open(path, "w"))
    order = rotate(list(names), oracles, root)
    assert order[:2] == ["q010", "q020"]
    # a NEW green row at r10 (post-change) retires the fronting
    _write_artifact(root, 10, ["q010", "q020"])
    order = rotate(list(names), oracles, root)
    assert order[0] != "q010"
    assert set(order[:10]) == set(names[50:60]), (
        "after a post-change green row, never-sampled names lead again"
    )


def test_staleness_bound_holds_under_steady_round_touches(tmp_path):
    """r15: fronting steals prefix slots from the stale tail, so the
    staleness guarantee must be re-proven with touches flowing: K
    touches per round leaves S-K slots for the tail, giving bound
    ceil(N/(S-K)). Simulates 25 rounds with 5 rotating touches per
    round and asserts (a) every touched query is sampled the very
    next round — the fronting contract end-to-end — and (b) no query
    goes stale beyond the adjusted bound."""
    names = [f"q{i:03d}" for i in range(200)]
    oracles = {n: "SELECT 1" for n in names}
    root = str(tmp_path)
    touches = 5
    touch_round = {n: 0 for n in names}
    last: dict[str, int] = {}
    n_rounds = 25
    for rnd in range(1, n_rounds + 1):
        # rotate which queries get "edited" this round
        edited = [
            names[((rnd - 1) * touches + j) % len(names)]
            for j in range(touches)
        ]
        for n in edited:
            touch_round[n] = rnd
        snap = {
            "queries": {
                n: {"src_md5": "irrelevant", "round": touch_round[n]}
                for n in names
            }
        }
        with open(
            os.path.join(root, "PLAN_FINGERPRINTS.json"), "w"
        ) as fh:
            json.dump(snap, fh)
        order = rotate(list(names), oracles, root)
        picked = order[:SAMPLE_SIZE]
        # every query touched THIS round with an existing green row
        # must be in this round's sample (fresh never-sampled ones get
        # in via the never-sampled bucket early on)
        if rnd > 4:  # steady state: everything has a row by now
            missing = [n for n in edited if n not in picked]
            assert not missing, (
                f"round {rnd}: touched queries not fronted: {missing}"
            )
        _write_artifact(root, rnd, picked)
        for n in picked:
            last[n] = rnd
    assert set(last) == set(names)
    bound = math.ceil(len(names) / (SAMPLE_SIZE - touches))
    worst = max(n_rounds - r for r in last.values())
    assert worst < bound, (
        f"staleness {worst} >= adjusted bound {bound} with {touches} "
        f"touches/round — fronting is starving the stale tail"
    )


def test_fingerprint_snapshot_matches_live_source():
    """The committed PLAN_FINGERPRINTS.json must match the registry's
    CURRENT function sources — a drift here means someone edited a
    query without refreshing the snapshot (python
    tools/plan_fingerprints.py <round> regenerates), which would
    front the edited query forever instead of until its next row."""
    from plan_fingerprints import current_fingerprints, load_snapshot

    snap = load_snapshot(REPO_ROOT)
    if not snap:
        return  # fresh checkout without the artifact
    cur = current_fingerprints()
    drift = sorted(
        n
        for n, md5 in cur.items()
        if n in snap and snap[n].get("src_md5") != md5
    )
    missing = sorted(set(cur) - set(snap))
    assert not drift and not missing, (
        f"fingerprint snapshot stale — drift={drift} missing={missing}; "
        f"run: python tools/plan_fingerprints.py <round> [names...]"
    )


def test_real_artifact_history_within_bound():
    """The repo's committed CORRECTNESS_r*.json artifacts must show no
    current-registry query older than ceil(N/S) rounds behind the
    newest artifact. This is the live staleness audit the verdict
    asked to pin (r11: max age 4 with bound 5)."""
    import re

    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO_ROOT)
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
    ]
    if not rounds:
        return  # fresh checkout without artifacts: nothing to audit
    latest = max(rounds)
    if latest < 6:
        return  # not enough history for the bound to be meaningful
    sys.path.insert(0, REPO_ROOT)
    from wiki_data_pipeline_spark.plans.registry import all_oracles, all_queries

    names = list(all_queries())
    oracles = all_oracles()
    bound = math.ceil(len(names) / SAMPLE_SIZE)
    history = correctness_history(REPO_ROOT, oracles)
    stale = {
        n: history[n][0]
        for n in names
        if n in history and latest - history[n][0] >= bound
    }
    never = [n for n in names if n not in history]
    # queries registered within the last `bound` rounds may legitimately
    # be unsampled; anything older must have a row
    assert not stale, f"queries stale beyond {bound} rounds: {stale}"
    assert len(never) <= SAMPLE_SIZE, (
        f"{len(never)} registered queries have never been driver-sampled"
    )
