"""RELIABLE_PARITY.json — the regenerable reliable-pin proof (r13,
verdict item 2).

r12 proved the reliable checkpoint tier semantics-invisible across
every pin site with a one-off sweep that lived only in prose; nothing
regenerated it, so a new pin site or a pin() edit could silently break
the tier between rounds. The sweep is now a committed artifact
produced by::

    python tools/check_parity.py --json RELIABLE_PARITY.json \
        --pin-mode reliable --pin-sites /root/testdata/sf0.001

and these tests make it load-bearing: the artifact must be all-green,
and its query set must equal the LIVE set of pin-routed queries —
discovered by instrumenting pin() itself (operators/pin.py
``_observer``), not a hand-kept list, so a new ``.transform(pin)``
call site anywhere in the package flips the set and fails the test
until the sweep is regenerated over it.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "RELIABLE_PARITY.json")


def _load() -> dict:
    assert os.path.exists(ARTIFACT), (
        "RELIABLE_PARITY.json missing — regenerate with "
        "tools/check_parity.py --json RELIABLE_PARITY.json "
        "--pin-mode reliable --pin-sites"
    )
    with open(ARTIFACT, encoding="utf-8") as fh:
        return json.load(fh)


def test_reliable_parity_artifact_is_green():
    doc = _load()
    meta = doc.get("_meta", {})
    assert meta.get("pin_mode") == "reliable"
    assert meta.get("pin_sites_only") is True
    rows = {k: v for k, v in doc.items() if k != "_meta"}
    assert rows, "empty artifact"
    bad = {
        name: row.get("err")
        for name, row in rows.items()
        if not (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        )
    }
    assert not bad, f"reliable-tier parity failures: {bad}"


@pytest.mark.heavy
# heavy tier (r16): discovery builds all 200+ query plans with the pin
# observer installed and the eager pins RUN at fixture scale (~1.6 min)
# — the cheap artifact-shape tests above stay in the default tier
def test_reliable_parity_covers_every_live_pin_site(spark, sf_dir):
    """The artifact's query set == the live pin-routed set. Discovery
    builds all 200+ query plans with the pin observer installed (the
    eager pins run at fixture scale), so this is one of the suite's
    slower tests — deliberately: it is the guard that makes the
    committed sweep trustworthy."""
    from wiki_data_pipeline_spark.testing import pin_using_queries

    live = pin_using_queries(spark, sf_dir)
    assert live, "no pin-routed queries discovered — observer broken?"
    swept = {k for k in _load() if k != "_meta"}
    missing = live - swept
    stale = swept - live
    assert not missing, (
        f"pin-routed queries missing from RELIABLE_PARITY.json "
        f"(regenerate the sweep): {sorted(missing)}"
    )
    assert not stale, (
        f"RELIABLE_PARITY.json contains queries that no longer route "
        f"through pin(): {sorted(stale)}"
    )


def test_pin_observer_records_and_detaches(spark):
    """The discovery hook itself: observer fires per pin() call and
    is always detached afterwards (even on a failing query)."""
    from wiki_data_pipeline_spark.operators import pin as pin_mod

    calls = []
    pin_mod._observer = lambda: calls.append(1)
    try:
        pin_mod.pin(spark.range(3))
    finally:
        pin_mod._observer = None
    assert calls, "observer did not fire on a direct pin() call"

    # pin_using_queries detaches on exceptions too (strict mode raises)
    from wiki_data_pipeline_spark import testing as t

    with pytest.raises(KeyError):
        t.pin_using_queries(spark, "/nonexistent", names=["not_a_query"])
    assert pin_mod._observer is None

    # tool mode (strict=False): a failing builder is recorded and
    # conservatively INCLUDED instead of aborting discovery (r13
    # review fix — one broken builder must not block the whole
    # RELIABLE_PARITY regeneration)
    errs: dict = {}
    got = t.pin_using_queries(
        spark,
        "/nonexistent",
        names=["dedup_exact"],
        strict=False,
        errors=errs,
    )
    assert got == {"dedup_exact"}
    assert "dedup_exact" in errs
    assert pin_mod._observer is None
