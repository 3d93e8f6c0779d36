"""Merge newly-measured per-query medians into the frozen regression
baseline: `python tools/freeze_baseline.py <round_tag> [spread_json]`.

BENCH_BASELINE.json is append-only by design — a query's gate value is
frozen the FIRST time it is measured (r1 medians for the r1-era
headline, first-frozen snapshots for later additions) and never
refreshed, so the 2x gate always compares against the oldest honest
number rather than a baseline that silently drifts upward with each
regression. This tool adds entries ONLY for queries the baseline does
not know yet (e.g. newly registered queries, or the round-7 widening of
the gate from the 70-query headline to the full registry), tagging each
with the round it was frozen in.

`--refreeze` is the ONE deliberate exception (round-7 verdict item 2):
baselines frozen under mismatched session conditions (46 r1 values
measured in a 70-query session, 155 snapshot values from partial runs)
sat a systematic ~1.3x below what the SAME code measures in the gate's
actual session shape (201 queries x warmup+3 trials in one JVM), so
every delta read ~1.3x and the gate's signal drowned in a constant.
Re-freezing from a full-registry bench.py run recalibrates every query
to the gate's own measurement conditions; the displaced values are
archived in-file (``archive`` key, per-tag) so the history stays
auditable and the drift-ratchet objection ("refreshing hides
regressions") is answerable: the archive shows exactly what each value
was before, and re-freezing remains a flagged, logged, manual act —
never something the gate does on its own.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--refreeze"]
    refreeze = "--refreeze" in sys.argv[1:]
    if not argv:
        print("usage: freeze_baseline.py [--refreeze] <round_tag> [spread_json]")
        raise SystemExit(2)
    tag = argv[0]
    spread_path = (
        argv[1] if len(argv) > 1 else os.path.join(HERE, "BENCH_SPREAD.json")
    )
    base_path = os.path.join(HERE, "BENCH_BASELINE.json")

    with open(spread_path, encoding="utf-8") as f:
        spread = json.load(f)
    timings = spread.get("all_timings") or {}
    if not timings:
        print("no all_timings in sidecar — run bench.py first")
        raise SystemExit(1)

    with open(base_path, encoding="utf-8") as f:
        base = json.load(f)

    # The gate compares same-scale numbers: freezing a sidecar measured
    # at a different sf (e.g. a local sf0.01 experiment) would
    # permanently mis-calibrate the 2x gate for every query it adds,
    # and append-only means there is no refresh to undo it.
    side_sf, base_sf = spread.get("sf"), base.get("sf")
    if side_sf is not None and base_sf is not None and side_sf != base_sf:
        print(
            f"refusing to freeze: sidecar sf={side_sf} does not match "
            f"baseline sf={base_sf} (rerun bench.py at the baseline scale)"
        )
        raise SystemExit(1)

    base.setdefault("source", {})
    added = replaced = 0
    if refreeze:
        # archive the displaced values in-file, then replace EVERY
        # query the sidecar measured; sidecar must cover the full
        # current baseline (a partial run must not half-recalibrate)
        missing = set(base["queries"]) - set(timings)
        if missing:
            print(
                "refusing to refreeze from a partial run — sidecar "
                f"missing {len(missing)} baselined queries (e.g. "
                f"{sorted(missing)[:5]}); run the full-registry bench"
            )
            raise SystemExit(1)
        base.setdefault("archive", {})[tag] = {
            "queries": dict(base["queries"]),
            "source": dict(base["source"]),
        }
        for name, sec in sorted(timings.items()):
            replaced += int(name in base["queries"])
            added += int(name not in base["queries"])
            base["queries"][name] = sec
            base["source"][name] = tag
    else:
        for name, sec in sorted(timings.items()):
            if name not in base["queries"]:
                base["queries"][name] = sec
                base["source"][name] = tag
                added += 1

    with open(base_path, "w", encoding="utf-8") as f:
        json.dump(base, f, indent=1)
    print(
        json.dumps(
            {
                "added": added,
                "replaced": replaced,
                "total_frozen": len(base["queries"]),
                "tag": tag,
            }
        )
    )


if __name__ == "__main__":
    main()
