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
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: freeze_baseline.py <round_tag> [spread_json]")
        raise SystemExit(2)
    tag = sys.argv[1]
    spread_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(HERE, "BENCH_SPREAD.json")
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
    added = 0
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
                "total_frozen": len(base["queries"]),
                "tag": tag,
            }
        )
    )


if __name__ == "__main__":
    main()
