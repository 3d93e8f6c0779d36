"""Query-source fingerprints for rotation fronting (r15, verdict
item 2).

The driver's correctness rotation was purely stalest-first, which has
a blind spot: a query whose BODY is rewritten right after its driver
row lands keeps a green row that no longer reflects the code, and
stalest-first won't resample it for ~N/S rounds (r14's
``join_cogrouped_asof`` lexsort rewrite sat unsampled behind its
pre-rewrite r13 row). This tool maintains ``PLAN_FINGERPRINTS.json``
at the repo root: per registered query, an md5 of the query
function's SOURCE plus the round at which that fingerprint was first
recorded. ``tools/rotation.py`` fronts any query whose recorded round
postdates its latest driver row — or whose CURRENT source no longer
matches the snapshot at all (edits made after the last regen) — so
round-touched queries lead the very next sampling prefix regardless
of staleness.

Granularity is the registered function's own source (docstring +
body). A change confined to a helper module does not move the
fingerprint — the repo's discipline of recording per-query rationale
in the query docstring makes the function body the right tripwire,
and module-level hashing would front every query in a 60-query file
on any one-line edit, collapsing the prefix to one module. Forced
seeding (``names...`` on the CLI) covers the helper-edit case when
the editor knows which queries a helper change flows into.

Usage:
    python tools/plan_fingerprints.py <round> [names...]
        # refresh the snapshot: hash-changed queries (and every NAMED
        # query, changed or not) record <round>; unchanged entries
        # keep their earlier round. Creates the file on first run
        # with every unchanged query at round 0 (pre-history).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SNAPSHOT = "PLAN_FINGERPRINTS.json"


def current_fingerprints() -> dict[str, str]:
    """name -> md5 of the registered function's source, for every
    query whose source is recoverable (dynamically-built callables
    without source simply don't participate in fronting)."""
    from wiki_data_pipeline_spark.plans.registry import all_queries

    out: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        out[name] = hashlib.md5(src.encode("utf-8")).hexdigest()
    return out


def load_snapshot(repo_root: str) -> dict[str, dict]:
    try:
        with open(
            os.path.join(repo_root, SNAPSHOT), encoding="utf-8"
        ) as fh:
            return json.load(fh)["queries"]
    except (OSError, ValueError, KeyError):
        return {}


def update(
    repo_root: str, round_no: int, touch: tuple[str, ...] = ()
) -> list[str]:
    """Refresh the snapshot; returns the names recorded at
    ``round_no`` (hash-diff detected + explicitly touched). De-
    registered queries are pruned; first run seeds unchanged entries
    at round 0 so pre-history code can never outrank a driver row."""
    prev = load_snapshot(repo_root)
    cur = current_fingerprints()
    unknown = sorted(set(touch) - set(cur))
    if unknown:
        raise SystemExit(f"touch names not in registry: {unknown}")
    seeding = not prev
    changed: list[str] = []
    queries: dict[str, dict] = {}
    for name, md5 in sorted(cur.items()):
        entry = prev.get(name)
        if name in touch or entry is None or entry.get("src_md5") != md5:
            # the seeding run records everything un-touched at round 0
            # (pre-history: must never outrank an existing driver row)
            rnd = round_no if (name in touch or not seeding) else 0
            queries[name] = {"src_md5": md5, "round": rnd}
            if rnd == round_no and round_no != 0:
                changed.append(name)
        else:
            queries[name] = entry
    doc = {
        "note": (
            "query-source fingerprints for rotation fronting "
            "(tools/plan_fingerprints.py); 'round' = round the "
            "current source was first recorded — rotation fronts a "
            "query whose round postdates its latest driver row"
        ),
        "queries": queries,
    }
    with open(
        os.path.join(repo_root, SNAPSHOT), "w", encoding="utf-8"
    ) as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    return changed


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    round_no = int(sys.argv[1])
    touch = tuple(sys.argv[2:])
    changed = update(HERE, round_no, touch)
    print(
        json.dumps(
            {"round": round_no, "recorded": changed, "touched": list(touch)}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
