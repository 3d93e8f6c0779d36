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

Granularity (r16, VERDICT item 3): the registered function's own
source PLUS the sources of every in-repo function it transitively
references (resolved through ``__globals__`` from the function's and
its nested lambdas' ``co_names``). r15 hashed the function body only,
so a rewrite that landed in a shared helper (``pq_adc_distances``)
moved NO fingerprint and three rewritten queries dodged the rotation
front. Closure hashing is still per-query — editing one helper fronts
exactly the queries whose plans flow through it, not the whole module
(module-level hashing would collapse the prefix to one file on any
one-line edit). Forced seeding (``names...``) remains for anything
source introspection cannot see (data-driven dispatch).

Usage:
    python tools/plan_fingerprints.py <round> [names...]
        # refresh the snapshot: hash-changed queries (and every NAMED
        # query, changed or not) record <round>; unchanged entries
        # keep their earlier round. Creates the file on first run
        # with every unchanged query at round 0 (pre-history).
    python tools/plan_fingerprints.py --rehash-keep-rounds
        # migration mode: refresh every hash under a NEW hashing
        # scheme while keeping every entry's recorded round — used
        # once when the r16 closure hashing landed, so the format
        # change itself could not front all 209 queries at once and
        # drown the genuinely touched ones out of the sample prefix.
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


_PKG = "wiki_data_pipeline_spark"


def _code_names(code) -> set[str]:
    """Global names referenced by a code object INCLUDING its nested
    code objects (lambdas, comprehensions, local defs) — nested code
    carries its own co_names, so a helper referenced only inside a
    lambda would otherwise be invisible."""
    names = set(code.co_names)
    for const in code.co_consts:
        if hasattr(const, "co_names"):
            names |= _code_names(const)
    return names


def _closure_sources(fn) -> list[str]:
    """Sources of ``fn`` plus every in-repo function it transitively
    references through module globals. Unresolvable or source-less
    references are skipped (builtin/bytecode-only callables)."""
    import types

    out: list[str] = []
    visited: set[int] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        if id(f) in visited:
            continue
        visited.add(id(f))
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        try:
            out.append(inspect.getsource(f))
        except (OSError, TypeError):
            continue
        g = getattr(f, "__globals__", {})
        for n in sorted(_code_names(code)):
            v = g.get(n)
            if isinstance(v, types.FunctionType) and getattr(
                v, "__module__", ""
            ).startswith(_PKG):
                stack.append(v)
    return out


def current_fingerprints() -> dict[str, str]:
    """name -> md5 of the registered function's source + its
    transitive in-repo helper-closure sources (r16 — see module
    docstring), for every query whose source is recoverable
    (dynamically-built callables without source simply don't
    participate in fronting). Helper sources are hashed as a sorted
    de-duplicated set so traversal order cannot move the hash."""
    from wiki_data_pipeline_spark.plans.registry import all_queries

    out: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            own = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        helpers = sorted(set(_closure_sources(fn)) - {own})
        blob = own + "\n\x00\n".join(helpers)
        out[name] = hashlib.md5(blob.encode("utf-8")).hexdigest()
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
    repo_root: str,
    round_no: int,
    touch: tuple[str, ...] = (),
    rehash_keep_rounds: bool = False,
) -> list[str]:
    """Refresh the snapshot; returns the names recorded at
    ``round_no`` (hash-diff detected + explicitly touched). De-
    registered queries are pruned; first run seeds unchanged entries
    at round 0 so pre-history code can never outrank a driver row.
    ``rehash_keep_rounds`` refreshes every hash but keeps every
    entry's recorded round — the one-time migration mode for hashing-
    scheme changes (module docstring)."""
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
        if rehash_keep_rounds:
            queries[name] = {
                "src_md5": md5,
                "round": int(entry.get("round", 0)) if entry else round_no,
            }
            continue
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
    if sys.argv[1] == "--rehash-keep-rounds":
        update(HERE, 0, rehash_keep_rounds=True)
        print(json.dumps({"mode": "rehash-keep-rounds"}))
        return 0
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
