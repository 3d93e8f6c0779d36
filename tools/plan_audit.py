"""Physical-plan audit over the whole registry: `python
tools/plan_audit.py [sf_dir] [name ...]`.

For every registered query, compiles the physical plan (no execution)
and counts the structures that matter at 100 TB: parquet scans (and
scans per distinct table — repeated scans of one table often mean a
branch that ReuseExchange can't collapse, the round-6 tfidf finding),
exchanges, single-partition exchanges, explodes, join strategies,
cartesian products, and Python-eval nodes (Arrow-batched vs
row-at-a-time). Prints one JSON line per query plus a summary of
flagged queries.

Flags are HEURISTICS for a human to read, not failures: a two-LM
surprisal score legitimately scans its corpus twice, and the
fixture-window L3/L4 forms legitimately use a single partition (their
scale-safe twins are separate queries). The audit makes every such
choice visible so it is a decision, not an accident.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _count_exchanges(plan: str) -> tuple[int, int, int]:
    """(shuffle, broadcast, reused) Exchange node counts.

    Counted per-line by node NAME, not by substring: a naive
    ``plan.count("Exchange")`` also hits ``ReusedExchange`` and
    ``BroadcastExchange``, and a ReusedExchange line embeds its child's
    full description (including the literal ``Exchange hashpartitioning``
    text), so even a regex over the whole string over-counts.
    """
    shuffle = broadcast = reused = 0
    for line in plan.splitlines():
        node = line.lstrip(" :+-*()0123456789")
        if node.startswith("ReusedExchange"):
            reused += 1
        elif node.startswith("BroadcastExchange"):
            broadcast += 1
        elif node.startswith("Exchange"):
            shuffle += 1
    return shuffle, broadcast, reused


def audit_plan(plan: str) -> dict:
    tables = re.findall(r"Scan parquet\s*\S*\[?([a-z_]*)", plan)
    scan_files = re.findall(r"Location:.*?/([a-z_]+)\.parquet", plan)
    per_table: dict[str, int] = {}
    for t in scan_files or tables:
        if t:
            per_table[t] = per_table.get(t, 0) + 1
    shuffle_ex, broadcast_ex, reused_ex = _count_exchanges(plan)
    return {
        "scans": plan.count("Scan parquet"),
        "scans_per_table": per_table,
        "exchanges": shuffle_ex,
        "broadcast_exchanges": broadcast_ex,
        "reused_exchanges": reused_ex,
        "single_partition": plan.count("SinglePartition"),
        "generates": plan.count("Generate"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "arrow_python": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("FlatMapCoGroupsInPandas"),
        "row_python": plan.count("BatchEvalPython"),
    }


# --- partition-less Window audit (r13, verdict item 6) ---------------
# A Window with no PARTITION BY moves its entire input to ONE
# partition — fine above an aggregate/limit whose output is
# schema-sized, a 100 TB scale-killer above anything corpus-sized.
# Today's partition-less windows all sit above bounded frames (or are
# the documented fixture-scale L3 form); this audit is what stops
# query #210 from silently sorting a corpus on one partition. Tree
# walk over the JVM plan (not text): WindowExec's partitionSpec and
# the bounding Aggregate/Limit are unambiguous on the nodes, brittle
# in the string form.

# Only WindowExec is the hazard: WindowGroupLimitExec is Spark's
# rank-limit PUSHDOWN (a partial-mode WGL above a scan keeps k rows
# per partition — scale-safe by construction, and the reason a
# partition-less rank()<=k plan avoids the global sort), so it counts
# as a BOUND below, never as a violation itself (r13 review fix: the
# first cut flagged the partial WGL and excused the costly Final one).
_WINDOW_NODES = {"WindowExec"}
_BOUNDING_NODES = {
    # aggregates: output is group-count-sized, not input-sized
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
    # limits: output is limit-sized by construction
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "TakeOrderedAndProjectExec",
    "WindowGroupLimitExec",
}


def _jchildren(node):
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return [node.initialPlan()]
    if name == "ReusedExchangeExec":
        # references (not re-executes) another exchange subtree — the
        # bound, if any, lives in the referenced child
        return [node.child()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.length())]


# Row-multiplying nodes BETWEEN a bound and the window re-expand
# cardinality, so a bound below them does not bound the window's
# frame (r14, ADVICE: a partition-less window over explode(agg(...))
# sorted a re-expanded frame on one partition yet passed the audit).
# The bounded-subtree search must stop when it crosses one. Joins:
# every join exec can multiply rows (even Left/Semi variants change
# cardinality in ways the audit can't bound statically), so any
# *Join* node name stops the search — and CartesianProductExec, whose
# name does NOT contain "Join", is listed explicitly (r15 ADVICE: the
# blanket cartesian==0 asserts cover registered queries, but the
# bounded-subtree search itself must not bless a bound below one).
_ROW_MULTIPLYING_NODES = {
    "GenerateExec",
    "ExpandExec",
    "CartesianProductExec",
}


def _is_row_multiplying(name: str) -> bool:
    return name in _ROW_MULTIPLYING_NODES or "Join" in name


def _subtree_is_bounded(node) -> bool:
    name = node.getClass().getSimpleName()
    if name in _BOUNDING_NODES:
        return True
    if _is_row_multiplying(name):
        return False
    children = _jchildren(node)
    if name == "UnionExec":
        # a union's cardinality is the SUM of its children — one
        # bounded branch does not bound the union (r15 ADVICE:
        # union(limit-bounded, corpus-sized) passed the any() search)
        return bool(children) and all(
            _subtree_is_bounded(c) for c in children
        )
    return any(_subtree_is_bounded(c) for c in children)


def unbounded_global_windows(df) -> list[str]:
    """Partition-less Window nodes whose input subtree carries NO
    Aggregate/Limit bound — each is a whole-input single-partition
    sort. Returns one description per violation (empty = clean)."""
    out: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if (
            name in _WINDOW_NODES
            and node.partitionSpec().isEmpty()
            and not any(_subtree_is_bounded(c) for c in _jchildren(node))
        ):
            out.append(
                f"{name} with empty partitionSpec over an unbounded "
                f"input: {node.nodeName()}"
            )
        for c in _jchildren(node):
            walk(c)

    walk(df._jdf.queryExecution().executedPlan())
    return out


def flags_for(name: str, a: dict) -> list[str]:
    out = []
    if a["cartesian"]:
        out.append("CARTESIAN")
    if a["row_python"]:
        out.append("ROW_PYTHON")
    dup = {t: n for t, n in a["scans_per_table"].items() if n >= 3}
    if dup:
        out.append(f"SCANx3+:{dup}")
    if a["single_partition"] >= 2:
        out.append(f"SINGLE_PART x{a['single_partition']}")
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = (
        args[0]
        if args and os.path.isdir(args[0])
        else "/root/testdata/sf0.001"
    )
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from wiki_data_pipeline_spark.plans.registry import all_queries
    from wiki_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    selected = names or list(queries)

    flagged: dict[str, list[str]] = {}
    for name in selected:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": str(e)[:200]}))
            flagged[name] = ["COMPILE_ERROR"]
            continue
        a = audit_plan(plan)
        fl = flags_for(name, a)
        try:
            for v in unbounded_global_windows(df):
                fl.append(f"UNBOUNDED_GLOBAL_WINDOW: {v[:120]}")
        except Exception as e:  # noqa: BLE001
            fl.append(f"WINDOW_AUDIT_ERROR: {str(e)[:120]}")
        if fl:
            flagged[name] = fl
        print(json.dumps({"name": name, **a, "flags": fl}))

    print(
        json.dumps(
            {"metric": "flagged", "n": len(flagged), "queries": flagged}
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
