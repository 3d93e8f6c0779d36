"""Subprocess child for tests/test_shuffle_scaling.py: the shared test
session has spark.ui.enabled=false (a static conf — unchangeable after
context start), so shuffle-byte measurement needs its own JVM with the
UI store on. Runs the named queries at two SF dirs and prints ONE JSON
line {name: {"small": bytes, "big": bytes}} of per-query shuffle-write
bytes, measured by diffing the UI REST completed-stage totals around
each execution (tools/shuffle_audit.py's mechanism)."""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

from shuffle_audit import _run_measured  # noqa: E402

from wiki_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from wiki_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    small, big = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark(
        "shuffle-child",
        master="local[4]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out = {}
    for name in names:
        w_s, _, _ = _run_measured(spark, queries[name], small)
        w_b, _, _ = _run_measured(spark, queries[name], big)
        out[name] = {"small": w_s, "big": w_b}
    print("RESULT " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
