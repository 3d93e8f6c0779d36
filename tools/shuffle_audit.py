"""Registry-wide shuffle-volume scaling audit (r9).

The scale story measures wall clock (bench.py at sf0.1, --sf1 at 10x),
plan shape (fixture + x10 manifests), task balance (skew_probe), and
heap (constrained-heap probe) — but not the INTERMEDIATE DATA VOLUME:
a query whose shuffle bytes grow quadratically can still look linear in
wall time at small SFs (the shuffle fits in page cache) and perfectly
healthy in its compiled plan (same Exchange count, 100x the bytes
through it). At 100 TB the shuffle IS the bottleneck, so this tool
measures it directly:

For every registered query, run once at sf0.01 and once at sf0.1 (10x
the rows) in one session and attribute shuffle-write / input bytes per
query by diffing the UI REST completed-stage totals around each
execution (queries run sequentially, so the delta is the query's).
Report, per query:

- shuffle_growth: shuffle bytes at sf0.1 / bytes at sf0.01 — the
  scaling signal; ~10 is linear in data, >20 with non-trivial absolute
  volume is superlinear (flagged);
- amplification: shuffle bytes / on-disk bytes of the parquet files the
  plan scans, at sf0.1 — how many times the data crosses the wire per
  stored byte (a design-review number, not a gate: joins legitimately
  amplify, but a 10x amplifier is where to look first when the cluster
  is network-bound). The denominator is filesystem truth, not the
  stage-level inputBytes metric, which undercounts ~100x for
  sub-second local tasks (bytes-read is polled per N records); with
  column pruning the true bytes read are <= on-disk, so amplification
  is a lower bound.

Zero-shuffle queries (broadcast-only plans like j1_enrichment_join)
report growth 1.0 by convention (0 -> 0 bytes).

Usage: python tools/shuffle_audit.py [small_dir] [big_dir] [--names a,b]
       defaults /root/testdata/sf0.01 and /root/testdata/sf0.1;
       --names measures only the listed queries and prints their rows
       WITHOUT touching the registry-wide artifact (for before/after
       fix comparisons).
Artifact: SHUFFLE_SCALING.json. Exit 1 if any query is flagged.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

GROWTH_FLAG = 20.0  # 10x data; 2x margin on linear
ABS_FLOOR_BYTES = 10 * 1024 * 1024  # ignore sub-10MB shuffles at sf0.1


def _stage_bytes(spark) -> dict[int, tuple[int, int]]:
    """stageId -> (shuffleWriteBytes, inputBytes) over completed stages."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=15,
        ) as r:
            stages = json.load(r)
    except Exception:
        return {}
    out: dict[int, tuple[int, int]] = {}
    for s in stages:
        sid = s["stageId"]
        w = int(s.get("shuffleWriteBytes", 0))
        i = int(s.get("inputBytes", 0))
        # multiple attempts: keep the max-bytes attempt
        if sid not in out or w + i > sum(out[sid]):
            out[sid] = (w, i)
    return out


def _scan_bytes(df) -> int:
    """On-disk bytes of the parquet files the executed plan scans.

    The stage-level `inputBytes` REST metric systematically undercounts
    for sub-second local tasks (bytes-read is polled every N records,
    so a task that finishes within one poll interval reports ~0), so
    the amplification denominator is taken from the filesystem instead:
    every file path named by the plan's scan nodes, deduplicated, summed
    at its on-disk (compressed) size. Column pruning means the true
    bytes read are <= this, i.e. reported amplification is a LOWER
    bound — fine for a design-review ranking.
    """
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return 0
    total, seen = 0, set()
    for m in re.finditer(r"file:(/[^\s\],)\x00]+)", plan):
        path = m.group(1).rstrip(".")
        if path in seen:
            continue
        seen.add(path)
        if os.path.isfile(path):
            total += os.path.getsize(path)
        elif os.path.isdir(path):
            for root, _, files in os.walk(path):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if not f.startswith(("_", "."))
                )
    return total


def _run_measured(spark, fn, sf_dir: str) -> tuple[int, int, float]:
    # Snapshot BEFORE plan construction (r12): iterative queries
    # (fixpoints, pagerank, BPE training) run jobs — including their
    # shuffles — inside fn() via per-round pins and driver scalars;
    # snapshotting after fn() attributed 0 bytes to exactly the
    # queries whose shuffle growth most needs watching.
    before = _stage_bytes(spark)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _stage_bytes(spark)
    new = {sid: v for sid, v in after.items() if sid not in before}
    return (
        sum(w for w, _ in new.values()),
        _scan_bytes(df),
        wall,
    )


def main() -> int:
    argv = list(sys.argv[1:])
    only: list[str] | None = None
    if "--names" in argv:
        i = argv.index("--names")
        only = argv[i + 1].split(",")
        del argv[i:i + 2]
    small = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    big = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"

    from wiki_data_pipeline_spark.plans.registry import all_queries
    from wiki_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            # full-registry runs create thousands of stages; keep them
            # all resident so the before/after REST diffs never lose a
            # stage of the query being measured
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not spark.sparkContext.uiWebUrl:
        print("Spark UI unavailable — cannot read stage metrics")
        return 2
    queries = all_queries()

    rows: dict[str, dict] = {}
    flagged: dict[str, dict] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    names = only if only is not None else sorted(queries)
    for n, name in enumerate(names):
        try:
            w_s, i_s, _ = _run_measured(spark, queries[name], small)
            w_b, i_b, wall_b = _run_measured(spark, queries[name], big)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)[:200]
            continue
        growth = round(w_b / w_s, 2) if w_s else (1.0 if not w_b else float("inf"))
        amp = round(w_b / i_b, 3) if i_b else 0.0
        rows[name] = {
            "shuffle_small": w_s,
            "shuffle_big": w_b,
            "scan_disk_big": i_b,
            "shuffle_growth": growth,
            "amplification": amp,
            "wall_big": round(wall_b, 2),
        }
        if growth > GROWTH_FLAG and w_b > ABS_FLOOR_BYTES:
            flagged[name] = rows[name]
            print(f"XX {name}: growth {growth}x, {w_b/1e6:.1f} MB at sf0.1")
        if (n + 1) % 25 == 0:
            print(f"-- {n + 1}/{len(names)} ({time.time() - t0:.0f}s)")

    top_amp = sorted(
        ((r["amplification"], k) for k, r in rows.items()
         if r["shuffle_big"] > ABS_FLOOR_BYTES),
        reverse=True,
    )[:10]
    print(f"\n{len(rows)}/{len(names)} measured; {len(flagged)} flagged "
          f"superlinear; {len(errors)} errors")
    print("top amplification (shuffle/scanned-disk at sf0.1, >10MB shuffles):")
    for a, k in top_amp:
        print(f"  {k}: {a}x ({rows[k]['shuffle_big']/1e6:.1f} MB)")

    if only is not None:
        for k, r in rows.items():
            print(f"{k}: {json.dumps(r)}")
    else:
        with open(os.path.join(HERE, "SHUFFLE_SCALING.json"), "w",
                  encoding="utf-8") as f:
            json.dump(
                {"small": small, "big": big, "growth_flag": GROWTH_FLAG,
                 "abs_floor_bytes": ABS_FLOOR_BYTES, "flagged": flagged,
                 "errors": errors, "queries": rows},
                f, indent=1,
            )
        print("wrote SHUFFLE_SCALING.json")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
