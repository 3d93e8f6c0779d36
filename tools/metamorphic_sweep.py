"""Partition/order metamorphic sweep (r9 verdict item 2): the DuckDB
oracle runs each query ONCE at ONE configuration, so it cannot catch
results that depend on partitioning or row order — the classic Spark
nondeterminism class (first/last without ordering, float summation
order, hash-collision-order ties). The engine's decimal/rounding
discipline claims order-proofness; this sweep PROVES it by executing
the registry under different physical configurations and asserting the
canonical result hash of every query is configuration-invariant.

Usage:
  python tools/metamorphic_sweep.py [sf_dir] [names...]
      in-process sweep: shuffle.partitions in {4, 64, 200}; exits 1 on
      any hash divergence, prints one line per query.
  python tools/metamorphic_sweep.py [sf_dir] --dump OUT.json [names...]
      hash every query once under the CURRENT session config (honors
      SPARK_GRAFT_CPUS — run twice with 4 and 32 for the cross-master
      comparison) and write {name: hash} JSON.
  python tools/metamorphic_sweep.py --compare A.json B.json
      offline diff of two dump files.

The canonical hash is over the SORTED multiset of normalized row
tuples with columns sorted by name (same normalization as the parity
harness, wiki_data_pipeline_spark/testing.py) — row order never
matters, value identity always does, floats compare EXACTLY (the
order-proof claim is bit-level, not tolerance-level).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wiki_data_pipeline_spark.testing import _norm  # noqa: E402

PARTITIONS = (4, 64, 200)


def result_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(tuple(_norm(row[c]) for c in cols) for row in df.collect())
    h = hashlib.sha256(repr(cols).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def sweep(spark, queries, names, sf_dir, partitions=PARTITIONS) -> dict:
    """{name: {n_partitions: hash}} — rebuilds each query per setting
    (conf is read at plan/execution time, and eager fixpoint queries
    re-run their rounds under the new setting, which is the point)."""
    out: dict[str, dict[int, str]] = {}
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for p in partitions:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            for name in names:
                df = queries[name](spark, sf_dir)
                out.setdefault(name, {})[p] = result_hash(df)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    return out


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--compare":
        a = json.load(open(args[1], encoding="utf-8"))
        b = json.load(open(args[2], encoding="utf-8"))
        bad = {
            n: (a[n], b[n])
            for n in sorted(set(a) & set(b))
            if a[n] != b[n]
        }
        only = sorted(set(a) ^ set(b))
        for n, (ha, hb) in bad.items():
            print(f"XX {n}: {ha} != {hb}")
        print(
            f"{len(set(a) & set(b)) - len(bad)}/{len(set(a) & set(b))} "
            f"hashes identical; {len(only)} names unmatched"
        )
        return 1 if bad else 0

    sf_dir = (
        args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    )
    rest = args[1:] if args and os.path.isdir(args[0]) else args
    dump_path = None
    if "--dump" in rest:
        i = rest.index("--dump")
        dump_path = rest[i + 1]
        rest = rest[:i] + rest[i + 2 :]

    from wiki_data_pipeline_spark.plans.registry import all_queries
    from wiki_data_pipeline_spark.session import get_spark

    spark = get_spark("metamorphic-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = rest or sorted(queries)

    if dump_path:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        hashes = {}
        for name in names:
            t0 = time.time()
            hashes[name] = result_hash(queries[name](spark, sf_dir))
            print(f"-- {name}: {hashes[name]} ({time.time()-t0:.1f}s)")
        with open(dump_path, "w", encoding="utf-8") as f:
            json.dump(hashes, f, indent=0, sort_keys=True)
        print(f"dumped {len(hashes)} hashes (local[{cpus}]) -> {dump_path}")
        return 0

    table = sweep(spark, queries, names, sf_dir)
    bad = 0
    for name, hs in table.items():
        vals = set(hs.values())
        ok = len(vals) == 1
        bad += 0 if ok else 1
        mark = "OK" if ok else "XX"
        print(f"{mark} {name}: {hs}")
    print(
        f"\n{len(table) - bad}/{len(table)} partition-invariant "
        f"(shuffle.partitions in {list(PARTITIONS)})"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
