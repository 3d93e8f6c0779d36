"""Dev parity runner: `python tools/check_parity.py [sf_dir] [name ...]`.

Runs every registered query (or the named subset) against its DuckDB
oracle and prints a pass/fail line each — the local mirror of the
driver's CORRECTNESS gate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wiki_data_pipeline_spark.plans.registry import all_oracles, all_queries
from wiki_data_pipeline_spark.session import get_spark
from wiki_data_pipeline_spark.testing import compare_query


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = get_spark("parity-check")
    queries = all_queries()
    oracles = all_oracles()
    selected = names or list(queries)

    failures = 0
    for name in selected:
        if name not in queries:
            print(f"?? {name}: not registered")
            failures += 1
            continue
        t0 = time.time()
        if name not in oracles:
            try:
                n = queries[name](spark, sf_dir).count()
                print(f"-- {name}: rows-only, {n} rows ({time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                print(f"XX {name}: EXECUTION FAILED: {e}")
                failures += 1
            continue
        try:
            res = compare_query(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"XX {name}: EXECUTION FAILED: {type(e).__name__}: {e}")
            failures += 1
            continue
        status = "OK" if res.ok else "MISMATCH"
        print(
            f"{'OK' if res.ok else 'XX'} {name}: {status} "
            f"spark={res.spark_rows} duck={res.duck_rows} ({time.time()-t0:.1f}s)"
        )
        for d in res.details:
            print(f"     {d}")
        failures += 0 if res.ok else 1
    print(f"\n{len(selected) - failures}/{len(selected)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
