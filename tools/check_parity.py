"""Dev parity runner:
`python tools/check_parity.py [--json OUT] [sf_dir] [name ...]`.

Runs every registered query (or the named subset) against its DuckDB
oracle and prints a pass/fail line each — the local mirror of the
driver's CORRECTNESS gate. With ``--json OUT`` it also writes a
CORRECTNESS-artifact-shaped JSON (name -> rows/schema/hash match +
row counts + err), which is how the per-round ADVERSARIAL_PARITY.json
is produced:

    python tools/make_adversarial_sf.py /tmp/adversarial_sf
    python tools/check_parity.py --json ADVERSARIAL_PARITY.json \
        /tmp/adversarial_sf
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wiki_data_pipeline_spark.plans.registry import all_oracles, all_queries
from wiki_data_pipeline_spark.session import get_spark
from wiki_data_pipeline_spark.testing import compare_query


def _row(
    rows_match, schema_match, hash_match, spark_rows, oracle_rows, err
) -> dict:
    """One artifact row — the CORRECTNESS shape, spelled out once."""
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": spark_rows,
        "oracle_rows": oracle_rows,
        "err": err,
    }


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_parity.py [--json OUT] [sf_dir] [name ...]")
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = get_spark("parity-check")
    queries = all_queries()
    oracles = all_oracles()
    selected = names or list(queries)

    report: dict[str, dict] = {}
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
                report[name] = _row(None, None, None, n, None, "no_oracle")
            except Exception as e:  # noqa: BLE001
                print(f"XX {name}: EXECUTION FAILED: {e}")
                report[name] = _row(
                    False, False, False, None, None,
                    f"{type(e).__name__}: {e}"[:500],
                )
                failures += 1
            continue
        try:
            res = compare_query(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"XX {name}: EXECUTION FAILED: {type(e).__name__}: {e}")
            report[name] = _row(
                False, False, False, None, None,
                f"{type(e).__name__}: {e}"[:500],
            )
            failures += 1
            continue
        status = "OK" if res.ok else "MISMATCH"
        print(
            f"{'OK' if res.ok else 'XX'} {name}: {status} "
            f"spark={res.spark_rows} duck={res.duck_rows} ({time.time()-t0:.1f}s)"
        )
        for d in res.details:
            print(f"     {d}")
        report[name] = _row(
            res.spark_rows == res.duck_rows,
            res.schema_ok,
            res.ok,
            res.spark_rows,
            res.duck_rows,
            None if res.ok else "; ".join(res.details)[:500] or "mismatch",
        )
        failures += 0 if res.ok else 1
    print(f"\n{len(selected) - failures}/{len(selected)} passed")
    if json_out:
        report["_meta"] = {
            "sf_dir": sf_dir,
            "n_queries": len(selected),
            "n_pass": len(selected) - failures,
            "generated_by": "tools/check_parity.py --json",
        }
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=2, sort_keys=True)
            fh.write("\n")
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
