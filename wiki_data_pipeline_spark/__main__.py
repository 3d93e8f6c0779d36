"""CLI entry point — the reference's ``python src/main.py --config
--limit --reset`` surface (src/main.py:230-261) for the Spark engine:

    python -m wiki_data_pipeline_spark --sf-dir /root/testdata/sf0.001 \
        --out /tmp/wdps_out --limit 100 [--reset]

Prints the run summary as one JSON line (the reference logs the same
fields, src/main.py:213-221).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> int:
    p = argparse.ArgumentParser(description="wiki_data_pipeline_spark batch run")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="fixture directory with documents.parquet",
    )
    p.add_argument("--out", required=True, help="output directory (JSON sink)")
    p.add_argument("--limit", type=int, default=None, help="process first N docs")
    p.add_argument(
        "--reset", action="store_true", help="drop the checkpoint and start over"
    )
    p.add_argument("--batch-size", type=int, default=1000)
    args = p.parse_args()

    from wiki_data_pipeline_spark.pipeline import run_pipeline
    from wiki_data_pipeline_spark.session import get_spark

    spark = get_spark()
    summary = run_pipeline(
        spark,
        args.sf_dir,
        args.out,
        limit=args.limit,
        reset=args.reset,
        batch_size=args.batch_size,
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
