#!/usr/bin/env python
"""Time selected declared queries in one Spark session (bench.py methodology:
noop sink, min-of-N).  Usage: python scripts/qbench.py [-n 3] name [name ...]

Prints one `QB {"name": sec}` line per query and a final JSON summary.
Not part of the driver contract — an iteration tool for optimization rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3, help="runs per query (min taken)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from target_parquet_spark.session import get_spark

    spark = get_spark(app_name="qbench")
    qs = entry.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm, untimed

    out: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        best = float("inf")
        spark.sparkContext.setJobDescription(f"qbench: {name}")
        for _ in range(args.n):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f'QB {{"{name}": {out[name]}}}', flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
