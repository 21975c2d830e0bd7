#!/usr/bin/env python
"""A/B timing for lineage-cut changes in ONE Spark session: for each
query, alternate SPARK_GRAFT_NO_MAT=1 (the uncut "before" plan) with the
cut plan, min-of-N per arm.  Alternation inside one process cancels the
shared-host contention spikes that make separate before/after processes
incomparable.  Usage: python scripts/abbench.py [-n 4] name [name ...]
Not part of the driver contract — an optimization-round iteration tool.

Caveat (ADVICE r10): the NO_MAT "before" arm is the CURRENT code with
cuts bypassed, not necessarily the true pre-change plan.  Where a
restructure leans on a cut — e.g. the halved kNN queries, whose
half.unionByName(half) mirror evaluates the src<nbr self-join TWICE
under NO_MAT where the old code ran ONE src!=nbr join — the before arm
overstates the win.  For join-restructuring changes, benchmark against
a git-checkout baseline (separate process, alternated manually in a
quiet window) instead of trusting the NO_MAT arm.
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
    ap.add_argument("-n", type=int, default=4, help="runs per arm (min taken)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from target_parquet_spark.session import get_spark

    spark = get_spark(app_name="abbench")
    qs = entry.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm, untimed

    out = {}
    for name in args.names:
        fn = qs[name]
        best = {"before": float("inf"), "after": float("inf")}
        for i in range(2 * args.n):
            arm = "before" if i % 2 == 0 else "after"
            if arm == "before":
                os.environ["SPARK_GRAFT_NO_MAT"] = "1"
            else:
                os.environ.pop("SPARK_GRAFT_NO_MAT", None)
            spark.sparkContext.setJobDescription(f"ab:{arm}: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[arm] = min(best[arm], time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {k: round(v, 3) for k, v in best.items()}
        print(f'AB {name}: {out[name]}', flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
