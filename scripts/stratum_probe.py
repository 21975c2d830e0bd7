#!/usr/bin/env python
"""Deterministic-stratum scaling probe for ops whose FULL sf100 leg
exceeds the one-box environment (not the plan): the posting-pair shuffle
of dedup_ngram_jaccard at sf100 spills more than this box's ~58 GB of
free local disk (observed: executor death with "No space left on device"
at the pair exchange — round 9).  On a real cluster that shuffle
distributes across every executor's local disks, so the honest probe
here is a DETERMINISTIC 50% doc stratum (pmod(doc_id, 2) = 0) applied
IDENTICALLY at both scale factors: the hi/lo ratio is still a clean
10x-data decade, only the absolute corpus is halved.  Recorded loudly
per the no-silent-caps rule.

Usage: python scripts/stratum_probe.py [--lo .scratch/sf10]
           [--hi .scratch/sf100] [--mod 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default=os.path.join(REPO, ".scratch", "sf10"))
    ap.add_argument("--hi", default=os.path.join(REPO, ".scratch", "sf100"))
    ap.add_argument("--mod", type=int, default=2)
    args = ap.parse_args()

    from target_parquet_spark.operators import dedup as D
    from target_parquet_spark.session import get_spark

    spark = get_spark(app_name="stratum_probe")

    def run(sf_dir: str) -> dict:
        docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.pmod(F.col("doc_id"), F.lit(args.mod)) == 0)
            .select("doc_id", "text")
        )
        n_docs = docs.count()
        t0 = time.time()
        pairs = D.ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.6, max_df=100
        )
        n_pairs = pairs.count()
        wall = round(time.time() - t0, 2)
        return {"docs": n_docs, "pairs": n_pairs, "s": wall}

    lo = run(args.lo)
    hi = run(args.hi)
    out = {
        "query": "dedup_ngram_jaccard",
        "stratum": f"pmod(doc_id,{args.mod})=0",
        "lo": {"dir": args.lo, **lo},
        "hi": {"dir": args.hi, **hi},
        "wall_ratio": round(hi["s"] / lo["s"], 2),
        "pair_growth": round(hi["pairs"] / max(lo["pairs"], 1), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
