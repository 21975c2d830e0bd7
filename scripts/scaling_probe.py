#!/usr/bin/env python
"""Scaling probe: time the heaviest registry queries at two scale factors
and print the growth ratio per query (VERDICT r2 item 7 — one more decade
of measured growth behind the 100 TB extrapolation).

Usage: python scripts/scaling_probe.py [--lo /root/testdata/sf0.1]
           [--hi /root/repo/.scratch/sf1] [--reps 2] [-k name,name,...]

Each query executes fully through the noop sink (same contract as
bench.py). Prints one JSON line with per-query seconds at each sf and the
hi/lo ratio; a ratio at or below the data-growth factor means sublinear
scaling (fixed overheads amortizing), a ratio well above it flags a
super-linear plan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The top-of-the-bench-tail set named in VERDICT r2 item 7.
HEAVY = [
    "dedup_connected_components",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_pairs",
    "sim_pq_ann",
    "sim_ivfpq_ann",
    "events_interval_overlap_join",
    "dedup_chunk_overlap",
    "dedup_span_ngram",
    "text_contamination",
    "sim_semantic_clusters",
    "q1_pricing_summary",
    "events_funnel_sessions",
    # round-4 families
    "sim_knn_graph_scaled",
    "graph_link_prediction_scaled",
    "dedup_cdc_chunks",
    "text_novelty_curve",
    "events_active_users_hll",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/root/testdata/sf0.1")
    ap.add_argument("--hi", default=os.path.join(REPO, ".scratch", "sf1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("-k", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from target_parquet_spark.session import get_spark

    spark = get_spark(app_name="scaling_probe")
    qs = entry.queries()
    names = args.k.split(",") if args.k else HEAVY

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    # warm
    spark.read.parquet(f"{args.lo}/region.parquet").count()

    out = {}
    for name in names:
        lo = run(name, args.lo)
        hi = run(name, args.hi)
        out[name] = {"lo_s": lo, "hi_s": hi, "ratio": round(hi / lo, 2)}
        print(
            f"{name:34s} lo={lo:7.2f}s hi={hi:7.2f}s ratio={hi / lo:5.2f}",
            flush=True,
        )
    print(json.dumps({"lo": args.lo, "hi": args.hi, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
