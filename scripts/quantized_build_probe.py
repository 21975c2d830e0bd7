#!/usr/bin/env python
"""Cold BUILD probe for the quantized kNN edge artifact (VERDICT r9 #7).

r8 measured the cold float-path artifact build at 14.2x/decade; r9
measured the quantized QUERY at 11.42x/decade but never the build twin.
This times the full materialization — adaptive-plane bucket exchange,
SQ8 codes, int32 candidate fold, shortlist, float verify, per-source
top-k, WRITE of the (src, nbr_rank, nbr, sim) edge table — cold (fresh
temp output, no warehouse reuse), per scale dir.

Usage: python scripts/quantized_build_probe.py [--sfs dir,dir,...]
Prints one JSON line {"quantized_build_sec": {sf: {"build_s": ...,
"edges": N, "vectors": N}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sfs",
        default=",".join(
            [
                os.path.join(REPO, ".scratch", "sf10"),
                os.path.join(REPO, ".scratch", "sf100"),
            ]
        ),
    )
    args = ap.parse_args()

    from target_parquet_spark.operators import similarity as S
    from target_parquet_spark.session import get_spark

    spark = get_spark(app_name="quantized_build_probe")
    out: dict[str, dict] = {}
    for sf_dir in args.sfs.split(","):
        if not os.path.isdir(sf_dir):
            print(f"skip (missing): {sf_dir}", file=sys.stderr)
            continue
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        dst = tempfile.mkdtemp(prefix="spark_graft_qbuild_")
        try:
            t0 = time.time()
            S.knn_graph_quantized(emb, k=3).write.mode("overwrite").parquet(
                os.path.join(dst, "edges")
            )
            build_s = round(time.time() - t0, 2)
            edges = spark.read.parquet(os.path.join(dst, "edges")).count()
        finally:
            shutil.rmtree(dst, ignore_errors=True)
        row = {"build_s": build_s, "edges": edges, "vectors": n}
        out[os.path.basename(sf_dir.rstrip("/"))] = row
        print(f"{sf_dir}: {row}", file=sys.stderr)
    print(json.dumps({"quantized_build_sec": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
