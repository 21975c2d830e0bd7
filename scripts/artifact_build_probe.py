#!/usr/bin/env python
"""Cold-path artifact build probe (VERDICT r6 #2).

The bench and the scaling probes run with the fingerprint-keyed
artifacts WARM (amortization is the design: built once per corpus,
read by every consumer) — which means a regression in the build path,
the actually-expensive stage, would be invisible to bench_compare.
This probe times the builds themselves: for each scale dir it points
SPARK_GRAFT_WAREHOUSE at a fresh temp directory (so the fingerprint
key cannot find a warm copy), builds each artifact, and prints one
JSON line of per-artifact build seconds.

Usage: python scripts/artifact_build_probe.py [--sfs dir,dir,...]
Convention (also noted in bench_compare.py): run this once per round
alongside bench.py and record the numbers in BASELINE.md — the warm
bench guards the read path, this guards the build path.
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

ARTIFACTS = ["knn_edge_artifact", "minhash_pair_artifact"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sfs",
        default=",".join(
            [
                "/root/testdata/sf0.1",
                os.path.join(REPO, ".scratch", "sf1"),
                os.path.join(REPO, ".scratch", "sf10"),
            ]
        ),
    )
    args = ap.parse_args()

    from target_parquet_spark import queries_r7
    from target_parquet_spark.session import get_spark

    spark = get_spark()
    out: dict[str, dict[str, float]] = {}
    for sf_dir in args.sfs.split(","):
        if not os.path.isdir(sf_dir):
            print(f"skip (missing): {sf_dir}", file=sys.stderr)
            continue
        row: dict[str, float] = {}
        for name in ARTIFACTS:
            cold = tempfile.mkdtemp(prefix="spark_graft_coldwh_")
            os.environ["SPARK_GRAFT_WAREHOUSE"] = cold
            try:
                t0 = time.time()
                getattr(queries_r7, name)(spark, sf_dir)
                row[name] = round(time.time() - t0, 2)
            finally:
                os.environ.pop("SPARK_GRAFT_WAREHOUSE", None)
                shutil.rmtree(cold, ignore_errors=True)
        out[os.path.basename(sf_dir.rstrip("/"))] = row
        print(f"{sf_dir}: {row}", file=sys.stderr)
    print(json.dumps({"artifact_build_sec": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
