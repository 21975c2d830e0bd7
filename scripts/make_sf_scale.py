#!/usr/bin/env python
"""Generate a k×-scaled copy of a testdata directory for scaling probes.

The driver only ships sf{0.001,0.01,0.1}; the 100 TB story needs at least
one more decade of measured growth (VERDICT r2, next-round item 7).  This
script replicates every table k times with replica-disjoint keys so join
fan-outs, group cardinalities, and dedup-pair counts scale the way "10×
more independent data" scales — NOT the way "10 identical copies" would
(identical copies would make every doc an exact-dup group of k and every
near-dup pair count quadratic in k, which measures the replication trick,
not the engine):

- fact/dim keys get a per-replica offset (orderkey, custkey, partkey,
  suppkey, event_id, user_id, doc_id, vec_id) so referential integrity
  holds within each replica and groups stay replica-local;
- document text gets a per-replica token suffix (disjoint vocab across
  replicas → shingle/minhash/simhash similarity structure matches the
  base corpus per replica, near-dup pairs grow linearly in k);
- embeddings are circularly rotated by replica index (norm-preserving,
  cross-replica cosine decorrelated → ANN/semantic-cluster candidate
  structure scales linearly);
- region/nation are fixed dimensions and copied once;
- events keep their time range (more users in the same window — the
  realistic 100 TB shape for a telemetry table).

Usage: python scripts/make_sf_scale.py [--src /root/testdata/sf0.1]
           [--dst /root/repo/.scratch/sf1] [-k 10]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(REPO, ".scratch", "sf1"))
    ap.add_argument("-k", type=int, default=10)
    args = ap.parse_args()

    from target_parquet_spark.session import get_spark

    spark = get_spark(app_name="make_sf_scale")

    # (table, key columns to offset). Offsets use the table's own max+1 so
    # replica key ranges never collide regardless of the base sf.
    plans = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    # FK columns share the offset of the PK table they reference, so the
    # per-key stride must come from the referenced table's max.
    stride_src = {
        "o_custkey": ("customer", "c_custkey"),
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    }

    os.makedirs(args.dst, exist_ok=True)
    maxes: dict[str, int] = {}
    for tbl, keys in plans.items():
        df = spark.read.parquet(f"{args.src}/{tbl}.parquet")
        for c in keys:
            if c in stride_src:
                rt, rc = stride_src[c]
                if rc not in maxes:
                    rdf = spark.read.parquet(f"{args.src}/{rt}.parquet")
                    maxes[rc] = rdf.agg(F.max(rc)).first()[0]
            else:
                maxes[c] = df.agg(F.max(c)).first()[0]

    for tbl, keys in plans.items():
        df = spark.read.parquet(f"{args.src}/{tbl}.parquet")
        out = f"{args.dst}/{tbl}.parquet"
        if not keys:  # fixed dimension
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for r in range(args.k):
            rep = df
            for c in keys:
                ref = stride_src.get(c, (None, c))[1]
                stride = int(maxes[ref]) + 1
                rep = rep.withColumn(c, F.col(c) + F.lit(r * stride))
            if tbl == "documents" and r > 0:
                rep = rep.withColumn(
                    "text",
                    F.expr(
                        f"array_join(transform(split(text, ' '), "
                        f"w -> concat(w, 'q{r}')), ' ')"
                    ),
                ).withColumn("n_chars", F.length("text"))
            if tbl == "embeddings" and r > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r + 1}, "
                        f"size(embedding) - {r}), slice(embedding, 1, {r}))"
                    ),
                )
            parts.append(rep)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        # Write wide enough that the sf1 scan starts parallel (mirrors a
        # real multi-file table; also keeps the td() repartition a no-op).
        scaled.repartition(32).write.mode("overwrite").parquet(out)
        print(f"{tbl}: {spark.read.parquet(out).count()} rows -> {out}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
