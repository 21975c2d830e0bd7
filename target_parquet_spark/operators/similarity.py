"""Similarity search over embedding columns (``array<float>``).

- **brute-force cosine**: the exactness baseline.  Query-vs-corpus is a
  broadcast of the query vector and one linear scan — no shuffle; the dot
  product is a sequential ``aggregate(zip_with(...))`` fold in codegen
  (deterministic order, so a DuckDB oracle can reproduce it bit-for-bit).
- **hyperplane LSH (ANN)**: the scale path.  ``n_planes`` deterministic
  pseudo-random hyperplanes (md5-seeded ±1 components — no stored model)
  give each vector a sign-bit bucket; search touches only the query's
  bucket.  At 100 TB the bucket id becomes the partition key: write the
  corpus ``partitionBy("bucket")`` and a query prunes to one partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dot", "cosine", "brute_force_topk", "lsh_bucket", "lsh_ann_topk"]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the 1-row query, scan the corpus.

    Returns (vec_id, sim) with sim rounded to 4 decimals; ties broken by
    id so the result is deterministic.
    """
    q = F.broadcast(query.select(F.col(vec_col).alias("_qvec")))
    scored = corpus.crossJoin(q).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 4).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def plane_weights(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 parity of "plane:dim" — a pure
    function, reproducible anywhere (the DuckDB oracle embeds the same
    literals).  Computed driver-side ONCE so the per-row expression does no
    hashing at all."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0] in "02468ace" else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-bit bucket string, e.g. '10110010' for 8 planes.

    The plane matrix is inlined as literal arrays: each bit is one
    zip_with+aggregate fold over the vector — no hashing, no shuffle."""
    planes = plane_weights(n_planes, dim)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_ann_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: exact cosine ranking restricted to the query's LSH bucket."""
    bucketed = corpus.withColumn("bucket", lsh_bucket(F.col(vec_col), n_planes))
    q = F.broadcast(
        query.select(
            F.col(vec_col).alias("_qvec"),
            lsh_bucket(F.col(vec_col), n_planes).alias("_qbucket"),
        )
    )
    scored = (
        bucketed.join(q, F.col("bucket") == F.col("_qbucket"))
        .select(
            F.col(id_col),
            F.col("bucket"),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 4).alias("sim"),
        )
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)
