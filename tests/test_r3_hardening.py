"""Round-3 hardening pins (VERDICT r2 'Next round' items)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from target_parquet_spark.operators import similarity as S
from target_parquet_spark.queries_ext import td

SF001 = "/root/testdata/sf0.01"


def _mean_recall(spark, qfn):
    rows = qfn(spark, SF001).collect()
    assert len(rows) == 10
    return sum(r.recall_at_10 for r in rows) / len(rows)


def test_trained_codebook_improves_recall_at_same_nprobe(spark):
    """VERDICT r2 #2: wiring the Lloyd-trained (spherical) codebook into
    IVF must measurably beat the first-16-seed codebook at nprobe=2 on
    the neutral query stratum (queries disjoint from seed ids — the
    leaky stratum rewarded the seed codebook instead)."""
    from target_parquet_spark.queries_r3 import (
        sim_ivf_recall,
        sim_ivf_recall_trained,
    )

    seed = _mean_recall(spark, sim_ivf_recall)
    trained = _mean_recall(spark, sim_ivf_recall_trained)
    assert trained > seed, f"trained {trained} <= seed {seed}"


def test_kmeans_codebook_deterministic_and_shaped(spark):
    emb = td(spark, SF001, "embeddings").select("vec_id", "embedding")
    cb1 = S.kmeans_codebook(emb, n_centroids=8, n_iters=1)
    cb2 = S.kmeans_codebook(emb, n_centroids=8, n_iters=1)
    assert cb1 == cb2  # bit-deterministic training (6dp quantization)
    assert [c[0] for c in cb1] == list(range(8))
    assert all(len(c[1]) == 64 for c in cb1)
    with pytest.raises(ValueError, match="metric"):
        S.kmeans_codebook(emb, n_centroids=4, metric="manhattan")
