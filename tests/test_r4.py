"""Invariant tests for the round-3 additions (queries_r4.py): BM25
ranked retrieval and Gopher-style repetition screening.

The oracle gate proves engine-vs-DuckDB equality; these pin what
equality can't: the BM25 formula against a hand-computed tiny corpus,
ranking monotonicity, and the probability-range invariants of the
repetition signals.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import target_parquet_spark.queries_r4 as r4  # noqa: F401  (registers queries)
from target_parquet_spark.queries import QUERIES


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return QUERIES[name](spark, sf_dir)

    return _run


def test_bm25_topk_sorted_positive(run):
    rows = run("text_bm25_search").collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_formula_hand_check(spark, tmp_out):
    """3-doc corpus small enough to hand-compute: the query path must
    reproduce the Okapi formula exactly (k1=1.2, b=0.75, smoothed idf)."""
    docs = [
        (0, "spark join spark filter"),        # tf(spark)=2, tf(join)=1, dl=4
        (1, "window scan scan scan"),          # tf(window)=1, dl=4
        (2, "filter scan merge sort agg big"), # no query terms, dl=6
    ]
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{tmp_out}/documents.parquet")
    )

    got = {
        r["doc_id"]: r["bm25"]
        for r in QUERIES["text_bm25_search"](spark, tmp_out).collect()
    }

    n, avgdl, k1, b = 3, 14 / 3, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def part(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp0 = idf(1) * part(2, 4) + idf(1) * part(1, 4)  # spark + join
    exp1 = idf(1) * part(1, 4)                        # window
    assert got.keys() == {0, 1}
    assert got[0] == pytest.approx(round(exp0, 4), abs=1e-4)
    assert got[1] == pytest.approx(round(exp1, 4), abs=1e-4)
    assert got[0] > got[1]


def test_gopher_signals_in_range(run):
    rows = run("text_repetition_gopher").collect()
    assert rows
    for r in rows:
        assert 0 < r["avg_ttr"] <= 1.0
        assert 0 < r["avg_top_bigram_share"] <= 1.0
        assert r["avg_word_len"] > 0
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert r["pass_rate"] == pytest.approx(
            r["n_pass"] / r["n_docs"], abs=5e-4
        )


def test_gopher_flags_repetitive_doc(spark, tmp_out):
    """A doc that is one phrase repeated must fail the gate; a normal
    varied doc of the same length must pass."""
    bad = " ".join(["ad click now"] * 20)          # 60 words, 1 bigram dominates
    good = " ".join(f"tok{i} word{i * 7 % 13}" for i in range(30))  # 60 varied
    spark.createDataFrame(
        [(0, bad, "en", "srcbad", len(bad)), (1, good, "en", "srcgood", len(good))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_out}/documents.parquet")
    rows = {
        r["source"]: r
        for r in QUERIES["text_repetition_gopher"](spark, tmp_out).collect()
    }
    assert rows["srcbad"]["n_pass"] == 0
    assert rows["srcgood"]["n_pass"] == 1
    assert (
        rows["srcbad"]["avg_top_bigram_share"]
        > rows["srcgood"]["avg_top_bigram_share"]
    )


def test_scaled_semantic_clusters_always_find_planted_copies(run):
    """Exact duplicates (the doubled corpus's vec_id / vec_id+1000000
    copies) share every LSH bucket in every table regardless of the
    adaptive plane count, so each copy pair MUST land in one cluster."""
    rows = run("sim_semantic_clusters_scaled").collect()
    cluster_of = {r["vec_id"]: r["cluster_id"] for r in rows}
    originals = [v for v in cluster_of if v < 1000000]
    assert originals
    for v in originals:
        assert cluster_of.get(v + 1000000) == cluster_of[v]


def test_plane_tables_are_independent():
    from target_parquet_spark.operators.similarity import plane_weights

    t0 = plane_weights(8, 16, table=0)
    t1 = plane_weights(8, 16, table=1)
    assert t0 != t1
    # table 0 must keep the original (oracle-pinned) keys
    import hashlib

    assert t0[0][0] == (
        1.0
        if hashlib.md5(b"0:0").hexdigest()[0] in "02468ace"
        else -1.0
    )


def test_hdr_sketch_error_within_bin_bound(run):
    """Geometric 1.1-wide bins put every estimate within a half bin
    (~4.9%) of the true quantile; allow a hair for interpolation."""
    rows = run("agg_hdr_quantile_sketch").collect()
    assert rows
    for r in rows:
        for q in (50, 90, 99):
            assert 0 <= r[f"err_p{q}"] <= 0.06
            assert r[f"est_p{q}"] > 0


def test_hdr_sketch_state_merges_by_addition(spark, sf_dir):
    """The sketch state (status, bin) -> count must merge across shards
    by plain addition: counts built from two disjoint halves of orders,
    summed, equal the whole-table counts."""
    from pyspark.sql import functions as F

    from target_parquet_spark.queries import t
    from target_parquet_spark.queries_r4 import hdr_bin

    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)

    def sketch(df):
        return df.groupBy(
            "o_orderstatus", hdr_bin(F.col("o_totalprice")).alias("bin")
        ).agg(F.count(F.lit(1)).alias("n"))

    whole = {(r[0], r[1]): r[2] for r in sketch(o).collect()}
    h1 = sketch(o.filter(F.col("o_orderkey") % 2 == 0))
    h2 = sketch(o.filter(F.col("o_orderkey") % 2 == 1))
    merged = {}
    for r in h1.collect() + h2.collect():
        merged[(r[0], r[1])] = merged.get((r[0], r[1]), 0) + r[2]
    assert merged == whole


def test_sequence_packing_invariants(run):
    r = run("sample_sequence_packing").collect()[0]
    assert r["n_docs"] > 0 and r["n_bins"] > 0
    assert r["n_oversize"] >= 0
    # fill ratio: bins average near capacity; straddling docs can push a
    # bin over, padding under — both bounded
    assert 0.5 < r["avg_fill"] < 1.5
    assert 0 <= r["waste_share"] < 0.5
    assert 0 <= r["overflow_bin_share"] <= 1.0
    # every bin holds at least one doc
    assert r["n_docs"] >= r["n_bins"]


def test_point_in_time_join_partitions_all_purchases(run, spark, sf_dir):
    """SCD2 validity intervals tile [first-event, inf) per user and every
    purchase IS an event of that user, so each purchase matches EXACTLY
    one interval: state counts must partition the purchase count."""
    from target_parquet_spark.queries import QUERIES, t

    rows = run("cdc_point_in_time_join").collect()
    total = sum(r["n_purchases"] for r in rows)
    want = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total == want
    assert all(r["sum_value"] >= 0 for r in rows)


def test_ab_experiment_is_aa_neutral(run):
    """Arms are a hash split of the SAME population (an A/A test), so the
    lift must be small and the Welch t statistic far from significance
    blowups; both arms populated."""
    r = run("events_ab_experiment").collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    # hash split is near 50/50
    assert abs(r["n_a"] - r["n_b"]) / (r["n_a"] + r["n_b"]) < 0.2
    assert abs(r["welch_t"]) < 4.0
    assert abs(r["lift_pct"]) < 25.0


def test_phash_pairs_find_all_planted_copies(run, spark, sf_dir):
    """Every ASCII doc's planted exact copy (doc_id + 1000000) shares the
    identical dHash, hence every band: the pair MUST appear at hamming 0."""
    from target_parquet_spark.queries import t

    rows = run("multimodal_phash_pairs").collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    n_ascii = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.octet_length("text") == F.length("text"))
            & (F.length("text") > 0)
        )
        .count()
    )
    planted = [
        (i, i + 1000000) for i in range(n_ascii) if (i, i + 1000000) in got
    ]
    assert len(planted) == n_ascii
    assert all(got[p] == 0 for p in planted)


def test_temperature_mixture_upweights_small_sources(run, spark, sf_dir):
    """alpha < 1 compresses the size distribution: sampled shares must be
    strictly more uniform than natural shares (small sources get a larger
    fraction of the sample than of the corpus), quotas deterministic."""
    from target_parquet_spark.queries import t

    rows = run("sample_temperature_mixture").collect()
    got = {}
    for r in rows:
        got[r["source"]] = got.get(r["source"], 0) + 1
    nat = {
        r["source"]: r["n"]
        for r in t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(nat.values())
    s_total = sum(got.values())
    small = min(nat, key=nat.get)
    big = max(nat, key=nat.get)
    if nat[small] < nat[big]:  # only meaningful when sizes differ
        assert got[small] / s_total >= nat[small] / n_total
        assert got[big] / s_total <= nat[big] / n_total
    # deterministic: second run picks the identical doc set
    again = run("sample_temperature_mixture").collect()
    assert sorted((r["source"], r["doc_id"]) for r in rows) == sorted(
        (r["source"], r["doc_id"]) for r in again
    )


def test_adaptive_plane_count_targets_occupancy():
    """n_planes must satisfy 2^planes ~ n / target_occupancy (clamped to
    [8, 24]) — the knob that holds per-bucket pair work constant."""
    import math

    def planes(n, occ=128):
        return max(8, min(24, math.ceil(math.log2(max(n, 2) / occ))))

    assert planes(4_000) == 8          # small corpora clamp to the floor
    assert planes(1_000_000) == 13     # ~8k buckets, ~122/bucket
    assert planes(1_000_000_000) == 23 # ~8M buckets, ~119/bucket
    for n in (10_000, 10_000_000):
        p = planes(n)
        if 8 < p < 24:
            assert n / (2 ** p) <= 128 < n / (2 ** (p - 1))
