"""Invariant tests for the round-2 operator families (queries_r2.py).

The oracle gate proves engine-vs-DuckDB equality; these pin the
*structural* guarantees the oracles can't express as equality checks:
bloom filters never drop true matches, CMS never undercounts, split
partitions are disjoint, the sweep-line peak is bounded, dup-span ratios
are well-formed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import target_parquet_spark.queries_r2  # noqa: F401  (registers queries)
from target_parquet_spark.queries import QUERIES


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return QUERIES[name](spark, sf_dir)

    return _run


def test_bloom_prefilter_no_false_negatives(run):
    row = run("join_bloom_prefilter").collect()[0]
    assert row.n_false_neg == 0  # bloom filters may over-admit, never drop
    assert row.n_pass >= row.n_true
    assert row.n_false_pos == row.n_pass - row.n_true


def test_cms_never_undercounts(run):
    rows = run("agg_heavy_hitters_cms").collect()
    assert len(rows) == 20
    assert all(r.overcount >= 0 for r in rows)  # CMS one-sided error
    assert all(r.cms_est >= r.true_n for r in rows)


def test_grouped_split_partitions_users(run, spark, sf_dir):
    rows = {r.split: r for r in run("split_train_test_grouped").collect()}
    # sf0.001 has ~10 users; not every split need be populated, but no
    # split beyond the three may exist
    assert set(rows) <= {"train", "valid", "test"}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    # splits partition both users and events exactly (no overlap, no loss)
    assert sum(r.n_users for r in rows.values()) == n_users
    assert sum(r.n_events for r in rows.values()) == n_events
    assert abs(sum(r.pct_events for r in rows.values()) - 1.0) < 1e-3


def test_concurrency_peak_bounds(run, spark, sf_dir):
    rows = run("events_concurrency_sweep").collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert rows and all(1 <= r.peak_concurrency <= ev for r in rows)


def test_ohlc_bars_invariants(run):
    for r in run("events_ohlc_bars").collect():
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.volume >= 1


def test_dup_span_ratio_wellformed(run):
    rows = run("dedup_span_ngram").collect()
    assert all(0.0 <= r.dup_ratio <= 1.0 for r in rows)
    assert all(r.n_dup <= r.n_grams for r in rows)
    # the doubled corpus guarantees heavily-duplicated docs exist
    assert any(r.dup_ratio > 0.5 for r in rows)


def test_retention_cohort_offsets_nonnegative(run):
    rows = run("events_retention_cohorts").collect()
    assert all(r.week_offset >= 0 for r in rows)
    # offset-0 cell of each cohort contains every cohort member's first event
    zero = [r for r in rows if r.week_offset == 0]
    assert zero and all(r.active_users >= 1 for r in zero)


def test_cumulative_distinct_monotone(run):
    rows = sorted(run("window_cumulative_distinct").collect(), key=lambda r: r.day)
    cums = [r.cum_users for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r.new_users for r in rows)


def test_equidepth_deciles_balanced(run):
    rows = sorted(run("agg_equidepth_histogram").collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile's equal-depth guarantee
    # bucket ranges are ordered and non-overlapping
    for lo_r, hi_r in zip(rows, rows[1:]):
        assert lo_r.hi <= hi_r.lo


def test_tfidf_ranks_dense(run):
    rows = run("text_tfidf_topterms").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())
    assert all(len(v) <= 3 for v in by_doc.values())


def test_entropy_bounds(run):
    import math

    rows = run("agg_group_entropy").collect()
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert -1e-9 <= r.entropy <= math.log(r.n_langs) + 1e-9
