"""Invariant tests for the round-5 additions (queries_r7.py and the
operators behind them).

The oracle gate proves engine-vs-DuckDB equality; these pin what
equality can't: that the cross-corpus screen finds a PLANTED known
near-dup pair with the right attribution, rejects a genuinely novel
document, and agrees with the single-corpus LSH pipeline on the same
banding parameters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import target_parquet_spark.queries_r7 as r7  # noqa: F401  (registers queries)
from target_parquet_spark.operators.dedup import (
    cross_corpus_near_dup,
    minhash_lsh_pairs,
)
from target_parquet_spark.queries import QUERIES

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "machine learning models require large curated training corpora today"),
    (3, "completely unrelated text about cooking pasta with garlic and olive oil"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_corpus_finds_planted_near_dup(spark):
    # new doc 101 = base doc 1 with the last two tokens dropped (the same
    # perturbation the registry query plants); new doc 102 is novel.
    new = [
        (101, "the quick brown fox jumps over the lazy dog near the"),
        (102, "astronomy telescopes observe distant galaxies through clear skies"),
    ]
    out = cross_corpus_near_dup(
        _df(spark, new), _df(spark, BASE), "text", "doc_id", threshold=0.5
    ).collect()
    matches = {(r.new_id, r.dup_of) for r in out}
    assert (101, 1) in matches
    assert all(r.new_id != 102 for r in out), "novel doc must not match"
    for r in out:
        assert 0.5 <= r.jaccard <= 1.0


def test_cross_corpus_identical_doc_jaccard_one(spark):
    new = [(201, BASE[1][1])]
    out = cross_corpus_near_dup(
        _df(spark, new), _df(spark, BASE), "text", "doc_id"
    ).collect()
    assert {(r.new_id, r.dup_of, r.jaccard) for r in out} == {(201, 2, 1.0)}


def test_cross_corpus_agrees_with_self_join_form(spark):
    """Splitting one corpus in two and cross-screening must find exactly
    the cross-side subset of the single-corpus pair set (same banding)."""
    rows = BASE + [
        (11, "the quick brown fox jumps over the lazy dog near the river"),
        (12, "machine learning models require large curated training corpora"),
    ]
    allp = minhash_lsh_pairs(_df(spark, rows), "text", "doc_id", threshold=0.5)
    want = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b), r.jaccard)
        for r in allp.collect()
        if (r.id_a > 10) != (r.id_b > 10)
    }
    got = cross_corpus_near_dup(
        _df(spark, [r for r in rows if r[0] > 10]),
        _df(spark, [r for r in rows if r[0] <= 10]),
        "text",
        "doc_id",
        threshold=0.5,
    ).collect()
    assert {(r.new_id, r.dup_of, r.jaccard) for r in got} == want
    assert want, "fixture must produce at least one cross-side pair"


def test_registry_query_nonvacuous(spark, sf_dir):
    out = QUERIES["dedup_cross_corpus"](spark, sf_dir)
    rows = out.collect()
    assert rows, "cross-corpus screen must find the planted perturbed twins"
    # every even doc's perturbed twin should match itself
    self_matches = {r.dup_of for r in rows if r.new_id == r.dup_of + 1000000}
    assert self_matches, "expected (doc, doc+1000000) self-attributions"
    # reversed docs (id >= 2000000) are novel: none should survive the
    # Jaccard threshold against ANY base doc
    assert all(r.new_id < 2000000 for r in rows)
