"""Invariant tests for the late round-3 additions (queries_r5.py):
maximal duplicated-substring runs and the linear quality classifier.

The oracle gate proves engine-vs-DuckDB equality; these pin what
equality can't: the islands construction against a hand-built corpus
where the runs are known exactly, and the logistic formula against a
Python recomputation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import target_parquet_spark.queries_r5 as r5  # noqa: F401  (registers queries)
from target_parquet_spark.operators.text import STOPWORDS
from target_parquet_spark.queries import QUERIES


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return QUERIES[name](spark, sf_dir)

    return _run


# ---------------------------------------------------------------------------
# dedup_substring_runs
# ---------------------------------------------------------------------------


def test_substring_runs_invariants(run):
    rows = run("dedup_substring_runs").collect()
    assert rows
    for r in rows:
        # a single duplicated gram covers 5 tokens, so every run does
        assert r["longest_span"] >= 5
        assert 1 <= r["n_runs"]
        assert 0 <= r["n_long_spans"] <= r["n_runs"]
        if r["longest_span"] >= 20:
            assert r["n_long_spans"] >= 1
    # the doubled corpus guarantees long shared prefixes -> long runs
    assert any(r["longest_span"] >= 20 for r in rows)


def test_substring_runs_hand_check(spark, tmp_out):
    """12 unique tokens per doc; the corpus doubler appends a copy
    truncated by 2 tokens, so each original shares exactly its first 6
    gram positions (a 10-token span) with its copy, and nothing else.
    A 3-token doc yields no grams and must be absent."""
    docs = [
        (0, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"),
        (1, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"),
        (2, "c1 c2 c3"),
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
        r["doc_id"]: (r["n_runs"], r["longest_span"], r["n_long_spans"])
        for r in QUERIES["dedup_substring_runs"](spark, tmp_out).collect()
    }
    # originals: grams 0..5 duplicated (present in the truncated copy),
    # grams 6,7 unique -> one run of 6 grams = 10 tokens
    assert got[0] == (1, 10, 0)
    assert got[1] == (1, 10, 0)
    # copies: all 6 of their grams are in the original -> same one run
    assert got[1000000] == (1, 10, 0)
    assert got[1000001] == (1, 10, 0)
    # the 3-token doc (and its 1-token copy) produce no grams at all
    assert 2 not in got and 1000002 not in got
    assert set(got) == {0, 1, 1000000, 1000001}


# ---------------------------------------------------------------------------
# text_quality_logreg
# ---------------------------------------------------------------------------


def test_quality_logreg_invariants(run, spark, sf_dir):
    rows = run("text_quality_logreg").collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    from target_parquet_spark.queries_ext import td
    from target_parquet_spark.operators import text as X

    n_nonempty = (
        td(spark, sf_dir, "documents")
        .filter(F.size(X.tokens(F.col("text"))) > 0)
        .count()
    )
    assert total == n_nonempty
    for r in rows:
        assert 0 <= r["decile"] <= 9
        assert 0.0 < r["avg_score"] < 1.0
        # the decile's mean must sit inside the decile (4-dp rounding slack)
        assert r["decile"] / 10 - 5e-5 <= r["avg_score"]
        assert r["avg_score"] <= (r["decile"] + 1) / 10 + 5e-5


def test_quality_logreg_formula_hand_check(spark, tmp_out):
    """Single doc, features recomputed in Python, score must match the
    literal-weight sigmoid to the 4-dp rounding used by the query."""
    text = "the quick quick fox"
    (
        spark.createDataFrame([(0, text)], "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{tmp_out}/documents.parquet")
    )
    toks = text.split()
    n = len(toks)
    f_logwords = math.log(1.0 + n)
    f_ttr = len(set(toks)) / n
    f_mwl = sum(len(t) for t in toks) / n
    f_stop = sum(t in STOPWORDS for t in toks) / n
    f_sym = 0.0  # all chars are alnum or whitespace
    z = (
        r5._W0
        + r5._W_LOGWORDS * f_logwords
        + r5._W_TTR * f_ttr
        + r5._W_MWL * f_mwl
        + r5._W_STOP * f_stop
        + r5._W_SYM * f_sym
    )
    want = 1.0 / (1.0 + math.exp(-z))
    rows = QUERIES["text_quality_logreg"](spark, tmp_out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 1
    assert r["decile"] == min(int(want * 10), 9)
    assert r["avg_score"] == pytest.approx(round(want, 4), abs=1e-9)


def test_substring_runs_matches_python_reference(spark, tmp_out):
    """Independent Python recomputation on a seeded random corpus with a
    small vocabulary (forcing cross-doc gram collisions): gram indexing,
    duplicated-position marking, and island merging are re-derived from
    scratch (dict + manual run-scan, no SQL), then compared row-for-row.
    The corpus doubler is part of the query, so the reference applies the
    same doubling."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(30)
    ]
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{tmp_out}/documents.parquet")
    )

    # the doubled corpus: each doc + its copy truncated by 2 tokens
    corpus = {}
    for i, text in docs:
        toks = text.split()
        corpus[i] = toks
        corpus[i + 1000000] = toks[: max(len(toks) - 2, 0)]

    grams = {
        d: [tuple(t[i : i + 5]) for i in range(len(t) - 4)]
        for d, t in corpus.items()
    }
    owners = {}
    for d, gs in grams.items():
        for g in set(gs):
            owners.setdefault(g, set()).add(d)
    want = {}
    for d, gs in grams.items():
        dup = [i for i, g in enumerate(gs) if len(owners[g]) >= 2]
        if not dup:
            continue
        runs = []
        start = prev = dup[0]
        for p in dup[1:]:
            if p == prev + 1:
                prev = p
            else:
                runs.append(prev - start + 1 + 4)
                start = prev = p
        runs.append(prev - start + 1 + 4)
        want[d] = (
            len(runs),
            max(runs),
            sum(1 for r in runs if r >= 20),
        )

    got = {
        r["doc_id"]: (r["n_runs"], r["longest_span"], r["n_long_spans"])
        for r in QUERIES["dedup_substring_runs"](spark, tmp_out).collect()
    }
    assert got == want
