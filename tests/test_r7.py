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


# ---------------------------------------------------------------------------
# trained logreg: discrimination must beat the hand-set literal weights
# ---------------------------------------------------------------------------


def _auc(pairs):
    """Rank-statistic AUC over (score, label) pairs, ties averaged."""
    pairs = sorted(pairs, key=lambda p: p[0])
    n = len(pairs)
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j + 1 < n and pairs[j + 1][0] == pairs[i][0]:
            j += 1
        avg = (i + j + 2) / 2.0  # 1-based average rank of the tie block
        for k in range(i, j + 1):
            ranks[k] = avg
        i = j + 1
    n1 = sum(1 for _, y in pairs if y == 1.0)
    n0 = n - n1
    assert n1 and n0, "label fixture must contain both classes"
    rank_sum = sum(r for r, (_, y) in zip(ranks, pairs) if y == 1.0)
    return (rank_sum - n1 * (n1 + 1) / 2.0) / (n1 * n0)


def test_trained_logreg_beats_literal_weights(spark, sf_dir):
    from target_parquet_spark.queries_r5 import (
        _W0,
        _W_LOGWORDS,
        _W_MWL,
        _W_STOP,
        _W_SYM,
        _W_TTR,
    )
    from target_parquet_spark.queries_r7 import (
        _logreg_score,
        quality_feature_frame,
        train_quality_logreg,
    )

    z, w = train_quality_logreg(spark, sf_dir)
    trained = [
        (r.score, r.y)
        for r in z.select(_logreg_score(w).alias("score"), "y").collect()
    ]
    # literal model scores over RAW features (its weights were set for the
    # raw scale) against the same planted label
    fl = quality_feature_frame(spark, sf_dir)
    lit_z = (
        F.lit(_W0)
        + _W_LOGWORDS * F.col("f_logwords")
        + _W_TTR * F.col("f_ttr")
        + _W_MWL * F.col("f_mwl")
        + _W_STOP * F.col("f_stop")
        + _W_SYM * F.col("f_sym")
    )
    literal = [
        (r.score, r.y)
        for r in fl.select(
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-lit_z))).alias("score"), "y"
        ).collect()
    ]
    auc_t, auc_l = _auc(trained), _auc(literal)
    assert auc_t >= auc_l, f"trained AUC {auc_t:.4f} < literal {auc_l:.4f}"
    assert auc_t >= 0.85, f"trained AUC unexpectedly weak: {auc_t:.4f}"


def test_trained_logreg_weights_are_quantized_and_finite(spark, sf_dir):
    import math

    from target_parquet_spark.queries_r7 import train_quality_logreg

    _, w = train_quality_logreg(spark, sf_dir)
    assert len(w) == 6
    for v in w:
        assert math.isfinite(v)
        assert v == round(v, 6), "weights must be 6dp-quantized (oracle replay)"
    assert any(v != 0.0 for v in w), "training must move off the zero init"


# ---------------------------------------------------------------------------
# learned BPE merges: pinned against an independent Python BPE trainer
# ---------------------------------------------------------------------------


def _python_bpe(word_freqs, n_rounds):
    """Reference BPE trainer (independent of the Spark/SQL implementation):
    word dict -> iterative most-frequent-adjacent-pair merge, ties broken
    (count DESC, left ASC, right ASC), left-to-right non-overlapping
    application."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_rounds):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = {tuple(k): v for k, v in new_vocab.items()}
        tokens_after = sum(len(s) * f for s, f in vocab.items())
        merges.append((a, b, cnt, tokens_after))
    return merges


def test_bpe_matches_python_reference_on_planted_corpus(spark, tmp_path):
    """Plant a corpus with a known merge sequence and compare the full
    merge table against the independent Python trainer."""
    docs = [
        (1, "banana banana banana bandana"),
        (2, "ana ban nab banana"),
        (3, "the cat the hat the bat"),
    ]
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )
    from target_parquet_spark.queries_r7 import learn_bpe_merges

    got, _ = learn_bpe_merges(spark, str(tmp_path), n_rounds=6)

    # reference word-frequency dict from the same pre-tokenization
    import re

    wf = {}
    for _, text in docs:
        for w in re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", text.lower()):
            wf[w] = wf.get(w, 0) + 1
    want = _python_bpe(wf, 6)
    assert [(l, r, c, t) for _, l, r, c, t in got] == want


def test_bpe_compression_monotone_and_beats_static_topk(spark, sf_dir):
    """tokens_after must strictly decrease each round, and 8 ITERATIVE
    merges must compress at least as well as applying the top-8 pairs of
    round 1 simultaneously (the static table a non-learning tokenizer
    would use) — iteration discovers multi-char merges statics can't."""
    from target_parquet_spark.queries import QUERIES
    from target_parquet_spark.queries_r7 import _BPE_SEP

    rows = sorted(
        QUERIES["text_bpe_learn_merges"](spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert len(rows) == 8
    toks = [r.tokens_after for r in rows]
    assert all(a > b for a, b in zip(toks, toks[1:])), toks
    # later merges consume earlier ones' outputs: iterative training must
    # discover at least one multi-char merge a static table cannot
    multi = [r for r in rows if len(r.left_sym) > 1 or len(r.right_sym) > 1]
    assert multi, "expected at least one multi-char merge from iteration"

    # static top-8: rank round-1 pairs by count and apply all at once
    from target_parquet_spark.operators.text import bpe_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = (
        docs.select(F.explode(bpe_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "enc", F.regexp_replace("word", "(.)", _BPE_SEP + "$1" + _BPE_SEP)
        )
    )
    syms = F.filter(F.split(F.col("enc"), _BPE_SEP), lambda x: x != F.lit(""))
    n_s = F.size(syms)
    pairs = F.when(n_s < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_s - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        )
    )
    top8 = (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "l", "r")
        .limit(8)
        .collect()
    )
    static = vocab
    for b in top8:
        static = static.withColumn(
            "enc",
            F.replace(
                F.col("enc"),
                F.lit(_BPE_SEP + b.l + _BPE_SEP + _BPE_SEP + b.r + _BPE_SEP),
                F.lit(_BPE_SEP + b.l + b.r + _BPE_SEP),
            ),
        )
    static_tokens = static.agg(
        F.sum(
            F.col("freq")
            * F.size(F.filter(F.split(F.col("enc"), _BPE_SEP), lambda x: x != F.lit("")))
        ).cast("long")
    ).collect()[0][0]
    assert toks[-1] <= static_tokens, (
        f"learned {toks[-1]} > static top-8 {static_tokens}"
    )


def test_bpe_apply_compression_below_one(spark, sf_dir):
    """Applying the learned merges must strictly compress every source
    (tokens_bpe < tokens_chars) and agree with the training run's final
    corpus-wide token total."""
    from target_parquet_spark.queries import QUERIES
    from target_parquet_spark.queries_r7 import learn_bpe_merges

    rows = QUERIES["text_bpe_apply"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.tokens_bpe < r.tokens_chars
        assert 0.0 < r.compression < 1.0
    merges, _ = learn_bpe_merges(spark, sf_dir)
    # the training loop's final tokens_after is VOCAB-weighted over the
    # same corpus, so corpus-wide sums must agree exactly
    assert sum(r.tokens_bpe for r in rows) == merges[-1][4]


def test_knn_edge_artifact_matches_rederived(spark, sf_dir):
    """The materialized-edge degree histogram must equal the re-derived
    one, and the second invocation must NOT rewrite the artifact."""
    import glob
    import os

    from target_parquet_spark.queries import QUERIES

    a = {
        (r.degree, r.n_nodes)
        for r in QUERIES["scan_knn_edges_artifact"](spark, sf_dir).collect()
    }
    b = {
        (r.degree, r.n_nodes)
        for r in QUERIES["graph_degree_distribution"](spark, sf_dir).collect()
    }
    assert a == b and a
    from target_parquet_spark.io.layout import warehouse_dir

    dirs = glob.glob(os.path.join(warehouse_dir(), "knn_edges_*"))
    assert dirs
    mtime = max(os.path.getmtime(os.path.join(d, "_SUCCESS")) for d in dirs)
    QUERIES["scan_knn_edges_artifact"](spark, sf_dir).collect()
    mtime2 = max(os.path.getmtime(os.path.join(d, "_SUCCESS")) for d in dirs)
    assert mtime2 == mtime, "artifact must be reused, not rewritten"


def test_label_propagation_invariants(spark, sf_dir):
    """Seeds stay clamped to their rule, propagated labels are convex
    combinations (within [0,1]), and propagation reaches non-seed nodes."""
    from target_parquet_spark.queries import QUERIES

    rows = QUERIES["graph_label_propagation"](spark, sf_dir).collect()
    assert rows
    emb = {
        r.vec_id: r.e0
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").getItem(0).alias("e0"))
        .collect()
    }
    n_seed = n_prop = 0
    for r in rows:
        if r.is_seed:
            n_seed += 1
            want = 1.0 if emb[r.vec_id] >= 0 else 0.0
            assert r.label == want, f"seed {r.vec_id} drifted: {r.label}"
        elif r.label is not None:
            n_prop += 1
            assert 0.0 <= r.label <= 1.0
    assert n_seed, "seed set must be non-empty"
    assert n_prop, "propagation must reach at least one non-seed node"


# ---------------------------------------------------------------------------
# temperature mixture + winnowing
# ---------------------------------------------------------------------------


def test_temperature_mixture_reweights_toward_small_sources(spark, sf_dir):
    from target_parquet_spark.queries import QUERIES

    rows = QUERIES["sample_temperature_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.rate <= 1.0
        assert r.n_selected <= r.n_docs
    # alpha < 1: sampling RATE must be non-increasing in source size
    by_size = sorted(rows, key=lambda r: r.n_docs)
    rates = [r.rate for r in by_size]
    assert all(a >= b - 1e-9 for a, b in zip(rates, rates[1:])), (
        "smaller sources must get higher (or equal) sampling rates"
    )
    # realized total within a loose band of the budget (hash noise)
    tot = sum(r.n_docs for r in rows)
    sel = sum(r.n_selected for r in rows)
    assert 0.3 * tot <= sel <= 0.7 * tot


def test_winnowing_guarantee_on_planted_shared_run(spark, tmp_path):
    """Two documents sharing a 12-token run (>> w+k-1 = 6) must be
    reported as a fingerprint-sharing pair; unrelated docs must not."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = [
        (1, f"first document begins here {shared} and then ends uniquely"),
        (2, f"totally different opening words {shared} followed by other text"),
        (3, "nothing in common with the others at all whatsoever by design"),
    ]
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )
    from target_parquet_spark.queries import QUERIES

    pairs = {
        (r.id_a, r.id_b)
        for r in QUERIES["text_winnowing_pairs"](spark, str(tmp_path)).collect()
    }
    assert (1, 2) in pairs
    assert not any({a, b} == {1, 3} or {a, b} == {2, 3} for a, b in pairs
                   if a < 1000000 and b < 1000000), pairs


def test_winnowing_sparsifies_vs_full_grams(spark, sf_dir):
    """The winnowed fingerprint count must be well below the full gram
    count (the ~2/(w+1) density that makes the postings exchange cheap)."""
    from target_parquet_spark.operators.text import tokens
    from target_parquet_spark.queries_ext import _spark_corpus

    docs = _spark_corpus(spark, sf_dir)
    n_grams = docs.select(
        F.greatest(F.size(tokens(F.col("text"))) - 2, F.lit(0)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    from target_parquet_spark.queries_r7 import winnow_minima

    # density check against the SHIPPED expression (shared helper)
    minima = winnow_minima(tokens(F.col("text")))
    n_fp = docs.select(
        F.size(F.array_distinct(minima)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert n_fp < 0.6 * n_grams, (n_fp, n_grams)


def test_schema_evolution_null_pads_old_generation(spark, sf_dir):
    """The merged read must surface <absent> for every gen-1 row (even
    keys) and real statuses for gen-2 rows (odd keys)."""
    from target_parquet_spark.queries import QUERIES, t

    rows = {r.status: r.n_orders for r in
            QUERIES["scan_schema_evolution"](spark, sf_dir).collect()}
    o = t(spark, sf_dir, "orders")
    n_even = o.filter(F.col("o_orderkey") % 2 == 0).count()
    n_odd = o.filter(F.col("o_orderkey") % 2 == 1).count()
    assert rows.get("<absent>") == n_even
    assert sum(v for k, v in rows.items() if k != "<absent>") == n_odd
    assert len(rows) > 1, "expected real statuses alongside the null-pad bucket"
