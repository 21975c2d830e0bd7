"""Planted-signal tests for the round-6 operators (queries_r11):
quality-priority canonical selection and the PII scan/redaction audit.

Oracle hash-equality (scripts/check_oracle.py) is the primary gate;
these pin SEMANTICS against independent recomputation (the
BPE-separator lesson: both engines can agree on a wrong answer).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

import target_parquet_spark.queries_r11  # noqa: F401  (registers queries)
from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import QUERIES
from target_parquet_spark.queries_ext import corpus_components
from target_parquet_spark.queries_r11 import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_PHONE,
)


class TestKeepBestQuality:
    def test_one_keeper_per_component_and_argmax_rule(self, spark, sf_dir):
        out = QUERIES["dedup_keep_best_quality"](spark, sf_dir).collect()
        comps = [r.component_id for r in out]
        assert len(comps) == len(set(comps))  # exactly one keeper each

        # independent recomputation of the argmax rule over the same
        # component assignment and quality scores
        corpus, comp = corpus_components(spark, sf_dir)
        scored = {
            r.doc_id: (r.q, r.cid)
            for r in corpus.join(
                comp.select(
                    F.col("node").alias("doc_id"),
                    F.col("component").alias("_c"),
                ),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("_c", "doc_id").alias("cid"),
                X.quality_score(F.col("text")).alias("q"),
            )
            .collect()
        }
        best = {}
        for doc, (q, cid) in scored.items():
            cur = best.get(cid)
            # max quality, tie -> smallest doc_id
            if cur is None or (-q, doc) < (-cur[0], cur[1]):
                best[cid] = (q, doc)
        want = {cid: doc for cid, (q, doc) in best.items()}
        got = {r.component_id: r.doc_id for r in out}
        assert got == want

        # the planted perturbed twins guarantee real multi-member groups
        assert any(r.group_size >= 2 for r in out)
        # and the total keeper count is components + singletons
        assert len(out) == len(best)

    def test_quality_beats_id_order_planted(self, spark, tmp_path):
        """The quality ranking must OVERRIDE the id order (otherwise the
        query is indistinguishable from keep-canonical): plant a
        near-dup pair whose LOWER id is below the length band (9 tokens
        -> rubric loses the length point) and whose higher id is the
        clean longer version — the higher id must be kept.

        Note the query self-plants perturbed twins of every doc_id
        (the doubled-corpus convention), so each planted doc also drags
        its twin into the group; that only grows the group."""
        short = "the cat sat on the mat and it is"  # 9 tokens
        long_ = short + " quite warm today"  # 12 tokens, Jaccard 0.7
        (
            spark.createDataFrame(
                [
                    (10, short, "en", "t", len(short)),
                    (20, long_, "en", "t", len(long_)),
                ],
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/documents.parquet")
        )
        out = {
            r.component_id: r
            for r in QUERIES["dedup_keep_best_quality"](
                spark, str(tmp_path)
            ).collect()
        }
        # both docs (plus their self-planted twins) share one component
        # rooted at the smallest id (10); sanity-check the planted
        # fixture actually produced ONE merged group
        assert 10 in out and out[10].group_size >= 2
        # the keeper is NOT the smallest id: 20 (or its twin, which has
        # the same clean text and loses the id tie-break to 20)
        assert out[10].doc_id == 20
        assert out[10].quality > 0


class TestPiiScan:
    def test_planted_hits_and_redaction(self, spark, sf_dir):
        rows = {r.doc_id: r for r in QUERIES["text_pii_scan"](
            spark, sf_dir
        ).collect()}
        assert rows  # non-vacuous
        # doc 0 matches all three planting rules (0 % anything == 0)
        assert 0 in rows
        assert rows[0].n_email >= 1
        assert rows[0].n_phone >= 1
        assert rows[0].n_ipv4 >= 1
        # every email-planted doc is found; none of the un-planted,
        # un-hit docs emit a row with zero counts (filter contract)
        for d, r in rows.items():
            assert r.n_email + r.n_phone + r.n_ipv4 > 0
            if d % 7 == 0:
                assert r.n_email >= 1

    def test_patterns_match_python_re_on_planted_strings(self):
        """The three patterns stay in the Java/RE2-shared dialect; pin
        their behavior on canonical strings with Python re as a third
        engine (any divergence here means the dialect assumption broke)."""
        s = ("contact user21@example.com now call +1 415 555 021 soon "
             "host 10.0.21.21 up ver 1.2 x@y a@b.co")
        assert re.findall(_PII_EMAIL, s) == ["user21@example.com", "a@b.co"]
        assert len(re.findall(_PII_PHONE, s)) == 1
        assert len(re.findall(_PII_IPV4, s)) == 1  # "1.2" must NOT hit

    def test_redacted_text_has_no_residual_hits(self, spark, sf_dir):
        """Rebuild the redacted text with the query's OWN helper
        expressions (imported, not copied) and prove zero residual
        pattern hits — md5 equality against the oracle pins
        cross-engine identity, this pins actual removal."""
        from target_parquet_spark.queries import t as td
        from target_parquet_spark.queries_r11 import pii_augment, pii_redact

        docs = td(spark, sf_dir, "documents").select("doc_id", "text")
        aug = pii_augment(docs)
        red = pii_redact(F.col("text"))
        residual = aug.select(
            (F.regexp_count(red, F.lit(_PII_EMAIL))
             + F.regexp_count(red, F.lit(_PII_PHONE))
             + F.regexp_count(red, F.lit(_PII_IPV4))).alias("n")
        ).agg(F.sum("n").alias("s")).collect()[0].s
        assert residual == 0
