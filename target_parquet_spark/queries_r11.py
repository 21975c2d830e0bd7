"""Round-6 operator additions.

Two production-pipeline staples on top of the existing dedup/quality
machinery:

- ``dedup_keep_best_quality``: canonical selection by QUALITY — the
  keep-one policy real curation runs (keep-canonical keeps the smallest
  id; production keeps the best-scoring member of each near-dup group).
- ``text_pii_scan``: PII detection + redaction audit (emails, phone
  numbers, IPv4 addresses) with the redacted text pinned by hash — the
  governance gate every training-data pipeline runs before release.

Both ride the shared minhash-pair / corpus-component artifacts and the
SQL rubric twins already proven oracle-exact elsewhere; no reference
counterpart (the reference's §2.10 is empty — brief-extension surface).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query, t as td
from target_parquet_spark.queries_ext import (
    SQL_CC_CTES,
    SQL_CORPUS,
    SQL_MINHASH_PAIR_CTES,
    SQL_TOKS,
    _SQL_QSCORE,
    corpus_components,
)


@query(
    "dedup_keep_best_quality",
    f"""
    WITH RECURSIVE {SQL_CORPUS},
    {SQL_MINHASH_PAIR_CTES},
    {SQL_CC_CTES},
    scored AS (
      SELECT c.doc_id,
             coalesce(m.component_id, c.doc_id) AS component_id,
             {_SQL_QSCORE.format(t=SQL_TOKS.format(c='c.text'), x='c.text')}
               AS quality
      FROM corpus c LEFT JOIN comp m ON m.doc_id = c.doc_id),
    ranked AS (
      SELECT doc_id, component_id, quality,
             CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
               AS group_size,
             row_number() OVER (PARTITION BY component_id
                                ORDER BY quality DESC, doc_id) AS rn
      FROM scored)
    SELECT doc_id, component_id, group_size, quality
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best_quality(spark, sf_dir):
    """Quality-priority canonical selection: near-dup components from
    the shared pair artifact, then each group keeps its HIGHEST
    quality_score member (tie -> smallest doc_id) instead of
    keep-canonical's smallest-id rule — the keep-one policy a real
    curation pipeline applies (of N crawled near-copies, keep the
    cleanest).  Singletons keep themselves (component_id = own id).

    Determinism: quality is the 3-point rubric rounded to 4dp in BOTH
    engines before ranking, and the id tie-break makes the argmax
    unique even on equal scores.

    Plan shape for 100 TB: pairs come from the written minhash
    artifact, components are the shared CC fragments; scoring is one
    corpus scan, and the keep rule one (component)-keyed window over
    corpus-cardinality rows — no pair-shaped data survives past the CC
    stage."""
    corpus, comp = corpus_components(spark, sf_dir)
    # Score BEFORE the component join (guide §2.3, project before the
    # exchange): the rubric runs in the scan stage and only
    # (doc_id, quality) — 16 bytes — enters the join, instead of the
    # full document text riding the shuffle when comp outgrows the
    # broadcast threshold at scale.  Same expression, same rows: the
    # join key is doc_id and quality depends only on the corpus side.
    scored = corpus.select(
        "doc_id", X.quality_score(F.col("text")).alias("quality")
    )
    full = (
        scored.join(
            comp.select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("_cid"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("_cid", "doc_id").alias("component_id"),
            "quality",
        )
    )
    w = Window.partitionBy("component_id")
    rk = Window.partitionBy("component_id").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    return (
        full.withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("_rn", F.row_number().over(rk))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "component_id", "group_size", "quality")
    )


# --- PII scan / redaction ---------------------------------------------------
# Deterministic planting: the synthetic corpus holds no real PII, so the
# scan plants emails / phones / IPv4s into every 7th/11th/13th doc with
# IDENTICAL string expressions in both engines — the non-vacuity rule
# (join_anti's de-vacuation lesson): the query must prove it finds and
# redacts real hits, not count zeros.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+\d[0-9 ]{7,}\d"
_PII_IPV4 = r"\b(\d{1,3}\.)(\d{1,3}\.)(\d{1,3}\.)\d{1,3}\b"

def pii_augment(docs):
    """The deterministic planting frame — module-level so the query AND
    its tests build the identical augmented corpus (review r6: a
    hand-copied planting expression in the test would silently stop
    covering the shipped query when either copy changes)."""
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    d.cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 11 == 0,
                F.concat(
                    F.lit(" call +1 415 555 0"),
                    (d % 100).cast("string"),
                    F.lit(" soon"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 13 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (d % 200).cast("string"),
                    F.lit("."),
                    (d % 250).cast("string"),
                    F.lit(" up"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def pii_redact(col):
    """All three patterns replaced, email -> phone -> ipv4 (order is
    part of the contract: the SQL oracle nests identically)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE,
            "[PHONE]",
        ),
        _PII_IPV4,
        "[IPV4]",
    )


_SQL_PII_AUG = """
    aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || doc_id || '@example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call +1 415 555 0' || (doc_id % 100) || ' soon'
                     ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' host 10.0.' || (doc_id % 200) || '.'
                          || (doc_id % 250) || ' up'
                     ELSE '' END AS text
      FROM documents)"""


@query(
    "text_pii_scan",
    f"""
    WITH {_SQL_PII_AUG},
    hits AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
               AS n_phone,
             CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT)
               AS n_ipv4,
             md5(regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                     '{_PII_PHONE}', '[PHONE]', 'g'),
                   '{_PII_IPV4}', '[IPV4]', 'g')) AS redacted_md5
      FROM aug)
    SELECT doc_id, n_email, n_phone, n_ipv4, redacted_md5
    FROM hits WHERE n_email + n_phone + n_ipv4 > 0
    """,
)
def text_pii_scan(spark, sf_dir):
    """PII scan + redaction audit: per-document counts of email /
    phone / IPv4 pattern hits over the deterministically-planted
    corpus, plus the md5 of the fully-redacted text — the hash pins
    that redaction replaced EVERY occurrence identically in both
    engines, not just that counts agree.  Only documents with >= 1 hit
    emit (the release-gate's worklist shape).

    Pattern dialect note: the three regexes stay inside the syntax
    Java's engine and RE2 share (character classes, bounded repeats,
    word boundaries) — no lookaround, no backrefs — so the same
    pattern text drives both engines.

    Plan shape for 100 TB: one corpus scan, all three counts and the
    redaction in the same projection (regexp evaluation is the cost;
    it runs once per doc in codegen), and the output is filtered to
    the hit worklist before anything shuffles."""
    docs = td(spark, sf_dir, "documents").select("doc_id", "text")
    aug = pii_augment(docs)
    red = pii_redact(F.col("text"))
    hits = aug.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL))
        .cast("long")
        .alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(_PII_PHONE))
        .cast("long")
        .alias("n_phone"),
        F.regexp_count(F.col("text"), F.lit(_PII_IPV4))
        .cast("long")
        .alias("n_ipv4"),
        F.md5(red).alias("redacted_md5"),
    )
    return hits.filter(
        F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") > 0
    )
