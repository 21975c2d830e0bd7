"""Round-5 additions: batch cross-corpus near-dup screening, trained
text-quality logistic regression, and learned BPE merges.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — absent categories); each is a standard LLM-pipeline
stage extending an existing family:

* ``dedup_cross_corpus`` is the single most common production dedup job
  shape — screen a NEW crawl against the EXISTING corpus (the batch twin
  of ``operators/dedup.streaming_near_dup``, same banding as
  ``dedup_minhash_lsh_pairs``).  The synthetic new crawl contains both
  true near-dups (perturbed copies) and genuinely novel docs (token-
  reversed — same vocabulary, disjoint shingle sets), so the match set
  is provably non-empty AND non-total.

Oracle contract as everywhere in this repo: identical tokenize/shingle/
md5 expressions in both engines, every computed column aliased
identically, floats rounded in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_parquet_spark.operators import dedup as D
from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query
from target_parquet_spark.queries_ext import (
    SQL_HS,
    SQL_SHINGLES,
    SQL_SIG,
    SQL_TOKS,
    td,
)

# ---------------------------------------------------------------------------
# cross-corpus near-dup (VERDICT r4 #7)
# ---------------------------------------------------------------------------

# The synthetic "new crawl": even doc_ids arrive as near-dups (last two
# tokens dropped — same perturbation as SQL_CORPUS), odd doc_ids arrive
# token-REVERSED: same vocabulary and length, but 3-gram shingle sets are
# (essentially) disjoint, so they screen as novel.  Both transforms are
# deterministic and expressible identically in both engines.
SQL_NEW_CRAWL = f"""
  newc AS (
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(tt[1:len(tt) - 2], ' ') AS text
    FROM (SELECT doc_id, {SQL_TOKS.format(c='text')} AS tt FROM documents)
    WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           array_to_string(list_reverse(tt), ' ') AS text
    FROM (SELECT doc_id, {SQL_TOKS.format(c='text')} AS tt FROM documents)
    WHERE doc_id % 2 = 1
  )
"""


def _sql_band_side(side: str, src: str) -> str:
    """The banding pipeline (tokens -> shingles -> 60-bit hashes -> chunked
    MinHash -> band hashes) for one corpus side, as named CTEs.  Mirrors
    queries_ext.SQL_MINHASH_PAIR_CTES exactly — the cross-corpus form just
    runs it twice with a side prefix instead of self-joining one copy."""
    return f"""
    {side}_toks AS (SELECT doc_id, {SQL_TOKS.format(c='text')} AS tt FROM {src}),
    {side}_sh AS (SELECT doc_id, {SQL_SHINGLES.format(t='tt')} AS s FROM {side}_toks),
    {side}_shh AS (SELECT doc_id, {SQL_HS.format(s='s')} AS hs FROM {side}_sh),
    {side}_sig AS (
      SELECT doc_id, hs, {SQL_SIG.format(h='hs')} AS g
      FROM {side}_shh WHERE len(hs) > 0),
    {side}_bands AS (
      SELECT doc_id, u.b AS band_idx,
             md5(g[2*u.b + 1] || '|' || g[2*u.b + 2]) AS band_hash
      FROM {side}_sig, unnest(range(0, 4)) AS u(b))"""


_SQL_XJACC = (
    "round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)"
    " / CAST(len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)) AS DOUBLE),"
    " 4)"
)


@query(
    "dedup_cross_corpus",
    f"""
    WITH {SQL_NEW_CRAWL},
    {_sql_band_side('n', 'newc')},
    {_sql_band_side('c', 'documents')},
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS dup_of
      FROM n_bands n JOIN c_bands c
        ON n.band_idx = c.band_idx AND n.band_hash = c.band_hash)
    SELECT cand.new_id, cand.dup_of, {_SQL_XJACC} AS jaccard
    FROM cand
    JOIN n_shh sa ON sa.doc_id = cand.new_id
    JOIN c_shh sb ON sb.doc_id = cand.dup_of
    WHERE {_SQL_XJACC} >= 0.5
    """,
)
def dedup_cross_corpus(spark, sf_dir):
    """New-crawl-vs-existing-corpus near-dup screen: both sides banded
    with the identical scan-stage MinHash pipeline, equi-joined on the
    band key (never all-pairs), Jaccard-verified before the pair-dedupe
    distinct.  The planted crawl makes the expected output non-empty
    (every even doc's perturbed twin matches) and non-total (reversed
    docs share vocabulary but not shingles — they screen as novel)."""
    docs = td(spark, sf_dir, "documents").select("doc_id", "text")
    toks = X.tokens(F.col("text"))
    near = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 2)).alias("text"),
    )
    novel = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(toks)).alias("text"),
    )
    new_crawl = near.unionByName(novel)
    return D.cross_corpus_near_dup(
        new_crawl, docs, "text", "doc_id",
        threshold=0.5, n_hashes=8, bands=4,
    ).select("new_id", "dup_of", "jaccard")
