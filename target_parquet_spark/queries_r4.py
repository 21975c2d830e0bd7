"""Round-3 operator additions: BM25 ranked retrieval and Gopher-style
repetition/quality screening over the documents corpus.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — absent categories); both are standard pieces of a
large-scale training-data pipeline that the existing text family did not
yet cover: BM25 is the classic lexical retrieval score (the workhorse
behind contamination probes, hard-negative mining, and corpus search),
and the repetition signals are the Rae et al. (Gopher, 2021) quality
heuristics — excessive n-gram repetition is the single strongest
low-quality-document marker in web corpora.

Oracle contract as everywhere in this repo: identical token definition
(queries_ext.SQL_TOKS <-> operators/text.tokens), every computed column
aliased identically in Spark and DuckDB, floats rounded in both engines,
deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query
from target_parquet_spark.queries_ext import SQL_TOKS, td

# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

# Fixed query terms (present across the synthetic vocabulary); literals on
# both engines so the probe is reproducible.
_BM25_TERMS = ("spark", "join", "window")
_K1 = 1.2
_B = 0.75


@query(
    "text_bm25_search",
    f"""
    WITH d AS (
      SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM documents),
    base AS (
      SELECT doc_id, toks, len(toks) AS dl FROM d WHERE len(toks) > 0),
    stats AS (
      SELECT count(*) AS n, avg(CAST(dl AS DOUBLE)) AS avgdl FROM base),
    tok AS (
      SELECT doc_id, dl, unnest(toks) AS token FROM base),
    qtf AS (
      SELECT doc_id, dl, token, count(*) AS tf FROM tok
      WHERE token IN ('spark', 'join', 'window')
      GROUP BY doc_id, dl, token),
    qdf AS (
      SELECT token, count(*) AS df FROM qtf GROUP BY token),
    sc AS (
      SELECT q.doc_id,
             sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                 * (q.tf * ({_K1} + 1.0))
                 / (q.tf + {_K1} * (1.0 - {_B} + {_B} * q.dl / s.avgdl)))
               AS score
      FROM qtf q JOIN qdf d ON q.token = d.token CROSS JOIN stats s
      GROUP BY q.doc_id)
    SELECT doc_id, round(score, 4) AS bm25
    FROM sc ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def text_bm25_search(spark, sf_dir):
    """Okapi BM25 top-20 documents for a fixed 3-term query (k1=1.2,
    b=0.75, the Robertson/Sparck-Jones idf with +1 smoothing so scores
    stay positive even for >50%-df terms).

    Plan shape for 100 TB: document length comes from ``size(tokens)``
    in the scan stage — the full token explode never materializes;
    only tokens MATCHING the query terms survive the explode filter, so
    the shuffled term-frequency table is |matching docs x 3| rows, not
    |corpus tokens|.  The df table is 3 rows and the corpus stats are
    one row — both broadcast.  The final top-k is TakeOrderedAndProject
    over |matching docs| score rows.  Nothing in the plan scales with
    total token count except the scan itself.
    """
    docs = td(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("toks")
    )
    base = docs.withColumn("dl", F.size("toks")).filter(F.col("dl") > 0)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    qtf = (
        base.select("doc_id", "dl", F.explode("toks").alias("token"))
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf")
        + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    sc = (
        qtf.join(F.broadcast(qdf), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    return (
        sc.select("doc_id", F.round("score", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality screen
# ---------------------------------------------------------------------------

# Per-source thresholds adapted from Rae et al. 2021 §A1.1 to the
# synthetic corpus: a doc fails when its most frequent bigram covers too
# much of the text or its vocabulary collapses.
_MIN_WORDS = 40
_MAX_TOP_BIGRAM = 0.10
_MIN_TTR = 0.20


@query(
    "text_repetition_gopher",
    f"""
    WITH d AS (
      SELECT doc_id, source, {SQL_TOKS.format(c='text')} AS toks
      FROM documents),
    base AS (
      SELECT doc_id, source, toks, len(toks) AS n_words,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
             CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE) / len(toks) AS mean_word_len
      FROM d WHERE len(toks) > 1),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1]))
               AS bigram
      FROM base),
    bgc AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg
      GROUP BY doc_id, bigram),
    topbg AS (
      SELECT doc_id, max(c) AS top_c FROM bgc GROUP BY doc_id),
    sig AS (
      SELECT b.doc_id, b.source, b.n_words, b.ttr, b.mean_word_len,
             CAST(t.top_c AS DOUBLE) / (b.n_words - 1)
               AS top_bigram_share
      FROM base b JOIN topbg t ON b.doc_id = t.doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(ttr), 4) AS avg_ttr,
           round(avg(top_bigram_share), 4) AS avg_top_bigram_share,
           round(avg(mean_word_len), 4) AS avg_word_len,
           CAST(sum(CASE WHEN n_words >= {_MIN_WORDS}
                          AND top_bigram_share <= {_MAX_TOP_BIGRAM}
                          AND ttr >= {_MIN_TTR}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           round(avg(CASE WHEN n_words >= {_MIN_WORDS}
                           AND top_bigram_share <= {_MAX_TOP_BIGRAM}
                           AND ttr >= {_MIN_TTR}
                          THEN 1.0 ELSE 0.0 END), 4) AS pass_rate
    FROM sig GROUP BY source
    """,
)
def text_repetition_gopher(spark, sf_dir):
    """Gopher-style (Rae et al. 2021) repetition screening aggregated per
    corpus source: type-token ratio, share of the text covered by its
    most frequent bigram, mean word length, and the pass rate of the
    combined quality gate (min length, max top-bigram share, min TTR).
    The repetition signals the plain quality filter lacks — a doc that
    repeats one phrase forever has fine length/stopword stats but a
    collapsed bigram distribution.

    Plan shape for 100 TB: TTR and mean word length are pure scan-stage
    higher-order-function folds (zero shuffle).  The only shuffle the
    corpus pays is (doc_id, bigram) counting for the per-doc mode; its
    key space is corpus bigram occurrences, it combines map-side, and
    the per-doc max collapses back to |docs| rows before the tiny
    per-source rollup.  No joins except doc-keyed count-to-doc, which
    shares the doc_id partitioning."""
    docs = td(spark, sf_dir, "documents").select(
        "doc_id", "source", X.tokens(F.col("text")).alias("toks")
    )
    base = (
        docs.withColumn("n_words", F.size("toks"))
        .filter(F.col("n_words") > 1)
        .withColumn(
            "ttr",
            F.size(F.array_distinct("toks")).cast("double")
            / F.col("n_words"),
        )
        .withColumn(
            "mean_word_len",
            F.aggregate(
                "toks", F.lit(0).cast("double"),
                lambda acc, x: acc + F.length(x),
            )
            / F.col("n_words"),
        )
    )
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(toks[i - 1], ' ', toks[i]))"
    )
    bgc = (
        base.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topbg = bgc.groupBy("doc_id").agg(F.max("c").alias("top_c"))
    sig = base.join(topbg, "doc_id").withColumn(
        "top_bigram_share",
        F.col("top_c").cast("double") / (F.col("n_words") - 1),
    )
    passed = (
        (F.col("n_words") >= _MIN_WORDS)
        & (F.col("top_bigram_share") <= _MAX_TOP_BIGRAM)
        & (F.col("ttr") >= _MIN_TTR)
    )
    return sig.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("ttr"), 4).alias("avg_ttr"),
        F.round(F.avg("top_bigram_share"), 4).alias(
            "avg_top_bigram_share"
        ),
        F.round(F.avg("mean_word_len"), 4).alias("avg_word_len"),
        F.sum(F.when(passed, 1).otherwise(0)).cast("long").alias("n_pass"),
        F.round(
            F.avg(F.when(passed, 1.0).otherwise(0.0)), 4
        ).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# semantic dup clusters — the adaptive scale path
# ---------------------------------------------------------------------------


@query("sim_semantic_clusters_scaled", None)
def sim_semantic_clusters_scaled(spark, sf_dir):
    """The 100 TB path of sim_semantic_clusters: identical output shape
    (vec_id, cluster_id, cluster_size over the doubled corpus), but pair
    generation runs through operators/similarity.semantic_dup_pairs —
    bucket count adapts to corpus size (n_planes ~ log2(n/occupancy)) so
    per-bucket pair work stays constant as data grows, and recall is held
    by OR-amplification over two independent plane families.  The
    oracle-pinned twin keeps its fixed 8-plane single-table definition
    (bit-exact vs DuckDB); this one is registered rows-only because the
    adaptive plane count is a function of corpus size, which a static SQL
    string cannot replay.  Exact duplicates are found by construction
    (identical vectors share every bucket in every table), so the planted
    copy pairs of the doubled corpus always close into their clusters —
    pinned by tests/test_r4.py."""
    from pyspark.sql import Window

    from target_parquet_spark.operators import dedup as D
    from target_parquet_spark.operators import similarity as S

    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    )
    pairs = S.semantic_dup_pairs(
        doubled, id_col="vec_id", vec_col="embedding", threshold=0.98,
        n_tables=2,
    )
    comp = D.connected_components(pairs, "id_a", "id_b")
    return (
        comp.select(
            F.col("node").alias("vec_id"),
            F.col("component").alias("cluster_id"),
        )
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
    )
