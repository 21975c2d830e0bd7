"""Round-3 late additions: maximal duplicated-substring runs and a
linear quality-classifier scorer over the documents corpus.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — absent categories); both are standard training-data
pipeline stages the existing families approximate but do not cover:

* ``dedup_substring_runs`` completes the Lee et al. ("Deduplicating
  Training Data Makes Language Models Better", 2022) exact-substring
  story: ``dedup_span_ngram`` reports HOW MUCH of a doc is duplicated,
  this query reports the maximal CONTIGUOUS duplicated spans — the unit
  the paper actually removes (spans of >= ~50 tokens shared verbatim
  across documents).  Contiguity comes from a gaps-and-islands window
  (pos - row_number), the classical SQL formulation.
* ``text_quality_logreg`` is the CCNet/RefinedWeb-style learned quality
  gate: a linear model over engineered features with literal weights
  (the fasttext classifier seam — at scale the weights come from a
  trained model; the scoring plan is identical), where
  ``text_quality_filter`` is the simpler rule-based gate.

Oracle contract as everywhere in this repo: identical token definition
(queries_ext.SQL_TOKS <-> operators/text.tokens), identical 5-gram and
md5-based gram hashing as dedup_span_ngram, every computed column
aliased identically in Spark and DuckDB, floats rounded in both
engines, shift-invariant outputs where the engines' position bases
differ.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query
from target_parquet_spark.queries_ext import SQL_CORPUS, SQL_TOKS, _spark_corpus, td
from target_parquet_spark.queries_r2 import _SQL_GRAMS5, _grams5

# ---------------------------------------------------------------------------
# maximal duplicated-substring runs (gaps-and-islands)
# ---------------------------------------------------------------------------

# A run must cover at least this many tokens to count as an extractable
# duplicated span (Lee et al. use 50 BPE tokens; the synthetic docs are
# short, so the threshold scales down with them).
_MIN_SPAN_TOKENS = 20


@query(
    "dedup_substring_runs",
    f"""
    WITH {SQL_CORPUS},
    base AS (
      SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM corpus),
    g AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) < 5 THEN CAST([] AS BIGINT[])
                         ELSE range(1, len(toks) - 3) END) AS pos,
             ('0x' || substr(md5(unnest(
               {_SQL_GRAMS5.format(t='toks')}
             )), 1, 15))::BIGINT AS gh
      FROM base),
    gd AS (
      SELECT gh FROM (
        SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh)
      WHERE nd >= 2),
    dup AS (
      SELECT g.doc_id, g.pos FROM g JOIN gd USING (gh)),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM dup),
    runs AS (
      SELECT doc_id, grp, count(*) + 4 AS span_tokens
      FROM isl GROUP BY doc_id, grp)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(span_tokens) AS BIGINT) AS longest_span,
           CAST(sum(CASE WHEN span_tokens >= {_MIN_SPAN_TOKENS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_long_spans
    FROM runs GROUP BY doc_id
    """,
)
def dedup_substring_runs(spark, sf_dir):
    """Maximal cross-document duplicated substrings: every positional
    5-gram occurring in >= 2 distinct documents marks its position
    duplicated; consecutive duplicated positions merge into runs via
    gaps-and-islands (pos - row_number over the doc's sorted duplicated
    positions), and a run of c grams covers c+4 tokens.  Runs on the
    doubled corpus (each doc + a perturbed near-copy) so long runs are
    guaranteed.  Output per doc: run count, longest run in tokens, and
    the count of extraction-worthy runs (>= 20 tokens).

    Plan shape for 100 TB: grams are hashed to 60-bit ints in the scan
    stage, so every shuffle moves fixed-width longs.  The duplicated-
    gram set comes from a (doc_id, gh)-distinct pre-aggregation (partial
    map-side combine) followed by a count per gh — never an all-pairs
    product — and rejoining it to the positional stream is a plain
    equi-join on the hash.  The islands window partitions by doc_id, so
    state per window is bounded by one document's duplicated positions.
    Positions are 0-based here and 1-based in the oracle; every output
    is shift-invariant (run lengths and counts), so the bases never
    meet the comparator.
    """
    corpus = _spark_corpus(spark, sf_dir)
    # tokenize into a bound column FIRST (see dedup_span_ngram: HOF
    # lambdas don't share subexpressions across elements)
    toked = corpus.select("doc_id", X.tokens(F.col("text")).alias("toks"))
    gh = X.hash60(F.col("gram"))
    g = toked.select(
        "doc_id", F.posexplode(_grams5(F.col("toks"))).alias("pos", "gram")
    ).select("doc_id", "pos", gh.alias("gh"))
    # 'Duplicated in >= 2 docs' == min(doc_id) < max(doc_id) over the
    # gh partition (the dedup_substring_remove shape, r11): the old
    # distinct -> groupBy -> join-back derived the gram stream twice and
    # moved it through three gram-scale exchanges; the window needs ONE
    # gh exchange of ONE derivation with constant aggregation state.
    wg = Window.partitionBy("gh")
    dup = (
        g.withColumn("_mn", F.min("doc_id").over(wg))
        .withColumn("_mx", F.max("doc_id").over(wg))
        .filter(F.col("_mn") < F.col("_mx"))
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    runs = (
        isl.groupBy("doc_id", "grp")
        .agg((F.count(F.lit(1)) + 4).alias("span_tokens"))
    )
    return runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max("span_tokens").cast("long").alias("longest_span"),
        F.sum(
            F.when(F.col("span_tokens") >= _MIN_SPAN_TOKENS, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_long_spans"),
    )


# ---------------------------------------------------------------------------
# linear quality classifier (literal-weight logistic model)
# ---------------------------------------------------------------------------

# Literal model weights: intercept + [log1p_words, ttr, mean_word_len,
# stopword_ratio, symbol_ratio].  At scale these come from a trained
# fasttext/logreg model shipped to executors as literals (same seam as
# the IVF/PQ codebooks); the scoring plan below is what runs either way.
_W0 = -3.0
_W_LOGWORDS = 0.45
_W_TTR = 2.0
_W_MWL = 0.15
_W_STOP = 1.5
_W_SYM = -4.0

_SW_LIST = ", ".join(f"'{w}'" for w in X.STOPWORDS)


@query(
    "text_quality_logreg",
    f"""
    WITH d AS (
      SELECT source, text, {SQL_TOKS.format(c='text')} AS toks
      FROM documents),
    f AS (
      SELECT source,
             ln(1.0 + len(toks)) AS f_logwords,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS f_ttr,
             CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE) / len(toks) AS f_mwl,
             CAST(len(list_filter(toks, x -> list_contains([{_SW_LIST}], x)))
                  AS DOUBLE) / len(toks) AS f_stop,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '',
                                                  'g')) AS DOUBLE)
                       / length(text) END AS f_sym
      FROM d WHERE len(toks) > 0),
    s AS (
      SELECT source,
             1.0 / (1.0 + exp(-({_W0} + {_W_LOGWORDS} * f_logwords
                               + {_W_TTR} * f_ttr + {_W_MWL} * f_mwl
                               + {_W_STOP} * f_stop + {_W_SYM} * f_sym)))
               AS score
      FROM f)
    SELECT source,
           CAST(least(floor(score * 10), 9) AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(score), 4) AS avg_score
    FROM s GROUP BY source, decile
    """,
)
def text_quality_logreg(spark, sf_dir):
    """Learned quality gate: a logistic model with literal weights over
    five engineered features (log word count, type-token ratio, mean
    word length, stopword ratio, symbol ratio), reported as a per-source
    score-decile histogram.

    Plan shape for 100 TB: every feature and the sigmoid are pure
    Column expressions — zero joins, zero explodes, one groupBy on
    (source, decile) whose partial aggregation collapses the stream to
    |sources| x 10 rows map-side.  The whole query is a single
    scan-stage pipeline inside whole-stage codegen.
    """
    d = td(spark, sf_dir, "documents").select(
        "source", "text", X.tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks").cast("double")
    f = d.filter(F.size("toks") > 0).select(
        "source",
        F.log(1.0 + F.size("toks")).alias("f_logwords"),
        (F.size(F.array_distinct("toks")).cast("double") / n).alias("f_ttr"),
        (
            F.aggregate(
                F.transform(F.col("toks"), lambda x: F.length(x)),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / n
        ).alias("f_mwl"),
        # reuse the canonical feature definitions from operators/text so
        # the learned gate cannot drift from the rule-based quality_score
        # it twins (zero-length guards are vacuous under the size>0 filter)
        X.stopword_ratio(F.col("text")).alias("f_stop"),
        X.punct_ratio(F.col("text")).alias("f_sym"),
    )
    z = (
        F.lit(_W0)
        + _W_LOGWORDS * F.col("f_logwords")
        + _W_TTR * F.col("f_ttr")
        + _W_MWL * F.col("f_mwl")
        + _W_STOP * F.col("f_stop")
        + _W_SYM * F.col("f_sym")
    )
    s = f.select("source", (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"))
    return s.groupBy(
        "source",
        F.least(F.floor(F.col("score") * 10), F.lit(9))
        .cast("int")
        .alias("decile"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("score"), 4).alias("avg_score"),
    )
