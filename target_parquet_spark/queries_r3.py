"""Round-2 (session 2) operator families: SCD2 history build, Markov
transition matrices, sliding-window document chunking, unigram LM
log-prob scoring, quota-based corpus mixture sampling, join-key skew
audits, exact median/mode aggregates, and rolling window quantiles.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — absent categories); this module extends the
training-data-pipeline surface with the same oracle contract as
queries_ext.py / queries_r2.py: every computed column aliased
identically in Spark and DuckDB, floats rounded in both engines,
deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.queries import query, t
from target_parquet_spark.queries_ext import SQL_TOKS, td
from target_parquet_spark.operators import text as X


# ---------------------------------------------------------------------------
# CDC / dimension maintenance
# ---------------------------------------------------------------------------


@query(
    "cdc_scd2_history",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_t
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    ch AS (
      SELECT user_id, event_type, ts, event_id FROM o
      WHERE prev_t IS NULL OR event_type <> prev_t)
    SELECT user_id,
           event_type,
           ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           CAST(row_number() OVER w2 AS BIGINT) AS version,
           CAST(CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END
                AS INTEGER) AS is_current
    FROM ch
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def cdc_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: the event stream collapsed
    to state-change rows, each carrying a validity interval
    [valid_from, valid_to) and a per-entity version number; the open
    interval is flagged current.  Complements cdc_merge_upsert (SCD1):
    that keeps latest-wins, this keeps full history.

    Plan: ONE shuffle on user_id serves both windows (change detection
    and interval stitching share the partitioning, Catalyst reuses the
    sort).  No self-join — the naive change-rows-join-next-change plan
    shuffles the fact table twice.  At 100 TB the event table is already
    partitioned by entity key, so the exchange is often elided; the
    output is change-rows only (~a fraction of input), which is what
    makes SCD2 storage-viable at scale."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        e.withColumn("prev_t", F.lag("event_type").over(w))
        .filter(F.col("prev_t").isNull() | (F.col("event_type") != F.col("prev_t")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.when(F.lead("ts").over(w2).isNull(), 1).otherwise(0)
        .cast("int")
        .alias("is_current"),
    )


# ---------------------------------------------------------------------------
# sequence analytics
# ---------------------------------------------------------------------------


@query(
    "events_markov_transitions",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT prev AS from_state,
           event_type AS to_state,
           count(*) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY prev), 4) AS p
    FROM o WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    """,
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: count and row-normalized probability for every
    (from_state -> to_state) pair.  The behavioral fingerprint behind
    next-event prediction and anomaly scoring.

    Plan: lag needs one shuffle on user_id; the transition count is a
    25-key agg (map-side partials collapse it before the exchange), and
    the row normalization is a window over the 25-row result — free.
    The heavy stage is the first, and it reuses the event table's
    natural entity partitioning at scale."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    counts = o.groupBy(
        F.col("prev").alias("from_state"), F.col("event_type").alias("to_state")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 4).alias("p"),
    )


# ---------------------------------------------------------------------------
# document chunking (context-window prep)
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 16, 12


@query(
    "text_chunk_sliding",
    f"""
    WITH d AS (
      SELECT doc_id, {SQL_TOKS.format(c="text")} AS toks FROM documents),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(1, len(toks), {_STRIDE})) AS start
      FROM d WHERE len(toks) >= 1)
    SELECT doc_id,
           CAST((start - 1) // {_STRIDE} + 1 AS BIGINT) AS chunk_idx,
           CAST(least({_CHUNK}, n - start + 1) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(toks, start,
                                          start + {_CHUNK} - 1), ' ')) AS chunk_hash
    FROM s
    """,
)
def text_chunk_sliding(spark, sf_dir):
    """Sliding-window document chunking — the context-window prep step of
    a training pipeline: each doc split into overlapping {_CHUNK}-token
    chunks at stride {_STRIDE} (tail chunks shorter, every token covered),
    each chunk identified by content hash for downstream chunk-level
    dedup.

    Plan: tokenize + sequence + explode + slice are all scan-stage
    Column expressions (one WholeStageCodegen span, zero shuffles, zero
    Python).  Output rows ~ tokens/stride per doc — the explode happens
    AFTER the narrow projection so only (doc_id, toks) widens, never the
    raw text.  At 100 TB this is embarrassingly parallel; partition
    count follows the input splits."""
    d = td(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("toks")
    )
    s = (
        d.withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
        .withColumn(
            "start", F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(_STRIDE)))
        )
    )
    return s.select(
        "doc_id",
        (((F.col("start") - 1) / _STRIDE).cast("long") + 1).alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("start") + 1)
        .cast("long")
        .alias("n_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("start"), _CHUNK))
        ).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# unigram LM quality scoring
# ---------------------------------------------------------------------------


@query(
    "text_unigram_logprob",
    f"""
    WITH d AS (
      SELECT doc_id, lang, {SQL_TOKS.format(c="text")} AS toks FROM documents),
    tok AS (SELECT doc_id, lang, unnest(toks) AS tk FROM d),
    vocab AS (SELECT tk, count(*) AS c FROM tok GROUP BY tk
              HAVING count(*) >= 3),
    stats AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM vocab),
    scored AS (
      SELECT t.doc_id, t.lang,
             round(avg(log10((coalesce(vb.c, 0) + 1.0)
                             / (s.n + s.v + 1.0))), 6) AS lp
      FROM tok t LEFT JOIN vocab vb ON t.tk = vb.tk CROSS JOIN stats s
      GROUP BY t.doc_id, t.lang)
    SELECT lang,
           count(*) AS n_docs,
           round(avg(lp), 4) AS avg_logprob,
           round(min(lp), 4) AS min_logprob
    FROM scored GROUP BY lang
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram LM perplexity proxy: add-one-smoothed token
    log-probability (vocab = tokens seen >= 3 times; rarer tokens score
    as OOV), averaged per doc then summarized per language.  The classic
    cheap quality signal — gibberish and boilerplate both surface as
    outliers in avg log-prob.

    Plan: ONE explode feeds both the vocab build and the scoring join
    (reused exchange on tk).  The vocab (<= corpus distinct tokens after
    the count filter) broadcasts back onto the token stream; the scalar
    (N, V) stats ride a broadcast nested-loop of one row.  Per-doc and
    per-lang aggs are map-side-combinable.  At 100 TB: vocab after a
    min-count filter is MBs (Zipf), so the scoring join stays
    broadcast — the corpus never reshuffles; doc scores pre-round to 6dp
    so partial-agg order can't move the 4dp summary."""
    toks = td(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(X.tokens(F.col("text"))).alias("tk")
    )
    vocab = toks.groupBy("tk").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 3)
    stats = vocab.agg(
        F.sum("c").cast("long").alias("n"), F.count(F.lit(1)).alias("v")
    )
    scored = (
        toks.join(F.broadcast(vocab), "tk", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.avg(
                    F.log10(
                        (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                        / (F.col("n") + F.col("v") + 1.0)
                    )
                ),
                6,
            ).alias("lp")
        )
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
        F.round(F.min("lp"), 4).alias("min_logprob"),
    )


# ---------------------------------------------------------------------------
# corpus mixture sampling
# ---------------------------------------------------------------------------

_MIX = [("en", 80), ("de", 30), ("es", 30), ("fr", 30), ("zh", 30)]


@query(
    "sample_mixture_quota",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents),
    quota AS (SELECT * FROM (VALUES {", ".join(f"('{l}', {n})" for l, n in _MIX)})
              q(lang, n)),
    sel AS (
      SELECT r.doc_id, r.lang FROM ranked r
      JOIN quota q ON r.lang = q.lang WHERE r.rn <= q.n)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_selected,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS sel_sig
    FROM sel GROUP BY lang
    """,
)
def sample_mixture_quota(spark, sf_dir):
    """Training-mixture construction: fixed per-language document quotas
    (the data-mixture knob of LLM pretraining), filled deterministically
    by md5 rank so the mixture is reproducible across engines, retries,
    and cluster sizes — no rand().  Output is audit-shaped: per-language
    selected count plus an exact selection signature (md5 of the sorted
    kept-id list), the same contract pipeline_curation_full uses.

    Plan: one shuffle on lang for the rank window, quota table is a
    plan-time literal (explode of a literal struct array — no
    createDataFrame, no driver round-trip), joined broadcast.  Scale
    note: a 5-key rank window is skew-prone at 100 TB (each language
    sorts on one reducer); when quotas are proportions rather than exact
    counts, prefer the shuffle-free hash-threshold filter
    (sample_hash_pct) — exact quotas are what force the per-group
    rank."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
    quota = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(l).alias("lang"), F.lit(n).alias("n"))
                        for l, n in _MIX
                    ]
                )
            ).alias("q")
        )
        .select("q.lang", "q.n")
    )
    sel = ranked.join(F.broadcast(quota), "lang").filter(F.col("rn") <= F.col("n"))
    return sel.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            )
        ).alias("sel_sig"),
    )


# ---------------------------------------------------------------------------
# data-quality / operability audits
# ---------------------------------------------------------------------------


@query(
    "audit_key_skew",
    """
    WITH k AS (
      SELECT 'orders.o_custkey' AS key_col, CAST(o_custkey AS VARCHAR) AS k
      FROM orders
      UNION ALL
      SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
      UNION ALL
      SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events),
    c AS (SELECT key_col, k, count(*) AS n FROM k GROUP BY key_col, k),
    cx AS (SELECT key_col, k, n,
                  max(n) OVER (PARTITION BY key_col) AS mx FROM c)
    SELECT key_col,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_n,
           round(avg(n), 4) AS avg_n,
           round(max(n) / avg(n), 4) AS skew_factor,
           min(CASE WHEN n = mx THEN k END) AS top_key
    FROM cx GROUP BY key_col
    """,
)
def audit_key_skew(spark, sf_dir):
    """Join-key skew report — the planning audit run BEFORE a 100 TB
    join: per candidate key, cardinality, max and mean per-key row
    count, the skew factor (max/avg — >> 1 means one reducer owns the
    key), and the heaviest key itself (deterministic min tie-break).
    The numbers that decide between plain SMJ, AQE skew split, salting
    (join_salted_skew), or broadcast.

    Plan: one count agg per table (map-side combinable), unioned — the
    union is of post-agg key-count tables, not raw rows, so the audit
    touches each fact table exactly once; the window max and final
    summary run over per-key counts (cardinality-sized, not row-sized).
    """
    def keyed(name, col, label):
        return t(spark, sf_dir, name).select(
            F.lit(label).alias("key_col"), F.col(col).cast("string").alias("k")
        )

    k = (
        keyed("orders", "o_custkey", "orders.o_custkey")
        .unionByName(keyed("lineitem", "l_partkey", "lineitem.l_partkey"))
        .unionByName(keyed("events", "user_id", "events.user_id"))
    )
    c = k.groupBy("key_col", "k").agg(F.count(F.lit(1)).alias("n"))
    cx = c.withColumn("mx", F.max("n").over(Window.partitionBy("key_col")))
    return cx.groupBy("key_col").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
        F.round(F.avg("n"), 4).alias("avg_n"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
        F.min(F.when(F.col("n") == F.col("mx"), F.col("k"))).alias("top_key"),
    )


# ---------------------------------------------------------------------------
# exact median / mode aggregates
# ---------------------------------------------------------------------------


@query(
    "agg_median_mode",
    """
    WITH c AS (
      SELECT l_returnflag AS flag, l_quantity AS q, count(*) AS n
      FROM lineitem GROUP BY flag, q),
    cx AS (SELECT flag, q, n, max(n) OVER (PARTITION BY flag) AS mx FROM c),
    modes AS (
      SELECT flag, min(CASE WHEN n = mx THEN q END) AS mode_qty
      FROM cx GROUP BY flag),
    med AS (
      SELECT l_returnflag AS flag,
             round(median(l_quantity), 4) AS median_qty,
             round(avg(l_quantity), 4) AS avg_qty
      FROM lineitem GROUP BY flag)
    SELECT med.flag AS l_returnflag, med.median_qty, med.avg_qty,
           modes.mode_qty
    FROM med JOIN modes ON med.flag = modes.flag
    """,
)
def agg_median_mode(spark, sf_dir):
    """Exact per-group median (linear-interpolated, DuckDB median
    semantics == Spark percentile 0.5) and mode (most frequent value,
    smallest-value tie-break so the answer is deterministic in both
    engines).

    Plan: the mode arm reduces rows to (group, value) counts FIRST (one
    map-combinable shuffle to ~groups x distinct-values), then a window
    max + min-filter over that tiny table; the median arm is Spark's
    exact percentile aggregate, whose state is a per-group value-count
    map — fine while distinct values per group are bounded (prices,
    quantities, enum-ish measures), switch to approx_percentile when
    they aren't.  Final 3-row join is broadcast."""
    li = t(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("q")
    ).agg(F.count(F.lit(1)).alias("n"))
    cx = c.withColumn("mx", F.max("n").over(Window.partitionBy("flag")))
    modes = cx.groupBy("flag").agg(
        F.min(F.when(F.col("n") == F.col("mx"), F.col("q"))).alias("mode_qty")
    )
    med = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )
    return med.join(F.broadcast(modes), "flag").select(
        F.col("flag").alias("l_returnflag"), "median_qty", "avg_qty", "mode_qty"
    )


# ---------------------------------------------------------------------------
# rolling window quantiles
# ---------------------------------------------------------------------------


@query(
    "window_rolling_quantile",
    """
    SELECT user_id, event_id,
           round(quantile_cont(value, 0.9) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS p90_last10,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med_last10
    FROM events
    """,
)
def window_rolling_quantile(spark, sf_dir):
    """Rolling robust statistics: per event, the 90th percentile and
    median of the user's trailing 10 observations — the outlier-resistant
    twin of a moving average, the shape used for adaptive thresholds and
    drift monitors.  Spark's exact percentile runs as a frame-bound
    window aggregate; linear interpolation matches DuckDB quantile_cont.

    Plan: one shuffle on user_id; both quantiles share the frame scan
    within one Window node.  Exact per-frame state is the 10-value
    buffer — constant memory; for wide frames at 100 TB swap in
    approx_percentile over the same frame."""
    e = t(spark, sf_dir, "events")
    frame = "PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW"
    return e.select(
        "user_id",
        "event_id",
        F.round(F.expr(f"percentile(value, 0.9) OVER ({frame})"), 4).alias(
            "p90_last10"
        ),
        F.round(F.expr(f"percentile(value, 0.5) OVER ({frame})"), 4).alias(
            "med_last10"
        ),
    )
