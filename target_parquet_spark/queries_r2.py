"""Round-2 operator families: event analytics (retention cohorts,
concurrency sweep, OHLC bars, cumulative-distinct), sketch-based heavy
hitters (count-min), bloom-filter join pre-filtering, correlated
subqueries (pure-SQL parity), equi-depth histograms, group entropy,
TF-IDF, duplicate n-gram span detection, and leakage-free grouped
train/test splits.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — absent categories); they extend the training-data
pipeline surface the same way queries_ext.py does, with the same oracle
contract: every computed column aliased identically in Spark and DuckDB,
floats rounded in both engines, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query, t
from target_parquet_spark.queries_ext import SQL_CORPUS, SQL_TOKS, _spark_corpus, td
from target_parquet_spark.queries_ops import _SQL_HASH_MOD, _hash_mod


# ---------------------------------------------------------------------------
# event analytics
# ---------------------------------------------------------------------------


@query(
    "events_retention_cohorts",
    """
    WITH e AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
         c AS (SELECT user_id, w,
                      min(w) OVER (PARTITION BY user_id) AS cw
               FROM e)
    SELECT CAST(cw AS DATE)            AS cohort_week,
           datediff('day', cw, w) // 7 AS week_offset,
           count(DISTINCT user_id)     AS active_users,
           count(*)                    AS events
    FROM c GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen week, activity
    counted per week-offset since the cohort week.  The cohort week comes
    from a window min over user_id — ONE shuffle on user_id, no self-join
    (the naive first-seen-join shuffles the event table twice).  The final
    agg is matrix-sized (weeks x offsets), so the second shuffle is tiny.
    At 100 TB: partition by user_id is the natural event-table layout, so
    the window min is often exchange-free."""
    ev = t(spark, sf_dir, "events")
    e = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("w"))
    c = e.withColumn("cw", F.min("w").over(Window.partitionBy("user_id")))
    return (
        c.select(
            F.col("cw").cast("date").alias("cohort_week"),
            F.expr("datediff(w, cw) div 7").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.count(F.lit(1)).alias("events"),
        )
    )


@query(
    "events_concurrency_sweep",
    """
    WITH iv AS (SELECT ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events),
         dd AS (SELECT s, e,
                       unnest(generate_series(date_trunc('day', s),
                                              date_trunc('day', e - INTERVAL 1 MICROSECOND),
                                              INTERVAL 1 DAY)) AS day
                FROM iv),
         cl AS (SELECT day, greatest(s, day) AS t1,
                       least(e, day + INTERVAL 1 DAY) AS t2
                FROM dd),
         pts AS (SELECT day, t1 AS tp, 1 AS d FROM cl
                 UNION ALL
                 SELECT day, t2 AS tp, -1 AS d FROM cl),
         run AS (SELECT day,
                        sum(d) OVER (PARTITION BY day ORDER BY tp, d) AS c
                 FROM pts)
    SELECT CAST(day AS DATE) AS day, CAST(max(c) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY 1
    """,
)
def events_concurrency_sweep(spark, sf_dir):
    """Max concurrent intervals per day (each event opens a 5-minute
    half-open interval), by the classic sweep-line: +1 at start, -1 at
    end, running sum, max.  Intervals are CLIPPED to day boundaries so the
    sweep partitions by day — the running-sum window is per-day, never a
    single global sort.  Ends sort before starts at equal timestamps
    (d=-1 < +1), matching half-open [s, e) semantics.  At 100 TB: days
    are independent, so the sweep scales with the day count; only the
    midnight-crossing intervals duplicate (here <=2 rows each)."""
    ev = t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    dd = iv.select(
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("s")),
                F.date_trunc("day", F.col("e") - F.expr("INTERVAL 1 MICROSECOND")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    cl = dd.select(
        "day",
        F.greatest("s", "day").alias("t1"),
        F.least(F.col("e"), F.col("day") + F.expr("INTERVAL 1 DAY")).alias("t2"),
    )
    pts = cl.select("day", F.col("t1").alias("tp"), F.lit(1).alias("d")).unionAll(
        cl.select("day", F.col("t2").alias("tp"), F.lit(-1).alias("d"))
    )
    run = pts.withColumn(
        "c", F.sum("d").over(Window.partitionBy("day").orderBy("tp", "d"))
    )
    return run.groupBy(F.col("day").cast("date").alias("day")).agg(
        F.max("c").cast("long").alias("peak_concurrency")
    )


@query(
    "events_ohlc_bars",
    """
    WITH k AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0')
               || lpad(CAST(event_id AS VARCHAR), 8, '0') AS ord_key
      FROM events)
    SELECT event_type, day,
           arg_min(value, ord_key)  AS open,
           max(value)               AS high,
           min(value)               AS low,
           arg_max(value, ord_key)  AS close,
           count(*)                 AS volume,
           round(sum(value), 2)     AS turnover
    FROM k GROUP BY event_type, day
    """,
)
def events_ohlc_bars(spark, sf_dir):
    """Time-series resample to daily OHLC bars per event type — the
    standard downsampling shape for metric/tick stores.  open/close are
    arg-extrema over a zero-padded (epoch-micros, event_id) string key, so
    ties are impossible and the answer engine-exact.  Single
    map-side-combinable aggregate: no window, no sort, one shuffle on
    (type, day) — the partition key a 100 TB metrics table would already
    be laid out by."""
    ev = t(spark, sf_dir, "events")
    ord_key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 16, "0"),
        F.lpad(F.col("event_id").cast("string"), 8, "0"),
    )
    return (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "value",
            ord_key.alias("ord_key"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min_by("value", "ord_key").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord_key").alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.sum("value"), 2).alias("turnover"),
        )
    )


@query(
    "window_cumulative_distinct",
    """
    WITH f AS (SELECT user_id,
                      min(CAST(date_trunc('day', ts) AS DATE)) AS day
               FROM events GROUP BY user_id),
         nu AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM nu
    """,
)
def window_cumulative_distinct(spark, sf_dir):
    """Running distinct-user count by day WITHOUT a distinct-per-prefix
    blowup: each user contributes once at their first-seen day, then a
    cumulative sum over the per-day new-user counts equals the running
    distinct count.  Two small shuffles (user_id, then day); the window
    runs over |days| rows, not |events| — the trick that makes 'daily
    cumulative uniques' feasible at 100 TB."""
    ev = t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("day")
    )
    nu = f.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    return nu.select(
        "day",
        "new_users",
        F.sum("new_users").over(Window.orderBy("day")).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# sketches & join pre-filtering
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row

_SQL_CMS_B = (
    "(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || {c}), 1, 8))::BIGINT % "
    f"{_CMS_W})"
)


def _cms_bucket(j, col):
    """Row-j count-min bucket of a token: md5('j:token') % width — the
    same deterministic uniform hash family as the MinHash/LSH operators."""
    h = F.md5(F.concat(F.lit(f"{j}:"), col))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _CMS_W


@query(
    "agg_heavy_hitters_cms",
    f"""
    WITH tok AS (SELECT unnest({SQL_TOKS.format(c='text')}) AS token
                 FROM documents),
         js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         buck AS (SELECT token, j, {_SQL_CMS_B.format(j='j', c='token')} AS b
                  FROM tok CROSS JOIN js),
         sketch AS (SELECT j, b, count(*) AS c FROM buck GROUP BY j, b),
         true_c AS (SELECT token, count(*) AS true_n FROM tok GROUP BY token),
         top AS (SELECT token, true_n FROM true_c
                 ORDER BY true_n DESC, token LIMIT 20),
         tb AS (SELECT token, true_n, j,
                       {_SQL_CMS_B.format(j='j', c='token')} AS b
                FROM top CROSS JOIN js),
         est AS (SELECT t.token, t.true_n, min(s.c) AS cms_est
                 FROM tb t JOIN sketch s ON s.j = t.j AND s.b = t.b
                 GROUP BY t.token, t.true_n)
    SELECT token, true_n, cms_est, cms_est - true_n AS overcount FROM est
    """,
)
def agg_heavy_hitters_cms(spark, sf_dir):
    """Heavy hitters via a count-min sketch built in pure relational
    algebra: d=4 md5 hash rows x w=256 buckets, register counts as a
    (j, bucket)->count table, point estimate = min over the d rows.  The
    sketch build is ONE map-side-combinable aggregate over d x |tokens|
    rows into a fixed d*w-row state — the mergeable-summary shape that
    replaces a full vocabulary shuffle at 100 TB (estimates here are
    checked against exact counts: overcount >= 0 by construction).
    Deterministic md5 hashing makes the sketch bit-identical on any
    engine — unlike builtin sketch UDAFs, whose serialized state is
    implementation-defined."""
    docs = td(spark, sf_dir, "documents")
    tok = docs.select(F.explode(X.tokens(F.col("text"))).alias("token"))
    buckets = F.array(*[_cms_bucket(j, F.col("token")) for j in range(_CMS_D)])
    buck = tok.select("token", F.posexplode(buckets).alias("j", "b"))
    sketch = buck.groupBy("j", "b").agg(F.count(F.lit(1)).alias("c"))
    true_c = tok.groupBy("token").agg(F.count(F.lit(1)).alias("true_n"))
    top = true_c.orderBy(F.desc("true_n"), "token").limit(20)
    tb = top.select("token", "true_n", F.posexplode(buckets).alias("j", "b"))
    est = (
        tb.join(sketch, ["j", "b"])
        .groupBy("token", "true_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "token",
        "true_n",
        "cms_est",
        (F.col("cms_est") - F.col("true_n")).alias("overcount"),
    )


_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions

_SQL_BLOOM_POS = (
    "(('0x' || substr(md5(CAST({i} AS VARCHAR) || '#' || CAST({c} AS VARCHAR)), 1, 8))"
    f"::BIGINT % {_BLOOM_M})"
)


def _bloom_pos(i, col):
    h = F.md5(F.concat(F.lit(f"{i}#"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BLOOM_M


@query(
    "join_bloom_prefilter",
    f"""
    WITH build AS (SELECT DISTINCT s_suppkey AS k
                   FROM supplier JOIN nation ON s_nationkey = n_nationkey
                   WHERE n_name = 'GERMANY'),
         js AS (SELECT unnest([0, 1, 2]) AS i),
         bloom AS (SELECT DISTINCT {_SQL_BLOOM_POS.format(i='i', c='k')} AS pos
                   FROM build CROSS JOIN js),
         probe AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
         pp AS (SELECT k, {_SQL_BLOOM_POS.format(i='i', c='k')} AS pos
                FROM probe CROSS JOIN js),
         hits AS (SELECT pp.k,
                         CAST(sum(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
                              AS BIGINT) AS nhit
                  FROM pp LEFT JOIN bloom b ON pp.pos = b.pos
                  GROUP BY pp.k),
         flags AS (SELECT h.k, h.nhit = {_BLOOM_K} AS pass,
                          bu.k IS NOT NULL AS truth
                   FROM hits h LEFT JOIN build bu ON h.k = bu.k)
    SELECT count(*) AS n_probe_keys,
           CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN pass AND NOT truth THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos,
           CAST(sum(CASE WHEN truth AND NOT pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_neg
    FROM flags
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Bloom-filter join pre-filtering, spelled out in relational algebra
    (m=4096 bits, k=3 md5 hashes): the filtered dim side's keys set bits,
    the fact side's distinct keys pass only if all k of their bits are
    set.  Output is the filter's confusion report — false negatives are
    structurally zero (checked as a column), false positives are what the
    residual join discards.  This is the math behind
    spark.sql.optimizer.runtimeFilter.bloomFilter (enabled in
    session.py): at 100 TB the bloom side is a broadcast of m bits, and
    the probe prunes shuffle input before the join — here it is made
    observable and oracle-checked."""
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "GERMANY")
    sup = t(spark, sf_dir, "supplier")
    build = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(F.col("s_suppkey").alias("k"))
        .distinct()
    )
    positions = lambda df: df.select(  # noqa: E731
        "k", F.explode(F.array(*[_bloom_pos(i, F.col("k")) for i in range(_BLOOM_K)])).alias("pos")
    )
    bloom = positions(build).select("pos").distinct()
    probe = t(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k")).distinct()
    pp = positions(probe)
    hits = (
        pp.join(F.broadcast(bloom.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("long")).alias("nhit"))
    )
    flags = hits.join(
        F.broadcast(build.withColumn("truth0", F.lit(True))), "k", "left"
    ).select(
        (F.col("nhit") == _BLOOM_K).alias("pass"),
        F.coalesce(F.col("truth0"), F.lit(False)).alias("truth"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        F.sum(F.col("pass").cast("long")).alias("n_pass"),
        F.sum(F.col("truth").cast("long")).alias("n_true"),
        F.sum((F.col("pass") & ~F.col("truth")).cast("long")).alias("n_false_pos"),
        F.sum((F.col("truth") & ~F.col("pass")).cast("long")).alias("n_false_neg"),
    )


# ---------------------------------------------------------------------------
# SQL-surface parity: correlated subqueries
# ---------------------------------------------------------------------------

_SQL_CORRELATED = """
    WITH cents AS (SELECT o_custkey, o_orderkey,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS c
                   FROM orders)
    SELECT o.o_orderkey, o.c AS total_cents
    FROM cents o
    WHERE o.c * 2 * (SELECT count(*) FROM cents o2
                     WHERE o2.o_custkey = o.o_custkey)
          > 3 * (SELECT sum(o2.c) FROM cents o2
                 WHERE o2.o_custkey = o.o_custkey)
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
"""


@query("sql_correlated_subqueries", _SQL_CORRELATED)
def sql_correlated_subqueries(spark, sf_dir):
    """Correlated scalar subqueries + EXISTS, as IDENTICAL SQL text on
    spark.sql and DuckDB: orders priced >1.5x their customer's average
    that shipped a returned item.  Catalyst DECORRELATES both correlated
    aggregates into one grouped join and the EXISTS into a left-semi —
    no per-row re-execution (the naive reading is O(n^2)).  Exact integer
    cents arithmetic (price*count vs sum comparisons) so the boundary
    rows are engine-independent — a float avg threshold would make
    borderline rows flip on summation order."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_CORRELATED)


# ---------------------------------------------------------------------------
# distribution statistics
# ---------------------------------------------------------------------------


@query(
    "agg_equidepth_histogram",
    """
    WITH r AS (SELECT o_totalprice,
                      ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                        AS decile
               FROM orders)
    SELECT decile, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM r GROUP BY decile
    """,
)
def agg_equidepth_histogram(spark, sf_dir):
    """Equi-depth (equal-count) histogram of order prices via ntile(10)
    over a UNIQUE total order (price, orderkey) — ties broken so bucket
    membership is engine-exact.  This is the exact single-sort variant;
    at 100 TB the same bucket boundaries come from approx_percentile
    (mergeable KLL-style state, no global sort) and this query is the
    correctness oracle for that fast path."""
    o = t(spark, sf_dir, "orders")
    r = o.select(
        "o_totalprice",
        F.ntile(10).over(Window.orderBy("o_totalprice", "o_orderkey")).alias("decile"),
    )
    return r.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "agg_group_entropy",
    """
    WITH c AS (SELECT source, lang, count(*) AS n
               FROM documents GROUP BY source, lang),
         p AS (SELECT source, lang, n,
                      CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY source)
                        AS pr
               FROM c)
    SELECT source,
           CAST(sum(n) AS BIGINT)       AS n_docs,
           CAST(count(*) AS INTEGER)    AS n_langs,
           round(-sum(pr * ln(pr)), 4)  AS entropy,
           round(1 - sum(pr * pr), 4)   AS gini
    FROM p GROUP BY source
    """,
)
def agg_group_entropy(spark, sf_dir):
    """Label-distribution health per corpus source: Shannon entropy and
    Gini impurity of the language mix.  Counts first (one |group x label|
    shuffle), probabilities from a window sum over the tiny count table,
    entropy as a second tiny agg — the event-scale data is touched
    exactly once.  The standard 'is this source monolingual/collapsed'
    curation signal."""
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    pr = F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("source"))
    p = c.withColumn("pr", pr)
    return p.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("int").alias("n_langs"),
        F.round(-F.sum(F.col("pr") * F.log("pr")), 4).alias("entropy"),
        F.round(1 - F.sum(F.col("pr") * F.col("pr")), 4).alias("gini"),
    )


# ---------------------------------------------------------------------------
# text: TF-IDF, duplicate n-gram spans
# ---------------------------------------------------------------------------


@query(
    "text_tfidf_topterms",
    f"""
    WITH tok AS (SELECT doc_id, unnest({SQL_TOKS.format(c='text')}) AS token
                 FROM documents WHERE doc_id < 200),
         tf AS (SELECT doc_id, token, count(*) AS tf
                FROM tok GROUP BY doc_id, token),
         tfl AS (SELECT doc_id, token, tf,
                        CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT)
                          AS dlen
                 FROM tf),
         df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
                GROUP BY token),
         nd AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
         sc AS (SELECT t.doc_id, t.token,
                       round((CAST(t.tf AS DOUBLE) / t.dlen)
                             * (ln((nd.n + 1.0) / (d.df + 1.0)) + 1.0), 4)
                         AS tfidf
                FROM tfl t JOIN df d ON t.token = d.token CROSS JOIN nd),
         rk AS (SELECT doc_id, token, tfidf,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY tfidf DESC, token) AS rnk
                FROM sc)
    SELECT doc_id, rnk, token, tfidf FROM rk WHERE rnk <= 3
    """,
)
def text_tfidf_topterms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (smoothed idf = ln((N+1)/(df+1))+1,
    tf normalized by doc length).  All three aggregates are
    map-side-combinable; the df table is |vocab|-sized and BROADCAST back
    to the term rows, and the top-k is a per-doc window (never a global
    sort).  Ties rank by token text, and equal (tf, df) pairs produce
    bit-identical scores, so ordering is engine-exact.  The canonical
    'what is this document about' feature used by quality classifiers."""
    docs = td(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    tfl = tf.withColumn(
        "dlen", F.sum("tf").over(Window.partitionBy("doc_id")).cast("long")
    )
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    nd = tok.select(F.countDistinct("doc_id").alias("n"))
    sc = (
        tfl.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("tf").cast("double") / F.col("dlen"))
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "token", "tfidf")
    )


# 5-gram positional shingles: [] when the doc has <5 tokens.
_SQL_GRAMS5 = (
    "CASE WHEN len({t}) < 5 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(range(1, len({t}) - 3), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2] || ' ' || {t}[i+3]"
    " || ' ' || {t}[i+4]) END"
)


def _grams5(toks):
    n = F.size(toks)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k) for k in range(5)]
    )
    return F.when(n < 5, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), n - 4), gram)
    )


@query(
    "dedup_span_ngram",
    f"""
    WITH {SQL_CORPUS},
         g AS (SELECT doc_id,
                      ('0x' || substr(md5(unnest(
                        {_SQL_GRAMS5.format(t=SQL_TOKS.format(c='text'))}
                      )), 1, 15))::BIGINT AS gh
               FROM corpus),
         g2 AS (SELECT doc_id, gh, count(*) AS cnt
                FROM g GROUP BY doc_id, gh),
         g3 AS (SELECT doc_id, cnt,
                       count(*) OVER (PARTITION BY gh) AS nd
                FROM g2)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN nd >= 2 THEN cnt ELSE 0 END) AS BIGINT)
             AS n_dup,
           round(CAST(sum(CASE WHEN nd >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
                 / sum(cnt), 4) AS dup_ratio
    FROM g3 GROUP BY doc_id
    """,
)
def dedup_span_ngram(spark, sf_dir):
    """Duplicate-span detection at 5-gram granularity (the
    exact-substring-dedup signal of Lee et al., 'Deduplicating Training
    Data Makes Language Models Better'): every positional 5-gram that
    occurs in >=2 distinct documents marks its positions as duplicated;
    per-doc output is the duplicated-gram instance count and ratio.
    Runs on the doubled corpus (each doc + a perturbed near-copy), so
    high dup_ratio rows are guaranteed.  Scale shape: grams are hashed
    to 60-bit ints IN THE SCAN STAGE, so every shuffle moves fixed-width
    longs instead of ~50-char strings; one linear pipeline — (doc, gram)
    pre-agg, window count over gram (= distinct-doc count, since the
    pre-agg left one row per doc x gram), per-doc rollup — touches the
    exploded gram stream exactly once and joins nothing."""
    corpus = _spark_corpus(spark, sf_dir)
    gh = X.hash60(F.col("gram"))
    # tokenize into a bound column FIRST: inlining tokens() into _grams5
    # would duplicate the regex-split subtree into every element_at inside
    # the transform lambda (HOF lambdas don't share subexpressions), i.e.
    # 5 re-tokenizations per gram
    toked = corpus.select("doc_id", X.tokens(F.col("text")).alias("toks"))
    g = toked.select(
        "doc_id", F.explode(_grams5(F.col("toks"))).alias("gram")
    ).select("doc_id", gh.alias("gh"))
    g2 = g.groupBy("doc_id", "gh").agg(F.count(F.lit(1)).alias("cnt"))
    g3 = g2.withColumn("nd", F.count(F.lit(1)).over(Window.partitionBy("gh")))
    n_dup = F.sum(F.when(F.col("nd") >= 2, F.col("cnt")).otherwise(0))
    return g3.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        n_dup.cast("long").alias("n_dup"),
        F.round(n_dup.cast("double") / F.sum("cnt"), 4).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# sequence pattern matching (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------


@query(
    "events_pattern_match",
    """
    WITH s AS (SELECT user_id,
                      string_agg(substr(event_type, 1, 1), ''
                                 ORDER BY ts, event_id) AS seq
               FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(seq) AS INTEGER) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INTEGER)
             AS n_view_to_purchase,
           CAST(len(regexp_extract_all(seq, 'ep')) AS INTEGER)
             AS n_error_then_purchase
    FROM s
    WHERE len(regexp_extract_all(seq, 'v[^p]*p')) > 0
    """,
)
def events_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-lite sequence patterns: each user's event history
    becomes one ordered symbol string (first letter of the type — the 5
    types are first-letter-distinct), then patterns are regexes —
    'view then (eventually) purchase' as non-overlapping 'v[^p]*p'
    matches, 'error immediately before purchase' as 'ep'.  Ordering is
    (ts, event_id)-tie-proof via array_sort on structs.  One shuffle on
    user_id; the per-user string is bounded by per-user activity (at
    100 TB, sessionize first and pattern-match per session — same
    pipeline with the session key added)."""
    ev = t(spark, sf_dir, "events")
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: F.substring(s["event_type"], 1, 1),
        ),
    )
    s = ev.groupBy("user_id").agg(seq.alias("seq"))
    n_vp = F.regexp_count(F.col("seq"), F.lit(r"v[^p]*p")).cast("int")
    return (
        s.select(
            "user_id",
            F.length("seq").alias("seq_len"),
            n_vp.alias("n_view_to_purchase"),
            F.regexp_count(F.col("seq"), F.lit("ep")).cast("int").alias(
                "n_error_then_purchase"
            ),
        )
        .filter(F.col("n_view_to_purchase") > 0)
    )


# ---------------------------------------------------------------------------
# random-projection (Johnson-Lindenstrauss) similarity
# ---------------------------------------------------------------------------

_RP_K = 16  # projected dimensions
_RP_D = 64  # input dimensions


def _rp_sign(k: int, j: int) -> float:
    """Deterministic +/-1 from md5('k:j') — computable identically as a
    SQL expression (DuckDB side) and as a plan-time literal (Spark side)."""
    import hashlib

    return 1.0 if hashlib.md5(f"{k}:{j}".encode()).hexdigest()[0] < "8" else -1.0


_SQL_RP_SIGN = (
    "CASE WHEN substr(md5(CAST({k} AS VARCHAR) || ':' || CAST({j} AS VARCHAR)), 1, 1)"
    " < '8' THEN 1.0 ELSE -1.0 END"
)

_SQL_DOT16 = (
    "list_sum(list_transform(range(1, 17), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


@query(
    "sim_random_projection",
    f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
         proj AS (
           SELECT vec_id,
                  list_transform(range(0, {_RP_K}), k ->
                    list_sum(list_transform(range(1, {_RP_D} + 1), j ->
                      CAST(embedding[j] AS DOUBLE)
                      * {_SQL_RP_SIGN.format(k='k', j='j - 1')}))) AS p
           FROM sub),
         q AS (SELECT p AS qp FROM proj WHERE vec_id = 1),
         qe AS (SELECT embedding AS qv FROM sub WHERE vec_id = 1),
         sc AS (
           SELECT c.vec_id,
                  round({_SQL_DOT16.format(a='c.p', b='q.qp')}
                        / (sqrt({_SQL_DOT16.format(a='c.p', b='c.p')})
                           * sqrt({_SQL_DOT16.format(a='q.qp', b='q.qp')})), 4)
                    AS proj_cos,
                  round({{dot64}}
                        / (sqrt({{dot64aa}}) * sqrt({{dot64qq}})), 4) AS true_cos
           FROM proj c CROSS JOIN q CROSS JOIN qe
           JOIN sub e ON e.vec_id = c.vec_id
           WHERE c.vec_id <> 1),
         rk AS (SELECT vec_id, proj_cos, true_cos,
                       row_number() OVER (ORDER BY proj_cos DESC, vec_id) AS rnk
                FROM sc)
    SELECT rnk, vec_id, proj_cos, true_cos FROM rk WHERE rnk <= 10
    """.format(
        dot64=(
            "list_sum(list_transform(range(1, 65), "
            "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe.qv[i] AS DOUBLE)))"
        ),
        dot64aa=(
            "list_sum(list_transform(range(1, 65), "
            "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"
        ),
        dot64qq=(
            "list_sum(list_transform(range(1, 65), "
            "i -> CAST(qe.qv[i] AS DOUBLE) * CAST(qe.qv[i] AS DOUBLE)))"
        ),
    ),
)
def sim_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss sign random projection (64 -> 16 dims): the
    +/-1 matrix comes from md5('k:j'), so DuckDB derives it as an
    expression while Spark embeds the identical values as PLAN-TIME
    LITERALS — the projection itself is then pure codegen arithmetic
    with zero hashing on the data path.  Top-10 by projected cosine,
    with the true 64-d cosine alongside (the JL quality check).  At
    100 TB the projection is a scan-stage map that cuts every downstream
    shuffle/LSH byte count 4x; fold order matches the oracle term-by-term
    so scores are bit-reproducible."""
    from target_parquet_spark.operators.similarity import dot, norm

    emb = td(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    signs = [
        F.array(*[F.lit(_rp_sign(k, j)) for j in range(_RP_D)]) for k in range(_RP_K)
    ]
    p = emb.select(
        "vec_id",
        "embedding",
        F.array(*[dot(F.col("embedding"), s, _RP_D) for s in signs]).alias("p"),
    )
    q = F.broadcast(
        p.filter(F.col("vec_id") == 1).select(
            F.col("p").alias("qp"), F.col("embedding").alias("qv")
        )
    )
    sc = (
        p.filter(F.col("vec_id") != 1)
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(
                dot(F.col("p"), F.col("qp"), _RP_K)
                / (norm(F.col("p"), _RP_K) * norm(F.col("qp"), _RP_K)),
                4,
            ).alias("proj_cos"),
            F.round(
                dot(F.col("embedding"), F.col("qv"), _RP_D)
                / (norm(F.col("embedding"), _RP_D) * norm(F.col("qv"), _RP_D)),
                4,
            ).alias("true_cos"),
        )
    )
    w = Window.orderBy(F.desc("proj_cos"), "vec_id")
    return (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("rnk", "vec_id", "proj_cos", "true_cos")
    )


# ---------------------------------------------------------------------------
# window value functions, extended stats, null-safe join
# ---------------------------------------------------------------------------


@query(
    "window_value_functions",
    """
    WITH e AS (SELECT event_id, value, ts
               FROM events
               WHERE event_type = 'purchase' AND user_id < 100)
    SELECT event_id,
           first_value(value) OVER w3 AS fv3,
           last_value(value)  OVER w3 AS lv3,
           nth_value(value, 2) OVER w3 AS nth2,
           round(cume_dist() OVER wall, 4)    AS cd,
           round(percent_rank() OVER wall, 4) AS pr
    FROM e
    WINDOW w3  AS (ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           wall AS (ORDER BY value, event_id)
    """,
)
def window_value_functions(spark, sf_dir):
    """Window VALUE-function family: first/last/nth over an explicit
    trailing ROWS frame, plus the distribution functions cume_dist and
    percent_rank over the full ordering.  Both orderings carry a unique
    tie-break (event_id), so frame contents are engine-exact.  The frame
    is ROWS (physical), not RANGE — the variant that stays O(1) memory
    per row in Spark's window exec."""
    ev = t(spark, sf_dir, "events")
    e = ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 100))
    w3 = Window.orderBy("ts", "event_id").rowsBetween(-2, 0)
    wall = Window.orderBy("value", "event_id")
    return e.select(
        "event_id",
        F.first("value").over(w3).alias("fv3"),
        F.last("value").over(w3).alias("lv3"),
        F.nth_value("value", 2).over(w3).alias("nth2"),
        F.round(F.cume_dist().over(wall), 4).alias("cd"),
        F.round(F.percent_rank().over(wall), 4).alias("pr"),
    )


@query(
    "agg_extended_stats",
    """
    SELECT l_returnflag,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
           round(covar_pop(l_quantity, l_extendedprice), 4)  AS cov_p,
           round(stddev_pop(l_discount), 6)                  AS sd_pop,
           round(var_pop(l_quantity), 4)                     AS var_p,
           bool_and(l_quantity > 0)                          AS all_positive,
           bool_or(l_discount > 0.09)                        AS any_high_disc,
           bit_and(CAST(l_linenumber AS BIGINT))             AS lineno_and,
           bit_or(CAST(l_linenumber AS BIGINT))              AS lineno_or
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_extended_stats(spark, sf_dir):
    """Extended aggregate family: sample/population covariance,
    population stddev/variance, boolean every/any, bitwise AND/OR — all
    single-pass map-side-combinable (covariance from the co-moment
    sufficient statistics, booleans/bits trivially mergeable).  Rounded
    in both engines to absorb partial-aggregation fold-order drift."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_s"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("cov_p"),
        F.round(F.stddev_pop("l_discount"), 6).alias("sd_pop"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_p"),
        F.every((F.col("l_quantity") > 0)).alias("all_positive"),
        F.some((F.col("l_discount") > 0.09)).alias("any_high_disc"),
        F.bit_and(F.col("l_linenumber").cast("long")).alias("lineno_and"),
        F.bit_or(F.col("l_linenumber").cast("long")).alias("lineno_or"),
    )


@query(
    "join_null_safe",
    """
    WITH c AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
                           ELSE c_custkey % 25 END AS ck
               FROM customer),
         s AS (SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL
                           ELSE s_suppkey % 25 END AS sk
               FROM supplier)
    SELECT c.ck AS k, count(*) AS n_pairs
    FROM c JOIN s ON c.ck IS NOT DISTINCT FROM s.sk
    GROUP BY c.ck
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantics entity-resolution
    pipelines want when 'unknown' is a joinable bucket.  Spark plans
    eqNullSafe as a plain hash join (null hashes to a regular bucket),
    NOT a nested loop; the NULL bucket is the skew key to salt if
    'unknown' dominates at scale."""
    c = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_custkey") % 25)
        .alias("ck")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.when(F.col("s_suppkey") % 5 == 0, None)
        .otherwise(F.col("s_suppkey") % 25)
        .alias("sk")
    )
    return (
        c.join(s, c["ck"].eqNullSafe(s["sk"]))
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(F.col("ck").alias("k"), "n_pairs")
    )


# ---------------------------------------------------------------------------
# scalar-quantized (SQ8) approximate similarity
# ---------------------------------------------------------------------------

_SQL_SQ8 = """
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
         dims AS (SELECT d.i AS dim, min(CAST(sub.embedding[d.i] AS DOUBLE)) AS mn,
                         max(CAST(sub.embedding[d.i] AS DOUBLE)) AS mx
                  FROM sub CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
                  GROUP BY d.i),
         bounds AS (SELECT list(mn ORDER BY dim) AS mins,
                           list(mx ORDER BY dim) AS maxs
                    FROM dims),
         rec AS (SELECT s.vec_id, s.embedding,
                        list_transform(range(1, 65), i ->
                          b.mins[i]
                          + round((CAST(s.embedding[i] AS DOUBLE) - b.mins[i])
                                  / (b.maxs[i] - b.mins[i]) * 255)
                            * (b.maxs[i] - b.mins[i]) / 255) AS rv
                 FROM sub s CROSS JOIN bounds b),
         q AS (SELECT embedding AS qv FROM sub WHERE vec_id = 1),
         sc AS (SELECT r.vec_id,
                       round({dq_rv}
                             / (sqrt({drv_rv}) * sqrt({dq_q})), 4) AS sq8_cos,
                       round({dq_ev}
                             / (sqrt({dev_ev}) * sqrt({dq_q})), 4) AS true_cos
                FROM rec r CROSS JOIN q
                WHERE r.vec_id <> 1),
         rk AS (SELECT vec_id, sq8_cos, true_cos,
                       row_number() OVER (ORDER BY sq8_cos DESC, vec_id) AS rnk
                FROM sc)
    SELECT rnk, vec_id, sq8_cos, true_cos FROM rk WHERE rnk <= 10
""".format(
    dq_rv=(
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(q.qv[i] AS DOUBLE) * r.rv[i]))"
    ),
    drv_rv="list_sum(list_transform(range(1, 65), i -> r.rv[i] * r.rv[i]))",
    dq_q=(
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))"
    ),
    dq_ev=(
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(q.qv[i] AS DOUBLE) * CAST(r.embedding[i] AS DOUBLE)))"
    ),
    dev_ev=(
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(r.embedding[i] AS DOUBLE) * CAST(r.embedding[i] AS DOUBLE)))"
    ),
)


@query("sim_sq8_ann", _SQL_SQ8)
def sim_sq8_ann(spark, sf_dir):
    """Scalar-quantized similarity (FAISS-SQ8 style): per-dimension
    [min, max] bounds over the corpus map each float to an 8-bit code;
    search scores against the RECONSTRUCTED vectors, with the exact
    cosine alongside as the quality check.  The bounds are one 64-row
    aggregate broadcast to the scan — at 100 TB the corpus is stored as
    codes (4x smaller, cache-resident) and only the top-k candidates are
    re-scored in float.  Quantize/reconstruct arithmetic is identical
    expression-for-expression in both engines, so scores match bitwise."""
    from target_parquet_spark.operators.similarity import dot, norm

    emb = td(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    dims = emb.select(
        F.posexplode(F.col("embedding")).alias("dim0", "v")
    ).groupBy("dim0").agg(
        F.min(F.col("v").cast("double")).alias("mn"),
        F.max(F.col("v").cast("double")).alias("mx"),
    )
    bounds = F.broadcast(
        dims.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "mn"))),
                lambda s: s["mn"],
            ).alias("mins"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "mx"))),
                lambda s: s["mx"],
            ).alias("maxs"),
        )
    )
    rv = F.transform(
        F.sequence(F.lit(1), F.lit(_RP_D)),
        lambda i: F.element_at("mins", i)
        + F.round(
            (F.element_at(F.col("embedding"), i).cast("double") - F.element_at("mins", i))
            / (F.element_at("maxs", i) - F.element_at("mins", i))
            * 255
        )
        * (F.element_at("maxs", i) - F.element_at("mins", i))
        / 255,
    )
    rec = emb.crossJoin(bounds).select("vec_id", "embedding", rv.alias("rv"))
    q = F.broadcast(
        rec.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("qv"))
    )
    sc = (
        rec.filter(F.col("vec_id") != 1)
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(
                dot(F.col("qv"), F.col("rv"), _RP_D)
                / (norm(F.col("rv"), _RP_D) * norm(F.col("qv"), _RP_D)),
                4,
            ).alias("sq8_cos"),
            F.round(
                dot(F.col("qv"), F.col("embedding"), _RP_D)
                / (norm(F.col("embedding"), _RP_D) * norm(F.col("qv"), _RP_D)),
                4,
            ).alias("true_cos"),
        )
    )
    w = Window.orderBy(F.desc("sq8_cos"), "vec_id")
    return (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("rnk", "vec_id", "sq8_cos", "true_cos")
    )


# ---------------------------------------------------------------------------
# graph: triangle counting over the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "graph_triangle_count",
    """
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 10 = 0),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                  AND a.l_partkey < b.l_partkey),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                 FROM e e1 JOIN e e2 ON e1.v = e2.u
                           JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT count(*)                 AS n_triangles,
           count(DISTINCT a)        AS n_apex_nodes,
           (SELECT count(*) FROM e) AS n_edges
    FROM tri
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting over the part co-purchase graph (parts appearing
    in the same order are linked).  Edges are canonically ordered (u < v)
    so each triangle is counted exactly once via the standard two-join
    wedge-close: (a,b)+(b,c) wedges semi-closed by (a,c).  At 100 TB the
    join order matters: close wedges from the LOW-degree endpoint first
    (degree-ordered edge direction) to keep the wedge intermediate near
    |E|^1.5 instead of sum(deg^2) — here the canonical order plays that
    role on the skew-free synthetic graph."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = e1.join(e2, F.col("e1.v") == F.col("e2.u")).join(
        e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v"))
    )
    n_edges = e.count()  # tiny driver-side scalar (edge count is one agg)
    return tri.agg(
        F.count(F.lit(1)).alias("n_triangles"),
        F.countDistinct(F.col("e1.u")).alias("n_apex_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
    )


# ---------------------------------------------------------------------------
# CDC: MERGE/upsert semantics (insert + update + delete in one pass)
# ---------------------------------------------------------------------------


@query(
    "cdc_merge_upsert",
    """
    WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
         changes AS (
           SELECT c_custkey AS k, 'U' AS op,
                  round(c_acctbal + 100.0, 2) AS new_bal
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey AS k, 'D' AS op, NULL AS new_bal
           FROM customer WHERE c_custkey % 17 = 0 AND c_custkey % 10 <> 0
           UNION ALL
           SELECT c_custkey + 1000000 AS k, 'I' AS op, 50.0 AS new_bal
           FROM customer WHERE c_custkey % 23 = 0),
         merged AS (
           SELECT coalesce(c.k, b.k) AS k,
                  CASE WHEN c.op = 'U' THEN c.new_bal
                       WHEN c.op = 'I' THEN c.new_bal
                       ELSE b.bal END AS bal,
                  c.op
           FROM base b FULL OUTER JOIN changes c ON b.k = c.k
           WHERE c.op IS NULL OR c.op <> 'D')
    SELECT count(*) AS n_rows,
           round(sum(bal), 2) AS total_bal,
           CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated,
           CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserted,
           CAST(max(k) AS BIGINT) AS max_key
    FROM merged
    """,
)
def cdc_merge_upsert(spark, sf_dir):
    """MERGE/upsert semantics (the Delta-style MERGE INTO, as a pure
    relational transform): one full outer join of the keyed base snapshot
    against a change batch applies inserts, updates, and deletes in a
    single pass and yields the next snapshot — the reference can only
    append (SURVEY §2 W1), so CDC is a capability gap this closes.  The
    change batch is derived deterministically from the base (disjoint
    U/D key classes, I keys offset by 1e6).  At 100 TB both sides
    bucket/partition by key, making the merge a co-located join; the
    snapshot rewrite touches only matched partitions (partition-pruned
    dynamic overwrite)."""
    cust = t(spark, sf_dir, "customer")
    base = cust.select(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("bal"))
    upd = cust.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit("U").alias("op"),
        F.round(F.col("c_acctbal") + 100.0, 2).alias("new_bal"),
    )
    dele = cust.filter(
        (F.col("c_custkey") % 17 == 0) & (F.col("c_custkey") % 10 != 0)
    ).select(
        F.col("c_custkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_bal"),
    )
    ins = cust.filter(F.col("c_custkey") % 23 == 0).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.lit("I").alias("op"),
        F.lit(50.0).alias("new_bal"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    b, c = base.alias("b"), changes.alias("c")
    merged = (
        b.join(c, F.col("b.k") == F.col("c.k"), "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("c.k"), F.col("b.k")).alias("k"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.new_bal"))
            .otherwise(F.col("b.bal"))
            .alias("bal"),
            F.col("c.op").alias("op"),
        )
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("bal"), 2).alias("total_bal"),
        F.sum((F.col("op") == "U").cast("long")).alias("n_updated"),
        F.sum((F.col("op") == "I").cast("long")).alias("n_inserted"),
        F.max("k").cast("long").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# filtered aggregates & regexp scalar family
# ---------------------------------------------------------------------------


@query(
    "agg_filtered_aggregates",
    """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05)        AS n_high_disc,
           round(sum(l_quantity) FILTER (WHERE l_tax > 0.04), 2)
                                                            AS qty_taxed,
           round(avg(l_extendedprice)
                 FILTER (WHERE l_linestatus = 'F'), 4)      AS avg_price_f,
           count(*)                                         AS n_total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_filtered_aggregates(spark, sf_dir):
    """FILTER-clause aggregates (count_if / conditional sum / conditional
    avg): many differently-filtered measures in ONE aggregation pass over
    the fact table — the alternative (one scan per filter, union) reads
    the 100 TB input k times.  All map-side-combinable; null-safe because
    sum/avg ignore the NULLs the when() injects."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_high_disc"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_quantity"))), 2
        ).alias("qty_taxed"),
        F.round(
            F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice"))), 4
        ).alias("avg_price_f"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "scalar_regexp_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)$', 1)            AS last_word,
           regexp_replace(p_name, '[aeiou]', '', 'g')        AS devoweled,
           CAST(strpos(p_type, 'BRASS') AS INTEGER)          AS brass_at,
           split_part(p_type, ' ', 1)                        AS first_token,
           CASE WHEN regexp_matches(p_type, '^(STANDARD|SMALL)')
                THEN 1 ELSE 0 END                            AS is_std_small
    FROM part WHERE p_partkey % 37 = 0
    """,
)
def scalar_regexp_funcs(spark, sf_dir):
    """Regexp scalar family: anchored capture-group extraction, global
    replace, substring position, field split, boolean match — all
    JVM-side codegen expressions (never Python), all with RE2-safe
    patterns so DuckDB evaluates the identical regex semantics."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 37 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_type"), r"([A-Z]+)$", 1).alias("last_word"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("devoweled"),
        F.instr(F.col("p_type"), "BRASS").alias("brass_at"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_token"),
        F.when(F.col("p_type").rlike("^(STANDARD|SMALL)"), 1)
        .otherwise(0)
        .alias("is_std_small"),
    )


# ---------------------------------------------------------------------------
# pipeline: leakage-free grouped split
# ---------------------------------------------------------------------------


@query(
    "split_train_test_grouped",
    f"""
    WITH s AS (SELECT CASE
                        WHEN {_SQL_HASH_MOD.format(c='user_id', m=10)} < 8
                          THEN 'train'
                        WHEN {_SQL_HASH_MOD.format(c='user_id', m=10)} = 8
                          THEN 'valid'
                        ELSE 'test'
                      END AS split,
                      user_id
               FROM events),
         agg AS (SELECT split, count(*) AS n_events,
                        count(DISTINCT user_id) AS n_users
                 FROM s GROUP BY split)
    SELECT split, n_events, n_users,
           round(CAST(n_events AS DOUBLE)
                 / sum(n_events) OVER (), 4) AS pct_events
    FROM agg
    """,
)
def split_train_test_grouped(spark, sf_dir):
    """Leakage-free train/valid/test split: the unit of assignment is the
    USER (hash_mod(user_id, 10) -> 8/1/1), so no user's events straddle
    splits — the group-coherence property an eval split needs.  Content
    hashing (not rand()) means the split is reproducible across engines,
    retries, and cluster sizes.  Pure scan-stage expression + one tiny
    agg; the split column would be a partition column at write time."""
    ev = t(spark, sf_dir, "events")
    h = _hash_mod(F.col("user_id"), 10)
    s = ev.select(
        F.when(h < 8, "train").when(h == 8, "valid").otherwise("test").alias("split"),
        "user_id",
    )
    agg = s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return agg.select(
        "split",
        "n_events",
        "n_users",
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(Window.partitionBy()),
            4,
        ).alias("pct_events"),
    )
