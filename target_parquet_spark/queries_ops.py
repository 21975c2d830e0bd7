"""Operator families absent from both the reference and the earlier query
modules: lateral explode (UNNEST), array aggregation (collect_set /
array_agg), full outer join, deterministic hash sampling (whole-table and
stratified), time-series gap fill via sequence+explode, and the array
scalar-function family.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md section 2.10 — absent categories); they are pure Spark
built-ins exercised over the driver test data.

Sampling uses content hashes, not rand(): `md5(key) -> int -> % N` is
reproducible across engines, retries, and cluster sizes — the property a
training-data pipeline actually needs (a re-run must pick the same
sample).  Conventions as queries.py: identical aliases both engines,
count(*) results are BIGINT in both, arrays are sorted before comparison.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query, t
from target_parquet_spark.queries_ext import SQL_TOKS, td


def _hash_mod(col, mod: int):
    """Deterministic uniform bucket in [0, mod): first 8 md5 hex chars of
    the key's string form as an unsigned int.  Pure per-row expression —
    pushes into the scan stage, no shuffle, identical on any engine."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % mod
    )


_SQL_HASH_MOD = "(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 8))::BIGINT % {m})"


@query(
    "lateral_explode_tokens",
    f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKS.format(c='text')}) AS token FROM documents)
    SELECT token, count(*) AS n
    FROM tok GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """,
)
def lateral_explode_tokens(spark, sf_dir):
    """Lateral/UNNEST shape: explode every document into tokens, global
    top-20 by frequency.  explode runs inside the scan stage (no shuffle
    until the count agg); the final top-k is a TakeOrdered, not a full
    sort.  At 100 TB the token agg is the shuffle — partial map-side
    counts make it |vocab|-sized, not |corpus|-sized."""
    d = td(spark, sf_dir, "documents")
    return (
        d.select(F.explode(X.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "agg_collect_sets",
    """
    SELECT c.c_mktsegment,
           list_sort(list_distinct(array_agg(n.n_name))) AS nations,
           count(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 7500
    GROUP BY c.c_mktsegment
    """,
)
def agg_collect_sets(spark, sf_dir):
    """Array aggregation: per market segment, the sorted set of nations
    with a high-balance customer.  collect_set is order-insensitive by
    construction; sort_array makes the output deterministic so the array
    column itself is value-checked, not just its size.  nation broadcast;
    one shuffle on the segment key."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7500)
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sort_array(F.collect_set("n_name")).alias("nations"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@query(
    "join_full_outer",
    """
    WITH a AS (SELECT o_custkey, count(*) AS n97 FROM orders
               WHERE year(o_orderdate) = 1997 GROUP BY o_custkey),
    b AS (SELECT o_custkey, count(*) AS n98 FROM orders
          WHERE year(o_orderdate) = 1998 GROUP BY o_custkey)
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           coalesce(a.n97, 0) AS n97,
           coalesce(b.n98, 0) AS n98
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full outer join: customers active in 1997 vs 1998 — either side can
    be missing, so the key must coalesce across sides.  Both inputs are
    aggregates of the same scan; the outer join shuffles both on custkey
    (full outer cannot broadcast).  At scale both aggs and the join share
    the custkey partitioning, so AQE reuses one exchange per side."""
    o = t(spark, sf_dir, "orders")
    a = (
        o.filter(F.year("o_orderdate") == 1997)
        .groupBy(F.col("o_custkey").alias("k97"))
        .agg(F.count(F.lit(1)).alias("n97"))
    )
    b = (
        o.filter(F.year("o_orderdate") == 1998)
        .groupBy(F.col("o_custkey").alias("k98"))
        .agg(F.count(F.lit(1)).alias("n98"))
    )
    return a.join(b, a.k97 == b.k98, "full_outer").select(
        F.coalesce("k97", "k98").alias("custkey"),
        F.coalesce("n97", F.lit(0)).alias("n97"),
        F.coalesce("n98", F.lit(0)).alias("n98"),
    )


@query(
    "sample_hash_pct",
    f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE {_SQL_HASH_MOD.format(c='o_orderkey', m=20)} = 0
    """,
)
def sample_hash_pct(spark, sf_dir):
    """Deterministic ~5% table sample: md5(o_orderkey) % 20 = 0.  Unlike
    TABLESAMPLE/rand(), the same rows are picked on every engine, retry,
    and cluster size — the reproducibility a training-data subsample
    needs.  Pure per-row predicate: evaluates in the scan stage, zero
    shuffle, trivially parallel at any scale."""
    o = t(spark, sf_dir, "orders")
    return o.filter(_hash_mod(F.col("o_orderkey"), 20) == 0).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "sample_stratified",
    f"""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT source, doc_id FROM r WHERE rn <= 40
    """,
)
def sample_stratified(spark, sf_dir):
    """Stratified fixed-n sample: 40 docs per source, chosen by md5 order
    (a deterministic uniform shuffle within each stratum).  One shuffle on
    the stratum key; the window's rank-then-filter truncates per group.
    At 100 TB strata are processed independently — skew in stratum sizes
    only affects the window sort, which AQE skew-splits."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 40)
        .select("source", "doc_id")
    )


@query(
    "events_gap_fill",
    """
    WITH c AS (
      SELECT date_trunc('hour', ts) AS hour, count(*) AS n
      FROM events GROUP BY 1),
    spine AS (
      SELECT unnest(generate_series((SELECT min(hour) FROM c),
                                    (SELECT max(hour) FROM c),
                                    INTERVAL 1 HOUR)) AS hour)
    SELECT s.hour, coalesce(c.n, 0) AS n
    FROM spine s LEFT JOIN c ON s.hour = c.hour
    """,
)
def events_gap_fill(spark, sf_dir):
    """Time-series gap fill: hourly event counts with empty hours
    zero-filled.  The spine is sequence(min,max,1h) exploded from a 1-row
    aggregate — generated, not scanned; counts left-join onto it
    (broadcast: the hourly agg is tiny next to raw events).  The only
    big-data shuffle is the hour agg, which map-side combines to
    |hours| rows."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = (
        counts.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
    )
    return spine.join(F.broadcast(counts), "hour", "left_outer").select(
        "hour", F.coalesce("n", F.lit(0)).alias("n")
    )


@query(
    "scalar_array_funcs",
    f"""
    WITH d AS (
      SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM documents
      WHERE doc_id < 100)
    SELECT doc_id,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first3,
           list_contains(toks, 'the') AS has_the
    FROM d
    """,
)
def scalar_array_funcs(spark, sf_dir):
    """Array scalar-function family over the token array: array_distinct,
    sort_array, slice, array_join, array_contains — all codegen'd
    per-row expressions in the scan stage; zero shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = X.tokens(F.col("text"))
    dist = F.array_distinct(toks)
    return d.select(
        "doc_id",
        F.size(dist).alias("n_distinct"),
        F.array_join(F.slice(F.sort_array(dist), 1, 3), "|").alias("first3"),
        F.array_contains(toks, "the").alias("has_the"),
    )


@query(
    "fuzzy_match_names",
    """
    WITH v AS (SELECT DISTINCT p_name FROM part),
    cand AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b
      FROM v a JOIN v b
        ON a.p_name < b.p_name
       AND abs(length(a.p_name) - length(b.p_name)) <= 3)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) BETWEEN 1 AND 3
    """,
)
def fuzzy_match_names(spark, sf_dir):
    """Fuzzy entity matching, the scale way: collapse the corpus to its
    DISTINCT name vocabulary first (sublinear in corpus size), then
    all-pairs edit distance on the small side with a SOUND length-band
    pre-filter (|len_a - len_b| <= k is implied by dist <= k — no
    candidate loss, unlike ad-hoc prefix blocking).  Matches broadcast
    back to the full table afterwards; the 100 TB side is never paired."""
    v = t(spark, sf_dir, "part").select("p_name").distinct()
    a = v.select(F.col("p_name").alias("name_a"))
    b = v.select(F.col("p_name").alias("name_b"))
    cand = a.join(
        b,
        (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= 3
        ),
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.withColumn("dist", dist).filter(
        (F.col("dist") >= 1) & (F.col("dist") <= 3)
    )


@query(
    "agg_unpivot_measures",
    """
    WITH m AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(sum(l_discount), 2) AS sum_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, measure, value
    FROM m UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
    """,
)
def agg_unpivot_measures(spark, sf_dir):
    """UNPIVOT/melt (wide measures -> long rows): the relational dual of
    pivot, a pure projection+generate — no shuffle beyond the feeding
    aggregate."""
    li = t(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return m.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "value",
    )


@query(
    "sample_weighted_quality",
    f"""
    WITH q AS (
      SELECT doc_id,
             round((CASE WHEN len({SQL_TOKS.format(c='text')})
                              BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END
                  + CASE WHEN len(list_filter({SQL_TOKS.format(c='text')},
                              x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                              > 0.01 * len({SQL_TOKS.format(c='text')})
                          AND len(list_filter({SQL_TOKS.format(c='text')},
                              x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                              < 0.8 * len({SQL_TOKS.format(c='text')})
                         THEN 1.0 ELSE 0.0 END
                  + CASE WHEN length(text) = 0 THEN 1.0
                         WHEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                              < 0.2 * length(text) THEN 1.0 ELSE 0.0 END) / 3.0,
                   4) AS quality,
             ({_SQL_HASH_MOD.format(c='doc_id', m=10000)}) / 10000.0 AS u
      FROM documents)
    SELECT doc_id, quality FROM q WHERE u < quality * 0.5
    """,
)
def sample_weighted_quality(spark, sf_dir):
    """Propensity sampling: keep each doc with probability proportional
    to its quality score (here 0.5 * quality), decided by a DETERMINISTIC
    per-doc uniform draw (md5(doc_id) -> [0,1)) instead of rand() — the
    same docs survive on every engine, retry, and cluster size, and the
    expected quality distribution of the kept set is shifted upward the
    way curriculum-style training-data selection wants.  Pure per-row
    predicate: scan-stage evaluation, zero shuffle."""
    d = td(spark, sf_dir, "documents")
    q = X.quality_score(F.col("text"))
    u = _hash_mod(F.col("doc_id"), 10000).cast("double") / 10000.0
    return (
        d.select("doc_id", q.alias("quality"), u.alias("u"))
        .filter(F.col("u") < F.col("quality") * 0.5)
        .select("doc_id", "quality")
    )


@query(
    "join_cross_grid",
    """
    SELECT r.r_name, t.l_returnflag, count(*) AS n
    FROM region r CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) t
    CROSS JOIN nation n
    WHERE n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, t.l_returnflag
    """,
)
def join_cross_grid(spark, sf_dir):
    """Explicit cross join (the dimension-grid use: every region x every
    return flag) — broadcast nested loop on a deliberately tiny side;
    the only sane cartesian at scale is small x small."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    flags = t(spark, sf_dir, "lineitem").select("l_returnflag").distinct()
    grid = r.crossJoin(flags)
    return (
        grid.join(n, n["n_regionkey"] == grid["r_regionkey"])
        .groupBy("r_name", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_funnel_sessions",
    """
    WITH o AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS tu,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  > 1800000000 OR lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, event_type, tu,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY tu, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o),
    v AS (SELECT user_id, session_id,
                 min(CASE WHEN event_type = 'view' THEN tu END) AS t_view
          FROM s GROUP BY user_id, session_id),
    c AS (SELECT s.user_id, s.session_id,
                 min(CASE WHEN s.event_type = 'click'
                          AND s.tu >= v.t_view THEN s.tu END) AS t_click,
                 any_value(v.t_view) AS t_view
          FROM s JOIN v ON s.user_id = v.user_id AND s.session_id = v.session_id
          GROUP BY s.user_id, s.session_id),
    p AS (SELECT s.user_id, s.session_id,
                 min(CASE WHEN s.event_type = 'purchase'
                          AND s.tu >= c.t_click THEN s.tu END) AS t_purchase,
                 any_value(c.t_view) AS t_view,
                 any_value(c.t_click) AS t_click
          FROM s JOIN c ON s.user_id = c.user_id AND s.session_id = c.session_id
          GROUP BY s.user_id, s.session_id)
    SELECT count(*) AS n_sessions,
           count(t_view) AS reached_view,
           count(t_click) AS reached_click,
           count(t_purchase) AS reached_purchase
    FROM p
    """,
)
def events_funnel_sessions(spark, sf_dir):
    """Session funnel (view -> click -> purchase, in order, within a
    30-min-gap session): sessionize with a window cumsum, then one
    aggregate per stage with the previous stage's timestamp as the
    ordering constraint.  Three shuffles, all on the same
    (user, session) key — on a cluster the exchange is reused.  Counts
    are exact integers, so the oracle is bit-stable by construction."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("tu")
    )
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    gap = F.col("tu") - F.lag("tu").over(w)
    s = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800000000), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("tu", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    key = ["user_id", "session_id"]
    v = s.groupBy(*key).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("tu"))).alias("t_view")
    )
    c = (
        s.join(v, key)
        .groupBy(*key)
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("tu") >= F.col("t_view")),
                    F.col("tu"),
                )
            ).alias("t_click"),
            F.first("t_view").alias("t_view"),
        )
    )
    p = (
        s.join(c, key)
        .groupBy(*key)
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("tu") >= F.col("t_click")),
                    F.col("tu"),
                )
            ).alias("t_purchase"),
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
        )
    )
    return p.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_purchase").alias("reached_purchase"),
    )


@query(
    "agg_hll_sketch",
    """
    WITH h AS (
      SELECT (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT AS h
      FROM orders),
    r AS (
      SELECT h >> 54 AS reg,
             CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
                  ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1)))
             END AS rho
      FROM h),
    m AS (SELECT reg, max(rho) AS mx FROM r GROUP BY reg),
    s AS (SELECT sum(power(2.0::DOUBLE, -mx)) AS sp,
                 count(*) AS nr FROM m)
    SELECT round(0.709::DOUBLE * 4096.0::DOUBLE
                 / (sp + CAST(64 - nr AS DOUBLE)), 2) AS est_distinct,
           (SELECT count(DISTINCT o_custkey) FROM orders) AS n_exact
    FROM s
    """,
)
def agg_hll_sketch(spark, sf_dir):
    """HyperLogLog built from scratch as pure relational algebra — and
    therefore bit-reproducible on any engine, unlike the built-in
    approx_count_distinct whose sketch is implementation-defined.
    Per row: 60-bit md5 hash -> top 6 bits pick 1 of 64 registers, rho =
    leading zeros of the remaining 54 bits + 1 (computed EXACTLY via
    length(bin(w)) — no float log2).  Register maxima are a 64-group
    aggregate with map-side partial max (mergeable across partitions /
    days / tables — the sketch IS the groupBy state); the estimator sums
    exact powers of two, so even the double arithmetic is
    order-independent and the oracle hash-matches.  Estimate lands
    within ~13% (1.04/sqrt(64)) of the exact count, shown side by side."""
    o = t(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = h.bitwiseAND(F.lit((1 << 54) - 1))
    rho = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    regs = (
        o.select(F.shiftright(h, 54).alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("mx"))
    )
    s = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("sp"),
        F.count(F.lit(1)).alias("nr"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return s.crossJoin(exact).select(
        F.round(
            F.lit(0.709) * F.lit(4096.0)
            / (F.col("sp") + (F.lit(64) - F.col("nr")).cast("double")),
            2,
        ).alias("est_distinct"),
        "n_exact",
    )


@query(
    "agg_cube_grouping_marker",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_grouping_marker(spark, sf_dir):
    """CUBE with GROUPING() markers: distinguishes a real NULL group key
    from a rolled-up level — the piece that makes cube output machine-
    consumable."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "audit_referential_integrity",
    """
    SELECT 'lineitem->orders' AS relation,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT count(*) FROM lineitem) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey)),
           (SELECT count(*) FROM lineitem)
    """,
)
def audit_referential_integrity(spark, sf_dir):
    """Foreign-key orphan audit across the star schema: one left-anti
    join per relation (each a broadcast against the dim's key column or
    a shuffle join at scale), counts unioned into a single report.  The
    data-quality gate a pipeline runs before training-data export."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    p = t(spark, sf_dir, "part")

    def _audit(name, child, key, parent, pkey):
        orphans = child.join(
            parent.select(pkey), child[key] == parent[pkey], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_rows"))
        return orphans.crossJoin(total).select(
            F.lit(name).alias("relation"), "n_orphans", "n_rows"
        )

    return (
        _audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(_audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(_audit("lineitem->part", li, "l_partkey", p, "p_partkey"))
    )


@query(
    "agg_histogram_bins",
    """
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY bin
    """,
)
def agg_histogram_bins(spark, sf_dir):
    """Fixed-width histogram of order totals: the bin id is a scan-stage
    expression, so the whole profile is one map-side-combined aggregate
    over |bins| keys — the data-profiling shape that costs one pass at
    any scale."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "agg_correlation",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(stddev_samp(l_discount), 4) AS sd_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_correlation(spark, sf_dir):
    """Bivariate statistics per group: corr/covar/stddev are all
    single-pass algebraic aggregates (sum, sum-of-squares, cross-sum
    moments merge associatively), so they partial-aggregate map-side
    like any sum."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_discount"), 4).alias("sd_discount"),
    )


@query(
    "audit_value_outliers",
    """
    WITH thr AS (
      SELECT event_type,
             quantile_cont(value, 0.995) AS p995
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) AS n_outliers,
           round(min(e.value), 2) AS min_outlier
    FROM events e JOIN thr ON e.event_type = thr.event_type
    WHERE e.value > thr.p995
    GROUP BY e.event_type
    """,
)
def audit_value_outliers(spark, sf_dir):
    """Outlier audit: per-type p99.5 threshold (exact interpolated
    percentile, a tiny per-type aggregate) broadcast-joined back against
    the stream — counts everything above it.  The anomaly gate before
    metrics ingestion; the big side is scanned once, never sorted."""
    e = t(spark, sf_dir, "events")
    thr = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.995)").alias("p995")
    )
    return (
        e.join(F.broadcast(thr), "event_type")
        .filter(F.col("value") > F.col("p995"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.min("value"), 2).alias("min_outlier"),
        )
    )


@query(
    "scalar_null_semantics",
    """
    WITH j AS (
      SELECT c.c_custkey,
             o.o_custkey,
             o.o_totalprice
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                                        AND o.o_totalprice > 300000)
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unmatched,
           CAST(sum(CASE WHEN c_custkey IS NOT DISTINCT FROM o_custkey
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
           round(sum(coalesce(o_totalprice, 0.0)), 2) AS total_coalesced,
           count(o_totalprice) AS n_nonnull_prices
    FROM j
    """,
)
def scalar_null_semantics(spark, sf_dir):
    """Null semantics in one frame: outer-join-produced NULLs counted
    via IS NULL, null-safe equality (<=> / IS NOT DISTINCT FROM — never
    equal to a real key here, so it counts exactly the matches), COALESCE
    defaulting, and count(col)'s null-skipping vs count(*)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "left").select(
        "c_custkey", "o_custkey", "o_totalprice"
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "n_unmatched"
        ),
        F.sum(
            F.when(F.col("c_custkey").eqNullSafe(F.col("o_custkey")), 1).otherwise(0)
        ).alias("n_nullsafe_eq"),
        F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias(
            "total_coalesced"
        ),
        F.count("o_totalprice").alias("n_nonnull_prices"),
    )


@query(
    "agg_arg_extremum",
    """
    WITH k AS (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey
               AS ord_key
      FROM orders)
    SELECT o_custkey,
           max_by(o_orderkey, ord_key) AS best_order,
           min_by(o_orderkey, ord_key) AS worst_order,
           count(*) AS n
    FROM k GROUP BY o_custkey
    """,
)
def agg_arg_extremum(spark, sf_dir):
    """arg-extremum aggregates (max_by/min_by): the id of each
    customer's highest/lowest-priced order.  Raw prices tie, which would
    make the answer engine-dependent — the composite key (exact cents
    * 1e7 + orderkey) is unique by construction, so the extremum is
    deterministic everywhere.  Single map-side-combinable aggregate, no
    window, no sort."""
    o = t(spark, sf_dir, "orders")
    key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * 10000000
        + F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", key.alias("ord_key"))
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "ord_key").alias("best_order"),
            F.min_by("o_orderkey", "ord_key").alias("worst_order"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "scalar_try_arithmetic",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN (CASE WHEN l_discount = 0 THEN NULL
                              ELSE round(l_extendedprice / l_discount, 2)
                         END) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_div,
           round(sum(coalesce(CASE WHEN l_discount = 0 THEN NULL
                                   ELSE round(l_extendedprice / l_discount, 2)
                              END, 0.0)), 2) AS total_ratio
    FROM lineitem GROUP BY l_returnflag
    """,
)
def scalar_try_arithmetic(spark, sf_dir):
    """ANSI-safe arithmetic: try_divide yields NULL on division by zero
    instead of erroring or producing Inf — counted and coalesced per
    group.  (Oracle spells it NULLIF-style since DuckDB's `/` on zero
    raises under strict math.)"""
    li = t(spark, sf_dir, "lineitem")
    ratio = F.round(F.try_divide("l_extendedprice", F.nullif(F.col("l_discount"), F.lit(0))), 2)
    return li.groupBy("l_returnflag").agg(
        F.sum(ratio.isNull().cast("long")).alias("n_null_div"),
        F.round(F.sum(F.coalesce(ratio, F.lit(0.0))), 2).alias("total_ratio"),
    )


_SQL_GBA = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY ALL
"""


@query("sql_group_by_all", _SQL_GBA)
def sql_group_by_all(spark, sf_dir):
    """Pure-SQL entry point: the IDENTICAL SQL text (GROUP BY ALL sugar
    included) runs on spark.sql and on DuckDB — demonstrating that the
    engine's SQL surface, not just the DataFrame API, matches the
    oracle's dialect for the shared core."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_GBA)


@query(
    "scalar_map_funcs",
    """
    WITH q AS (
      SELECT l_linestatus, l_returnflag, round(sum(l_quantity), 2) AS qty
      FROM lineitem GROUP BY l_linestatus, l_returnflag)
    SELECT l_linestatus,
           CAST(count(*) AS INTEGER) AS n_keys,
           round(sum(CASE WHEN l_returnflag = 'R' THEN qty END), 2) AS qty_r,
           string_agg(l_returnflag, ',' ORDER BY l_returnflag) AS keys
    FROM q GROUP BY l_linestatus
    """,
)
def scalar_map_funcs(spark, sf_dir):
    """Map-type function family: per linestatus, build a real
    MapType(flag -> qty) via map_from_entries(collect_list(struct)),
    then interrogate it with size / element_at / map_keys.  Output is
    map-DERIVED scalars (maps themselves don't canonicalize across
    engines), and the oracle computes the same values relationally —
    proving the map path loses nothing."""
    li = t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_linestatus", "l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct("l_returnflag", "qty"))
    )
    return (
        q.groupBy("l_linestatus")
        .agg(m.alias("m"))
        .select(
            "l_linestatus",
            F.size("m").alias("n_keys"),
            F.element_at("m", "R").alias("qty_r"),
            F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys"),
        )
    )


@query(
    "lateral_explode_outer",
    f"""
    WITH d AS (
      SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks
      FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT -1 AS doc_id, CAST([] AS VARCHAR[]) AS toks),
    x AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS token
      FROM d)
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_rows,
           count(DISTINCT doc_id) AS n_docs
    FROM x
    """,
)
def lateral_explode_outer(spark, sf_dir):
    """explode_outer semantics: a doc with an EMPTY token array keeps
    one (doc, NULL) row instead of vanishing — the difference between
    'every input row accounted for' and silent row loss in fan-out
    pipelines.  One planted empty doc proves the null path; the oracle
    emulates outer-unnest with a CASE-wrapped [NULL]."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", X.tokens(F.col("text")).alias("toks")
    )
    empty = d.sparkSession.createDataFrame(
        [(-1, [])], "doc_id long, toks array<string>"
    )
    x = d.unionByName(empty).select(
        "doc_id", F.explode_outer("toks").alias("token")
    )
    return x.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("token").isNull().cast("long")).alias("n_null_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
