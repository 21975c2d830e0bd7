"""Layout-aware queries: co-located bucketed joins, bucket-pruned point
lookups, partition-pruned scans.

The reference has no layout control (flat per-stream files in CWD,
`target_parquet/writers.py:31-33`); these queries demonstrate the three
physical-layout levers a 100-TB deployment lives on, over materialized
copies of the driver test tables (`io/layout.py`).  Results are
layout-independent, so each oracle runs the same logical query on the
original flat parquet — the layout only changes the PLAN, which
`tests/test_layout.py` pins (zero-exchange join, SelectedBucketsCount,
PartitionFilters).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_parquet_spark.io.layout import ensure_bucketed, ensure_partitioned
from target_parquet_spark.queries import query


@query(
    "join_bucketed_colocated",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Fact-to-dim join with BOTH sides bucketed on the join key (8
    buckets, sorted, one file per bucket): the sort-merge join consumes the
    bucket layout directly — no Exchange and no Sort on either side; the
    only shuffle in the whole plan is the final 5-row segment aggregate.
    The `merge` hint stands in for a real deployment's broadcast-threshold
    config; the point is the big-big case where broadcast is impossible —
    at 100 TB both sides stream bucket-by-bucket with zero network cost."""
    o = ensure_bucketed(spark, sf_dir, "orders", ["o_custkey"])
    c = ensure_bucketed(spark, sf_dir, "customer", ["c_custkey"])
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "scan_bucket_pruned",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey = 371
    """,
)
def scan_bucket_pruned(spark, sf_dir):
    """Point lookup on the bucket key: Spark prunes to the ONE bucket that
    can contain the key (`SelectedBucketsCount: 1 out of 8` in the scan
    node) — 1/8th of the files opened before any row-level filtering.  At
    100 TB with 4096 buckets this is the difference between a key lookup
    touching 25 GB and touching all 100 TB."""
    o = ensure_bucketed(spark, sf_dir, "orders", ["o_custkey"])
    return o.filter(F.col("o_custkey") == 371).select("o_orderkey", "o_totalprice")


@query(
    "scan_partition_pruned",
    """
    SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE year(o_orderdate) = 1997
    GROUP BY 1
    """,
)
def scan_partition_pruned(spark, sf_dir):
    """Monthly revenue for one year over an orders table partitioned by
    `o_year`: the year predicate is a PartitionFilter — non-1997
    directories are never listed or opened (directory-level pruning, ahead
    of parquet row-group stats).  The layout mirrors how the streaming
    sink (`io/parquet_sink.py`) lands time-series data; the only shuffle
    is the 12-row month aggregate."""
    o = ensure_partitioned(
        spark, sf_dir, "orders", "o_year", F.year(F.col("o_orderdate"))
    )
    return (
        o.filter(F.col("o_year") == 1997)
        .groupBy(F.month("o_orderdate").alias("o_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "scan_zorder_pruned",
    """
    SELECT count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE l_orderkey BETWEEN 10000 AND 14999
      AND l_partkey BETWEEN 200 AND 499
    """,
)
def scan_zorder_pruned(spark, sf_dir):
    """Conjunctive 2-D range scan over a z-order-clustered lineitem copy
    (io/layout.ensure_zordered): both predicates push into the parquet
    scan and the Morton layout makes per-file min/max tight on BOTH
    columns, so row-group stats prune nearly every file — the layout
    single-column sorting cannot deliver.  tests/test_layout.py asserts
    the file-concentration win vs a shuffled copy; result is
    layout-independent (oracle runs on the flat table)."""
    from target_parquet_spark.io.layout import ensure_zordered

    z = ensure_zordered(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return z.filter(
        F.col("l_orderkey").between(10000, 14999)
        & F.col("l_partkey").between(200, 499)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "rollup_navigate_month",
    """
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           round(sum(value) / count(*), 4) AS avg_value
    FROM events
    GROUP BY CAST(date_trunc('month', ts) AS DATE), event_type
    """,
)
def rollup_navigate_month(spark, sf_dir):
    """Aggregation navigation: the month-grain answer computed ONLY from
    the day-grain rollup (io/layout.ensure_rollup) by merging sufficient
    statistics — counts add, sums add, avg = merged sum / merged count.
    The oracle aggregates the raw base table; matching proves the rollup
    loses nothing for algebraic aggregates.  At scale this is the
    pre-aggregated dashboard path (KB scanned, not TB)."""
    from target_parquet_spark.io.layout import ensure_rollup

    r = ensure_rollup(spark, sf_dir)
    return (
        r.groupBy(
            F.date_trunc("month", F.col("day")).cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
            F.round(
                F.sum("sum_value") / F.sum("n_events").cast("double"), 4
            ).alias("avg_value"),
        )
    )


@query(
    "scan_dpp_join",
    """
    SELECT year(o_orderdate) AS o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE year(o_orderdate) IN (
      SELECT DISTINCT year(l_shipdate) FROM lineitem WHERE l_discount > 0.09)
    GROUP BY o_year
    """,
)
def scan_dpp_join(spark, sf_dir):
    """DYNAMIC partition pruning — the runtime twin of
    scan_partition_pruned's static pruning: the years to keep are not a
    literal but the output of a dim-side filter (years with deep-discount
    shipping activity), so the pruning predicate only exists at runtime.
    Spark broadcasts the filtered dim, reuses that broadcast as an IN
    subquery on the fact's PARTITION column, and skips non-qualifying
    year directories before any fact I/O (`dynamicpruningexpression` on
    the scan, pinned in tests/test_layout.py).  At 100 TB this is the
    date-dim star-join pattern: the fact never scans years the dim
    filter excludes, with zero query rewrites.

    The oracle runs the same logical query on the flat table — layout
    changes the plan, never the result.

    Reference: hotgluexyz/target-parquet has no notion of partitioned
    layout at all (flat files in CWD, writers.py:31-33)."""
    from target_parquet_spark.queries import t

    o = ensure_partitioned(
        spark, sf_dir, "orders", "o_year", F.year(F.col("o_orderdate"))
    )
    yrs = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.09)
        .select(F.year("l_shipdate").alias("o_year"))
        .distinct()
    )
    return (
        o.join(yrs, "o_year")
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "rollup_day_over_day",
    """
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             count(*) AS n
      FROM events GROUP BY day, event_type)
    SELECT day, event_type,
           CAST(n AS BIGINT) AS n_events,
           round(CAST(n AS DOUBLE) / lag(n) OVER w - 1, 4) AS dod_change,
           round(avg(CAST(n AS DOUBLE)) OVER
                 (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def rollup_day_over_day(spark, sf_dir):
    """Period-over-period navigation on the continuous aggregate:
    day-over-day percent change and 7-day moving average per event type,
    computed ONLY from the day-grain rollup — the standard monitoring
    dashboard pair (trend + smoothing), served from KBs of pre-aggregate
    instead of the raw stream.

    Plan: the rollup read is days x types rows; both window functions
    share one partitioning on event_type (5 keys x ~30 days — trivially
    small, and always will be: the rollup's size is calendar-bounded no
    matter how many raw events feed it — that invariant is the whole
    point of the continuous aggregate)."""
    from pyspark.sql import Window

    from target_parquet_spark.io.layout import ensure_rollup

    r = ensure_rollup(spark, sf_dir)
    d = r.groupBy(
        F.col("day").cast("date").alias("day"), "event_type"
    ).agg(F.sum("n_events").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-6, Window.currentRow)
    return d.select(
        "day",
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("n").cast("double") / F.lag("n").over(w) - 1, 4).alias(
            "dod_change"
        ),
        F.round(F.avg(F.col("n").cast("double")).over(w7), 4).alias("ma7"),
    )
