"""Physical data layout for scale: bucketed and partitioned tables.

The reference (hotgluexyz/target-parquet) writes one flat parquet file per
stream in CWD (`target_parquet/writers.py:31-33`) — no layout control at
all.  At 100 TB, layout IS the optimization: a fact table bucketed on its
join key turns every subsequent join on that key into a zero-shuffle
co-located merge, and a table partitioned on a filter column turns scans
into partition-pruned reads that never open irrelevant files.

Two materializers, both idempotent per (table, sf_dir, layout):

- :func:`ensure_bucketed` — a catalog-registered parquet table written
  with ``bucketBy(n, keys).sortBy(keys)``.  The input is first
  ``repartition(n, keys)``-ed so each write task holds exactly one
  bucket's rows → ONE file per bucket → Spark treats the bucket as sorted
  and can elide both the Exchange and the Sort under a sort-merge join.
- :func:`ensure_partitioned` — a path-based parquet table written with
  ``partitionBy(col)``; readers filtering on the partition column get
  `PartitionFilters` (directory-level pruning: unmatched partitions are
  never listed, opened, or scanned).

Bucket layout is engine-internal (Murmur3 pmod), so results of queries
over these tables are layout-independent — the DuckDB oracles run the
same logical query on the original flat files.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from target_parquet_spark.queries import t

__all__ = [
    "ensure_bucketed",
    "ensure_partitioned",
    "ensure_zordered",
    "ensure_rollup",
    "zorder_value",
    "warehouse_dir",
    "content_fingerprint",
]


def warehouse_dir() -> str:
    """Root for materialized layout copies (env-overridable; defaults to a
    stable tmp path so repeated sessions reuse the same files)."""
    return os.environ.get("SPARK_GRAFT_WAREHOUSE") or os.path.join(
        tempfile.gettempdir(), "spark_graft_warehouse"
    )


def _tag(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


def content_stats(df, cols: list[str]) -> tuple[int, int]:
    """(row count, xor of per-row xxhash64 over ``cols``) in ONE
    aggregation job — callers that need the count anyway (e.g. the
    artifact granularity ladder) reuse it instead of paying a second
    scan (review r6)."""
    from pyspark.sql import functions as F

    key = ", ".join(f"`{c}`" for c in cols)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"coalesce(bit_xor(xxhash64({key})), 0)").alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def fingerprint_from_stats(n: int, h: int, extra: tuple = ()) -> str:
    """Fingerprint from precomputed ``content_stats`` — lets a caller
    fold derivation parameters that themselves DEPEND on the count
    (the ladder regime) into the key without a second scan."""
    return hashlib.md5(repr((n, h, tuple(extra))).encode()).hexdigest()[:10]


def content_fingerprint(df, cols: list[str], extra: tuple = ()) -> str:
    """Short content fingerprint for keying materialized artifacts: row
    count + xor of per-row xxhash64 over ``cols`` (order-insensitive,
    overflow-free — xor, not sum — and sensitive to any changed value,
    not just cardinality), plus ``extra`` derivation parameters (k,
    plane counts, a version token — anything that changes the DERIVED
    artifact without changing the source data).  The xor coalesces to 0
    on an empty frame (bit_xor over zero rows is NULL)."""
    n, h = content_stats(df, cols)
    return fingerprint_from_stats(n, h, extra)


def two_phase_artifact(path: str, marker: str, build) -> str:
    """Crash-atomic AND concurrent-safe warehouse-artifact build: if
    ``path/marker`` is absent, run ``build(tmp_path)`` (which must WRITE
    the artifact into ``tmp_path``), touch the marker INSIDE tmp, then
    ``os.rename`` tmp over path — the rename is the commit point, so a
    crash at any instant leaves either nothing (rebuild) or a
    fully-marked artifact (reuse); there is no window where a
    populated-but-unmarked final directory can be rmtree'd out from
    under a concurrent reader (review r7 third pass).

    Concurrency (ADVICE r7, hardened r8): each builder uses a UNIQUE
    tmp path (pid + random suffix), so two racing processes never share
    a staging directory.  If the final rename fails because a winner
    already committed, the loser re-checks the marker, treats the
    winner's artifact as its own success, and discards its staging
    copy.  Stale (crash-leftover, unmarked) final directories are never
    rmtree'd in place — they are atomically renamed ASIDE first and
    re-verified under exclusive ownership, so a marker that appears
    between check and clear cannot be destroyed; a committed artifact
    swept up by that move is put back untouched.  Content
    fingerprinting upstream guarantees all builders of one ``path``
    produce identical bytes.
    """
    import os
    import shutil
    import uuid

    if not os.path.exists(os.path.join(path, marker)):
        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            build(tmp)
            open(os.path.join(tmp, marker), "w").close()
            for _ in range(8):  # bounded: each retry handles one race shape
                try:
                    os.rename(tmp, path)
                    break
                except OSError:
                    if os.path.exists(os.path.join(path, marker)):
                        break  # a concurrent builder committed — reuse it
                    # A populated-but-unmarked ``path`` is a crash
                    # leftover from a pre-rename-commit build.  Move it
                    # ASIDE atomically (never rmtree in place: a marker
                    # appearing between the check above and a delete
                    # would destroy a winner's committed artifact —
                    # review r8), re-verify what we now exclusively own,
                    # and only then delete it.
                    stale = f"{path}.stale-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                    try:
                        os.rename(path, stale)
                    except OSError:
                        continue  # path vanished/changed underneath: retry
                    if os.path.exists(os.path.join(stale, marker)):
                        # We moved a freshly committed artifact — put it
                        # back and use it (our own copy is identical by
                        # fingerprint construction).  The put-back rename
                        # can fail either because ANOTHER committed copy
                        # now occupies ``path`` (safe to drop ours) or
                        # transiently; only delete the swept-up committed
                        # copy once a marked artifact is verifiably back
                        # at ``path`` — otherwise keep retrying, and as a
                        # last resort restore by raising, never by
                        # deleting the only committed copy (ADVICE r8).
                        put_back_ok = False
                        for _ in range(8):
                            try:
                                os.rename(stale, path)
                                put_back_ok = True
                                break
                            except OSError:
                                if os.path.exists(os.path.join(path, marker)):
                                    shutil.rmtree(stale, ignore_errors=True)
                                    put_back_ok = True
                                    break
                        if not put_back_ok:
                            raise OSError(
                                f"committed artifact stranded at {stale}; "
                                f"refusing to delete the only copy of {path}"
                            )
                        break
                    shutil.rmtree(stale, ignore_errors=True)
            else:
                raise OSError(f"could not commit artifact at {path}")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
) -> DataFrame:
    """Materialize (once) and return a bucketed+sorted copy of a test
    table.  On a real deployment this is the one-time layout decision made
    at ingest (`io/parquet_sink.py` owns the streaming write path); here it
    doubles as the fixture for the co-location queries/plan tests.

    The pre-write ``repartition(n_buckets, *keys)`` uses the same Murmur3
    hash pmod as bucketBy's bucket assignment, so every task receives
    exactly one bucket and writes exactly one file — the single-file-per-
    bucket layout Spark requires to mark the scan output as sorted.
    """
    # Read policy for bucketed tables, set once per session:
    # - keep the bucket-aligned scan even when no operator *requires* the
    #   distribution (the planner's auto-disable rule would otherwise also
    #   drop bucket PRUNING on point lookups);
    # - derive output ordering from the sortBy metadata — Spark gates this
    #   behind a legacy flag because multi-file buckets concatenate
    #   unsorted, but it still verifies one-file-per-bucket at planning
    #   time, which the repartition-before-write above guarantees.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    name = f"bkt_{table}_{'_'.join(keys)}_{n_buckets}_{_tag(sf_dir)}"
    path = os.path.join(warehouse_dir(), name)
    if not spark.catalog.tableExists(name):
        (
            t(spark, sf_dir, table)
            .repartition(n_buckets, *[F.col(k) for k in keys])
            .write.format("parquet")
            .mode("overwrite")
            .option("path", path)
            .bucketBy(n_buckets, *keys)
            .sortBy(*keys)
            .saveAsTable(name)
        )
    return spark.table(name)


def zorder_value(
    cols: list,
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
):
    """Z-curve (Morton) value of N numeric columns as a pure Column
    expression: each column is linearly quantized to ``bits`` bits over
    its [min, max] span, then the bit planes are interleaved.  Rows close
    in z-value are close in EVERY quantized dimension, so a z-sorted file
    layout gives tight per-file min/max ranges on all participating
    columns at once — the multi-column data-skipping that single-column
    sort order cannot provide.  Entirely JVM-side (shifts/ands/adds,
    whole-stage codegen); linear quantization assumes roughly uniform key
    distributions — swap in range-bucket boundaries for heavy skew.
    """
    n = len(cols)
    # A signed 64-bit z-value holds at most 63 interleaved bits; beyond
    # that Spark's shiftleft wraps the shift amount mod 64, aliasing high
    # bit planes onto low positions (and the sign bit inverts the range-
    # partition order) — silently destroying the clustering.  Clamp the
    # per-column precision instead: fewer bits = coarser cells, still a
    # valid z-order.
    if n * bits > 63:
        bits = 63 // n
    cap = (1 << bits) - 1
    qs = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi - lo) if hi > lo else 1.0
        q = F.floor((c.cast("double") - float(lo)) / span * cap).cast("long")
        qs.append(F.least(F.lit(cap), F.greatest(F.lit(0), q)))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(qs):
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def ensure_zordered(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Materialize (once) a z-order-clustered copy of a test table:
    compute the Morton value over ``cols``, range-partition into
    ``n_files`` contiguous z-ranges, sort within each, write one file
    per range.  A conjunctive range predicate over the z columns then
    touches only the few files whose z-interval intersects the query
    box — parquet row-group min/max stats prune the rest without
    scanning.  This is the layout move for fact tables filtered on TWO+
    dimensions at 100 TB (single-dim sort or partitioning only skips on
    its own column).
    """
    name = f"zrd_{table}_{'_'.join(cols)}_{n_files}_{_tag(sf_dir)}"
    path = os.path.join(warehouse_dir(), name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = t(spark, sf_dir, table)
        stats = df.agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
        ).first()
        z = zorder_value(
            [F.col(c) for c in cols],
            [stats[f"lo_{c}"] for c in cols],
            [stats[f"hi_{c}"] for c in cols],
            bits=bits,
        )
        (
            df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def ensure_partitioned(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    part_col: str,
    part_expr,
) -> DataFrame:
    """Materialize (once) a copy of a test table partitioned by a derived
    column (e.g. ``o_year = year(o_orderdate)``) and return the re-read
    DataFrame.  Filters on ``part_col`` become directory-pruning
    `PartitionFilters` — at 100 TB a year-filtered scan touches 1/N of the
    files instead of relying on row-group statistics alone.
    """
    name = f"prt_{table}_{part_col}_{_tag(sf_dir)}"
    path = os.path.join(warehouse_dir(), name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            t(spark, sf_dir, table)
            .withColumn(part_col, part_expr)
            .write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(path)
        )
    return spark.read.parquet(path)


def ensure_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize (once) the day-grain continuous aggregate of `events`:
    per (day, event_type) counts and RAW value sums — sufficient
    statistics, not final answers, so any coarser grain (week, month,
    quarter) and any algebraic aggregate (count, sum, avg = sum/count)
    is answerable from this table without touching the base events.
    At 100 TB this is the hypertable-rollup move: the streaming sink
    appends to the base table AND upserts these per-epoch partial
    aggregates; month-grain dashboards then scan KB instead of TB.
    """
    name = f"rlp_events_day_{_tag(sf_dir)}"
    path = os.path.join(warehouse_dir(), name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            t(spark, sf_dir, "events")
            .groupBy(
                F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)
