"""Plan tests for the physical-layout module (io/layout.py): bucketed
co-located joins, bucket pruning, partition pruning.

These pin the three layout levers a 100-TB deployment depends on.  The
reference writes flat unbucketed files (target_parquet/writers.py:31-33),
so every one of these properties is new capability.
"""

from __future__ import annotations

import contextlib
import io

import target_parquet_spark.queries_layout  # noqa: F401  (registers into QUERIES)
from target_parquet_spark.queries import QUERIES


def plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_join_exchange_and_no_sort(spark, sf_dir):
    # both sides bucketed+sorted on the join key, one file per bucket:
    # the sort-merge join consumes the layout directly — the ONLY exchange
    # in the plan is the final segment aggregate, and no Sort node exists
    p = plan(spark, sf_dir, "join_bucketed_colocated")
    assert "SortMergeJoin" in p
    assert "Bucketed: true" in p
    assert p.count("Exchange (") == 1  # tree listing: one real exchange
    assert p.count("Sort (") == 0  # sortBy metadata elides both sorts
    assert "BroadcastHashJoin" not in p


def test_point_lookup_prunes_to_one_bucket(spark, sf_dir):
    # equality filter on the bucket key scans 1/8th of the files
    p = plan(spark, sf_dir, "scan_bucket_pruned")
    assert "SelectedBucketsCount: 1 out of 8" in p
    assert "Exchange" not in p


def test_year_filter_becomes_partition_filter(spark, sf_dir):
    # the o_year predicate prunes directories, never reaching row scan;
    # the scan reads only the two referenced data columns
    p = plan(spark, sf_dir, "scan_partition_pruned")
    pf = p.split("PartitionFilters:")[1].split("\n")[0]
    assert "o_year" in pf and "1997" in pf
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "o_totalprice" in read_schema
    assert "o_custkey" not in read_schema and "o_comment" not in read_schema


def test_zorder_concentrates_2d_range_hits(spark, sf_dir, tmp_path):
    """Morton clustering: a 2-D range box should land in a small fraction
    of the z-ordered files, while the same box spreads across ~all files
    of a hash-shuffled copy of identical file count."""
    from pyspark.sql import functions as F

    from target_parquet_spark.io.layout import ensure_zordered
    from target_parquet_spark.queries import t

    n_files = 16
    li = t(spark, sf_dir, "lineitem")
    st = li.agg(
        F.min("l_orderkey").alias("ok_lo"), F.max("l_orderkey").alias("ok_hi"),
        F.min("l_partkey").alias("pk_lo"), F.max("l_partkey").alias("pk_hi"),
    ).first()
    ok_span = st.ok_hi - st.ok_lo
    pk_span = st.pk_hi - st.pk_lo
    # ~8% x ~15% box in the middle of both ranges
    box = (
        F.col("l_orderkey").between(
            st.ok_lo + ok_span * 20 // 100, st.ok_lo + ok_span * 28 // 100
        )
        & F.col("l_partkey").between(
            st.pk_lo + pk_span * 40 // 100, st.pk_lo + pk_span * 55 // 100
        )
    )

    z = ensure_zordered(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
                        n_files=n_files)
    z_hit_files = z.filter(box).select(F.input_file_name()).distinct().count()

    shuf = str(tmp_path / "shuffled")
    t(spark, sf_dir, "lineitem").repartition(n_files).write.parquet(shuf)
    s = spark.read.parquet(shuf)
    s_hit_files = s.filter(box).select(F.input_file_name()).distinct().count()

    assert z.filter(box).count() == s.filter(box).count() > 0
    assert s_hit_files >= n_files * 3 // 4          # random layout: no skipping
    assert z_hit_files <= n_files // 4              # z-order: tight concentration
    assert z_hit_files < s_hit_files


def test_zorder_value_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from target_parquet_spark.io.layout import zorder_value

    df = spark.range(1)
    # 2 cols, 2 bits each, spans [0,3]: x=3 (bits 11), y=0 -> z = 0b0101 = 5
    z = zorder_value([F.lit(3), F.lit(0)], [0, 0], [3, 3], bits=2)
    assert df.select(z.alias("z")).first().z == 5
    # x=0, y=3 -> 0b1010 = 10
    z2 = zorder_value([F.lit(0), F.lit(3)], [0, 0], [3, 3], bits=2)
    assert df.select(z2.alias("z")).first().z == 10


def test_materializers_are_idempotent(spark, sf_dir):
    """Second ensure_* call must reuse the written copy (same file set,
    no rewrite) — bench best-of-2 and repeated driver runs depend on
    this."""
    import os

    from target_parquet_spark.io.layout import ensure_rollup, ensure_zordered

    z1 = ensure_zordered(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    files1 = sorted(z1.inputFiles())
    mtimes1 = [os.path.getmtime(f.replace("file:", "")) for f in files1]
    z2 = ensure_zordered(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    assert sorted(z2.inputFiles()) == files1
    assert [os.path.getmtime(f.replace("file:", "")) for f in files1] == mtimes1

    r1 = ensure_rollup(spark, sf_dir)
    n1 = r1.count()
    assert ensure_rollup(spark, sf_dir).count() == n1


def test_dpp_join_prunes_partitions_at_runtime(spark, sf_dir):
    import contextlib
    import io as _io

    from target_parquet_spark.queries import QUERIES

    df = QUERIES["scan_dpp_join"](spark, sf_dir)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # the fact scan's partition filter is a runtime subquery, not a literal
    assert "dynamicpruningexpression" in p
    assert "PartitionFilters" in p


def test_day_over_day_first_row_null_and_ma_bounded(spark, sf_dir):
    from target_parquet_spark.queries import QUERIES

    rows = QUERIES["rollup_day_over_day"](spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, days in by_type.items():
        days.sort(key=lambda r: r.day)
        assert days[0].dod_change is None  # no prior period
        assert all(r.dod_change is not None for r in days[1:])
        for i, r in enumerate(days):
            window = [d.n_events for d in days[max(0, i - 6): i + 1]]
            assert min(window) <= r.ma7 <= max(window)
