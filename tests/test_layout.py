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
