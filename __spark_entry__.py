"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual query library lives in ``target_parquet_spark/queries*.py``
(registry pattern — queries, queries_ext, queries_tpch2, queries_ops,
queries_layout, queries_r2, queries_r3); this file is the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import target_parquet_spark.queries as _q  # noqa: E402
import target_parquet_spark.queries_ext as _qe  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_tpch2 as _qt2  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_ops as _qo  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_layout as _ql  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r2 as _qr2  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r3 as _qr3  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r4 as _qr4  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r5 as _qr5  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r6 as _qr6  # noqa: E402  (registers into _q)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-style pricing
    summary (scan+filter pushdown, partial agg, single shuffle)."""
    return _q.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
