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
import target_parquet_spark.queries_r7 as _qr7  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r8 as _qr8  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r9 as _qr9  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r10 as _qr10  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r11 as _qr11  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r12 as _qr12  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r13 as _qr13  # noqa: E402  (registers into _q)
import target_parquet_spark.queries_r14 as _qr14  # noqa: E402  (registers into _q)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-style pricing
    summary (scan+filter pushdown, partial agg, single shuffle)."""
    return _q.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate samples the FIRST 50 registry entries.  Only
# 93 of 318 distinct queries had a driver-green row after seven rounds
# (VERDICT r7 #3), so from r8 the prefix ROTATES: ~10 long-green anchors stay
# for continuity, the other ~40 slots are drawn from queries that have NEVER
# had a driver row (plus this round's new/changed ops), prioritizing families
# without any driver-green representative.  scripts/check_oracle.py still
# sweeps all entries every round; cumulative coverage is tracked below.
#
# Cumulative distinct driver-gated before this round: 93 (of the 318-query
# r7 registry; r8 registers 3 more -> 321 total).  This prefix adds 40
# never-gated names -> 133/321 expected after r8.
_CURATED_PREFIX = [
    # anchors (driver-green in prior rounds; one per family for continuity)
    "q1_pricing_summary",
    "join_broadcast_dim",
    "asof_join_events",
    "window_topk_per_group",
    "dedup_minhash_lsh_pairs",
    "dedup_connected_components",
    "sim_ivfpq_ann",
    "text_bm25_search",
    "events_sessionize",
    "pipeline_training_data",
    # --- never-gated rotation, round 8 ---
    # TPC-H tail (none of q2/q7/q8/q9/q21 ever driver-gated)
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q21_waiting_suppliers",
    # joins / scans / layout
    "join_bucketed_colocated",
    "join_bloom_prefilter",
    "join_null_safe",
    "scan_zorder_pruned",
    "scan_dpp_join",
    "scan_csv_source",
    "scan_schema_evolution",
    # agg / window
    "agg_cube_grouping_marker",
    "agg_heavy_hitters_cms",
    "agg_weighted_percentile",
    "window_rolling_quantile",
    "window_value_functions",
    # sql / scalar / lateral
    "sql_recursive_reachability",
    "sql_correlated_subqueries",
    "scalar_null_semantics",
    "scalar_map_funcs",
    "lateral_udtf_sentences",
    # dedup (ngram pair path rewritten this round — gate it)
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_simhash_pairs",
    # similarity
    "sim_kmeans_lloyd",
    "sim_ann_multiprobe",
    "sim_mmr_select",
    # graph (incl. this round's capped twins)
    "graph_pagerank_dupweb",
    "graph_modularity",
    "graph_ktruss_capped",
    "graph_trustrank_capped",
    # text (winnowing rewritten this round — gate it)
    "text_winnowing_pairs",
    "text_lang_id",
    "text_cluster_topics",
    # events (holt/seasonal refactored this round — gate them)
    "events_holt_forecast",
    "events_seasonal_decompose",
    "events_funnel_sessions",
    # governance / sampling / multimodal (new decode query)
    "audit_ks_drift",
    "multimodal_decode_bmp",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _CURATED_PREFIX:
        out[name] = _q.QUERIES[name]
    for name, fn in _q.QUERIES.items():
        if name not in out:
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    ordered = queries()
    return {name: _q.ORACLES[name] for name in ordered if name in _q.ORACLES}
