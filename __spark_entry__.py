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
# 92 of 318 distinct queries had a driver-green row after seven rounds
# (VERDICT r7 #3; r8's tracking comment said 93 — off by one, corrected per
# VERDICT r8), so from r8 the prefix ROTATES: ~10 long-green anchors stay
# for continuity, the other ~40 slots are drawn from queries that have NEVER
# had a driver row (plus this round's new/changed ops), prioritizing families
# without any driver-green representative.  scripts/check_oracle.py still
# sweeps all entries every round; cumulative coverage is tracked below.
#
# Cumulative distinct driver-gated before this round: 132 (92 through r7 +
# 40 first-time names in CORRECTNESS_r08, all green) of the 321-query r8
# registry; r9 registers 9 more (multimodal decode_png/wav/jpeg/gif,
# video_frames, audio_vad, corpus_profile, content_dedup,
# sim_knn_graph_quantized) -> 330 total.  This prefix keeps the 10 anchors
# and rotates in 40 never-gated names — all nine r9 newcomers gate first;
# seven wave-2 names (temperature_mixture, weighted_without_replacement,
# ewma_daily, duplicate_groups, mixture_quota, token_budget, and
# asof_join_tolerance — bumped for decode_gif) defer to wave 3 to make
# room -> expected 172/330 after r9.
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
    # --- never-gated rotation, round 9 (wave 2 of VERDICT r7 #3) ---
    # new/changed this round — gate them first
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "multimodal_decode_jpeg",
    "multimodal_video_frames",
    "multimodal_audio_vad",
    "multimodal_corpus_profile",
    "multimodal_content_dedup",
    "multimodal_decode_gif",
    "sim_knn_graph_quantized",
    "text_kneser_ney_logprob",
    # TPC-H tail (q11-q22 never driver-gated)
    "q11_important_stock",
    "q12_late_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q22_dormant_customers",
    # CDC family (never gated)
    "cdc_merge_upsert",
    "cdc_snapshot_diff",
    "cdc_point_in_time_join",
    # events / experimentation tail
    "events_ab_experiment",
    "events_survival_km",
    "events_cuped_adjustment",
    "events_did_estimate",
    "events_srm_check",
    "events_power_analysis",
    # governance / audits
    "audit_l_diversity",
    "audit_expectations",
    "audit_benford_digits",
    "audit_psi_drift",
    # scan / layout tail
    "scan_partition_pruned",
    "scan_merge_on_read",
    "scan_compaction_binpack",
    "scan_orc_source",
    "scan_jsonl_source",
    # sampling family
    "sample_hash_pct",
    "sample_stratified",
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
