"""Physical-plan regression tests: the scale properties SURVEY §4 claims.

A query that returns right answers with the wrong plan fails at 100 TB —
these tests pin predicate pushdown, column pruning, broadcast joins, and
partial aggregation by inspecting the optimized/formatted plans.
"""

from __future__ import annotations

import contextlib
import io
import os
import re

import target_parquet_spark.queries_layout  # noqa: F401  (registers into QUERIES)
import target_parquet_spark.queries_ops  # noqa: F401  (registers into QUERIES)
from target_parquet_spark.queries import QUERIES


def plan(spark, sf_dir, name: str) -> str:
    # Bypass lineage.mat cuts during construction: a localCheckpoint
    # replaces its subtree with a LogicalRDD scan in explain output,
    # hiding the joins/aggregates these tests assert on.  The bypass
    # changes nothing about the algebra — only compute-once-vs-replay.
    # Save/restore rather than unconditional pop (ADVICE r10): an
    # externally pre-set value must survive, and parallel in-process
    # callers must not see their setting clobbered.
    prev = os.environ.get("SPARK_GRAFT_NO_MAT")
    os.environ["SPARK_GRAFT_NO_MAT"] = "1"
    try:
        df = QUERIES[name](spark, sf_dir)
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_NO_MAT", None)
        else:
            os.environ["SPARK_GRAFT_NO_MAT"] = prev
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_pushdown_and_pruning(spark, sf_dir):
    p = plan(spark, sf_dir, "q6_forecast_revenue")
    # every filterable predicate reaches the parquet scan
    assert "PushedFilters:" in p
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in p or col in p.split("PushedFilters:")[1].split("\n")[0]
    # column pruning: the scan reads only the 4 referenced columns
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema


def test_broadcast_dim_join_no_shuffle_join(spark, sf_dir):
    p = plan(spark, sf_dir, "join_broadcast_dim")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # dim-side filter pushed to its scan
    assert "p_size" in p.split("PushedFilters:")[-1].split("\n")[0] or "LessThanOrEqual(p_size" in p


def test_q1_partial_aggregation(spark, sf_dir):
    p = plan(spark, sf_dir, "q1_pricing_summary")
    # map-side partial agg before the exchange: two HashAggregate nodes
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_topk_uses_takeordered(spark, sf_dir):
    p = plan(spark, sf_dir, "sort_limit_topk")
    # global sort+limit should compile to TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in p


def test_semi_join_is_semi(spark, sf_dir):
    p = plan(spark, sf_dir, "join_semi")
    assert "LeftSemi" in p


def test_hash_sample_is_scan_stage_only(spark, sf_dir):
    # deterministic sampling must stay a per-row predicate: no shuffle at all
    p = plan(spark, sf_dir, "sample_hash_pct")
    assert "Exchange" not in p
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "o_orderdate" not in read_schema  # pruned to the 2 output cols + key


def test_gap_fill_spine_join_broadcasts(spark, sf_dir):
    # hourly-counts side is tiny next to raw events: must broadcast, and the
    # events agg must partial-aggregate map-side before its exchange
    p = plan(spark, sf_dir, "events_gap_fill")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert p.count("HashAggregate") >= 2


def test_full_outer_reuses_custkey_partitioning(spark, sf_dir):
    # both agg inputs and the join shuffle on o_custkey; the join itself must
    # not broadcast (full outer cannot) and must not add extra exchanges
    # beyond one per side (+AQE may insert none for the join itself)
    p = plan(spark, sf_dir, "join_full_outer")
    assert "FullOuter" in p
    assert "BroadcastHashJoin" not in p


def test_explode_before_aggregate_topk(spark, sf_dir):
    # unnest runs in the scan stage; the final top-20 is TakeOrdered, not a
    # full global sort of the vocabulary
    p = plan(spark, sf_dir, "lateral_explode_tokens")
    assert "Generate explode" in p or "Generate" in p
    assert "TakeOrderedAndProject" in p


def test_contamination_probe_broadcasts(spark, sf_dir):
    import target_parquet_spark.queries_ext  # noqa: F401  (registers)

    p = plan(spark, sf_dir, "text_contamination")
    # the benchmark n-gram set must broadcast: the corpus posting side of
    # the membership probe never shuffles on the shingle
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_token_budget_single_window_shuffle(spark, sf_dir):
    import target_parquet_spark.queries_ext  # noqa: F401  (registers)

    p = plan(spark, sf_dir, "sample_token_budget")
    # one running-total window over one hash exchange on source
    assert p.count("Window") >= 1
    assert p.count("Exchange hashpartitioning") <= 2


def test_interval_join_pushes_filters_and_keys_on_equikey(spark, sf_dir):
    p = plan(spark, sf_dir, "events_interval_join")
    # event-type filters reach both scans; the band is a residual, the
    # join itself is an equi-join on user_id (broadcast at this size)
    pushed = [seg.split("\n")[0] for seg in p.split("PushedFilters:")[1:]]
    assert any("EqualTo(event_type,click)" in s for s in pushed)
    assert any("EqualTo(event_type,purchase)" in s for s in pushed)
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_hll_sketch_partial_aggregation(spark, sf_dir):
    p = plan(spark, sf_dir, "agg_hll_sketch")
    # register maxima must partial-aggregate map-side (mergeable sketch);
    # the 64-row exchange is the only data that moves
    assert p.count("HashAggregate") >= 2
    assert "partial_max" in p


def test_zorder_scan_pushes_both_range_predicates(spark, sf_dir):
    p = plan(spark, sf_dir, "scan_zorder_pruned")
    pushed = p.split("PushedFilters:")[1].split("\n")[0]
    assert "GreaterThanOrEqual(l_orderkey" in pushed
    assert "LessThanOrEqual(l_orderkey" in pushed
    assert "GreaterThanOrEqual(l_partkey" in pushed
    assert "LessThanOrEqual(l_partkey" in pushed


def test_centroids_partial_aggregation_after_generate(spark, sf_dir):
    p = plan(spark, sf_dir, "sim_label_centroids")
    assert "Generate" in p  # posexplode in the scan stage
    assert p.count("HashAggregate") >= 2  # dim-wise partial avg map-side


def test_scd2_single_exchange_shared_by_both_windows(spark, sf_dir):
    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "cdc_scd2_history")
    # change detection and interval stitching share one user_id
    # hash-partitioning: exactly one shuffle in the whole plan
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_merge_intervals_single_exchange(spark, sf_dir):
    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "events_merge_intervals")
    # running-max window, island numbering, and per-island agg all reuse
    # the user_id partitioning; the agg keys (user_id, island) are a
    # superset-prefix so no re-shuffle
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_unigram_vocab_join_broadcasts(spark, sf_dir):
    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "text_unigram_logprob")
    # the corpus-side token stream is never reshuffled for the scoring
    # join: vocab and (N, V) stats arrive by broadcast
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_rolling_quantile_single_window_shuffle(spark, sf_dir):
    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "window_rolling_quantile")
    # p90 and median share one Window node over one user_id shuffle
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert len(re.findall(r"\(\d+\) Window", p)) == 1


def test_bitmap_distinct_partial_aggregates(spark, sf_dir):
    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "agg_bitmap_distinct")
    # word-level bit_or must combine map-side (the mergeable-state claim):
    # two HashAggregate pairs (word agg + type rollup), partial_bit_or visible
    assert "partial_bit_or" in p
    assert p.count("HashAggregate") >= 4


def test_ks_drift_windows_over_value_table_not_rows(spark, sf_dir):
    import re as _re

    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "audit_ks_drift")
    # the ECDF window must sit above the per-value aggregate (distinct-
    # value-sized input), never directly over the raw scan
    agg_pos = p.find("partial_sum")
    win_pos = p.find("Window")
    assert agg_pos != -1 and win_pos != -1
    # and the whole plan still shuffles only on hash keys (no global sort)
    assert len(_re.findall(r"\(\d+\) Sort", p)) <= 3  # window-local sorts only


def test_hourly_profile_single_count_shuffle(spark, sf_dir):
    import re as _re

    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "events_hourly_profile")
    # raw events touched once: one scan node only
    assert len(_re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert "partial_count" in p


def test_interval_overlap_join_is_equi_not_nested_loop(spark, sf_dir):
    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "events_interval_overlap_join")
    # the day banding must plan a hash join with the overlap test as a
    # residual — never the quadratic nested loop of a pure theta join
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_pq_encoding_is_scan_stage(spark, sf_dir):
    import target_parquet_spark.queries_r3  # noqa: F401

    p = plan(spark, sf_dir, "sim_pq_ann")
    # codebook argmin encoding joins nothing; the only ordering operator
    # is the top-k itself
    assert "Join" not in p
    assert "TakeOrderedAndProject" in p


def test_r4_new_joins_are_equi_not_nested_loop(spark, sf_dir):
    import target_parquet_spark.queries_r4  # noqa: F401

    for name in ("multimodal_phash_pairs", "cdc_point_in_time_join"):
        p = plan(spark, sf_dir, name)
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name
        assert "BroadcastHashJoin" in p or "SortMergeJoin" in p, name


def test_bm25_is_topk_with_broadcast_stats(spark, sf_dir):
    import target_parquet_spark.queries_r4  # noqa: F401

    p = plan(spark, sf_dir, "text_bm25_search")
    # the final top-20 must be a TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in p
    # no unbroadcast cartesian anywhere (the 1-row corpus-stats cross
    # join IS a BroadcastNestedLoopJoin — the scalar-broadcast pattern)
    assert "CartesianProduct" not in p
    # df table and corpus stats join as broadcasts
    assert p.count("BroadcastExchange") >= 2


def test_sequence_packing_windows_are_sharded(spark, sf_dir):
    import re as _re

    import target_parquet_spark.queries_r4  # noqa: F401

    p = plan(spark, sf_dir, "sample_sequence_packing")
    # every window must carry a partition spec (the shard) — an empty
    # partitionBy would funnel the corpus through ONE task at scale
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", p):
        assert m.group(1).strip().startswith("shard"), m.group(0)


def test_substring_runs_equi_join_and_partial_agg(spark, sf_dir):
    import target_parquet_spark.queries_r5  # noqa: F401

    p = plan(spark, sf_dir, "dedup_substring_runs")
    # duplicated-gram candidate generation is an equi-join on the gram
    # hash — never an all-pairs product
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the (doc_id, gh)-distinct pre-agg and the per-doc rollup both
    # combine map-side before their exchanges
    assert p.count("HashAggregate") >= 4
    # islands window is partitioned by doc_id, not global
    assert "windowspecdefinition(doc_id" in p


def test_quality_logreg_is_single_scan_pipeline(spark, sf_dir):
    import target_parquet_spark.queries_r5  # noqa: F401

    p = plan(spark, sf_dir, "text_quality_logreg")
    # pure Column features: no joins, no explodes, no windows
    assert "Join" not in p
    assert "Generate" not in p
    assert "Window" not in p
    # one partial + one final aggregate around the single groupBy shuffle
    # (formatted plans list each node in the tree AND the detail section)
    assert p.count("HashAggregate") == 4


def test_dsir_scoring_is_single_scan_takeordered(spark, sf_dir):
    """DSIR's scoring pass must be a pure column expression over ONE
    corpus scan feeding TakeOrdered — no explode, no join, no shuffle
    (the llr table is literal plan state)."""
    import target_parquet_spark.queries_r8  # noqa: F401

    p = plan(spark, sf_dir, "sample_dsir_importance")
    assert "TakeOrderedAndProject" in p
    assert p.count("Scan parquet") <= 2  # tree + detail of the one scan
    assert "Generate" not in p  # no explode in the scoring plan
    assert "Join" not in p


def test_graph_ann_hops_broadcast_the_frontier(spark, sf_dir):
    """Every beam-search hop must broadcast the bounded frontier —
    a SortMergeJoin anywhere in the walk means the edge artifact or the
    corpus was shuffled per hop."""
    import target_parquet_spark.queries_r8  # noqa: F401

    p = plan(spark, sf_dir, "sim_graph_ann_search")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_bigram_lm_unigram_sides_broadcast(spark, sf_dir):
    """The bigram-count join is the one allowed data-sized shuffle; both
    unigram lookups must ride broadcasts (Zipf-bounded vocab)."""
    import target_parquet_spark.queries_r8  # noqa: F401

    p = plan(spark, sf_dir, "text_bigram_logprob")
    assert p.count("BroadcastHashJoin") >= 2


def test_binary_hamming_no_shuffle_join_takeordered(spark, sf_dir):
    """Binary ANN: one broadcast of the 1-row probe, XOR+popcount in the
    scan stage, TakeOrderedAndProject — never a shuffled pair join."""
    import target_parquet_spark.queries_r10  # noqa: F401

    p = plan(spark, sf_dir, "sim_binary_hamming_ann")
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_rrf_both_retrievers_takeordered(spark, sf_dir):
    """Both RRF retrievers truncate via TakeOrderedAndProject BEFORE
    rank assignment — no global sort materializes a full ranking."""
    import target_parquet_spark.queries_r10  # noqa: F401

    p = plan(spark, sf_dir, "sim_rrf_hybrid")
    assert p.count("TakeOrderedAndProject") >= 2


def test_propensity_match_no_pair_join(spark, sf_dir):
    """PSM must stay a window scan: exactly two scans of events, no
    sort-merge/cartesian pair join between treated and controls (the
    quadratic form the sf1 probe caught)."""
    import target_parquet_spark.queries_r10  # noqa: F401

    p = plan(spark, sf_dir, "events_propensity_match")
    # formatted plan is pre-AQE (the executed plan reuses down to 2
    # scans); the load-bearing pin is the absence of any pair join
    assert p.count("Scan parquet") <= 4
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bootstrap_explode_before_aggregate(spark, sf_dir):
    """The 32x replicate explode feeds a partial (map-side) aggregate —
    replicated rows never shuffle raw."""
    import target_parquet_spark.queries_r10  # noqa: F401

    p = plan(spark, sf_dir, "events_bootstrap_ci")
    gen = p.find("Generate")
    agg = p.find("HashAggregate")
    assert gen != -1 and agg != -1
    assert "partial_sum" in p


def test_semdedup_no_cluster_self_join(spark, sf_dir):
    """SemDeDup candidates join on (cluster, sub-bucket) keys — the
    join keys must include a sub-bucket, never the bare 4-bit cluster
    (the quadratic form the sf1 probe caught)."""
    import target_parquet_spark.queries_r10  # noqa: F401

    p = plan(spark, sf_dir, "dedup_semdedup")
    assert "sub_a" in p and "sub_b" in p


def _plan_default(spark, sf_dir, name: str) -> str:
    """Like plan(), but WITHOUT the NO_MAT bypass: the production plan,
    lineage cuts included."""
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lineage_cuts_present_in_production_plans(spark, sf_dir):
    """VERDICT r10 #8: the plan-shape tests assert under
    SPARK_GRAFT_NO_MAT=1, so nothing pinned that the mat() cuts are
    actually IN the production plan.  For one representative per cut
    family, the default-mode plan must contain a LogicalRDD scan (the
    cut) and strictly fewer parquet scans than the bypassed plan — a
    refactor that silently drops a mat() fails here."""
    import target_parquet_spark.queries_r6  # noqa: F401  (registers)
    import target_parquet_spark.queries_r7  # noqa: F401
    import target_parquet_spark.queries_r9  # noqa: F401

    for name in (
        "text_kneser_ney_logprob",  # LM-family vocab/token cuts (r10 w3)
        "sim_knn_graph",            # unordered-pair half mirror (r10 w5)
        "text_winnowing_pairs",     # per-doc fingerprint arrays (r10 w4)
        "graph_link_prediction",    # symmetrized edge cut (r10 w2)
    ):
        p_prod = _plan_default(spark, sf_dir, name)
        p_nomat = plan(spark, sf_dir, name)
        assert "ExistingRDD" in p_prod, f"{name}: cut missing in production plan"
        assert p_prod.count("Scan parquet") < p_nomat.count("Scan parquet"), (
            f"{name}: production plan does not reduce parquet scans "
            f"({p_prod.count('Scan parquet')} vs {p_nomat.count('Scan parquet')})"
        )
