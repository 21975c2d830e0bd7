"""Planted-signal tests for the round-5 third-wave operators
(queries_r9): CCNet perplexity buckets, hard-negative mining, the
retrieval-metrics eval harness, and k-center greedy selection.

Oracle hash-equality (scripts/check_oracle.py) is the primary gate;
these tests pin SEMANTICS against independently-constructed inputs and
an independent Python reimplementation (the BPE-separator lesson: both
engines can agree on a wrong answer).
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import target_parquet_spark.queries_r9  # noqa: F401  (registers queries)
from target_parquet_spark.queries import QUERIES


def _plant_docs(spark, tmp_path, docs):
    (
        spark.createDataFrame(docs, "doc_id long, lang string, text string")
        .withColumn("source", F.lit("src0"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )


def _plant_embeddings(spark, tmp_path, rows):
    (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/embeddings.parquet")
    )


def _vec(head, dim=64):
    return [float(x) for x in head] + [0.0] * (dim - len(head))


class TestCcnetBuckets:
    def test_gibberish_lands_in_tail(self, spark, tmp_path):
        """Docs whose bigrams never occur in the (even-id) training half
        must score pure backoff and drag the tail bucket's mean far
        below the head's."""
        fluent = "alpha beta gamma delta epsilon " * 4
        docs = [(i, "en", fluent) for i in range(0, 34)]
        # odd ids -> held out of training; unique unseen vocabulary
        docs += [
            (35, "en", "zorx1 zorx2 zorx3 zorx4 zorx5 zorx6"),
            (37, "en", "yarp1 yarp2 yarp3 yarp4 yarp5 yarp6"),
            (39, "en", "wibb1 wibb2 wibb3 wibb4 wibb5 wibb6"),
        ]
        _plant_docs(spark, tmp_path, docs)
        out = QUERIES["text_ccnet_buckets"](spark, str(tmp_path)).collect()
        by_bucket = {r.bucket: r for r in out}
        assert set(by_bucket) == {"head", "middle", "tail"}
        assert sum(r.n_docs for r in out) == 37
        # ntile balance: bucket sizes differ by at most 1
        sizes = [r.n_docs for r in out]
        assert max(sizes) - min(sizes) <= 1
        assert by_bucket["tail"].mean_logprob < by_bucket["head"].mean_logprob - 3
        # monotone cut boundaries: head cut >= middle cut >= tail cut
        assert (
            by_bucket["head"].cut_logprob
            >= by_bucket["middle"].cut_logprob
            >= by_bucket["tail"].cut_logprob
        )

    def test_buckets_are_per_language(self, spark, tmp_path):
        """Each language is split independently — a uniformly-scored
        minority language still gets its own three buckets instead of
        being crowded into the majority language's tail."""
        fluent_en = "the quick brown fox jumps over the dog " * 3
        fluent_de = "der schnelle braune fuchs springt hoch " * 3
        docs = [(i, "en", fluent_en) for i in range(0, 30)]
        docs += [(100 + i, "de", fluent_de) for i in range(0, 12)]
        _plant_docs(spark, tmp_path, docs)
        out = QUERIES["text_ccnet_buckets"](spark, str(tmp_path)).collect()
        langs = {r.lang for r in out}
        assert langs == {"en", "de"}
        de = [r for r in out if r.lang == "de"]
        assert {r.bucket for r in de} == {"head", "middle", "tail"}
        assert sum(r.n_docs for r in de) == 12

    def test_deterministic(self, spark, sf_dir):
        a = QUERIES["text_ccnet_buckets"](spark, sf_dir).collect()
        b = QUERIES["text_ccnet_buckets"](spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) > 0


class TestHardNegatives:
    def test_near_identical_other_label_is_rank_one(self, spark, tmp_path):
        """A different-label vector almost collinear with the anchor must
        be the #1 hard negative; a same-label twin must never appear."""
        rows = [
            (0, _vec([1.0, 0.0, 0.0]), 0),  # anchor (query)
            (100, _vec([0.999, 0.02, 0.0]), 1),  # impostor, other label
            (101, _vec([0.998, 0.03, 0.0]), 0),  # same-label twin
            (102, _vec([0.0, 1.0, 0.0]), 2),
            (103, _vec([0.0, 0.9, 0.1]), 2),
            (104, _vec([0.1, 0.8, 0.3]), 3),
            (105, _vec([0.0, 0.0, 1.0]), 4),
        ]
        # fill the query block 1..7 with far-away anchors so the output
        # contains their rows too (vec_id < 8 is the anchor set)
        rows += [(i, _vec([0.0, 0.0, 0.0, 1.0 + i]), 9) for i in range(1, 8)]
        _plant_embeddings(spark, tmp_path, rows)
        out = QUERIES["sim_hard_negatives"](spark, str(tmp_path)).collect()
        q0 = sorted(
            [r for r in out if r.query_id == 0], key=lambda r: r.rank
        )
        assert q0[0].neg_id == 100 and q0[0].neg_label == 1
        assert all(r.neg_id != 101 for r in q0)  # same label: not a negative
        assert all(r.neg_label != 0 for r in q0)
        assert [r.rank for r in q0] == list(range(1, len(q0) + 1))

    def test_deterministic_and_bounded(self, spark, sf_dir):
        out = QUERIES["sim_hard_negatives"](spark, sf_dir).collect()
        assert len(out) > 0
        per_q = {}
        for r in out:
            per_q.setdefault(r.query_id, []).append(r)
            assert r.neg_label != r.query_label
        assert all(len(v) <= 5 for v in per_q.values())


class TestRetrievalMetrics:
    def test_perfect_index_scores_one(self, spark, tmp_path):
        """Scaled copies of one direction: every vector lands in the same
        LSH bucket with pairwise cosine exactly 1, so retrieved == truth
        and recall/MRR/nDCG are all 1.0 for every query."""
        # single-dimension base: k*base is float32-exact and every
        # plane's dot is +-k*w[0] != 0 -> one shared bucket by construction
        base = _vec([1.0])
        rows = [
            (k, [x * (k + 1.0) for x in base], 0) for k in range(13)
        ]
        _plant_embeddings(spark, tmp_path, rows)
        out = QUERIES["sim_retrieval_metrics"](spark, str(tmp_path)).collect()
        assert len(out) == 8
        for r in out:
            assert r.n_retrieved == 10
            assert r.recall_at10 == pytest.approx(1.0)
            assert r.mrr == pytest.approx(1.0)
            assert r.ndcg == pytest.approx(1.0)

    def test_empty_bucket_query_still_emits_row(self, spark, tmp_path):
        """A query alone in its bucket must produce an all-zero metrics
        row, not silently vanish from the eval."""
        base = _vec([1.0])
        rows = [(0, [-x for x in base], 0)]
        rows += [(k, [x * (k + 1.0) for x in base], 0) for k in range(1, 13)]
        _plant_embeddings(spark, tmp_path, rows)
        out = {
            r.query_id: r
            for r in QUERIES["sim_retrieval_metrics"](
                spark, str(tmp_path)
            ).collect()
        }
        assert set(out) == set(range(8))
        assert out[0].n_retrieved == 0
        assert out[0].recall_at10 == 0.0
        assert out[0].mrr == 0.0
        assert out[0].ndcg == 0.0
        for qid in range(1, 8):
            assert out[qid].recall_at10 == pytest.approx(1.0)
            assert out[qid].ndcg == pytest.approx(1.0)


def _numpy_kcenter(path, rounds=6, seed_id=0):
    """Independent float64 reimplementation with the query's exact
    quantization (sequential per-dimension fold, floor(x+0.5) micro
    rounding, (dm DESC, vec_id ASC) argmax, unrounded micro/1e6
    division for sel_dist)."""
    tbl = pq.read_table(path).to_pydict()
    ids = tbl["vec_id"]
    vecs = [[float(x) for x in v] for v in tbl["embedding"]]
    seed = vecs[ids.index(seed_id)]

    def sqdist_micro(a, b):
        total = 0.0
        for x, y in zip(a, b):
            total += (x - y) * (x - y)
        return math.floor(total * 1000000 + 0.5)

    dm = {i: sqdist_micro(v, seed) for i, v in zip(ids, vecs)}
    picks = []
    for r in range(1, rounds + 1):
        best = max(dm, key=lambda i: (dm[i], -i))
        picks.append((r, best, dm[best] / 1000000.0))
        bv = vecs[ids.index(best)]
        for i, v in zip(ids, vecs):
            d = sqdist_micro(v, bv)
            if d < dm[i]:
                dm[i] = d
    return picks


class TestKcenterGreedy:
    def test_matches_independent_numpy_greedy(self, spark, sf_dir):
        """The full (round, id, dist) selection trace must match an
        independent Python farthest-point traversal bit-for-bit."""
        out = QUERIES["sim_kcenter_greedy"](spark, sf_dir).collect()
        got = [(r.sel_round, r.vec_id, r.sel_dist) for r in out]
        want = _numpy_kcenter(f"{sf_dir}/embeddings.parquet")
        assert sorted(got) == want

    def test_covers_far_clusters_first(self, spark, tmp_path):
        """Three tight, far-apart clusters with the seed in cluster A:
        the first two picks must cover clusters B and C (the
        farthest-point property), and selection distances must be
        non-increasing."""
        a = [(i, _vec([1.0 + 0.01 * i, 0.0]), 0) for i in range(5)]
        b = [(10 + i, _vec([0.0, 50.0 + 0.01 * i]), 1) for i in range(5)]
        c = [(20 + i, _vec([-80.0 - 0.01 * i, 0.0]), 2) for i in range(5)]
        _plant_embeddings(spark, tmp_path, a + b + c)
        out = sorted(
            QUERIES["sim_kcenter_greedy"](spark, str(tmp_path)).collect(),
            key=lambda r: r.sel_round,
        )
        first_two = {r.vec_id // 10 for r in out[:2]}
        assert first_two == {1, 2} or first_two == {2, 1}
        dists = [r.sel_dist for r in out]
        assert dists == sorted(dists, reverse=True)


def _plant_events(spark, tmp_path, rows):
    (
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/events.parquet")
    )


class TestCupedAdjustment:
    def test_stable_user_trait_kills_variance(self, spark, tmp_path):
        """When each user's post-period metric equals their pre-period
        metric (a perfectly predictive covariate), CUPED must remove
        almost all between-user variance in both arms."""
        import datetime as dt

        pre = dt.datetime(2024, 1, 5)
        post = dt.datetime(2024, 1, 20)
        rows = []
        eid = 0
        for u in range(40):
            for k in range(10):
                rows.append((eid, pre, u, "view", float(u + 1)))
                eid += 1
                rows.append((eid, post, u, "view", float(u + 1)))
                eid += 1
        _plant_events(spark, tmp_path, rows)
        out = QUERIES["events_cuped_adjustment"](spark, str(tmp_path)).collect()
        assert len(out) == 2
        for r in out:
            assert r.var_metric > 0
            assert r.var_reduction_pct > 95
            # the adjustment must not move the arm mean materially
            assert abs(r.mean_adjusted - r.mean_metric) < abs(r.mean_metric)

    def test_deterministic(self, spark, sf_dir):
        a = QUERIES["events_cuped_adjustment"](spark, sf_dir).collect()
        b = QUERIES["events_cuped_adjustment"](spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) == 2


class TestAuditExpectations:
    def test_mixed_pass_fail_on_corpus(self, spark, sf_dir):
        out = {
            (r.tbl, r.expectation): r
            for r in QUERIES["audit_expectations"](spark, sf_dir).collect()
        }
        assert len(out) == 9
        assert out[("events", "no_error_events")].passed == 0
        assert out[("events", "no_error_events")].n_failed > 0
        assert out[("events", "value_non_negative")].passed == 1
        assert out[("documents", "n_chars_consistent")].passed == 1
        for r in out.values():
            assert (r.n_failed == 0) == (r.passed == 1)
            assert 0 <= r.n_failed <= r.n_checked

    def test_planted_violations_are_counted(self, spark, tmp_path):
        """A planted out-of-catalog language and inconsistent n_chars
        must be counted exactly."""
        import datetime as dt

        docs = [
            (0, "en", "hello world"),
            (1, "xx", "bad lang"),
            (2, "yy", "also bad"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
        (
            df.withColumn("source", F.lit("src0"))
            .withColumn(
                "n_chars",
                F.when(F.col("doc_id") == 2, F.lit(999)).otherwise(
                    F.length("text")
                ).cast("long"),
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/documents.parquet")
        )
        _plant_events(
            spark, tmp_path, [(0, dt.datetime(2024, 1, 5), 1, "click", -3.0)]
        )
        (
            spark.createDataFrame(
                [(1, "O", 10.0), (2, "X", -5.0)],
                "o_orderkey long, o_orderstatus string, o_totalprice double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/orders.parquet")
        )
        out = {
            (r.tbl, r.expectation): r
            for r in QUERIES["audit_expectations"](spark, str(tmp_path)).collect()
        }
        assert out[("documents", "lang_in_catalog")].n_failed == 2
        assert out[("documents", "n_chars_consistent")].n_failed == 1
        assert out[("events", "value_non_negative")].n_failed == 1
        assert out[("orders", "status_in_set")].n_failed == 1
        assert out[("orders", "totalprice_positive")].n_failed == 1


class TestBpeFertility:
    def test_rare_language_pays_higher_fertility(self, spark, tmp_path):
        """Words frequent in the corpus earn merges; a language written in
        rare words the merge table never learned stays fragmented and
        must show strictly higher fertility."""
        common = "abab cdcd abab cdcd abab cdcd"
        rare = "qxzvwy jkpfgh mnrstu"
        docs = [(i, "en", common) for i in range(20)]
        docs += [(100 + i, "xx", rare) for i in range(2)]
        _plant_docs(spark, tmp_path, docs)
        out = {r.lang: r for r in QUERIES["text_bpe_fertility"](spark, str(tmp_path)).collect()}
        assert set(out) == {"en", "xx"}
        assert out["en"].n_words == 20 * 6
        assert out["xx"].n_words == 2 * 3
        assert out["xx"].fertility > out["en"].fertility

    def test_fertility_bounded_by_word_length(self, spark, sf_dir):
        out = QUERIES["text_bpe_fertility"](spark, sf_dir).collect()
        assert len(out) > 0
        for r in out:
            assert 1.0 <= r.fertility
            assert r.tokens_bpe >= r.n_words


class TestMatryoshkaRecall:
    def test_full_dim_row_is_identity(self, spark, sf_dir):
        out = {r.dim: r for r in QUERIES["sim_matryoshka_recall"](spark, sf_dir).collect()}
        assert set(out) == {8, 16, 32, 64}
        assert out[64].mean_recall10 == pytest.approx(1.0)
        for r in out.values():
            assert 0.0 <= r.mean_recall10 <= 1.0
            assert r.n_queries == 8

    def test_informative_prefix_beats_noise_prefix(self, spark, tmp_path):
        """Vectors whose FIRST 8 dims carry all the signal must keep
        recall 1.0 at every truncation level."""
        import random

        rng = random.Random(7)
        rows = []
        for k in range(16):
            head = [rng.uniform(-1, 1) for _ in range(8)]
            rows.append((k, [float(x) for x in head] + [0.0] * 56, 0))
        _plant_embeddings(spark, tmp_path, rows)
        out = {
            r.dim: r
            for r in QUERIES["sim_matryoshka_recall"](
                spark, str(tmp_path)
            ).collect()
        }
        # every level >= 8 sees the whole signal: identical rankings
        for d in (8, 16, 32, 64):
            assert out[d].mean_recall10 == pytest.approx(1.0), d


class TestDidEstimate:
    def test_planted_treatment_lift_detected(self, spark, tmp_path):
        """Arm-1 users get a post-period lift; DiD must recover it and
        the t statistic must be large."""
        import datetime as dt

        from target_parquet_spark.queries_ops import _hash_mod

        pre = dt.datetime(2024, 1, 5)
        post = dt.datetime(2024, 1, 20)
        # determine each user's arm with the same hash split the query uses
        arms = {
            r.user_id: r.arm
            for r in spark.range(200)
            .select(F.col("id").alias("user_id"), _hash_mod(F.col("id"), 2).alias("arm"))
            .collect()
        }
        rows = []
        eid = 0
        for u in range(200):
            lift = 50.0 if arms[u] == 1 else 0.0
            rows.append((eid, pre, u, "view", 100.0))
            eid += 1
            rows.append((eid, post, u, "view", 100.0 + lift))
            eid += 1
        _plant_events(spark, tmp_path, rows)
        out = QUERIES["events_did_estimate"](spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.mean_delta_a == pytest.approx(0.0)
        assert r.mean_delta_b == pytest.approx(50.0)
        assert r.did == pytest.approx(50.0)

    def test_aa_split_is_null(self, spark, sf_dir):
        """On the A/A-like corpus the DiD must be small relative to the
        deltas' scale and |t| must not scream."""
        r = QUERIES["events_did_estimate"](spark, sf_dir).collect()[0]
        assert r.n_a > 0 and r.n_b > 0
        assert abs(r.welch_t) < 5


class TestR9Plans:
    """Physical-plan pins for the round-5 third-wave ops (the SURVEY §4
    scale claims, asserted on the formatted plan)."""

    @staticmethod
    def _plan(spark, sf_dir, name):
        import contextlib
        import io

        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    def test_hard_negatives_broadcasts_anchor_block(self, spark, sf_dir):
        p = self._plan(spark, sf_dir, "sim_hard_negatives")
        assert "BroadcastNestedLoopJoin" in p  # 8-row anchor block
        assert "SortMergeJoin" not in p  # corpus never shuffle-joins

    def test_cuped_theta_is_broadcast_literal_state(self, spark, sf_dir):
        p = self._plan(spark, sf_dir, "events_cuped_adjustment")
        assert "BroadcastNestedLoopJoin" in p  # 1-row theta
        assert "SortMergeJoin" not in p

    def test_expectations_scan_each_table_once(self, spark, sf_dir):
        p = self._plan(spark, sf_dir, "audit_expectations")
        # formatted output lists each scan twice (tree + details): count
        # the per-scan ReadSchema detail lines instead
        assert p.count("ReadSchema:") == 3  # events, orders, documents
        # column pruning reaches the scan: events reads only the two
        # audited columns
        assert "struct<event_type:string,value:double>" in p

    def test_retrieval_metrics_broadcasts_queries(self, spark, sf_dir):
        p = self._plan(spark, sf_dir, "sim_retrieval_metrics")
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p


class TestKneserNey:
    def test_continuation_probability_property(self, spark, tmp_path):
        """The defining KN property: after an UNSEEN history, a word that
        follows many distinct histories ('versatile') must outscore an
        equally-frequent word welded to one history ('rigid')."""
        docs = []
        # training half (even ids): 'versatile' after 10 distinct
        # histories; 'rigid' 10 times but only ever after 'anchor'
        for i in range(10):
            docs.append((2 * i, "tr", f"hist{i} versatile"))
            docs.append((100 + 2 * i, "tr", "anchor rigid"))
        # probes (odd ids, one per source so the aggregate exposes them)
        docs.append((1001, "po", "anchor rigid"))      # seen bigram
        docs.append((1003, "pv", "nov3l versatile"))   # unseen history
        docs.append((1005, "pr", "nov3l rigid"))       # unseen history
        (
            spark.createDataFrame(
                docs, "doc_id long, source string, text string"
            )
            .withColumn("lang", F.lit("en"))
            .withColumn("n_chars", F.length("text").cast("long"))
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/documents.parquet")
        )
        out = {
            r.source: r
            for r in QUERIES["text_kneser_ney_logprob"](
                spark, str(tmp_path)
            ).collect()
        }
        assert (
            out["po"].mean_logprob_kn
            > out["pv"].mean_logprob_kn
            > out["pr"].mean_logprob_kn
        )

    def test_deterministic_and_probability_bounded(self, spark, sf_dir):
        a = QUERIES["text_kneser_ney_logprob"](spark, sf_dir).collect()
        b = QUERIES["text_kneser_ney_logprob"](spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        for r in a:
            assert r.mean_logprob_kn < 0  # log of probability < 1


class TestTrustrankSeeds:
    def test_seedless_component_stays_zero(self, spark, tmp_path):
        """Trust propagates only from seeds (doc_id % 17 == 0): a
        near-dup component containing no seed must score exactly 0."""
        text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        text_b = "one two three four five six seven eight nine ten eleven twelve"
        docs = [
            (0, text_a),   # seed (0 % 17 == 0) — cluster A
            (1, text_a),   # near-dup of the seed
            (20, text_b),  # cluster B: 20,21 and twins are never % 17 == 0
            (21, text_b),
        ]
        (
            spark.createDataFrame(docs, "doc_id long, text string")
            .withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("src0"))
            .withColumn("n_chars", F.length("text").cast("long"))
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/documents.parquet")
        )
        out = {
            r.doc_id: r.trust_pm
            for r in QUERIES["graph_trustrank_seeds"](
                spark, str(tmp_path)
            ).collect()
        }
        b_nodes = [k for k in out if k % 1000000 in (20, 21)]
        a_nodes = [k for k in out if k % 1000000 in (0, 1)]
        assert b_nodes and a_nodes
        assert all(out[k] == 0.0 for k in b_nodes)
        assert all(out[k] > 0.0 for k in a_nodes)

    def test_mass_conservation_order(self, spark, sf_dir):
        """Ranks are nonnegative and the seed-adjacent mass dominates:
        total trust is positive and bounded by ~1000 per-mille."""
        out = QUERIES["graph_trustrank_seeds"](spark, sf_dir).collect()
        total = sum(r.trust_pm for r in out)
        assert all(r.trust_pm >= 0 for r in out)
        assert 0 < total <= 1000.5


class TestSurvivalKm:
    def test_planted_single_step(self, spark, tmp_path):
        """10 three-hour episodes end early (observed) while 10 six-hour
        episodes run into the corpus's final day (censored): exactly one
        KM step, S(3) = 0.5, with all 20 episodes at risk at the step."""
        import datetime as dt

        rows = []
        eid = 0
        for u in range(10):  # closed episodes: Jan 5, 00:00 -> 03:00
            for h in (0, 3):
                rows.append((eid, dt.datetime(2024, 1, 5, h), u, "view", 1.0))
                eid += 1
        for u in range(10, 20):  # still-open: Jan 29, 06:00 -> 12:00
            for h in (6, 12):
                rows.append((eid, dt.datetime(2024, 1, 29, h), u, "view", 1.0))
                eid += 1
        _plant_events(spark, tmp_path, rows)
        out = QUERIES["events_survival_km"](spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.t == 3
        assert r.n_risk == 20
        assert r.n_churned == 10
        assert r.survival == pytest.approx(0.5)

    def test_curve_is_monotone(self, spark, sf_dir):
        out = sorted(
            QUERIES["events_survival_km"](spark, sf_dir).collect(),
            key=lambda r: r.t,
        )
        assert len(out) > 0
        surv = [r.survival for r in out]
        assert surv == sorted(surv, reverse=True)
        risks = [r.n_risk for r in out]
        assert risks == sorted(risks, reverse=True)
        for r in out:
            assert 0.0 <= r.survival <= 1.0


class TestClusterTopics:
    def test_planted_clusters_get_their_own_vocabulary(self, spark, tmp_path):
        """Two well-separated embedding clusters whose documents use
        disjoint vocabularies: each cluster's top terms must come from
        its own vocabulary only."""
        rows, docs = [], []
        for i in range(12):
            # cluster A near e1, cluster B near e2 (seeds 0..7 span both)
            if i % 2 == 0:
                rows.append((i, _vec([1.0, 0.01 * i]), 0))
                docs.append((i, "en", "apple banana cherry apple banana"))
            else:
                rows.append((i, _vec([0.01 * i, 1.0]), 1))
                docs.append((i, "en", "quark gluon lepton quark gluon"))
        _plant_embeddings(spark, tmp_path, rows)
        _plant_docs(spark, tmp_path, docs)
        out = QUERIES["text_cluster_topics"](spark, str(tmp_path)).collect()
        fruit = {"apple", "banana", "cherry"}
        physics = {"quark", "gluon", "lepton"}
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r.cluster, set()).add(r.term)
        for terms in by_cluster.values():
            assert terms <= fruit or terms <= physics
        # both vocabularies must surface somewhere
        all_terms = set().union(*by_cluster.values())
        assert all_terms & fruit and all_terms & physics

    def test_ranks_and_bounds(self, spark, sf_dir):
        out = QUERIES["text_cluster_topics"](spark, sf_dir).collect()
        assert len(out) > 0
        per = {}
        for r in out:
            per.setdefault(r.cluster, []).append(r.rank)
            assert r.ctfidf > 0
        for ranks in per.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))


class TestHeapsLaw:
    def test_growing_vocabulary_fits_high_beta(self, spark, tmp_path):
        """Every document introduces fresh tokens: V grows ~linearly in
        N, so the fitted exponent must be near 1."""
        docs = []
        for i in range(40):
            fresh = f"tok{2 * i} tok{2 * i + 1}"
            docs.append((i, "en", f"the and {fresh}"))
        _plant_docs(spark, tmp_path, docs)
        out = sorted(
            QUERIES["text_heaps_law"](spark, str(tmp_path)).collect(),
            key=lambda r: r.decile,
        )
        assert len(out) == 10
        vocab = [r.vocab_cum for r in out]
        assert vocab == sorted(vocab)
        assert vocab[-1] > vocab[0]
        assert out[0].beta > 0.8

    def test_saturated_corpus_reports_zero_growth(self, spark, sf_dir):
        """The synthetic corpus has a tiny closed vocabulary: every type
        appears in the first decile, so the audit must report a flat
        curve (beta ~ 0) — the 'crawl is recycling' signal."""
        out = sorted(
            QUERIES["text_heaps_law"](spark, sf_dir).collect(),
            key=lambda r: r.decile,
        )
        assert len(out) == 10
        toks = [r.tokens_cum for r in out]
        assert toks == sorted(toks) and toks[0] > 0
        assert out[0].beta == pytest.approx(out[-1].beta)
        assert abs(out[0].beta) < 0.2


class TestMatryoshkaZeroPrefix:
    def test_zero_prefix_vector_ranks_last_not_crash(self, spark, tmp_path):
        """A vector whose first-8 dims are all zero must take the -2e6
        sentinel at d=8 (ranking last) instead of raising Spark's ANSI
        divide-by-zero or DuckDB's NaN."""
        base = _vec([1.0])
        rows = [(k, [x * (k + 1.0) for x in base], 0) for k in range(12)]
        # vec 12: zero head, signal only in the tail
        rows.append((12, [0.0] * 8 + [1.0] + [0.0] * 55, 0))
        _plant_embeddings(spark, tmp_path, rows)
        out = {
            r.dim: r
            for r in QUERIES["sim_matryoshka_recall"](
                spark, str(tmp_path)
            ).collect()
        }
        assert set(out) == {8, 16, 32, 64}
        assert out[64].mean_recall10 == pytest.approx(1.0)
        for r in out.values():
            assert 0.0 <= r.mean_recall10 <= 1.0


class TestAsofNearest:
    def test_planted_directions_and_tie(self, spark, tmp_path):
        """Three clicks per pandas merge_asof(direction='nearest')
        semantics: closer-backward wins, closer-forward wins, exact tie
        goes backward; a fourth click beyond tolerance on both sides
        matches nothing."""
        import datetime as dt

        t0 = dt.datetime(2024, 1, 5, 12, 0)

        def at(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        rows = [
            # user 1: purchase 10 min before, 30 min after -> backward
            (0, at(0), 1, "click", 1.0),
            (1, at(-10), 1, "purchase", 1.0),
            (2, at(30), 1, "purchase", 1.0),
            # user 2: purchase 45 min before, 5 min after -> forward
            (3, at(0), 2, "click", 1.0),
            (4, at(-45), 2, "purchase", 1.0),
            (5, at(5), 2, "purchase", 1.0),
            # user 3: exact 20-min tie -> backward (pandas tie rule)
            (6, at(0), 3, "click", 1.0),
            (7, at(-20), 3, "purchase", 1.0),
            (8, at(20), 3, "purchase", 1.0),
            # user 4: both sides beyond the 2h tolerance -> null match
            (9, at(0), 4, "click", 1.0),
            (10, at(-150), 4, "purchase", 1.0),
            (11, at(150), 4, "purchase", 1.0),
        ]
        _plant_events(spark, tmp_path, rows)
        out = {
            r.event_id: r
            for r in QUERIES["asof_join_nearest"](
                spark, str(tmp_path)
            ).collect()
        }
        assert set(out) == {0, 3, 6, 9}
        assert out[0].direction == "backward"
        assert out[0].secs_to_nearest == pytest.approx(600.0)
        assert out[3].direction == "forward"
        assert out[3].secs_to_nearest == pytest.approx(300.0)
        assert out[6].direction == "backward"
        assert out[6].secs_to_nearest == pytest.approx(1200.0)
        assert out[9].direction is None
        assert out[9].secs_to_nearest is None

    def test_matches_pandas_merge_asof(self, spark, sf_dir):
        """Full-corpus parity with pandas.merge_asof(direction=
        'nearest') on the real sf events table — the independent
        reimplementation guard."""
        import pandas as pd

        out = (
            QUERIES["asof_join_nearest"](spark, sf_dir)
            .toPandas()
            .set_index("event_id")
            .sort_index()
        )
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
        clicks = (
            ev[ev.event_type == "click"][["event_id", "user_id", "ts"]]
            .sort_values("ts")
            .reset_index(drop=True)
        )
        purch = (
            ev[ev.event_type == "purchase"][["user_id", "ts"]]
            .sort_values("ts")
            .reset_index(drop=True)
        )
        m = pd.merge_asof(
            clicks,
            purch.rename(columns={"ts": "pts"}),
            left_on="ts",
            right_on="pts",
            by="user_id",
            direction="nearest",
            tolerance=pd.Timedelta(seconds=7200),
        ).set_index("event_id")
        got = out.secs_to_nearest.fillna(-1.0)
        want = (
            (m.ts - m.pts).dt.total_seconds().abs().round(3).fillna(-1.0)
        ).reindex(got.index)
        assert (got == want).all()


class TestNeymanAllocation:
    def test_zero_variance_stratum_gets_nothing(self, spark, tmp_path):
        """A constant-length stratum has sigma=0, so Neyman assigns it 0
        of the budget while proportional allocation still funds it by
        headcount."""
        docs = [(i, "en", "x" * 40) for i in range(100)]  # sigma = 0
        docs += [
            (100 + i, "de", "y" * (10 if i % 2 else 400)) for i in range(100)
        ]
        (
            spark.createDataFrame(docs, "doc_id long, lang string, text string")
            .withColumn(
                "source",
                F.when(F.col("lang") == "en", "const").otherwise("varied"),
            )
            .withColumn("n_chars", F.length("text").cast("long"))
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/documents.parquet")
        )
        out = {
            r.source: r
            for r in QUERIES["sample_neyman_allocation"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["const"].sd_chars == pytest.approx(0.0)
        assert out["const"].neyman_alloc == 0
        assert out["const"].prop_alloc == 500
        assert out["varied"].neyman_alloc == 1000
        assert out["varied"].sd_chars == pytest.approx(195.0)

    def test_budget_conserved_on_corpus(self, spark, sf_dir):
        """Both allocations sum to the budget up to per-stratum rounding
        slack, and sd matches an exact recompute."""
        out = QUERIES["sample_neyman_allocation"](spark, sf_dir).collect()
        n_strata = len(out)
        assert n_strata > 1
        for col in ("prop_alloc", "neyman_alloc"):
            total = sum(getattr(r, col) for r in out)
            assert abs(total - 1000) <= n_strata
        for r in out:
            assert r.sd_chars >= 0.0
