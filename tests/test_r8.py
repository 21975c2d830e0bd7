"""Planted-signal tests for the round-5 second-wave operators
(queries_r8): DSIR importance resampling, power-iteration PCA, and
graph-ANN beam search.

Oracle hash-equality (scripts/check_oracle.py) is the primary gate for
these queries; these tests pin the SEMANTICS against independent
references — the lesson from the BPE separator bug, where both engines
agreed on a wrong answer.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import target_parquet_spark.queries_r8  # noqa: F401  (registers queries)
from target_parquet_spark.queries import QUERIES


def _plant_docs(spark, tmp_path, docs):
    (
        spark.createDataFrame(docs, "doc_id long, source string, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )


class TestDsirImportance:
    def test_target_vocab_docs_outrank_background(self, spark, tmp_path):
        """Docs sharing the target domain's vocabulary must score above
        docs made of background-only vocabulary."""
        target_text = "quantum proofs entangle qubits across lattice codes"
        background = "the cat sat on the mat and looked at the dog"
        docs = (
            # the target domain itself (src0/src1)
            [(i, "src0", target_text) for i in range(10)]
            + [(i + 10, "src1", target_text) for i in range(10)]
            # candidate pool: half target-like, half background
            + [(i + 100, "src9", target_text) for i in range(5)]
            + [(i + 200, "src9", background) for i in range(5)]
        )
        _plant_docs(spark, tmp_path, docs)
        out = QUERIES["sample_dsir_importance"](spark, str(tmp_path)).collect()
        score = {r.doc_id: r.llr_micro for r in out}
        targetlike = [score[i + 100] for i in range(5)]
        backgroundish = [score[i + 200] for i in range(5)]
        assert min(targetlike) > max(backgroundish)

    def test_scores_are_exact_integer_sums(self, spark, sf_dir):
        """Deterministic across repeated runs (integer-cents sums)."""
        a = QUERIES["sample_dsir_importance"](spark, sf_dir).collect()
        b = QUERIES["sample_dsir_importance"](spark, sf_dir).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert len(a) > 0
        assert all(isinstance(r.llr_micro, int) for r in a)


class TestPcaPowerIteration:
    def test_matches_numpy_dominant_eigenvector(self, spark, tmp_path):
        """On a corpus with a strongly dominant direction, two power
        rounds must align with numpy's top eigenvector of X^T X."""
        rng = np.random.default_rng(7)
        axis = rng.normal(size=64)
        axis /= np.linalg.norm(axis)
        rows = []
        for i in range(300):
            # strong component along `axis`, weak isotropic noise
            x = (5.0 + 0.1 * (i % 7)) * axis + 0.05 * rng.normal(size=64)
            if i % 2:
                x = -x  # sign flips don't move the principal direction
            rows.append((i, [float(v) for v in x], int(i % 3)))
        (
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/embeddings.parquet")
        )
        from target_parquet_spark.queries_r8 import pca_power_component

        v = np.array(pca_power_component(spark, str(tmp_path)))
        X = np.array([r[1] for r in rows], dtype=np.float64)
        w, vecs = np.linalg.eigh(X.T @ X)
        top = vecs[:, -1]
        cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
        assert cos > 0.99

    def test_component_is_unit_norm(self, spark, sf_dir):
        from target_parquet_spark.queries_r8 import pca_power_component

        v = np.array(pca_power_component(spark, sf_dir))
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # 6dp quantization slack


class TestGraphAnnSearch:
    @pytest.fixture(scope="class")
    def result(self, spark, sf_dir):
        return QUERIES["sim_graph_ann_search"](spark, sf_dir).collect()

    def test_ranking_is_monotone_and_bounded(self, result):
        from target_parquet_spark.queries_r8 import _ANN_K

        by_q = {}
        for r in result:
            by_q.setdefault(r.qid, []).append(r)
        assert by_q, "query stratum must be non-empty"
        for rows in by_q.values():
            rows.sort(key=lambda r: r.rk)
            assert len(rows) <= _ANN_K
            assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
            scores = [r.score for r in rows]
            assert scores == sorted(scores, reverse=True)

    def test_beam_never_worse_than_entry(self, spark, sf_dir, result):
        """The rank-1 hit must score >= the entry node itself: beam
        search keeps the frontier it started from."""
        from target_parquet_spark.operators import similarity as S
        from target_parquet_spark.queries_ext import td
        from target_parquet_spark.queries_r6 import _symmetrize_degrees
        from target_parquet_spark.queries_r7 import knn_edge_artifact

        sym, _ = _symmetrize_degrees(knn_edge_artifact(spark, sf_dir))
        entry = sym.agg(F.min("u")).collect()[0][0]
        emb = td(spark, sf_dir, "embeddings")
        e = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()
        }
        best = {r.qid: r.score for r in result if r.rk == 1}
        for qid, sc in best.items():
            q, n = e[qid], e[entry]
            entry_score = round(
                float(q @ n) / (np.linalg.norm(q) * np.linalg.norm(n)), 6
            )
            assert sc >= entry_score - 1e-9

    def test_returned_nodes_are_graph_nodes(self, spark, sf_dir, result):
        from target_parquet_spark.queries_r6 import _symmetrize_degrees
        from target_parquet_spark.queries_r7 import knn_edge_artifact

        sym, _ = _symmetrize_degrees(knn_edge_artifact(spark, sf_dir))
        nodes = {r.u for r in sym.select("u").distinct().collect()}
        assert {r.node for r in result} <= nodes


class TestBigramLogprob:
    def test_heldout_gibberish_scores_below_fluent(self, spark, tmp_path):
        """A held-out doc repeating TRAINED bigrams must outscore a
        held-out doc of unseen bigrams (backoff must actually fire)."""
        fluent = "the quick brown fox jumps over the lazy dog"
        docs = (
            # training half (even ids): fluent text
            [(2 * i, "train", fluent) for i in range(10)]
            # held-out probes (odd ids), one per source
            + [(21, "seen", fluent)]
            + [(23, "unseen", "zxq wvv qqj kkx vbn mmz ppw rrt yyu iio")]
        )
        _plant_docs(spark, tmp_path, docs)
        out = {
            r.source: r
            for r in QUERIES["text_bigram_logprob"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["seen"].mean_logprob > out["unseen"].mean_logprob
        # the unseen doc is exactly the perplexity-flag case
        assert out["unseen"].n_flagged == 1
        assert out["seen"].n_flagged == 0

    def test_observed_bigram_probability_is_mle(self, spark, tmp_path):
        """One training doc 'a b a b a' -> P(b|a)=2/3 (c(ab)=2, c(a)=3);
        a held-out doc 'a b' must score ln(2/3) exactly (in micro)."""
        import math

        docs = [(0, "train", "a b a b a"), (1, "probe", "a b")]
        _plant_docs(spark, tmp_path, docs)
        out = {
            r.source: r
            for r in QUERIES["text_bigram_logprob"](
                spark, str(tmp_path)
            ).collect()
        }
        want = round(math.log(2 / 3), 4)
        assert abs(out["probe"].mean_logprob - want) < 1e-3


class TestShardAssignment:
    def test_partition_is_total_and_deterministic(self, spark, sf_dir):
        out = QUERIES["sample_shard_assignment"](spark, sf_dir).collect()
        from target_parquet_spark.queries_ext import td

        n_total = td(spark, sf_dir, "documents").count()
        assert sum(r.n_docs for r in out) == n_total
        assert all(0 <= r.shard < 16 for r in out)
        again = QUERIES["sample_shard_assignment"](spark, sf_dir).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


class TestPcaDeflation:
    def test_top2_match_numpy_and_are_orthogonal(self, spark, tmp_path):
        """Two planted orthogonal axes with distinct strengths: the
        deflated pair must match numpy's top-2 eigenvectors of X^T X
        and be mutually orthogonal."""
        rng = np.random.default_rng(11)
        a1 = rng.normal(size=64); a1 /= np.linalg.norm(a1)
        a2 = rng.normal(size=64); a2 -= (a2 @ a1) * a1
        a2 /= np.linalg.norm(a2)
        rows = []
        for i in range(400):
            sign1 = -1.0 if i % 2 else 1.0
            sign2 = -1.0 if i % 3 == 0 else 1.0
            x = (
                6.0 * sign1 * a1
                + 2.0 * sign2 * a2
                + 0.05 * rng.normal(size=64)
            )
            rows.append((i, [float(v) for v in x], int(i % 3)))
        (
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/embeddings.parquet")
        )
        from target_parquet_spark.queries_r8 import pca_top2_components

        v1, v2 = (np.array(v) for v in pca_top2_components(spark, str(tmp_path)))
        X = np.array([r[1] for r in rows], dtype=np.float64)
        _w, vecs = np.linalg.eigh(X.T @ X)
        t1, t2 = vecs[:, -1], vecs[:, -2]

        def cos(u, w):
            return abs(float(u @ w) / (np.linalg.norm(u) * np.linalg.norm(w)))

        assert cos(v1, t1) > 0.98
        assert cos(v2, t2) > 0.98
        assert abs(float(v1 @ v2)) < 1e-3


class TestLpaCommunities:
    def test_bridged_cliques_stay_two_communities(self, spark):
        """Two 4-cliques joined by ONE bridge edge: majority propagation
        keeps them separate (the property that distinguishes communities
        from connected components, which would merge them)."""
        from target_parquet_spark.operators.graph import lpa_communities

        edges = []
        for base in (0, 4):
            for i in range(4):
                for j in range(4):
                    if i != j:
                        edges.append((base + i, base + j))
        edges += [(3, 4), (4, 3)]  # the bridge
        sym = spark.createDataFrame(edges, "u long, v long")
        out = lpa_communities(sym, rounds=3).collect()
        comm = {}
        for r in out:
            comm.setdefault(r.lbl, set()).add(r.node)
        assert len(comm) == 2
        assert sorted(len(m) for m in comm.values()) == [4, 4]
        groups = sorted(tuple(sorted(m)) for m in comm.values())
        assert groups == [(0, 1, 2, 3), (4, 5, 6, 7)]

    def test_self_loop_node_keeps_own_label(self, spark):
        """A node whose only edge is a self-loop keeps its own label
        (truly isolated nodes are absent from the output — documented)."""
        from target_parquet_spark.operators.graph import lpa_communities

        sym = spark.createDataFrame(
            [(1, 2), (2, 1), (9, 9)], "u long, v long"
        )
        out = {r.node: r.lbl for r in lpa_communities(sym, rounds=2).collect()}
        assert out[9] == 9
        assert 42 not in out  # absent nodes stay absent


class TestTextrankKeywords:
    def test_hub_word_ranks_first(self, spark, tmp_path):
        """A word co-occurring with many distinct partners must outrank
        words that only pair with the hub (degree centrality under
        uniform weights)."""
        partners = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        docs = [
            (i, "s", " ".join(f"hubword {p}" for p in partners))
            for i in range(4)
        ]
        _plant_docs(spark, tmp_path, docs)
        out = QUERIES["text_textrank_keywords"](spark, str(tmp_path)).collect()
        ranked = sorted(out, key=lambda r: -r.rank_pm)
        assert ranked[0].keyword == "hubword"
        assert ranked[0].rank_pm > ranked[1].rank_pm


class TestEmbeddingStandardize:
    def test_wellconditioned_corpus_znorm_near_dim(self, spark, sf_dir):
        out = QUERIES["sim_embedding_standardize"](spark, sf_dir).collect()
        assert out
        for r in out:
            assert 0.8 * 64 <= r.mean_znorm2 <= 1.2 * 64

    def test_collapsed_dimension_is_guarded(self, spark, tmp_path):
        """A constant (zero-variance) dimension must contribute 0, not
        NaN-poison the norm."""
        rows = [
            (i, [float(i % 7)] * 32 + [5.0] + [float((i * 3) % 5)] * 31, 0)
            for i in range(50)
        ]
        (
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/embeddings.parquet")
        )
        out = QUERIES["sim_embedding_standardize"](
            spark, str(tmp_path)
        ).collect()
        assert len(out) == 1
        import math

        assert math.isfinite(out[0].mean_znorm2)


class TestLeakageSafeSplit:
    def test_no_pair_straddles_the_cut(self, spark, sf_dir):
        """THE guarantee: every near-dup candidate pair has both ends on
        the same side of the split."""
        from target_parquet_spark.operators import dedup as D
        from target_parquet_spark.queries_ext import (
            _spark_corpus,
            corpus_components,
        )
        from target_parquet_spark.queries_ops import _hash_mod

        corpus = _spark_corpus(spark, sf_dir)
        pairs = D.minhash_lsh_pairs(
            corpus, "text", "doc_id", n_hashes=8, bands=4, threshold=0.5
        )
        _c, comp0 = corpus_components(spark, sf_dir)
        comp = comp0.select(
            F.col("node").alias("doc_id"), F.col("component").alias("grp")
        )
        asg = (
            corpus.select("doc_id")
            .join(comp, "doc_id", "left")
            .select("doc_id", F.coalesce("grp", F.col("doc_id")).alias("grp"))
        )
        side = asg.select(
            "doc_id", (_hash_mod(F.col("grp"), 10) < 8).alias("is_train")
        )
        a = side.select(
            F.col("doc_id").alias("id_a"), F.col("is_train").alias("ta")
        )
        b = side.select(
            F.col("doc_id").alias("id_b"), F.col("is_train").alias("tb")
        )
        straddling = (
            pairs.join(a, "id_a").join(b, "id_b")
            .filter(F.col("ta") != F.col("tb"))
            .count()
        )
        assert straddling == 0
        assert pairs.count() > 0  # the guarantee is not vacuous

    def test_both_splits_populated(self, spark, sf_dir):
        out = {r.split: r for r in QUERIES["split_leakage_safe"](
            spark, sf_dir
        ).collect()}
        assert set(out) == {"train", "heldout"}
        assert out["train"].n_docs > out["heldout"].n_docs > 0


class TestDedupThresholdSweep:
    def test_curve_is_monotone_and_anchored(self, spark, sf_dir):
        out = sorted(
            QUERIES["dedup_threshold_sweep"](spark, sf_dir).collect(),
            key=lambda r: r.threshold,
        )
        assert [round(r.threshold, 2) for r in out] == [
            0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9
        ]
        n = [r.n_pairs for r in out]
        p = [r.n_planted for r in out]
        assert n == sorted(n, reverse=True)  # volume shrinks with the cut
        assert p == sorted(p, reverse=True)
        assert p[0] > 0 and n[0] >= p[0]


class TestMinkprobMembership:
    def test_members_outscore_nonmembers(self, spark, tmp_path):
        """Verbatim training docs must have a higher min-K logprob than
        their token-reversals (whose bigrams the LM never saw)."""
        fluent = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = [(i * 50, "s", fluent) for i in range(4)] + [
            (i * 50 + 1, "s", fluent) for i in range(4)
        ]
        _plant_docs(spark, tmp_path, docs)
        out = {
            r.probe_group: r
            for r in QUERIES["text_minkprob_membership"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["member"].n_probes == 4
        assert out["nonmember"].n_probes == 4
        assert (
            out["member"].mean_minkprob
            > out["nonmember"].mean_minkprob + 1.0
        )

    def test_direction_holds_on_real_corpus(self, spark, sf_dir):
        out = {
            r.probe_group: r.mean_minkprob
            for r in QUERIES["text_minkprob_membership"](
                spark, sf_dir
            ).collect()
        }
        assert out["member"] >= out["nonmember"]


class TestSparkRoundReplay:
    """_spark_round must replay F.round(double, scale) bit-for-bit —
    the PCA training loop quantizes its model state driver-side with it
    (one Spark action per round instead of three)."""

    def test_spark_round_matches_f_round(self, spark):
        import random

        from target_parquet_spark.queries_r8 import _spark_round

        rng = random.Random(80310)
        vals = []
        # magnitudes the PCA path sees: 6dp components in [-1, 1] and
        # micro-scaled squares up to ~1e17 (past 2^53)
        for _ in range(300):
            vals.append(rng.uniform(-1.0, 1.0))
            vals.append(rng.uniform(-1e6, 1e6))
            vals.append(rng.uniform(-1e17, 1e17))
        # adversarial: exact half-boundaries at both scales and
        # shortest-repr stress values one ulp off a boundary
        for k in range(-50, 51):
            vals.append(k * 1e-6 + 5e-7)
            vals.append(float(k) + 0.5)
            import math as m

            vals.append(m.nextafter(k * 1e-6 + 5e-7, m.inf))
            vals.append(m.nextafter(k * 1e-6 + 5e-7, -m.inf))
        for scale in (0, 6):
            df = spark.createDataFrame([(v,) for v in vals], "x double")
            got = [
                r[0]
                for r in df.select(F.round("x", scale)).collect()
            ]
            want = [_spark_round(v, scale) for v in vals]
            assert got == want, [
                (v, g, w) for v, g, w in zip(vals, got, want) if g != w
            ][:5]

    def test_pca_component_unchanged_by_driver_quantization(self, spark, sf_dir):
        """The trained v after the driver-side rewrite must equal the
        all-Spark quantization path it replaced, element for element."""
        from target_parquet_spark.queries_r8 import (
            _PCA_ROUNDS,
            _V0,
            pca_power_component,
            td,
        )
        from target_parquet_spark.operators import similarity as S

        v_new = pca_power_component(spark, sf_dir)
        # replay the OLD path: local 64-row frame + Spark round
        emb = td(spark, sf_dir, "embeddings").select("embedding")
        v = list(_V0)
        for _ in range(_PCA_ROUNDS):
            lit_v = F.array(*[F.lit(x) for x in v])
            d = S.dot(F.col("embedding"), lit_v)
            ex = emb.select(
                d.alias("d"), F.posexplode("embedding").alias("j", "x")
            )
            r = ex.groupBy("j").agg(
                F.sum(
                    F.round(
                        (F.col("d") * F.col("x").cast("double")) * 1000000
                    ).cast("long")
                ).alias("s")
            )
            s_rows = [(int(row["j"]), int(row["s"])) for row in r.collect()]
            loc = spark.createDataFrame(s_rows, "j long, s long")
            nrm = loc.agg(
                F.sqrt(
                    F.sum(
                        F.round(
                            ((F.col("s") / 1000000.0) * (F.col("s") / 1000000.0))
                            * 1000000
                        ).cast("long")
                    )
                    / 1000000.0
                ).alias("n")
            ).collect()[0]["n"]
            rows = (
                loc.select(
                    "j",
                    F.round(F.col("s") / 1000000.0 / F.lit(nrm), 6).alias("v"),
                )
                .orderBy("j")
                .collect()
            )
            v = [float(row["v"]) for row in rows]
        assert v_new == v
