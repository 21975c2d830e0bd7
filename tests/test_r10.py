"""Planted-signal tests for the round-5 fourth-wave operators
(queries_r10): HITS over the k-NN graph, RRF hybrid retrieval,
binary-quantized Hamming ANN, and the Bayesian A/B read-out.

Oracle hash-equality (scripts/check_oracle.py) is the primary gate;
these tests pin SEMANTICS against independently-constructed inputs and
independent Python replicas (the BPE-separator lesson: both engines can
agree on a wrong answer).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

import target_parquet_spark.queries_r10  # noqa: F401  (registers queries)
from target_parquet_spark.queries import QUERIES


def _vec(head, dim=64):
    return [float(x) for x in head] + [0.0] * (dim - len(head))


def _plant_embeddings(spark, tmp_path, rows):
    (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/embeddings.parquet")
    )


class TestHitsOperator:
    def _py_hits(self, edges, iters):
        """Independent integer-micro HITS replica."""
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        hub = {n: 1000000 for n in nodes}
        auth = {n: 0 for n in nodes}

        def half(scores, forward):
            raw = {n: 0 for n in nodes}
            for u, v in edges:
                if forward:
                    raw[v] += scores[u]
                else:
                    raw[u] += scores[v]
            s = sum(raw.values())
            if s <= 0:
                return {n: 0 for n in nodes}
            # floor(x+0.5) = SQL half-up round for positives
            return {
                n: math.floor(raw[n] * 1000000.0 / s + 0.5) for n in nodes
            }

        for _ in range(iters):
            auth = half(hub, True)
            hub = half(auth, False)
        return hub, auth

    def test_matches_python_replica_exactly(self, spark):
        from target_parquet_spark.operators.graph import hits

        edges = [
            (1, 10),
            (2, 10),
            (3, 10),
            (1, 11),
            (2, 11),
            (10, 20),
            (11, 20),
            (20, 1),
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {
            r.node: (r.hub_micro, r.auth_micro)
            for r in hits(df, iters=3).collect()
        }
        hub, auth = self._py_hits(edges, 3)
        assert out == {n: (hub[n], auth[n]) for n in hub}

    def test_pure_hub_and_pure_authority(self, spark):
        """A node with only out-edges has auth 0; one with only
        in-edges has hub 0; the shared target dominates authority."""
        from target_parquet_spark.operators.graph import hits

        edges = [(1, 9), (2, 9), (3, 9), (1, 8)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {
            r.node: (r.hub_micro, r.auth_micro)
            for r in hits(df, iters=2).collect()
        }
        assert out[9][0] == 0 and out[9][1] > out[8][1]
        for n in (1, 2, 3):
            assert out[n][1] == 0
        assert out[1][0] > out[2][0]  # node 1 points at both targets

    def test_corpus_mass_conserved(self, spark, sf_dir):
        out = QUERIES["graph_hits_knn"](spark, sf_dir).collect()
        n = len(out)
        assert n > 0
        for col in ("hub_micro", "auth_micro"):
            tot = sum(getattr(r, col) for r in out)
            # each node's score is individually rounded: n/2 max drift
            assert abs(tot - 1000000) <= max(n, 2)
            assert all(getattr(r, col) >= 0 for r in out)


class TestRrfHybrid:
    def test_fused_score_recomputes(self, spark, sf_dir):
        """rrf_micro is exactly the sum of the two quantized rank
        terms, and the output is the top-20 by fused score."""
        out = QUERIES["sim_rrf_hybrid"](spark, sf_dir).collect()
        assert 0 < len(out) <= 20

        def term(rank):
            if rank is None:
                return 0
            return math.floor(1000000.0 / (60 + rank) + 0.5)

        for r in out:
            assert r.rrf_micro == term(r.lex_rank) + term(r.dense_rank)
            assert r.doc_id != 0  # probe doc held out
        scores = [r.rrf_micro for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_doc_in_both_lists_beats_single_list_docs(self, spark, sf_dir):
        """Any doc present in both rankings at depth d outranks every
        doc whose single rank is worse than d in its only list —
        the fusion property RRF exists for."""
        out = QUERIES["sim_rrf_hybrid"](spark, sf_dir).collect()
        both = [r for r in out if r.lex_rank and r.dense_rank]
        only = [r for r in out if (r.lex_rank is None) != (r.dense_rank is None)]
        if both and only:
            best_both = max(r.rrf_micro for r in both)
            lone_rank_1 = math.floor(1000000.0 / 61 + 0.5)
            # a doc ranked 1 in a single list can never beat a doc
            # ranked <=30 in both lists
            top = [r for r in both if r.lex_rank <= 30 and r.dense_rank <= 30]
            for r in top:
                assert r.rrf_micro > lone_rank_1 or best_both > lone_rank_1


class TestBinaryHammingAnn:
    def test_planted_sign_flips_count_exactly(self, spark, tmp_path):
        """Vectors constructed at known Hamming distances from the
        probe's sign mask come back in flip-count order."""
        base = [1.0] * 64
        rows = [(0, [float(x) for x in base], 0)]
        for k in (1, 2, 3, 17, 40):
            v = list(base)
            for i in range(k):
                v[i] = -1.0
            rows.append((k, [float(x) for x in v], 0))
        _plant_embeddings(spark, tmp_path, rows)
        out = QUERIES["sim_binary_hamming_ann"](
            spark, str(tmp_path)
        ).collect()
        got = {r.vec_id: r.hamming for r in out}
        assert got == {1: 1, 2: 2, 3: 3, 17: 17, 40: 40}

    def test_matches_numpy_replica_on_corpus(self, spark, sf_dir):
        """Top-10 (hamming, vec_id) matches an independent numpy
        sign-pack + popcount replica on the real embeddings."""
        import numpy as np

        out = [
            (r.hamming, r.vec_id)
            for r in QUERIES["sim_binary_hamming_ann"](
                spark, sf_dir
            ).collect()
        ]
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        )
        vecs = {r.vec_id: np.array(r.embedding) for r in emb}
        qbits = vecs[0] > 0
        dist = sorted(
            (int(np.sum((v > 0) != qbits)), vid)
            for vid, v in vecs.items()
            if vid != 0
        )
        assert out == dist[:10]

    def test_zero_dims_pack_as_zero_bits(self, spark, tmp_path):
        """A 0.0 dim is NOT positive — it lands on the 0 side of the
        sign split in both engines (the x > 0 convention)."""
        rows = [
            (0, _vec([1.0] * 8), 0),  # probe: 8 one-bits
            (1, _vec([0.0] * 8), 0),  # all-zero: 8 flips from probe
        ]
        _plant_embeddings(spark, tmp_path, rows)
        out = {
            r.vec_id: r.hamming
            for r in QUERIES["sim_binary_hamming_ann"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out == {1: 8}


class TestBayesianAb:
    @staticmethod
    def _arm(user_id):
        return int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16) % 2

    def test_planted_lift_detected(self, spark, tmp_path):
        """Arm-1 users convert at 90%, arm-0 at 10%: exact posterior
        counts and P(B beats A) ~ 1."""
        import datetime as dt

        rows = []
        eid = 0
        per_arm = {0: [], 1: []}
        for u in range(200):
            per_arm[self._arm(u)].append(u)
        conv = {0: 0, 1: 0}
        for arm, users in per_arm.items():
            rate = 0.9 if arm == 1 else 0.1
            n_conv = int(len(users) * rate)
            conv[arm] = n_conv
            for i, u in enumerate(users):
                rows.append(
                    (eid, dt.datetime(2024, 1, 5, 8), u, "view", 1.0)
                )
                eid += 1
                if i < n_conv:
                    rows.append(
                        (eid, dt.datetime(2024, 1, 5, 9), u, "purchase", 1.0)
                    )
                    eid += 1
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        r = QUERIES["events_bayesian_ab"](spark, str(tmp_path)).collect()[0]
        assert r.n_a == len(per_arm[0]) and r.n_b == len(per_arm[1])
        assert r.conv_a == conv[0] and r.conv_b == conv[1]
        assert r.post_mean_a == pytest.approx(
            (conv[0] + 1) / (r.n_a + 2), abs=1e-4
        )
        assert r.p_b_beats_a > 0.99
        assert r.z_score > 3

    def test_aa_on_corpus_is_calibrated(self, spark, sf_dir):
        """The hash split is an A/A test on the real corpus: the
        posterior means agree to a few points and p hovers near 0.5."""
        r = QUERIES["events_bayesian_ab"](spark, sf_dir).collect()[0]
        assert r.n_a > 0 and r.n_b > 0
        assert 0.0 <= r.p_b_beats_a <= 1.0
        assert abs(r.p_b_beats_a - 0.5) < 0.45  # not a degenerate 0/1
        assert 0.0 <= r.post_mean_a <= 1.0 and 0.0 <= r.post_mean_b <= 1.0


class TestSemDedup:
    def test_planted_twin_drops_clone_keeps_original(self, spark, tmp_path):
        """An exact twin pair ties on centroid rank, so the lower id
        survives and the clone is dropped; a lone far vector without a
        near-duplicate is kept even when it shares the cluster."""
        rows = [
            (0, _vec([1.0, 1.0, 1.0, 1.0]), 0),
            (3, _vec([1.0, 1.0, 1.0, 1.0]), 0),  # exact twin of 0
            (7, _vec([5.0, 0.1, 0.1, 0.1]), 0),  # no near-dup anywhere
        ]
        _plant_embeddings(spark, tmp_path, rows)
        out = {
            r.vec_id: r for r in QUERIES["dedup_semdedup"](
                spark, str(tmp_path)
            ).collect()
        }
        # the query self-plants a twin of every vec_id % 3 == 0
        assert out[0].keep and not out[1000000].keep
        assert out[7].keep
        assert not out[3].keep or out[3].cos_centroid != out[0].cos_centroid

    def test_diversity_rule_keeps_farthest_from_centroid(self, spark, tmp_path):
        """Two near-duplicates, one pulled toward the cluster centroid
        by a crowd of identical vectors: the far one must be kept
        regardless of id order."""
        crowd = [(i, _vec([1.0, 0.0, 0.0]), 0) for i in range(10, 20)]
        # near-dup pair (cos > 0.97 to each other), ids chosen so the
        # CLOSER-to-centroid one has the LOWER id — the diversity rule
        # must override the id tie-break
        pair = [
            (1, _vec([1.0, 0.12, 0.0]), 0),   # closer to the crowd
            (2, _vec([1.0, 0.24, 0.0]), 0),   # farther from the crowd
        ]
        _plant_embeddings(spark, tmp_path, crowd + pair)
        out = {
            r.vec_id: r
            for r in QUERIES["dedup_semdedup"](
                spark, str(tmp_path)
            ).collect()
        }

        # the keep rule applies only to candidate pairs: same cluster
        # AND a shared fine sub-bucket (either of the two families)
        def _bucket(vec, planes):
            return "".join(
                "1" if sum(a * b for a, b in zip(vec, p)) > 0 else "0"
                for p in planes
            )

        from target_parquet_spark.operators.similarity import plane_weights

        v1, v2 = _vec([1.0, 0.12, 0.0]), _vec([1.0, 0.24, 0.0])
        shares_sub = any(
            _bucket(v1, plane_weights(8, 64, table=tb))
            == _bucket(v2, plane_weights(8, 64, table=tb))
            for tb in (1, 2)
        )
        if out[1].cluster == out[2].cluster and shares_sub:
            assert out[2].keep and not out[1].keep

    def test_corpus_keep_counts(self, spark, sf_dir):
        """Every self-planted twin group loses at least its clone; keeps
        are a strict subset and every cluster retains >= 1 member."""
        out = QUERIES["dedup_semdedup"](spark, sf_dir).collect()
        clones = [r for r in out if r.vec_id >= 1000000]
        assert clones and all(not r.keep for r in clones)
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r.cluster, []).append(r.keep)
        for ks in by_cluster.values():
            assert any(ks)


class TestSemDedupScaled:
    def test_planted_twins_and_adaptive_granularity(self, spark, sf_dir):
        """The adaptive twin must honor the same contract as the fixed
        form: every self-planted exact clone shares every bucket at
        every level with its original, ties on centroid rank, loses the
        vec_id tie-break, and is dropped; every cluster keeps >= 1
        member.  Also pins that BOTH granularity levels actually adapt:
        plane counts must follow planes_for(n) for this corpus size."""
        import math

        from target_parquet_spark.operators.similarity import planes_for

        out = QUERIES["dedup_semdedup_scaled"](spark, sf_dir).collect()
        clones = [r for r in out if r.vec_id >= 1000000]
        assert clones and all(not r.keep for r in clones)
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r.cluster, []).append(r.keep)
        for ks in by_cluster.values():
            assert any(ks)
        # the coarse cell id width IS the plane count — it must match
        # the adaptive formula for the augmented corpus size, and the
        # formula must move with n (the fixed twin's frozen-granularity
        # hazard is exactly what this pins against)
        n = len(out)
        width = len(out[0].cluster)
        assert width == planes_for(n, 1024, floor=3)
        assert planes_for(n * 1024, 1024, floor=3) > planes_for(
            1024 * 2, 1024, floor=3
        )
        assert planes_for(2 ** 40, 96) == 24  # cap
        # clones are exactly 1/4 of the augmented corpus and all drop;
        # natural near-dups above 0.97 cosine are rare in the synthetic
        # embeddings, so the keep ratio must sit near 0.75 (the earlier
        # abs_tol=1.0 band accepted any ratio — review r6)
        assert math.isclose(
            sum(1 for r in out if r.keep) / n, 0.75, abs_tol=0.05
        )


class TestMsprtMonitor:
    def test_aa_never_rejects_and_is_cumulative(self, spark, sf_dir):
        out = sorted(
            QUERIES["events_msprt_monitor"](spark, sf_dir).collect(),
            key=lambda r: r.day,
        )
        assert len(out) > 3
        assert all(not r.reject for r in out)  # A/A calibration
        ns = [(r.n_a, r.n_b) for r in out]
        assert ns == sorted(ns)  # cumulative counts are monotone
        for r in out:
            assert r.log_lambda <= 0.1  # near the null, Lambda ~ small

    def test_planted_effect_crosses_boundary(self, spark, tmp_path):
        """Arm 1 spends 10x arm 0 every day for 10 days: log Lambda
        must cross ln(20) while the A/A invariant above stays green."""
        import datetime as dt
        import hashlib

        def arm(u):
            return int(
                hashlib.md5(str(u).encode()).hexdigest()[:8], 16
            ) % 2

        rows, eid = [], 0
        for day in range(1, 11):
            for u in range(80):
                val = 50.0 if arm(u) == 1 else 5.0
                # deterministic per-user jitter so variance > 0
                val += (u % 7) * 0.5
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 9), u, "view", val)
                )
                eid += 1
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        out = sorted(
            QUERIES["events_msprt_monitor"](spark, str(tmp_path)).collect(),
            key=lambda r: r.day,
        )
        assert out[-1].reject
        assert out[-1].mean_diff == pytest.approx(45.0, abs=2.0)
        lams = [r.log_lambda for r in out]
        assert lams[-1] > lams[0]  # evidence accumulates


class TestMannWhitney:
    def test_matches_scipy_free_replica(self, spark, tmp_path):
        """Exact U and tie-corrected z against an independent pure-
        Python rank computation on planted spends."""
        import datetime as dt
        import hashlib
        import math as m

        def arm(u):
            return int(
                hashlib.md5(str(u).encode()).hexdigest()[:8], 16
            ) % 2

        spends = {u: float(10 + (u * 13) % 40) for u in range(60)}
        # force heavy ties
        for u in range(0, 60, 3):
            spends[u] = 25.0
        rows = [
            (u, dt.datetime(2024, 1, 5, 9), u, "view", spends[u])
            for u in range(60)
        ]
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        r = QUERIES["events_mann_whitney"](spark, str(tmp_path)).collect()[0]
        # independent replica
        vals = sorted((int(round(v * 100)), arm(u)) for u, v in spends.items())
        n = len(vals)
        n_b = sum(1 for _, a in vals if a == 1)
        n_a = n - n_b
        ranks, i = {}, 0
        items = [v for v, _ in vals]
        while i < n:
            j = i
            while j < n and items[j] == items[i]:
                j += 1
            avg = (i + 1 + j) / 2.0
            ranks[items[i]] = avg
            i = j
        r_b = sum(ranks[v] for v, a in vals if a == 1)
        u_b = r_b - n_b * (n_b + 1) / 2.0
        tie3 = 0
        for v in set(items):
            c = items.count(v)
            tie3 += c**3 - c
        mean_u = n_a * n_b / 2.0
        var_u = n_a * n_b / 12.0 * ((n + 1) - tie3 / (n * (n - 1.0)))
        assert r.n_a == n_a and r.n_b == n_b
        assert r.u_stat == pytest.approx(u_b, abs=0.05)
        assert r.z == pytest.approx((u_b - mean_u) / m.sqrt(var_u), abs=1e-3)

    def test_corpus_p_is_calibrated(self, spark, sf_dir):
        r = QUERIES["events_mann_whitney"](spark, sf_dir).collect()[0]
        assert r.n_a > 0 and r.n_b > 0
        assert 0.0 <= r.p_two_sided_approx <= 1.0
        assert r.p_two_sided_approx > 0.01  # A/A split: no real effect


class TestKcore:
    def test_matches_python_peel_on_corpus(self, spark, sf_dir):
        """Independent replica: peel the (oracle-checked) k-NN edge
        list in pure Python and compare the surviving core set."""
        edges = [
            (r.src, r.nbr)
            for r in QUERIES["sim_knn_graph"](spark, sf_dir).collect()
        ]
        sym = set()
        for u, v in edges:
            sym.add((u, v))
            sym.add((v, u))
        active = {u for u, _ in sym}
        first_deg = None
        for _ in range(4):
            deg = {}
            for u, v in sym:
                if u in active and v in active:
                    deg[u] = deg.get(u, 0) + 1
            if first_deg is None:
                first_deg = dict(deg)
            active = {n for n, d in deg.items() if d >= 3}
        out = QUERIES["graph_kcore"](spark, sf_dir).collect()
        got_core = {r.vec_id for r in out if r.in_core}
        assert got_core == active
        for r in out:
            assert r.initial_degree == first_deg.get(r.vec_id, 0)

    def test_peel_reached_fixpoint(self, spark, sf_dir):
        """One extra Python round after the 4 replayed rounds changes
        nothing — the fixed round count is sufficient on this corpus
        (the docstring's convergence claim)."""
        edges = [
            (r.src, r.nbr)
            for r in QUERIES["sim_knn_graph"](spark, sf_dir).collect()
        ]
        sym = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
        active = {u for u, _ in sym}
        sets = []
        for _ in range(5):
            deg = {}
            for u, v in sym:
                if u in active and v in active:
                    deg[u] = deg.get(u, 0) + 1
            active = {n for n, d in deg.items() if d >= 3}
            sets.append(frozenset(active))
        assert sets[3] == sets[4]


class TestBootstrapCi:
    @staticmethod
    def _w(user_id, b):
        u = (
            int(
                hashlib.md5(f"{user_id}:{b}".encode()).hexdigest()[:8], 16
            )
            / 4294967296.0
        )
        cdf = (
            0.36787944117144233,
            0.7357588823428847,
            0.9196986029286058,
            0.9810118431238462,
            0.9963401531726563,
            0.9994058151824183,
            0.9999167588507119,
        )
        for k, c in enumerate(cdf):
            if u < c:
                return k
        return 7

    def test_matches_python_replica(self, spark, tmp_path):
        import datetime as dt

        spends = {u: 10.0 + (u * 7) % 50 for u in range(100)}
        rows = [
            (u, dt.datetime(2024, 1, 5, 9), u, "view", spends[u])
            for u in range(100)
        ]
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        r = QUERIES["events_bootstrap_ci"](spark, str(tmp_path)).collect()[0]
        cents = {u: int(round(v * 100)) for u, v in spends.items()}
        means = []
        for b in range(32):
            sv = sum(self._w(u, b) * cents[u] for u in cents)
            sw = sum(self._w(u, b) for u in cents)
            if sw > 0:
                means.append(sv / sw / 100.0)
        means.sort()
        assert r.n_users == 100 and r.n_replicates == 32
        assert r.mean_obs == pytest.approx(
            sum(cents.values()) / 100 / 100.0, abs=1e-4
        )
        assert r.ci_lo == pytest.approx(means[0], abs=1e-4)
        assert r.ci_hi == pytest.approx(means[-1], abs=1e-4)

    def test_ci_brackets_mean_on_corpus(self, spark, sf_dir):
        r = QUERIES["events_bootstrap_ci"](spark, sf_dir).collect()[0]
        assert r.ci_lo < r.ci_hi
        assert r.ci_lo <= r.mean_obs <= r.ci_hi


class TestPropensityMatch:
    def test_matches_python_replica(self, spark, tmp_path):
        """Full pipeline replica: propensity from the literal weights,
        banded caliper match, argmin(gap, control_id) — pairs must agree
        exactly on planted events."""
        import datetime as dt
        import math as m

        rows, eid = [], 0
        # users 0..9 treated (first event signup), 10..39 controls with
        # varied activity so propensities spread
        for u in range(40):
            first = "signup" if u < 10 else "view"
            rows.append((eid, dt.datetime(2024, 1, 1, 8), u, first, 1.0))
            eid += 1
            for j in range(u % 13):
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 1, 2, 8 + j % 10),
                        u,
                        ("view", "click", "purchase")[j % 3],
                        5.0 + (u * 3 + j) % 20,
                    )
                )
                eid += 1
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        got = {
            r.treated_id: (r.control_id, r.p_treated, r.p_control)
            for r in QUERIES["events_propensity_match"](
                spark, str(tmp_path)
            ).collect()
        }
        # --- replica ---
        feats = {}
        for u in range(40):
            evs = [r for r in rows if r[2] == u]
            n_ev = len(evs)
            n_ty = len({r[3] for r in evs})
            spend_c = int(round(sum(r[4] for r in evs) * 100))
            logit = (
                -2.0
                + 0.4 * m.log(1.0 + n_ev)
                + 0.15 * n_ty
                + 0.1 * m.log(1.0 + spend_c / 100.0)
            )
            pm = int(round(1.0 / (1.0 + m.exp(-logit)) * 1000000))
            feats[u] = pm
        want = {}
        for tu in range(10):
            cands = [
                (abs(feats[tu] - feats[cu]), cu)
                for cu in range(10, 40)
                if abs(feats[tu] - feats[cu]) <= 50000
            ]
            if cands:
                gap, cu = min(cands)
                want[tu] = (cu, round(feats[tu] / 1e6, 4), round(feats[cu] / 1e6, 4))
        assert got == want

    def test_caliper_respected_on_corpus(self, spark, sf_dir):
        out = QUERIES["events_propensity_match"](spark, sf_dir).collect()
        assert len(out) > 0
        treated_ids = [r.treated_id for r in out]
        assert len(treated_ids) == len(set(treated_ids))  # one match each
        for r in out:
            assert abs(r.p_treated - r.p_control) <= 0.0501


class TestReviewFixes:
    def test_hits_zero_iters_returns_init(self, spark):
        from target_parquet_spark.operators.graph import hits

        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        out = {
            r.node: (r.hub_micro, r.auth_micro)
            for r in hits(df, iters=0).collect()
        }
        assert out == {n: (1000000, 0) for n in (1, 2, 3)}

    def test_msprt_day_without_one_arm_still_reported(self, spark, tmp_path):
        """A day where only one arm has events must still emit a monitor
        row carrying the other arm's cumulative state forward."""
        import datetime as dt
        import hashlib

        def arm(u):
            return int(
                hashlib.md5(str(u).encode()).hexdigest()[:8], 16
            ) % 2

        users = list(range(40))
        a_users = [u for u in users if arm(u) == 0]
        b_users = [u for u in users if arm(u) == 1]
        rows, eid = [], 0
        for day in (1, 2, 3):
            for u in a_users + b_users:
                # day 2: arm-1 users are silent
                if day == 2 and arm(u) == 1:
                    continue
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 1, day, 9),
                        u,
                        "view",
                        10.0 + u % 5,
                    )
                )
                eid += 1
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        out = {
            r.day.day: r
            for r in QUERIES["events_msprt_monitor"](
                spark, str(tmp_path)
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        # arm-1 cumulative count is flat across the silent day
        assert out[2].n_b == out[1].n_b
        assert out[3].n_b == out[1].n_b + len(b_users)

    def test_neyman_near_constant_stratum_no_crash(self, spark, tmp_path):
        """A constant-length stratum must yield sd 0.0, not a sqrt
        domain error, even when the variance rounds a hair negative."""
        docs = [(i, "en", "x" * 1000000) for i in range(50)]
        docs += [(100 + i, "de", "y" * (10 + i)) for i in range(50)]
        (
            spark.createDataFrame(
                docs, "doc_id long, lang string, text string"
            )
            .withColumn(
                "source",
                F.when(F.col("lang") == "en", "big").otherwise("small"),
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
        assert out["big"].sd_chars == pytest.approx(0.0)
        assert out["big"].neyman_alloc == 0


class TestFormatSources:
    def test_csv_roundtrip_survives_hostile_text(self, spark, tmp_path):
        """Text with embedded quotes, commas, and newlines must survive
        the CSV round-trip byte-exact (checksum parity with parquet)."""
        docs = [
            (0, "en", 'he said "hi, there"\nand left'),
            (1, "en", "plain text"),
            (2, "de", 'tab\there, "quoted", comma,\n\nblank line'),
        ]
        (
            spark.createDataFrame(docs, "doc_id long, lang string, text string")
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text").cast("long"))
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/documents.parquet")
        )
        for q in ("scan_csv_source", "scan_jsonl_source", "scan_orc_source"):
            out = {
                r.lang: r for r in QUERIES[q](spark, str(tmp_path)).collect()
            }
            import hashlib as h

            def crc(s):
                return int(h.md5(s.encode()).hexdigest()[:8], 16)

            assert out["en"].n_docs == 2
            assert out["en"].content_crc == crc(docs[0][2]) + crc(docs[1][2])
            assert out["de"].content_crc == crc(docs[2][2])

    def test_csv_and_jsonl_agree_on_corpus(self, spark, sf_dir):
        a = {
            r.lang: (r.n_docs, r.sum_chars, r.content_crc)
            for r in QUERIES["scan_csv_source"](spark, sf_dir).collect()
        }
        b = {
            r.lang: (r.n_docs, r.sum_chars, r.content_crc)
            for r in QUERIES["scan_jsonl_source"](spark, sf_dir).collect()
        }
        c = {
            r.lang: (r.n_docs, r.sum_chars, r.content_crc)
            for r in QUERIES["scan_orc_source"](spark, sf_dir).collect()
        }
        assert a == b == c and len(a) > 0


class TestReadability:
    def test_planted_easy_vs_hard(self, spark, tmp_path):
        """Short mono-syllabic sentences score easy (>=70); long
        polysyllabic run-ons score very hard (<30)."""
        easy = "the cat sat. the dog ran. we go now. it is fun. " * 5
        hard = (
            "extraordinary organizational considerations necessitate "
            "unimpeachable epistemological reevaluation "
        ) * 10
        docs = [(0, "easy", easy), (1, "hard", hard)]
        (
            spark.createDataFrame(docs, "doc_id long, lang string, text string")
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text").cast("long"))
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/documents.parquet")
        )
        out = {
            r.lang: r
            for r in QUERIES["text_readability"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["easy"].mean_flesch >= 70 and out["easy"].n_easy == 1
        assert out["hard"].mean_flesch < 30 and out["hard"].n_very_hard == 1

    def test_corpus_scores_bounded(self, spark, sf_dir):
        out = QUERIES["text_readability"](spark, sf_dir).collect()
        assert len(out) > 0
        for r in out:
            assert -400 <= r.mean_flesch <= 121.22  # theoretical max
            assert r.n_very_hard + r.n_easy <= r.n_docs


class TestRandomWalk:
    def test_matches_python_replica(self, spark, sf_dir):
        """Walk replay: same md5 argmin over the oracle-checked k-NN
        edge list in pure Python."""
        edges = {}
        for r in QUERIES["sim_knn_graph"](spark, sf_dir).collect():
            edges.setdefault(r.src, []).append(r.nbr)
        want = {}
        for start in edges:
            cur, path = start, []
            for s in range(1, 5):
                cur = min(
                    edges[cur],
                    key=lambda nbr: (
                        hashlib.md5(f"{cur}:{s}:{nbr}".encode()).hexdigest(),
                        nbr,
                    ),
                )
                path.append(cur)
            want[start] = tuple(path)
        got = {
            r.start: (r.step1, r.step2, r.step3, r.step4)
            for r in QUERIES["graph_random_walk"](spark, sf_dir).collect()
        }
        assert got == want

    def test_steps_follow_edges(self, spark, sf_dir):
        edges = {
            (r.src, r.nbr)
            for r in QUERIES["sim_knn_graph"](spark, sf_dir).collect()
        }
        for r in QUERIES["graph_random_walk"](spark, sf_dir).collect():
            hops = [r.start, r.step1, r.step2, r.step3, r.step4]
            for a, b in zip(hops, hops[1:]):
                assert (a, b) in edges


class TestCohortLtv:
    def test_planted_two_cohorts(self, spark, tmp_path):
        """Two one-week-apart cohorts with known weekly spend: exact
        cumulative curves, per-user normalization."""
        import datetime as dt

        rows, eid = [], 0
        # cohort A: users 0-9, first seen week of Jan 1 (Mon), spend 10
        # that week and 5 the next
        for u in range(10):
            rows.append((eid, dt.datetime(2024, 1, 2, 9), u, "view", 10.0))
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 9, 9), u, "view", 5.0))
            eid += 1
        # cohort B: users 10-14, first seen week of Jan 8, spend 20
        for u in range(10, 15):
            rows.append((eid, dt.datetime(2024, 1, 9, 10), u, "view", 20.0))
            eid += 1
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        out = {
            (r.cohort_week.isoformat(), r.age_weeks): r
            for r in QUERIES["events_cohort_ltv"](
                spark, str(tmp_path)
            ).collect()
        }
        a0 = out[("2024-01-01", 0)]
        a1 = out[("2024-01-01", 1)]
        b0 = out[("2024-01-08", 0)]
        assert a0.cohort_users == 10 and a0.cum_revenue == 100.0
        assert a1.cum_revenue == 150.0 and a1.ltv_per_user == 15.0
        assert b0.cohort_users == 5 and b0.ltv_per_user == 20.0

    def test_curves_monotone_on_corpus(self, spark, sf_dir):
        rows = QUERIES["events_cohort_ltv"](spark, sf_dir).collect()
        assert rows
        by_cohort = {}
        for r in rows:
            by_cohort.setdefault(r.cohort_week, []).append(
                (r.age_weeks, r.ltv_per_user)
            )
        for curve in by_cohort.values():
            curve.sort()
            vals = [v for _, v in curve]
            assert vals == sorted(vals)  # LTV never decreases


class TestSoftDedupWeights:
    def test_planted_group_mass_is_one(self, spark, sf_dir):
        """Every near-dup group's weights sum to ~1 document of mass;
        singletons keep exactly weight 1."""
        out = QUERIES["sample_soft_dedup_weights"](spark, sf_dir).collect()
        assert out
        for r in out:
            assert r.weight_micro == round(1000000.0 / r.group_size)
        singles = [r for r in out if r.group_size == 1]
        multi = [r for r in out if r.group_size > 1]
        assert multi, "planted doubled corpus must create dup groups"
        for r in singles:
            assert r.weight_micro == 1000000
        # expected corpus mass: strictly below the raw doc count (dups
        # exist), at least one unit per singleton plus one per group
        mass = sum(r.weight_micro for r in out) / 1e6
        assert len(singles) + 1 <= mass < len(out)


class TestModularity:
    def test_communities_beat_random_partition(self, spark, sf_dir):
        """LPA communities on the k-NN graph must score Q meaningfully
        above 0 (a random partition's expectation)."""
        r = QUERIES["graph_modularity"](spark, sf_dir).collect()[0]
        assert r.n_communities >= 1
        assert -1.0 <= r.modularity <= 1.0
        assert r.modularity > 0.05

    def test_singleton_partition_bound(self, spark, sf_dir):
        """Sanity on the formula inputs: the largest community cannot
        exceed the node count implied by community count."""
        r = QUERIES["graph_modularity"](spark, sf_dir).collect()[0]
        lpa = QUERIES["graph_communities_lpa"](spark, sf_dir).collect()
        assert r.n_communities == len(lpa)
        assert r.largest == max(x.n_nodes for x in lpa)


class TestPowerAnalysis:
    def test_matches_closed_form_and_monotone(self, spark, sf_dir):
        import math as m

        rows = {
            r.mde_pct: r
            for r in QUERIES["events_power_analysis"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == {1, 2, 5, 10}
        # smaller MDE needs more samples — inverse-square, so 1% needs
        # ~4x the 2% requirement and ~100x the 10% requirement
        assert rows[1].n_per_arm > rows[2].n_per_arm > rows[5].n_per_arm
        assert rows[1].n_per_arm >= 0.9 * 4 * rows[2].n_per_arm
        r5 = rows[5]
        z2 = (1.959964 + 0.841621) ** 2
        want = m.ceil(
            2.0 * (r5.pilot_sd**2) * z2 / ((r5.pilot_mean * 0.05) ** 2)
        )
        # pilot_sd/mean are 4dp-rounded in the output, so allow slack
        assert abs(r5.n_per_arm - want) <= max(3, 0.01 * want)


class TestSrmCheck:
    def test_balanced_split_is_clean(self, spark, sf_dir):
        r = QUERIES["events_srm_check"](spark, sf_dir).collect()[0]
        assert r.n_a > 0 and r.n_b > 0
        assert not r.srm_detected  # md5 split is genuinely 50/50
        assert 0.0 <= r.p_approx <= 1.0

    def test_planted_imbalance_fires(self, spark, tmp_path):
        """A logging bug that drops most of one arm must trip the
        0.001 chi-square threshold."""
        import datetime as dt
        import hashlib

        def arm(u):
            return int(
                hashlib.md5(str(u).encode()).hexdigest()[:8], 16
            ) % 2

        rows, eid = [], 0
        for u in range(4000):
            if arm(u) == 1 and u % 10 != 0:
                continue  # 90% of arm-1 users lost
            rows.append((eid, dt.datetime(2024, 1, 5, 9), u, "view", 1.0))
            eid += 1
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        r = QUERIES["events_srm_check"](spark, str(tmp_path)).collect()[0]
        assert r.srm_detected
        assert r.chi2 > 100
        expected_chi2 = (r.n_a - (r.n_a + r.n_b) / 2) ** 2 / (
            (r.n_a + r.n_b) / 4
        )
        assert r.chi2 == pytest.approx(expected_chi2, abs=1e-4)


class TestWinsorizedAb:
    def test_whale_is_clipped(self, spark, tmp_path):
        """One extreme whale in arm B must not move the winsorized
        means: cap = pooled p99, whale clipped to it."""
        import datetime as dt
        import hashlib

        def arm(u):
            return int(
                hashlib.md5(str(u).encode()).hexdigest()[:8], 16
            ) % 2

        b_users = [u for u in range(400) if arm(u) == 1]
        whale = b_users[0]
        rows = []
        for eid, u in enumerate(range(400)):
            val = 1000000.0 if u == whale else 10.0 + u % 5
            rows.append((eid, dt.datetime(2024, 1, 5, 9), u, "view", val))
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/events.parquet")
        )
        r = QUERIES["events_winsorized_ab"](spark, str(tmp_path)).collect()[0]
        assert r.cap_value < 1000000.0  # the whale defines nothing
        assert abs(r.wmean_b - r.wmean_a) < 1.0  # clipped: arms agree
        assert abs(r.welch_t) < 5

    def test_matches_python_replica(self, spark, sf_dir):
        """Exact replica: pooled p99 cap + clipped Welch on the corpus."""
        import hashlib
        import math as m

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        spend = {}
        for e in ev:
            spend[e.user_id] = spend.get(e.user_id, 0.0) + e.value
        cents = {u: int(round(v * 100)) for u, v in spend.items()}
        vals = sorted(cents.values())
        n = len(vals)
        cap = vals[m.ceil(0.99 * n) - 1]
        arms = {
            u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
            for u in cents
        }
        stat = {0: [], 1: []}
        for u, v in cents.items():
            stat[arms[u]].append(min(v, cap))
        means = {a: sum(xs) / len(xs) for a, xs in stat.items()}
        var = {
            a: (sum(x * x for x in xs) - sum(xs) ** 2 / len(xs))
            / (len(xs) - 1)
            for a, xs in stat.items()
        }
        t_stat = (means[1] - means[0]) / m.sqrt(
            var[0] / len(stat[0]) + var[1] / len(stat[1])
        )
        r = QUERIES["events_winsorized_ab"](spark, sf_dir).collect()[0]
        assert r.cap_value == pytest.approx(cap / 100.0, abs=0.01)
        assert r.wmean_a == pytest.approx(means[0] / 100.0, abs=1e-3)
        assert r.welch_t == pytest.approx(t_stat, abs=1e-3)


class TestQte:
    def test_matches_python_quantiles(self, spark, sf_dir):
        import hashlib
        import math as m

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        spend = {}
        for e in ev:
            spend[e.user_id] = spend.get(e.user_id, 0.0) + e.value
        cents = {u: int(round(v * 100)) for u, v in spend.items()}
        arms = {
            u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
            for u in cents
        }
        out = {
            r.pct: r
            for r in QUERIES["events_quantile_treatment_effect"](
                spark, sf_dir
            ).collect()
        }
        assert set(out) == {10, 25, 50, 75, 90}
        for a, col in ((0, "q_a"), (1, "q_b")):
            vals = sorted(v for u, v in cents.items() if arms[u] == a)
            for pct, r in out.items():
                want = vals[m.ceil(pct / 100.0 * len(vals)) - 1] / 100.0
                assert getattr(r, col) == pytest.approx(want, abs=0.01)
        for r in out.values():
            assert r.qte == pytest.approx(r.q_b - r.q_a, abs=0.011)
