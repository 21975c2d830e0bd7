"""Planted-signal tests for the round-7 operators (queries_r12):
payment-card (Luhn) + national-ID (SSA rules) PII scan.

Python ``re`` plus a hand-written Luhn/SSA implementation is the third
engine on the pattern dialect and the checksum arithmetic — oracle
hash-equality cannot catch a bug both engines share (the BPE lesson).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

import target_parquet_spark.queries_r12  # noqa: F401  (registers queries)
from target_parquet_spark.queries import QUERIES
from target_parquet_spark.queries_r12 import (
    _PII_CARD,
    _PII_SSN,
    pii_idcard_augment,
)


def _luhn_py(c: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(c)):
        d = int(ch)
        if i % 2 == 1:  # every second from the right (check digit is i=0)
            d = d * 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _ssn_py(s: str) -> bool:
    area, grp, ser = int(s[0:3]), int(s[4:6]), int(s[7:11])
    return area not in (0, 666) and area < 900 and grp != 0 and ser != 0


def _scan_py(text: str):
    cards = re.findall(_PII_CARD, text)
    ssns = re.findall(_PII_SSN, text)
    red = re.sub(_PII_SSN, "[SSN]", re.sub(_PII_CARD, "[CARD]", text))
    return (
        len(cards),
        sum(_luhn_py(c) for c in cards),
        len(ssns),
        sum(_ssn_py(s) for s in ssns),
        hashlib.md5(red.encode()).hexdigest(),
    )


class TestPiiIdcardScan:
    def test_matches_python_re_third_engine(self, spark, sf_dir):
        out = {
            r.doc_id: (
                r.n_card,
                r.n_card_valid,
                r.n_ssn,
                r.n_ssn_valid,
                r.redacted_md5,
            )
            for r in QUERIES["text_pii_idcard_scan"](spark, sf_dir).collect()
        }
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        want = {}
        for r in pii_idcard_augment(docs).collect():
            got = _scan_py(r.text)
            if got[0] + got[2] > 0:
                want[r.doc_id] = got
        assert out == want

    def test_both_validity_sides_non_vacuous(self, spark, sf_dir):
        rows = QUERIES["text_pii_idcard_scan"](spark, sf_dir).collect()
        # Luhn: valid cards exist (the planted 4111111111111111 at
        # least) AND invalid candidates exist (derived cards mostly
        # fail the checksum) — the verification is doing work
        assert any(r.n_card_valid > 0 for r in rows)
        assert any(r.n_card > r.n_card_valid for r in rows)
        # SSA rules: same in both directions (area 666 / group 00 /
        # serial 0000 all occur among the planted ids)
        assert any(r.n_ssn_valid > 0 for r in rows)
        assert any(r.n_ssn > r.n_ssn_valid for r in rows)

    def test_luhn_classic_vectors(self, spark):
        """Known Luhn vectors through the SPARK lambda (not just the
        Python twin): the classic valid test PANs and their
        one-digit-off corruptions."""
        valid = ["4111111111111111", "5500005555555559", "4012888888881881"]
        invalid = [v[:-1] + str((int(v[-1]) + 1) % 10) for v in valid]
        df = spark.createDataFrame(
            [(c, True) for c in valid] + [(c, False) for c in invalid],
            "card string, want boolean",
        )
        from target_parquet_spark.queries_r12 import _luhn_ok

        got = df.select(
            "want",
            F.size(
                F.filter(F.array(F.col("card")), _luhn_ok)
            ).alias("n"),
        ).collect()
        for r in got:
            assert (r.n == 1) == r.want

    def test_redaction_removes_every_candidate(self, spark, sf_dir):
        """After redaction no candidate pattern survives — re-scan the
        redacted text (Python re) and require zero hits."""
        from target_parquet_spark.queries_r12 import pii_idcard_redact

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        red = (
            pii_idcard_augment(docs)
            .select(pii_idcard_redact(F.col("text")).alias("t"))
            .collect()
        )
        for r in red:
            assert not re.search(_PII_CARD, r.t)
            assert not re.search(_PII_SSN, r.t)


class TestTCloseness:
    def test_hand_computed_emd(self, spark, tmp_path):
        """Two groups against a hand-computed ordered EMD.  Corpus:
        6 rows, bands from floor(value): group A = [0, 0, 1],
        group B = [9, 9, 9].  Global Q = {0: 2/6, 1: 1/6, 9: 3/6}.
        A's EMD: p-q cumdiffs over bands 0..9 =
          (2/3-1/3)=1/3, +(1/3-1/6)=1/2, then flat 1/2 x 7, band9 -> 0
        sum|cum| = 1/3 + 1/2*8 = 13/3; t = (13/3)/9 = 0.4815.
        B mirrors with p mass at 9: cum = -1/3, -1/2 x 8, 0 ->
        same t.  max_t = 0.4815, both violate at 0.05."""
        import datetime as dt

        rows = []
        day_a = dt.datetime(2024, 1, 1, 10)
        day_b = dt.datetime(2024, 1, 2, 10)
        for i, v in enumerate([0.2, 0.7, 1.5]):
            rows.append((i, day_a, i, "a", v, "{}"))
        for i, v in enumerate([9.1, 9.5, 12.0]):  # 12 clamps to band 9
            rows.append((10 + i, day_b, i, "a", v, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

        from target_parquet_spark.queries import QUERIES

        out = QUERIES["audit_t_closeness"](spark, str(tmp_path)).collect()[0]
        assert out.n_groups == 2
        assert out.max_t == round((1 / 3 + 0.5 * 8) / 9, 4) == 0.4815
        assert out.n_violating == 2
        assert out.t_satisfied == 0


class TestKtruss:
    def test_truss_properties_and_fixpoint(self, spark, sf_dir):
        """Independent verification on the REAL graph: (a) both flag
        sides are non-vacuous, (b) every surviving edge has >= k-2
        common neighbors WITHIN the surviving edge set (the truss
        closure property — i.e. the peel reached its fixpoint within
        the unrolled rounds), (c) support_initial matches a hand
        triangle count over the full graph."""
        from collections import defaultdict

        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import _KTRUSS_K

        rows = QUERIES["graph_ktruss"](spark, sf_dir).collect()
        kept = {(r.u, r.v) for r in rows if r.in_truss}
        dropped = [r for r in rows if not r.in_truss]
        assert kept and dropped  # non-vacuous both ways

        # full-graph adjacency for the support_initial check
        adj = defaultdict(set)
        for r in rows:
            adj[r.u].add(r.v)
            adj[r.v].add(r.u)
        for r in rows:
            assert r.support_initial == len(adj[r.u] & adj[r.v]), (r.u, r.v)

        # fixpoint: support within the kept set alone still >= k-2
        kadj = defaultdict(set)
        for u, v in kept:
            kadj[u].add(v)
            kadj[v].add(u)
        for u, v in kept:
            assert len(kadj[u] & kadj[v]) >= _KTRUSS_K - 2, (u, v)


class TestHtmlStrip:
    def test_matches_python_re_third_engine(self, spark, sf_dir):
        from target_parquet_spark.queries_r12 import (
            _HTML_BLOCK_PATTERNS,
            _HTML_ENTITIES,
            _HTML_TAG,
            html_augment,
        )

        def strip_py(h: str) -> str:
            out = h
            for pat in _HTML_BLOCK_PATTERNS:
                out = re.sub(pat, " ", out)
            out = re.sub(_HTML_TAG, " ", out)
            for ent, rep in _HTML_ENTITIES:
                out = out.replace(ent, rep)
            return re.sub(r"\s+", " ", out).strip()

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        from target_parquet_spark.queries import QUERIES

        got = {
            r.doc_id: (r.n_chars_raw, r.n_chars_clean, r.clean_md5)
            for r in QUERIES["text_html_boilerplate_strip"](
                spark, sf_dir
            ).collect()
        }
        for r in html_augment(docs).collect():
            clean = strip_py(r.html)
            want = (
                len(r.html),
                len(clean),
                hashlib.md5(clean.encode()).hexdigest(),
            )
            assert got[r.doc_id] == want, r.doc_id

    def test_chrome_content_does_not_survive(self, spark, sf_dir):
        """The wrapper's title/script/nav/footer payloads (including
        the doc-id-derived bits) must be gone; the body text and the
        decoded entities must remain."""
        from target_parquet_spark.queries_r12 import html_augment, html_strip

        docs = spark.createDataFrame(
            [(7, "the quick brown fox")], "doc_id long, text string"
        )
        out = (
            html_augment(docs)
            .select(html_strip(F.col("html")).alias("clean"))
            .collect()[0]
            .clean
        )
        assert "the quick brown fox" in out
        assert 'Tom & Jerry <3 "quotes" \'s here' in out
        for gone in ("Doc 7", "var x=", "home | about", "corp 7",
                     "margin", "<", "&amp;"):
            if gone == "<":
                assert "<3" in out and "<html" not in out
            else:
                assert gone not in out, gone

    def test_nested_chrome_does_not_leak_body(self, spark):
        """Different chrome tags nested inside each other must strip as
        a unit: '<header>..<nav>x</nav>..rest</header>body' must not
        leak 'rest' (the old open/close ALTERNATION matched <header> to
        </nav> and let 'rest' survive; ADVICE r7)."""
        from target_parquet_spark.queries_r12 import html_strip

        html = (
            "<header>site <nav>home | about</nav> tagline rest</header>"
            "<p>real body text</p><footer>foot <aside>ad</aside> end</footer>"
        )
        df = spark.createDataFrame([(html,)], "html string")
        out = df.select(html_strip(F.col("html")).alias("c")).collect()[0].c
        assert out == "real body text", out


class TestUrlCanonical:
    def test_all_variants_collapse_and_match_python(self, spark, sf_dir):
        """Python (urllib.parse-based) canonicalizer as the third
        engine; every planted page must collapse its 4 surface
        variants (including across hosts' case / ports / tracking)."""
        from urllib.parse import urlsplit

        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import url_augment

        def canon_py(url: str) -> str:
            sp = urlsplit(url)
            host = sp.netloc.lower()
            host = host[4:] if host.startswith("www.") else host
            for suf in (":80", ":443"):
                if host.endswith(suf):
                    host = host[: -len(suf)]
            q = "&".join(
                p
                for p in sp.query.split("&")
                if p
                and not re.match(r"(utm_[a-z]+|gclid|fbclid)=", p)
            )
            path = sp.path.rstrip("/")
            return host + path + (("?" + q) if q else "")

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id"
        )
        planted = url_augment(docs).collect()
        want = {}
        for r in planted:
            want.setdefault(canon_py(r.url), []).append((r.doc_id, r.url))
        want_rows = {
            cu: (len(ds), len({u for _, u in ds}), min(d for d, _ in ds))
            for cu, ds in want.items()
            if len(ds) >= 2
        }
        got = {
            r.canonical_url: (r.n_docs, r.n_surface_forms, r.keep_doc)
            for r in QUERIES["dedup_url_canonical"](spark, sf_dir).collect()
        }
        assert got == want_rows
        # the planting guarantees real collapses: 4 surface forms/page
        assert any(v[1] >= 4 for v in got.values())


    def test_slash_before_query_and_slash_valued_params(self, spark):
        """Review r7 #3: '/p5/?x=1' must collapse with '/p5?x=1' (the
        path slash is surface noise even when a query follows), while a
        query VALUE ending in '/' is data and survives."""
        from target_parquet_spark.queries_r12 import url_canonicalize

        df = spark.createDataFrame(
            [
                ("https://example.com/articles/p5/?x=1",),
                ("https://example.com/articles/p5?x=1",),
                ("https://example.com/login?next=/home/",),
            ],
            "url string",
        )
        got = [
            r.c
            for r in df.select(url_canonicalize(F.col("url")).alias("c"))
            .collect()
        ]
        assert got[0] == got[1] == "example.com/articles/p5?x=1"
        assert got[2] == "example.com/login?next=/home/"


class TestColbertMaxsim:
    def test_planted_exact_match_saturates(self, spark, tmp_path):
        """A doc containing every query token must score the exact
        saturation value (8 query tokens x 16 bits) and rank first; a
        partial-overlap doc lands strictly between; scores match a
        hand-computed MaxSim over the same signatures."""
        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import (
            _MAXSIM_BITS,
            _MAXSIM_QTOKS,
        )

        qtext = "alpha bravo charlie delta echo foxtrot golf hotel"
        rows = [
            (0, qtext, "en", "t", len(qtext)),
            (1, qtext + " extra words here", "en", "t", 10),
            (2, "alpha bravo unrelated tail", "en", "t", 10),
            (3, "zzz yyy xxx www", "en", "t", 10),
        ]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

        out = QUERIES["sim_colbert_maxsim"](spark, str(tmp_path)).collect()
        got = {r.doc_id: r.maxsim for r in out}
        sat = _MAXSIM_QTOKS * _MAXSIM_BITS
        assert got[1] == sat  # superset doc saturates
        assert got[2] < sat  # partial overlap strictly below
        assert got[3] < got[2]  # unrelated below partial
        assert out[0].doc_id == 1  # ranked first

        # hand recompute doc 2's score over the same signatures
        import hashlib as _h

        def sig(tok):
            return int(_h.md5(tok.encode()).hexdigest()[:15], 16) % (
                1 << _MAXSIM_BITS
            )

        qsigs = [sig(t) for t in sorted(qtext.split())[:_MAXSIM_QTOKS]]
        d2 = {sig(t) for t in "alpha bravo unrelated tail".split()}
        want2 = sum(
            max(
                _MAXSIM_BITS - bin(qs ^ ds).count("1")
                for ds in d2
            )
            for qs in qsigs
        )
        assert got[2] == want2


class TestHoltForecast:
    def test_hand_computed_recurrence(self, spark, tmp_path):
        """Python recomputation of the Holt recurrence over a planted
        3-day series, including the 7-day linear extrapolation."""
        import datetime as dt

        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import (
            _HOLT_ALPHA,
            _HOLT_BETA,
            _HOLT_HORIZON,
        )

        days = [dt.datetime(2024, 3, d, 12) for d in (1, 2, 3)]
        vals = [[1.0, 2.5], [4.0], [2.0, 2.0, 2.0]]  # daily sums 3.5/4/6
        rows = []
        eid = 0
        for day, vs in zip(days, vals):
            for v in vs:
                rows.append((eid, day, eid, "buy", v, "{}"))
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

        out = QUERIES["events_holt_forecast"](spark, str(tmp_path)).collect()
        assert len(out) == _HOLT_HORIZON

        cents = [350, 400, 600]
        level, trend = float(cents[0]), 0.0
        for y in cents[1:]:
            nl = _HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (level + trend)
            trend = _HOLT_BETA * (nl - level) + (1 - _HOLT_BETA) * trend
            level = nl
        for r in out:
            want = round((level + r.horizon * trend) / 100.0, 2)
            assert r.forecast_rev == want, r.horizon
            assert r.forecast_day == dt.date(2024, 3, 3 + r.horizon)

    def test_corpus_longer_than_default_recursion_cap(self, spark, tmp_path):
        """Review r7 #2: one recursion level per day + Spark's default
        100-level cap would crash any corpus spanning >100 days; the
        query sizes the cap to the span.  150 days, checked against the
        Python recurrence."""
        import datetime as dt

        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import _HOLT_ALPHA, _HOLT_BETA

        base = dt.datetime(2024, 1, 1, 12)
        rows = [
            (i, base + dt.timedelta(days=i), i, "buy", float(1 + i % 5), "{}")
            for i in range(150)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

        out = QUERIES["events_holt_forecast"](spark, str(tmp_path)).collect()
        cents = [round((1 + i % 5) * 100) for i in range(150)]
        level, trend = float(cents[0]), 0.0
        for y in cents[1:]:
            nl = _HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (level + trend)
            trend = _HOLT_BETA * (nl - level) + (1 - _HOLT_BETA) * trend
            level = nl
        for r in out:
            assert r.forecast_rev == round(
                (level + r.horizon * trend) / 100.0, 2
            )


class TestWeightedWithoutReplacement:
    def test_matches_python_and_biases_heavy(self, spark, sf_dir):
        import hashlib as _h

        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import _WWR_K

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "n_chars"
        )
        rows = [(r.doc_id, r.n_chars) for r in docs.collect() if r.n_chars > 0]

        def key(doc_id, w):
            u = (
                int(_h.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 0.5
            ) / 4294967296.0
            # match the query's 9dp ranking quantization (SQL round is
            # half-away-from-zero; values are positive)
            import math

            return math.floor(u ** (1.0 / float(w)) * 1e9 + 0.5) / 1e9

        want = sorted(
            ((key(d, w), d, w) for d, w in rows),
            key=lambda t: (-t[0], t[1]),
        )[:_WWR_K]
        got = QUERIES["sample_weighted_without_replacement"](
            spark, sf_dir
        ).collect()
        assert [r.doc_id for r in got] == [d for _, d, _ in want]
        assert [r.rk for r in got] == list(range(1, len(want) + 1))
        # without-replacement: all distinct
        assert len({r.doc_id for r in got}) == len(got)
        # weighting does work: the selected mean weight beats the corpus mean
        corpus_mean = sum(w for _, w in rows) / len(rows)
        sel_mean = sum(r.weight for r in got) / len(got)
        assert sel_mean > corpus_mean


class TestSeasonalDecompose:
    def test_python_recompute(self, spark, sf_dir):
        from collections import defaultdict

        from target_parquet_spark.queries import QUERIES

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "ts", "value"
        )
        daily = defaultdict(float)
        for r in ev.collect():
            daily[r.ts.date()] += r.value
        days = sorted(daily)
        cents = {d: round(daily[d] * 100) for d in days}

        import math

        def _round_half_up(x):  # SQL round(), not Python banker's
            return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

        trend = {}
        for i, d in enumerate(days):
            win = days[max(0, i - 3) : i + 4]
            if len(win) == 7 and i >= 3:
                trend[d] = _round_half_up(sum(cents[x] for x in win) / 7 * 10000)
        import datetime as dt

        epoch = dt.date(2024, 1, 1)
        det = {d: cents[d] * 10000 - trend[d] for d in trend}
        bydow = defaultdict(list)
        for d, v in det.items():
            bydow[(d - epoch).days % 7].append(v)
        seas = {k: _round_half_up(sum(v) / len(v)) for k, v in bydow.items()}

        got = {
            r.day: (r.revenue, r.trend, r.seasonal, r.residual)
            for r in QUERIES["events_seasonal_decompose"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(trend)
        for d in trend:
            dow = (d - epoch).days % 7
            want = (
                round(cents[d] / 100.0, 2),
                round(trend[d] / 1e6, 4),
                round(seas[dow] / 1e6, 4),
                round((cents[d] * 10000 - trend[d] - seas[dow]) / 1e6, 4),
            )
            assert got[d] == want, d


class TestBetweennessSampled:
    def test_python_brandes_recompute(self, spark, sf_dir):
        """Independent Python Brandes (depth-capped, same seed set,
        same integer-nano quantization) over the same artifact edges —
        the third engine on the whole forward/backward recursion."""
        import math as _math
        from collections import defaultdict

        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import (
            _BC_DEPTH,
            _BC_NANO,
            _BC_SEED_MOD,
            _BC_TOPK,
        )
        from target_parquet_spark.queries_r6 import _symmetrize_degrees
        from target_parquet_spark.queries_r7 import knn_edge_artifact

        sym, _ = _symmetrize_degrees(knn_edge_artifact(spark, sf_dir))
        adj = defaultdict(set)
        for r in sym.collect():
            adj[r.u].add(r.v)
        nodes = sorted(adj)
        bn = defaultdict(int)
        for s in nodes:
            if s % _BC_SEED_MOD != 0:
                continue
            # forward
            level = {0: {s: 1}}
            seen = {s}
            for k in range(1, _BC_DEPTH + 1):
                nxt = defaultdict(int)
                for u, sig in level[k - 1].items():
                    for v in adj[u]:
                        if v not in seen:
                            nxt[v] += sig
                level[k] = dict(nxt)
                seen |= set(nxt)
            # backward (integer nanos, one rounding per contribution)
            delta = {v: 0 for v in level[_BC_DEPTH]}
            for k in range(_BC_DEPTH - 1, -1, -1):
                dk = {}
                for u, sig in level[k].items():
                    tot = 0
                    for w, wsig in level[k + 1].items():
                        if w in adj[u]:
                            # round-half-away-from-zero (SQL round),
                            # NOT Python banker's
                            x = 1.0 * sig * (_BC_NANO + delta[w]) / wsig
                            tot += int(_math.floor(x + 0.5))
                    dk[u] = tot
                for u, d in dk.items():
                    if k >= 1:
                        bn[u] += d
                delta = dk
        # d is accumulated for levels k>=1 only, matching the query's
        # union over d1..d{depth} (d{depth} is all zeros; d0 = seeds
        # themselves, excluded — betweenness never counts endpoints).
        want = sorted(
            bn.items(), key=lambda t: (-t[1], t[0])
        )[:_BC_TOPK]
        got = [
            (r.vec_id, r.betweenness)
            for r in QUERIES["graph_betweenness_sampled"](
                spark, sf_dir
            ).collect()
        ]
        assert got == [(v, round(b / _BC_NANO, 4)) for v, b in want]
        # non-vacuous: real bridge mass exists
        assert any(b > 0 for _, b in want)


class TestCompaction:
    def test_file_count_shrinks_and_content_survives(self, spark, sf_dir):
        import math
        import os

        from target_parquet_spark.queries import QUERIES
        from target_parquet_spark.queries_r12 import (
            _COMPACT_TARGET_BYTES,
            compaction_artifacts,
        )

        small, packed = compaction_artifacts(spark, sf_dir)

        def nfiles(p):
            return sum(1 for f in os.listdir(p) if f.endswith(".parquet"))

        data_bytes = sum(
            os.path.getsize(os.path.join(small, f))
            for f in os.listdir(small)
            if f.endswith(".parquet")
        )
        want_out = max(1, math.ceil(data_bytes / _COMPACT_TARGET_BYTES))
        assert nfiles(small) == 48
        assert nfiles(packed) == want_out < nfiles(small)

        # content identical to the ORIGINAL table, not just to `small`
        orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = spark.read.parquet(packed)
        assert got.count() == orig.count()
        a = sorted(
            tuple(r)
            for r in got.select("doc_id", "n_chars", "text").collect()
        )
        b = sorted(
            tuple(r)
            for r in orig.select("doc_id", "n_chars", "text").collect()
        )
        assert a == b
        # the registered query runs and is non-empty
        assert QUERIES["scan_compaction_binpack"](spark, sf_dir).count() > 0
