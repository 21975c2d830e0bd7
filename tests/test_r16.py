"""Round-10 continuation tests (session 2): Walsh-Hadamard audio
spectrum, and the rest of this wave's new operators."""

import hashlib

import numpy as np
import pytest

from target_parquet_spark.operators import multimodal as M


# ---------------------------------------------------------------------------
# fwht_natural: the pure transform kernel
# ---------------------------------------------------------------------------


def _naive_wht(v):
    n = len(v)
    return np.array(
        [
            sum(
                int(v[t]) * (1 - 2 * (bin(k & t).count("1") % 2))
                for t in range(n)
            )
            for k in range(n)
        ],
        dtype=np.int64,
    )


def test_fwht_matches_definition():
    rng = np.random.RandomState(7)
    for n in (2, 4, 8, 16, 64):
        v = rng.randint(-2048, 2048, n).astype(np.int64)
        assert np.array_equal(M.fwht_natural(v), _naive_wht(v))


def test_fwht_involution_and_parseval():
    rng = np.random.RandomState(11)
    v = rng.randint(-2048, 2048, 64).astype(np.int64)
    w = M.fwht_natural(v)
    # involution up to scaling: WHT(WHT(v)) == N * v
    assert np.array_equal(M.fwht_natural(w), 64 * v)
    # Parseval: sum W^2 == N * sum v^2
    assert int((w * w).sum()) == 64 * int((v * v).sum())


def test_fwht_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        M.fwht_natural(np.zeros(48, dtype=np.int64))


def test_fwht_impulse_and_constant():
    # impulse at t=0 -> flat spectrum (all ones); constant -> all energy
    # in the DC coefficient
    imp = np.zeros(8, dtype=np.int64)
    imp[0] = 1
    assert np.array_equal(M.fwht_natural(imp), np.ones(8, dtype=np.int64))
    const = np.full(8, 3, dtype=np.int64)
    w = M.fwht_natural(const)
    assert w[0] == 24 and not w[1:].any()


# ---------------------------------------------------------------------------
# audio_wht: the Spark seam
# ---------------------------------------------------------------------------


def test_audio_wht_end_to_end(spark):
    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    media = M.attach_wav_media(docs, "doc_id")
    out = {r["media_id"]: r for r in M.audio_wht(media).collect()}
    assert len(out) == 8
    for mid in range(8):
        n = 40 + mid % 37
        t = np.arange(n, dtype=np.int64)
        s = ((mid * 31 + t * t * 7 + t * 13) % 4096) - 2048
        v = np.zeros(64, dtype=np.int64)
        m = min(n, 64)
        v[:m] = s[:m]
        w = _naive_wht(v)
        r = out[mid]
        assert r["n_samples"] == n
        assert r["dc"] == int(w[0])
        for j in range(6):
            lo, hi = 1 << j, 1 << (j + 1)
            assert r[f"oct{j}"] == int((w[lo:hi] ** 2).sum())
        assert r["spec_energy"] == int((w * w).sum())
        expect_hash = hashlib.md5(
            ",".join(str(int(x)) for x in w).encode()
        ).hexdigest()
        assert r["spectrum_hash"] == expect_hash
        # Parseval ties the spectrum back to the decoded samples
        assert r["spec_energy"] == 64 * int((v * v).sum())


def test_audio_wht_rejects_non_wav(spark):
    docs = spark.range(0, 2).withColumnRenamed("id", "doc_id")
    media = M.attach_bmp_media(docs, "doc_id")
    with pytest.raises(Exception, match="audio codecs unavailable"):
        M.audio_wht(media).collect()


# ---------------------------------------------------------------------------
# audit_dp_counts: the deterministic geometric mechanism
# ---------------------------------------------------------------------------


def _dp_noise(u: int) -> int:
    from target_parquet_spark.queries_r16 import _DP_CLIP, _DP_T

    return -_DP_CLIP + sum(1 for t in _DP_T if u >= t)


def test_dp_thresholds_are_exact_geometric_cdf():
    from fractions import Fraction

    from target_parquet_spark.queries_r16 import _DP_CLIP, _DP_SCALE, _DP_T

    assert len(_DP_T) == 2 * _DP_CLIP
    assert _DP_T == sorted(_DP_T)
    # CDF(0) = 2/3 exactly (P(noise <= 0) for the alpha=1/2 mechanism)
    assert _DP_T[_DP_CLIP] == int(Fraction(2, 3) * _DP_SCALE)
    # CDF(-1) = 1/3 exactly
    assert _DP_T[_DP_CLIP - 1] == int(Fraction(1, 3) * _DP_SCALE)


def test_dp_mechanism_pmf_is_two_sided_geometric():
    """The EXACT count of u-lattice points mapping to noise k must be
    floor-rounded P(k) mass: T_k - T_{k-1} lattice points out of 2^30,
    vs P(k) = (1/3) * (1/2)^|k|."""
    from fractions import Fraction

    from target_parquet_spark.queries_r16 import _DP_CLIP, _DP_SCALE, _DP_T

    edges = [0] + list(_DP_T) + [_DP_SCALE]
    for idx, k in enumerate(range(-_DP_CLIP, _DP_CLIP + 1)):
        exact_mass = Fraction(edges[idx + 1] - edges[idx], _DP_SCALE)
        want = Fraction(1, 3) * Fraction(1, 2) ** abs(k)
        if abs(k) == _DP_CLIP:  # clip buckets absorb the tail mass
            assert exact_mass >= want
        else:
            # floor rounding moves each edge by < 1/2^30
            assert abs(exact_mass - want) <= Fraction(2, _DP_SCALE)


def test_dp_noise_inverse_cdf_edges():
    from target_parquet_spark.queries_r16 import _DP_CLIP, _DP_SCALE, _DP_T

    assert _dp_noise(0) == -_DP_CLIP
    assert _dp_noise(_DP_SCALE - 1) == _DP_CLIP
    # just below/at the CDF(-1)=1/3 edge flips noise -1 -> 0
    third = _DP_T[_DP_CLIP - 1]
    assert _dp_noise(third - 1) == -1
    assert _dp_noise(third) == 0


def test_dp_epsilon_bound_holds_on_interior_pmf():
    """P(k)/P(k+1) <= e^eps * slack on non-clip buckets — the ratio the
    epsilon = ln 2 guarantee is made of (exact lattice masses, so the
    only slack is floor rounding)."""
    from target_parquet_spark.queries_r16 import _DP_CLIP, _DP_SCALE, _DP_T

    edges = [0] + list(_DP_T) + [_DP_SCALE]
    masses = {
        k: edges[i + 1] - edges[i]
        for i, k in enumerate(range(-_DP_CLIP, _DP_CLIP + 1))
    }
    for k in range(-_DP_CLIP + 1, _DP_CLIP - 1):
        hi = max(masses[k], masses[k + 1])
        lo = min(masses[k], masses[k + 1])
        assert hi <= 2 * lo + 2  # e^eps = 2, +2 for floor rounding


# ---------------------------------------------------------------------------
# dedup_substring_remove: hand-built excision check
# ---------------------------------------------------------------------------


def test_substring_remove_hand_check(spark, tmp_out):
    """30 unique tokens -> the corpus doubler's truncated copy shares
    gram positions 0..23, one run covering tokens 0..27 (28 >= 20, so it
    is excised); a 10-token doc's shared run covers only 8 tokens and
    survives intact."""
    import target_parquet_spark.queries_r16  # noqa: F401  (registers)
    from pyspark.sql import functions as F

    from target_parquet_spark.queries import QUERIES

    long_toks = [f"t{i}" for i in range(1, 31)]
    short_toks = [f"s{i}" for i in range(1, 11)]
    docs = [(0, " ".join(long_toks)), (1, " ".join(short_toks))]
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{tmp_out}/documents.parquet")
    )
    got = {
        r["doc_id"]: r
        for r in QUERIES["dedup_substring_remove"](spark, tmp_out).collect()
    }
    assert set(got) == {0, 1, 1000000, 1000001}

    # original long doc: tokens 0..27 excised, 28..29 kept
    r = got[0]
    assert (r["n_tokens"], r["n_kept"], r["n_removed"], r["n_spans"]) == (
        30, 2, 28, 1,
    )
    assert r["cleaned_hash"] == hashlib.md5(b"t29 t30").hexdigest()

    # its 28-token copy: fully covered -> empty after excision
    r = got[1000000]
    assert (r["n_tokens"], r["n_kept"], r["n_removed"], r["n_spans"]) == (
        28, 0, 28, 1,
    )
    assert r["cleaned_hash"] == hashlib.md5(b"").hexdigest()

    # short doc: duplicated span is only 8 tokens -> nothing removed
    r = got[1]
    assert (r["n_tokens"], r["n_kept"], r["n_removed"], r["n_spans"]) == (
        10, 10, 0, 0,
    )
    assert r["cleaned_hash"] == hashlib.md5(" ".join(short_toks).encode()).hexdigest()

    # the short doc's 8-token copy: same — below the excision threshold
    r = got[1000001]
    assert (r["n_tokens"], r["n_kept"], r["n_removed"], r["n_spans"]) == (
        8, 8, 0, 0,
    )


# ---------------------------------------------------------------------------
# TIFF codec: round trips, spec vectors, error paths
# ---------------------------------------------------------------------------


def test_packbits_spec_vector():
    """The worked example from TIFF 6.0 section 9."""
    src = bytes(
        [0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
         0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA,
         0xAA, 0xAA, 0xAA, 0xAA]
    )
    spec_encoding = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80,
         0x00, 0x2A, 0x22, 0xF7, 0xAA]
    )
    assert M.packbits_decode(spec_encoding, len(src)) == src
    # our own encoding round-trips (byte choices may differ from the
    # spec's, which is allowed — PackBits is not canonical)
    assert M.packbits_decode(M.packbits_encode(src), len(src)) == src


def test_packbits_run_compression_and_noop():
    runs = bytes([7]) * 300 + bytes([9]) * 3
    enc = M.packbits_encode(runs)
    assert len(enc) < 16  # 300-run splits into 128-capped run packets
    assert M.packbits_decode(enc, len(runs)) == runs
    # 0x80 is a no-op and must be skipped
    assert M.packbits_decode(bytes([0x80, 0x00, 0x41]), 1) == b"A"
    with pytest.raises(ValueError, match="runs past end"):
        M.packbits_decode(bytes([0x05]), 6)
    with pytest.raises(ValueError, match="truncated"):
        M.packbits_decode(b"", 1)


def test_tiff_round_trip_endianness_compression():
    rng = np.random.RandomState(3)
    for bo in ("<", ">"):
        for comp in (1, 32773):
            for (h, w) in ((4, 8), (7, 5), (16, 24), (1, 1)):
                a = rng.randint(0, 256, (h, w)).astype(np.uint8)
                blob = M.encode_tiff(
                    a, byte_order=bo, compression=comp, rows_per_strip=4
                )
                dec, info = M.decode_tiff(blob)
                assert np.array_equal(dec, a)
                assert info["byte_order"] == ("II" if bo == "<" else "MM")
                assert info["compression"] == comp
                assert info["n_strips"] == (h + 3) // 4


def test_tiff_cross_endian_same_pixels():
    a = (np.arange(48, dtype=np.uint8)).reshape(6, 8)
    ii = M.decode_tiff(M.encode_tiff(a, byte_order="<"))[0]
    mm = M.decode_tiff(M.encode_tiff(a, byte_order=">"))[0]
    assert np.array_equal(ii, mm)


def test_tiff_error_paths():
    a = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="not a TIFF"):
        M.decode_tiff(b"PK\x03\x04....")
    with pytest.raises(NotImplementedError, match="compression"):
        M.encode_tiff(a, compression=5)  # LZW not implemented
    blob = bytearray(M.encode_tiff(a))
    blob[2] = 43  # corrupt the magic number (bytes 2-3, little-endian)
    with pytest.raises(ValueError, match="magic"):
        M.decode_tiff(bytes(blob))


# ---------------------------------------------------------------------------
# audit_gdpr_erasure: cascade invariants
# ---------------------------------------------------------------------------


def test_gdpr_erasure_cascade_invariants(spark, sf_dir):
    import target_parquet_spark.queries_r16  # noqa: F401  (registers)
    from target_parquet_spark.queries import QUERIES

    rows = {
        r["table_name"]: r
        for r in QUERIES["audit_gdpr_erasure"](spark, sf_dir).collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert r["n_rows"] == r["n_linked"] + r["n_after_erasure"]
        assert 0 <= r["n_subjects"] <= r["n_linked"]
    # the hash flags ~2/16 of customers; every erased customer is one
    # linked row in the customer table itself
    c = rows["customer"]
    assert c["n_linked"] == c["n_subjects"] > 0
    # cascade reaches every hop
    assert rows["orders"]["n_linked"] > 0
    assert rows["lineitem"]["n_linked"] > 0
    assert rows["events"]["n_linked"] > 0
    # two-hop erasure can't touch more lineitems than erased orders
    # have lineitems: distinct erased orderkeys <= erased order rows
    assert rows["lineitem"]["n_subjects"] <= rows["orders"]["n_linked"]


# ---------------------------------------------------------------------------
# graph_bipartite_projection: co-purchase projection invariants
# ---------------------------------------------------------------------------


def test_bipartite_projection_invariants(spark, sf_dir):
    import target_parquet_spark.queries_r16  # noqa: F401  (registers)
    from target_parquet_spark.queries import QUERIES

    rows = QUERIES["graph_bipartite_projection"](spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert r["custkey"] != r["neighbor"]
        assert r["shared_items"] >= 1
        by_user.setdefault(r["custkey"], []).append(r)
    for recs in by_user.values():
        recs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in recs] == list(range(1, len(recs) + 1))
        # ranks are ordered by weight desc then neighbor asc
        for a, b in zip(recs, recs[1:]):
            assert (-a["shared_items"], a["neighbor"]) < (
                -b["shared_items"],
                b["neighbor"],
            )
    # projection is symmetric pre-top-k: if (u, v) survived u's top-3
    # with weight w, then v also saw u with the same weight (possibly
    # outside v's top-3) — spot-check weight symmetry where both survive
    weights = {(r["custkey"], r["neighbor"]): r["shared_items"] for r in rows}
    both = [(u, v) for (u, v) in weights if (v, u) in weights]
    assert both  # dense enough that mutual pairs exist
    for u, v in both[:50]:
        assert weights[(u, v)] == weights[(v, u)]


# ---------------------------------------------------------------------------
# multimodal_shot_boundaries: codec-real successive-frame diffs
# ---------------------------------------------------------------------------


def test_shot_boundaries_match_generation_function(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    media = M.attach_avi_media(docs, "doc_id")
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in M.video_shot_boundaries(media).collect()
    }
    expect = {}
    for mid in range(10):
        n = 2 + mid % 3
        w, h = 8 * (2 + mid % 2), 8 * (1 + mid % 2)
        y, x = np.mgrid[0:h, 0:w]
        for f in range(1, n):
            a = (mid * 37 + (f - 1) * 53 + (y // 8) * 17 + (x // 8) * 11) % 256
            b = (mid * 37 + f * 53 + (y // 8) * 17 + (x // 8) * 11) % 256
            l1 = int(np.abs(b.astype(np.int64) - a).sum())
            expect[(mid, f)] = (l1, l1 * 100 // (w * h))
    assert set(got) == set(expect)
    for k, (l1, mc) in expect.items():
        assert got[k]["l1"] == l1
        assert got[k]["mean_centidiff"] == mc
        assert got[k]["is_boundary"] == (mc >= 10000)
    # the +53 drift wraps on bright pixels: both outcomes must occur
    flags = {r["is_boundary"] for r in got.values()}
    assert flags == {True, False}


# ---------------------------------------------------------------------------
# model_calibration_bins: ECE decomposition invariants
# ---------------------------------------------------------------------------


def test_calibration_bins_invariants(spark, sf_dir):
    import target_parquet_spark.queries_r16  # noqa: F401  (registers)
    from target_parquet_spark.queries import QUERIES

    rows = QUERIES["model_calibration_bins"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r["n_docs"] for r in rows)
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert 0.0 <= r["avg_confidence"] <= 1.0
        assert 0.0 <= r["obs_rate"] <= 1.0
        # the gap column is |confidence - accuracy| rounded at 4dp
        assert abs(
            r["abs_gap"] - abs(round(r["avg_confidence"] - r["obs_rate"], 4))
        ) <= 2e-4
        # contribution = gap * bin mass (rounded composition)
        assert (
            abs(
                r["ece_contrib"]
                - round(r["abs_gap"] * r["n_docs"] / n_total, 6)
            )
            < 1e-9
        )
        # mean confidence lies inside (or within rounding of) the bin
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0 if r["bin"] < 9 else 1.0
        assert lo - 1e-4 <= r["avg_confidence"] <= hi + 1e-4
    # a trained ~AUC-0.95 model on this label should be reasonably
    # calibrated: total ECE well under random-guessing territory
    ece = sum(r["ece_contrib"] for r in rows)
    assert 0.0 <= ece < 0.5


# ---------------------------------------------------------------------------
# agg_kmv_theta_sketch: estimator + mergeability invariants
# ---------------------------------------------------------------------------


def test_kmv_sketch_invariants(spark, sf_dir):
    import target_parquet_spark.queries_r16  # noqa: F401  (registers)
    from target_parquet_spark.queries import QUERIES

    rows = {
        r["scope"]: r
        for r in QUERIES["agg_kmv_theta_sketch"](spark, sf_dir).collect()
    }
    assert "__merged" in rows and len(rows) >= 3
    per_type = {k: v for k, v in rows.items() if k != "__merged"}
    for r in rows.values():
        assert r["k"] == 32
        assert 0 < r["kth_hash"] < (1 << 60)
        if r["exact_distinct"] >= 32 and r["scope"] != "__merged":
            # saturated: the exact-integer KMV estimator applies
            assert r["est_distinct"] == (31 << 60) // r["kth_hash"]
            # k=32 keeps relative error sane (~18% std err)
            assert r["abs_err_pct"] < 80.0
        if r["scope"] != "__merged" and r["exact_distinct"] < 32:
            # unsaturated: the sketch IS the exact set
            assert r["est_distinct"] == r["exact_distinct"]
            assert r["abs_err_pct"] == 0.0
    # merged kth_hash is the k-th smallest of the union of per-type
    # pools, so it can't exceed any single pool's k-th hash
    assert rows["__merged"]["kth_hash"] <= min(
        r["kth_hash"] for r in per_type.values()
    )
    # merged estimates the GLOBAL distinct count, which is at most the
    # sum of the per-type exacts (overlap shrinks it)
    assert rows["__merged"]["exact_distinct"] <= sum(
        r["exact_distinct"] for r in per_type.values()
    )


# ---------------------------------------------------------------------------
# sql_pipe_syntax: pipe chains are sugar over the same ANSI plan
# ---------------------------------------------------------------------------


def test_pipe_syntax_matches_ansi_in_spark(spark, sf_dir):
    """Cross-engine equality is the oracle's job; this pins the
    WITHIN-Spark claim that |> chains produce the same rows as the
    ANSI formulation of the same computation."""
    import target_parquet_spark.queries_r16 as r16

    from target_parquet_spark.queries import QUERIES

    pipe = {
        r["event_type"]: r
        for r in QUERIES["sql_pipe_syntax"](spark, sf_dir).collect()
    }
    spark.sql("SELECT 1").collect()  # view registered by the query call
    ansi = {
        r["event_type"]: r
        for r in spark.sql(
            r16._SQL_PIPE_ORACLE.replace("FROM events", "FROM events_pipe")
        ).collect()
    }
    assert pipe.keys() == ansi.keys() and len(pipe) > 0
    for k in pipe:
        assert pipe[k].asDict() == ansi[k].asDict()


# ---------------------------------------------------------------------------
# scan_xml_source: entity escaping survives the round trip
# ---------------------------------------------------------------------------


def test_xml_roundtrip_escapes_entities(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'a < b & "c" > d'), (2, "it's <tag/> &amp; raw")],
        "id long, v string",
    )
    path = str(tmp_path / "xmlrt")
    df.write.format("xml").options(rootTag="rows", rowTag="row").save(path)
    back = (
        spark.read.schema("id long, v string")
        .format("xml")
        .option("rowTag", "row")
        .load(path)
    )
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in df.collect()
    }


# ---------------------------------------------------------------------------
# text_wordpiece_segment: greedy longest-match properties
# ---------------------------------------------------------------------------


def test_wordpiece_hand_check(spark, tmp_out):
    """Corpus 'abcd abcd ab cd': every n-gram of 'abcd' lands in the
    vocab, so greedy maximal munch takes whole words in one piece."""
    import target_parquet_spark.queries_r16  # noqa: F401  (registers)
    from pyspark.sql import functions as F

    from target_parquet_spark.queries import QUERIES

    (
        spark.createDataFrame(
            [(0, "abcd abcd ab cd")], "doc_id long, text string"
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{tmp_out}/documents.parquet")
    )
    got = {
        r["word"]: r
        for r in QUERIES["text_wordpiece_segment"](spark, tmp_out).collect()
    }
    assert set(got) == {"abcd", "ab", "cd"}
    assert got["abcd"]["segmentation"] == "abcd"
    assert got["abcd"]["n_pieces"] == 1
    assert got["abcd"]["n_occurrences"] == 2
    assert got["ab"]["segmentation"] == "ab"
    assert got["cd"]["segmentation"] == "cd"
    assert all(r["unconsumed"] == "" for r in got.values())


def test_wordpiece_reconstruction_invariant(spark, sf_dir):
    """Pieces with '##' markers stripped must concatenate back to the
    word, and greedy always terminates within the unroll budget."""
    import target_parquet_spark.queries_r16  # noqa: F401

    from target_parquet_spark.queries import QUERIES

    rows = QUERIES["text_wordpiece_segment"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["unconsumed"] == ""
        pieces = r["segmentation"].split(" ")
        assert len(pieces) == r["n_pieces"] >= 1
        rebuilt = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert rebuilt == r["word"]
        assert all(p.startswith("##") for p in pieces[1:])
        assert not pieces[0].startswith("##")


# ---------------------------------------------------------------------------
# EXIF ASCII tags: inline + out-of-line storage, header-only walk
# ---------------------------------------------------------------------------


def test_tiff_ascii_tags_roundtrip_both_forms():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    tags = {
        271: "C3",  # 3 bytes with NUL -> inline
        272: "MODEL-5",  # out-of-line
        305: "target-parquet-spark",
        306: "2024:01:07 12:33:00",
    }
    for bo in ("<", ">"):
        blob = M.encode_tiff(
            a, byte_order=bo, compression=32773, ascii_tags=tags
        )
        dec, info = M.decode_tiff(blob)
        assert np.array_equal(dec, a)
        assert info["ascii_tags"] == tags
        meta = M.tiff_metadata(blob)
        assert (meta["width"], meta["height"]) == (8, 8)
        assert meta["compression"] == 32773 and meta["n_strips"] == 2
        assert meta["ascii_tags"] == tags
    # tag-free payloads are unchanged
    assert M.decode_tiff(M.encode_tiff(a))[1]["ascii_tags"] == {}


def test_tiff_metadata_never_needs_strip_data():
    """The header-only walk must succeed even when every strip byte is
    gone — proof it reads no pixel data."""
    a = np.arange(96, dtype=np.uint8).reshape(12, 8)
    blob = bytearray(M.encode_tiff(a, ascii_tags={271: "CAM"}))
    # uncompressed strips are exactly the 96 pixel bytes, laid out
    # right after the 8-byte header: zero them all out
    blob[8 : 8 + 96] = b"\x00" * 96
    meta = M.tiff_metadata(bytes(blob))
    assert (meta["width"], meta["height"]) == (8, 12)
    assert meta["ascii_tags"][271] == "CAM"
    # the full decoder, by contrast, reads the (now zeroed) pixels
    dec, _ = M.decode_tiff(bytes(blob))
    assert not dec.any()


def test_exif_metadata_scan_end_to_end(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    media = M.attach_exif_tiff_media(docs, "doc_id")
    out = {r["media_id"]: r for r in M.tiff_metadata_scan(media).collect()}
    assert len(out) == 10
    for mid in range(10):
        r = out[mid]
        assert (r["width"], r["height"]) == (
            8 * (1 + mid % 3),
            4 * (1 + mid % 4),
        )
        assert r["make"] == f"C{mid % 7}"
        assert r["model"] == f"MODEL-{mid % 13}"
        assert r["software"] == "target-parquet-spark"
        assert r["datetime_tag"] == (
            f"2024:01:{1 + mid % 28:02d} 12:{mid % 60:02d}:00"
        )
        assert r["n_strips"] == (4 * (1 + mid % 4) + 3) // 4


def test_decode_tiff_images_end_to_end(spark):
    import hashlib as _h

    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    media = M.attach_tiff_media(docs, "doc_id")
    out = {r["media_id"]: r for r in M.decode_tiff_images(media).collect()}
    assert len(out) == 12
    for mid in range(12):
        w, h = 8 * (1 + mid % 3), 4 * (1 + mid % 4)
        y, x = np.mgrid[0:h, 0:w]
        px = ((mid * 37 + y * 17 + (x // 4) * 11) % 256).astype(np.uint8)
        r = out[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["byte_order"] == ("II" if mid % 2 == 0 else "MM")
        assert r["compression"] == (32773 if mid % 3 == 0 else 1)
        assert r["n_strips"] == (h + 3) // 4
        assert r["pixels_hash"] == _h.md5(
            px.tobytes().hex().upper().encode()
        ).hexdigest()
