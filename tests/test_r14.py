"""Round-9 tests: pure-Python PNG codec + compressed decode pipeline,
quantized kNN-graph candidate fold, Kneser-Ney broadcast threshold."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from target_parquet_spark.operators import multimodal as M


def _rand_img(h, w, ch=3, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


class TestPngCodec:
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("ch", [3, 4])
    def test_each_filter_type_roundtrips(self, ft, ch):
        """Planted filter coverage: an image encoded with EVERY row on
        one forced filter type must reconstruct exactly — None, Sub,
        Up, Average, and Paeth each round-trip on RGB and RGBA."""
        img = _rand_img(6, 9, ch, seed=ft * 10 + ch)
        data = M.encode_png(img, [ft] * 6)
        assert M.looks_like_png(data)
        assert np.array_equal(M.decode_png(data), img)

    @pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (5, 7), (9, 12), (1, 16)])
    def test_mixed_schedule_roundtrips(self, h, w):
        """Default y % 5 schedule chains the filters (a Paeth row
        reconstructs against a prior recovered by Average, etc.) —
        exactness requires the whole cross-row algebra to be right."""
        img = _rand_img(h, w)
        assert np.array_equal(M.decode_png(M.encode_png(img)), img)

    def test_idat_is_really_compressed(self):
        """The IDAT body must be a genuine deflate stream of
        filter-prefixed scanlines — inflate it independently and check
        the size contract h * (1 + w*3)."""
        img = _rand_img(5, 8)
        data = M.encode_png(img)
        # walk to IDAT by hand
        pos = 8
        body = None
        while pos + 8 <= len(data):
            (length,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            if tag == b"IDAT":
                body = data[pos + 8 : pos + 8 + length]
                break
            pos += 12 + length
        assert body is not None
        raw = zlib.decompress(body)
        assert len(raw) == 5 * (1 + 8 * 3)
        # filter bytes are the planted schedule y % 5
        assert [raw[y * 25] for y in range(5)] == [0, 1, 2, 3, 4]

    def test_crc_present_and_valid(self):
        data = M.encode_png(_rand_img(2, 2))
        (length,) = struct.unpack_from(">I", data, 8)
        chunk = data[12 : 16 + length]
        (crc,) = struct.unpack_from(">I", data, 16 + length)
        assert crc == (zlib.crc32(chunk) & 0xFFFFFFFF)

    def test_multiple_idat_segments_concatenate(self):
        """Real encoders split IDAT; the decoder must concatenate all
        segments before inflating.  Build a two-IDAT file by hand."""
        img = _rand_img(4, 6)
        data = M.encode_png(img)
        pos = 8
        while data[pos + 4 : pos + 8] != b"IDAT":
            (length,) = struct.unpack_from(">I", data, pos)
            pos += 12 + length
        (length,) = struct.unpack_from(">I", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        head, tail = data[:pos], data[pos + 12 + length :]
        mid = len(body) // 2

        def chunk(tag, b):
            return (
                struct.pack(">I", len(b))
                + tag
                + b
                + struct.pack(">I", zlib.crc32(tag + b) & 0xFFFFFFFF)
            )

        two = head + chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:]) + tail
        assert np.array_equal(M.decode_png(two), img)

    def test_unsupported_forms_raise_not_implemented(self):
        """r10 end state: every LEGAL PNG form decodes purely, so the
        NotImplementedError seam only fires for spec-illegal headers
        (tests/test_r15.py pins the legal lattice); headers that are
        legal but LIE about the layout are structural ValueErrors."""
        img = _rand_img(2, 2)
        data = bytearray(M.encode_png(img))
        bad = bytearray(data)
        bad[24] = 3  # depth 3: not legal for any color type
        assert not M.looks_like_png(bytes(bad))
        with pytest.raises(NotImplementedError):
            M.decode_png(bytes(bad))
        # headers that LIE about the layout: "palette" without a PLTE,
        # "gray+alpha" over RGB strides, "interlaced" over sequential
        # scanlines, "16-bit" over 8-bit strides — all in-subset for the
        # sniff now, all structural ValueErrors (never a silent
        # misdecode)
        for off, val in [(25, 3), (25, 4), (28, 1), (24, 16)]:
            bad = bytearray(data)
            bad[off] = val
            assert M.looks_like_png(bytes(bad))
            with pytest.raises(ValueError):
                M.decode_png(bytes(bad))

    def test_truncation_and_corruption_raise_value_error(self):
        data = M.encode_png(_rand_img(6, 8))
        with pytest.raises(ValueError):
            M.decode_png(data[: len(data) // 2])
        # corrupt the deflate stream
        bad = bytearray(data)
        bad[45] ^= 0xFF
        with pytest.raises(ValueError):
            M.decode_png(bytes(bad))

    def test_not_png_raises(self):
        with pytest.raises(ValueError):
            M.decode_png(b"definitely not a png payload....")
        assert not M.looks_like_png(b"\x89PNG\r\n\x1a\n" + b"x" * 10)

    def test_rgba_alpha_preserved_in_decode(self):
        img = _rand_img(4, 4, ch=4, seed=3)
        rec = M.decode_png(M.encode_png(img))
        assert rec.shape == (4, 4, 4)
        assert np.array_equal(rec, img)


class TestPngPipeline:
    def test_attach_decode_matches_generation_function(self, spark):
        """End-to-end through Spark: attach real PNGs for ids 0..39,
        decode+resize via decode_media, and compare the raw pixel bytes
        against the generation function computed directly in numpy —
        the same independence the DuckDB oracle enforces."""
        from target_parquet_spark.queries_r14 import _PNG_H, _PNG_W

        ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        media = M.attach_png_media(ids, "doc_id")
        out = {
            r["media_id"]: bytes(r["pixels"])
            for r in M.decode_media(
                media, target_width=_PNG_W, target_height=_PNG_H
            ).collect()
        }
        assert len(out) == 40
        for mid in range(40):
            w, h = 5 + mid % 8, 3 + mid % 6
            y = np.arange(h, dtype=np.int64)[:, None, None] * 89
            x = np.arange(w, dtype=np.int64)[None, :, None] * 29
            c = np.arange(3, dtype=np.int64)[None, None, :] * 47
            src = ((mid * 13 + y + x + c) % 256).astype(np.uint8)
            exp = M.nn_resize(src, _PNG_W, _PNG_H).tobytes()
            assert out[mid] == exp, f"id {mid}"

    def test_decode_media_routes_png_without_pil(self, spark):
        """The PNG path must not depend on pillow: route through
        decode_media with the PIL hook forced absent."""
        import target_parquet_spark.operators.multimodal as mm

        ids = spark.range(0, 5).withColumnRenamed("id", "doc_id")
        media = M.attach_png_media(ids, "doc_id")
        prev = mm._PIL_Image
        mm._PIL_Image = None
        try:
            rows = M.decode_media(media, 4, 4).collect()
        finally:
            mm._PIL_Image = prev
        assert len(rows) == 5
        assert all(len(bytes(r["pixels"])) == 4 * 4 * 3 for r in rows)


class TestKnnGraphQuantized:
    """VERDICT r8 #2: the SQ8/rerank kNN-graph scale path must stay
    within a pinned recall floor of the float fold and honor the
    planted-twin contract."""

    def test_recall_vs_float_fold(self, spark, sf_dir):
        from target_parquet_spark.operators import similarity as S

        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
        )
        exact = {
            (r["src"], r["nbr"])
            for r in S.knn_graph(emb, k=3).collect()
        }
        quant = {
            (r["src"], r["nbr"])
            for r in S.knn_graph_quantized(emb, k=3).collect()
        }
        assert exact, "float kNN graph is empty"
        recall = len(exact & quant) / len(exact)
        assert recall >= 0.95, f"quantized kNN recall {recall:.4f} < 0.95"

    def test_planted_twin_is_rank_one(self, spark, sf_dir):
        """An exact duplicate quantizes to identical codes and shares
        every bucket in every table: it must surface at rank 1 with
        sim 1.0 — the same contract the float scale path pins."""
        from target_parquet_spark.operators import similarity as S

        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
            .limit(200)
        )
        twin = emb.filter(F.col("vec_id") == 7).select(
            F.lit(999_999).cast("long").alias("vec_id"), "embedding"
        )
        g = S.knn_graph_quantized(emb.unionByName(twin), k=3)
        top = g.filter(
            (F.col("src") == 999_999) & (F.col("nbr_rank") == 1)
        ).collect()
        assert len(top) == 1
        assert top[0]["nbr"] == 7
        assert top[0]["sim"] == 1.0

    def test_exact_sims_on_surviving_edges(self, spark, sf_dir):
        """Edges the quantized path emits must carry the EXACT rounded
        float cosine (the rerank is a true float verify, not the
        quantized proxy): every (src, nbr, sim) it returns must equal
        the float path's sim for the same pair."""
        from target_parquet_spark.operators import similarity as S

        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
            .limit(300)
        )
        fsim = {
            (r["src"], r["nbr"]): r["sim"]
            for r in S.knn_graph(emb, k=3).collect()
        }
        for r in S.knn_graph_quantized(emb, k=3).collect():
            key = (r["src"], r["nbr"])
            if key in fsim:
                assert r["sim"] == fsim[key], key


class TestKneserNeyBroadcastGate:
    """VERDICT r8 #4: hist/cont are unigram-vocab-sized; the join
    strategy must be broadcast below _KN_BCAST_MAX_VOCAB and shuffle
    (sort-merge) above it, with identical algebra either way."""

    def _plan(self, spark, sf_dir):
        import target_parquet_spark.queries_r9 as r9

        df = r9.text_kneser_ney_logprob.__wrapped__(spark, sf_dir) if hasattr(
            r9.text_kneser_ney_logprob, "__wrapped__"
        ) else r9.text_kneser_ney_logprob(spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    def test_broadcast_below_smj_above(self, spark, sf_dir, monkeypatch):
        import target_parquet_spark.queries_r9 as r9

        # Disable auto-broadcast so the strategy visible in the plan is
        # OUR gate's decision, not the optimizer's size estimate.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            below = self._plan(spark, sf_dir)
            assert "BroadcastHashJoin" in below
            monkeypatch.setattr(r9, "_KN_BCAST_MAX_VOCAB", 0)
            above = self._plan(spark, sf_dir)
            assert "SortMergeJoin" in above
            assert "BroadcastHashJoin" not in above
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_result_identical_across_gate(self, spark, sf_dir, monkeypatch):
        import target_parquet_spark.queries_r9 as r9

        rows = lambda: sorted(  # noqa: E731
            (r["source"], r["n_docs"], r["mean_logprob_kn"], r["n_flagged"])
            for r in r9.text_kneser_ney_logprob(spark, sf_dir).collect()
        )
        base = rows()
        monkeypatch.setattr(r9, "_KN_BCAST_MAX_VOCAB", 0)
        assert rows() == base


class TestBmpGeometryGuards:
    """ADVICE r8: decode_bmp must reject bad geometry with clear errors
    before np.frombuffer, not opaque reshape failures."""

    def test_zero_width_rejected(self):
        data = bytearray(M.encode_bmp(_rand_img(2, 3)))
        struct.pack_into("<i", data, 18, 0)
        with pytest.raises(ValueError, match="dimensions"):
            M.decode_bmp(bytes(data))

    def test_out_of_range_offset_rejected(self):
        data = bytearray(M.encode_bmp(_rand_img(2, 3)))
        struct.pack_into("<I", data, 10, len(data) + 100)
        with pytest.raises(ValueError, match="out of range"):
            M.decode_bmp(bytes(data))

    def test_truncated_pixels_rejected(self):
        data = M.encode_bmp(_rand_img(4, 4))
        with pytest.raises(ValueError, match="out of range"):
            M.decode_bmp(data[:-8])


class TestWavCodec:
    """r9: the audio modality made real — mono PCM16 RIFF/WAVE encode/
    decode with zero audio libraries (the audio twin of the BMP/PNG
    codec tests above)."""

    @pytest.mark.parametrize("n,rate", [(1, 8000), (40, 8000), (77, 16000), (256, 44100)])
    def test_roundtrip(self, n, rate):
        rng = np.random.RandomState(n)
        s = rng.randint(-32768, 32768, size=n).astype("<i2")
        blob = M.encode_wav(s, rate)
        assert M.looks_like_wav(blob)
        out, r = M.decode_wav(blob)
        assert r == rate and np.array_equal(out, s)

    @pytest.mark.parametrize("body_len", [0, 1, 4, 5, 7, 8])
    def test_extra_chunk_padding_skipped(self, body_len):
        """RIFF pads odd-sized chunks to even byte boundaries; a decoder
        that skips LIST/cue chunks without honoring the pad byte walks
        off alignment and misparses everything after.  Plant bodies of
        both parities BEFORE data and require an exact roundtrip."""
        s = np.arange(-5, 6, dtype="<i2")
        blob = M.encode_wav(
            s, 8000, [(b"LIST", b"x" * body_len), (b"cue ", b"y" * (body_len + 1))]
        )
        out, rate = M.decode_wav(blob)
        assert rate == 8000 and np.array_equal(out, s)

    def test_avi_riff_rejected_by_sniff(self):
        """RIFF magic alone must not route to the WAV decoder — AVI is
        RIFF too (same rule as the BMP 'BM' sniff, review r8)."""
        assert not M.looks_like_wav(b"RIFF\x10\x00\x00\x00AVI LIST")
        with pytest.raises(ValueError, match="RIFF/WAVE"):
            M.decode_wav(b"RIFF\x10\x00\x00\x00AVI LIST")

    def test_truncated_chunk_rejected(self):
        blob = M.encode_wav(np.zeros(8, "<i2"))
        with pytest.raises(ValueError, match="overruns"):
            M.decode_wav(blob[:-4])

    def test_missing_data_chunk_rejected(self):
        import struct as _struct

        fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        blob = (
            _struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt), b"WAVE")
            + _struct.pack("<4sI", b"fmt ", len(fmt))
            + fmt
        )
        with pytest.raises(ValueError, match="missing"):
            M.decode_wav(blob)

    @pytest.mark.parametrize(
        "patch,msg",
        [({"channels": 2}, "channels=2"), ({"bits": 8}, "bits=8"), ({"fmt": 3}, "format=3")],
    )
    def test_unsupported_forms_raise_disclosed_seam(self, patch, msg):
        """Compressed / multichannel / non-16-bit WAV is the disclosed
        codec seam: NotImplementedError naming exactly what was seen."""
        import struct as _struct

        data = bytearray(M.encode_wav(np.zeros(4, "<i2")))
        # fmt chunk body starts at 20: format(H) channels(H) rate(I) ...
        if "fmt" in patch:
            _struct.pack_into("<H", data, 20, patch["fmt"])
        if "channels" in patch:
            _struct.pack_into("<H", data, 22, patch["channels"])
        if "bits" in patch:
            _struct.pack_into("<H", data, 34, patch["bits"])
        with pytest.raises(NotImplementedError, match=msg):
            M.decode_wav(bytes(data))

    def test_audio_features_integer_exact(self, spark):
        """End-to-end through the Spark seam: features from the decoded
        samples must equal the generation-function recomputation (the
        same contract the DuckDB oracle pins at sf0.01)."""
        ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
        feats = {
            r["media_id"]: r
            for r in M.audio_features(M.attach_wav_media(ids)).collect()
        }
        assert len(feats) == 12
        for mid in range(12):
            n = 40 + mid % 37
            t = np.arange(n, dtype=np.int64)
            s = ((mid * 31 + t * t * 7 + t * 13) % 4096) - 2048
            row = feats[mid]
            assert row["n_samples"] == n
            assert row["sample_rate"] == 8000
            assert row["duration_ms"] == n * 1000 // 8000
            assert row["energy"] == int((s * s).sum())
            assert row["zero_crossings"] == int((s[:-1] * s[1:] < 0).sum())
            assert np.array_equal(
                np.frombuffer(row["samples"], dtype="<i2"), s.astype("<i2")
            )


class TestJpegCodec:
    """r9: baseline JPEG — the dominant lossy web format — encoded and
    decoded pure-Python per the public T.81 spec.  Block-constant images
    round-trip EXACTLY (DC-only blocks with q00=8), which is what lets
    the multimodal_decode_jpeg oracle pin real Huffman/IDCT decode
    hash-exactly; arbitrary images are pinned by tolerance."""

    @pytest.mark.parametrize("hb,wb,dri", [(1, 2, 0), (2, 4, 0), (2, 3, 2), (3, 3, 1)])
    def test_block_constant_exact(self, hb, wb, dri):
        blocks = ((np.arange(hb)[:, None] * 17 + np.arange(wb)[None, :] * 11 + 5) % 256).astype(np.uint8)
        img = np.kron(blocks, np.ones((8, 8), np.uint8))
        blob = M.encode_jpeg(img, restart_interval=dri)
        assert M.looks_like_jpeg(blob)
        assert np.array_equal(M.decode_jpeg(blob), img)

    def test_block_constant_exact_odd_dims(self):
        """Edge-replicated padding keeps partial blocks constant, so
        non-multiple-of-8 dimensions stay exact too."""
        blocks = ((np.arange(3)[:, None] * 17 + np.arange(4)[None, :] * 11) % 256).astype(np.uint8)
        img = np.kron(blocks, np.ones((8, 8), np.uint8))[:20, :27]
        assert np.array_equal(M.decode_jpeg(M.encode_jpeg(img)), img)

    @pytest.mark.parametrize("shape", [(24, 33), (8, 8), (17, 9)])
    def test_random_gray_tolerance(self, shape):
        """With an all-ones quant table the only loss is DCT/IDCT float
        rounding — reconstruction must stay within +/-2 of the source."""
        rng = np.random.RandomState(shape[0])
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        out = M.decode_jpeg(M.encode_jpeg(img, qtable=[1] * 64))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_random_rgb_tolerance(self):
        """4:4:4 color adds the BT.601 YCbCr round trip on top."""
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        out = M.decode_jpeg(M.encode_jpeg(img, qtable=[1] * 64))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    def test_entropy_data_is_really_huffman(self):
        """The scan must be genuine variable-length entropy data: two
        images differing in one block value produce different-length
        streams (amplitude bits track DC categories), and the stream is
        far smaller than the raw pixels for a block-constant image."""
        blocks = np.full((2, 4), 100, np.uint8)
        a = M.encode_jpeg(np.kron(blocks, np.ones((8, 8), np.uint8)))
        blocks[1, 2] = 255
        b = M.encode_jpeg(np.kron(blocks, np.ones((8, 8), np.uint8)))
        assert len(a) != len(b)
        assert len(a) < 8 * 2 * 8 * 4  # way under 1 byte/pixel

    def test_restart_markers_present_and_resequenced(self):
        img = np.kron(np.arange(8, dtype=np.uint8).reshape(2, 4) * 30, np.ones((8, 8), np.uint8))
        blob = M.encode_jpeg(img, restart_interval=2)
        assert b"\xff\xd0" in blob and b"\xff\xd1" in blob and b"\xff\xd2" in blob
        assert np.array_equal(M.decode_jpeg(blob), img)
        # out-of-sequence restart must be rejected, not silently accepted
        broken = blob.replace(b"\xff\xd1", b"\xff\xd3", 1)
        with pytest.raises(ValueError, match="out of sequence"):
            M.decode_jpeg(broken)

    def test_progressive_raises_disclosed_seam(self):
        blob = M.encode_jpeg(np.zeros((8, 8), np.uint8))
        bad = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
        assert not M.looks_like_jpeg(bad)
        with pytest.raises(NotImplementedError, match="SOF"):
            M.decode_jpeg(bad)

    def test_sampling_mismatch_is_structural_error(self):
        """r10 moved 2x2 sampling INSIDE the decoder's subset (real
        4:2:0 decode — tests/test_r15.py pins it against the stdlib's
        python.jpg), so a header that CLAIMS 2x2 over a 4:4:4 entropy
        stream is no longer the disclosed seam: the sniff accepts it
        and the decoder fails structurally (the stream runs out of
        blocks), never silently misdecodes.  Factors above 2 remain
        the disclosed NotImplementedError (also in test_r15)."""
        rgb = np.zeros((8, 8, 3), np.uint8)
        blob = bytearray(M.encode_jpeg(rgb))
        # SOF0 component 1 sampling byte: find SOF0, comp data at +10
        i = bytes(blob).index(b"\xff\xc0")
        blob[i + 5 + 6] = 0x22  # claim 2x2 sampling for component 1
        assert M.looks_like_jpeg(bytes(blob))
        with pytest.raises(ValueError):
            M.decode_jpeg(bytes(blob))

    def test_truncated_rejected(self):
        blob = M.encode_jpeg(np.full((8, 8), 77, np.uint8))
        with pytest.raises(ValueError):
            M.decode_jpeg(blob[:30])

    def test_decode_media_routes_jpeg(self, spark):
        """End-to-end through the Spark seam: gray JPEG decodes replicate
        to RGB and resize, matching the generation function exactly."""
        ids = spark.range(0, 6).select(F.col("id").alias("doc_id"))
        out = M.decode_media(
            M.attach_jpeg_media(ids), target_width=9, target_height=3
        ).collect()
        assert len(out) == 6
        for row in out:
            mid = row["media_id"]
            wb, hb = 2 + mid % 3, 1 + mid % 2
            w, h = 8 * wb, 8 * hb
            pix = np.frombuffer(row["pixels"], np.uint8).reshape(3, 9, 3)
            for Y in range(3):
                for X in range(9):
                    by, bx = ((Y * h) // 3) // 8, ((X * w) // 9) // 8
                    v = (mid * 37 + by * 17 + bx * 11) % 256
                    assert tuple(pix[Y, X]) == (v, v, v)


class TestAviContainer:
    """r9: the video modality made real — AVI/MJPEG demux (nested RIFF
    walk) + per-frame JPEG decode, zero media libraries."""

    def _clip(self, mid):
        nf, wb, hb = 2 + mid % 3, 2 + mid % 2, 1 + mid % 2
        frames = []
        for f in range(nf):
            blocks = ((mid * 37 + f * 53 + np.arange(hb)[:, None] * 17
                       + np.arange(wb)[None, :] * 11) % 256).astype(np.uint8)
            frames.append(M.encode_jpeg(np.kron(blocks, np.ones((8, 8), np.uint8))))
        return M.encode_avi(frames, wb * 8, hb * 8), nf, wb * 8, hb * 8

    @pytest.mark.parametrize("mid", [0, 1, 2, 3, 4, 5])
    def test_container_roundtrip(self, mid):
        blob, nf, w, h = self._clip(mid)
        assert M.looks_like_avi(blob)
        frames, n_declared, dw, dh = M.decode_avi_frames(blob)
        assert n_declared == nf == len(frames) and (dw, dh) == (w, h)
        for f, payload in enumerate(frames):
            img = M.decode_jpeg(payload)
            assert img.shape == (h, w)
            assert img[0, 0] == (mid * 37 + f * 53) % 256

    def test_wave_riff_rejected_by_sniff(self):
        blob = M.encode_wav(np.zeros(4, "<i2"))
        assert not M.looks_like_avi(blob)
        with pytest.raises(ValueError, match="RIFF/AVI"):
            M.decode_avi_frames(blob)

    def test_foreign_codec_raises_disclosed_seam(self):
        blob, *_ = self._clip(1)
        with pytest.raises(NotImplementedError, match="H264"):
            M.decode_avi_frames(blob.replace(b"MJPG", b"H264"))

    def test_truncated_rejected(self):
        blob, *_ = self._clip(2)
        with pytest.raises(ValueError, match="overruns"):
            M.decode_avi_frames(blob[:100])

    def test_frame_count_cross_checked(self, spark):
        """decode_video_frames must reject a container whose avih count
        disagrees with the movi chunks rather than silently truncate."""
        import struct

        blob, nf, w, h = self._clip(2)
        broken = bytearray(blob)
        i = bytes(broken).index(b"avih") + 8 + 16  # dwTotalFrames field
        struct.pack_into("<I", broken, i, nf + 1)
        frames, n_declared, *_ = M.decode_avi_frames(bytes(broken))
        assert n_declared == nf + 1 and len(frames) == nf
        ids = spark.range(0, 1).select(F.col("id").alias("doc_id"))
        bad_df = M.attach_avi_media(ids).limit(1).select(
            "media_id", F.lit(bytes(broken)).alias("media")
        )
        with pytest.raises(Exception, match="declares"):
            M.decode_video_frames(bad_df).collect()

    def test_decode_video_frames_end_to_end(self, spark):
        ids = spark.range(0, 6).select(F.col("id").alias("doc_id"))
        rows = M.decode_video_frames(M.attach_avi_media(ids)).collect()
        assert len(rows) == sum(2 + mid % 3 for mid in range(6))
        for row in rows:
            mid, f = row["media_id"], row["frame_idx"]
            wb, hb = 2 + mid % 2, 1 + mid % 2
            assert (row["width"], row["height"]) == (wb * 8, hb * 8)
            pix = np.frombuffer(row["pixels"], np.uint8).reshape(hb * 8, wb * 8)
            for by in range(hb):
                for bx in range(wb):
                    v = (mid * 37 + f * 53 + by * 17 + bx * 11) % 256
                    assert (pix[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == v).all()


class TestAudioVad:
    """r9: energy-threshold VAD over decoded WAV — numpy run extraction
    must equal the relational gaps-and-islands semantics."""

    def test_segments_match_bruteforce(self, spark):
        ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
        got = {}
        for r in M.audio_vad_segments(M.attach_wav_media(ids), 1024).collect():
            got.setdefault(r["media_id"], []).append(
                (r["seg_idx"], r["start_sample"], r["end_sample"], r["n_samples"], r["peak"])
            )
        for mid in range(20):
            n = 40 + mid % 37
            t = np.arange(n, dtype=np.int64)
            s = ((mid * 31 + t * t * 7 + t * 13) % 4096) - 2048
            a = np.abs(s)
            exp, start = [], None
            for i in range(n + 1):
                on = i < n and a[i] > 1024
                if on and start is None:
                    start = i
                elif not on and start is not None:
                    exp.append((len(exp), start, i - 1, i - start, int(a[start:i].max())))
                    start = None
            assert sorted(got.get(mid, [])) == exp, mid

    def test_all_quiet_clip_yields_no_rows(self, spark):
        ids = spark.range(0, 3).select(F.col("id").alias("doc_id"))
        media = M.attach_wav_media(ids)
        assert M.audio_vad_segments(media, threshold=3000).count() == 0


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    query.stop()


def _prof_rows(df):
    return sorted(
        (r["format"], r["n_items"], r["total_units"], r["value_sum"])
        for r in df.collect()
    )


class TestMixedMediaProfile:
    """r9: sniff-routed mixed-modality census over real decodes, batch
    and streaming twin."""

    def test_mixed_routing_covers_all_formats(self, spark):
        ids = spark.range(0, 25).select(F.col("id").alias("doc_id"))
        prof = M.media_profile(M.attach_mixed_media(ids)).collect()
        assert len(prof) == 25
        by_fmt = {}
        for r in prof:
            by_fmt.setdefault(r["format"], []).append(r["media_id"])
        assert set(by_fmt) == {"bmp", "png", "jpeg", "wav", "avi"}
        for fmt, mids in by_fmt.items():
            assert len(mids) == 5
            assert len({m % 5 for m in mids}) == 1  # routing is id % 5

    def test_profile_matches_dedicated_decoders(self, spark):
        """The mixed profile must agree with the per-format decoders on
        every item — any drift between attach_mixed_media's generation
        and the dedicated attach functions breaks this."""
        ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        prof = {r["media_id"]: r for r in M.media_profile(M.attach_mixed_media(ids)).collect()}
        for mid in range(10):
            r = prof[mid]
            kind = mid % 5
            if kind == 0:
                w, h = 4 + mid % 9, 3 + mid % 7
                y = np.arange(h)[:, None, None] * 131
                x = np.arange(w)[None, :, None] * 17
                c = np.arange(3)[None, None, :] * 59
                arr = (mid * 7 + y + x + c) % 256
                assert (r["format"], r["n_units"], r["value_sum"]) == ("bmp", arr.size, int(arr.sum()))
            elif kind == 3:
                n = 40 + mid % 37
                t = np.arange(n, dtype=np.int64)
                s = ((mid * 31 + t * t * 7 + t * 13) % 4096) - 2048
                assert (r["format"], r["n_units"], r["value_sum"]) == ("wav", n, int((s * s).sum()))

    def test_streaming_twin_equals_batch(self, spark, tmp_path):
        from target_parquet_spark.queries_r14 import corpus_profile_over
        from target_parquet_spark.streaming.media_profile import StreamingMediaProfile

        ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
        media = M.attach_mixed_media(ids)
        src = str(tmp_path / "media_src")
        media.repartition(4).write.parquet(src)
        schema = spark.read.parquet(src).schema

        want = _prof_rows(corpus_profile_over(spark.read.parquet(src)))

        st = StreamingMediaProfile(spark, str(tmp_path / "prof"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        _await(st.start(stream, available_now=True))
        assert _prof_rows(st.read_profile()) == want

        # replay idempotence: re-delivering an epoch overwrites its partial
        half = spark.read.parquet(src).limit(7)
        st._merge_batch(half, 0)
        after = _prof_rows(st.read_profile())
        st._merge_batch(half, 0)
        assert _prof_rows(st.read_profile()) == after

        # compaction folds partials without changing the read path
        st.compact()
        assert _prof_rows(st.read_profile()) == after


class TestContentDedup:
    """r9: dedup below the container — same pixels as BMP and PNG share
    no bytes but must share a content key."""

    def test_pairs_share_key_and_no_bytes(self, spark):
        ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
        media = {r["media_id"]: bytes(r["media"])
                 for r in M.attach_image_pair_media(ids).collect()}
        keys = {r["media_id"]: (r["format"], r["content_key"])
                for r in M.image_content_keys(M.attach_image_pair_media(ids)).collect()}
        for p in range(8):
            bmp, png = media[2 * p], media[2 * p + 1]
            # containers are byte-disjoint beyond trivial header overlap
            assert bmp[:2] == b"BM" and png[:8] == b"\x89PNG\r\n\x1a\n"
            assert keys[2 * p][0] == "bmp" and keys[2 * p + 1][0] == "png"
            assert keys[2 * p][1] == keys[2 * p + 1][1]
        # distinct ids -> distinct content below the collision period
        assert len({v[1] for v in keys.values()}) == 8

    def test_jpeg_content_key_matches_when_lossless(self):
        """A block-constant JPEG decodes to exactly its source pixels, so
        its content key equals the BMP encoding of the same image."""
        import hashlib

        blocks = ((np.arange(2)[:, None] * 17 + np.arange(3)[None, :] * 11) % 256).astype(np.uint8)
        gray = np.kron(blocks, np.ones((8, 8), np.uint8))
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        want = hashlib.md5(rgb.tobytes().hex().upper().encode()).hexdigest()
        jf = M.decode_jpeg(M.encode_jpeg(gray))
        got = hashlib.md5(
            np.repeat(jf[:, :, None], 3, axis=2).tobytes().hex().upper().encode()
        ).hexdigest()
        assert got == want


class TestGifCodec:
    """Pure-Python GIF87a/89a + LZW (r9): dictionary coding joins the
    uncompressed (BMP), deflate (PNG), and transform (JPEG) families
    through the same codec seam."""

    @staticmethod
    def _idx(mid, h, w):
        y = np.arange(h, dtype=np.int64)[:, None] * 97
        x = np.arange(w, dtype=np.int64)[None, :] * 23
        return ((mid * 11 + y + x) % 256).astype(np.uint8)

    @staticmethod
    def _pal():
        return np.frombuffer(M.gif_palette(), np.uint8).reshape(256, 3)

    @pytest.mark.parametrize("mid", [0, 1, 2, 3, 11, 34])
    def test_roundtrip_both_versions(self, mid):
        """87a (even ids) and 89a-with-extensions (odd ids) both decode
        to palette[index] exactly — the block walk must skip the planted
        graphic-control and comment extensions by sub-block framing."""
        w, h = 6 + mid % 7, 4 + mid % 5
        idx = self._idx(mid, h, w)
        blob = M.encode_gif(
            idx, version=b"89a" if mid % 2 else b"87a",
            extensions=bool(mid % 2),
        )
        assert M.looks_like_gif(blob)
        assert np.array_equal(M.decode_gif(blob), self._pal()[idx])

    def test_width_growth_and_dictionary_reset(self):
        """A 200x150 high-entropy index image forces the LZW code width
        through 9 -> 10 -> 11 -> 12 bits and past the 4096-entry
        dictionary reset.  The standard giflib bump (encoder at
        next_code == 2^w + 1, decoder at next_index == 2^w — the
        decoder's one-entry table lag absorbed by the offset) keeps
        both widths in lockstep; any asymmetry desyncs at the first
        boundary (~data code #255 after a clear) and corrupts
        everything beyond it.  External-fixture and independent-decoder
        checks live in tests/test_r15.py (r10, ADVICE r9 fix)."""
        big = ((np.arange(200 * 150).reshape(200, 150) * 7919) % 256).astype(
            np.uint8
        )
        assert np.array_equal(M.decode_gif(M.encode_gif(big)), self._pal()[big])

    def test_lzw_kwkwk_and_saturation(self):
        """Raw LZW invariants: the KwKwK self-referencing code (runs like
        ababab... emit a code the decoder has not finished defining) and
        a 30k high-entropy stream that saturates the table and forces a
        mid-stream clear both round-trip byte-exactly."""
        ab = bytes([97, 98] * 100)
        assert M._lzw_decompress(M._lzw_compress(ab)) == ab
        runs = bytes([1, 1] * 5000)
        assert M._lzw_decompress(M._lzw_compress(runs)) == runs
        rng = np.random.RandomState(13)
        noisy = rng.randint(0, 256, 30000, dtype=np.uint8).tobytes()
        assert M._lzw_decompress(M._lzw_compress(noisy)) == noisy

    def test_one_pixel_and_sniff_negatives(self):
        one = np.array([[42]], np.uint8)
        assert np.array_equal(M.decode_gif(M.encode_gif(one)), self._pal()[one])
        assert not M.looks_like_gif(b"GIF87a")  # magic but no descriptor
        assert not M.looks_like_gif(b"NOTGIF" + b"\x00" * 20)

    def test_interlaced_frames_deinterlace(self):
        """Interlaced frames deinterlace via the four-pass row order of
        spec appendix E (r10 — was a disclosed NotImplementedError
        through r9).  Encode the stored-row permutation of a source
        image, set the interlace flag, and the decode must equal the
        ORIGINAL image."""
        idx = self._idx(3, 20, 9)
        order = M.deinterlace_rows(20)
        blob = bytearray(M.encode_gif(idx[order]))
        i = blob.index(0x2C, 13 + 768)  # image descriptor after GCT
        blob[i + 9] |= 0x40
        assert np.array_equal(M.decode_gif(bytes(blob)), self._pal()[idx])

    def test_truncation_and_corruption_guards(self):
        blob = M.encode_gif(self._idx(5, 4, 7))
        with pytest.raises(ValueError):
            M.decode_gif(blob[: len(blob) // 2])  # truncated image data
        with pytest.raises(ValueError):
            M.decode_gif(b"GIF87a" + blob[6:12])  # truncated descriptor
        # index stream size contract: claim a larger frame than encoded
        bad = bytearray(blob)
        i = bad.index(0x2C, 13 + 768)
        bad[i + 5] += 1  # bump descriptor width
        with pytest.raises(ValueError):
            M.decode_gif(bytes(bad))

    def test_attach_decode_matches_generation_function(self, spark):
        """End-to-end through Spark: attach real GIFs for ids 0..39,
        decode+resize via decode_media, compare raw pixels against
        palette-composed generation functions computed directly in
        numpy — the same independence the DuckDB oracle enforces."""
        from target_parquet_spark.queries_r14 import _GIF_H, _GIF_W

        ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_media(ids, "doc_id")
        out = {
            r["media_id"]: bytes(r["pixels"])
            for r in M.decode_media(
                media, target_width=_GIF_W, target_height=_GIF_H
            ).collect()
        }
        assert len(out) == 40
        pal = self._pal()
        for mid in range(40):
            w, h = 6 + mid % 7, 4 + mid % 5
            src = pal[self._idx(mid, h, w)]
            exp = M.nn_resize(src, _GIF_W, _GIF_H).tobytes()
            assert out[mid] == exp, f"id {mid}"

    def test_decode_media_routes_gif_without_pil(self, spark):
        import target_parquet_spark.operators.multimodal as mm

        ids = spark.range(0, 5).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_media(ids, "doc_id")
        prev = mm._PIL_Image
        mm._PIL_Image = None
        try:
            rows = M.decode_media(media, 4, 4).collect()
        finally:
            mm._PIL_Image = prev
        assert len(rows) == 5
        assert all(len(bytes(r["pixels"])) == 4 * 4 * 3 for r in rows)
