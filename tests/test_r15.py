"""Round-10 tests: GIF LZW width-bump fix against external fixtures and
an independent spec-rule decoder (ADVICE r9 high), PIL fallback routing
in decode_media (ADVICE r9 medium)."""

import glob
import os

import numpy as np
import pytest

from target_parquet_spark.operators import multimodal as M


def _external_gifs():
    """Standard-encoder GIF fixtures shipped with the runtime python
    (idlelib's Tk icons) — encoded by real giflib-rule encoders, so any
    width-bump off-by-one in the decoder trips on them even though
    fabricated <=96-pixel GIFs never cross a width boundary."""
    try:
        import idlelib
    except ImportError:  # pragma: no cover - stdlib module
        return []
    d = os.path.join(os.path.dirname(idlelib.__file__), "Icons")
    return sorted(glob.glob(os.path.join(d, "*.gif")))


def _ref_lzw_decode(stream: bytes, mcs: int = 8) -> bytes:
    """Independent GIF-LZW decoder written straight from the GIF89a
    spec (appendix F) / giflib rule — deliberately structured unlike
    target_parquet_spark.operators.multimodal._lzw_decompress (dict
    table, bit-list reader) so a shared bug can't hide: decoder width
    grows when next_index reaches 2^width, and GIF has NO TIFF-style
    early change."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = [(byte >> i) & 1 for byte in stream for i in range(8)]
    pos = 0

    def take(width: int) -> int:
        nonlocal pos
        if pos + width > len(bits):
            raise ValueError("ref decoder: stream ended without EOI")
        v = sum(bits[pos + i] << i for i in range(width))
        pos += width
        return v

    def fresh():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, mcs + 1

    table, nxt, width = fresh()
    out = bytearray()
    prev = None
    while True:
        code = take(width)
        if code == clear:
            table, nxt, width = fresh()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            cur = table[code]
        else:
            if code in table:
                cur = table[code]
            else:
                assert code == nxt, f"ref decoder: code {code} != next {nxt}"
                cur = prev + prev[:1]
            if nxt < 4096:
                table[nxt] = prev + cur[:1]
                nxt += 1
                if nxt == (1 << width) and width < 12:
                    width += 1
        out.extend(cur)
        prev = cur
    raise AssertionError("unreachable")


class TestGifStandardWidthBump:
    """ADVICE r9 (high): r9's codec used a TIFF-style early width change
    on both sides — self-consistent, so every in-repo round trip passed,
    but decode_gif failed on essentially every real-world GIF and
    encode_gif output beyond ~254 new codes was undecodable by standard
    decoders.  r10 moved both sides to the standard rule (encoder bump
    at next_code == 2^w + 1, decoder at next_index == 2^w); these tests
    pin it against artifacts the repo did not produce."""

    def test_external_fixtures_decode(self):
        """Every non-interlaced externally-encoded GIF must decode with
        dimensions matching its own descriptor; under the r9 early-bump
        rule all of these raised 'LZW code N beyond table M'."""
        import struct

        fixtures = _external_gifs()
        if not fixtures:
            pytest.skip("no external GIF fixtures on this python")
        decoded = 0
        for path in fixtures:
            data = open(path, "rb").read()
            assert M.looks_like_gif(data)
            try:
                arr = M.decode_gif(data)
            except NotImplementedError:
                continue  # interlaced: outside the pure decoder's subset
            # frame dims live in the image descriptor, not the LSD;
            # for these single-frame icons the two agree
            sw, sh = struct.unpack_from("<HH", data, 6)
            assert arr.shape == (sh, sw, 3), path
            assert arr.dtype == np.uint8
            decoded += 1
        assert decoded >= 5, f"only {decoded} non-interlaced fixtures decoded"

    @pytest.mark.parametrize("n", [2_000, 40_000])
    def test_encoder_output_decodes_under_independent_spec_decoder(self, n):
        """_lzw_compress output crossing the 512/1024/2048 width
        boundaries (and, at 40k, the 4096-entry table reset) must be
        decodable by a decoder written independently from the spec —
        the exact property real-world decoders (PIL, browsers) need."""
        rng = np.random.RandomState(n)
        raw = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
        packed = M._lzw_compress(raw)
        assert _ref_lzw_decode(packed) == raw
        # and the repo decoder agrees with the independent one
        assert M._lzw_decompress(packed) == raw

    def test_low_entropy_boundary_crossing(self):
        """Run-heavy input grows the table one code per long match —
        boundary codes land far apart in the bit stream, a different
        alignment regime from the high-entropy case."""
        raw = bytes([i % 4 for i in range(20_000)])
        packed = M._lzw_compress(raw)
        assert _ref_lzw_decode(packed) == raw
        assert M._lzw_decompress(packed) == raw

    def test_external_fixture_matches_independent_decoder(self):
        """Full-file agreement on a real artifact: repo decode_gif's
        palette-mapped pixels equal the independent LZW decode mapped
        through the same color table."""
        import struct

        fixtures = [p for p in _external_gifs() if p.endswith("python.gif")]
        if not fixtures:
            pytest.skip("python.gif fixture not present")
        data = open(fixtures[0], "rb").read()
        arr = M.decode_gif(data)
        # hand-walk: LSD + global color table + blocks, mirroring the
        # repo decoder's framing but decoding via _ref_lzw_decode
        sw, sh, packed_f, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
        pos = 13
        assert packed_f & 0x80
        ncol = 2 << (packed_f & 0x07)
        pal = np.frombuffer(data, np.uint8, ncol * 3, pos).reshape(ncol, 3)
        pos += ncol * 3
        while data[pos] == 0x21:  # skip extensions
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        assert data[pos] == 0x2C
        _l, _t, w, h, ip = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        assert not (ip & 0xC0)  # no local table, not interlaced
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            size = data[pos]
            lzw.extend(data[pos + 1 : pos + 1 + size])
            pos += 1 + size
        idx = np.frombuffer(_ref_lzw_decode(bytes(lzw), mcs), np.uint8)
        assert np.array_equal(arr, pal[idx.reshape(h, w)])


class TestDecodeMediaPilFallback:
    """ADVICE r9 (medium): decode_media routed every GIF/PNG/JPEG payload
    to the pure decoder unconditionally, so with pillow installed a
    payload beyond the pure subset (chroma-subsampled or progressive
    JPEG, paletted PNG) failed the whole Spark task even though PIL
    could decode it.  The pure decoder still runs first (oracle pins
    stay PIL-independent); PIL is the fallback on
    NotImplementedError/ValueError.  (The trigger payload was an
    interlaced GIF until r10 taught the pure decoder to deinterlace;
    now it is a GIF whose LZW stream is truncated mid-data — passes the
    sniff, raises ValueError in the strict pure decoder, while a
    lenient real-world decoder like PIL can still salvage it.  The
    subset-violating JPEG/PNG forms can't serve here: their sniffs are
    subset-tight, so decode_media routes them to the PIL-or-raise
    branch without ever consulting the pure decoder.)"""

    @staticmethod
    def _beyond_pure_subset_gif():
        idx = ((np.arange(18 * 11).reshape(18, 11) * 31) % 256).astype(
            np.uint8
        )
        blob = M.encode_gif(idx)
        # strip the sub-block framing, truncate the LZW stream, reframe
        # descriptor = 0x2C + 9 bytes, then the min_code byte: framing
        # starts 11 past the descriptor marker
        i = blob.index(0x2C, 13 + 768) + 11
        lzw = bytearray()
        pos = i
        while blob[pos]:
            size = blob[pos]
            lzw.extend(blob[pos + 1 : pos + 1 + size])
            pos += 1 + size
        cut = bytes(lzw[:-6])
        parts = [blob[:i]]
        for j in range(0, len(cut), 255):
            parts.append(bytes([len(cut[j : j + 255])]) + cut[j : j + 255])
        parts.append(b"\x00\x3b")
        data = b"".join(parts)
        assert M.looks_like_gif(data)
        with pytest.raises(ValueError):
            M.decode_gif(data)  # precondition: strict decoder rejects
        return data

    def test_fallback_reaches_pil_when_available(self, spark):
        """With a fake PIL planted, a beyond-subset GIF payload decodes
        through the fallback instead of failing the task."""
        import pandas as pd

        import target_parquet_spark.operators.multimodal as mm

        class _FakeImg:
            def convert(self, mode):
                return self

            def resize(self, wh):
                self._wh = wh
                return self

            def tobytes(self):
                w, h = self._wh
                return b"\x5a" * (w * h * 3)

        class _FakePIL:
            @staticmethod
            def open(buf):
                return _FakeImg()

        blob = self._beyond_pure_subset_gif()
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [1], "media": [blob]})
        )
        prev = mm._PIL_Image
        mm._PIL_Image = _FakePIL
        try:
            rows = M.decode_media(df, 4, 4).collect()
        finally:
            mm._PIL_Image = prev
        assert len(rows) == 1
        assert bytes(rows[0]["pixels"]) == b"\x5a" * 48

    def test_without_pil_still_raises_disclosed(self, spark):
        """No pillow -> the pure decoder's diagnostic still propagates
        (the fallback must not swallow it)."""
        import pandas as pd

        import target_parquet_spark.operators.multimodal as mm

        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [1], "media": [self._beyond_pure_subset_gif()]})
        )
        prev = mm._PIL_Image
        mm._PIL_Image = None
        try:
            with pytest.raises(Exception) as ei:
                M.decode_media(df, 4, 4).collect()
        finally:
            mm._PIL_Image = prev
        assert "EOI" in str(ei.value) or "wrong size" in str(ei.value)

    def test_pure_path_still_owns_fabricated_corpus(self, spark):
        """With a poison PIL planted, fabricated (non-interlaced) GIFs
        must STILL decode via the pure path — proving oracle pins never
        depend on pillow's presence."""
        import target_parquet_spark.operators.multimodal as mm

        class _PoisonPIL:
            @staticmethod
            def open(buf):  # pragma: no cover - must never run
                raise AssertionError("PIL reached for a pure-subset GIF")

        ids = spark.range(0, 3).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_media(ids, "doc_id")
        prev = mm._PIL_Image
        mm._PIL_Image = _PoisonPIL
        try:
            rows = M.decode_media(media, 4, 4).collect()
        finally:
            mm._PIL_Image = prev
        assert len(rows) == 3
        assert all(len(bytes(r["pixels"])) == 48 for r in rows)


class TestRecompressAndDhashDecoded:
    """VERDICT r9 #8: perceptual near-dup pinned through real
    compression round trips."""

    def test_recompress_flips_container_keeps_pixels(self):
        idx = ((np.arange(30).reshape(5, 6) * 31 + 7) % 256).astype(np.uint8)
        a = M.encode_gif(idx, version=b"87a")
        b = M.recompress_gif(a)
        assert b != a
        assert b[3:6] == b"89a" and a[3:6] == b"87a"
        assert np.array_equal(M.decode_gif(a), M.decode_gif(b))
        # and the round trip is an involution on the pixel content
        c = M.recompress_gif(b)
        assert c[3:6] == b"87a"
        assert np.array_equal(M.decode_gif(c), M.decode_gif(a))

    def test_recompress_rejects_foreign_palette(self):
        """A GIF whose pixels did not come from the fabrication palette
        must be rejected, not silently mis-inverted."""
        fixtures = _external_gifs()
        data = None
        for p in fixtures:
            try:
                M.decode_gif(open(p, "rb").read())
            except NotImplementedError:
                continue
            data = open(p, "rb").read()
            break
        if data is None:
            pytest.skip("no decodable external GIF fixture")
        with pytest.raises(ValueError):
            M.recompress_gif(data)

    def test_planted_pair_surfaces_at_hamming_zero(self, spark):
        ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_pair_media(ids, "doc_id", offset=1_000_000)
        assert media.count() == 40
        hashed = M.dhash_decoded(media, rows=7, cols=8)
        pairs = M.phash_near_dup_pairs(
            hashed, bands=4, band_bits=14, max_hamming=3, id_col="media_id"
        )
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
        for i in range(20):
            assert got.get((i, i + 1_000_000)) == 0, f"planted pair {i}"

    def test_dhash_matches_generation_function(self, spark):
        """Spark dHash over decoded pixels == numpy replay of the
        generation functions (the same independence the oracle has)."""
        ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_media(ids, "doc_id")
        got = {
            r["media_id"]: r["phash"]
            for r in M.dhash_decoded(media, rows=7, cols=8).collect()
        }
        pal = np.frombuffer(M.gif_palette(), np.uint8).reshape(256, 3)
        for mid in range(12):
            w, h = 6 + mid % 7, 4 + mid % 5
            y = np.arange(h)[:, None] * 97
            x = np.arange(w)[None, :] * 23
            src = pal[((mid * 11 + y + x) % 256).astype(np.uint8)]
            grid = M.nn_resize(src, 9, 7)
            gray = grid.astype(np.int64).sum(axis=2) // 3
            bits = (gray[:, :-1] > gray[:, 1:]).ravel()
            exp = int((bits * (1 << np.arange(56, dtype=np.object_))).sum())
            assert got[mid] == exp, f"id {mid}"


class TestNativeCodecRouting:
    """VERDICT r9 #3: SPARK_GRAFT_NATIVE_CODECS routes whole image
    payloads through PIL when importable (decode only — nn_resize keeps
    resampling deterministic).  Pillow is absent in this container, so
    the routing is exercised with a planted fake and the real-pillow
    equality check is environment-gated."""

    def test_prefer_native_routes_pure_subset_through_pil(self, spark):
        """With the flag on and (fake) PIL planted, even a pure-subset
        GIF decodes via the native path — pixels betray the fake.
        (Classes defined inside the test body so cloudpickle ships them
        by value to the python workers.)"""
        import target_parquet_spark.operators.multimodal as mm

        class _Img:
            def convert(self, mode):
                return self

            def __array__(self, dtype=None, copy=None):
                import numpy as np

                return np.full((5, 6, 3), 7, dtype=np.uint8)

        class _TracingPIL:
            @staticmethod
            def open(buf):
                return _Img()

        ids = spark.range(0, 3).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_media(ids, "doc_id")
        prev = mm._PIL_Image
        mm._PIL_Image = _TracingPIL
        try:
            rows = M.decode_media(media, 2, 2, prefer_native=True).collect()
        finally:
            mm._PIL_Image = prev
        assert len(rows) == 3
        # nn_resize of the all-7 fake: every byte is 7
        assert all(bytes(r["pixels"]) == b"\x07" * 12 for r in rows)

    def test_prefer_native_without_pil_is_pure(self, spark):
        """Flag on, pillow absent -> pure path, identical output to the
        default (the flag must never be able to break decode)."""
        import target_parquet_spark.operators.multimodal as mm

        assert mm._PIL_Image is None or pytest.skip("pillow installed")
        ids = spark.range(0, 4).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_media(ids, "doc_id")
        a = {r["media_id"]: bytes(r["pixels"])
             for r in M.decode_media(media, 4, 4).collect()}
        b = {r["media_id"]: bytes(r["pixels"])
             for r in M.decode_media(media, 4, 4, prefer_native=True).collect()}
        assert a == b

    def test_env_flag_resolves_driver_side(self, monkeypatch):
        import target_parquet_spark.operators.multimodal as mm

        monkeypatch.delenv(mm._NATIVE_CODECS_ENV, raising=False)
        assert not mm.native_codecs_enabled()
        monkeypatch.setenv(mm._NATIVE_CODECS_ENV, "1")
        assert mm.native_codecs_enabled()
        monkeypatch.setenv(mm._NATIVE_CODECS_ENV, "off")
        assert not mm.native_codecs_enabled()

    @pytest.mark.skipif(
        M._PIL_Image is None, reason="pillow not installed"
    )
    def test_native_equals_pure_on_lossless(self):
        """Real pillow: PIL decode must equal the pure decoders
        bit-exactly on PNG/GIF/BMP (lossless decode is deterministic) —
        the equality the probe script also asserts."""
        import numpy as np

        rng = np.random.RandomState(3)
        arr = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
        png = M.encode_png(arr)
        assert np.array_equal(M.native_decode_rgb(png), M.decode_png(png))
        pal = np.frombuffer(M.gif_palette(), np.uint8).reshape(256, 3)
        idx = rng.randint(0, 256, (7, 11), dtype=np.uint8)
        gif = M.encode_gif(idx)
        assert np.array_equal(M.native_decode_rgb(gif), pal[idx])


class TestInterlacedGifDecode:
    """r10: GIF interlaced frames deinterlace in the pure decoder (the
    four-pass row order of spec appendix E) — previously a disclosed
    NotImplementedError; now the two interlaced external fixtures
    decode alongside the seven sequential ones."""

    def test_external_interlaced_fixtures_decode(self):
        import struct

        fixtures = [
            p
            for p in _external_gifs()
            if os.path.basename(p) in ("folder.gif", "openfolder.gif")
        ]
        if not fixtures:
            pytest.skip("interlaced fixtures not present")
        for path in fixtures:
            data = open(path, "rb").read()
            # precondition: the descriptor really is interlaced
            pos = 13 + (2 << (data[10] & 7)) * 3 if data[10] & 0x80 else 13
            while data[pos] == 0x21:
                pos += 2
                while data[pos]:
                    pos += 1 + data[pos]
                pos += 1
            assert data[pos] == 0x2C and data[pos + 9] & 0x40, path
            arr = M.decode_gif(data)
            sw, sh = struct.unpack_from("<HH", data, 6)
            assert arr.shape == (sh, sw, 3), path

    def test_deinterlace_order_is_a_permutation(self):
        for h in (1, 2, 3, 4, 5, 7, 8, 16, 33, 100):
            order = M.deinterlace_rows(h)
            assert sorted(order.tolist()) == list(range(h)), h

    def test_synthetic_interlace_roundtrip(self):
        idx = ((np.arange(33 * 17).reshape(33, 17) * 31 + 5) % 256).astype(
            np.uint8
        )
        order = M.deinterlace_rows(33)
        blob = bytearray(M.encode_gif(idx[order]))  # stored-row order
        blob[blob.index(0x2C, 13 + 768) + 9] |= 0x40
        pal = np.frombuffer(M.gif_palette(), np.uint8).reshape(256, 3)
        assert np.array_equal(M.decode_gif(bytes(blob)), pal[idx])


class TestPngPaletteGrayscale:
    """r10: PNG color types 0 (grayscale) and 3 (palette) at depths
    1/2/4/8 joined the pure decoder's subset (filtering runs over
    packed row bytes with bpp = 1, bit-unpack after reconstruction)."""

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_palette_roundtrip_all_filters(self, depth):
        rng = np.random.RandomState(depth)
        n = min(16, 1 << depth)
        pal = rng.randint(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.randint(0, n, (11, 7)).astype(np.uint8)
        blob = M.encode_png(idx, palette=pal, depth=depth)
        assert M.looks_like_png(blob)
        assert np.array_equal(M.decode_png(blob), pal[idx])

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_grayscale_roundtrip_exact_scale(self, depth):
        rng = np.random.RandomState(10 + depth)
        g = rng.randint(0, 1 << depth, (9, 13)).astype(np.uint8)
        out = M.decode_png(M.encode_png(g, depth=depth))
        exp = (g.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
        assert out.shape == (9, 13)
        assert np.array_equal(out, exp)

    def test_external_palette_fixtures_decode(self):
        """Standard-encoder paletted/grayscale PNGs shipped with the
        runtime python decode with descriptor-matching shapes."""
        import glob as _glob
        import struct
        import sysconfig

        root = sysconfig.get_paths()["stdlib"]
        decoded = 0
        for p in _glob.glob(os.path.join(root, "**", "*.png"), recursive=True):
            data = open(p, "rb").read()
            if data[:8] != b"\x89PNG\r\n\x1a\n":
                continue
            w, h, depth, ctype, *_ = struct.unpack_from(">IIBBBBB", data, 16)
            if ctype not in (0, 3):
                continue
            arr = M.decode_png(data)
            exp = (h, w) if ctype == 0 else (h, w, 3)
            assert arr.shape == exp, p
            decoded += 1
        if decoded == 0:
            pytest.skip("no palette/grayscale PNG fixtures on this python")

    def test_decode_media_handles_grayscale_png(self, spark):
        import pandas as pd

        g = ((np.arange(8 * 12).reshape(8, 12) * 11) % 256).astype(np.uint8)
        blob = M.encode_png(g)
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [7], "media": [blob]})
        )
        rows = M.decode_media(df, 4, 4).collect()
        assert len(rows) == 1
        exp = M.nn_resize(
            np.repeat(g[:, :, None], 3, axis=2), 4, 4
        ).tobytes()
        assert bytes(rows[0]["pixels"]) == exp


class TestMonitorCompactEquality:
    """VERDICT r9 #6: compaction must never change the mSPRT read-out
    (the probe asserts it at sf10/sf100; this pins it in CI)."""

    def test_compact_preserves_readout(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from target_parquet_spark.streaming.sequential_monitor import (
            StreamingSequentialMonitor,
        )

        rng = np.random.RandomState(3)
        n = 400
        ev = pd.DataFrame(
            {
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 10 * 86400, n), unit="s"),
                "user_id": rng.randint(0, 40, n).astype("int64"),
                "value": rng.uniform(0, 30, n).round(2),
            }
        )
        events = spark.createDataFrame(ev)
        src = str(tmp_path / "src")
        mon = StreamingSequentialMonitor(spark, str(tmp_path / "mon"))
        for b in range(3):
            batch = events.filter(F.col("user_id") % 3 == b)
            batch.write.mode("append").parquet(src)
            stream = spark.readStream.schema(events.schema).parquet(src)
            mon.start(stream, available_now=True).awaitTermination()
        before = sorted(map(tuple, mon.read().collect()))
        mon.compact()
        after = sorted(map(tuple, mon.read().collect()))
        assert before == after and len(before) > 0


class TestJpegChromaSubsampling:
    """r10: the {1,2}x{1,2} sampling family (4:2:0 / 4:2:2 / 4:4:0)
    decodes for real — interleaved MCUs with Hi x Vi blocks per
    component, box upsample — and encode_jpeg can emit 4:2:0.  Until
    r10 every real-world photo JPEG (4:2:0 is the dominant layout)
    raised the disclosed NotImplementedError."""

    def _fixture(self):
        import sysconfig

        p = os.path.join(
            sysconfig.get_paths()["stdlib"],
            "test", "test_email", "data", "python.jpg",
        )
        if not os.path.exists(p):
            pytest.skip("python.jpg fixture not present")
        return open(p, "rb").read()

    def test_external_420_fixture_decodes(self):
        """The stdlib's python.jpg is a genuine 4:2:0 baseline JPEG
        (SOF0, Y 2x2, Cb/Cr 1x1) produced by a real encoder."""
        data = self._fixture()
        assert M.looks_like_jpeg(data)
        arr = M.decode_jpeg(data)
        assert arr.shape == (16, 16, 3)
        assert arr.dtype == np.uint8

    def test_constant_color_420_roundtrip_near_exact(self):
        img = np.zeros((16, 32, 3), np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = 180, 90, 40
        out = M.decode_jpeg(M.encode_jpeg(img, subsample="420"))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_smooth_image_420_within_chroma_loss(self):
        rng = np.random.RandomState(2)
        base = rng.randint(0, 256, (3, 5, 3))
        img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)[:20, :37]
        out = M.decode_jpeg(M.encode_jpeg(img, subsample="420"))
        assert out.shape == img.shape
        # 2x2 box-averaged chroma on block-constant content: small loss
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 16

    def test_420_with_restart_markers(self):
        rng = np.random.RandomState(4)
        img = np.kron(
            rng.randint(0, 256, (2, 3, 3)), np.ones((8, 8, 1))
        ).astype(np.uint8)
        a = M.decode_jpeg(M.encode_jpeg(img, subsample="420"))
        b = M.decode_jpeg(
            M.encode_jpeg(img, subsample="420", restart_interval=1)
        )
        assert np.array_equal(a, b)

    def test_444_output_unchanged_by_mcu_refactor(self):
        """The 4:4:4 generalized MCU loop must reproduce the r9 block
        order exactly — the fabricated-corpus contract (constant
        blocks reconstruct bit-exactly) pins it."""
        for mid in range(6):
            wb, hb = 2 + mid % 3, 1 + mid % 2
            g = np.block(
                [
                    [
                        np.full(
                            (8, 8),
                            (mid * 37 + by * 17 + bx * 11) % 256,
                            np.uint8,
                        )
                        for bx in range(wb)
                    ]
                    for by in range(hb)
                ]
            )
            assert np.array_equal(M.decode_jpeg(M.encode_jpeg(g)), g), mid

    def test_sampling_above_two_still_disclosed(self):
        img = np.zeros((8, 8, 3), np.uint8)
        blob = bytearray(M.encode_jpeg(img))
        i = blob.index(b"\xff\xc0")
        blob[i + 11] = 0x33  # 3x3 sampling: outside the family
        with pytest.raises(NotImplementedError):
            M.decode_jpeg(bytes(blob))
        assert not M.looks_like_jpeg(bytes(blob))

    def test_grayscale_rejects_subsample(self):
        with pytest.raises(ValueError):
            M.encode_jpeg(np.zeros((8, 8), np.uint8), subsample="420")


class TestPngAdam7:
    """r10: Adam7 interlace joined the pure PNG subset — seven
    independently filtered pass sub-images scattered through the pass
    grid.  encode_png(interlace=True) writes it, so round trips cover
    every color type, depth, and odd-dimension geometry (passes that
    are empty for small images carry no scanlines, per spec §8.2)."""

    @pytest.mark.parametrize("hw", [(1, 1), (2, 3), (8, 8), (9, 13), (33, 31)])
    def test_roundtrip_truecolor_and_alpha(self, hw):
        h, w = hw
        rng = np.random.RandomState(h * 100 + w)
        rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
        assert np.array_equal(
            M.decode_png(M.encode_png(rgb, interlace=True)), rgb
        )
        rgba = rng.randint(0, 256, (h, w, 4), np.uint8)
        assert np.array_equal(
            M.decode_png(M.encode_png(rgba, interlace=True)), rgba
        )

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_roundtrip_palette_and_gray_subbyte(self, depth):
        rng = np.random.RandomState(depth)
        n = min(16, 1 << depth)
        pal = rng.randint(0, 256, (n, 3), np.uint8)
        idx = rng.randint(0, n, (17, 11)).astype(np.uint8)
        blob = M.encode_png(idx, palette=pal, depth=depth, interlace=True)
        assert M.looks_like_png(blob)
        assert np.array_equal(M.decode_png(blob), pal[idx])
        g = rng.randint(0, 1 << depth, (17, 11)).astype(np.uint8)
        out = M.decode_png(M.encode_png(g, depth=depth, interlace=True))
        exp = (g.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
        assert np.array_equal(out, exp)

    def test_pass_grid_tiles_exactly_once(self):
        """Structural spec property: the seven pass grids partition the
        image — every pixel written exactly once."""
        for h, w in [(1, 1), (3, 5), (8, 8), (13, 9), (40, 17)]:
            hits = np.zeros((h, w), np.int64)
            for xs, ys, xstep, ystep in M._ADAM7:
                hits[ys::ystep, xs::xstep] += 1
            assert (hits == 1).all(), (h, w)

    def test_interlaced_flag_over_sequential_data_rejected(self):
        rgb = ((np.arange(48).reshape(4, 4, 3) * 5) % 256).astype(np.uint8)
        blob = bytearray(M.encode_png(rgb))
        blob[28] = 1  # claim Adam7 over sequential scanlines
        with pytest.raises(ValueError):
            M.decode_png(bytes(blob))


class TestPngGrayAlpha:
    """r10: color type 4 (gray+alpha, depth 8) — the last non-16-bit
    PNG form — decodes to (h, w, 2); decode_media replicates the gray
    channel and drops alpha, matching its RGBA handling."""

    @pytest.mark.parametrize("interlace", [False, True])
    def test_roundtrip(self, interlace):
        rng = np.random.RandomState(21)
        la = rng.randint(0, 256, (9, 7, 2), np.uint8)
        blob = (
            M.encode_png(la, interlace=True) if interlace else M.encode_png(la)
        )
        assert M.looks_like_png(blob)
        assert np.array_equal(M.decode_png(blob), la)

    def test_decode_media_replicates_gray(self, spark):
        import pandas as pd

        g = ((np.arange(6 * 8) * 13) % 256).astype(np.uint8).reshape(6, 8)
        la = np.stack([g, np.full_like(g, 200)], axis=2)
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [1], "media": [M.encode_png(la)]})
        )
        rows = M.decode_media(df, 4, 4).collect()
        exp = M.nn_resize(np.repeat(g[:, :, None], 3, axis=2), 4, 4).tobytes()
        assert bytes(rows[0]["pixels"]) == exp

    def test_sixteen_bit_lie_is_structural(self):
        """16-bit joined the subset late in r10 (every legal PNG form
        now decodes purely), so a 16-bit CLAIM over 8-bit scanlines is
        a structural ValueError, and only spec-illegal combinations
        (e.g. depth 3) remain NotImplementedError."""
        blob = bytearray(M.encode_png(np.zeros((2, 2, 3), np.uint8)))
        blob[24] = 16
        assert M.looks_like_png(bytes(blob))
        with pytest.raises(ValueError):
            M.decode_png(bytes(blob))
        blob[24] = 3  # not a legal PNG depth for any color type
        assert not M.looks_like_png(bytes(blob))
        with pytest.raises(NotImplementedError):
            M.decode_png(bytes(blob))

    def test_sixteen_bit_roundtrips_all_types(self):
        rng = np.random.RandomState(16)
        for shape in [(9, 7), (6, 5, 3), (5, 8, 4), (7, 4, 2)]:
            a = rng.randint(0, 65536, shape).astype(np.uint16)
            for interlace in (False, True):
                blob = (
                    M.encode_png(a, interlace=True)
                    if interlace
                    else M.encode_png(a)
                )
                out = M.decode_png(blob)
                assert out.dtype == np.uint16
                assert np.array_equal(out, a), (shape, interlace)


class TestPngFormsCorpus:
    """The multimodal_png_forms corpus must actually exercise all five
    container forms — assert per-form IHDR bytes so a regression in
    attach_png_forms_media cannot quietly collapse to one layout."""

    def test_forms_route_by_id(self, spark):
        import struct

        ids = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        blobs = {
            r["media_id"]: bytes(r["media"])
            for r in M.attach_png_forms_media(ids, "doc_id").collect()
        }
        assert len(blobs) == 10
        for mid, data in blobs.items():
            _, _, depth, ctype, _, _, inter = struct.unpack_from(
                ">IIBBBBB", data, 16
            )
            form = mid % 5
            exp = {0: (8, 2, 0), 1: (8, 6, 0), 2: (8, 0, 0),
                   3: (4, 3, 0), 4: (8, 2, 1)}[form]
            assert (depth, ctype, inter) == exp, (mid, depth, ctype, inter)
            assert M.looks_like_png(data)


class TestMonitorMomentsFastRead:
    """r10 (VERDICT r9 #6): after compaction the monitor keeps a
    (day, arm) moments sidecar and the read DELTA-ADJUSTS it — shuffle
    volume O(delta + days), not O(user-days).  These pin bit-equality
    between the fast path and the full fold across every delta shape:
    updates to compacted user-days, brand-new user-days, new days."""

    @staticmethod
    def _mk_events(seed, n, users, day0="2024-01-01", days=8):
        import pandas as pd

        rng = np.random.RandomState(seed)
        return pd.DataFrame(
            {
                "ts": pd.to_datetime(day0)
                + pd.to_timedelta(
                    rng.randint(0, days * 86400, n), unit="s"
                ),
                "user_id": rng.randint(0, users, n).astype("int64"),
                "value": rng.uniform(0, 30, n).round(2),
            }
        )

    def _drive(self, spark, tmp_path, batches):
        from pyspark.sql import functions as F

        from target_parquet_spark.streaming.sequential_monitor import (
            StreamingSequentialMonitor,
        )

        src = str(tmp_path / "src")
        mon = StreamingSequentialMonitor(spark, str(tmp_path / "mon"))
        schema = None
        for pdf in batches:
            df = spark.createDataFrame(pdf)
            schema = df.schema
            df.write.mode("append").parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            mon.start(stream, available_now=True).awaitTermination()
        return mon

    def test_delta_adjusted_read_equals_full_fold(self, spark, tmp_path):
        import shutil

        mon = self._drive(
            spark,
            tmp_path,
            [self._mk_events(1, 300, 30), self._mk_events(2, 300, 30)],
        )
        mon.compact()
        # post-compaction deltas: overlapping users + new users + later days
        for pdf in (
            self._mk_events(3, 200, 30),
            self._mk_events(4, 150, 60, day0="2024-01-06", days=6),
        ):
            df = spark.createDataFrame(pdf)
            df.write.mode("append").parquet(str(tmp_path / "src"))
            stream = spark.readStream.schema(df.schema).parquet(
                str(tmp_path / "src")
            )
            mon.start(stream, available_now=True).awaitTermination()
        fast = sorted(map(tuple, mon.read().collect()))
        # force the slow path by hiding the sidecar, then compare
        base_name = mon._store.split_state()[2]
        mdir = mon._moments_dir(base_name)
        shutil.move(mdir, mdir + ".hidden")
        try:
            slow = sorted(map(tuple, mon.read().collect()))
        finally:
            shutil.move(mdir + ".hidden", mdir)
        assert fast == slow and len(fast) > 0

    def test_read_after_compact_uses_sidecar(self, spark, tmp_path):
        import os as _os

        mon = self._drive(spark, tmp_path, [self._mk_events(5, 250, 25)])
        before = sorted(map(tuple, mon.read().collect()))
        mon.compact()
        base_name = mon._store.split_state()[2]
        assert _os.path.isfile(
            _os.path.join(mon._moments_dir(base_name), "_SUCCESS")
        )
        after = sorted(map(tuple, mon.read().collect()))
        assert before == after

    def test_recompact_retires_stale_sidecar(self, spark, tmp_path):
        import os as _os

        mon = self._drive(spark, tmp_path, [self._mk_events(6, 200, 20)])
        mon.compact()
        first = mon._store.split_state()[2]
        df = spark.createDataFrame(self._mk_events(7, 100, 20))
        df.write.mode("append").parquet(str(tmp_path / "src"))
        stream = spark.readStream.schema(df.schema).parquet(
            str(tmp_path / "src")
        )
        mon.start(stream, available_now=True).awaitTermination()
        mon.compact()
        second = mon._store.split_state()[2]
        assert second != first
        names = _os.listdir(str(tmp_path / "mon"))
        assert f"moments-{second}" in names
        assert f"moments-{first}" not in names
        fast = sorted(map(tuple, mon.read().collect()))
        assert len(fast) > 0


class TestGifAnimation:
    """r10: multi-frame GIF89a with real composition — GCE transparency
    (transparent pixels show the canvas beneath), disposal 0/1 keep /
    2 restore-background / 3 restore-previous, partial rects at
    offsets, local palettes, interlaced frame rects."""

    @staticmethod
    def _pal():
        return np.frombuffer(M.gif_palette(), np.uint8).reshape(256, 3)

    def _replay(self, cw, ch, frames):
        """Independent numpy composition (no shared code with
        decode_gif_frames beyond the palette constant)."""
        pal = self._pal()
        canvas = np.empty((ch, cw, 3), np.uint8)
        canvas[:] = pal[0]
        outs = []
        for fr in frames:
            idx = fr["idx"]
            l, t = fr.get("left", 0), fr.get("top", 0)
            tr, disp = fr.get("transparent"), fr.get("disposal", 0)
            before = canvas.copy()
            rect = canvas[t : t + idx.shape[0], l : l + idx.shape[1]]
            if tr is None:
                rect[:] = pal[idx]
            else:
                m = idx != tr
                rect[m] = pal[idx][m]
            outs.append(canvas.copy())
            if disp == 2:
                canvas[t : t + idx.shape[0], l : l + idx.shape[1]] = pal[0]
            elif disp == 3:
                canvas = before
        return outs

    def test_transparency_and_disposal_composition(self):
        rng = np.random.RandomState(7)
        cw, ch = 11, 9
        frames = [
            {"idx": rng.randint(0, 256, (ch, cw)).astype(np.uint8),
             "delay_cs": 5},
            {"idx": rng.randint(0, 256, (4, 5)).astype(np.uint8),
             "left": 3, "top": 2, "delay_cs": 6, "disposal": 2},
            {"idx": rng.randint(0, 256, (3, 4)).astype(np.uint8),
             "left": 6, "top": 1, "delay_cs": 7, "transparent": 42,
             "disposal": 3},
            {"idx": rng.randint(0, 256, (ch, cw)).astype(np.uint8),
             "delay_cs": 8},
        ]
        frames[2]["idx"][0, :2] = 42  # planted transparent pixels
        blob = M.encode_gif_animation(cw, ch, frames)
        got, delays = M.decode_gif_frames(blob)
        assert delays == [5, 6, 7, 8]
        for k, (g, e) in enumerate(zip(got, self._replay(cw, ch, frames))):
            assert np.array_equal(g, e), k

    def test_interlaced_frame_rect_composites(self):
        rng = np.random.RandomState(9)
        idx = rng.randint(0, 256, (16, 6)).astype(np.uint8)
        blob = bytearray(
            M.encode_gif_animation(
                8, 16, [{"idx": idx[M.deinterlace_rows(16)], "left": 1}]
            )
        )
        # flag the single frame's descriptor as interlaced
        i = blob.index(0x2C, 13 + 768)
        blob[i + 9] |= 0x40
        got, _ = M.decode_gif_frames(bytes(blob))
        exp = self._replay(8, 16, [{"idx": idx, "left": 1}])[0]
        assert np.array_equal(got[0], exp)

    def test_single_frame_gif_matches_decode_gif(self):
        idx = ((np.arange(24).reshape(4, 6) * 31) % 256).astype(np.uint8)
        blob = M.encode_gif(idx)
        frames, delays = M.decode_gif_frames(blob)
        assert len(frames) == 1 and delays == [0]
        assert np.array_equal(frames[0], M.decode_gif(blob))

    def test_rect_outside_canvas_rejected(self):
        idx = np.zeros((4, 6), np.uint8)
        with pytest.raises(ValueError):
            M.encode_gif_animation(6, 4, [{"idx": idx, "left": 1}])
        blob = bytearray(M.encode_gif_animation(7, 4, [{"idx": idx}]))
        i = blob.index(0x2C, 13 + 768)
        blob[i + 1] = 4  # shift frame left offset beyond the canvas
        with pytest.raises(ValueError):
            M.decode_gif_frames(bytes(blob))

    def test_spark_frames_match_closed_form(self, spark):
        ids = spark.range(0, 15).withColumnRenamed("id", "doc_id")
        media = M.attach_gif_anim_media(ids, "doc_id")
        rows = M.gif_animation_frames(media).collect()
        pal = self._pal()
        by_key = {(r["media_id"], r["frame_idx"]): r for r in rows}
        for mid in range(15):
            w, h, n = 8 + mid % 5, 6 + mid % 4, 2 + mid % 3
            for k in range(n):
                r = by_key[(mid, k)]
                assert r["n_frames"] == n and r["width"] == w
                px = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(
                    h, w, 3
                )
                for X in range(w):
                    j = X + 1 if X + 1 <= k else (X if 1 <= X <= k else 0)
                    for Y in range(h):
                        q = (
                            (mid * 7 + j * 131 + Y * 89 + X * 29) % 256
                            if j
                            else (mid * 11 + Y * 97 + X * 23) % 256
                        )
                        assert tuple(px[Y, X]) == tuple(pal[q]), (mid, k, Y, X)


def _ref_adpcm_decode(raw: bytes, align: int):
    """Independent IMA-ADPCM decoder written straight from the IMA
    recommended-practice tables — structured unlike multimodal's
    (dict-free, per-block list building) so a shared defect can't
    hide."""
    import struct

    steps = M._IMA_STEPS
    idx_tab = M._IMA_INDEX
    out = []
    for off in range(0, len(raw), align):
        pred, index, _ = struct.unpack_from("<hBB", raw, off)
        out.append(pred)
        nibs = []
        for b in raw[off + 4 : off + align]:
            nibs += [b & 15, b >> 4]
        for nib in nibs:
            step = steps[index]
            delta = step >> 3
            if nib & 1:
                delta += step >> 2
            if nib & 2:
                delta += step >> 1
            if nib & 4:
                delta += step
            pred = pred - delta if nib & 8 else pred + delta
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + idx_tab[nib]))
            out.append(pred)
    return out


class TestAdpcm:
    """r10: IMA-ADPCM (WAV format 0x11) — genuinely COMPRESSED audio
    through the pure codec seam, the audio analogue of PNG/JPEG/GIF."""

    def test_arbitrary_codes_match_independent_decoder(self):
        import struct

        rng = np.random.RandomState(5)
        raw = bytearray()
        for b in range(4):
            raw += struct.pack("<hBB", int(rng.randint(-2048, 2048)),
                               int(rng.randint(0, 89)), 0)
            raw += bytes(rng.randint(0, 256, 10, dtype=np.uint8))
        got = M._ima_adpcm_decode(bytes(raw), 14)
        assert got.tolist() == _ref_adpcm_decode(bytes(raw), 14)

    def test_encode_decode_roundtrip_tolerance(self):
        t = np.arange(3000)
        sig = (4000 * np.sin(t / 25) + 700 * np.sin(t / 6)).astype(np.int16)
        dec, rate = M.decode_wav(M.encode_adpcm_wav(sig, block_samples=505))
        assert rate == 8000 and dec.size == sig.size
        err = np.abs(dec.astype(int) - sig.astype(int))
        assert err.mean() < 60 and err.max() < 2500

    def test_fact_truncates_final_block(self):
        sig = np.arange(600, dtype=np.int16)  # 505 + 95: padded last block
        dec, _ = M.decode_wav(M.encode_adpcm_wav(sig, block_samples=505))
        assert dec.size == 600

    def test_structural_guards(self):
        import struct

        sig = np.arange(40, dtype=np.int16)
        blob = bytearray(M.encode_adpcm_wav(sig, block_samples=17))
        # corrupt a block header's step index beyond the table
        i = blob.index(b"data") + 8 + 2
        blob[i] = 90
        with pytest.raises(ValueError):
            M.decode_wav(bytes(blob))
        with pytest.raises(ValueError):
            M._ima_adpcm_decode(b"\x00" * 13, 12)  # not block-aligned

    def test_zero_code_identity_matches_fabrication(self, spark):
        ids = spark.range(0, 9).withColumnRenamed("id", "doc_id")
        rows = M.audio_features(M.attach_adpcm_media(ids, "doc_id")).collect()
        by_id = {r["media_id"]: r for r in rows}
        for mid in range(9):
            nb = 2 + mid % 3
            exp = np.concatenate(
                [
                    np.full(17, ((mid * 37 + b * 101) % 4096) - 2048, np.int16)
                    for b in range(nb)
                ]
            )
            r = by_id[mid]
            assert r["n_samples"] == nb * 17
            assert np.array_equal(
                np.frombuffer(bytes(r["samples"]), "<i2"), exp
            )
