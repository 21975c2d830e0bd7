"""Round-8 tests: pure-Python BMP codec + decode pipeline."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from target_parquet_spark.operators import multimodal as M


def _rand_img(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestBmpCodec:
    @pytest.mark.parametrize("h,w", [(1, 1), (3, 4), (7, 5), (9, 12), (16, 16)])
    def test_roundtrip_identity(self, h, w):
        """decode(encode(img)) == img for widths with and without stride
        padding (w*3 % 4 != 0 for w=5, 7-free... w in {1,5} pad, {4,12,16} none)."""
        img = _rand_img(h, w)
        assert np.array_equal(M.decode_bmp(M.encode_bmp(img)), img)

    def test_stride_padding_is_real(self):
        """w=5 rows are 15 payload bytes padded to 16 — the file must be
        exactly header + h*stride and decode must skip the pad byte."""
        img = _rand_img(3, 5)
        data = M.encode_bmp(img)
        assert len(data) == 54 + 3 * 16
        assert np.array_equal(M.decode_bmp(data), img)

    def test_top_down_negative_height(self):
        """A negative biHeight means top-down scanlines; the decoder must
        NOT flip those.  Build one by patching the encoder's output."""
        img = _rand_img(4, 4)
        # encode stores img[::-1] reversed again = img's rows in order;
        # declaring top-down means those stored rows ARE the image rows
        data = bytearray(M.encode_bmp(img[::-1]))
        struct.pack_into("<i", data, 22, -4)  # declare top-down
        assert np.array_equal(M.decode_bmp(bytes(data)), img)
        # sanity: without the patch the same payload decodes flipped
        assert np.array_equal(
            M.decode_bmp(M.encode_bmp(img[::-1])), img[::-1]
        )

    def test_pixel_offset_honored(self):
        """Pixel data need not start at byte 54 — a gap (e.g. palette or
        V4/V5 header) moves it; the decoder must follow bfOffBits."""
        img = _rand_img(2, 3)
        data = bytearray(M.encode_bmp(img))
        gap = b"\x00" * 12
        patched = bytes(data[:54]) + gap + bytes(data[54:])
        patched = bytearray(patched)
        struct.pack_into("<I", patched, 10, 54 + 12)
        assert np.array_equal(M.decode_bmp(bytes(patched)), img)

    def test_unsupported_rejected(self):
        img = _rand_img(2, 2)
        data = bytearray(M.encode_bmp(img))
        struct.pack_into("<H", data, 28, 8)  # 8bpp
        with pytest.raises(NotImplementedError, match="24-bit"):
            M.decode_bmp(bytes(data))
        with pytest.raises(ValueError, match="not a BMP"):
            M.decode_bmp(b"JUNK" * 20)

    def test_nn_resize_floor_map(self):
        """out[Y,X] = in[(Y*h)//th, (X*w)//tw] exactly."""
        img = _rand_img(7, 9)
        out = M.nn_resize(img, 4, 3)
        for Y in range(3):
            for X in range(4):
                assert np.array_equal(out[Y, X], img[(Y * 7) // 3, (X * 9) // 4])


class TestDecodeMediaBmp:
    def test_end_to_end_real_pixels(self, spark):
        """decode_media produces REAL output for BMP payloads without any
        imaging library: fabricate BMPs, decode through the Spark seam,
        and compare against a driver-side numpy recomputation."""
        ids = [0, 3, 11, 40]
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        media = M.attach_bmp_media(df, "doc_id")
        rows = {
            r.media_id: bytes(r.pixels)
            for r in M.decode_media(media, target_width=6, target_height=5).collect()
        }
        for mid in ids:
            w, h = 4 + mid % 9, 3 + mid % 7
            y = np.arange(h, dtype=np.int64)[:, None, None] * 131
            x = np.arange(w, dtype=np.int64)[None, :, None] * 17
            c = np.arange(3, dtype=np.int64)[None, None, :] * 59
            src = ((mid * 7 + y + x + c) % 256).astype(np.uint8)
            want = M.nn_resize(src, 6, 5).tobytes()
            assert rows[mid] == want, mid

    def test_null_payload_skipped(self, spark):
        df = spark.createDataFrame(
            [(1, M.encode_bmp(_rand_img(2, 2))), (2, None)],
            "media_id long, media binary",
        )
        out = M.decode_media(df, target_width=2, target_height=2).collect()
        assert [r.media_id for r in out] == [1]

    def test_non_bmp_without_pillow_raises(self, spark):
        if M._PIL_Image is not None:
            pytest.skip("pillow present: non-BMP payloads decode for real")
        df = spark.createDataFrame(
            [(1, b"\x89PNG fake")], "media_id long, media binary"
        )
        with pytest.raises(Exception, match="NotImplementedError|pillow"):
            M.decode_media(df, target_width=2, target_height=2).collect()
