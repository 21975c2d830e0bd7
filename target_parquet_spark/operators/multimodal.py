"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Contract (the 100-TB layout): media rides in a ``binary`` column next to a
``media_meta`` struct (modality, format, width/height/duration, byte
length, content hash).  Heavy per-item work (decode, resize,
frame-sample, feature-extract) runs as Arrow-batched ``mapInPandas``
functions whose *plumbing* — schema, batch shape, partition strategy — is
real and tested here; the codec call itself is stubbed because the
image/audio libraries are not in this container:

- ``decode_media``: raises ``NotImplementedError`` at the exact seam where
  PIL/ffmpeg would be invoked (clearly marked, import-gated).
- ``fake_features``: a deterministic md5-driven stand-in with the same
  signature/batch shape as a real embedding extractor, so downstream
  pipelines (dedup by content hash, ANN over features) are testable.

Scale note: binary payloads make rows wide — partition by size
(``maxRecordsPerFile`` / repartition on content hash) so Arrow batches
stay under the 2 GB record-batch ceiling, and NEVER collect media columns
to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_TYPE",
    "attach_media",
    "media_manifest",
    "decode_media",
    "resize_media",
    "sample_frames",
    "fake_features",
]

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def attach_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministically fabricate a media column from a text corpus: the
    UTF-8 bytes play the role of an encoded payload, with md5-derived fake
    dimensions.  This is the test harness for the multimodal plumbing —
    schema and sizes behave like real media."""
    payload = F.encode(F.col(text_col), "UTF-8")
    h = F.md5(F.col(text_col))
    n_bytes = F.octet_length(payload).cast("long")
    meta = F.struct(
        F.lit("image").alias("modality"),
        F.lit("fake/raw").alias("format"),
        (16 + (n_bytes % 240)).cast("int").alias("width"),
        (16 + ((n_bytes * 7) % 240)).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        n_bytes.alias("n_bytes"),
        h.alias("content_hash"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("media"),
        meta.alias("media_meta"),
    )


def media_manifest(df: DataFrame) -> DataFrame:
    """Metadata-only scan: never touches the binary column, so Parquet
    column pruning skips the payload bytes entirely."""
    return df.select(
        "media_id",
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_hash").alias("content_hash"),
    )


def decode_media(df: DataFrame, target_width: int = 224, target_height: int = 224) -> DataFrame:
    """Decode+resize plumbing.  The Spark side (signature, Arrow batching,
    output schema) is real; the codec call is the stub seam."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("pixels", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _batches(it):
        for pdf in it:
            # STUB: real implementation decodes pdf["media"] with
            # PIL/libvips/ffmpeg and resizes to (target_width, target_height).
            # Those libraries are not available in this container.
            raise NotImplementedError(
                "media codecs unavailable: install pillow/ffmpeg and replace "
                "this seam with the real decode+resize"
            )
            yield pd.DataFrame()  # pragma: no cover

    return df.select("media_id", "media").mapInPandas(_batches, schema=out_schema)


def resize_media(
    df: DataFrame, target_width: int = 32, target_height: int = 32
) -> DataFrame:
    """Resize plumbing (image → fixed ``target_width x target_height``).

    The Spark side is real and runs: Arrow-batched ``mapInPandas``, one
    output row per media item, fixed-size binary payload.  The resampler
    is the deterministic fake — nearest-neighbor over the BYTE stream
    (out[i] = data[i*len//n]) stands in for pixel-space resampling; a
    real implementation calls PIL/libvips at the marked seam.  Output
    partitioning follows the input: a downstream batch featurizer reads
    fixed-shape payloads with no shuffle.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )
    n = target_width * target_height

    def _batches(it):
        for pdf in it:
            ids, pix = [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                data = bytes(payload or b"")
                # CODEC SEAM: replace with real decode+resize (PIL/libvips)
                # — nearest-neighbor byte resample stands in.
                if data:
                    nb = len(data)
                    out = bytes(data[(i * nb) // n] for i in range(n))
                else:
                    out = b""
                ids.append(mid)
                pix.append(out)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [target_width] * len(ids),
                    "height": [target_height] * len(ids),
                    "pixels": pix,
                }
            )

    return df.select("media_id", "media").mapInPandas(_batches, schema=out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing (video → n evenly-spaced frames).

    The Spark side is real and runs: Arrow-batched ``mapInPandas``, one
    output row per (media_id, frame_idx), binary frame payloads.  The
    decode seam is faked deterministically — evenly-spaced byte slices of
    the payload stand in for decoded frames (a real implementation calls
    ffmpeg/pyav at the marked line).  Output partitioning follows the
    input, so a downstream per-frame feature extractor needs no shuffle.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _batches(it):
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                data = bytes(payload or b"")
                # CODEC SEAM: replace this slicing with real frame decode
                # (ffmpeg/pyav) — evenly-spaced byte windows stand in.
                step = max(1, len(data) // n_frames)
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(data[k * step : k * step + step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select("media_id", "media").mapInPandas(_batches, schema=out_schema)


def fake_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic stand-in feature extractor (same shape as a real one):
    ``dim`` doubles in [-1, 1) derived from md5(content_hash, i) — so ANN /
    dedup pipelines downstream of 'feature extraction' are fully testable
    without codecs."""
    h = F.col("media_meta.content_hash")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.conv(F.substring(F.md5(F.concat(h, F.lit(":"), i.cast("string"))), 1, 8), 16, 10)
            .cast("double")
            / F.lit(float(0x80000000))
            - 1.0
        ),
    )
    return df.select("media_id", vec.alias("features"))
