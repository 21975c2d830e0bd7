"""Round-10 additions.

Hash-exact driver oracle for the designated quantized ANN scale path
(VERDICT r9 #2): ``sim_knn_graph_quantized`` is structurally rows-only
at the driver (its plane count adapts to corpus size — no static SQL
can replay it), which left the single most scale-critical operator
family's production path reading ``err: no_oracle`` in every
CORRECTNESS file.  ``sim_knn_graph_quantized_fixed`` below runs the
SAME production operator body (``operators/similarity.
knn_graph_quantized`` — SQ8 codes, int32 candidate fold, per-(bucket,
src) shortlist, co-partitioned float verify, OR-amplified union) with
the plane count pinned to 4, so the full quantized ALGEBRA gets a
replayable unrolled-SQL oracle — the same exact-anchor/adaptive-twin
split every other ``_scaled`` family already has (e.g.
sim_knn_graph vs sim_knn_graph_scaled, queries_r6).

Second perceptual-hash family through the REAL codecs (VERDICT r9 #8):
``multimodal_dhash_decoded`` re-points dHash at pixels produced by the
actual pure-Python GIF decode (LZW + palette), with a planted
re-encoded-copy pair per id — near-dup image detection pinned
end-to-end through a real compression round trip rather than the fake
seam payloads multimodal_phash_pairs rides.

No reference counterpart (the reference is a 406-LoC Singer target
with no relational surface — ``/root/reference/target_parquet/``);
this is brief-extension surface for the LLM training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_parquet_spark.operators import multimodal as M
from target_parquet_spark.operators import similarity as S
from target_parquet_spark.queries import query, t as td
from target_parquet_spark.queries_ext import _SQL_DOT, sql_bucket

# ---------------------------------------------------------------------------
# fixed-granularity quantized kNN graph (exact anchor for the scale path)
# ---------------------------------------------------------------------------

# The two OR-amplified plane families at the pinned granularity — the
# same md5-parity literals operators/similarity.plane_weights derives,
# embedded so the oracle replays bucket assignment bit-exactly.
_QBUCKET_T0 = sql_bucket(S.plane_weights(n_planes=4, dim=64, table=0))
_QBUCKET_T1 = sql_bucket(S.plane_weights(n_planes=4, dim=64, table=1))

# int32 candidate fold over SQ8 codes — integer arithmetic, exact in
# both engines (64 dims x 127^2 per term stays far under overflow).
_SQL_INT_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i] * {b}[i]))"
)

# k=3, shortlist_factor=4 -> per-(bucket, src, table) shortlist of 12,
# matching knn_graph_quantized's max(shortlist_factor * k, k + 1).
_Q_SHORTLIST = 12


def _sql_quantized_table(t: int, bucket_expr: str) -> str:
    """One OR-amplification table of the quantized-kNN oracle: bucket
    the coded corpus, self-join bucket-mates, score with the integer
    fold, rank per (bucket, src) by quantized score, keep the exact
    float cosine alongside for the surviving shortlist."""
    qsim = _SQL_INT_DOT.format(a="a.codes", b="c.codes")
    fsim = _SQL_DOT.format(a="a.embedding", b="c.embedding")
    return f"""
    t{t} AS (SELECT vec_id, embedding, nrm, codes,
                    {bucket_expr.format(v='embedding')} AS bucket
             FROM cd),
    p{t} AS (SELECT a.bucket, a.vec_id AS src, c.vec_id AS nbr,
                    CAST({qsim} AS DOUBLE) / (a.nrm * c.nrm) AS qsim,
                    round({fsim} / (a.nrm * c.nrm), 4) AS sim
             FROM t{t} a JOIN t{t} c
               ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
    s{t} AS (SELECT src, nbr, sim,
                    row_number() OVER (PARTITION BY bucket, src
                                       ORDER BY qsim DESC, nbr) AS qrk
             FROM p{t})"""


_SQL_KNN_QUANTIZED_FIXED = f"""
    WITH b0 AS (SELECT vec_id, embedding,
                       sqrt({_SQL_DOT.format(a='embedding', b='embedding')})
                         AS nrm
                FROM embeddings WHERE embedding IS NOT NULL),
    b AS (SELECT * FROM b0 WHERE nrm > 0),
    sc AS (SELECT max(list_max(list_transform(embedding,
                     v -> abs(CAST(v AS DOUBLE))))) AS scale
           FROM b),
    cd AS (SELECT b.vec_id, b.embedding, b.nrm,
                  list_transform(b.embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) / sc.scale * 127)
                              AS INTEGER)) AS codes
           FROM b CROSS JOIN sc),
    {_sql_quantized_table(0, _QBUCKET_T0)},
    {_sql_quantized_table(1, _QBUCKET_T1)},
    u AS (SELECT DISTINCT src, nbr, sim FROM (
            SELECT src, nbr, sim FROM s0 WHERE qrk <= {_Q_SHORTLIST}
            UNION ALL
            SELECT src, nbr, sim FROM s1 WHERE qrk <= {_Q_SHORTLIST})),
    r AS (SELECT src, nbr, sim,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY sim DESC, nbr) AS nbr_rank
          FROM u)
    SELECT src, CAST(nbr_rank AS BIGINT) AS nbr_rank, nbr, sim
    FROM r WHERE nbr_rank <= 3
"""


@query("sim_knn_graph_quantized_fixed", _SQL_KNN_QUANTIZED_FIXED)
def sim_knn_graph_quantized_fixed(spark, sf_dir):
    """The quantized kNN scale path's EXACT ANCHOR (VERDICT r9 #2):
    the production operator body — SQ8 symmetric quantization against
    the corpus-max-|component| scale (one 1-row agg read at plan time,
    the "model state as plan-time literals" convention), int32
    candidate fold inside the bucket self-join over rows carrying no
    float payload, per-(bucket, src) shortlist of 12 on the quantized
    score, co-partitioned float verify of survivors, OR-amplified
    union over 2 plane families, per-source top-3 by exact cosine —
    with the plane count pinned to 4 so static SQL can replay every
    stage: the oracle recomputes the scale, the codes
    (round(v/scale*127)), the integer dot, the shortlist window, and
    the float rerank as unrolled CTEs.  The adaptive twin
    (sim_knn_graph_quantized, queries_r14) keeps its rows-only status;
    THIS row pins the quantized algebra hash-exact at the driver.

    100 TB note: granularity is the ONLY thing pinned here — plan
    shape (one exchange per table, exchange-free shortlist window,
    shuffle-hash verify) is identical to the adaptive path, so a
    hash-exact row on this query certifies the algebra the sf100
    decade probes measured (11.42x/decade, BASELINE.md r9)."""
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return S.knn_graph_quantized(emb, k=3, n_planes=4)


# ---------------------------------------------------------------------------
# dHash over real-codec decoded pixels (VERDICT r9 #8)
# ---------------------------------------------------------------------------

# dHash geometry mirrors multimodal_phash_pairs (7x8 grid, 56-bit hash,
# 4 x 14-bit bands, hamming <= 3) — but the grid here is DECODED PIXELS
# (GIF LZW + palette through decode_media), not raw payload bytes.
_DH_ROWS, _DH_COLS, _DH_MAXH = 7, 8, 3
_DH_OFFSET = 1_000_000

# Expected grid grayscale, replayed WITHOUT parsing GIF or running LZW:
# source image of base id: w = 6 + id%7, h = 4 + id%5,
# index(y, x) = (id*11 + y*97 + x*23) % 256, palette channel c of index
# q = (q*37+11, q*73+29, q*151+47) % 256; decode_media resamples via
# floor-NN to the (cols+1) x rows grid: srcy = (Y*h)//rows,
# srcx = (X*w)//(cols+1); integer grayscale (r+g+b)//3.
_SQL_DHASH_DECODED = f"""
    WITH base AS (SELECT doc_id FROM documents),
    corpus AS (
      SELECT doc_id AS media_id, doc_id AS src FROM base
      UNION ALL
      SELECT doc_id + {_DH_OFFSET} AS media_id, doc_id AS src FROM base),
    gv AS (
      SELECT media_id,
             list_transform(range(0, {_DH_ROWS * (_DH_COLS + 1)}), i ->
               (src * 11
                + (((i // {_DH_COLS + 1}) * (4 + src % 5)) // {_DH_ROWS}) * 97
                + (((i % {_DH_COLS + 1}) * (6 + src % 7)) // {_DH_COLS + 1}) * 23
               ) % 256) AS v
      FROM corpus),
    g AS (
      SELECT media_id,
             list_transform(v, q ->
               ((q * 37 + 11) % 256 + (q * 73 + 29) % 256
                + (q * 151 + 47) % 256) // 3) AS s
      FROM gv),
    hsh AS (
      SELECT media_id,
             list_sum(list_transform(range(0, {_DH_ROWS * _DH_COLS}),
               k -> CASE WHEN s[(k // {_DH_COLS}) * {_DH_COLS + 1}
                              + (k % {_DH_COLS}) + 1]
                        > s[(k // {_DH_COLS}) * {_DH_COLS + 1}
                              + (k % {_DH_COLS}) + 2]
                         THEN (1::BIGINT << k) ELSE 0 END)) AS phash
      FROM g),
    bk AS (
      SELECT media_id, phash, k, (phash >> (k * 14)) & 16383 AS bv
      FROM hsh, (SELECT unnest(range(0, 4)) AS k)),
    cand AS (
      SELECT DISTINCT x.media_id AS id_a, y.media_id AS id_b,
             CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
      FROM bk x JOIN bk y
        ON x.k = y.k AND x.bv = y.bv AND x.media_id < y.media_id)
    SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {_DH_MAXH}
"""


@query("multimodal_dhash_decoded", _SQL_DHASH_DECODED)
def multimodal_dhash_decoded(spark, sf_dir):
    """Perceptual near-dup detection pinned end-to-end through REAL
    compression artifacts (VERDICT r9 #8): every item is a genuine GIF
    (variable-width LZW, palette), each base id paired with a planted
    RECOMPRESSED copy (decode -> re-encode under the opposite container
    version — different bytes, identical pixels,
    operators/multimodal.recompress_gif), decoded through the actual
    pure-Python codec path (decode_media), grayscale-dHashed in pixel
    space (dhash_decoded), and banded relationally
    (phash_near_dup_pairs).  Every recompressed pair must surface at
    hamming 0 even though the containers' content hashes differ — the
    property byte-level dedup cannot provide and the reason perceptual
    hashing exists.

    The oracle recomputes the expected grid grayscale from the
    generation functions (index map, palette polynomial, floor-NN
    resample, integer gray) without parsing GIF or running LZW — any
    codec asymmetry on either side breaks the match.

    Plan: two chained Arrow-batched mapInPandas stages (fabricate+
    recompress, decode+hash) with zero shuffles — payloads never leave
    the creating task; only 8-byte (id, phash) rows enter the banded
    pair join, whose density knob (band_bits) grows with log2(corpus)
    exactly like every LSH family here."""
    d = td(spark, sf_dir, "documents").select("doc_id")
    media = M.attach_gif_pair_media(d, "doc_id", offset=_DH_OFFSET)
    hashed = M.dhash_decoded(media, rows=_DH_ROWS, cols=_DH_COLS)
    return M.phash_near_dup_pairs(
        hashed,
        bands=4,
        band_bits=14,
        max_hamming=_DH_MAXH,
        id_col="media_id",
    ).select(
        F.col("id_a"),
        F.col("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


# ---------------------------------------------------------------------------
# full-spread PNG forms decode (r10 codec coverage, driver-visible)
# ---------------------------------------------------------------------------

# decode target distinct from the BMP (6x5), PNG (7x4), and GIF pins.
_PF_W, _PF_H = 8, 6

# Expected decoded RGB per form (see attach_png_forms_media): pure
# (id, y, x, c) functions; the oracle never parses PNG, inflates zlib,
# un-filters, unpacks bits, or walks the Adam7 pass grid.
_SQL_PNG_FORMS = f"""
    WITH px AS (
      SELECT doc_id,
             array_to_string(list_transform(range(0, {_PF_H * _PF_W * 3}), i ->
               format('{{:02X}}', CASE
                 WHEN doc_id % 5 IN (0, 1, 4) THEN
                   (doc_id * 13
                    + (((i // {_PF_W * 3}) * (3 + doc_id % 5)) // {_PF_H}) * 89
                    + ((((i % {_PF_W * 3}) // 3) * (4 + doc_id % 6)) // {_PF_W}) * 29
                    + (i % 3) * 47) % 256
                 WHEN doc_id % 5 = 2 THEN
                   (doc_id * 29
                    + (((i // {_PF_W * 3}) * (3 + doc_id % 5)) // {_PF_H}) * 53
                    + ((((i % {_PF_W * 3}) // 3) * (4 + doc_id % 6)) // {_PF_W}) * 19) % 256
                 ELSE
                   (((doc_id
                      + (((i // {_PF_W * 3}) * (3 + doc_id % 5)) // {_PF_H}) * 5
                      + ((((i % {_PF_W * 3}) // 3) * (4 + doc_id % 6)) // {_PF_W}) * 3) % 16)
                    * (CASE i % 3 WHEN 0 THEN 91 WHEN 1 THEN 57 ELSE 23 END)
                    + (CASE i % 3 WHEN 0 THEN 13 WHEN 1 THEN 101 ELSE 7 END)) % 256
               END)), '') AS pixhex
      FROM documents)
    SELECT doc_id AS media_id,
           CAST({_PF_W} AS INTEGER) AS width,
           CAST({_PF_H} AS INTEGER) AS height,
           CAST({_PF_H * _PF_W * 3} AS BIGINT) AS n_bytes,
           md5(pixhex) AS pixels_hash
    FROM px
"""


@query("multimodal_png_forms", _SQL_PNG_FORMS)
def multimodal_png_forms(spark, sf_dir):
    """Every PNG form the r10 pure codec covers, decoded in one sweep
    and pinned hash-exact: id % 5 routes each document to truecolor
    (all five filter types planted), RGBA (alpha dropped), grayscale,
    palette at depth 4 (sub-byte packing + PLTE), or Adam7 INTERLACED
    truecolor (seven independently filtered pass sub-images) — see
    operators/multimodal.attach_png_forms_media.  The oracle recomputes
    the expected decoded+resized pixels from the generation functions
    without touching any of that machinery, so a defect in the
    bit-unpack, PLTE mapping, pass-grid scatter, OR the filter algebra
    under any of those layouts breaks the match.

    Plan: fanned-out id rows feed two chained Arrow-batched mapInPandas
    stages (encode form, decode); payloads never leave their creating
    task; only (id, 3-int, md5) rows exit."""
    docs = td(spark, sf_dir, "documents")
    media = M.attach_png_forms_media(docs, "doc_id")
    decoded = M.decode_media(media, target_width=_PF_W, target_height=_PF_H)
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.octet_length("pixels").cast("long").alias("n_bytes"),
        F.md5(F.hex("pixels")).alias("pixels_hash"),
    )


# ---------------------------------------------------------------------------
# animated GIF: composited frame decode (r10)
# ---------------------------------------------------------------------------

# Closed-form composited pixel (see attach_gif_anim_media): at frame k,
# canvas column X was last painted by strip j* = X+1 if X+1 <= k else X
# if 1 <= X <= k else frame 0; index q feeds the palette polynomial.
_SQL_GIF_ANIMATION = """
    WITH fr AS (
      SELECT doc_id,
             8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
             2 + doc_id % 3 AS n,
             unnest(range(0, CAST(2 + doc_id % 3 AS BIGINT))) AS k
      FROM documents),
    px AS (
      SELECT doc_id, w, h, n, k,
             array_to_string(list_transform(range(0, h * w * 3), i ->
               format('{:02X}', (
                 (CASE
                    WHEN ((i % (w * 3)) // 3) + 1 <= k THEN
                      (doc_id * 7 + (((i % (w * 3)) // 3) + 1) * 131
                       + (i // (w * 3)) * 89 + ((i % (w * 3)) // 3) * 29) % 256
                    WHEN ((i % (w * 3)) // 3) >= 1
                         AND ((i % (w * 3)) // 3) <= k THEN
                      (doc_id * 7 + ((i % (w * 3)) // 3) * 131
                       + (i // (w * 3)) * 89 + ((i % (w * 3)) // 3) * 29) % 256
                    ELSE
                      (doc_id * 11 + (i // (w * 3)) * 97
                       + ((i % (w * 3)) // 3) * 23) % 256
                  END)
                 * (CASE i % 3 WHEN 0 THEN 37 WHEN 1 THEN 73 ELSE 151 END)
                 + (CASE i % 3 WHEN 0 THEN 11 WHEN 1 THEN 29 ELSE 47 END)
               ) % 256)), '') AS pixhex
      FROM fr)
    SELECT doc_id AS media_id,
           CAST(k AS INTEGER) AS frame_idx,
           CAST(n AS INTEGER) AS n_frames,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE WHEN k = 0 THEN 4 ELSE 4 + k END AS INTEGER) AS delay_cs,
           md5(pixhex) AS pixels_hash
    FROM px
"""


@query("multimodal_gif_animation", _SQL_GIF_ANIMATION)
def multimodal_gif_animation(spark, sf_dir):
    """Animated-GIF decode with real frame COMPOSITION (r10): each
    document carries a genuine multi-frame GIF89a (NETSCAPE loop
    extension, per-frame graphic control extensions, partial-rect
    frames at nonzero offsets — operators/multimodal.
    attach_gif_anim_media) and decode composites every frame onto the
    living canvas (operators/multimodal.decode_gif_frames — the part
    single-frame decoders skip; transparency and disposal 2/3 are
    exercised by pytest against an independent numpy composition).
    One output row per composited frame, pinned hash-exact: the oracle
    replays the closed-form "which strip painted this pixel last"
    geometry and the palette polynomial without parsing GIF, running
    LZW, or compositing anything.

    Plan: the GIF twin of multimodal_video_frames — fanned-out ids,
    two chained Arrow-batched mapInPandas stages, payloads never leave
    the creating task, rows multiply only by the bounded frame count."""
    docs = td(spark, sf_dir, "documents")
    media = M.attach_gif_anim_media(docs, "doc_id")
    frames = M.gif_animation_frames(media)
    return frames.select(
        "media_id",
        "frame_idx",
        "n_frames",
        "width",
        "height",
        "delay_cs",
        F.md5(F.hex("pixels")).alias("pixels_hash"),
    )


# ---------------------------------------------------------------------------
# IMA-ADPCM compressed audio decode (r10)
# ---------------------------------------------------------------------------

# Expected decoded stream (see attach_adpcm_media): nb = 2 + id % 3
# blocks of 17 samples; every sample of block b equals the block
# header's predictor ((id*37 + b*101) % 4096) - 2048 because the
# planted codes are all zero and at step index 0 a zero code moves the
# predictor by 7 >> 3 = 0.  Samples serialize little-endian int16 for
# the hash (two's complement via +65536 on negatives).
_SQL_DECODE_ADPCM = """
    WITH base AS (SELECT doc_id, 2 + doc_id % 3 AS nb FROM documents),
    sm AS (
      SELECT doc_id, nb,
             list_transform(range(0, nb * 17), t ->
               ((doc_id * 37 + (t // 17) * 101) % 4096) - 2048) AS v
      FROM base)
    SELECT doc_id AS media_id,
           CAST(nb * 17 AS BIGINT) AS n_samples,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST((nb * 17 * 1000) // 8000 AS BIGINT) AS duration_ms,
           CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS energy,
           CAST(list_sum(list_transform(range(1, nb * 17),
             t -> CASE WHEN v[t] * v[t + 1] < 0 THEN 1 ELSE 0 END))
             AS BIGINT) AS zero_crossings,
           md5(array_to_string(list_transform(v, x -> format('{:02X}{:02X}',
             (CASE WHEN x < 0 THEN x + 65536 ELSE x END) % 256,
             (CASE WHEN x < 0 THEN x + 65536 ELSE x END) // 256)), ''))
             AS samples_hash
    FROM sm
"""


@query("multimodal_decode_adpcm", _SQL_DECODE_ADPCM)
def multimodal_decode_adpcm(spark, sf_dir):
    """COMPRESSED audio decode with zero codec libraries (r10): each
    document carries a genuine mono IMA-ADPCM RIFF/WAVE (format tag
    0x11 — fmt with wSamplesPerBlock, fact count, per-block headers
    carrying the 4-bit recurrence's initial state), decoded by
    operators/multimodal.decode_wav's new ADPCM branch and featurized
    by the same audio_features pass PCM uses.  The fabricated blocks
    plant all-zero codes whose decode is a per-block CONSTANT (at step
    index 0 a zero code is a zero delta and the index clamps), so the
    oracle recomputes samples, energy, boundary zero crossings, and
    the little-endian int16 hash in closed form — while the Spark side
    must parse the real container and walk the real recurrence (any
    width/sign/clamp defect breaks the zero-code identity; arbitrary
    code streams are pinned in pytest against an independent decoder
    and an encode/decode round trip).

    Plan: the audio twin of the image decode pins — fanned-out ids,
    two chained Arrow-batched mapInPandas stages, zero shuffles."""
    docs = td(spark, sf_dir, "documents")
    media = M.attach_adpcm_media(docs, "doc_id")
    feats = M.audio_features(media)
    return feats.select(
        "media_id",
        "n_samples",
        "sample_rate",
        "duration_ms",
        "energy",
        "zero_crossings",
        F.md5(F.hex("samples")).alias("samples_hash"),
    )
