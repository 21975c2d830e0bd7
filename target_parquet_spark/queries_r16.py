"""Round-10 continuation additions (session 2).

New capability families this wave:

* ``multimodal_audio_wht`` — an integer-exact SPECTRAL feature through
  the real audio codec seam: the fast Walsh-Hadamard transform
  (O(N log N) butterfly) over decoded PCM, pinned against an oracle
  that recomputes every coefficient from the O(N^2) definition.  Until
  now the audio seam exposed only time-domain features (energy,
  zero-crossings, VAD); this is the frequency-domain analysis path a
  training-data pipeline needs for audio quality filtering — expressed
  with a transform whose integer exactness makes it cross-engine
  pinnable where an FFT would drown in float tolerance.

No reference counterpart (the reference is a 406-LoC Singer target
with no relational surface — ``/root/reference/target_parquet/``);
this is brief-extension surface for the LLM training-data pipeline.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from target_parquet_spark.operators import multimodal as M
from target_parquet_spark.queries import query, t as td

# ---------------------------------------------------------------------------
# Walsh-Hadamard audio spectral signature
# ---------------------------------------------------------------------------

# Oracle: recompute the decoded samples from attach_wav_media's generation
# function (n = 40 + id % 37, s(t) = ((id*31 + t*t*7 + t*13) % 4096) - 2048),
# zero-pad/truncate to 64 points, then evaluate every WHT coefficient from
# the DEFINITION: W[k] = sum_t v[t] * (-1)^popcount(k & t) — the naive
# O(N^2) double loop as nested DuckDB lambdas.  The Spark side runs the
# O(N log N) butterfly over samples produced by the real RIFF chunk walk;
# the md5 over the full 64-coefficient spectrum means a single wrong
# coefficient (or a wrong sample from a container mis-parse) breaks the pin.
_SQL_AUDIO_WHT = """
    WITH lists AS (
      SELECT doc_id,
             40 + doc_id % 37 AS n,
             list_transform(range(0, 64),
               t -> CASE WHEN t < 40 + doc_id % 37
                         THEN ((doc_id * 31 + t * t * 7 + t * 13) % 4096)
                              - 2048
                         ELSE 0 END) AS v
      FROM documents),
    spec AS (
      SELECT doc_id, n,
             list_transform(range(0, 64),
               k -> list_sum(list_transform(range(0, 64),
                      t -> v[t + 1]
                           * (1 - 2 * (bit_count(k & t) % 2))))) AS w
      FROM lists)
    SELECT doc_id AS media_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(w[1] AS BIGINT) AS dc,
           CAST(w[2] * w[2] AS BIGINT) AS oct0,
           CAST(list_sum(list_transform(range(2, 4),
                  k -> CAST(w[k + 1] * w[k + 1] AS BIGINT))) AS BIGINT)
             AS oct1,
           CAST(list_sum(list_transform(range(4, 8),
                  k -> CAST(w[k + 1] * w[k + 1] AS BIGINT))) AS BIGINT)
             AS oct2,
           CAST(list_sum(list_transform(range(8, 16),
                  k -> CAST(w[k + 1] * w[k + 1] AS BIGINT))) AS BIGINT)
             AS oct3,
           CAST(list_sum(list_transform(range(16, 32),
                  k -> CAST(w[k + 1] * w[k + 1] AS BIGINT))) AS BIGINT)
             AS oct4,
           CAST(list_sum(list_transform(range(32, 64),
                  k -> CAST(w[k + 1] * w[k + 1] AS BIGINT))) AS BIGINT)
             AS oct5,
           CAST(list_sum(list_transform(w,
                  x -> CAST(x * x AS BIGINT))) AS BIGINT) AS spec_energy,
           md5(array_to_string(w, ',')) AS spectrum_hash
    FROM spec
"""


@query("multimodal_audio_wht", _SQL_AUDIO_WHT)
def multimodal_audio_wht(spark, sf_dir):
    """Frequency-domain audio analysis through the REAL codec seam with
    zero audio libraries: one genuine mono PCM16 RIFF/WAVE payload per
    document id (attach_wav_media — including the planted odd/even LIST
    chunk that exercises the RIFF word-alignment skip), decoded by the
    pure-Python chunk walker, then transformed by the O(N log N) fast
    Walsh-Hadamard butterfly (operators/multimodal.fwht_natural) into an
    integer-exact 64-point spectrum.  Output per clip: DC coefficient,
    six octave-band energies, total spectral energy (Parseval-checked in
    tests), and an md5 over all 64 coefficients.  The oracle never runs
    the fast transform — it evaluates every coefficient from the O(N^2)
    definition — so the two sides agree only if the butterfly recursion
    is exactly the Hadamard kernel AND the RIFF walk produced exactly
    the right samples.

    Plan shape for 100 TB: two chained Arrow-batched mapInPandas stages
    over the id column only — scan-stage, zero shuffles; payloads never
    leave the creating task, only fixed-width spectral features exit
    (the frequency-domain twin of the audio_features contract)."""
    docs = td(spark, sf_dir, "documents")
    media = M.attach_wav_media(docs, "doc_id")
    return M.audio_wht(media, n_points=64)


# ---------------------------------------------------------------------------
# differentially-private count release (deterministic geometric mechanism)
# ---------------------------------------------------------------------------

# Two-sided geometric mechanism with alpha = exp(-epsilon) = 1/2
# (epsilon = ln 2 per released cell, sensitivity 1 for disjoint counts):
# P(noise = k) = ((1-alpha)/(1+alpha)) * alpha^|k| = (1/3) * (1/2)^|k|.
# The CDF is exactly rational, so inverse-CDF sampling reduces to integer
# comparisons against precomputed thresholds — no float randomness, no
# cross-engine ln/exp: both engines derive u from md5(cell key) and count
# how many thresholds it clears.  Noise is clipped to [-16, 16] (total
# clipped mass 2*(2/3)*2^-16 < 3e-5 — the release is (eps, delta)-DP with
# that delta; the clip is what makes the threshold table finite).
_DP_SCALE = 1 << 30
_DP_CLIP = 16


def _dp_thresholds() -> list[int]:
    """floor(CDF(j) * 2^30) for j in [-CLIP, CLIP): the inverse-CDF
    lattice.  noise(u) = -CLIP + #{j : u >= T_j} for u uniform on
    [0, 2^30)."""
    out = []
    for j in range(-_DP_CLIP, _DP_CLIP):
        if j < 0:
            c = Fraction(2, 3) * Fraction(1, 2) ** (-j)
        else:
            c = 1 - Fraction(2, 3) * Fraction(1, 2) ** (j + 1)
        out.append(int(c * _DP_SCALE))  # exact floor: int() of Fraction
    return out


_DP_T = _dp_thresholds()
_DP_EPSILON = 0.6931  # round(ln 2, 4), shared literal — never computed

_SQL_DP_COUNTS = f"""
    WITH cells AS (
      SELECT event_type,
             CAST(date_trunc('week', ts) AS DATE) AS week_start,
             count(*) AS true_count
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2),
    seeded AS (
      SELECT event_type, week_start, true_count,
             ('0x' || substr(md5(event_type || '|' ||
                             CAST(week_start AS VARCHAR)), 1, 8))::BIGINT
               % {_DP_SCALE} AS u
      FROM cells),
    noised AS (
      SELECT event_type, week_start, true_count,
             -{_DP_CLIP} + list_sum(list_transform(
               [{", ".join(str(t) for t in _DP_T)}],
               thr -> CASE WHEN u >= thr THEN 1 ELSE 0 END)) AS noise
      FROM seeded)
    SELECT event_type, week_start,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(noise AS BIGINT) AS noise,
           CAST(true_count + noise AS BIGINT) AS noisy_count,
           CAST({_DP_EPSILON!r} AS DOUBLE) AS epsilon
    FROM noised
"""


@query("audit_dp_counts", _SQL_DP_COUNTS)
def audit_dp_counts(spark, sf_dir):
    """Differentially-private count release for governance pipelines:
    per-(event_type, week) event counts released through the two-sided
    geometric mechanism (the discrete Laplace — Ghosh/Roughgarden/
    Sundararajan's universally-utility-maximizing mechanism for counts)
    at epsilon = ln 2, with DETERMINISTIC noise so the release is
    replayable and auditable: u = md5(cell key) mod 2^30 feeds an exact
    rational inverse-CDF threshold table (alpha = 1/2 makes every CDF
    value a dyadic-over-3 rational; thresholds are precomputed with
    Fraction and shared verbatim with the oracle).  Output keeps
    true_count and noise alongside noisy_count because this is the
    utility-loss AUDIT view of the mechanism, not the public release —
    dropping two columns yields the releasable table.

    Plan shape for 100 TB: one groupBy on (type, week) with map-side
    partial aggregation is the only shuffle; noise is a chain of 32
    integer comparisons on the tiny post-agg cell table, entirely inside
    whole-stage codegen (no UDF, no RNG state, no driver loop)."""
    ev = td(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cells = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
    ).agg(F.count(F.lit(1)).alias("true_count"))
    key = F.concat_ws(
        "|", F.col("event_type"), F.col("week_start").cast("string")
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % F.lit(_DP_SCALE)
    )
    noise = F.lit(-_DP_CLIP)
    for thr in _DP_T:
        noise = noise + F.when(u >= F.lit(thr), 1).otherwise(0)
    return cells.select(
        "event_type",
        "week_start",
        F.col("true_count").cast("long").alias("true_count"),
        noise.cast("long").alias("noise"),
        (F.col("true_count") + noise).cast("long").alias("noisy_count"),
        F.lit(_DP_EPSILON).alias("epsilon"),
    )
