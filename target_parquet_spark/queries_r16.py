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
