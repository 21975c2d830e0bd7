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
