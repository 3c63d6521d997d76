from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.config import SpectralConf
from peakmatch_xcorr_spark.kernels.spectral import (
    band_means,
    dominant_frequencies,
    frequency_from_fft_position,
    normalise_band_means,
    spectrogram_buckets,
)
from tests._java_port import loop_band_means, loop_dominant_freqs

CONF = SpectralConf()


def sine(freq_hz: float, m: int = 800, sr: int = 100, amp: float = 100.0):
    t = np.arange(m) / sr
    return amp * np.sin(2 * np.pi * freq_hz * t)


def test_frequency_from_fft_position():
    assert frequency_from_fft_position(81, 100, 8192) == pytest.approx(
        81 * 100 / 8192
    )


def test_band_means_matches_literal_port(rng):
    for _ in range(5):
        d = rng.normal(0, 1, 700)
        b_got, m_got = band_means(d, CONF)
        b_exp, m_exp = loop_band_means(d, CONF)
        np.testing.assert_allclose(b_got, b_exp, atol=0)
        np.testing.assert_allclose(m_got, m_exp, rtol=1e-12)


def test_band_means_integer_division_quirk():
    # padded len 2048 for m=700; 2048 // 100 = 20 (int division), so the
    # below-1Hz cutoff index is 20, NOT round(2048/100*1.0)=20.48→20;
    # with sr=300: 2048//300=6 → lo=6 (not 6.83→6) — assert via port
    conf = SpectralConf(sample_rate=300)
    d = np.ones(700)
    b_got, m_got = band_means(d, conf)
    b_exp, m_exp = loop_band_means(d, conf)
    np.testing.assert_allclose(b_got, b_exp)
    np.testing.assert_allclose(m_got, m_exp, rtol=1e-12)


def test_dominant_freq_finds_planted_sines(rng):
    d = sine(3.0) + 0.5 * sine(7.0) + rng.normal(0, 0.1, 800)
    top, mean, std, _ = dominant_frequencies(d, CONF)
    assert abs(top[0] - 3.0) < 0.2
    assert any(abs(f - 7.0) < 0.3 for f in top[:3])


def test_dominant_freq_matches_literal_port(rng):
    for _ in range(5):
        d = rng.normal(0, 1, 777)
        top_g, mean_g, std_g, _ = dominant_frequencies(d, CONF)
        top_e, mean_e, std_e = loop_dominant_freqs(d, CONF)
        np.testing.assert_allclose(top_g, top_e, atol=0)
        assert mean_g == pytest.approx(mean_e, rel=1e-12)
        assert std_g == pytest.approx(std_e, rel=1e-9)


def test_dominant_freq_band_dedup_spacing():
    conf = SpectralConf(band_width=2.0, top_freq_count=3)
    d = sine(3.0) + 0.9 * sine(3.4)  # within one band of each other
    top, *_ = dominant_frequencies(d, conf)
    assert all(
        abs(a - b) >= 2.0 for i, a in enumerate(top) for b in top[i + 1:]
    )


def test_mean_amplitude_bands():
    conf = SpectralConf(mean_amplitude_bands=((1.5, 5.0), (5.0, 7.8)))
    d = sine(3.0)
    _, _, _, amps = dominant_frequencies(d, conf)
    assert len(amps) == 2
    assert amps[0] > amps[1]  # 3 Hz energy lands in the first band


def test_normalise_band_means():
    v = normalise_band_means(np.array([3.0, 4.0]))
    np.testing.assert_allclose(v, [0.6, 0.8])


def test_spectrogram_buckets():
    conf = SpectralConf()
    d = np.concatenate((sine(2.0, 400), sine(8.0, 400)))
    buckets = spectrogram_buckets(d, 4.0, conf)  # 4s × 100Hz = 400-sample chunks
    assert len(buckets) == 2
    for bands, means in buckets:
        assert np.sqrt((means ** 2).sum()) == pytest.approx(1.0)
    # energy moves from low bands (bucket 0) to high bands (bucket 1)
    b0, m0 = buckets[0]
    b1, m1 = buckets[1]
    assert b0[np.argmax(m0)] < b1[np.argmax(m1)]


def test_batched_spectra_match_scalar_path(rng):
    """padded_spectra (one rfft over a stacked block) must reproduce the
    per-row _padded_spectrum path bit-for-bit enough that the derived
    band means / dominant freqs are identical (same rank order, ~1e-9)."""
    from peakmatch_xcorr_spark.kernels.spectral import (
        band_means_from_half,
        dominant_frequencies_from_half,
        padded_spectra,
    )

    series = [
        sine(7.0) + rng.normal(0, 1, 800),
        sine(13.0, amp=50.0) + rng.normal(0, 1, 800),
        rng.normal(0, 10, 800),
    ]
    halves, n = padded_spectra(np.stack(series))
    for d, half in zip(series, halves):
        top_s, mean_s, std_s, amps_s = dominant_frequencies(d, CONF)
        top_b, mean_b, std_b, amps_b = dominant_frequencies_from_half(
            half, n, CONF
        )
        np.testing.assert_allclose(top_b, top_s, rtol=0, atol=1e-9)
        assert mean_b == pytest.approx(mean_s, abs=1e-9)
        assert std_b == pytest.approx(std_s, abs=1e-9)
        np.testing.assert_allclose(amps_b, amps_s, rtol=1e-12)
        b_s, m_s = band_means(d, CONF)
        b_b, m_b = band_means_from_half(half, n, CONF)
        np.testing.assert_array_equal(b_b, b_s)
        np.testing.assert_allclose(m_b, m_s, rtol=1e-12)


def test_spectrogram_emits_zero_padded_partial_final_bucket():
    """Plot2DProcessor.java:50-52 zero-pads past the end, so a final
    partial bucket IS emitted (code-review r2: it was dropped)."""
    d = sine(5.0, m=1000)  # 2.5 buckets of 400 samples
    conf = SpectralConf(sample_rate=100, filter_below_hz=1.0, filter_above_hz=40.0)
    buckets = spectrogram_buckets(d, 4.0, conf)
    assert len(buckets) == 3
    # shorter than one bucket still yields one (zero-padded) bucket
    assert len(spectrogram_buckets(d[:100], 4.0, conf)) == 1
    # the padded partial bucket still sees the 5 Hz tone
    b2, m2 = buckets[2]
    assert b2[int(np.argmax(m2))] == pytest.approx(5.0, abs=0.5)


def test_stddev_of_single_bin_is_zero_like_commons_math():
    """commons-math SummaryStatistics: variance of one value is 0.0,
    NaN only for n==0 (code-review r2)."""
    from peakmatch_xcorr_spark.kernels.spectral import dominant_frequencies

    # narrow filter leaving exactly one bin: len=2 -> padded 4,
    # base = 4 // 4 = 1, lo = 1*1.0 = 1, hi = min(2, 1*2.0) = 2 -> 1 bin
    conf = SpectralConf(sample_rate=4, filter_below_hz=1.0,
                        filter_above_hz=2.0, frequency_band_hz=0.5)
    _, mean, std, _ = dominant_frequencies(np.array([1.0, 2.0]), conf)
    assert std == 0.0 and not np.isnan(mean)
