"""Spectral kernels (reference parity: A1, A3-A5, K5, W7 bucketing).

Quirks reproduced exactly (unit-tested in tests/test_kernels_spectral.py):

- the padded length is nextPowerOfTwo(2·len) and the filter index
  bounds use Java INTEGER division ``paddedLen / sampleRate`` before
  the Hz multiply (Util.java:240-241, DominantFreqProcessor.java:86-87)
  then an (int) truncation;
- frequency from bin: ``(double) index * sampleRate / paddedLen``
  (Util.java:210-212);
- band start: ``bandHz * (int)(freq / bandHz)`` with (int) truncation
  (Util.java:235);
- dominant-freq stddev is the SAMPLE standard deviation (commons-math
  SummaryStatistics);
- top-K frequency dedup keeps a candidate only if it is >= band_width
  Hz from EVERY already-kept frequency (greedy in magnitude order,
  stable ties) — DominantFreqProcessor.java:98-112.
"""

from __future__ import annotations

import numpy as np

from peakmatch_xcorr_spark.config import SpectralConf
from peakmatch_xcorr_spark.kernels.xcorr import next_power_of_two


def frequency_from_fft_position(index: int, sample_rate: int, sample_count: int) -> float:
    """Util.java:210-212."""
    return float(index) * sample_rate / sample_count


def _padded_spectrum(d: np.ndarray) -> tuple[np.ndarray, int]:
    """Zero-pad to nextPowerOfTwo(2n), FFT, keep the first half
    (Util.java:217-221).  Returns (|FFT| first half, padded_len)."""
    n = next_power_of_two(len(d) * 2)
    cs = np.fft.fft(d, n)
    half = np.abs(cs[: n // 2])
    return half, n


def padded_spectra(stacked: np.ndarray) -> tuple[np.ndarray, int]:
    """Batched _padded_spectrum: one FFT call over a (rows, len) block
    of equal-length series (real input → rfft covers the kept half).
    Returns (|FFT| first halves as (rows, n//2), padded_len)."""
    n = next_power_of_two(stacked.shape[1] * 2)
    cs = np.fft.rfft(stacked, n, axis=1)
    return np.abs(cs[:, : n // 2]), n


def _filter_bounds(padded_len: int, half_len: int, conf: SpectralConf) -> tuple[int, int]:
    """Integer-division index bounds (Util.java:240-241)."""
    base = padded_len // conf.sample_rate  # Java int/int division
    lo = int(base * conf.filter_below_hz)
    hi = min(half_len, int(base * conf.filter_above_hz))
    return lo, hi


def band_means(d: np.ndarray, conf: SpectralConf) -> tuple[np.ndarray, np.ndarray]:
    """Band-mean rollup — THE downsample primitive (Util.java:214-251).

    Buckets filtered FFT bins by ``bandStart = bandHz·⌊freq/bandHz⌋``
    and returns (band_starts, band_mean_magnitudes) in ascending band
    order.  This is the tumbling-window groupBy+avg the engine
    generalizes to time buckets.
    """
    half, n = _padded_spectrum(d)
    return band_means_from_half(half, n, conf)


def band_means_from_half(
    half: np.ndarray, n: int, conf: SpectralConf
) -> tuple[np.ndarray, np.ndarray]:
    """band_means over a precomputed |FFT| half (batched-FFT path)."""
    lo, hi = _filter_bounds(n, len(half), conf)
    if hi <= lo:
        return np.empty(0), np.empty(0)
    ii = np.arange(lo, hi)
    freq = ii.astype(np.float64) * conf.sample_rate / n
    band = conf.frequency_band_hz * np.trunc(freq / conf.frequency_band_hz)
    mags = half[lo:hi]
    # bands are monotone non-decreasing over ii: groupby via change points
    change = np.concatenate(([0], np.nonzero(np.diff(band) > 0)[0] + 1))
    starts = band[change]
    sums = np.add.reduceat(mags, change)
    counts = np.diff(np.concatenate((change, [len(mags)])))
    return starts, sums / counts


def normalise_band_means(means: np.ndarray) -> np.ndarray:
    """Unit-normalize the band vector (Util.java:254-266)."""
    norm = float(np.sqrt((means * means).sum()))
    return means / norm


def dominant_frequencies(
    d: np.ndarray, conf: SpectralConf
) -> tuple[np.ndarray, float, float, np.ndarray]:
    """DominantFreqProcessor.handleEvent numeric core (java :58-140).

    Returns (top_freqs, mean_mag, stddev_mag_sample, band_mean_amps).
    """
    half, n = _padded_spectrum(d)
    return dominant_frequencies_from_half(half, n, conf)


def dominant_frequencies_from_half(
    half: np.ndarray, n: int, conf: SpectralConf
) -> tuple[np.ndarray, float, float, np.ndarray]:
    """dominant_frequencies over a precomputed |FFT| half (batched path)."""
    lo, hi = _filter_bounds(n, len(half), conf)
    mags = half[lo:hi]
    ii = np.arange(lo, hi)
    freqs = ii.astype(np.float64) * conf.sample_rate / n

    mean = float(mags.mean()) if len(mags) else float("nan")
    # commons-math SummaryStatistics: variance of ONE value is 0.0
    # (NaN only for n==0) — DominantFreqProcessor writes 0 there
    if len(mags) > 1:
        std = float(mags.std(ddof=1))
    elif len(mags) == 1:
        std = 0.0
    else:
        std = float("nan")

    # sort by magnitude desc, stable (Collections.sort on Comparable)
    order = np.argsort(-mags, kind="stable")
    top: list[float] = []
    for oi in order:
        f = freqs[oi]
        if any(abs(f - g) < conf.band_width for g in top):
            continue
        top.append(float(f))
        if len(top) == conf.top_freq_count:
            break

    base = n // conf.sample_rate
    band_amps = []
    for lo_hz, hi_hz in conf.mean_amplitude_bands:
        s = int(base * lo_hz)
        e = min(len(half), int(base * hi_hz))
        seg = half[s:e]
        band_amps.append(float(seg.mean()) if len(seg) else float("nan"))

    return np.array(top), mean, std, np.array(band_amps)


def spectrogram_buckets(
    d: np.ndarray, bucket_duration_sec: float, conf: SpectralConf
) -> list[tuple[np.ndarray, np.ndarray]]:
    """PLOT2D tumbling-window spectrogram (Plot2DProcessor.java:39-88):
    slice into ``bucketSize = durationSec·sampleRate`` chunks, band-mean
    rollup + unit-normalize each — the reference's clearest tumbling
    window; kept as the debug-formatter kernel."""
    bucket = int(bucket_duration_sec * conf.sample_rate)
    out = []
    # the reference's loop runs while ii < l and Arrays.copyOfRange
    # zero-pads past the end (Plot2DProcessor.java:50-52), so the
    # final PARTIAL bucket is emitted zero-padded, not dropped
    for s in range(0, len(d), bucket):
        chunk = np.zeros(bucket)
        seg = d[s : s + bucket]
        chunk[: len(seg)] = seg
        bands, means = band_means(chunk, conf)
        out.append((bands, normalise_band_means(means)))
    return out
