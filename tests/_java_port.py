"""Literal, line-by-line loop ports of the reference algorithms, used
ONLY as test oracles for the vectorized kernels.  Deliberately slow
and deliberately faithful (BasicEvent.java:28-146,
PeakMatchRunner.java:59-94, Util.java:92-124,214-251,
DominantFreqProcessor.java:58-140)."""

from __future__ import annotations

import math

import numpy as np


def loop_featurize(raw, conf):
    """BasicEvent constructor as a literal loop."""
    d = [0.0] * conf.expected_len
    for ii, line in enumerate(raw):
        if ii == conf.expected_len:
            break
        d[ii] = float(int(line)) if conf.int_cast_ingest else float(line)

    if conf.crop:
        peak = -1.0
        peak_index = 0
        for ii in range(conf.crop_min_peak_range, conf.crop_max_peak_range):
            if abs(d[ii]) > peak:
                peak = abs(d[ii])
                peak_index = ii
        d = d[
            peak_index - conf.crop_window_before_peak : peak_index
            + conf.crop_window_after_peak
        ]

    if conf.normalise_events:
        offset = sum(d) / len(d)
        d = [x - offset for x in d]

    rss = math.sqrt(sum(x * x for x in d))
    d = [x / rss for x in d]

    a_peaks = []
    peak_x = 0
    peak_local = 0.0
    peak_norm = 0.0
    for ii in range(1, len(d)):
        if (d[ii] > 0) != (d[ii - 1] > 0):
            a_peaks.append((peak_x, d[peak_x]))
            peak_local = 0.0
        a = abs(d[ii])
        if a > peak_local:
            peak_local = a
            peak_x = ii
        if a > peak_norm:
            peak_norm = a

    peak_amp = peak_norm * rss
    if len(a_peaks) < conf.top_k_peaks:
        raise ValueError("not enough peaks")

    a_peaks = sorted(a_peaks, key=lambda t: -t[1])  # python sort is stable
    k = conf.top_k_peaks
    max_peaks = [a_peaks[i][0] for i in range(k)]
    min_peaks = [a_peaks[len(a_peaks) - 1 - i][0] for i in range(k)]
    max_peak = a_peaks[0][1]
    min_peak = a_peaks[-1][1]
    f = conf.top_amplitude_threshold
    above = [
        ii for ii, x in enumerate(d) if x > max_peak * f or x < min_peak * f
    ]
    return (
        np.array(d),
        np.array(max_peaks),
        np.array(min_peaks),
        np.array(above),
        peak_amp,
        len(a_peaks),
    )


def loop_peakmatch_specific_offset(stride, a_d, b_d, a_offsets, b_offsets, b_above):
    length = len(a_d)
    best = -1.0
    for a_off in a_offsets:
        for b_off in b_offsets:
            offset = int(a_off) - int(b_off)
            start = -offset if offset < 0 else 0
            end = length if offset < 0 else length - offset
            d = 0.0
            kk = 0
            while kk < len(b_above) and b_above[kk] < end:
                index = b_above[kk]
                kk += stride
                if index < start:
                    continue
                d += a_d[index + offset] * b_d[index]
            d *= stride
            if d > best:
                best = d
    return best


def loop_peakmatch_best(stride, a, b):
    """a, b: EventFeatures-like tuples (series, max_peaks, min_peaks, above)."""
    pos = loop_peakmatch_specific_offset(
        stride, a.series, b.series, a.max_peaks, b.max_peaks, b.above_idx
    )
    neg = loop_peakmatch_specific_offset(
        stride, a.series, b.series, a.min_peaks, b.min_peaks, b.above_idx
    )
    return max(pos, neg)


def loop_fft_xcorr(a_d, b_d):
    """Util.fftXCorr via full complex FFT, literal."""
    n = int(2 ** math.ceil(math.log(2 * len(a_d)) / math.log(2)))
    fa = np.fft.fft(a_d, n)
    fb = np.fft.fft(np.array(b_d)[::-1], n)
    return np.real(np.fft.ifft(fa * fb))


def loop_brute_xcorr_best(a_d, b_d):
    """All-lags lagged dot product, explicit loops."""
    m = len(a_d)
    best = 5e-324
    for lag in range(-(m - 1), m):
        s = 0.0
        for i in range(m):
            j = i + lag
            if 0 <= j < m:
                s += a_d[j] * b_d[i]
        if s > best:
            best = s
    return best


def loop_band_means(d, conf):
    n = int(2 ** math.ceil(math.log(2 * len(d)) / math.log(2)))
    cs = np.fft.fft(d, n)
    half = np.abs(cs[: n // 2])
    base = n // conf.sample_rate
    lo = int(base * conf.filter_below_hz)
    hi = min(len(half), int(base * conf.filter_above_hz))
    bands: dict[float, list[float]] = {}
    current = -1.0
    for ii in range(lo, hi):
        freq = float(ii) * conf.sample_rate / n
        band_start = conf.frequency_band_hz * int(freq / conf.frequency_band_hz)
        if band_start > current:
            current = band_start
            bands[band_start] = []
        bands[current].append(half[ii])
    return (
        np.array(list(bands.keys())),
        np.array([float(np.mean(v)) for v in bands.values()]),
    )


def loop_dominant_freqs(d, conf):
    n = int(2 ** math.ceil(math.log(2 * len(d)) / math.log(2)))
    cs = np.fft.fft(d, n)
    half = np.abs(cs[: n // 2])
    base = n // conf.sample_rate
    lo = int(base * conf.filter_below_hz)
    hi = min(len(half), int(base * conf.filter_above_hz))
    freqs = []
    vals = []
    for ii in range(lo, hi):
        vals.append(half[ii])
        freqs.append((float(ii) * conf.sample_rate / n, half[ii]))
    freqs.sort(key=lambda t: -t[1])
    top = []
    for f, _ in freqs:
        if any(abs(f - g) < conf.band_width for g in top):
            continue
        top.append(f)
        if len(top) == conf.top_freq_count:
            break
    mean = float(np.mean(vals))
    std = float(np.std(vals, ddof=1))
    return np.array(top), mean, std
