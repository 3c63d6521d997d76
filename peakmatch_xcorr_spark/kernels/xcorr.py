"""Cross-correlation kernels (reference parity: K1-K3 + oracle).

- ``peakmatch_best``      the cheap approximate pruning kernel
                          (PeakMatchRunner.java:59-94, driver :31-43)
- ``prepare_ffts``        forward + reversed-signal FFT precompute
                          (FFTPreprocessedEvent.java:22-38)
- ``fft_xcorr``           exact normalized xcorr via FFT (Util.java:92-110)
- ``get_highest``         max with the reference's Double.MIN_VALUE init
                          quirk (Util.java:116-124)
- ``brute_force_xcorr_best``  O(M²) lagged-dot-product oracle used by the
                          ANALYSE-style tests (mirrors what BRUTEFORCE
                          verifies, BruteForceProcessor.java:51-88)
"""

from __future__ import annotations

import math

import numpy as np

# Java Double.MIN_VALUE = smallest positive denormal (4.9e-324), the
# reference's max-accumulator init (Util.java:117).  An all-negative
# xcorr array therefore "maxes" to this value, not to its true max.
JAVA_DOUBLE_MIN_VALUE = 5e-324


def next_power_of_two(x: int) -> int:
    """(int) Math.pow(2, Math.ceil(Math.log(x) / Math.log(2))) —
    Util.java:40-42, reproduced with the same float formula."""
    return int(math.pow(2, math.ceil(math.log(x) / math.log(2))))


def get_highest(d: np.ndarray) -> float:
    """Max with Double.MIN_VALUE accumulator init (Util.java:116-124)."""
    m = float(np.max(d)) if len(d) else JAVA_DOUBLE_MIN_VALUE
    return m if m > JAVA_DOUBLE_MIN_VALUE else JAVA_DOUBLE_MIN_VALUE


def prepare_ffts(series: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Forward FFT of zero-padded signal + FFT of reversed signal
    (FFTPreprocessedEvent.java:22-38).  Padding to nextPowerOfTwo(2n)
    makes circular correlation equal linear correlation.

    Returns (forward_rfft, reverse_rfft, padded_len).  rfft halves are
    sufficient: the signal is real, so the complex product and inverse
    agree with the reference's full complex FFT to fp rounding.
    """
    n = next_power_of_two(2 * len(series))
    fwd = np.fft.rfft(series, n)
    rev = np.fft.rfft(series[::-1], n)
    return fwd, rev, n


def fft_xcorr(
    a_series: np.ndarray,
    b_series: np.ndarray,
    a_fwd: np.ndarray | None = None,
    b_rev: np.ndarray | None = None,
) -> np.ndarray:
    """Full xcorr sequence: real(IFFT(FFT(a) · FFT(reverse(b)))) —
    Util.java:92-110.  Since inputs are unit vectors the values are
    normalized xcorr in [-1, 1]."""
    n = next_power_of_two(2 * len(a_series))
    if a_fwd is None:
        a_fwd = np.fft.rfft(a_series, n)
    if b_rev is None:
        b_rev = np.fft.rfft(b_series[::-1], n)
    return np.fft.irfft(a_fwd * b_rev, n)


def fft_xcorr_best(a_series: np.ndarray, b_series: np.ndarray, **kw) -> float:
    """max(xcorr) with the getHighest quirk — the reference's pair score."""
    return get_highest(fft_xcorr(a_series, b_series, **kw))


def brute_force_xcorr_best(a: np.ndarray, b: np.ndarray) -> float:
    """O(M²) oracle: max over every alignment lag of sum(a[i+lag]·b[i]).

    Matches the alignment universe of the FFT path (circular xcorr of
    zero-padded signals = all linear lags -(M-1)..(M-1)); used in tests
    to certify ``fft_xcorr`` to 1e-9.
    """
    m = len(a)
    best = JAVA_DOUBLE_MIN_VALUE
    if m == 0 or len(b) == 0:  # np.correlate raises on empty input
        return best
    full = np.correlate(a, b, mode="full")  # lags -(m-1)..(m-1)
    mx = float(full.max())
    return mx if mx > best else best


def _peakmatch_specific_offset(
    stride: int,
    a_series: np.ndarray,
    b_series: np.ndarray,
    a_offsets: np.ndarray,
    b_offsets: np.ndarray,
    b_above: np.ndarray,
) -> float:
    """PeakMatchRunner.peakmatchSpecificOffset (java :59-94).

    For each (aOffset, bOffset) peak-index pair: sparse dot product of
    a (shifted) against b, evaluated at every ``stride``-th entry of
    b's above-threshold index array (stride applies to the ARRAY, not
    to sample positions), rescaled by ×stride; keep the max.  Best
    initialized to -1.
    """
    length = len(a_series)
    best = -1.0
    strided = b_above[::stride]
    for a_off in a_offsets:
        for b_off in b_offsets:
            offset = int(a_off) - int(b_off)
            start = -offset if offset < 0 else 0
            end = length if offset < 0 else length - offset
            # loop breaks at the first strided index >= end
            cut = np.searchsorted(strided, end, side="left")
            sel = strided[:cut]
            sel = sel[sel >= start]  # 'continue' keeps stride alignment
            d = float(np.dot(a_series[sel + offset], b_series[sel])) * stride
            if d > best:
                best = d
    return best


def peakmatch_best(
    stride: int,
    a_series: np.ndarray,
    b_series: np.ndarray,
    a_max_peaks: np.ndarray,
    a_min_peaks: np.ndarray,
    b_max_peaks: np.ndarray,
    b_min_peaks: np.ndarray,
    b_above: np.ndarray,
) -> float:
    """Pair score = max(positive-peak alignment score, negative-peak
    alignment score) — PeakMatchRunner.java:34-37."""
    pos = _peakmatch_specific_offset(
        stride, a_series, b_series, a_max_peaks, b_max_peaks, b_above
    )
    neg = _peakmatch_specific_offset(
        stride, a_series, b_series, a_min_peaks, b_min_peaks, b_above
    )
    return max(pos, neg)
