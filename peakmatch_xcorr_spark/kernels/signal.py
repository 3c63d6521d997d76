"""Per-event signal featurization (reference parity: P1-P7).

Reproduces, in vectorized numpy, the exact semantics of the
reference's event construction:

- ingest int-cast quantization    BasicEvent.java:50
- truncate / zero-pad to M        BasicEvent.java:40-56
- crop around window peak         Util.java:44-81
- optional mean-centering         BasicEvent.java:64-77
- L2 unit normalization (not RMS) BasicEvent.java:81-91
- zero-crossing peak extraction   BasicEvent.java:93-114
- peakAmp scalar                  BasicEvent.java:111-116
- signed top-K peak/trough sort   BasicEvent.java:118-139
- amplitude-threshold index set   BasicEvent.java:140-145

All quirks are deliberate and unit-tested against a literal loop port
(tests/test_kernels_signal.py):

- values are truncated toward zero on ingest ((int) cast);
- the peak-extraction loop starts at index 1, so index 0 can win a
  segment only by default (all-zero first segment) and its amplitude
  never contributes to peakAmp;
- a segment's peak is emitted only when the *next* zero crossing
  occurs, so the final segment never emits;
- an all-zero segment re-emits the previous segment's winner;
- peaks sort by SIGNED value descending (stable), not by |amplitude|.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from peakmatch_xcorr_spark.config import PeakmatchConf


@dataclass(frozen=True)
class EventFeatures:
    """Featurized event: the Spark row payload for the pair kernels."""

    series: np.ndarray  # float64[M], unit-normalized
    max_peaks: np.ndarray  # int32[K] sample indexes of top-K peaks
    min_peaks: np.ndarray  # int32[K] sample indexes of top-K troughs
    above_idx: np.ndarray  # int32[*] indexes above amplitude threshold
    peak_amp: float
    n_peaks: int


def ingest_values(
    values: np.ndarray, expected_len: int, int_cast: bool = True
) -> np.ndarray:
    """Reference ingest: truncate/zero-pad to ``expected_len`` and
    quantize each value with the Java ``(int)`` cast (truncation toward
    zero) — BasicEvent.java:40-56, cast at :50.

    Full JLS narrowing semantics, not just trunc: (int)NaN == 0 and
    out-of-range / infinite values saturate to Integer.MIN/MAX_VALUE
    (Double.parseDouble accepts 'NaN'/'Infinity' lines, so these
    inputs are reachable from real event files)."""
    v = np.asarray(values, dtype=np.float64)
    if int_cast:
        v = np.trunc(v)  # Java (int) cast truncates toward zero
        v = np.nan_to_num(v, nan=0.0, posinf=2147483647.0, neginf=-2147483648.0)
        v = np.clip(v, -2147483648.0, 2147483647.0)
    out = np.zeros(expected_len, dtype=np.float64)
    n = min(len(v), expected_len)
    out[:n] = v[:n]
    return out


def crop(d: np.ndarray, conf: PeakmatchConf) -> np.ndarray:
    """Crop around the |max| peak found in a configured index window
    (Util.java:44-81).  Strict ``>`` comparison: the FIRST index
    attaining the window max wins."""
    if not conf.crop:
        return d
    lo, hi = conf.crop_min_peak_range, conf.crop_max_peak_range
    if hi > len(d):
        raise ValueError("crop peak range out of bounds")
    window = np.abs(d[lo:hi])
    peak_index = lo + int(np.argmax(window))  # argmax returns first max
    start = peak_index - conf.crop_window_before_peak
    end = peak_index + conf.crop_window_after_peak
    if start < 0 or end > len(d):
        raise ValueError(
            f"array out of bounds while cropping ({start}:{end}) - "
            "check crop parameters vs. file line count"
        )
    return d[start:end].copy()


def _extract_peaks(d: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """Zero-crossing segmented peak extraction (BasicEvent.java:93-114).

    Returns (peak_indexes, peak_values_signed, peak_normalised_amp) in
    emission order.  Vectorized equivalent of the reference loop; the
    loop semantics are documented in the module docstring.
    """
    n = len(d)
    if n < 2:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float64),
            0.0,
        )
    pos = d > 0
    # crossing at index ii (1-based) when sign(d[ii]) != sign(d[ii-1])
    cross = np.nonzero(pos[1:] != pos[:-1])[0] + 1
    abs_d = np.abs(d)
    # index 0 is never compared in the reference loop (starts at ii=1):
    # it can only be emitted as the initial default peakX=0.
    abs_consider = abs_d.copy()
    abs_consider[0] = 0.0
    peak_normalised_amp = float(abs_d[1:].max()) if n > 1 else 0.0

    if len(cross) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), peak_normalised_amp

    # segments: [0, c1), [c1, c2), ..., [ck, n) — the last never emits
    starts = np.concatenate(([0], cross))
    seg_max = np.maximum.reduceat(abs_consider, starts)
    n_seg = len(starts)
    # first index attaining the segment max (strict '>' in the loop
    # means the earliest occurrence wins)
    seg_of = np.zeros(n, dtype=np.int64)
    seg_of[cross] = 1
    seg_of = np.cumsum(seg_of)
    idx = np.arange(n)
    hit = abs_consider == seg_max[seg_of]
    cand = np.where(hit, idx, n)
    winner = np.minimum.reduceat(cand, starts)
    # all-zero segment: carry the previous segment's winner (initial
    # default peakX=0) — forward-fill over invalid segments
    valid = seg_max > 0
    fill = np.maximum.accumulate(np.where(valid, np.arange(n_seg), -1))
    carried = np.where(fill >= 0, winner[np.maximum(fill, 0)], 0)
    emitted = carried[:-1]  # last segment never emits
    return emitted.astype(np.int64), d[emitted], peak_normalised_amp


def featurize(
    raw: np.ndarray, conf: PeakmatchConf, pre_ingested: bool = False,
    series_len: int | None = None,
) -> EventFeatures:
    """Full reference event construction (BasicEvent.java:28-146).

    ``raw`` is the raw value sequence (one per reference file line).
    Raises ValueError when fewer than ``top_k_peaks`` peaks exist,
    matching the reference's EventException (BasicEvent.java:118-119);
    the scan operator maps that to its continue-on-error policy.

    ``series_len`` overrides the pad/truncate length (default
    ``conf.expected_len``) — callers whose input is already a
    fixed-length curve pass its length so the int-cast quirk can apply
    WITHOUT re-padding to an unrelated configured length.
    """
    d = raw if pre_ingested else ingest_values(
        raw,
        series_len if series_len is not None else conf.expected_len,
        conf.int_cast_ingest,
    )
    d = crop(d, conf)

    if conf.normalise_events:
        d = d - d.sum() / len(d)

    root_sum_sq = float(np.sqrt((d * d).sum()))
    d = d / root_sum_sq  # NaN/inf on zero signal, as in the reference

    peak_idx, peak_val, peak_norm_amp = _extract_peaks(d)
    peak_amp = peak_norm_amp * root_sum_sq

    k = conf.top_k_peaks
    if len(peak_idx) < k:
        raise ValueError(
            f"event doesn't have enough peaks ({len(peak_idx)} found, {k} required)"
        )

    # sort by SIGNED value descending, stable (BasicEvent.java:122-127)
    order = np.argsort(-peak_val, kind="stable")
    max_peaks = peak_idx[order[:k]]
    # minSpatialPeaks[ii] = aPeaks[size-1-ii] (BasicEvent.java:134-136)
    min_peaks = peak_idx[order[::-1][:k]]

    max_peak_val = peak_val[order[0]]
    min_peak_val = peak_val[order[-1]]
    f = conf.top_amplitude_threshold
    above = np.nonzero((d > max_peak_val * f) | (d < min_peak_val * f))[0]

    return EventFeatures(
        series=d,
        max_peaks=max_peaks.astype(np.int32),
        min_peaks=min_peaks.astype(np.int32),
        above_idx=above.astype(np.int32),
        peak_amp=float(peak_amp),
        n_peaks=int(len(peak_idx)),
    )
