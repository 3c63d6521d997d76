"""Batched (block-pair) versions of the xcorr kernels.

The per-pair kernels in kernels/xcorr.py are the semantic reference;
these compute identical values (unit-tested to fp-roundoff) but
vectorize over all pairs of a block pair, which is what the blocked
self-join executes per task.  ~100× less Python overhead per pair.

Key identity for ``peakmatch_block``: the reference's range clipping
(PeakMatchRunner.java:70-86 — skip s < start, break at first strided
s >= end) is exactly "out-of-range gathers contribute zero", because
all skipped terms have a[s+offset] outside [0, M).  Gathering from a
zero-padded copy of A therefore produces the same sum; the early
break changes nothing because later strided indexes are larger and
also out of range.  Summation order differs (pairwise vs sequential),
so values agree to ~1e-15 relative, not bit-exact.
"""

from __future__ import annotations

import numpy as np

from peakmatch_xcorr_spark.kernels.xcorr import (
    JAVA_DOUBLE_MIN_VALUE,
    next_power_of_two,
)


def _peakmatch_block_one_sign(
    a_pad: np.ndarray,  # (n_a, 3M) zero-padded: a_pad[:, M:2M] = A
    b_series: np.ndarray,  # (n_b, M)
    a_offs: np.ndarray,  # (n_a, K) peak indexes (max or min)
    b_offs: np.ndarray,  # (n_b, K)
    b_above: list[np.ndarray],
    stride: int,
    m: int,
    pair_mask: np.ndarray | None,
) -> np.ndarray:
    n_a, n_b = len(a_pad), len(b_series)
    k = a_offs.shape[1]
    out = np.full((n_a, n_b), -1.0)
    for j in range(n_b):
        rows = (
            np.nonzero(pair_mask[:, j])[0] if pair_mask is not None
            else np.arange(n_a)
        )
        if len(rows) == 0:
            continue
        s = np.asarray(b_above[j][::stride], dtype=np.int64)
        if len(s) == 0:
            # empty index set: every offset's sum is 0·stride = 0 > -1
            out[rows, j] = 0.0
            continue
        # offsets per (a, k1, k2): a_off - b_off
        o = (a_offs[rows, :, None] - b_offs[j][None, None, :]).reshape(len(rows), k * k)
        g = s[None, None, :] + o[:, :, None] + m  # (rows, k², |s|)
        vals = a_pad[rows[:, None, None], g]
        sums = vals @ b_series[j, s]  # (rows, k²)
        out[rows, j] = np.maximum(sums.max(axis=1) * stride, -1.0)
    return out


def peakmatch_block(
    a_series: np.ndarray,
    a_max: np.ndarray,
    a_min: np.ndarray,
    b_series: np.ndarray,
    b_max: np.ndarray,
    b_min: np.ndarray,
    b_above: list[np.ndarray],
    stride: int,
    pair_mask: np.ndarray | None = None,
) -> np.ndarray:
    """(n_a, n_b) peakmatch scores: max(positive-peak score,
    negative-peak score) per pair (PeakMatchRunner.java:31-43).
    ``pair_mask`` restricts computation to selected cells (unmasked
    cells return -1); the blocked self-join passes the triangular /
    canonical-orientation mask so no pair is scored twice."""
    m = a_series.shape[1]
    a_pad = np.zeros((len(a_series), 3 * m))
    a_pad[:, m : 2 * m] = a_series
    pos = _peakmatch_block_one_sign(
        a_pad, b_series, a_max, b_max, b_above, stride, m, pair_mask
    )
    neg = _peakmatch_block_one_sign(
        a_pad, b_series, a_min, b_min, b_above, stride, m, pair_mask
    )
    return np.maximum(pos, neg)


def fft_xcorr_cells(
    a_series: np.ndarray,
    b_series: np.ndarray,
    ii: np.ndarray,
    jj: np.ndarray,
    chunk: int = 32,
) -> np.ndarray:
    """Exact FFT xcorr best values for SELECTED pairs (ii[k], jj[k])
    only: each side's rffts are computed once for the whole block,
    then products + irfft run only for the requested cells, chunked.
    The fused prune→verify path (no candidate shuffle).

    chunk=32 keeps each step's temporaries (gathered rffts + product +
    inverse transform, ~0.5 MB at the 256-sample default) inside one
    core's L2 and under glibc's heap-reuse threshold (r5 cache-blocking
    pass, VERDICT r4 item 4).  Measured vs the old chunk=256: 0.19 →
    0.33 Mpairs/s single-core, 4.3 → 9.2 Mpairs/s aggregate at 32
    procs, 8→32 efficiency 0.72 → 0.88."""
    m = a_series.shape[1]
    n = next_power_of_two(2 * m)
    fa = np.fft.rfft(a_series, n, axis=1)
    fb = np.fft.rfft(b_series[:, ::-1], n, axis=1)
    out = np.empty(len(ii))
    for k0 in range(0, len(ii), chunk):
        k1 = min(len(ii), k0 + chunk)
        prod = fa[ii[k0:k1]] * fb[jj[k0:k1]]
        xc = np.fft.irfft(prod, n, axis=1)
        out[k0:k1] = xc.max(axis=1)
    return np.maximum(out, JAVA_DOUBLE_MIN_VALUE)


def fft_xcorr_block(
    a_series: np.ndarray,
    b_series: np.ndarray,
    chunk: int = 8,
    chunk_i: int = 8,
) -> np.ndarray:
    """Dense (n_a, n_b) exact FFT xcorr best values (K3 batched):
    rfft each side once, then TILED broadcast products + irfft.
    Applies the getHighest Double.MIN_VALUE floor (Util.java:116-124).

    Both axes are tiled (r5, VERDICT r4 item 4): the r4 version
    chunked only the b axis, so one chunk's product + inverse-FFT
    temporaries were n_a × chunk × (16·nf + 8·n) bytes — ~235 MB at
    the 448-row block default, streamed through DRAM once per chunk
    and mmap-churned besides.  At 32 workers that aggregate working
    set is far past the shared L3 and the kernel hit the DRAM
    bandwidth wall: measured 8→32 aggregate-throughput efficiency
    0.28.  A chunk_i × chunk tile bounds the temporaries to ~1 MB —
    inside each core's private L2, and small enough that glibc serves
    the repeated same-size allocations from the heap free list
    (virtual pages reused, caches stay hot) instead of fresh mmaps.
    Measured aggregate throughput (same box): 0.07 → 0.31 Mpairs/s
    single-core, 0.50 → 8.4 Mpairs/s at 32 procs, 8→32 efficiency
    0.28 → 0.84 (tile sweep: 8×8 best at 32 procs, 4×8 within 2%)."""
    m = a_series.shape[1]
    n = next_power_of_two(2 * m)
    fa = np.fft.rfft(a_series, n, axis=1)  # (n_a, n//2+1)
    fb = np.fft.rfft(b_series[:, ::-1], n, axis=1)
    n_a, n_b = len(a_series), len(b_series)
    out = np.empty((n_a, n_b))
    for i0 in range(0, n_a, chunk_i):
        i1 = min(n_a, i0 + chunk_i)
        for j0 in range(0, n_b, chunk):
            j1 = min(n_b, j0 + chunk)
            prod = fa[i0:i1, None, :] * fb[None, j0:j1, :]  # (ci, cj, nf)
            xc = np.fft.irfft(prod, n, axis=2)
            out[i0:i1, j0:j1] = xc.max(axis=2)
    return np.maximum(out, JAVA_DOUBLE_MIN_VALUE)
