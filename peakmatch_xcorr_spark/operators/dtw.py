"""Banded dynamic time warping over explicit candidate pairs.

DTW is the elastic complement of the engine's two existing pair
metrics: FFT xcorr (kernels/xcorr.py) is invariant to a GLOBAL shift,
the matrix profile (operators/motif.py) finds repeated windows, but
neither matches curves that run the same shape at locally varying
speed — a conversation whose activity burst stretches over 90 minutes
against its 60-minute near-duplicate.  Sakoe–Chiba banding (|i-j| <=
r) keeps the DP from degenerating into match-anything pathing and
bounds the cost at O(n·r) cells per pair.

Execution model: this is a VERIFY-path kernel, like
``pairs.exact_pair_scores`` — it runs over an explicit (id_a, id_b)
candidate set (LSH buckets, xcorr matches, planted audits), never over
the N²/2 universe.  The DP is evaluated over ANTI-DIAGONALS so one
Arrow batch of P pairs advances in lock-step: cells on diagonal k
depend only on diagonals k-1 and k-2, so each of the 2n-1 steps is one
(P × n) vectorized numpy update — no per-pair Python loop, no n×n
matrix per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dtw_batch(A, B, band: int | None = None):
    """DTW distances between row-paired series: ``A``/``B`` are
    (P, n) float arrays; returns a length-P vector of banded DTW
    distances with absolute-difference local cost and unit steps
    (the classic formulation; no step weights).

    ``band`` is the Sakoe–Chiba radius: cell (i, j) is admissible iff
    |i - j| <= band.  ``None`` means unconstrained (= band n-1).
    Distances are sums of |a_i - b_j| along the optimal warp path —
    exactly 0 iff the two series are warping-equivalent (equal after
    collapsing equal-value runs to the same sequence of steps).
    """
    import numpy as np

    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    if A.shape != B.shape or A.ndim != 2:
        raise ValueError(f"A and B must be equal-shape (P, n); got {A.shape} vs {B.shape}")
    P, n = A.shape
    if n < 1:
        raise ValueError("series must be non-empty")
    r = n - 1 if band is None else int(band)
    if r < 0:
        raise ValueError("band radius must be >= 0")
    inf = np.inf
    # diag arrays indexed by i (row of the cost matrix); j = k - i
    d_km2 = np.full((P, n), inf)
    d_km1 = np.full((P, n), inf)
    i_all = np.arange(n)
    for k in range(2 * n - 1):
        lo = max(0, k - n + 1)
        hi = min(k, n - 1)
        i = i_all[lo : hi + 1]
        j = k - i
        mask = np.abs(i - j) <= r
        cur = np.full((P, n), inf)
        if mask.any():
            im, jm = i[mask], j[mask]
            cost = np.abs(A[:, im] - B[:, jm])
            if k == 0:
                cur[:, 0] = cost[:, 0]
            else:
                up = np.where(
                    im >= 1, d_km1[:, np.maximum(im - 1, 0)], inf
                )  # (i-1, j)   on diag k-1
                left = np.where(jm >= 1, d_km1[:, im], inf)  # (i, j-1)
                diag = np.where(
                    (im >= 1) & (jm >= 1),
                    d_km2[:, np.maximum(im - 1, 0)],
                    inf,
                )  # (i-1, j-1) on diag k-2
                prev = np.minimum(np.minimum(up, left), diag)
                # the origin cell has no predecessor; handled at k == 0
                cur[:, im] = cost + prev
        d_km2, d_km1 = d_km1, cur
    out = d_km1[:, n - 1]
    if not np.isfinite(out).all():
        raise ValueError(
            "DTW band too narrow to reach the terminal cell — "
            f"band {r} over length {n}"
        )
    return out


def dtw_pair_scores(
    pairs: DataFrame,
    curves: DataFrame,
    band: int | None = None,
    z_norm: bool = False,
    series_col: str = "series",
) -> DataFrame:
    """Banded DTW for an explicit pair set: join (id_a, id_b) to the
    per-conversation curve table twice (the ``exact_pair_scores``
    topology — cost scales with |pairs|, never N²/2), then one
    vectorized anti-diagonal DP per Arrow batch.

    ``z_norm=True`` z-normalizes each curve inside the kernel first
    (amplitude/offset-invariant matching, the matrix-profile metric);
    the default raw mode preserves the exact-zero warping-equivalence
    property that makes planted stretches analytic.  Returns
    ``(id_a, id_b, dtw double)`` unfiltered.
    """
    a = curves.select(
        F.col("conv_id").alias("id_a"), F.col(series_col).alias("sa")
    )
    b = curves.select(
        F.col("conv_id").alias("id_b"), F.col(series_col).alias("sb")
    )
    joined = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["sa"]])
            B = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["sb"]])
            if z_norm:
                for M in (A, B):
                    M -= M.mean(axis=1, keepdims=True)
                    s = M.std(axis=1, keepdims=True)
                    s[s == 0] = 1.0
                    M /= s
            yield pd.DataFrame({
                "id_a": pdf["id_a"],
                "id_b": pdf["id_b"],
                "dtw": dtw_batch(A, B, band),
            })

    return joined.mapInPandas(run, schema="id_a string, id_b string, dtw double")
