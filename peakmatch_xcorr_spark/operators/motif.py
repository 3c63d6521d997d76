"""Matrix profile over dense activity tiers: motif + discord discovery.

The matrix profile (Yeh et al., ICDM 2016, "Matrix Profile I") of a
series T with subsequence length m is, for every offset i, the
z-normalized Euclidean distance from T[i:i+m] to its nearest
NON-TRIVIAL neighbor (|i - j| >= an exclusion zone, so a window never
"matches" its own overlap).  Its argmin pair is the series' top motif
(the most-repeated shape); its argmax is the top discord (the most
anomalous window) — the two classic whole-series structure questions
the seasonal family (which assumes a KNOWN period/phase) cannot ask.

Engine lineage: this is the reference's peak/xcorr idea turned inward —
peakmatch-xcorr asks "which two CURVES correlate" (PeakMatchRunner.java
pair scores); the matrix profile asks "which two WINDOWS of one curve
repeat".  Both reduce to normalized sliding dot products; here they are
computed per diagonal with the STOMP O(1)-update identity
(Zhu et al., ICDM 2016) in cumulative-sum form, so a length-L tier
costs O(L^2) flops in O(L) vectorized numpy passes — no L x L matrix,
no per-window FFT.

Scale notes (100 TB / 10^12 turns): the kernel runs per KEY over that
key's dense tier (bounded by time span / bucket width, not by turn
count — a year of hourly buckets is 8,760 floats, ~600M flops, tens of
ms), one applyInPandas task per key after the tier's single groupBy
exchange.  Cross-key parallelism is the scale axis, same contract as
``seasonal.detect_period``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def matrix_profile(v, m: int, excl: int | None = None):
    """Exact self-join matrix profile of 1-D series ``v`` with window
    ``m``.  Returns ``(profile, index)`` — both length ``L - m + 1`` —
    where ``profile[i]`` is the z-normalized Euclidean distance from
    window i to its nearest neighbor at least ``excl`` offsets away
    (default ``max(1, m // 2)``, the original paper's trivial-match
    zone) and ``index[i]`` is that neighbor's offset (-1 when no
    admissible neighbor exists).

    Flat-window convention (constant subsequences have no z-norm):
    flat-vs-flat distance 0, flat-vs-non-flat ``sqrt(m)`` — the
    midpoint of the [0, 2*sqrt(m)] range, stumpy's convention.

    Diagonal evaluation: for offset gap d, the sliding dot products
    ``QT_d[i] = dot(T[i:i+m], T[i+d:i+d+m])`` for ALL i are one
    elementwise product ``T[:L-d] * T[d:]`` plus one cumsum — the
    STOMP rolling update collapsed into vector form.  Pearson
    ``r = (QT - m*mu_i*mu_j) / (m*sig_i*sig_j)`` then gives
    ``dist^2 = 2m(1 - r)``; running minima update both ends of the
    diagonal.  O(L) numpy passes, O(L) memory.
    """
    import numpy as np

    v = np.asarray(v, dtype=np.float64)
    L = len(v)
    if m < 3:
        raise ValueError("subsequence length m must be >= 3")
    n = L - m + 1
    if excl is None:
        excl = max(1, m // 2)
    if excl < 1:
        raise ValueError("exclusion zone must be >= 1")
    if n < excl + 1:
        raise ValueError(
            f"series too short: {L} buckets give {n} windows of {m}, "
            f"need > excl ({excl}) for any admissible pair"
        )
    c1 = np.cumsum(np.concatenate(([0.0], v)))
    c2 = np.cumsum(np.concatenate(([0.0], v * v)))
    mu = (c1[m:] - c1[:-m]) / m
    var = (c2[m:] - c2[:-m]) / m - mu * mu
    # cumsum cancellation can leave tiny negatives on flat windows
    var = np.maximum(var, 0.0)
    sig = np.sqrt(var)
    # flat threshold relative to window magnitude: exact-constant
    # windows land at 0 modulo cancellation noise
    flat = sig <= 1e-12 * np.maximum(1.0, np.abs(mu))

    prof = np.full(n, np.inf)
    idx = np.full(n, -1, dtype=np.int64)
    sqrt_m = float(np.sqrt(m))
    for d in range(excl, n):
        prod = v[: L - d] * v[d:]
        cp = np.cumsum(np.concatenate(([0.0], prod)))
        qt = cp[m:] - cp[:-m]  # length n - d
        i = np.arange(n - d)
        j = i + d
        num = qt - m * mu[i] * mu[j]
        denom = m * sig[i] * sig[j]
        fi, fj = flat[i], flat[j]
        ok = ~(fi | fj)
        r = np.zeros(n - d)
        np.divide(num, denom, out=r, where=ok)
        d2 = 2.0 * m * (1.0 - r)
        dist = np.sqrt(np.maximum(d2, 0.0))
        dist[fi & fj] = 0.0
        dist[fi ^ fj] = sqrt_m
        upd = dist < prof[i]
        prof[i[upd]] = dist[upd]
        idx[i[upd]] = j[upd]
        upd = dist < prof[j]
        prof[j[upd]] = dist[upd]
        idx[j[upd]] = i[upd]
    return prof, idx


def matrix_profile_tier(
    dense: DataFrame,
    keys: list[str],
    m: int = 24,
    excl: int | None = None,
) -> DataFrame:
    """Per-key motif/discord summary of a dense count tier (the
    ``seasonal.dense_bucket_counts`` shape ``(*keys, b, v)``).

    Returns one row per key with enough windows:

    ``L`` (tier length), ``n_windows``, ``motif_a`` / ``motif_b``
    (ABSOLUTE bucket ids of the top motif pair's window starts, a < b),
    ``motif_dist``, ``discord_b`` (window start of the max-profile
    window), ``discord_nn`` (its nearest neighbor's start) and
    ``discord_dist``.  Ties break to the lowest offset (numpy
    argmin/argmax-first), making the output deterministic.

    One applyInPandas per key; keys too short for any admissible pair
    emit nothing (same convention as ``detect_period``).
    """
    import numpy as np
    import pandas as pd

    key_fields = ", ".join(f"{k} string" for k in keys)
    schema = (
        f"{key_fields}, L long, n_windows long, "
        "motif_a long, motif_b long, motif_dist double, "
        "discord_b long, discord_nn long, discord_dist double"
    )
    ez = excl

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("b")
        v = pdf["v"].to_numpy(dtype=np.float64)
        b0 = int(pdf["b"].iloc[0])
        L = len(v)
        n = L - m + 1
        zone = ez if ez is not None else max(1, m // 2)
        if n < zone + 1:
            return pd.DataFrame(
                {f: pd.Series(dtype=d) for f, d in (
                    *[(k, "object") for k in keys],
                    ("L", "int64"), ("n_windows", "int64"),
                    ("motif_a", "int64"), ("motif_b", "int64"),
                    ("motif_dist", "float64"),
                    ("discord_b", "int64"), ("discord_nn", "int64"),
                    ("discord_dist", "float64"),
                )}
            )
        prof, idx = matrix_profile(v, m, ez)
        mo = int(np.argmin(prof))
        di = int(np.argmax(prof))
        a, bb = sorted((mo, int(idx[mo])))
        return pd.DataFrame({
            **{kc: [pdf[kc].iloc[0]] for kc in keys},
            "L": np.array([L], dtype=np.int64),
            "n_windows": np.array([n], dtype=np.int64),
            "motif_a": np.array([b0 + a], dtype=np.int64),
            "motif_b": np.array([b0 + bb], dtype=np.int64),
            "motif_dist": np.array([prof[mo]], dtype=np.float64),
            "discord_b": np.array([b0 + di], dtype=np.int64),
            "discord_nn": np.array([b0 + int(idx[di])], dtype=np.int64),
            "discord_dist": np.array([prof[di]], dtype=np.float64),
        })

    return dense.groupBy(*keys).applyInPandas(run, schema=schema)
