"""Seasonal structure over rolled activity tiers: classical
decomposition (trend / seasonal / residual) and seasonal-baseline
anomaly detection.

The engine generalization of the reference's per-band spectral
summaries (DominantFreqProcessor.java:90-150 reduces a curve to
band means; these operators reduce it to a *periodic profile*): where
``dominant_freq`` asks "which frequency dominates", ``seasonal_profile``
asks "what does one cycle of the known period look like", and
``seasonal_baseline_anomaly`` asks "which buckets deviate from their
own phase's history" — the hour-of-day / hour-of-week baselines every
monitoring-grade time-series engine ships.

Numeric determinism (the oracle-hash contract, same discipline as
``operators/stats.py``): inputs are tumbling-bucket COUNTS (int64), so
every window sum, lag/lead, and group sum below is exact integer
arithmetic; each output statistic is ONE closed-form float expression
over those integer sums, literally mirrored by the DuckDB oracle.
The classical 2xM centered moving average is kept in cleared-denominator
integer form (``2*period*v - 2*S + lag + lead``) until the final
division for exactly this reason.

Scale notes (100 TB / 10^12 turns):
- the dense spine is per-key bounded (each key's own [min,max] bucket
  span), identical to ``rollup.bucket_scaffold``; no global scaffold.
- after the first reduction to (key, bucket) counts, every downstream
  row count is |buckets|, not |turns| — at 10^12 turns / 10^5 keys /
  hourly buckets that is ~10^9 rows into the windows, each key's
  partition independent (one exchange per window family).
- the seasonal profile's final state is ``period`` rows per key —
  broadcast-joinable back to any tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.rollup import bucket_seconds, epoch_seconds


def dense_bucket_counts(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    bucket: str = "1 hour",
) -> DataFrame:
    """Zero-filled per-key tumbling counts on an integer bucket index.

    Returns ``(*keys, b:long, v:long)`` where ``b = floor(epoch/step)``
    (epoch-anchored, so ``b % period`` is a stable phase index across
    keys) and ``v`` is the row count, 0 on gap buckets.  Counts are
    genuinely dense — a bucket with no rows has count 0, unlike value
    gap-fill where absence means "unknown" — which is what makes the
    integer-exact seasonal arithmetic below possible.
    """
    step = bucket_seconds(bucket)
    counts = df.groupBy(
        *keys,
        F.floor(epoch_seconds(ts_col) / F.lit(step)).cast("long").alias("b"),
    ).agg(F.count(F.lit(1)).alias("v"))
    spine = (
        counts.groupBy(*keys)
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(*keys, F.explode(F.sequence("lo", "hi")).alias("b"))
    )
    return (
        spine.join(counts, [*keys, "b"], "left")
        .withColumn("v", F.coalesce("v", F.lit(0)).cast("long"))
    )


def seasonal_profile(
    dense: DataFrame,
    keys: list[str],
    period: int = 24,
) -> DataFrame:
    """Classical additive decomposition, seasonal component: per
    ``(key, phase)`` the mean detrended value, centered to sum 0 over
    one cycle.

        trend_t   = centered 2xM moving average (M = period)
        detrend_t = v_t - trend_t
        raw_j     = mean(detrend_t : t % period == j)
        seasonal_j = raw_j - mean_j(raw_j)

    Even ``period`` uses the standard 2xM MA (half weight on the two
    end points): ``trend = (S - (a+c)/2) / period`` with ``S`` the
    (period+1)-wide centered sum and ``a``/``c`` the lag/lead at
    distance period/2.  Odd ``period`` uses the plain period-wide
    centered average.

    Exactness: the estimation window is trimmed to a WHOLE number of
    cycles (``n_cycles = (L - width + 1) div period`` valid rows per
    phase, identical for every phase), so ``raw_j`` has a common
    denominator and the centering is a single integer-numerator float
    division — the DuckDB oracle reproduces it bit-for-bit.  Keys whose
    span affords no complete cycle of trend-valid rows emit nothing.

    Plan: the two windows (centered sum, lag/lead) share one
    partitionBy(keys) sort; then groupBy(keys, phase) and a
    period-sized per-key window.  |rows| is the dense bucket count —
    see module scale notes.
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    even = period % 2 == 0
    half = period // 2
    width = period + 1 if even else period
    wk = Window.partitionBy(*keys).orderBy("b")
    wc = wk.rowsBetween(-half, half)
    # dense series => frame completeness is pure position arithmetic
    pos = F.col("b") - F.min("b").over(Window.partitionBy(*keys))
    span = (
        F.max("b").over(Window.partitionBy(*keys))
        - F.min("b").over(Window.partitionBy(*keys))
        + F.lit(1)
    )
    n_cycles = F.floor((span - F.lit(width) + F.lit(1)) / F.lit(period))
    rows = (
        dense.withColumn("S", F.sum("v").over(wc))
        .withColumn("pos", pos)
        .withColumn("n_cycles", n_cycles)
    )
    if even:
        rows = (
            rows.withColumn("a", F.lag("v", half).over(wk))
            .withColumn("c", F.lead("v", half).over(wk))
            # detrended * 2*period, integer-exact
            .withColumn(
                "num",
                F.lit(2 * period) * F.col("v")
                - F.lit(2) * F.col("S")
                + F.col("a")
                + F.col("c"),
            )
        )
        denom = 2 * period
    else:
        rows = rows.withColumn(
            "num", F.lit(period) * F.col("v") - F.col("S")
        )
        denom = period
    valid = rows.filter(
        (F.col("n_cycles") >= 1)
        & (F.col("pos") >= half)
        & (F.col("pos") - half < F.col("n_cycles") * period)
    )
    grouped = valid.groupBy(
        *keys, F.pmod(F.col("b"), F.lit(period)).alias("phase")
    ).agg(
        F.sum("num").alias("I"),
        F.min("n_cycles").alias("n_cycles"),
    )
    wt = Window.partitionBy(*keys)
    return grouped.select(
        *keys,
        "phase",
        F.col("n_cycles").cast("long").alias("n_cycles"),
        F.round(
            (F.lit(period) * F.col("I") - F.sum("I").over(wt))
            / (F.lit(float(denom)) * F.col("n_cycles") * F.lit(period))
            + F.lit(1e-9),
            6,
        ).alias("seasonal"),
    )


def seasonal_baseline_anomaly(
    dense: DataFrame,
    keys: list[str],
    period: int = 24,
    z_thresh: float = 3.0,
    min_periods: int = 8,
) -> DataFrame:
    """Phase-baseline anomaly detection: each bucket is compared to
    the OTHER buckets sharing its phase (``b % period`` — hour-of-day
    for period 24 on an hourly tier, hour-of-week for 168), via a
    leave-one-out z-score:

        mean_loo = (S1 - v) / (n-1)
        var_loo  = ((n-1)*(S2 - v^2) - (S1 - v)^2) / ((n-1)*(n-2))
        z        = (v - mean_loo) / sqrt(var_loo)

    Leave-one-out matters: a single large spike inflates the plain
    baseline's mean AND stddev enough to hide itself at moderate n;
    excluding the point under test restores the planted-spike z to its
    true magnitude (the same reasoning as ``rolling_zscore``'s
    trailing-only frame, transposed from time-adjacency to
    phase-adjacency).

    Exactness: ``n, S1 = sum(v), S2 = sum(v^2)`` per (key, phase) are
    exact int64 sums of int64 counts; mean/var/z are single closed-form
    float expressions the DuckDB oracle mirrors literally.  Int64
    envelope: exact while n * max(v)^2 < 2^63 — hourly counts up to
    ~3*10^9 per bucket at a million buckets per key, far beyond any
    real tier.

    Returns only the anomalous rows (|z| > z_thresh, baseline size
    >= min_periods).  Plan: one groupBy exchange to build the per-phase
    baselines (period rows per key — broadcast back), one broadcast
    join; the dense tier is never re-shuffled.
    """
    if min_periods < 3:
        raise ValueError("min_periods must be >= 3 (sample variance needs n-1 >= 2)")
    phased = dense.withColumn("phase", F.pmod(F.col("b"), F.lit(period)))
    base = phased.groupBy(*keys, "phase").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("S1"),
        F.sum(F.col("v") * F.col("v")).alias("S2"),
    )
    j = phased.join(F.broadcast(base), [*keys, "phase"])
    n1 = F.col("n") - F.lit(1)
    mean_loo = (F.col("S1") - F.col("v")) / n1
    var_num = n1 * (F.col("S2") - F.col("v") * F.col("v")) - (
        (F.col("S1") - F.col("v")) * (F.col("S1") - F.col("v"))
    )
    var_loo = var_num / (n1 * (n1 - F.lit(1)))
    z = (F.col("v") - mean_loo) / F.sqrt(var_loo)
    return (
        j.filter(F.col("n") >= F.lit(min_periods))
        .withColumn("_var", var_loo)
        .filter(F.col("_var") > F.lit(1e-12))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > F.lit(z_thresh))
        .select(
            *keys,
            "b",
            "phase",
            "v",
            F.round(mean_loo + F.lit(1e-9), 6).alias("baseline_mean"),
            F.round(F.col("z") + F.lit(1e-9), 6).alias("z"),
        )
    )


def detect_period(
    dense: DataFrame,
    keys: list[str],
    min_period: int = 2,
    max_period: int | None = None,
) -> DataFrame:
    """Dominant-period detection per key over a dense count tier: the
    rFFT bin of the mean-centered series with the largest magnitude,
    searched over cycle counts ``k`` with ``L/k`` in
    ``[min_period, max_period]`` (ties break to the smallest k =
    longest period, matching numpy argmax-first).  This is the engine
    feeding its own seasonal family: ``detect_period`` → feed
    ``period`` into ``seasonal_profile`` / ``holt_winters_smooth``
    instead of guessing 24.

    The reference's dominant-frequency kernel transposed from curve
    samples to tier buckets (DominantFreqProcessor.java:58-140; same
    argmax-of-|FFT| idea, but UNPADDED — an integer-cycle tone over
    exactly L buckets lands on one bin with zero leakage, which is
    what makes planted inputs analytic).

    Returns per key: ``L`` (bucket count), ``dominant_cycles`` (the
    winning k), ``period`` (= L/k, double), ``period_buckets``
    (nearest int), and ``strength`` — the winning bin's share of the
    centered spectrum's energy over the searched range, a unitless
    0..1 periodicity score.

    Execution: one ``applyInPandas`` per key (the FFT needs the whole
    series, so the group materializes — a key's DENSE TIER, bounded
    by span/bucket, not its raw turns; a year of hourly buckets is
    8760 floats).  Keys whose searched k-range is empty emit nothing.
    """
    import numpy as np
    import pandas as pd

    if min_period < 2:
        raise ValueError("min_period must be >= 2")
    if max_period is not None and max_period < min_period:
        raise ValueError("max_period must be >= min_period")
    key_fields = ", ".join(f"{k} string" for k in keys)
    schema = (
        f"{key_fields}, L long, dominant_cycles long, period double, "
        "period_buckets int, strength double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("b")
        v = pdf["v"].to_numpy(dtype=np.float64)
        L = len(v)
        # k = number of whole cycles in the window; L/k = period
        k_lo = max(2, int(np.ceil(L / max_period)) if max_period else 2)
        k_hi = L // min_period
        if k_hi < k_lo:
            return pd.DataFrame(
                {f: pd.Series(dtype=d) for f, d in (
                    *[(k, "object") for k in keys],
                    ("L", "int64"), ("dominant_cycles", "int64"),
                    ("period", "float64"), ("period_buckets", "int32"),
                    ("strength", "float64"),
                )}
            )
        mag2 = np.abs(np.fft.rfft(v - v.mean())) ** 2
        window = mag2[k_lo : k_hi + 1]
        best = int(np.argmax(window))
        k = k_lo + best
        total = float(window.sum())
        return pd.DataFrame({
            **{kc: [pdf[kc].iloc[0]] for kc in keys},
            "L": np.array([L], dtype=np.int64),
            "dominant_cycles": np.array([k], dtype=np.int64),
            "period": np.array([L / k], dtype=np.float64),
            "period_buckets": np.array(
                [int(round(L / k))], dtype=np.int32
            ),
            "strength": np.array(
                [float(window[best]) / total if total > 0 else 0.0],
                dtype=np.float64,
            ),
        })

    return dense.groupBy(*keys).applyInPandas(run, schema=schema)


# consistency constant: 1/Phi^-1(3/4) — MAD of a normal equals
# 0.6745*sigma, so this rescales MAD to a sigma estimate.  Literal so
# the DuckDB oracle uses the identical double.
MAD_SIGMA = 1.4826022185056018


def seasonal_robust_anomaly(
    dense: DataFrame,
    keys: list[str],
    period: int = 24,
    z_thresh: float = 3.5,
    min_periods: int = 8,
) -> DataFrame:
    """Robust (median/MAD) phase-baseline anomaly detection: each
    bucket is compared to the buckets sharing its phase via

        rz = (v - median) / (MAD_SIGMA * median(|v - median|))

    flagged at ``|rz| > z_thresh`` (3.5 is the Iglewicz-Hoaglin
    modified-z convention).

    This is the breakdown-resistant sibling of
    ``seasonal_baseline_anomaly``: the LOO z defends against ONE spike
    inflating its own baseline, but k co-phase spikes still inflate a
    mean/stddev baseline for each other, while the median/MAD pair
    tolerates up to half the window being contaminated — the test
    suite pins a 3-repeated-incident case that the z-baseline misses
    and this flags.  No leave-one-out is needed (robustness IS the
    defense), which also keeps the arithmetic two plain medians.

    Exactness: medians of int64 counts interpolate to exact halves
    identically in Spark (``percentile``, exact) and DuckDB
    (``median``); |v - med| values are then exact .0/.5 doubles whose
    median is again exact — so the only inexact float op is the final
    division, mirrored literally.  Zero-MAD baselines (more than half
    the phase's buckets identical) are excluded rather than flagged at
    infinity.

    Plan: two hash aggregates over (keys, phase) — medians need a full
    sort-based agg buffer, unlike the power-sum baseline — each joined
    back broadcast (period rows per key); the dense tier is never
    re-shuffled.
    """
    if min_periods < 3:
        raise ValueError("min_periods must be >= 3")
    # referenced by the median agg AND both rejoin layers — compute
    # the phased tier once (multi-reference rule; measured 15 → ~6
    # exchanges on the contract query)
    phased = dense.withColumn(
        "phase", F.pmod(F.col("b"), F.lit(period))
    ).localCheckpoint(eager=False)
    med = phased.groupBy(*keys, "phase").agg(
        F.percentile("v", F.lit(0.5)).alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    j1 = phased.join(F.broadcast(med), [*keys, "phase"])
    mad = (
        j1.withColumn("adev", F.abs(F.col("v") - F.col("med")))
        .groupBy(*keys, "phase")
        .agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    )
    j2 = j1.join(F.broadcast(mad), [*keys, "phase"])
    rz = (F.col("v") - F.col("med")) / (F.lit(MAD_SIGMA) * F.col("mad"))
    return (
        j2.filter((F.col("n") >= F.lit(min_periods)) & (F.col("mad") > 1e-12))
        .withColumn("rz", rz)
        .filter(F.abs(F.col("rz")) > F.lit(z_thresh))
        .select(
            *keys,
            "b",
            "phase",
            "v",
            F.round(F.col("med") + F.lit(1e-9), 6).alias("baseline_median"),
            F.round(F.col("rz") + F.lit(1e-9), 6).alias("rz"),
        )
    )
