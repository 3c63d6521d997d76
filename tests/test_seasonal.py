"""Seasonal decomposition + phase-baseline anomaly: checked against
an independent statsmodels-style brute force in numpy/pandas, plus
structural properties (sum-zero seasonal, planted-pattern recovery,
leave-one-out spike detection)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.seasonal import (
    dense_bucket_counts,
    seasonal_baseline_anomaly,
    seasonal_profile,
)

T0 = dt.datetime(2024, 1, 1)


def _hourly_events(rng, n_keys=2, hours=24 * 14, pattern=None, spikes=()):
    """Synthetic events whose hourly counts follow base + pattern[hod]
    + noise; optional planted (key, hour_index, extra) spikes."""
    rows = []
    for k in range(n_keys):
        for h in range(hours):
            hod = h % 24
            lam = 5 + (pattern[hod] if pattern is not None else 0)
            n = int(rng.poisson(lam)) if pattern is not None else 5
            for key, hi, extra in spikes:
                if key == f"k{k}" and hi == h:
                    n += extra
            for i in range(n):
                rows.append(
                    (f"k{k}", T0 + dt.timedelta(hours=h, minutes=i % 60))
                )
    return pd.DataFrame(rows, columns=["conv_id", "ts"])


def _brute_profile(dense_pdf, period):
    """Independent reference: classical 2xM (even) / M (odd) centered
    MA decomposition, trimmed to whole cycles, seasonal centered."""
    out = {}
    for k, g in dense_pdf.groupby("conv_id"):
        g = g.sort_values("b").reset_index(drop=True)
        v = g["v"].to_numpy(dtype=np.float64)
        L = len(v)
        even = period % 2 == 0
        half = period // 2
        width = period + 1 if even else period
        trend = np.full(L, np.nan)
        for t in range(half, L - (width - 1 - half)):
            if even:
                s = v[t - half : t + half + 1].sum()
                trend[t] = (s - 0.5 * (v[t - half] + v[t + half])) / period
            else:
                trend[t] = v[t - half : t + half + 1].mean()
        valid = ~np.isnan(trend)
        n_valid = valid.sum()
        n_cycles = n_valid // period
        if n_cycles < 1:
            continue
        det = v - trend
        first = half
        keep = np.zeros(L, dtype=bool)
        keep[first : first + n_cycles * period] = True
        b = g["b"].to_numpy()
        raw = np.zeros(period)
        for j in range(period):
            m = keep & (b % period == j)
            raw[j] = det[m].mean()
        seas = raw - raw.mean()
        out[k] = (seas, n_cycles)
    return out


def test_profile_matches_bruteforce_even_period(spark, rng):
    pat = [3 * np.sin(2 * np.pi * h / 24) for h in range(24)]
    ev = _hourly_events(rng, n_keys=2, hours=24 * 10, pattern=pat)
    df = spark.createDataFrame(ev)
    dense = dense_bucket_counts(df, ["conv_id"], "ts", "1 hour")
    got = (
        seasonal_profile(dense, ["conv_id"], period=24)
        .toPandas()
        .sort_values(["conv_id", "phase"])
        .reset_index(drop=True)
    )
    ref = _brute_profile(dense.toPandas(), 24)
    for k, (seas, n_cycles) in ref.items():
        sub = got[got.conv_id == k].sort_values("phase")
        assert len(sub) == 24
        assert (sub["n_cycles"] == n_cycles).all()
        # phase j of the output is b % 24 == j; the brute force indexed
        # the same way, so arrays align
        np.testing.assert_allclose(
            sub["seasonal"].to_numpy(), np.round(seas + 1e-9, 6), atol=2e-6
        )


def test_profile_matches_bruteforce_odd_period(spark, rng):
    ev = _hourly_events(rng, n_keys=1, hours=7 * 30,
                        pattern=[(h * 13) % 7 for h in range(24)])
    df = spark.createDataFrame(ev)
    dense = dense_bucket_counts(df, ["conv_id"], "ts", "1 hour")
    got = seasonal_profile(dense, ["conv_id"], period=7).toPandas()
    ref = _brute_profile(dense.toPandas(), 7)
    for k, (seas, _) in ref.items():
        sub = got[got.conv_id == k].sort_values("phase")
        assert len(sub) == 7
        np.testing.assert_allclose(
            sub["seasonal"].to_numpy(), np.round(seas + 1e-9, 6), atol=2e-6
        )


def test_profile_sums_to_zero_and_recovers_planted_shape(spark, rng):
    pat = [6.0 if h in (9, 10, 11) else 0.0 for h in range(24)]
    ev = _hourly_events(rng, n_keys=1, hours=24 * 21, pattern=pat)
    df = spark.createDataFrame(ev)
    dense = dense_bucket_counts(df, ["conv_id"], "ts", "1 hour")
    got = seasonal_profile(dense, ["conv_id"], period=24).toPandas()
    assert abs(got["seasonal"].sum()) < 1e-4
    # the three peak phases must be the three largest seasonal values
    top3 = set(got.nlargest(3, "seasonal")["phase"])
    assert top3 == {9, 10, 11}


def test_profile_short_series_emits_nothing(spark):
    ev = pd.DataFrame(
        {"conv_id": ["a"] * 30,
         "ts": [T0 + dt.timedelta(hours=h) for h in range(30)]}
    )
    dense = dense_bucket_counts(
        spark.createDataFrame(ev), ["conv_id"], "ts", "1 hour"
    )
    # 30 hourly buckets < one complete trend-valid cycle of 24
    assert seasonal_profile(dense, ["conv_id"], period=24).count() == 0


def test_anomaly_detects_planted_spike(spark, rng):
    pat = [0.0] * 24  # Poisson(5) noise everywhere
    ev = _hourly_events(
        rng, n_keys=2, hours=24 * 20, pattern=pat,
        spikes=[("k1", 24 * 7 + 3, 60)],
    )
    df = spark.createDataFrame(ev)
    dense = dense_bucket_counts(df, ["conv_id"], "ts", "1 hour")
    got = seasonal_baseline_anomaly(
        dense, ["conv_id"], period=24, z_thresh=6.0
    ).toPandas()
    spike = got[(got.conv_id == "k1") & (got.phase == 3)]
    assert len(spike) == 1
    assert spike.iloc[0]["v"] >= 60
    # the planted spike dominates any noise-induced flags
    assert spike.iloc[0]["z"] == got["z"].abs().max()


def test_anomaly_leave_one_out_matches_pandas(spark, rng):
    pat = [2 * np.sin(2 * np.pi * h / 24) for h in range(24)]
    ev = _hourly_events(rng, n_keys=1, hours=24 * 15, pattern=pat)
    df = spark.createDataFrame(ev)
    dense = dense_bucket_counts(df, ["conv_id"], "ts", "1 hour")
    thresh = 1.5
    got = (
        seasonal_baseline_anomaly(dense, ["conv_id"], 24, thresh)
        .toPandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    pdf = dense.toPandas().sort_values("b").reset_index(drop=True)
    exp = []
    for j in range(24):
        sub = pdf[pdf["b"] % 24 == j]
        vv = sub["v"].to_numpy(dtype=np.float64)
        for i, (b, x) in enumerate(zip(sub["b"], vv)):
            rest = np.delete(vv, i)
            m, s = rest.mean(), rest.std(ddof=1)
            if s > 1e-6 and abs((x - m) / s) > thresh:
                exp.append((b, round((x - m) / s + 1e-9, 6)))
    exp.sort()
    assert [(r.b, r.z) for r in got.itertuples()] == exp


def test_anomaly_spike_would_hide_without_loo(spark, rng):
    """The planted spike's plain (inclusive) z stays under a threshold
    its leave-one-out z clears — the reason the operator excludes the
    point under test from its own baseline."""
    hours, extra = 24 * 10, 25
    ev = _hourly_events(rng, n_keys=1, hours=hours, pattern=[0.0] * 24,
                        spikes=[("k0", 51, extra)])
    dense = dense_bucket_counts(
        spark.createDataFrame(ev), ["conv_id"], "ts", "1 hour"
    )
    pdf = dense.toPandas()
    vals = (
        pdf[pdf["b"] % 24 == 3].sort_values("b")["v"]
        .to_numpy(dtype=np.float64)
    )
    i = int(np.argmax(vals))
    z_incl = (vals[i] - vals.mean()) / vals.std(ddof=1)
    rest = np.delete(vals, i)
    z_loo = (vals[i] - rest.mean()) / rest.std(ddof=1)
    assert z_incl < z_loo  # the gap this test exists to pin
    thresh = (z_incl + z_loo) / 2
    got = seasonal_baseline_anomaly(
        dense, ["conv_id"], 24, z_thresh=thresh, min_periods=8
    ).toPandas()
    spike = got[(got.phase == 3) & (got.v == vals[i])]
    assert len(spike) == 1  # flagged by LOO where inclusive-z would miss


def test_detect_period_recovers_planted_cycle(spark):
    from peakmatch_xcorr_spark.operators.seasonal import detect_period

    rows = []
    for key, p in (("a", 24), ("b", 12), ("c", 8)):
        for b in range(240):
            v = int(round(10 + 5 * np.cos(2 * np.pi * b / p)))
            rows.append((key, 1000 + b, v))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "b", "v"])
    )
    got = detect_period(df, ["conv_id"]).toPandas().set_index("conv_id")
    for key, p in (("a", 24), ("b", 12), ("c", 8)):
        r = got.loc[key]
        assert r["period_buckets"] == p
        assert r["dominant_cycles"] == 240 // p
        assert r["period"] == 240 / (240 // p)
        assert r["strength"] > 0.9  # near-pure tone dominates energy


def test_detect_period_matches_numpy_bruteforce(spark, rng):
    from peakmatch_xcorr_spark.operators.seasonal import detect_period

    series = {f"k{i}": rng.poisson(6, 150) for i in range(4)}
    rows = [
        (k, 1000 + b, int(v))
        for k, vs in series.items()
        for b, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "b", "v"])
    )
    min_p, max_p = 4, 50
    got = detect_period(df, ["conv_id"], min_p, max_p).toPandas()
    for k, vs in series.items():
        v = vs.astype(float)
        L = len(v)
        k_lo, k_hi = max(2, int(np.ceil(L / max_p))), L // min_p
        mag2 = np.abs(np.fft.rfft(v - v.mean())) ** 2
        kk = k_lo + int(np.argmax(mag2[k_lo:k_hi + 1]))
        r = got[got.conv_id == k].iloc[0]
        assert r["dominant_cycles"] == kk
        assert r["period"] == L / kk
        expect_strength = mag2[kk] / mag2[k_lo:k_hi + 1].sum()
        np.testing.assert_allclose(r["strength"], expect_strength)


def test_detect_period_bounds_and_short_series(spark):
    from peakmatch_xcorr_spark.operators.seasonal import detect_period

    rows = [("a", b, 5) for b in range(10)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "b", "v"])
    )
    # min_period 6 -> k_hi = 10//6 = 1 < k_lo = 2: empty
    assert detect_period(df, ["conv_id"], min_period=6).count() == 0
    with pytest.raises(ValueError):
        detect_period(df, ["conv_id"], min_period=1)
    with pytest.raises(ValueError):
        detect_period(df, ["conv_id"], min_period=4, max_period=3)


def test_robust_anomaly_matches_pandas(spark, rng):
    from peakmatch_xcorr_spark.operators.seasonal import (
        MAD_SIGMA, seasonal_robust_anomaly,
    )

    pat = [2 * np.sin(2 * np.pi * h / 24) for h in range(24)]
    ev = _hourly_events(rng, n_keys=1, hours=24 * 15, pattern=pat)
    dense = dense_bucket_counts(
        spark.createDataFrame(ev), ["conv_id"], "ts", "1 hour"
    )
    thresh = 1.2
    got = (
        seasonal_robust_anomaly(dense, ["conv_id"], 24, thresh)
        .toPandas().sort_values("b").reset_index(drop=True)
    )
    pdf = dense.toPandas().sort_values("b").reset_index(drop=True)
    exp = []
    for j in range(24):
        sub = pdf[pdf["b"] % 24 == j]
        vv = sub["v"].to_numpy(dtype=np.float64)
        med = np.median(vv)
        mad = np.median(np.abs(vv - med))
        if mad <= 1e-12:
            continue
        for b, x in zip(sub["b"], vv):
            rz = (x - med) / (MAD_SIGMA * mad)
            if abs(rz) > thresh:
                exp.append((b, round(rz + 1e-9, 6)))
    exp.sort()
    assert [(r.b, r.rz) for r in got.itertuples()] == exp


def test_robust_anomaly_survives_repeated_incidents(spark, rng):
    """Three co-phase spikes: each inflates the OTHERS' mean/std
    baseline enough that the LOO z misses them, while the median/MAD
    baseline (breakdown 50%) still flags all three."""
    from peakmatch_xcorr_spark.operators.seasonal import (
        MAD_SIGMA, seasonal_baseline_anomaly, seasonal_robust_anomaly,
    )

    weeks = 12
    spikes = [("k0", 24 * w + 3, 30) for w in (2, 5, 9)]
    ev = _hourly_events(rng, n_keys=1, hours=24 * weeks,
                        pattern=[0.0] * 24, spikes=spikes)
    dense = dense_bucket_counts(
        spark.createDataFrame(ev), ["conv_id"], "ts", "1 hour"
    )
    pdf = dense.toPandas()
    vals = pdf[pdf["b"] % 24 == 3].sort_values("b")["v"].to_numpy(float)
    # pick a threshold between the contaminated-LOO z of the weakest
    # spike and its robust z, so the contrast is pinned on this data
    zs, rzs = [], []
    med = np.median(vals)
    mad = np.median(np.abs(vals - med))
    for i in np.argsort(vals)[-3:]:
        rest = np.delete(vals, i)
        zs.append((vals[i] - rest.mean()) / rest.std(ddof=1))
        rzs.append((vals[i] - med) / (MAD_SIGMA * mad))
    thresh = (max(zs) + min(rzs)) / 2
    assert max(zs) < thresh < min(rzs)
    loo = seasonal_baseline_anomaly(
        dense, ["conv_id"], 24, z_thresh=thresh
    ).toPandas()
    robust = seasonal_robust_anomaly(
        dense, ["conv_id"], 24, z_thresh=thresh
    ).toPandas()
    assert len(loo[loo.phase == 3]) == 0        # all three hidden
    assert len(robust[robust.phase == 3]) == 3  # all three flagged


def test_robust_anomaly_zero_mad_excluded(spark):
    from peakmatch_xcorr_spark.operators.seasonal import (
        seasonal_robust_anomaly,
    )

    ev = pd.DataFrame({
        "conv_id": ["a"] * (24 * 10 * 5),
        "ts": [
            T0 + dt.timedelta(hours=h)
            for h in range(24 * 10) for _ in range(5)
        ],
    })
    dense = dense_bucket_counts(
        spark.createDataFrame(ev), ["conv_id"], "ts", "1 hour"
    )
    # constant 5/hour: MAD is 0 everywhere -> nothing flagged
    assert seasonal_robust_anomaly(dense, ["conv_id"], 24, 1.0).count() == 0
