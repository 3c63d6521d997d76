from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.operators.stats import cusum_drift


def cusum_scalar(v: np.ndarray, k_sigma: float, h_sigma: float):
    """Literal Page recursion, one key: returns {(b, side): s} for
    flagged buckets, s in sigma units."""
    n = len(v)
    mu = v.mean()
    sigma = v.std(ddof=1)
    k = k_sigma * sigma
    s_hi = s_lo = 0.0
    out = {}
    for t in range(n):
        s_hi = max(0.0, s_hi + (v[t] - mu - k))
        s_lo = max(0.0, s_lo + (mu - v[t] - k))
        if s_hi / sigma > h_sigma:
            out[(t, "hi")] = s_hi / sigma
        if s_lo / sigma > h_sigma:
            out[(t, "lo")] = s_lo / sigma
    return out


def _run(spark, series: dict[str, np.ndarray], **kw):
    rows = [
        (key, i, int(x))
        for key, v in series.items()
        for i, x in enumerate(v)
    ]
    dense = spark.createDataFrame(rows, "event_type string, b long, v long")
    return cusum_drift(dense, ["event_type"], **kw).collect()


def test_reflection_identity_matches_page_recursion(spark, rng):
    v = np.round(rng.normal(100, 10, 150))
    v[90:] += 8  # slow upward drift well under any single-bucket z
    got = {
        (r["b"], r["side"]): r["s"]
        for r in _run(spark, {"k": v}, k_sigma=0.5, h_sigma=5.0)
    }
    exp = cusum_scalar(v.astype(float), 0.5, 5.0)
    assert set(got) == set(exp)
    for key, s in exp.items():
        assert got[key] == pytest.approx(round(s + 1e-9, 6), abs=1e-9)


def test_detects_slow_drift_single_z_misses(spark, rng):
    base = np.round(rng.normal(1000, 30, 200))
    v = base.copy()
    v[120:] += 25  # < 1 sigma per bucket: no single bucket is anomalous
    z = np.abs((v - v.mean()) / v.std(ddof=1))
    assert z.max() < 4.0
    flagged = _run(spark, {"k": v}, k_sigma=0.5, h_sigma=5.0)
    assert flagged, "cumulative drift must fire where pointwise z cannot"
    hi = [r["b"] for r in flagged if r["side"] == "hi"]
    assert hi and 120 <= min(hi) <= 170
    # retrospective baseline: the global mean includes the drifted
    # tail, so the PRE-drift segment sits below it and the lo side
    # legitimately accumulates there — both sides of one step change
    lo = [r["b"] for r in flagged if r["side"] == "lo"]
    assert all(b < 120 for b in lo)


def test_downward_drift_flags_lo(spark, rng):
    v = np.round(rng.normal(500, 20, 160))
    v[100:] -= 18
    flagged = _run(spark, {"k": v}, k_sigma=0.5, h_sigma=5.0)
    lo = [r["b"] for r in flagged if r["side"] == "lo"]
    assert lo and min(lo) >= 100


def test_stationary_series_stays_quiet(spark, rng):
    v = np.round(rng.normal(100, 10, 300))
    assert _run(spark, {"k": v}, k_sigma=0.5, h_sigma=8.0) == []


def test_flat_and_short_keys_excluded(spark):
    series = {"flat": np.full(50, 7.0), "short": np.array([1.0, 2.0])}
    assert _run(spark, series, k_sigma=0.5, h_sigma=1.0) == []
