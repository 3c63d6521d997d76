from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.operators.stats import activity_pacf, pacf_kernel


def acf_biased(v: np.ndarray, max_lag: int) -> np.ndarray:
    x = v - v.mean()
    g0 = x @ x
    return np.array([(x[: len(x) - k] @ x[k:]) / g0 for k in range(1, max_lag + 1)])


def pacf_yule_walker(v: np.ndarray, max_lag: int) -> np.ndarray:
    """Textbook definition: pacf_k is the LAST coefficient of the
    order-k Yule-Walker solve (Toeplitz system in the biased ACF)."""
    r = acf_biased(v, max_lag)
    rr = np.concatenate(([1.0], r))
    out = np.empty(max_lag)
    for k in range(1, max_lag + 1):
        R = np.array([[rr[abs(i - j)] for j in range(k)] for i in range(k)])
        out[k - 1] = np.linalg.solve(R, r[:k])[-1]
    return out


def test_durbin_levinson_matches_yule_walker(rng):
    v = np.round(rng.normal(100, 25, 300))
    got, r = pacf_kernel(v, 6)
    exp = pacf_yule_walker(v, 6)
    np.testing.assert_allclose(got, exp, atol=1e-10)
    np.testing.assert_allclose(r, acf_biased(v, 6), atol=1e-12)


def test_closed_form_lags_1_to_3(rng):
    """The Cramer closed form the DuckDB oracle uses must equal DL."""
    v = np.round(rng.normal(0, 10, 200))
    got, r = pacf_kernel(v, 3)
    r1, r2, r3 = r
    p1 = r1
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    p3 = (r3 - 2 * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 + r1 ** 3) / (
        1 - 2 * r1 * r1 + 2 * r1 * r1 * r2 - r2 * r2
    )
    np.testing.assert_allclose(got, [p1, p2, p3], atol=1e-12)


def test_ar1_pacf_cuts_off(rng):
    """AR(1): acf decays geometrically (all lags non-zero) but pacf
    must be ~0 past lag 1 — the diagnostic property."""
    phi = 0.7
    n = 4000
    e = rng.normal(0, 1, n)
    v = np.empty(n)
    v[0] = e[0]
    for t in range(1, n):
        v[t] = phi * v[t - 1] + e[t]
    pacf, r = pacf_kernel(v, 5)
    assert pacf[0] == pytest.approx(phi, abs=0.05)
    assert np.all(np.abs(pacf[1:]) < 0.08)
    # while the raw acf is still large at lag 3
    assert r[2] > 0.2


def test_degenerate_inputs_raise():
    with pytest.raises(ValueError):
        pacf_kernel(np.ones(50), 3)
    with pytest.raises(ValueError):
        pacf_kernel(np.arange(4.0), 3)


def test_activity_pacf_operator(spark, rng):
    v = np.round(rng.normal(50, 12, 120)).astype(np.int64)
    rows = [("k1", i, int(x)) for i, x in enumerate(v)]
    rows += [("flat", i, 7) for i in range(50)]  # zero variance: dropped
    rows += [("tiny", i, i % 3) for i in range(4)]  # too short: dropped
    dense = spark.createDataFrame(rows, "event_type string, b long, v long")
    out = activity_pacf(dense, ["event_type"], max_lag=3).collect()
    assert len(out) == 1 and out[0]["event_type"] == "k1"
    pacf, r = pacf_kernel(v.astype(float), 3)
    row = out[0]
    assert row["N"] == 120
    for j in range(1, 4):
        assert row[f"r{j}"] == pytest.approx(round(r[j - 1] + 1e-9, 6), abs=1e-12)
        assert row[f"pacf{j}"] == pytest.approx(
            round(pacf[j - 1] + 1e-9, 6), abs=1e-12
        )
