from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.operators.stats import theil_sen_trend


def theil_sen_scalar(b: np.ndarray, v: np.ndarray):
    slopes = []
    n = len(b)
    for i in range(n):
        for j in range(i + 1, n):
            slopes.append((v[j] - v[i]) / (b[j] - b[i]))
    slope = float(np.median(slopes))
    intercept = float(np.median(v - slope * b))
    return slope, intercept, len(slopes)


def _run(spark, series: dict[str, np.ndarray]):
    rows = [
        (key, i, int(x))
        for key, v in series.items()
        for i, x in enumerate(v)
    ]
    dense = spark.createDataFrame(rows, "event_type string, b long, v long")
    return {
        r["event_type"]: r
        for r in theil_sen_trend(dense, ["event_type"]).collect()
    }


def test_matches_literal_definition(spark, rng):
    v = np.round(rng.normal(100, 15, 60) + 0.8 * np.arange(60))
    out = _run(spark, {"k": v})["k"]
    slope, intercept, n_pairs = theil_sen_scalar(
        np.arange(60, dtype=float), v.astype(float)
    )
    assert out["n_pairs"] == n_pairs == 60 * 59 // 2
    assert out["slope"] == pytest.approx(round(slope + 1e-9, 6), abs=1e-12)
    assert out["intercept"] == pytest.approx(
        round(intercept + 1e-9, 6), abs=1e-12
    )


def test_exact_line_recovered(spark):
    v = 3 * np.arange(40) + 7
    out = _run(spark, {"k": v})["k"]
    assert out["slope"] == 3.0
    assert out["intercept"] == 7.0


def test_robust_to_spike_where_ols_is_not(spark, rng):
    from peakmatch_xcorr_spark.operators.stats import activity_trend

    n = 50
    clean = np.round(rng.normal(100, 3, n))
    spiked = clean.copy()
    spiked[n - 2] += 5000  # one incident bucket
    ts_clean = _run(spark, {"k": clean})["k"]
    ts_spiked = _run(spark, {"k": spiked})["k"]
    # Theil-Sen slope barely moves
    assert abs(ts_spiked["slope"] - ts_clean["slope"]) < 0.5
    # while the OLS slope of the same data jumps by orders more
    b = np.arange(n, dtype=float)
    ols = np.polyfit(b, spiked, 1)[0] - np.polyfit(b, clean, 1)[0]
    assert abs(ols) > 10 * abs(ts_spiked["slope"] - ts_clean["slope"])
