"""Two-variable stats aggregates + histogram vs numpy, with plan gates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from peakmatch_xcorr_spark.operators.stats import (
    activity_trend,
    pair_metric_corr,
    value_histogram,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def pdf(events):
    p = events.toPandas()
    p["ts"] = p["ts"].astype("datetime64[us]")
    return p


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _n_exchanges(plan: str) -> int:
    return plan.count(") Exchange")


def _hourly_counts(pdf: pd.DataFrame) -> pd.DataFrame:
    h = pdf.copy()
    h["hour"] = h["ts"].dt.floor("h")
    return (
        h.groupby("hour")
        .agg(
            x=("event_type", lambda s: int((s == "click").sum())),
            y=("event_type", lambda s: int((s == "view").sum())),
        )
        .reset_index()
    )


def test_pair_metric_corr_matches_numpy(spark, events, pdf):
    got = {
        r["day"]: r
        for r in pair_metric_corr(
            events, "ts", "event_type", "click", "view"
        ).collect()
    }
    hourly = _hourly_counts(pdf)
    hourly["day"] = hourly["hour"].dt.floor("D")
    assert len(got) == hourly["day"].nunique()
    for day, g in hourly.groupby("day"):
        row = got[day.to_pydatetime()]
        assert row["n_buckets"] == len(g)
        x, y = g["x"].to_numpy(float), g["y"].to_numpy(float)
        if x.std() == 0 or y.std() == 0:
            assert row["corr"] is None
        else:
            exp = float(np.corrcoef(x, y)[0, 1])
            assert row["corr"] == pytest.approx(exp, abs=2e-6), day


def test_activity_trend_matches_numpy_lstsq(spark, events, pdf):
    got = {
        r["event_type"]: r
        for r in activity_trend(events, "ts", ["event_type"]).collect()
    }
    h = pdf.copy()
    h["xi"] = (
        h["ts"].astype("int64") // 10**6 // 3600
    )  # epoch-hours, matches floor(unix_micros / 3.6e9)
    for etype, g in h.groupby("event_type"):
        pts = g.groupby("xi").size().reset_index(name="y")
        slope, intercept = np.polyfit(
            pts["xi"].to_numpy(float), pts["y"].to_numpy(float), 1
        )
        row = got[etype]
        assert row["n_buckets"] == len(pts)
        assert row["slope"] == pytest.approx(slope, abs=2e-8), etype
        assert row["intercept"] == pytest.approx(intercept, abs=2e-4), etype


def test_value_histogram_matches_numpy(spark, events, pdf):
    lo, hi, n_bins = 0.0, 500.0, 25
    got = {
        r["bin"]: r
        for r in value_histogram(events, "value", lo, hi, n_bins).collect()
    }
    v = pdf["value"].dropna().to_numpy()
    width = (hi - lo) / n_bins
    bins = np.where(
        v < lo, 0, np.where(v >= hi, n_bins + 1, (np.floor((v - lo) / width) + 1))
    ).astype(int)
    assert sum(r["n"] for r in got.values()) == len(v)
    for b in np.unique(bins):
        sel = v[bins == b]
        assert got[int(b)]["n"] == len(sel)
        assert got[int(b)]["bin_min"] == pytest.approx(sel.min(), abs=1e-6)
        assert got[int(b)]["bin_max"] == pytest.approx(sel.max(), abs=1e-6)
    # every in-range bin index the engine emitted is a valid bucket
    assert all(0 <= b <= n_bins + 1 for b in got)


def test_histogram_is_one_shuffle_with_partial_agg(spark, events):
    plan = _explain(value_histogram(events, "value", 0.0, 500.0, 25))
    assert _n_exchanges(plan) == 1, plan
    assert "partial_count" in plan or "partial_min" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corr_and_trend_plans_have_partials_and_no_python(spark, events):
    for df in (
        pair_metric_corr(events, "ts", "event_type", "click", "view"),
        activity_trend(events, "ts", ["event_type"]),
    ):
        plan = _explain(df)
        # two grouping levels -> at most two exchanges, both partial'd
        assert _n_exchanges(plan) <= 2, plan
        assert "partial_" in plan, plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Window" not in plan  # pure decomposable aggregates
