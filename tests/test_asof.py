from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from peakmatch_xcorr_spark.operators.asof import asof_join, time_weighted_avg


@pytest.fixture()
def quotes_trades(spark):
    quotes = pd.DataFrame(
        {
            "sym": ["a"] * 4 + ["b"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
                 "2024-01-01 00:05:00", "2024-01-01 00:09:00",
                 "2024-01-01 00:02:00", "2024-01-01 00:08:00"]
            ).astype("datetime64[us]"),
            "px": [10.0, 11.0, 12.0, 13.0, 100.0, 101.0],
        }
    )
    trades = pd.DataFrame(
        {
            "sym": ["a", "a", "a", "b", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:30", "2024-01-01 00:05:00",
                 "2024-01-01 00:20:00", "2024-01-01 00:01:00",
                 "2024-01-01 00:09:00"]
            ).astype("datetime64[us]"),
            "qty": [1, 2, 3, 4, 5],
        }
    )
    return spark.createDataFrame(trades), spark.createDataFrame(quotes)


def test_asof_join_backward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = (
        asof_join(trades, quotes, ["sym"], value_cols=["px"])
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    # a@00:00:30 -> 10 (00:00); a@00:05 -> 12 (exact match); a@00:20 -> 13
    # b@00:01 -> no quote yet (None); b@00:09 -> 101
    assert list(out[out.sym == "a"].right_px) == [10.0, 12.0, 13.0]
    b = out[out.sym == "b"]
    assert np.isnan(b.right_px.iloc[0])
    assert b.right_px.iloc[1] == 101.0


def test_asof_join_matches_pandas_merge_asof(spark, rng):
    n_l, n_r = 300, 120
    left = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], n_l),
            "ts": pd.to_datetime(
                1704067200_000_000_000 + np.sort(rng.integers(0, 10**12, n_l))
            ).astype("datetime64[us]"),
            "lv": rng.normal(size=n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], n_r),
            "ts": pd.to_datetime(
                1704067200_000_000_000 + np.sort(rng.integers(0, 10**12, n_r))
            ).astype("datetime64[us]"),
            "rv": rng.normal(size=n_r),
        }
    )
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  ["k"], value_cols=["rv"])
        .toPandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward",
    ).sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    np.testing.assert_allclose(
        got.right_rv.to_numpy(), exp.rv.to_numpy(), rtol=1e-12, equal_nan=True
    )


def test_asof_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = (
        asof_join(trades, quotes, ["sym"], value_cols=["px"], tolerance_s=120)
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    a = out[out.sym == "a"]
    # a@00:20 last quote was 00:09 → 660 s ago → outside 120 s tolerance
    assert np.isnan(a.right_px.iloc[2])
    assert a.right_px.iloc[0] == 10.0


def test_time_weighted_avg(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 3,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:30:00",
                 "2024-01-01 00:45:00"]
            ).astype("datetime64[us]"),
            "value": [10.0, 20.0, 40.0],
        }
    )
    out = time_weighted_avg(
        spark.createDataFrame(pdf), ["k"], "1 hour"
    ).toPandas()
    # 10 for 30 min, 20 for 15 min, 40 for 15 min → (10*1800+20*900+40*900)/3600
    assert out.twa.iloc[0] == pytest.approx(
        (10 * 1800 + 20 * 900 + 40 * 900) / 3600
    )
    assert out.covered_s.iloc[0] == 3600.0
