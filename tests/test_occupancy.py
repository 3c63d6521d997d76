"""Sweep-line occupancy vs the brute-force exploded twin.

The exploded twin IS the semantics (count intervals overlapping each
bucket); the sweep-line must match it bucket-for-bucket on seeded
random intervals, for the keyed window path AND the global two-phase
distributed prefix scan, including boundaries that straddle scan
partitions."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

from peakmatch_xcorr_spark.operators.occupancy import (
    occupancy_curve,
    occupancy_curve_exploded,
)

EPOCH = datetime.datetime(2024, 1, 1)


def _intervals_df(spark, n=400, seed=7, max_span_h=72, keys=False):
    rng = np.random.default_rng(seed)
    start = rng.integers(0, 14 * 86400, n)
    span = rng.integers(0, max_span_h * 3600, n)
    pdf = pd.DataFrame(
        {
            "start_ts": pd.to_datetime(start, unit="s", origin=EPOCH),
            "end_ts": pd.to_datetime(start + span, unit="s", origin=EPOCH),
        }
    )
    if keys:
        pdf["room"] = rng.integers(0, 3, n).astype(str)
    pdf["start_ts"] = pdf["start_ts"].astype("datetime64[us]")
    pdf["end_ts"] = pdf["end_ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf)


def _canon(df, keys):
    return (
        df.toPandas()
        .sort_values([*keys, "bucket_start"])
        .reset_index(drop=True)
        .astype({"active": "int64"})
    )


@pytest.mark.parametrize("bucket", ["1 hour", "15 minutes"])
def test_global_scan_matches_exploded(spark, bucket):
    df = _intervals_df(spark, n=400)
    got = _canon(occupancy_curve(df, bucket=bucket, scan_partitions=8), [])
    exp = _canon(occupancy_curve_exploded(df, bucket=bucket), [])
    pd.testing.assert_frame_equal(got, exp)


def test_keyed_path_matches_exploded(spark):
    df = _intervals_df(spark, n=300, seed=11, keys=True)
    got = _canon(occupancy_curve(df, bucket="1 hour", keys=["room"]), ["room"])
    exp = _canon(
        occupancy_curve_exploded(df, bucket="1 hour", keys=["room"]), ["room"]
    )
    pd.testing.assert_frame_equal(got, exp)


def test_scan_partition_boundaries_are_seamless(spark):
    """With scan_partitions larger than the boundary count, almost
    every gap scaffold crosses a pid edge — the next-non-empty-pid
    hand-off must close every one of them."""
    df = _intervals_df(spark, n=25, seed=3, max_span_h=200)
    got = _canon(occupancy_curve(df, bucket="1 hour", scan_partitions=64), [])
    exp = _canon(occupancy_curve_exploded(df, bucket="1 hour"), [])
    pd.testing.assert_frame_equal(got, exp)


def test_zero_span_and_identical_intervals(spark):
    pdf = pd.DataFrame(
        {
            "start_ts": pd.to_datetime(
                ["2024-01-01 10:30:00"] * 3 + ["2024-01-01 13:00:00"]
            ).astype("datetime64[us]"),
            "end_ts": pd.to_datetime(
                ["2024-01-01 10:30:00"] * 3 + ["2024-01-01 13:59:59"]
            ).astype("datetime64[us]"),
        }
    )
    df = spark.createDataFrame(pdf)
    got = _canon(occupancy_curve(df, bucket="1 hour"), [])
    assert list(got["active"]) == [3, 1]
    assert got["bucket_start"].iloc[0] == pd.Timestamp("2024-01-01 10:00:00")
    assert got["bucket_start"].iloc[1] == pd.Timestamp("2024-01-01 13:00:00")
    # the 11:00 and 12:00 buckets have zero active intervals: absent
    assert len(got) == 2


def test_gap_buckets_between_boundaries_are_emitted(spark):
    """One long interval: every bucket it spans appears with count 1
    even though only two boundary rows exist."""
    pdf = pd.DataFrame(
        {
            "start_ts": pd.to_datetime(["2024-01-01 00:10:00"]).astype(
                "datetime64[us]"
            ),
            "end_ts": pd.to_datetime(["2024-01-02 23:50:00"]).astype(
                "datetime64[us]"
            ),
        }
    )
    got = _canon(
        occupancy_curve(spark.createDataFrame(pdf), bucket="1 hour"), []
    )
    assert len(got) == 48
    assert (got["active"] == 1).all()
