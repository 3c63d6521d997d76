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


def test_time_weighted_avg_no_future_backfill(spark):
    """Code-review r2: a bucket's head must be covered by the PRIOR
    observation (carried forward), never by a future one back-filled;
    buckets with no samples but a live prior value get full-coverage
    rows; buckets before the first observation get nothing."""
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01 10:30:00", "2024-01-01 11:30:00"]
            ).astype("datetime64[us]"),
            "value": [100.0, 0.0],
        }
    )
    out = (
        time_weighted_avg(spark.createDataFrame(pdf), ["k"], "1 hour")
        .toPandas().sort_values("bucket_start").reset_index(drop=True)
    )
    # 10:00 bucket: only 100 from 10:30 → twa 100 over 1800 s
    # 11:00 bucket: 100 carries 11:00-11:30, then 0 until 12:00 → 50
    # nothing before 10:00, nothing after 11:59
    assert list(out.bucket_start) == list(
        pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 11:00:00"])
    )
    assert out.twa.iloc[0] == pytest.approx(100.0)
    assert out.covered_s.iloc[0] == 1800.0
    assert out.twa.iloc[1] == pytest.approx(50.0)  # NOT 0 (old back-fill bug)
    assert out.covered_s.iloc[1] == 3600.0


def test_time_weighted_avg_carries_into_empty_buckets(spark):
    """A value that stays current across a whole empty bucket covers it
    (LOCF step-function integral)."""
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01 10:59:00", "2024-01-01 12:30:00"]
            ).astype("datetime64[us]"),
            "value": [100.0, 10.0],
        }
    )
    out = (
        time_weighted_avg(spark.createDataFrame(pdf), ["k"], "1 hour")
        .toPandas().sort_values("bucket_start").reset_index(drop=True)
    )
    b11 = out[out.bucket_start == pd.Timestamp("2024-01-01 11:00:00")]
    assert len(b11) == 1
    assert b11.twa.iloc[0] == pytest.approx(100.0)
    assert b11.covered_s.iloc[0] == 3600.0


def test_asof_join_row_level_semantics_with_nulls(spark):
    """Code-review r2: the matched right ROW wins wholesale — a null
    value column must not be stitched over with an older row's value,
    and tolerance compares against the matched row's own timestamp."""
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:01:50", "2024-01-01 00:01:00"]
                ).astype("datetime64[us]"),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00:00", "2024-01-01 00:01:40"]
                ).astype("datetime64[us]"),
                "x": [5.0, None],
                "y": [None, 7.0],
            }
        )
    )
    out = (
        asof_join(left, right, ["k"], value_cols=["x", "y"], tolerance_s=60)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    # left 00:01:00 matches right 00:00:00 (60s back, inside tolerance):
    # that row's (x=5, y=null) wholesale
    assert out.right_x.iloc[0] == 5.0 and pd.isna(out.right_y.iloc[0])
    # left 00:01:50 matches right 00:01:40: x must be null (NOT the
    # older row's 5.0), y = 7.0; tolerance vs 00:01:40 passes
    assert pd.isna(out.right_x.iloc[1]) and out.right_y.iloc[1] == 7.0


# ---- interval_join (bucketed event-time range join) ----


def _theta_oracle(spark, left_pd, right_pd, keys, lo_s, hi_s):
    """Literal theta-join oracle: cross + exact range filter."""
    import itertools

    rows = []
    for _, a in left_pd.iterrows():
        for _, b in right_pd.iterrows():
            if any(a[k] != b[k] for k in keys):
                continue
            d = (b.ts - a.ts).total_seconds()
            if lo_s <= d < hi_s:
                rows.append((a.id, b.id))
    return sorted(rows)


@pytest.fixture()
def interval_frames(spark):
    rng = np.random.default_rng(42)
    n_l, n_r = 120, 150
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_l),
            "ts": base
            + pd.to_timedelta(rng.integers(0, 3600_000_000, n_l), unit="us"),
            "id": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_r),
            "ts": base
            + pd.to_timedelta(rng.integers(0, 3600_000_000, n_r), unit="us"),
            "id": np.arange(n_r) + 1000,
            "v": rng.normal(size=n_r),
        }
    )
    left["ts"] = left.ts.astype("datetime64[us]")
    right["ts"] = right.ts.astype("datetime64[us]")
    return left, right


@pytest.mark.parametrize("lo_s,hi_s", [(0.0, 60.0), (-30.0, 30.0), (-90.0, -30.0)])
def test_interval_join_matches_theta_oracle(spark, interval_frames, lo_s, hi_s):
    from peakmatch_xcorr_spark.operators.asof import interval_join

    left_pd, right_pd = interval_frames
    out = interval_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        ["k"],
        lo_s,
        hi_s,
    )
    got = sorted(
        (r["id"], r["right_id"]) for r in out.select("id", "right_id").collect()
    )
    assert got == _theta_oracle(spark, left_pd, right_pd, ["k"], lo_s, hi_s)
    assert len(got) > 0  # non-vacuous at this density


def test_interval_join_no_key_pure_time(spark, interval_frames):
    from peakmatch_xcorr_spark.operators.asof import interval_join

    left_pd, right_pd = interval_frames
    out = interval_join(
        spark.createDataFrame(left_pd.head(40)),
        spark.createDataFrame(right_pd.head(40)),
        [],
        0.0,
        120.0,
    )
    got = sorted(
        (r["id"], r["right_id"]) for r in out.select("id", "right_id").collect()
    )
    assert got == _theta_oracle(
        spark, left_pd.head(40), right_pd.head(40), [], 0.0, 120.0
    )


def test_interval_join_boundaries_half_open(spark):
    """rt == lt+lo is IN; rt == lt+hi is OUT (half-open window)."""
    from peakmatch_xcorr_spark.operators.asof import interval_join

    base = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [base], "id": [0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1],
                "ts": pd.Series(
                    [base + pd.Timedelta(seconds=s) for s in (10, 30, 70)]
                ).astype("datetime64[us]"),
                "id": [1, 2, 3],
            }
        )
    )
    out = interval_join(left, right, ["k"], 10.0, 70.0)
    assert sorted(r["right_id"] for r in out.collect()) == [1, 2]


def test_interval_join_plan_is_bucketed_equi_join(spark, interval_frames):
    """The scale contract: a hash/sort-merge equi-join on the bucket
    key — never BNLJ or cartesian, even with NO join key — and the
    left-side explode produces exactly 2 bucket rows per input row."""
    from peakmatch_xcorr_spark.operators.asof import interval_join

    left_pd, right_pd = interval_frames
    l, r = spark.createDataFrame(left_pd), spark.createDataFrame(right_pd)
    for keys in (["k"], []):
        out = interval_join(l, r, keys, -30.0, 30.0)
        p = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        assert ("SortMergeJoin" in p) or ("HashJoin" in p)


def test_asof_join_forward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = (
        asof_join(trades, quotes, ["sym"], value_cols=["px"],
                  direction="forward")
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    # a@00:00:30 -> 11 (00:01); a@00:05 -> 12 (same instant counts);
    # a@00:20 -> no later quote (None)
    a = out[out.sym == "a"]
    assert list(a.right_px[:2]) == [11.0, 12.0]
    assert np.isnan(a.right_px.iloc[2])
    # b@00:01 -> 100 (00:02); b@00:09 -> none after
    b = out[out.sym == "b"]
    assert b.right_px.iloc[0] == 100.0
    assert np.isnan(b.right_px.iloc[1])


def test_asof_join_nearest(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = (
        asof_join(trades, quotes, ["sym"], value_cols=["px"],
                  direction="nearest")
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    # a@00:00:30 equidistant 00:00 / 00:01 -> tie prefers BACKWARD (10)
    a = out[out.sym == "a"]
    assert list(a.right_px) == [10.0, 12.0, 13.0]
    # b@00:01 -> 00:02 is the nearest (forward wins over nothing)
    b = out[out.sym == "b"]
    assert b.right_px.iloc[0] == 100.0
    assert b.right_px.iloc[1] == 101.0


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions_match_pandas_merge_asof(spark, rng, direction):
    n_l, n_r = 300, 120
    # distinct timestamps on both sides: pandas' nearest tie rule is
    # checked by the dedicated fixture test, not left to chance here
    lt = np.sort(rng.choice(10**12, n_l, replace=False))
    rt = np.sort(rng.choice(10**12, n_r, replace=False))
    left = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n_l),
        "ts": pd.to_datetime(1704067200_000_000_000 + lt)
              .astype("datetime64[us]"),
        "lv": rng.normal(size=n_l),
    })
    right = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n_r),
        "ts": pd.to_datetime(1704067200_000_000_000 + rt)
              .astype("datetime64[us]"),
        "rv": rng.normal(size=n_r),
    })
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  ["k"], value_cols=["rv"], direction=direction)
        .toPandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction=direction,
    ).sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    np.testing.assert_allclose(
        got.right_rv.to_numpy(), exp.rv.to_numpy(), rtol=1e-12,
        equal_nan=True,
    )


def test_asof_forward_and_nearest_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    fwd = (
        asof_join(trades, quotes, ["sym"], value_cols=["px"],
                  direction="forward", tolerance_s=25)
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    # a@00:00:30: next quote 00:01 is 30 s away -> outside 25 s
    assert np.isnan(fwd[fwd.sym == "a"].right_px.iloc[0])
    near = (
        asof_join(trades, quotes, ["sym"], value_cols=["px"],
                  direction="nearest", tolerance_s=25)
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    # nearest picks 00:00 (30 s back) -> also outside; same-instant ok
    a = near[near.sym == "a"]
    assert np.isnan(a.right_px.iloc[0])
    assert a.right_px.iloc[1] == 12.0


def test_asof_join_rejects_unknown_direction(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, ["sym"], direction="sideways")


def test_asof_join_all_directions_one_exchange(spark, quotes_trades):
    trades, quotes = quotes_trades

    def _explain(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    for d in ("backward", "forward", "nearest"):
        plan = _explain(
            asof_join(trades, quotes, ["sym"], value_cols=["px"],
                      direction=d)
        )
        assert plan.count(") Exchange") == 1, d
        assert "Python" not in plan and "ArrowEval" not in plan, d


# --------------------------------------------------- linear time weight

def test_time_weighted_linear_single_bucket(spark):
    """0→10 linearly over [00:00, 00:10): trapezoid mean is 5, covered
    600 s (the last point closes no segment)."""
    pdf = pd.DataFrame({
        "k": ["a"] * 2,
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:10:00"]
        ).astype("datetime64[us]"),
        "value": [0.0, 10.0],
    })
    out = time_weighted_avg(
        spark.createDataFrame(pdf), ["k"], "1 hour", method="linear"
    ).toPandas()
    assert len(out) == 1
    assert out.twa.iloc[0] == pytest.approx(5.0)
    assert out.covered_s.iloc[0] == pytest.approx(600.0)


def test_time_weighted_linear_splits_across_boundary(spark):
    """A segment 0→40 over [23:30, 00:30) next day: first bucket sees
    the 0→20 half (mean 10), second the 20→40 half (mean 30)."""
    pdf = pd.DataFrame({
        "k": ["a"] * 2,
        "ts": pd.to_datetime(
            ["2024-01-01 23:30:00", "2024-01-02 00:30:00"]
        ).astype("datetime64[us]"),
        "value": [0.0, 40.0],
    })
    out = (
        time_weighted_avg(
            spark.createDataFrame(pdf), ["k"], "1 hour", method="linear"
        ).toPandas().sort_values("bucket_start").reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.twa.iloc[0] == pytest.approx(10.0)
    assert out.twa.iloc[1] == pytest.approx(30.0)
    assert list(out.covered_s) == [1800.0, 1800.0]


def test_time_weighted_linear_constant_equals_locf(spark, rng):
    """On a constant-valued series both methods are the plain mean of
    the constant — identical rows except the last partial bucket's
    coverage (locf extends to its own bucket end, linear stops at the
    last sample)."""
    n = 200
    ts = pd.to_datetime(
        1704067200_000_000_000
        + np.sort(rng.choice(10**12, n, replace=False))
    ).astype("datetime64[us]")
    pdf = pd.DataFrame({"k": "a", "ts": ts, "value": 7.5})
    sdf = spark.createDataFrame(pdf)
    lin = time_weighted_avg(sdf, ["k"], "1 hour", method="linear").toPandas()
    loc = time_weighted_avg(sdf, ["k"], "1 hour", method="locf").toPandas()
    assert (lin.twa.to_numpy() == 7.5).all()
    assert (loc.twa.to_numpy() == 7.5).all()
    # linear covers exactly first→last; locf additionally rounds the
    # tail up to the last sample's own bucket end
    assert lin.covered_s.sum() == pytest.approx(
        (ts[-1] - ts[0]).total_seconds(), abs=1e-6
    )


def test_time_weighted_linear_matches_numpy_trapezoid(spark, rng):
    """Random irregular series vs numpy: per bucket, integrate the
    piecewise-linear signal analytically with fine trapezoid splits at
    every bucket boundary."""
    n = 120
    secs = np.sort(rng.choice(20_000, n, replace=False)).astype("float64")
    vals = rng.normal(size=n) * 10
    pdf = pd.DataFrame({
        "k": "a",
        "ts": pd.to_datetime((1704067200 + secs) * 1e9).astype(
            "datetime64[us]"
        ),
        "value": vals,
    })
    out = (
        time_weighted_avg(
            spark.createDataFrame(pdf), ["k"], "1 hour", method="linear"
        ).toPandas().sort_values("bucket_start").reset_index(drop=True)
    )
    base = 1704067200
    acc: dict[int, list[float]] = {}
    for i in range(n - 1):
        s, e, v0, v1 = secs[i], secs[i + 1], vals[i], vals[i + 1]
        cuts = [s] + [float(b) for b in
                      range(int(s // 3600 + 1) * 3600, int(np.ceil(e)), 3600)
                      if s < b < e] + [e]
        for a, b in zip(cuts, cuts[1:]):
            va = v0 + (v1 - v0) * (a - s) / (e - s)
            vb = v0 + (v1 - v0) * (b - s) / (e - s)
            bi = int(a // 3600)
            acc.setdefault(bi, [0.0, 0.0])
            acc[bi][0] += (b - a) * (va + vb) / 2
            acc[bi][1] += b - a
    exp = {
        base + bi * 3600: c / w for bi, (c, w) in acc.items() if w > 0
    }
    got = dict(zip(
        out.bucket_start.astype("int64") // 10**9, out.twa
    ))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9), k


def test_time_weighted_avg_rejects_unknown_method(spark):
    pdf = pd.DataFrame({
        "k": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "value": [1.0]
    })
    with pytest.raises(ValueError, match="method"):
        time_weighted_avg(spark.createDataFrame(pdf), ["k"],
                          method="cubic")


# -------------------------------------------------------- overlap join

@pytest.fixture()
def interval_pair_frames(spark, rng):
    """Random per-key half-open intervals on both sides, lengths from
    sub-bucket to several buckets so pairs share 0..k exploded
    buckets."""
    def mk(n, seed_off):
        starts = rng.integers(0, 100_000, n) * 1_000_00  # 0.1s grain
        lens = rng.integers(1, 9_000_000_0, n)  # up to ~2.5 h in 10µs
        return pd.DataFrame({
            "k": rng.choice(["x", "y"], n),
            "iid": np.arange(n) + seed_off,
            "start": pd.to_datetime((1704067200 * 10**6 + starts) * 1000)
                     .astype("datetime64[us]"),
            "end": pd.to_datetime(
                (1704067200 * 10**6 + starts + lens) * 1000
            ).astype("datetime64[us]"),
        })
    lp, rp = mk(150, 0), mk(120, 10_000)
    return (spark.createDataFrame(lp), spark.createDataFrame(rp), lp, rp)


def test_overlap_join_matches_theta_bruteforce(spark, interval_pair_frames):
    from peakmatch_xcorr_spark.operators.asof import overlap_join

    ldf, rdf, lp, rp = interval_pair_frames
    got = overlap_join(
        ldf, rdf, ["k"], span_s=3600.0, right_cols=["iid"]
    ).toPandas()
    m = lp.merge(rp, on="k", suffixes=("_l", "_r"))
    m = m[(m.start_l < m.end_r) & (m.start_r < m.end_l)]
    exp = set(zip(m.iid_l, m.iid_r))
    got_pairs = list(zip(got.iid, got.right_iid))
    assert len(got_pairs) == len(set(got_pairs)), "pair emitted twice"
    assert set(got_pairs) == exp
    # overlap durations exact
    exp_ov = {
        (a, b): (min(e1, e2) - max(s1, s2)) // pd.Timedelta(microseconds=1)
        for a, b, s1, e1, s2, e2 in zip(
            m.iid_l, m.iid_r, m.start_l, m.end_l, m.start_r, m.end_r
        )
    }
    for _, row in got.iterrows():
        assert row.overlap_us == exp_ov[(row.iid, row.right_iid)]


def test_overlap_join_half_open_boundaries(spark):
    from peakmatch_xcorr_spark.operators.asof import overlap_join

    t = pd.Timestamp("2024-01-01")
    mins = lambda m: t + pd.Timedelta(minutes=m)
    ldf = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "iid": [1], "start": [mins(0)], "end": [mins(10)],
    }))
    rdf = spark.createDataFrame(pd.DataFrame({
        "k": ["a"] * 3, "iid": [10, 11, 12],
        # touching at the boundary (no overlap), 1µs overlap, empty
        "start": [mins(10), mins(10) - pd.Timedelta(microseconds=1),
                  mins(5)],
        "end": [mins(20), mins(20), mins(5)],
    }))
    got = overlap_join(ldf, rdf, ["k"], span_s=60.0,
                       right_cols=["iid"]).toPandas()
    assert set(got.right_iid) == {11}
    assert got.overlap_us.iloc[0] == 1


def test_overlap_join_keyless_and_rejects_bad_span(spark):
    from peakmatch_xcorr_spark.operators.asof import overlap_join

    t = pd.Timestamp("2024-01-01")
    ldf = spark.createDataFrame(pd.DataFrame({
        "iid": [1, 2],
        "start": [t, t + pd.Timedelta(hours=5)],
        "end": [t + pd.Timedelta(hours=1), t + pd.Timedelta(hours=6)],
    }))
    rdf = spark.createDataFrame(pd.DataFrame({
        "iid": [7],
        "start": [t + pd.Timedelta(minutes=30)],
        "end": [t + pd.Timedelta(hours=5, minutes=30)],
    }))
    got = overlap_join(ldf, rdf, [], span_s=3600.0,
                       right_cols=["iid"]).toPandas()
    # the long right interval overlaps BOTH left intervals, once each
    assert sorted(zip(got.iid, got.right_iid)) == [(1, 7), (2, 7)]
    with pytest.raises(ValueError, match="span_s"):
        overlap_join(ldf, rdf, [], span_s=0)


def test_overlap_join_plan_is_equi_join(spark, interval_pair_frames):
    from peakmatch_xcorr_spark.operators.asof import overlap_join

    ldf, rdf, _, _ = interval_pair_frames

    def _explain(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    for ks in (["k"], []):
        plan = _explain(
            overlap_join(ldf, rdf, ks, span_s=3600.0, right_cols=["iid"])
        )
        assert "BroadcastNestedLoop" not in plan, ks
        assert "CartesianProduct" not in plan, ks
        assert ("SortMergeJoin" in plan) or ("HashJoin" in plan), ks
