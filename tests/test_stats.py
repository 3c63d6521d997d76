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


# ----------------------------------------------------------------- ACF

def _dense_acf(series: np.ndarray, lag: int) -> float | None:
    """Pearson r between x[:-lag] and x[lag:] of the DENSE series."""
    if len(series) <= lag + 1:
        return None
    x = series[:-lag].astype("float64")
    y = series[lag:].astype("float64")
    if x.std() == 0 or y.std() == 0:
        return None
    return float(np.corrcoef(x, y)[0, 1])


@pytest.mark.parametrize("lag", [1, 3])
def test_activity_acf_matches_dense_numpy(spark, events, pdf, lag):
    """The sparse-tier computation must equal the literal dense-series
    corrcoef: materialize every user's zero-filled minute curve in
    numpy and compare."""
    from peakmatch_xcorr_spark.operators.rollup import tumbling_rollup
    from peakmatch_xcorr_spark.operators.stats import activity_acf

    curve = tumbling_rollup(events, ["user_id"], "ts", None, "1 minute")
    got = {
        r["user_id"]: r
        for r in activity_acf(curve, ["user_id"], "1 minute", lag=lag)
        .collect()
    }
    p = pdf.copy()
    p["minute"] = p.ts.dt.floor("min")
    for uid, grp in p.groupby("user_id"):
        counts = grp.groupby("minute").size()
        idx = pd.date_range(counts.index.min(), counts.index.max(),
                            freq="min")
        dense = counts.reindex(idx, fill_value=0).to_numpy()
        exp = _dense_acf(dense, lag)
        row = got[uid]
        assert row["n_pairs"] == len(dense) - lag
        if exp is None:
            assert row["acf"] is None
        else:
            assert row["acf"] == pytest.approx(round(exp + 1e-9, 6),
                                               abs=2e-6)


def test_activity_acf_perfect_alternation(spark):
    """A strictly alternating dense curve has lag-1 ACF −1 and lag-2
    ACF +1 exactly."""
    from peakmatch_xcorr_spark.operators.stats import activity_acf

    t0 = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "user_id": "u",
        "bucket_start": [t0 + pd.Timedelta(minutes=m) for m in range(20)],
        "turns": [5 if m % 2 == 0 else 1 for m in range(20)],
    })
    tier = spark.createDataFrame(rows)
    out = {r["user_id"]: r for r in
           activity_acf(tier, ["user_id"], "1 minute", lag=1).collect()}
    assert out["u"]["acf"] == pytest.approx(-1.0, abs=1e-6)
    out2 = {r["user_id"]: r for r in
            activity_acf(tier, ["user_id"], "1 minute", lag=2).collect()}
    assert out2["u"]["acf"] == pytest.approx(1.0, abs=1e-6)


def test_activity_acf_sparse_gap_counts_as_zeros(spark):
    """Buckets absent from the tier are ZEROS in the dense series, not
    skipped: a two-point tier with a gap must match numpy on the
    zero-filled curve."""
    from peakmatch_xcorr_spark.operators.stats import activity_acf

    t0 = pd.Timestamp("2024-01-01")
    tier = spark.createDataFrame(pd.DataFrame({
        "user_id": "u",
        "bucket_start": [t0, t0 + pd.Timedelta(minutes=4)],
        "turns": [3, 7],
    }))
    row = activity_acf(tier, ["user_id"], "1 minute", lag=1).collect()[0]
    dense = np.array([3, 0, 0, 0, 7])
    assert row["n_pairs"] == 4
    exp = float(np.corrcoef(dense[:-1], dense[1:])[0, 1])
    assert row["acf"] == pytest.approx(round(exp + 1e-9, 6), abs=2e-6)


def test_activity_acf_rejects_nonpositive_lag(spark, events):
    from peakmatch_xcorr_spark.operators.stats import activity_acf

    with pytest.raises(ValueError, match="lag"):
        activity_acf(events, ["user_id"], "1 minute", lag=0)


def test_new_tier_ops_plans_stay_jvm_side(spark, events):
    """Plan gates: calendar tier and irate are pure codegen (no
    Python/Arrow eval), with map-side partial aggregation."""
    from peakmatch_xcorr_spark.operators.downsample import irate
    from peakmatch_xcorr_spark.operators.rollup import (
        calendar_tier,
        cascade_tier,
        tumbling_rollup,
    )

    ev = events.filter(events.value.isNotNull())
    t1d = cascade_tier(
        tumbling_rollup(ev, ["user_id"], "ts", "value", "1 hour"),
        ["user_id"], "1 day",
    )
    plan = _explain(calendar_tier(t1d, ["user_id"], "month"))
    assert "partial" in plan.lower()
    assert "Python" not in plan and "ArrowEval" not in plan

    plan = _explain(irate(events, ["user_id"], "ts", "value", "1 hour",
                          "event_id"))
    assert "Python" not in plan and "ArrowEval" not in plan
    # ONE exchange: the agg on (keys, bucket) reuses the lag window's
    # hash distribution on keys (a superset-grouping distribution
    # satisfies the subset requirement), so Catalyst plans the final
    # aggregate without a second shuffle
    assert _n_exchanges(plan) == 1


# ----------------------------------------------------------------- CCF

@pytest.mark.parametrize("lag", [-2, 0, 1])
def test_activity_ccf_matches_dense_numpy(spark, events, pdf, lag):
    """Sparse-tier CCF must equal literal dense corrcoef of the two
    zero-filled curves over their UNION span."""
    from peakmatch_xcorr_spark.operators.rollup import tumbling_rollup
    from peakmatch_xcorr_spark.operators.stats import activity_ccf

    ev_click = events.filter(events.event_type == "click")
    ev_view = events.filter(events.event_type == "view")
    tx = tumbling_rollup(ev_click, ["user_id"], "ts", None, "1 minute")
    ty = tumbling_rollup(ev_view, ["user_id"], "ts", None, "1 minute")
    got = {
        r["user_id"]: r
        for r in activity_ccf(tx, ty, ["user_id"], "1 minute", lag=lag)
        .collect()
    }
    p = pdf.copy()
    p["minute"] = p.ts.dt.floor("min")
    for uid, grp in p.groupby("user_id"):
        cx = grp[grp.event_type == "click"].groupby("minute").size()
        cy = grp[grp.event_type == "view"].groupby("minute").size()
        if cx.empty or cy.empty:
            assert uid not in got or got[uid]["ccf"] is None
            continue
        lo = min(cx.index.min(), cy.index.min())
        hi = max(cx.index.max(), cy.index.max())
        idx = pd.date_range(lo, hi, freq="min")
        dx = cx.reindex(idx, fill_value=0).to_numpy().astype("float64")
        dy = cy.reindex(idx, fill_value=0).to_numpy().astype("float64")
        if lag >= 0:
            x = dx[: len(dx) - lag] if lag else dx
            y = dy[lag:]
        else:
            x = dx[-lag:]
            y = dy[: len(dy) + lag]
        row = got[uid]
        assert row["n_pairs"] == len(idx) - abs(lag)
        if len(x) < 2 or x.std() == 0 or y.std() == 0:
            assert row["ccf"] is None
        else:
            exp = float(np.corrcoef(x, y)[0, 1])
            assert row["ccf"] == pytest.approx(round(exp + 1e-9, 6),
                                               abs=2e-6)


def test_activity_ccf_planted_lead(spark):
    """y is exactly x delayed by 2 buckets: CCF at lag 2 is 1, and at
    lag 0 it is the (imperfect) raw alignment."""
    from peakmatch_xcorr_spark.operators.stats import activity_ccf

    t0 = pd.Timestamp("2024-01-01")
    vals = [5, 1, 4, 2, 9, 3, 7, 1, 6, 2]
    tier_x = spark.createDataFrame(pd.DataFrame({
        "user_id": "u",
        "bucket_start": [t0 + pd.Timedelta(minutes=m) for m in range(10)],
        "turns": vals,
    }))
    tier_y = spark.createDataFrame(pd.DataFrame({
        "user_id": "u",
        "bucket_start": [t0 + pd.Timedelta(minutes=m + 2)
                         for m in range(10)],
        "turns": vals,
    }))
    out = activity_ccf(tier_x, tier_y, ["user_id"], "1 minute", lag=2)
    assert out.collect()[0]["ccf"] == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------ topn with rest

def test_topn_with_rest_partitions_group_totals(spark, events, pdf):
    from peakmatch_xcorr_spark.operators.stats import topn_with_rest

    got = topn_with_rest(
        events, ["event_type"], "user_id", n=3
    ).toPandas()
    for et, grp in pdf.groupby("event_type"):
        g = got[got.event_type == et]
        # the rows partition the group total exactly
        assert g.weight.sum() == len(grp)
        counts = grp.groupby("user_id").size().sort_values(
            ascending=False
        )
        top = g[g.entity != "<rest>"].sort_values("rank")
        # deterministic tie-break: count desc, entity asc (native
        # type order — ranking happens BEFORE the string cast)
        exp_top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:3]
        assert [int(e) for e in top.entity] == [int(k) for k, _ in exp_top]
        assert list(top.weight) == [v for _, v in exp_top]
        rest = g[g.entity == "<rest>"]
        if len(counts) > 3:
            assert rest.weight.iloc[0] == len(grp) - sum(
                v for _, v in exp_top
            )
            assert rest.n_entities.iloc[0] == len(counts) - 3
            assert pd.isna(rest["rank"].iloc[0])
        else:
            assert rest.empty


def test_topn_with_rest_rejects_bad_n(spark, events):
    from peakmatch_xcorr_spark.operators.stats import topn_with_rest

    with pytest.raises(ValueError, match="n must"):
        topn_with_rest(events, ["event_type"], "user_id", n=0)


# ------------------------------------------------- changepoint


def _dense_frame(spark, series: dict[str, list[int]]):
    rows = []
    for k, vs in series.items():
        for i, v in enumerate(vs):
            rows.append((k, 1000 + i, int(v)))
    pdf = pd.DataFrame(rows, columns=["key", "b", "v"])
    return spark.createDataFrame(pdf), pdf


def _brute_changepoint(vs: np.ndarray, min_seg: int):
    L = len(vs)
    best = None
    for t in range(min_seg, L - min_seg + 1):
        lm = vs[:t].mean()
        rm = vs[t:].mean()
        score = abs(lm - rm) * np.sqrt(t * (L - t) / L)
        if best is None or score > best[0] + 1e-15:
            best = (score, t, lm, rm)
    return best


def test_changepoint_recovers_planted_shift(spark, rng):
    from peakmatch_xcorr_spark.operators.stats import changepoint_mean_shift

    base = rng.poisson(5, 60)
    shifted = np.concatenate([base[:35], base[35:] + 12])
    df, _ = _dense_frame(spark, {"a": shifted.tolist()})
    got = changepoint_mean_shift(df, ["key"], min_seg=8).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["left_len"] == 35          # split found at the planted point
    assert r["change_b"] == 1000 + 35   # first bucket of the right segment
    assert r["right_mean"] - r["left_mean"] > 10


def test_changepoint_matches_bruteforce(spark, rng):
    from peakmatch_xcorr_spark.operators.stats import changepoint_mean_shift

    series = {
        f"k{i}": rng.poisson(4, int(rng.integers(30, 80))).tolist()
        for i in range(5)
    }
    df, _ = _dense_frame(spark, series)
    got = changepoint_mean_shift(df, ["key"], min_seg=5).toPandas()
    for k, vs in series.items():
        score, t, lm, rm = _brute_changepoint(np.array(vs, float), 5)
        r = got[got.key == k].iloc[0]
        assert r["left_len"] == t, k
        assert r["score"] == round(score + 1e-9, 6)
        assert r["left_mean"] == round(lm + 1e-9, 6)
        assert r["right_mean"] == round(rm + 1e-9, 6)


def test_changepoint_flat_series_ties_to_smallest_t(spark):
    from peakmatch_xcorr_spark.operators.stats import changepoint_mean_shift

    df, _ = _dense_frame(spark, {"flat": [7] * 40})
    got = changepoint_mean_shift(df, ["key"], min_seg=6).toPandas()
    r = got.iloc[0]
    assert r["score"] == 0.0 and r["left_len"] == 6


def test_changepoint_short_series_emits_nothing(spark):
    from peakmatch_xcorr_spark.operators.stats import changepoint_mean_shift

    df, _ = _dense_frame(spark, {"s": [1, 2, 3, 4, 5]})
    assert changepoint_mean_shift(df, ["key"], min_seg=3).count() == 0


def test_binary_segmentation_recovers_two_planted_shifts(spark, rng):
    from peakmatch_xcorr_spark.operators.stats import binary_segmentation

    base = rng.poisson(5, 90).astype(float)
    base[30:] += 15
    base[60:] += 15
    df, _ = _dense_frame(spark, {"a": base.astype(int).tolist()})
    splits, segmented = binary_segmentation(
        df, ["key"], depth=2, min_seg=8, min_score=5.0
    )
    sp = splits.toPandas().sort_values(["level", "change_b"])
    # depth-1 finds one of the two shifts; depth-2 finds the other
    bounds = sorted(sp["change_b"].tolist())
    assert bounds == [1030, 1060]
    seg = segmented.toPandas()
    # three final segments covering 30/30/30 buckets
    sizes = seg.groupby("seg")["b"].agg(["min", "max", "count"])
    assert sorted(sizes["count"].tolist()) == [30, 30, 30]
    # segment ids are unique and consistent with bucket ranges
    assert sizes["min"].tolist() == sorted(sizes["min"].tolist())


def test_binary_segmentation_gate_blocks_noise_splits(spark, rng):
    from peakmatch_xcorr_spark.operators.stats import binary_segmentation

    flat = rng.poisson(5, 80).tolist()
    df, _ = _dense_frame(spark, {"flat": flat})
    splits, segmented = binary_segmentation(
        df, ["key"], depth=3, min_seg=8, min_score=6.0
    )
    assert splits.count() == 0
    seg = segmented.toPandas()
    assert (seg["seg"] == 0).all()  # 3 left-only shifts: 0 -> 0


def test_binary_segmentation_ids_unique_across_mixed_splits(spark, rng):
    """Two keys where one splits and the other doesn't: the unsplit
    key's rows must not share a seg id with either child of the split
    key at the same level (the left-shift collision this test pins)."""
    from peakmatch_xcorr_spark.operators.stats import binary_segmentation

    shifted = np.concatenate(
        [rng.poisson(4, 30), rng.poisson(4, 30) + 20]
    ).astype(int)
    df, _ = _dense_frame(
        spark, {"hot": shifted.tolist(), "cold": [4] * 60}
    )
    _, segmented = binary_segmentation(
        df, ["key"], depth=1, min_seg=8, min_score=5.0
    )
    seg = segmented.toPandas()
    hot = set(seg[seg.key == "hot"]["seg"])
    cold = set(seg[seg.key == "cold"]["seg"])
    assert hot == {0, 1}
    assert cold == {0}
    # per-key segments partition that key's buckets contiguously
    for k, g in seg.groupby("key"):
        for s, gg in g.groupby("seg"):
            bs = sorted(gg["b"])
            assert bs == list(range(bs[0], bs[0] + len(bs)))


# ------------------------------------------------------ histogram quantile

def test_histogram_quantile_matches_numpy_within_bin_width(spark, rng):
    from peakmatch_xcorr_spark.operators.stats import (
        histogram_quantile,
        keyed_histogram,
    )

    vals = rng.uniform(0, 100, 5000)
    df = spark.createDataFrame(
        [("k", float(v)) for v in vals], "key string, value double"
    )
    hist = keyed_histogram(df, "value", ["key"], 0.0, 100.0, 50)
    for q in (0.5, 0.9, 0.99):
        est = histogram_quantile(hist, ["key"], q, 0.0, 100.0, 50).collect()[
            0
        ]["est_q"]
        true = float(np.quantile(vals, q))
        # linear interpolation inside a 2.0-wide bin: the estimate is
        # off by at most one bin width on any distribution
        assert abs(est - true) <= 2.0, (q, est, true)


def test_histogram_quantile_exact_on_uniform_grid(spark):
    from peakmatch_xcorr_spark.operators.stats import (
        histogram_quantile,
        keyed_histogram,
    )

    # one value per unit bin -> cumulative walk is analytic:
    # rank q*100 lands in bin ceil(q*100), est = bin_lo + frac * 1.0
    df = spark.createDataFrame(
        [("k", i + 0.5) for i in range(100)], "key string, value double"
    )
    hist = keyed_histogram(df, "value", ["key"], 0.0, 100.0, 100)
    est = histogram_quantile(hist, ["key"], 0.25, 0.0, 100.0, 100).collect()[
        0
    ]["est_q"]
    assert est == pytest.approx(25.0)


def test_histogram_quantile_clamps_under_and_overflow(spark):
    from peakmatch_xcorr_spark.operators.stats import (
        histogram_quantile,
        keyed_histogram,
    )

    df = spark.createDataFrame(
        [("k", -5.0)] * 10 + [("k", 999.0)] * 10, "key string, value double"
    )
    hist = keyed_histogram(df, "value", ["key"], 0.0, 100.0, 10)
    lo = histogram_quantile(hist, ["key"], 0.2, 0.0, 100.0, 10).collect()[0][
        "est_q"
    ]
    hi = histogram_quantile(hist, ["key"], 0.95, 0.0, 100.0, 10).collect()[0][
        "est_q"
    ]
    assert lo == 0.0 and hi == 100.0


def test_keyed_histogram_merges_by_sum(spark, rng):
    """Bin counts are decomposable: histogram(A ∪ B) == histogram(A)
    + histogram(B) merged by plain sum — the property that lets
    histogram tiers cascade/refresh like the rollup tiers."""
    from pyspark.sql import functions as F

    from peakmatch_xcorr_spark.operators.stats import keyed_histogram

    a = [("k", float(v)) for v in rng.uniform(0, 100, 500)]
    b = [("k", float(v)) for v in rng.uniform(0, 100, 700)]
    mk = lambda rows: keyed_histogram(
        spark.createDataFrame(rows, "key string, value double"),
        "value", ["key"], 0.0, 100.0, 20,
    )
    merged = (
        mk(a).unionByName(mk(b))
        .groupBy("key", "bin").agg(F.sum("n").alias("n"))
    )
    direct = mk(a + b)
    g = {(r["bin"]): r["n"] for r in merged.collect()}
    d = {(r["bin"]): r["n"] for r in direct.collect()}
    assert g == d
