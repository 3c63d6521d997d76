"""State/heartbeat/candlestick aggregates vs brute-force pandas walks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from peakmatch_xcorr_spark.operators.stateagg import (
    candlestick,
    heartbeat_uptime,
    state_durations,
)

SF = "/root/testdata/sf0.001"
L = 1800.0


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def pdf(events):
    p = events.toPandas()
    p["tsec"] = p["ts"].astype("datetime64[us]").astype("int64") / 1e6
    return p.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _n_exchanges(plan: str) -> int:
    # formatted mode prints one "(N) Exchange" detail header per
    # exchange; "Exchange hashpartitioning" only exists in simple mode
    return plan.count(") Exchange")


def test_state_durations_match_brute_force(spark, events, pdf):
    exp: dict[str, list[float]] = {}
    exp_entries: dict[str, int] = {}
    exp_visits: dict[str, int] = {}
    for _, g in pdf.groupby("user_id"):
        states = g["event_type"].to_numpy()
        tsec = g["tsec"].to_numpy()
        prev = None
        for i, s in enumerate(states):
            exp_visits[s] = exp_visits.get(s, 0) + 1
            if prev is None or prev != s:
                exp_entries[s] = exp_entries.get(s, 0) + 1
            if i + 1 < len(states):
                exp.setdefault(s, []).append(tsec[i + 1] - tsec[i])
            prev = s
    got = {
        r["state"]: r
        for r in state_durations(
            events, "user_id", "event_type", "ts", ("event_id",)
        ).collect()
    }
    assert set(got) == set(exp_visits)
    for s, r in got.items():
        assert r["visits"] == exp_visits[s]
        assert r["entries"] == exp_entries[s]
        assert r["total_sec"] == pytest.approx(sum(exp.get(s, [])), abs=0.02)
        if s in exp:
            assert r["mean_dwell"] == pytest.approx(
                float(np.mean(exp[s])), abs=1e-4
            )


def test_heartbeat_uptime_matches_interval_union(spark, events, pdf):
    """The telescoped least(gap, L) sum must equal an explicit merge
    of the [ts, ts+L) interval union — the definitional semantics."""
    exp_up: dict[int, float] = {}
    exp_gaps: dict[int, int] = {}
    for uid, g in pdf.groupby("user_id"):
        merged = []
        for t in g["tsec"].to_numpy():
            s, e = t, t + L
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        exp_up[uid] = sum(e - s for s, e in merged)
        exp_gaps[uid] = len(merged) - 1
    got = {
        r["user_id"]: r
        for r in heartbeat_uptime(
            events, "user_id", "ts", L, ("event_id",)
        ).collect()
    }
    assert set(got) == set(exp_up)
    for uid, r in got.items():
        assert r["uptime_sec"] == pytest.approx(exp_up[uid], abs=0.02)
        assert r["n_gaps"] == exp_gaps[uid]
        # dead time + uptime spans first beat .. last beat + L exactly
        g = pdf[pdf.user_id == uid]["tsec"]
        span = g.max() - g.min() + L
        assert r["uptime_sec"] + r["dead_sec"] == pytest.approx(
            span, abs=0.05
        )


def test_candlestick_matches_brute_force(spark, events, pdf):
    p = pdf.copy()
    p["bucket"] = p["ts"].dt.floor("h")
    got = {
        (r["event_type"], r["bucket_start"]): r
        for r in candlestick(
            events, ["event_type"], "ts", "value", "1 hour", ("event_id",)
        ).collect()
    }
    grouped = p.sort_values(["ts", "event_id"]).groupby(
        ["event_type", "bucket"]
    )
    assert len(got) == grouped.ngroups
    for (et, b), g in grouped:
        r = got[(et, b.to_pydatetime().replace(tzinfo=None))]
        assert r["open"] == g["value"].iloc[0]
        assert r["close"] == g["value"].iloc[-1]
        assert r["high"] == g["value"].max()
        assert r["low"] == g["value"].min()
        assert r["turns"] == len(g)


def test_candlestick_tie_break_is_deterministic(spark):
    """Two rows at the SAME timestamp: the tiebreak column decides
    open/close, not partition order."""
    rows = [
        (1, pd.Timestamp("2024-01-01 00:10:00"), 5.0),
        (0, pd.Timestamp("2024-01-01 00:10:00"), 3.0),
        (2, pd.Timestamp("2024-01-01 00:40:00"), 4.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "value"]).assign(
            ts=lambda d: d.ts.astype("datetime64[us]")
        )
    ).withColumn("k", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("a"))
    out = candlestick(
        df.repartition(4), ["k"], "ts", "value", "1 hour", ("event_id",)
    ).collect()
    assert len(out) == 1
    assert out[0]["open"] == 3.0  # event_id 0 wins the ts tie
    assert out[0]["close"] == 4.0
    assert out[0]["high"] == 5.0


def test_state_and_heartbeat_single_window_exchange(spark, events):
    """lead+lag must share ONE hash-partition exchange (fused Window),
    plus the aggregate's own exchange — never one per function."""
    for df in (
        state_durations(events, "user_id", "event_type", "ts", ("event_id",)),
        heartbeat_uptime(events, "user_id", "ts", L, ("event_id",)),
    ):
        plan = _explain(df)
        assert _n_exchanges(plan) <= 2, plan
        assert plan.count(") Window") == 1, plan  # lead+lag fused


def test_candlestick_is_one_shuffle_with_partial_agg(spark, events):
    """OHLC must be a plain decomposable aggregate: one exchange, a
    map-side partial aggregate below it, no Window operator.  The
    struct-tiebreak path pays SortAggregate (hash-agg buffers must be
    fixed-width); the no-tiebreak path must stay HashAggregate via the
    primitive epoch-micros ordering key."""
    tied = _explain(
        candlestick(events, ["event_type"], "ts", "value", "1 hour",
                    ("event_id",))
    )
    assert _n_exchanges(tied) == 1, tied
    assert ") Window" not in tied, tied
    assert "partial_min_by" in tied, tied  # map-side combine survives
    plain = _explain(
        candlestick(events, ["event_type"], "ts", "value", "1 hour")
    )
    assert _n_exchanges(plain) == 1, plain
    assert "HashAggregate" in plain and "SortAggregate" not in plain, plain


# ------------------------------------------------- duration_in_buckets

def test_duration_in_buckets_splits_at_boundaries(spark):
    from peakmatch_xcorr_spark.operators.stateagg import duration_in_buckets

    t = pd.Timestamp("2024-01-01")
    m = lambda x: t + pd.Timedelta(minutes=x)
    # idle 13:59->14:01 crosses the hour: 60 s in each hour
    df = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"] * 3,
        "ts": [m(13 * 60 + 30), m(13 * 60 + 59), m(14 * 60 + 1)],
        "state": ["busy", "idle", "busy"],
    }))
    got = (
        duration_in_buckets(df, "conv_id", "state", "1 hour")
        .toPandas().sort_values(["bucket_start", "state"])
        .reset_index(drop=True)
    )
    rows = {(r.bucket_start.hour, r.state): r.seconds
            for r in got.itertuples()}
    assert rows[(13, "busy")] == pytest.approx(29 * 60)
    assert rows[(13, "idle")] == pytest.approx(60)
    assert rows[(14, "idle")] == pytest.approx(60)
    # last row holds to the end of ITS OWN bucket, not beyond
    assert rows[(14, "busy")] == pytest.approx(59 * 60)
    assert set(rows) == {(13, "busy"), (13, "idle"),
                         (14, "idle"), (14, "busy")}


def test_duration_in_buckets_matches_bruteforce(spark, rng):
    from peakmatch_xcorr_spark.operators.stateagg import duration_in_buckets

    n = 300
    base = 1704067200
    secs = np.sort(rng.choice(40_000, n, replace=False)).astype("float64")
    states = rng.choice(["a", "b", "c"], n)
    keys = rng.choice(["k1", "k2"], n)
    pdf = pd.DataFrame({
        "conv_id": keys,
        "ts": pd.to_datetime((base + secs) * 1e9).astype("datetime64[us]"),
        "state": states,
    })
    got = {
        (r.conv_id, int(r.bucket_start.timestamp()), r.state): r.seconds
        for r in duration_in_buckets(
            spark.createDataFrame(pdf), "conv_id", "state", "1 hour"
        ).toPandas().itertuples()
    }
    exp: dict = {}
    for k, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("ts")
        # datetime64[us].astype(int64) is MICROseconds
        ss = g.ts.astype("int64").to_numpy() / 1e6
        for i in range(len(g)):
            s = ss[i]
            e = ss[i + 1] if i + 1 < len(g) else (s // 3600 + 1) * 3600
            st = g.state.iloc[i]
            a = s
            while a < e:
                b = min(e, (a // 3600 + 1) * 3600)
                bk = (k, int(a // 3600 * 3600), st)
                exp[bk] = exp.get(bk, 0.0) + (b - a)
                a = b
    exp = {k: round(v + 1e-9, 3) for k, v in exp.items() if round(v + 1e-9, 3) > 0}
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_duration_in_buckets_plan_one_exchange(spark):
    from peakmatch_xcorr_spark.operators.stateagg import duration_in_buckets

    t = pd.Timestamp("2024-01-01")
    df = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c", "c"], "ts": [t, t + pd.Timedelta(minutes=5)],
        "state": ["a", "b"],
    }))
    plan = duration_in_buckets(df, "conv_id", "state", "1 hour")
    s = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "formatted"
    )
    # window on key + agg on (key, bucket, state) reusing the key
    # distribution: one data exchange
    assert s.count(") Exchange") == 1
    assert "Python" not in s and "ArrowEval" not in s


def test_largest_gaps_ranks_and_bounds(spark):
    import datetime as dt

    from peakmatch_xcorr_spark.operators.stateagg import largest_gaps

    t0 = dt.datetime(2024, 1, 1)
    # key a: gaps of 10s, 3600s, 60s -> top-2 = 3600, 60
    offsets = [0, 10, 3610, 3670]
    rows = [("a", t0 + dt.timedelta(seconds=s)) for s in offsets]
    rows += [("b", t0)]  # single event: no gap rows at all
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = largest_gaps(df, "user_id", "ts", k=2).collect()
    by = {(r["user_id"], r["gap_rank"]): r for r in got}
    assert set(by) == {("a", 1), ("a", 2)}
    assert by[("a", 1)]["gap_us"] == 3_600_000_000
    assert by[("a", 1)]["gap_start"] == t0 + dt.timedelta(seconds=10)
    assert by[("a", 2)]["gap_us"] == 60_000_000


def test_largest_gaps_tie_breaks_on_start(spark):
    import datetime as dt

    import pytest as _pytest

    from peakmatch_xcorr_spark.operators.stateagg import largest_gaps

    t0 = dt.datetime(2024, 1, 1)
    # two equal 100s gaps: rank 1 must be the EARLIER one
    offsets = [0, 100, 101, 201]
    df = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=s)) for s in offsets],
        "user_id string, ts timestamp",
    )
    got = {r["gap_rank"]: r for r in largest_gaps(df, "user_id", "ts", 2).collect()}
    assert got[1]["gap_start"] == t0
    assert got[2]["gap_start"] == t0 + dt.timedelta(seconds=101)
    with _pytest.raises(ValueError):
        largest_gaps(df, "user_id", "ts", 0)
