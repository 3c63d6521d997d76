"""Funnel operator vs a brute-force per-user pandas walk."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.funnel import funnel_counts, funnel_times

SF = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]


def _brute(pdf: pd.DataFrame, horizon_s=None):
    """Per user: t1 = min ts of step1; t_i = min ts of step_i after
    t_{i-1} (and within horizon of t1)."""
    out = {}
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        ts = [None] * len(STEPS)
        for i, ev in enumerate(STEPS):
            cand = g[g.event_type == ev]
            if i > 0:
                if ts[i - 1] is None:
                    break
                cand = cand[cand.ts > ts[i - 1]]
                if horizon_s is not None:
                    lim = int(ts[0].timestamp()) + horizon_s
                    cand = cand[cand.ts.apply(lambda t: int(t.timestamp())) <= lim]
            if len(cand) == 0:
                break
            ts[i] = cand.ts.min()
        if ts[0] is not None:
            out[uid] = ts
    return out


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _steps_cols():
    return [F.col("event_type") == s for s in STEPS]


@pytest.mark.parametrize("horizon", [None, 6 * 3600])
def test_funnel_times_match_brute_force(spark, events, horizon):
    got = {
        r["user_id"]: [r["step_1_ts"], r["step_2_ts"], r["step_3_ts"]]
        for r in funnel_times(
            events, _steps_cols(), horizon_s=horizon
        ).collect()
    }
    exp = _brute(events.toPandas(), horizon_s=horizon)
    assert set(got) == set(exp)
    for uid in exp:
        for i in range(3):
            g, x = got[uid][i], exp[uid][i]
            assert (g is None) == (x is None), (uid, i, g, x)
            if g is not None:
                assert g == x.to_pydatetime().replace(tzinfo=None), (uid, i)


def test_funnel_counts_monotone_and_based(spark, events):
    rows = funnel_counts(events, _steps_cols()).collect()
    users = [r["users"] for r in sorted(rows, key=lambda r: r["step"])]
    assert users[0] >= users[1] >= users[2]
    assert rows[0]["conversion"] == 1.0


def test_funnel_single_exchange_plan(spark, events):
    """The k-step chain must share ONE hash-partition exchange — not
    one self-join per step."""
    df = funnel_times(events, _steps_cols())
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # one exchange for the user window + one for distinct (formatted
    # mode prints one "(N) Exchange" detail header per exchange; the
    # old "Exchange hashpartitioning" substring never occurs there)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
    assert "Join" not in p
