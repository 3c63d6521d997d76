"""Ordered multi-step funnel over an event stream.

"How many users did A, then B after it, then C after that" — the
standard product-analytics sequence query.  The naive plan is one
self-join per step (k-1 shuffles of the fact table, each with a range
residual); the engine computes the whole chain in ONE exchange:

    t1 = min(ts)  FILTER (step 1)            OVER (PARTITION BY user)
    t2 = min(ts)  FILTER (step 2 AND ts > t1) OVER (PARTITION BY user)
    ...

Each step's qualifying time is a conditional window-min that
references the previous step's — all windows share the same
partitioning, so Catalyst plans a single hash-partition Exchange with
k chained Window operators over it (plan-gated in tests/test_plans.py).
An optional horizon bounds every later step to within ``horizon_s``
seconds of the FIRST step's time (the common "converted within N
days" form).

Semantics: strictly increasing timestamps between steps (a click at
the same microsecond as the view does not count — matches the strict
`>` the reference uses for threshold filters, PeakMatchRunner.java:39);
a user reaches step i only having reached step i-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.rollup import epoch_seconds


def funnel_times(
    df: DataFrame,
    steps: list[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon_s: int | None = None,
) -> DataFrame:
    """One row per user with ``step_1_ts .. step_k_ts`` (null once the
    chain breaks).  ``steps`` are boolean Columns over the event row,
    e.g. ``[F.col("event_type") == "view", ...]``."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    out = df
    prev = None
    for i, pred in enumerate(steps, start=1):
        cond = pred
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        if horizon_s is not None and prev is not None:
            cond = cond & (
                epoch_seconds(ts_col)
                <= epoch_seconds(F.col("step_1_ts")) + horizon_s
            )
        name = f"step_{i}_ts"
        out = out.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = name
    names = [f"step_{i}_ts" for i in range(1, len(steps) + 1)]
    return (
        out.filter(F.col("step_1_ts").isNotNull())
        .select(user_col, *names)
        .distinct()
    )


def funnel_counts(
    df: DataFrame,
    steps: list[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon_s: int | None = None,
) -> DataFrame:
    """(step, users, conversion): users reaching each step, with the
    fraction relative to step 1 (3-dp, the reference's output
    precision, Util.java:28)."""
    times = funnel_times(df, steps, user_col, ts_col, horizon_s)
    aggs = [
        F.count(f"step_{i}_ts").alias(f"s{i}")
        for i in range(1, len(steps) + 1)
    ]
    row = times.agg(*aggs).collect()[0]
    spark = df.sparkSession
    base = row["s1"]
    # +1e-9 before rounding: Python rounds half-even, SQL engines round
    # half-away — the nudge keeps exact .0005 ratios comparable
    data = [
        (
            i,
            int(row[f"s{i}"]),
            round(row[f"s{i}"] / base + 1e-9, 3) if base else 0.0,
        )
        for i in range(1, len(steps) + 1)
    ]
    from peakmatch_xcorr_spark.plans import small_local_df

    return small_local_df(spark, data, "step int, users long, conversion double")
