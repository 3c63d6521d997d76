"""Time-series joins Spark lacks natively: as-of join and
time-weighted aggregation.

``asof_join`` (backward): for each left row, the latest right row with
rt <= lt per key — implemented JVM-side with the union+window trick
(tag sides, union, per-key ts-ordered window, last(ignorenulls) of the
right payload), not a per-group pandas merge_asof: one shuffle, no
Python, and the window is the same partitioning later stages reuse.

``time_weighted_avg``: per (key, bucket) average of a step function
weighted by how long each observation was current (lead(ts) delta,
clipped to the bucket) — the LOCF-consistent aggregate for irregular
samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.rollup import bucket_seconds, epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: left rows get the most recent right values
    at or before their timestamp (per key).  Optional tolerance drops
    matches older than ``tolerance_s`` seconds."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    lt = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    rt = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    )
    # right rows sort before left rows at equal ts so "at or before"
    # includes same-instant right observations
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").cast("timestamp"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
          for c in value_cols],
        F.last("_rts", ignorenulls=True).over(w).alias("_f_rts"),
    ).filter(F.col("_is_left") == 1)
    if tolerance_s is not None:
        in_tol = (
            epoch_seconds(F.col("_ts").cast("timestamp"))
            - epoch_seconds(F.col("_f_rts"))
        ) <= tolerance_s
        filled = filled.select(
            "*",
            *[
                F.when(in_tol, F.col(f"_f_{c}")).alias(f"_t_{c}")
                for c in value_cols
            ],
        )
        picked = [F.col(f"_t_{c}").alias(f"right_{c}") for c in value_cols]
    else:
        picked = [F.col(f"_f_{c}").alias(f"right_{c}") for c in value_cols]
    return filled.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns], *picked
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    bucket: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average per (key, bucket): each observation's
    value is weighted by the time it stayed current (until the next
    observation or the bucket end; the first observation also covers
    the span from the bucket start, LOCF-style within the bucket)."""
    step = bucket_seconds(bucket)
    # microsecond-precision epochs: whole-second truncation would bias
    # the weights of sub-second samples
    tsec = (
        F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6
    )
    w = Window.partitionBy(*keys).orderBy(tsec)
    b = F.window(ts_col, bucket)
    bucket_start_s = epoch_seconds(b["start"]).cast("double")
    bucket_end_s = bucket_start_s + step
    next_ts = F.lead(tsec).over(w)
    # weight: from this obs (or bucket start for the first obs in the
    # bucket) until min(next obs, bucket end)
    prev_ts = F.lag(tsec).over(w)
    seg_start = F.when(
        prev_ts.isNull() | (prev_ts < bucket_start_s), bucket_start_s
    ).otherwise(tsec)
    seg_end = F.least(F.coalesce(next_ts, bucket_end_s), bucket_end_s)
    weight = F.greatest(seg_end - seg_start, F.lit(0.0))
    return (
        df.select(*keys, b["start"].alias("bucket_start"),
                  F.col(value_col).alias("v"), weight.alias("wt"))
        .groupBy(*keys, "bucket_start")
        .agg(
            (F.sum(F.col("v") * F.col("wt")) / F.sum("wt")).alias("twa"),
            F.sum("wt").alias("covered_s"),
        )
    )
