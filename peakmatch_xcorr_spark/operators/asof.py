"""Time-series joins Spark lacks natively: as-of join and
time-weighted aggregation.

``asof_join`` (backward): for each left row, the latest right row with
rt <= lt per key — implemented JVM-side with the union+window trick
(tag sides, union, per-key ts-ordered window, last(ignorenulls) of the
right payload), not a per-group pandas merge_asof: one shuffle, no
Python, and the window is the same partitioning later stages reuse.

``time_weighted_avg``: per (key, bucket) LOCF step-function integral —
each observation covers [its ts, next obs ts), intersected with every
bucket the segment spans (TimescaleDB time_weight('LOCF') semantics).
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
    from pyspark.sql.types import StructField, StructType, TimestampType

    value_cols = value_cols or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    # The right payload is carried as ONE struct so every output column
    # comes from the SAME matched right row (per-column fills would
    # stitch values from different rows whenever a right column is
    # null, and the tolerance check would compare against a newer row
    # than the one a value actually came from).
    if "__asof_rts" in value_cols:
        raise ValueError("value column name '__asof_rts' is reserved")
    rrow_t = StructType(
        [StructField("__asof_rts", TimestampType())]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    lt = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rrow_t).alias("_rrow"),
    )
    rt = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("__asof_rts"),
            *[F.col(c) for c in value_cols],
        ).alias("_rrow"),
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
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_f")
    ).filter(F.col("_is_left") == 1)
    if tolerance_s is not None:
        in_tol = (
            epoch_seconds(F.col("_ts").cast("timestamp"))
            - epoch_seconds(F.col("_f")["__asof_rts"])
        ) <= tolerance_s
        picked = [
            F.when(in_tol, F.col("_f")[c]).alias(f"right_{c}")
            for c in value_cols
        ]
    else:
        picked = [F.col("_f")[c].alias(f"right_{c}") for c in value_cols]
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
    """LOCF time-weighted average per (key, bucket): each observation
    defines a step segment [its ts, next obs ts) over which its value
    is current (the last observation's segment ends at the end of its
    own bucket — no projection beyond the data).  Segments are
    intersected with the tumbling buckets they span, so a value
    carries INTO later buckets it remains current for, including
    buckets with no samples of their own; buckets starting before the
    key's first observation get no row (head coverage is unknown —
    compose with gap_fill for a dense spine).  ``covered_s`` is the
    per-bucket covered time.

    This is the step-function integral semantics (TimescaleDB
    ``time_weight('LOCF', ...)``): values are never back-propagated
    from the future into earlier parts of a bucket."""
    step = bucket_seconds(bucket)
    # microsecond-precision epochs: whole-second truncation would bias
    # the weights of sub-second samples
    tsec = (
        F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6
    )
    w = Window.partitionBy(*keys).orderBy("s")
    own_bucket_end = (F.floor(F.col("s") / step) + 1).cast("double") * step
    # window exprs can't live inside a generator: materialize segment
    # bounds first, then explode the bucket range they span
    bounds = df.select(
        *keys, F.col(value_col).alias("v"), tsec.alias("s")
    ).select(
        "*",
        F.coalesce(F.lead("s").over(w), own_bucket_end).alias("e"),
    )
    first_b = F.floor(F.col("s") / step).cast("long")
    # end-exclusive: a segment ending exactly on a boundary does not
    # touch the next bucket; degenerate (zero-length) segments keep
    # their own bucket so sequence() never runs backwards
    last_b = F.greatest(
        F.floor((F.col("e") - F.lit(1e-9)) / step).cast("long"), first_b
    )
    seg = bounds.select(
        *keys, "v", "s", "e",
        F.explode(F.sequence(first_b, last_b)).alias("bi"),
    )
    b_start = F.col("bi").cast("double") * step
    overlap = F.greatest(
        F.least(F.col("e"), b_start + step) - F.greatest(F.col("s"), b_start),
        F.lit(0.0),
    )
    out = (
        seg.select(
            *keys,
            F.timestamp_seconds(F.col("bi") * step).alias("bucket_start"),
            "v", overlap.alias("wt"),
        )
        .groupBy(*keys, "bucket_start")
        .agg(
            F.sum(F.col("v") * F.col("wt")).alias("_vw"),
            F.sum("wt").alias("covered_s"),
        )
    )
    # zero-covered buckets (only degenerate duplicate-ts segments)
    # carry no information — drop them rather than emit twa=null
    return out.filter(F.col("covered_s") > 0).select(
        *keys, "bucket_start",
        (F.col("_vw") / F.col("covered_s")).alias("twa"),
        "covered_s",
    )
