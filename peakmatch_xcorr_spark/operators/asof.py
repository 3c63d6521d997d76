"""Time-series joins Spark lacks natively: as-of join and
time-weighted aggregation.

``asof_join`` (backward / forward / nearest): for each left row, the
nearest right row per key in the requested direction — implemented
JVM-side with the union+window trick (tag sides, union, per-key
ts-ordered window, last/first(ignorenulls) of the right payload), not
a per-group pandas merge_asof: one shuffle, no Python, and the window
is the same partitioning later stages reuse.

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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows get right values from the nearest right
    row per key, where "nearest" is governed by ``direction``:

    - ``backward`` (default): most recent right row at or before the
      left timestamp — the kdb aj / DuckDB ASOF semantics.
    - ``forward``: earliest right row at or after the left timestamp.
    - ``nearest``: whichever of the two is closer in absolute time;
      an exact tie prefers the backward match (deterministic, and the
      convention pandas merge_asof(direction='nearest') follows).

    Optional ``tolerance_s`` drops matches farther than that many
    seconds on either side.

    All three run in the same union+window plan with ONE exchange on
    the keys: backward is a trailing last(ignorenulls), forward a
    leading first(ignorenulls) (a second intra-partition sort, no new
    shuffle — at equal timestamps right rows order before left rows
    for backward and after them for forward, so same-instant
    observations match in both directions), nearest evaluates both
    fills and picks per row."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be backward | forward | nearest, got "
            f"{direction!r}"
        )
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
    u = lt.unionByName(rt)
    lts = F.col("_ts").cast("timestamp")
    # right rows sort before left rows at equal ts so "at or before"
    # includes same-instant right observations
    wb = (
        Window.partitionBy(*keys)
        .orderBy(lts, F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ...and AFTER them for "at or after" (forward frame starts at the
    # current row, so a same-ts right row must order behind the left)
    wf = (
        Window.partitionBy(*keys)
        .orderBy(lts, F.col("_is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last("_rrow", ignorenulls=True).over(wb).alias("_fb"))
    if direction in ("forward", "nearest"):
        fills.append(F.first("_rrow", ignorenulls=True).over(wf).alias("_ff"))
    filled = u.select("*", *fills).filter(F.col("_is_left") == 1)

    def _gap(f):
        # exact int64 MICROSECONDS from the left row to fill f's right
        # row — a seconds cast truncates, which flips nearest-side
        # decisions (and tolerance edges) on sub-second data
        return F.abs(
            F.unix_micros(lts) - F.unix_micros(F.col(f)["__asof_rts"])
        )

    if direction == "nearest":
        # tie (equal gap) prefers backward: strict < for forward wins
        fwd_wins = F.col("_fb").isNull() | (
            F.col("_ff").isNotNull() & (_gap("_ff") < _gap("_fb"))
        )
        filled = filled.withColumn(
            "_f", F.when(fwd_wins, F.col("_ff")).otherwise(F.col("_fb"))
        )
    else:
        filled = filled.withColumn(
            "_f", F.col("_fb" if direction == "backward" else "_ff")
        )
    if tolerance_s is not None:
        in_tol = _gap("_f") <= int(tolerance_s) * 1_000_000
        picked = [
            F.when(in_tol, F.col("_f")[c]).alias(f"right_{c}")
            for c in value_cols
        ]
    else:
        picked = [F.col("_f")[c].alias(f"right_{c}") for c in value_cols]
    return filled.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns], *picked
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lo_s: float,
    hi_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """Event-time interval join: every (left, right) pair sharing
    ``keys`` with ``right_ts`` in ``[left_ts + lo_s, left_ts + hi_s)``
    (half-open; ``lo_s`` may be negative for a ±window).

    Spark plans a raw range predicate as a sort-merge join with the
    range as a residual filter — every same-key pair is materialized
    first, which explodes on skewed keys and degenerates to a
    BroadcastNestedLoopJoin when ``keys`` is empty (pure time join).
    The scale path here is the bucketed range join (the same rewrite
    Databricks' range-join hint performs): both sides are bucketed at
    the window's span, each left row joins exactly TWO bucket keys
    (floor((t+lo)/w) and floor((t+hi)/w), w = hi−lo, always adjacent),
    so the join is a plain hash/sort-merge equi-join on
    (keys…, bucket) whose per-key fanout is bounded by temporal
    density, never by key cardinality.  The exact range predicate then
    filters the candidates.  All bucket math is in integer
    microseconds (exact in double below 2^53 µs ≈ year 2255) — no
    float boundary misassignment.

    Reference parity: the reference's only non-equi join is the J1
    theta self-join (PeakMatchRunner.java:23-48), blocked the same way
    (operators/pairs.py); this brings that blocking discipline to the
    time axis, which the engine's transcript tables need (e.g. funnel
    attribution: purchases within 1h of a click)."""
    if hi_s <= lo_s:
        raise ValueError(f"empty interval: [{lo_s}, {hi_s})")
    lo_us = int(round(lo_s * 1e6))
    hi_us = int(round(hi_s * 1e6))
    w_us = hi_us - lo_us

    def _fdiv(x, w: int):
        # exact floor-division of a long column: the numerator is made
        # exactly divisible first, so the double division is exact
        return ((x - F.pmod(x, F.lit(w))) / F.lit(w)).cast("long")

    right_cols = right_cols or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    lus = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rus = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        lus.alias("_lus"),
        # exactly two adjacent buckets: floor((t+lo+w)/w) ==
        # floor((t+lo)/w) + 1, so sequence() never widens
        F.explode(
            F.sequence(_fdiv(lus + lo_us, w_us), _fdiv(lus + hi_us, w_us))
        ).alias("_b"),
    )
    r = right.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        rus.alias("_rus"),
        F.col(right_ts).cast("timestamp").alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        _fdiv(rus, w_us).alias("_b"),
    )
    joined = l.join(r, ["_b", *[f"_k_{k}" for k in keys]], "inner").filter(
        (F.col("_rus") >= F.col("_lus") + lo_us)
        & (F.col("_rus") < F.col("_lus") + hi_us)
    )
    return joined.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        f"{prefix}{right_ts}",
        *[f"{prefix}{c}" for c in right_cols],
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    span_s: float,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    right_cols: list[str] | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """Interval-OVERLAP join: every (left, right) pair sharing ``keys``
    whose half-open time intervals [start, end) intersect — the join
    shape behind concurrency analysis (which sessions ran at the same
    time?), downtime attribution, and meeting-style conflicts.
    Zero-length intervals are empty sets and never match.

    Spark plans the raw ``ls < re AND rs < le`` predicate as a
    sort-merge join with BOTH inequalities residual (or a BNLJ when
    ``keys`` is empty) — every same-key pair materializes.  Here both
    sides bucket their interval at ``span_s`` and explode to the
    buckets they cover, so the join is a plain equi-join on
    (keys…, bucket); the per-row fanout is interval length / span,
    and the exact overlap predicate filters candidates.

    A pair that overlaps shares every bucket in the intersection, so
    naive explode+join would emit it once per shared bucket.  Instead
    of a distinct() (a second shuffle over the match set), ownership
    is decided IN the join condition: the pair matches only in the
    bucket of max(l_start, r_start) — an overlap guarantees both
    sides cover that bucket (max(ls, rs) < min(le, re) ≤ both ends),
    so exactly one bucket key owns each pair and the join stays
    single-pass.  All bucket math in exact integer microseconds.

    ``overlap_us`` (exact int64) is emitted alongside the joined
    columns."""
    if span_s <= 0:
        raise ValueError(f"span_s must be positive, got {span_s}")
    w_us = int(round(span_s * 1e6))

    def _fdiv(x, w: int):
        return ((x - F.pmod(x, F.lit(w))) / F.lit(w)).cast("long")

    right_cols = right_cols or [
        c
        for c in right.columns
        if c not in (*keys, right_start, right_end)
    ]
    ls = F.unix_micros(F.col(left_start).cast("timestamp"))
    le = F.unix_micros(F.col(left_end).cast("timestamp"))
    rs = F.unix_micros(F.col(right_start).cast("timestamp"))
    re = F.unix_micros(F.col(right_end).cast("timestamp"))
    l = (
        left.filter(le > ls)
        .select(
            F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
            *[F.col(k).alias(f"_k_{k}") for k in keys],
            ls.alias("_ls"),
            le.alias("_le"),
            F.explode(
                F.sequence(_fdiv(ls, w_us), _fdiv(le - 1, w_us))
            ).alias("_b"),
        )
    )
    r = (
        right.filter(re > rs)
        .select(
            *[F.col(k).alias(f"_k_{k}") for k in keys],
            rs.alias("_rs"),
            re.alias("_re"),
            *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
            F.explode(
                F.sequence(_fdiv(rs, w_us), _fdiv(re - 1, w_us))
            ).alias("_b"),
        )
    )
    joined = l.join(r, ["_b", *[f"_k_{k}" for k in keys]], "inner").filter(
        (F.col("_ls") < F.col("_re"))
        & (F.col("_rs") < F.col("_le"))
        & (
            F.col("_b")
            == _fdiv(F.greatest(F.col("_ls"), F.col("_rs")), w_us)
        )
    )
    return joined.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[f"{prefix}{c}" for c in right_cols],
        (
            F.least(F.col("_le"), F.col("_re"))
            - F.greatest(F.col("_ls"), F.col("_rs"))
        ).alias("overlap_us"),
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    bucket: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    method: str = "locf",
) -> DataFrame:
    """Time-weighted average per (key, bucket) — TimescaleDB
    ``time_weight(method, ...)`` with both interpolation methods:

    - ``locf``: each observation defines a step segment [its ts, next
      obs ts) over which its value is current (the last observation's
      segment ends at the end of its own bucket — no projection
      beyond the data).  Values are never back-propagated from the
      future into earlier parts of a bucket.
    - ``linear``: the signal is linear between consecutive
      observations; each segment's integral over a bucket
      intersection is the exact trapezoid (w · (v(a)+v(b))/2 with
      v(t) interpolated at the intersection endpoints).  The last
      observation closes no segment (a line needs two points), so a
      key's final partial bucket is covered only up to its last
      sample — same as TimescaleDB.

    Segments are intersected with the tumbling buckets they span, so
    a value carries INTO later buckets it remains current for,
    including buckets with no samples of their own; buckets starting
    before the key's first observation get no row (head coverage is
    unknown — compose with gap_fill for a dense spine).  ``covered_s``
    is the per-bucket covered time.

    One window exchange on the keys; the explode fanout is bounded by
    segment span / bucket width (temporal density, never row count),
    and the final aggregate reuses the window's key distribution."""
    if method not in ("locf", "linear"):
        raise ValueError(
            f"method must be locf | linear, got {method!r}"
        )
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
    base = df.select(*keys, F.col(value_col).alias("v"), tsec.alias("s"))
    if method == "locf":
        bounds = base.select(
            "*",
            F.coalesce(F.lead("s").over(w), own_bucket_end).alias("e"),
            F.col("v").alias("nv"),
        )
    else:
        # a zero-length segment (duplicate ts) has no defined slope —
        # drop it; LOCF keeps them only to preserve its own bucket row
        bounds = base.select(
            "*",
            F.lead("s").over(w).alias("e"),
            F.lead("v").over(w).alias("nv"),
        ).filter(F.col("e").isNotNull() & (F.col("e") > F.col("s")))
    first_b = F.floor(F.col("s") / step).cast("long")
    # end-exclusive: a segment ending exactly on a boundary does not
    # touch the next bucket; degenerate (zero-length) segments keep
    # their own bucket so sequence() never runs backwards
    last_b = F.greatest(
        F.floor((F.col("e") - F.lit(1e-9)) / step).cast("long"), first_b
    )
    seg = bounds.select(
        *keys, "v", "nv", "s", "e",
        F.explode(F.sequence(first_b, last_b)).alias("bi"),
    )
    b_start = F.col("bi").cast("double") * step
    a = F.greatest(F.col("s"), b_start)
    b = F.least(F.col("e"), b_start + step)
    overlap = F.greatest(b - a, F.lit(0.0))
    if method == "locf":
        contrib = F.col("v") * overlap
    else:
        slope = (F.col("nv") - F.col("v")) / (F.col("e") - F.col("s"))
        va = F.col("v") + slope * (a - F.col("s"))
        vb = F.col("v") + slope * (b - F.col("s"))
        contrib = overlap * (va + vb) / 2
    out = (
        seg.select(
            *keys,
            F.timestamp_seconds(F.col("bi") * step).alias("bucket_start"),
            contrib.alias("_c"), overlap.alias("wt"),
        )
        .groupBy(*keys, "bucket_start")
        .agg(
            F.sum("_c").alias("_vw"),
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
