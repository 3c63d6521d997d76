"""State-duration, heartbeat-liveness, and OHLC candlestick aggregates.

The TimescaleDB-Toolkit hyperfunction trio (state_agg, heartbeat_agg,
candlestick_agg) re-expressed as declarative Spark plans — the engine
generalization of the reference's per-band rollups (Util.java:214-251)
from "mean amplitude per frequency band" to "dwell time per state",
"live time per stream", and "first/last/extreme value per bucket"
over keyed turn streams.

Semantics
- ``state_durations``: a row's state holds from its own timestamp
  until the NEXT row of the same key; the final row of a key has no
  observed dwell and contributes null (excluded from sums/averages,
  SQL null semantics on both engine and oracle sides).  An "entry"
  is a run start: the state differs from the previous row's.
- ``heartbeat_uptime``: each row is a liveness beat asserting the
  stream is live for ``liveness_s`` seconds; overlapping assertions
  merge.  With sorted beats that union telescopes to
  ``sum(least(next_ts - ts, L))`` plus ``L`` for the final beat —
  no interval-merge pass needed.
- ``candlestick``: open/close are the value at the earliest/latest
  (ts, *tiebreak) in the bucket — ties broken deterministically so
  results are stable under recomputation; high/low are plain min/max.

Scale notes (100 TB / 10^12 turns):
- each aggregate is ONE window exchange on the stream key (lead/lag
  share a single hash partitioning; Catalyst fuses them into one
  Window operator) followed by one hash-aggregate shuffle with
  map-side partial aggregation — no self-joins, no per-row Python,
  plan-gated in tests/test_stateagg.py.
- candlestick needs no window at all: min_by/max_by on a
  (ts, tiebreak) struct are ordinary decomposable aggregates, so the
  whole OHLC rolls up in one shuffle with map-side combine.
- skew is bounded by the largest single stream (same bound as the
  sessionize/funnel windows); bucket keys add time spreading.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fractional_epoch(col) -> Column:
    """Timestamp → FRACTIONAL epoch seconds (unix_micros/1e6).

    DuckDB's epoch() keeps the sub-second part; a whole-second cast
    truncates gaps and diverges from the oracle exactly at interval
    boundaries (the sessionize 1800 s lesson)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)


def _ordered_window(key_col: str, ts_col: str, tiebreak_cols):
    return Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)


def state_durations(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per state: total observed dwell seconds, run entries, row
    visits, mean dwell.  One window exchange + one agg shuffle."""
    w = _ordered_window(key_col, ts_col, tiebreak_cols)
    tsec = fractional_epoch(ts_col)
    dwell = F.lead(tsec).over(w) - tsec
    prev_state = F.lag(F.col(state_col)).over(w)
    run_start = F.when(
        prev_state.isNull() | (prev_state != F.col(state_col)), 1
    ).otherwise(0)
    staged = df.select(
        F.col(state_col).alias("state"),
        dwell.alias("dwell"),
        run_start.alias("run_start"),
    )
    return staged.groupBy("state").agg(
        F.round(F.sum("dwell") + 1e-9, 2).alias("total_sec"),
        F.sum("run_start").alias("entries"),
        F.count(F.lit(1)).alias("visits"),
        F.round(F.avg("dwell") + 1e-9, 6).alias("mean_dwell"),
    )


def duration_in_buckets(
    df: DataFrame,
    key_col: str,
    state_col: str,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per (key, tumbling bucket, state): LOCF state-occupancy seconds
    — TimescaleDB's interpolated ``duration_in`` rolled into buckets.
    A row's state holds from its own timestamp until the key's next
    row (the final row holds to the end of its own bucket — no
    projection beyond the data), and each holding segment splits
    EXACTLY across every bucket boundary it crosses, so a state
    entered at 13:59 and left at 14:01 contributes 60 s to each hour.

    Same machinery as time_weighted_avg's LOCF integral with the
    constant value replaced by the state label and the final division
    dropped: one window exchange on the key, explode fanout bounded
    by segment span / bucket width, one hash aggregate (which reuses
    the window's key distribution — no second shuffle)."""
    from peakmatch_xcorr_spark.operators.rollup import bucket_seconds

    step = bucket_seconds(bucket)
    w = _ordered_window(key_col, ts_col, tiebreak_cols)
    tsec = fractional_epoch(ts_col)
    own_bucket_end = (F.floor(F.col("s") / step) + 1).cast("double") * step
    bounds = df.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        tsec.alias("s"),
        F.lead(tsec).over(w).alias("_next"),
    ).select(
        key_col, "state", "s",
        F.coalesce(F.col("_next"), own_bucket_end).alias("e"),
    )
    first_b = F.floor(F.col("s") / step).cast("long")
    last_b = F.greatest(
        F.floor((F.col("e") - F.lit(1e-9)) / step).cast("long"), first_b
    )
    seg = bounds.select(
        key_col, "state", "s", "e",
        F.explode(F.sequence(first_b, last_b)).alias("bi"),
    )
    b_start = F.col("bi").cast("double") * step
    overlap = F.greatest(
        F.least(F.col("e"), b_start + step) - F.greatest(F.col("s"), b_start),
        F.lit(0.0),
    )
    return (
        seg.select(
            key_col,
            F.timestamp_seconds(F.col("bi") * step).alias("bucket_start"),
            "state",
            overlap.alias("wt"),
        )
        .groupBy(key_col, "bucket_start", "state")
        .agg(F.round(F.sum("wt") + 1e-9, 3).alias("seconds"))
        .filter(F.col("seconds") > 0)
    )


def heartbeat_uptime(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    liveness_s: float = 1800.0,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per key: merged live seconds, dead seconds between beats,
    gap count, beat count.  One window exchange + one agg shuffle."""
    w = _ordered_window(key_col, ts_col, tiebreak_cols)
    tsec = fractional_epoch(ts_col)
    gap = F.lead(tsec).over(w) - tsec
    lit_l = F.lit(float(liveness_s))
    live = F.when(gap.isNull(), lit_l).otherwise(F.least(gap, lit_l))
    dead = F.when(gap > lit_l, gap - lit_l).otherwise(F.lit(0.0))
    is_gap = F.when(gap > lit_l, 1).otherwise(0)
    staged = df.select(
        F.col(key_col),
        live.alias("live"),
        dead.alias("dead"),
        is_gap.alias("is_gap"),
    )
    return staged.groupBy(key_col).agg(
        F.round(F.sum("live") + 1e-9, 2).alias("uptime_sec"),
        F.round(F.sum("dead") + 1e-9, 2).alias("dead_sec"),
        F.sum("is_gap").alias("n_gaps"),
        F.count(F.lit(1)).alias("beats"),
    )


def candlestick(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per (group, tumbling bucket): open/high/low/close of
    ``value_col`` plus the row count.  No window functions — min_by/
    max_by are decomposable aggregates, so the whole OHLC is ONE
    shuffle with map-side combine (partial aggregate plan-gated).

    Plan shape depends on the ordering key: without tiebreaks the key
    is a primitive epoch-micros long, whose fixed-width aggregation
    buffer qualifies for HashAggregate; a (ts, *tiebreak) struct key
    forces SortAggregate (Spark hash-agg buffers must be fixed-width)
    — still one exchange with map-side partials, but pay a map-side
    sort.  Pass tiebreaks only when ts can collide within a
    (group, bucket)."""
    if tiebreak_cols:
        order_key = F.struct(
            F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
        )
    else:
        order_key = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucketed = df.withColumn(
        "bucket_start", F.window(F.col(ts_col), bucket).start
    )
    return bucketed.groupBy(*group_cols, "bucket_start").agg(
        F.min_by(F.col(value_col), order_key).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), order_key).alias("close"),
        F.count(F.lit(1)).alias("turns"),
    )


def largest_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    k: int = 3,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per key, the k LARGEST silent intervals between consecutive
    events, with their bounds — the outage report behind
    ``heartbeat_uptime``'s aggregate dead-time number (ops wants
    WHICH gaps, not just their sum).

    One lead() on the shared ordered window, then a per-key top-k
    window on the gap — both reuse the same key exchange.  Gaps are
    exact int64 microseconds; ranking ties break on gap_start so the
    k-th place is deterministic cross-engine."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = _ordered_window(key_col, ts_col, tiebreak_cols)
    nxt = F.lead(F.col(ts_col)).over(w)
    gaps = df.select(
        F.col(key_col),
        F.col(ts_col).alias("gap_start"),
        nxt.alias("gap_end"),
        (
            F.unix_micros(nxt.cast("timestamp"))
            - F.unix_micros(F.col(ts_col).cast("timestamp"))
        ).alias("gap_us"),
    ).filter(F.col("gap_end").isNotNull())
    rank_w = Window.partitionBy(key_col).orderBy(
        F.col("gap_us").desc(), F.col("gap_start").asc()
    )
    return (
        gaps.withColumn("gap_rank", F.row_number().over(rank_w))
        .filter(F.col("gap_rank") <= k)
        .select(key_col, "gap_rank", "gap_start", "gap_end", "gap_us")
    )
