"""Multi-dimensional data layout (Z-order clustering) + manifest-bounds
file pruning for the parquet warehouse.

At 100 TB the fastest scan is the one never issued.  A table
range-laid-out on ``ts`` prunes time predicates well but reads EVERY
file for a ``conv_id``/``user_id`` predicate — per-file min/max of an
unclustered column spans the whole domain, so nothing skips.
Interleaving the bits of two clustering keys (Morton / Z-curve) makes
the per-file footer bounds tight in BOTH dimensions, so a 2-D range
query touches O(box perimeter) files instead of all of them.  This is
the same layout primitive as Iceberg's/Delta's ``OPTIMIZE ZORDER BY``,
re-expressed for this engine:

- the z-value is pure column expressions (5 shift/mask rounds per key,
  whole-stage codegen — no UDF, no Python);
- clustering is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``
  so each output file owns a contiguous z-range;
- pruning needs NO new metadata: the warehouse already records
  per-file column bounds from parquet footers
  (sources/warehouse.py:_footer_bounds), and ``pruned_read`` walks the
  snapshot manifest driver-side — zero Spark jobs to plan the scan,
  the Iceberg-manifest pattern.

Key domains: each key is normalized onto the SAME 20-bit grid from
its (min, max) — one agg over the frame being laid out (a layout job
rewrites the data anyway, the agg is noise).  Equal bit budgets
matter: raw interleave of mismatched ranges degenerates to a sort by
the wider key (see ``zvalue_expr``).  Quantization only shapes
LOCALITY; correctness of pruning always rests on the true per-file
bounds of the original columns, so a degenerate quantization can cost
speed, never rows.  Timestamp keys are auto-converted to epoch
seconds (through ``timestamp`` — NTZ forbids a direct long cast).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable

# classic 32->64 bit-spread rounds: after them, input bit i sits at
# output bit 2i (even positions); the partner key shifts left 1 into
# the odd positions.  Inputs are pre-masked to 31 bits so the merged
# value stays below 2^62 — never touches the sign bit.
_SPREAD_ROUNDS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(c):
    x = c.bitwiseAND(F.lit(0x7FFFFFFF))
    for sh, mask in _SPREAD_ROUNDS:
        x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(F.lit(mask))
    return x


def _as_long(df: DataFrame, col: str):
    """Numeric view of a clustering key: timestamps -> epoch seconds
    (via timestamp: NTZ -> long directly is forbidden in Spark 4)."""
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt.startswith("timestamp"):
        return c.cast("timestamp").cast("long")
    return c.cast("long")


def zvalue_expr(a, b, a_min: int, a_range: int, b_min: int, b_range: int,
                bits: int = 20):
    """Interleaved Morton code of two keys, each NORMALIZED onto the
    same ``bits``-wide grid: ``floor((x - min) * (2^bits - 1) / range)``.

    Equal bit budgets are load-bearing, not cosmetic: interleaving raw
    values whose ranges differ (9-bit user ids vs 22-bit epoch offsets)
    puts ONLY the wide key's bits in the high z-positions, and a range
    split on z degenerates to a plain sort by the wide key — measured
    as zero pruning on the narrow key before normalization.

    The float multiply mis-buckets by at most 1 grid cell at 2^53-scale
    ranges — locality only; pruning correctness always rests on the
    true per-file bounds of the original columns."""
    top = (1 << bits) - 1

    def q(c, mn, rng):
        if rng <= 0:
            return F.lit(0).cast("long")
        return F.floor((c - F.lit(mn)) * F.lit(top / rng)).cast("long")

    qa, qb = q(a, a_min, a_range), q(b, b_min, b_range)
    return _spread_bits(qa).bitwiseOR(F.shiftleft(_spread_bits(qb), 1))


def zorder_layout(
    df: DataFrame, col_a: str, col_b: str, target_files: int = 32
) -> DataFrame:
    """Re-cluster ``df`` along the Z-curve of (col_a, col_b): each of
    the ``target_files`` output partitions owns a contiguous z-range,
    so every file's footer bounds are tight in both keys.  Null keys
    sort first (one cluster) — they can't tighten bounds but don't
    break them."""
    a, b = _as_long(df, col_a), _as_long(df, col_b)
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b)
    ).first()
    if lo_a is None or lo_b is None:  # all-null key: nothing to cluster
        return df
    z = zvalue_expr(
        a, b,
        int(lo_a), int(hi_a) - int(lo_a),
        int(lo_b), int(hi_b) - int(lo_b),
    )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def _norm(v):
    """Canonical comparison form for a bound / range endpoint.

    Timestamp bounds reach the manifest as TZ-AWARE ISO strings
    (pyarrow returns UTC-aware datetimes for Spark's TIMESTAMP_MICROS
    stats), while query endpoints are naive datetimes — comparing the
    raw isoformat strings lexicographically misorders EQUAL instants
    ('+00:00' suffix vs '.000000' padding), which wrongly excludes
    boundary-touching files and silently drops rows.  So: parse
    anything datetime-ish back to a datetime and compare in UTC-naive
    form.  Naive inputs are TAKEN AS UTC — the engine pins
    spark.sql.session.timeZone=UTC (session.get_spark), so collected
    timestamps and footer stats already share that frame."""
    if isinstance(v, str) and len(v) >= 19 and v[10:11] == "T":
        try:
            v = _dt.datetime.fromisoformat(v)
        except ValueError:
            return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    return v


def prune_files(
    table: WarehouseTable, ranges: dict[str, tuple], version: int | None = None
) -> tuple[list[str], int]:
    """Manifest-bounds file pruning: relative paths of the snapshot's
    files whose per-column bounds intersect EVERY ``col: (lo, hi)``
    range (either endpoint None = unbounded).  Conservative: a
    non-empty file lacking bounds for a queried column is kept.
    Driver-side manifest walk only — no Spark job, no file opens.
    Returns (paths_to_read, files_total)."""
    v = version if version is not None else table.current_version()
    if v is None:
        return [], 0
    files = table.snapshot(v).files
    keep = []
    for f in files:
        if f.get("rows", 1) == 0:
            continue
        hit = True
        for col, (lo, hi) in ranges.items():
            b = f.get("bounds", {}).get(col)
            if b is None:
                continue  # no stats -> cannot exclude
            if (hi is not None and _norm(b[0]) > _norm(hi)) or (
                lo is not None and _norm(b[1]) < _norm(lo)
            ):
                hit = False
                break
        if hit:
            keep.append(f["path"])
    return keep, sum(1 for f in files if f.get("rows", 1) > 0)


def pruned_read(
    table: WarehouseTable,
    spark: SparkSession,
    ranges: dict[str, tuple],
    version: int | None = None,
) -> tuple[DataFrame | None, dict]:
    """Read only the files that can contain rows in ``ranges`` (the
    caller still applies the row-level filter — bounds prune files,
    not rows).  Returns (df_or_None, stats); df is None when no file
    intersects."""
    paths, total = prune_files(table, ranges, version)
    stats = {"files_total": total, "files_read": len(paths)}
    return table.read_paths(spark, paths), stats
