"""Z-order clustering + manifest-bounds file pruning
(operators/layout.py): a 2-D range query over a z-ordered table must
touch far fewer files than over a time-range layout, with identical
results — the 100 TB scan-avoidance primitive."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.layout import (
    prune_files,
    pruned_read,
    zorder_layout,
)
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable

BASE = dt.datetime(2025, 1, 1)
SPAN_S = 30 * 86400  # 30 days
N_USERS = 500


@pytest.fixture(scope="module")
def frame(spark):
    # deterministic 2-D scatter: every (user, time) region populated
    return (
        spark.range(120_000)
        .select(
            (F.col("id") % N_USERS).cast("int").alias("user_id"),
            (
                F.lit(BASE)
                + F.make_interval(secs=(F.col("id") * 7919) % SPAN_S)
            ).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def tables(spark, frame, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("layout_wh"))
    t_time = WarehouseTable(root, "events_by_time")
    t_time.append(frame.repartitionByRange(64, "ts"))
    t_z = WarehouseTable(root, "events_zorder")
    t_z.append(zorder_layout(frame, "user_id", "ts", target_files=64))
    return t_time, t_z


def _checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    ).first()
    return r["n"], float(r["s"] or 0.0)


def test_zorder_prunes_2d_query_time_layout_cannot(spark, frame, tables):
    t_time, t_z = tables
    u_lo, u_hi = 100, 110
    ts_lo, ts_hi = BASE + dt.timedelta(days=5), BASE + dt.timedelta(days=20)
    ranges = {"user_id": (u_lo, u_hi), "ts": (ts_lo, ts_hi)}
    row_filter = (
        F.col("user_id").between(u_lo, u_hi) & F.col("ts").between(ts_lo, ts_hi)
    )
    expected = _checksum(frame.filter(row_filter))
    assert expected[0] > 0

    results = {}
    for name, t in (("time", t_time), ("zorder", t_z)):
        df, stats = pruned_read(t, spark, ranges)
        assert df is not None
        assert _checksum(df.filter(row_filter)) == expected
        assert stats["files_total"] >= 32
        results[name] = stats["files_read"]
    # the time layout prunes the 15-day window (~half the files) but
    # cannot prune on user_id; the z-layout prunes BOTH dimensions
    assert results["zorder"] * 2 <= results["time"], results


def test_time_only_query_still_prunes_on_zorder_table(spark, frame, tables):
    _, t_z = tables
    ts_lo, ts_hi = BASE + dt.timedelta(days=2), BASE + dt.timedelta(days=4)
    ranges = {"ts": (ts_lo, ts_hi)}
    row_filter = F.col("ts").between(ts_lo, ts_hi)
    df, stats = pruned_read(t_z, spark, ranges)
    assert _checksum(df.filter(row_filter)) == _checksum(frame.filter(row_filter))
    # z-interleaving keeps coarse time locality: a 2/30 window must
    # still skip most files (not as tightly as a pure time sort)
    assert stats["files_read"] < stats["files_total"]


def test_boundary_equal_file_is_kept(spark, tmp_path):
    """A file whose bound EQUALS a query endpoint contains matching
    rows and must be kept, in BOTH directions and at microsecond
    precision.  Manifest bounds are tz-aware UTC isoformat strings
    while endpoints are naive datetimes — raw string comparison
    misorders equal instants ('+00:00' vs '.000000'), which dropped
    the hi-boundary file before _norm parsed both sides back to
    UTC-naive datetimes (found by review, reproduced live)."""
    t = WarehouseTable(str(tmp_path), "boundary")
    rows = [
        (1, dt.datetime(2025, 6, 1, 12, 0, 0)),
        (2, dt.datetime(2025, 6, 1, 13, 0, 0, 500000)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    t.append(df.repartition(1))
    # hi endpoint == file min bound
    paths, total = prune_files(t, {"ts": (None, dt.datetime(2025, 6, 1, 12))})
    assert total == 1 and len(paths) == 1
    # lo endpoint == file max bound (with non-zero microseconds)
    paths, _ = prune_files(
        t, {"ts": (dt.datetime(2025, 6, 1, 13, 0, 0, 500000), None)}
    )
    assert len(paths) == 1
    # strictly outside on either side -> pruned
    paths, _ = prune_files(t, {"ts": (None, dt.datetime(2025, 6, 1, 11))})
    assert paths == []
    paths, _ = prune_files(
        t, {"ts": (dt.datetime(2025, 6, 1, 13, 0, 0, 500001), None)}
    )
    assert paths == []


def test_missing_bounds_and_nulls_are_conservative(spark, tmp_path):
    t = WarehouseTable(str(tmp_path), "nullable")
    df = spark.createDataFrame(
        [(None, 1.0), (5, 2.0)], "user_id int, value double"
    )
    t.append(df.repartition(1))
    # query on a column with stats: file kept when intersecting
    paths, _ = prune_files(t, {"user_id": (1, 10)})
    assert len(paths) == 1
    # query on a column the manifest has no bounds for -> kept
    paths, _ = prune_files(t, {"no_such_col": (0, 1)})
    assert len(paths) == 1
    # all-null layout key: zorder_layout degrades to a no-op, not a crash
    all_null = spark.createDataFrame([(None, 1.0)], "user_id int, value double")
    assert zorder_layout(all_null, "user_id", "value").count() == 1


def test_compact_with_zorder_restores_pruning(spark, frame, tmp_path):
    """Appends arrive in arrival order and erode layout; compaction
    with zorder_keys must restore 2-D pruning while preserving rows
    exactly."""
    t = WarehouseTable(str(tmp_path), "eroded")
    # arrival-ordered ingest: no layout at all (each file spans both
    # key ranges almost fully)
    t.append(frame.repartition(64))
    ts_lo, ts_hi = BASE + dt.timedelta(days=5), BASE + dt.timedelta(days=10)
    q = {"user_id": (100, 110), "ts": (ts_lo, ts_hi)}
    row_filter = (
        F.col("user_id").between(100, 110) & F.col("ts").between(ts_lo, ts_hi)
    )
    paths_before, total = prune_files(t, q)
    n_before, s_before = _checksum(t.read(spark))
    snap = t.compact(spark, target_partitions=64,
                     zorder_keys=("user_id", "ts"))
    assert snap.metrics["zorder_keys"] == ["user_id", "ts"]
    paths_after, total_after = prune_files(t, q)
    # rows identical, pruning dramatically better than arrival order
    n_after, s_after = _checksum(t.read(spark))
    assert (n_before, round(s_before, 6)) == (n_after, round(s_after, 6))
    assert len(paths_before) > total * 0.9  # arrival order: ~no pruning
    assert len(paths_after) < total_after * 0.5
    # and the pruned scan is still lossless for the query
    df, stats = pruned_read(t, spark, q)
    assert stats["files_read"] == len(paths_after)
    assert _checksum(df.filter(row_filter)) == _checksum(
        frame.filter(row_filter)
    )
