"""merge_upsert (operators/merge.py): SQL MERGE semantics as
file-level copy-on-write — matched keys replaced, new keys appended,
untouched files carried by manifest record, old versions still
readable."""

import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.merge import merge_upsert
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable


@pytest.fixture()
def seeded(spark, tmp_path):
    t = WarehouseTable(str(tmp_path), "kv")
    base = spark.range(10_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    # range layout on k -> tight per-file k bounds -> prunable merge
    t.append(base.repartitionByRange(16, "k"))
    return t


def test_upsert_updates_and_inserts(spark, seeded):
    t = seeded
    updates = spark.createDataFrame(
        [(100, 999.0), (101, 998.0), (20_000, 1.5)], "k long, v double"
    )
    snap = merge_upsert(t, spark, updates, ["k"])
    got = {r["k"]: r["v"] for r in t.read(spark).filter(
        F.col("k").isin(100, 101, 102, 20_000)).collect()}
    assert got == {100: 999.0, 101: 998.0, 102: 102 % 7, 20_000: 1.5}
    assert t.read(spark).count() == 10_001  # 2 updated, 1 inserted
    # COW stayed proportional to the delta: most files carried verbatim
    assert snap.metrics["carried_files"] >= 14
    assert snap.metrics["merge_affected_files"] <= 2


def test_old_version_still_reads_pre_merge_data(spark, seeded):
    t = seeded
    v0 = t.current_version()
    merge_upsert(
        t, spark,
        spark.createDataFrame([(0, -1.0)], "k long, v double"), ["k"],
    )
    assert t.read(spark, version=v0).filter("k = 0").first()["v"] == 0.0
    assert t.read(spark).filter("k = 0").first()["v"] == -1.0


def test_duplicate_update_keys_rejected(spark, seeded):
    dup = spark.createDataFrame([(1, 1.0), (1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(seeded, spark, dup, ["k"])


def test_non_key_prune_col_rejected(spark, seeded):
    u = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="must be one of the merge keys"):
        merge_upsert(seeded, spark, u, ["k"], prune_col="v")


def test_empty_delta_is_noop_and_empty_table_appends(spark, seeded, tmp_path):
    t = seeded
    v = t.current_version()
    snap = merge_upsert(
        t, spark, spark.createDataFrame([], "k long, v double"), ["k"]
    )
    assert snap.version == v and t.current_version() == v
    fresh = WarehouseTable(str(tmp_path), "fresh")
    merge_upsert(
        fresh, spark, spark.createDataFrame([(1, 1.0)], "k long, v double"), ["k"]
    )
    assert fresh.read(spark).count() == 1


def test_composite_key_merge(spark, tmp_path):
    t = WarehouseTable(str(tmp_path), "composite")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0)],
        "k long, s string, v double",
    )
    t.append(base.repartition(2))
    u = spark.createDataFrame([(1, "b", 9.0), (3, "c", 4.0)],
                              "k long, s string, v double")
    merge_upsert(t, spark, u, ["k", "s"])
    got = {(r["k"], r["s"]): r["v"] for r in t.read(spark).collect()}
    assert got == {(1, "a"): 1.0, (1, "b"): 9.0, (2, "a"): 3.0, (3, "c"): 4.0}


# ---- delete_rows ----


def test_delete_removes_only_matched_keys_and_carries_files(spark, seeded):
    from peakmatch_xcorr_spark.operators.merge import delete_rows

    t = seeded
    doomed = spark.createDataFrame([(5,), (6,), (7,)], "k long")
    snap = delete_rows(t, spark, doomed, ["k"])
    left = t.read(spark)
    assert left.count() == 9_997
    assert left.filter(F.col("k").isin(5, 6, 7)).count() == 0
    # COW proportional to the key set: one file holds keys 5-7
    assert snap.metrics["carried_files"] >= 15
    assert snap.metrics["delete_affected_files"] <= 1
    assert snap.metrics["delete_rows_before_rewrite"] >= 3


def test_delete_old_version_still_sees_rows(spark, seeded):
    from peakmatch_xcorr_spark.operators.merge import delete_rows

    t = seeded
    v0 = t.current_version()
    delete_rows(t, spark, spark.createDataFrame([(0,)], "k long"), ["k"])
    assert t.read(spark, version=v0).filter("k = 0").count() == 1
    assert t.read(spark).filter("k = 0").count() == 0


def test_delete_noop_on_empty_keys_and_missing_keys(spark, seeded):
    from peakmatch_xcorr_spark.operators.merge import delete_rows

    t = seeded
    v0 = t.current_version()
    empty = spark.createDataFrame([], "k long")
    assert delete_rows(t, spark, empty, ["k"]).version == v0
    # keys present in no file: bounds pruning selects nothing -> no-op
    absent = spark.createDataFrame([(123_456,)], "k long")
    assert delete_rows(t, spark, absent, ["k"]).version == v0
    assert t.read(spark).count() == 10_000


def test_delete_duplicate_keys_harmless_and_composite(spark, tmp_path):
    from peakmatch_xcorr_spark.operators.merge import delete_rows

    t = WarehouseTable(str(tmp_path), "ck")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0)],
        "k long, s string, v double",
    )
    t.append(base)
    dup = spark.createDataFrame([(1, "b"), (1, "b")], "k long, s string")
    delete_rows(t, spark, dup, ["k", "s"])
    got = {(r["k"], r["s"]) for r in t.read(spark).collect()}
    assert got == {(1, "a"), (2, "a")}


def test_delete_whole_table_leaves_typed_empty_read(spark, tmp_path):
    from peakmatch_xcorr_spark.operators.merge import delete_rows

    t = WarehouseTable(str(tmp_path), "kv2")
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    delete_rows(t, spark, spark.createDataFrame([(1,), (2,)], "k long"), ["k"])
    out = t.read(spark)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["k", "v"]
