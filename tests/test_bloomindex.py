"""Per-file Bloom-filter index (operators/bloomindex.py): an equality
point lookup on an UNCLUSTERED high-cardinality key must skip almost
every file once indexed, with zero skipped rows — the secondary-index
complement to the min/max bounds pruning of test_layout.py."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.bloomindex import (
    _build_bitset,
    bloom_may_contain,
    build_bloom_index,
    point_lookup,
    prune_files_eq,
)
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable

N_CONVS = 4000
TURNS_PER = 30
N_FILES = 32


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom_wh"))
    t = WarehouseTable(root, "turns")
    # ts-ordered layout: conv ids interleave across ALL files, so
    # bounds pruning on conv_id is provably useless (every file spans
    # the id domain) and any skipping comes from the bloom alone
    df = spark.range(N_CONVS * TURNS_PER).select(
        F.format_string("conv%05d", (F.col("id") % N_CONVS)).alias("conv_id"),
        (F.col("id") / N_CONVS).cast("long").alias("turn_idx"),
        (F.col("id") * 13 % 101).cast("double").alias("value"),
    )
    t.append(df.repartitionByRange(N_FILES, "turn_idx"))
    return t


def test_bitset_basic_membership_and_fpp():
    vals = np.array([f"conv{i:05d}" for i in range(2000)], dtype=object)
    bits, m, k, ndv = _build_bitset(vals, fpp=0.01)
    assert ndv == 2000 and m >= ndv  # sized from observed ndv
    import base64

    rec = {"m": m, "k": k, "b64": base64.b64encode(bits).decode()}
    # zero false negatives, by construction
    assert all(bloom_may_contain(rec, v) for v in vals)
    # false-positive rate near target: 3x headroom kills flakes while
    # still catching a broken hash (which reads ~100% positive)
    probes = [f"absent{i:06d}" for i in range(5000)]
    fp = sum(bloom_may_contain(rec, p) for p in probes) / len(probes)
    assert fp < 0.03, fp


def test_index_commit_is_metadata_only(table, spark):
    v0 = table.current_version()
    files0 = {f["path"] for f in table.snapshot(v0).files}
    snap = build_bloom_index(table, spark, "conv_id", fpp=0.01)
    assert snap.operation == "index"
    assert {f["path"] for f in snap.files} == files0  # no data rewrite
    assert snap.metrics["files_indexed"] == len(files0)
    assert all("conv_id" in f.get("blooms", {}) for f in snap.files)
    # pinned reader on v0 unaffected
    assert table.count_rows(v0) == table.count_rows(snap.version)


def test_point_lookup_skips_files_and_drops_no_rows(table, spark):
    if table.snapshot(table.current_version()).operation != "index":
        build_bloom_index(table, spark, "conv_id", fpp=0.01)
    # ~TURNS_PER/N rows per file per conv -> each conv lives in every
    # file's ROW range but only a few files' bloom-positive set
    target = "conv01234"
    paths, total = prune_files_eq(table, "conv_id", target)
    # range-partitioning 30 distinct turn_idx values into 32 buckets
    # leaves a couple of empty files; prune_files_eq counts non-empty
    nonempty = sum(
        1
        for f in table.snapshot(table.current_version()).files
        if f.get("rows", 1) > 0
    )
    assert total == nonempty >= N_FILES - 4
    # every conv appears in every file here (ids cycle mod N_CONVS),
    # so bloom keeps all files for a PRESENT key -- the skipping test
    # is the absent key below; this asserts zero false negatives
    df, stats = point_lookup(table, spark, "conv_id", target)
    assert df is not None
    assert df.count() == TURNS_PER
    # absent key: proven absent from every file, no scan issued at all
    paths_abs, _ = prune_files_eq(table, "conv_id", "conv99999")
    # fpp=0.01 over 32 files -> P(>=5 false positives) ~ 1e-8
    assert len(paths_abs) <= 4, paths_abs


@pytest.fixture(scope="module")
def clustered_table(spark, tmp_path_factory):
    """conv-clustered layout: each conv touches exactly one file, so a
    present-key lookup must read ~1 file — the realistic shape after
    Z-order/compaction maintenance."""
    root = str(tmp_path_factory.mktemp("bloom_wh_clustered"))
    t = WarehouseTable(root, "turns_c")
    df = spark.range(N_CONVS * TURNS_PER).select(
        F.format_string("conv%05d", (F.col("id") % N_CONVS)).alias("conv_id"),
        (F.col("id") / N_CONVS).cast("long").alias("turn_idx"),
    )
    t.append(df.repartition(N_FILES, "conv_id"))  # hash-clustered
    build_bloom_index(t, spark, "conv_id", fpp=0.01)
    return t


def test_present_key_reads_single_file_when_clustered(clustered_table, spark):
    df, stats = point_lookup(clustered_table, spark, "conv_id", "conv00042")
    assert stats["files_total"] == N_FILES
    # hash-clustered: the key's rows live in ONE file; blooms of the
    # other 31 must prove absence (false positives make this flaky at
    # ~31*0.01 -> allow 2)
    assert stats["files_read"] <= 3, stats
    assert df.count() == TURNS_PER


def test_unindexed_and_later_appends_are_conservative(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom_wh2"))
    t = WarehouseTable(root, "turns2")
    # ids cycle mod 50 so BOTH files span the same [c000, c049] bounds
    # range -- any pruning here could only come from a bloom
    df = spark.range(100).select(
        F.format_string("c%03d", F.col("id") % 50).alias("conv_id")
    )
    t.append(df.coalesce(2))
    # no index yet: everything kept
    paths, total = prune_files_eq(t, "conv_id", "c001")
    assert len(paths) == total == 2
    build_bloom_index(t, spark, "conv_id")
    # post-index append INSIDE the same key range (c000x..c009x sorts
    # within [c000, c049]): the new file lacks a bloom -> kept even for
    # a value its bounds admit, while the indexed files are pruned by
    # their blooms alone (their bounds also admit the probe value)
    t.append(
        spark.range(10).select(
            F.format_string("c%03dx", F.col("id")).alias("conv_id")
        ).coalesce(1)
    )
    paths, total = prune_files_eq(t, "conv_id", "c005zz")
    assert total == 3 and len(paths) == 1  # indexed pruned, new kept
    df2, stats = point_lookup(t, spark, "conv_id", "c003x")
    assert df2.count() == 1


def test_rejects_unsupported_key_types(table, spark):
    with pytest.raises(ValueError, match="string/integer"):
        build_bloom_index(table, spark, "value")
    with pytest.raises(ValueError, match="not in table"):
        build_bloom_index(table, spark, "nope")


def test_integer_key_roundtrip(spark, tmp_path_factory):
    """CAST(long AS STRING) at build must meet str(int) at probe."""
    root = str(tmp_path_factory.mktemp("bloom_wh3"))
    t = WarehouseTable(root, "ints")
    t.append(
        spark.range(1000).select(F.col("id").alias("user_id")).coalesce(4)
    )
    build_bloom_index(t, spark, "user_id")
    df, stats = point_lookup(t, spark, "user_id", 123)
    assert df.count() == 1
    paths, _ = prune_files_eq(t, "user_id", 10**9)
    assert len(paths) == 0  # absent int proven absent


def test_sizing_formula_matches_theory():
    for n, p in [(100, 0.01), (10_000, 0.001), (1, 0.01)]:
        from peakmatch_xcorr_spark.operators.bloomindex import _size_for

        m, k = _size_for(n, p)
        want = -n * math.log(p) / (math.log(2) ** 2)
        assert m >= min(max(want, 64), 1 << 23) - 1
        assert 1 <= k <= 16
