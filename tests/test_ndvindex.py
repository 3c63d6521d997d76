"""Per-file HLL manifest stats: metadata-only NDV estimates."""

from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.operators.ndvindex import (
    approx_distinct_from_manifest,
    build_ndv_index,
    hll_estimate_from_registers,
)
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable


@pytest.fixture()
def table(spark, tmp_path):
    t = WarehouseTable(str(tmp_path), "t")
    # overlapping key ranges across two files: distinct counts don't
    # add across files, registers must still merge exactly
    df1 = spark.range(0, 800).selectExpr(
        "concat('u', id % 500) AS user", "id AS payload"
    )
    df2 = spark.range(0, 800).selectExpr(
        "concat('u', 300 + (id % 500)) AS user", "id AS payload"
    )
    t.append(df1.repartition(2), job_id="a")
    t.append(df2.repartition(2), job_id="b")
    return t


def test_manifest_ndv_within_rsd_and_metadata_only(spark, table):
    snap = build_ndv_index(table, spark, "user", job_id="ndx")
    assert snap.operation == "index"
    # metadata-only: row count unchanged, same data files
    assert table.count_rows() == 1600
    res = approx_distinct_from_manifest(table, "user")
    assert res["complete"] and res["covered_files"] == res["total_files"]
    true = table.read(spark).select("user").distinct().count()  # 800
    assert abs(res["est_distinct"] - true) / true <= 3 * (1.04 / 32)


def test_partial_coverage_is_reported_not_silent(spark, table):
    build_ndv_index(table, spark, "user")
    # post-index append: new file has no registers
    table.append(
        spark.range(5).selectExpr("concat('z', id) AS user", "id AS payload"),
        job_id="late",
    )
    res = approx_distinct_from_manifest(table, "user")
    assert not res["complete"]
    assert res["covered_files"] < res["total_files"]


def test_registers_merge_exactly_like_the_tier(spark, table):
    """Manifest registers max-merged across files must equal the tier
    sketch built over the whole table — same draw, same registers."""
    import base64

    from peakmatch_xcorr_spark.operators.ndvindex import _KEY
    from peakmatch_xcorr_spark.operators.sketches import (
        _HLL_M,
        hll_register_tier,
    )

    build_ndv_index(table, spark, "user")
    snap = table.snapshot(table.current_version())
    merged = np.zeros(_HLL_M, dtype=np.uint8)
    for f in snap.files:
        regs = np.frombuffer(
            base64.b64decode(f[_KEY]["user"]), dtype=np.uint8
        )
        np.maximum(merged, regs, out=merged)
    tier = hll_register_tier(
        table.read(spark).selectExpr(
            "user", "timestamp('2024-01-01') AS ts"
        ),
        "user", "ts", "3650 days",
    ).collect()
    sparse = np.zeros(_HLL_M, dtype=np.uint8)
    for r in tier:
        sparse[r["idx"]] = r["r"]
    assert np.array_equal(merged, sparse)
    # and the estimate formulas agree on the same registers
    est = hll_estimate_from_registers(merged)
    res = approx_distinct_from_manifest(table, "user")
    assert res["est_distinct"] == est


def test_subset_paths_estimate_composes(spark, table):
    """Registers compose to any pruned file subset: estimating over
    one append's files alone must track that file set's true distinct
    (~500), not the table's (~800)."""
    build_ndv_index(table, spark, "user")
    # files from the first append: job 'a' wrote version 1
    v1_paths = [f["path"] for f in table.snapshot(1).files]
    res = approx_distinct_from_manifest(table, "user", paths=v1_paths)
    assert res["complete"]
    assert abs(res["est_distinct"] - 500) / 500 <= 3 * (1.04 / 32)
    full = approx_distinct_from_manifest(table, "user")
    assert res["est_distinct"] < full["est_distinct"]
