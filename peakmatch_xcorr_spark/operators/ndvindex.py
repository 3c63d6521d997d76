"""Per-file HLL register stats in the snapshot manifest: approximate
COUNT(DISTINCT key) answered from METADATA only.

Iceberg ships per-file NDV sketches as puffin theta-sketch stats; the
same idea here with the engine's own register sketch
(operators/sketches.py): `build_ndv_index` attaches each data file's
1024-register HLL (of the md5 60-bit draw) to its manifest record in
a metadata-only commit, and `approx_distinct_from_manifest` answers
"how many distinct keys does this snapshot hold" by max-merging the
per-file register arrays driver-side — zero data files opened,
O(files × 1024 small ints) work.

Why registers and not a per-file ndv NUMBER: distinct counts do not
add across files (the same key lives in many files), but registers
MERGE exactly (max), so the per-file stat composes to any subset of
files — a snapshot, a partition-pruned file list, a time range —
without double counting.  The bloom index (bloomindex.py) answers
"which files can contain key X"; this answers "how many keys" — the
two manifest stats a planner wants before choosing a join strategy
(broadcast vs shuffle is exactly an NDV call).

Register values are ≤ 51 (6 bits), stored as a base64 bytes array of
the dense 1024-register table (~1.4 KB/file raw) on the same
``blooms``-style per-file record; files appended after the index
commit simply lack registers and make the estimate PARTIAL — the
reader reports which, never silently undercounts as if complete.
"""

from __future__ import annotations

import base64
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.sketches import (
    _HLL_M,
    _HLL_SCALE,
    HLL_ALPHA,
    HLL_P,
)
from peakmatch_xcorr_spark.sources.warehouse import Snapshot, WarehouseTable

_KEY = "ndv_regs"


def _register_table(values: pd.Series) -> bytes:
    """Dense 1024-register table of a file's key values (md5 60-bit
    draw, same idx/rho derivation as sketches.hll_register_tier —
    the tiers and the manifest stats merge with each other).

    Per-value hashlib here is a deliberate exception to the
    no-row-Python rule: sharing the tier's md5 draw is what makes
    the manifest registers mergeable with every other register frame
    in the engine, and the index build is a one-off maintenance pass
    (the bloom index pays the same class of cost), never a query-path
    operator."""
    import hashlib

    regs = np.zeros(_HLL_M, dtype=np.uint8)
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = h % _HLL_M
        w = h >> HLL_P
        rho = _HLL_SCALE - w.bit_length() if w else _HLL_SCALE - 1
        if rho > regs[idx]:
            regs[idx] = rho
    return regs.tobytes()


def hll_estimate_from_registers(regs: np.ndarray) -> float:
    """The same fixed-order estimate as sketches.hll_estimate, on a
    dense register array: exact int denominator Σ 2^(SCALE−r) with
    absent registers at r=0, linear counting below 2.5m."""
    m = _HLL_M
    r = regs.astype(np.int64)
    s_int = int((1 << (_HLL_SCALE - r)).sum())
    raw = (HLL_ALPHA * m * m * float(1 << _HLL_SCALE)) / float(s_int)
    v = int((r == 0).sum())
    if raw <= 2.5 * m and v > 0:
        return round(m * np.log(m / v) + 1e-9, 6)
    return round(raw + 1e-9, 6)


def build_ndv_index(
    table: WarehouseTable,
    spark: SparkSession,
    col: str,
    job_id: str | None = None,
) -> Snapshot:
    """Attach per-file HLL registers for ``col`` to the current
    snapshot's file records; metadata-only commit (op="index"), same
    contract as build_bloom_index: existing stats on a record are
    kept, readers on older snapshots unaffected."""
    cur = table.current_version()
    if cur is None:
        raise ValueError(f"table {table.dir!r} has no snapshots to index")
    snap = table.snapshot(cur)
    df = table.read(spark, version=cur)
    if col not in dict(df.dtypes):
        raise ValueError(f"column {col!r} not in table {table.dir!r}")

    def _per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"path": [pdf["f"].iloc[0]], "regs": [_register_table(pdf["v"])]}
        )

    rows = (
        df.select(
            F.input_file_name().alias("f"),
            F.col(col).cast("string").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("f")
        .applyInPandas(_per_file, "path string, regs binary")
        .collect()  # bounded: one ~1.4 KB row per data file
    )
    prefix = os.path.abspath(table.data_dir) + os.sep
    by_rel = {}
    for r in rows:
        p = r["path"].removeprefix("file://").removeprefix("file:")
        if p.startswith(prefix):
            by_rel[p[len(prefix):]] = bytes(r["regs"])
    new_files, indexed = [], 0
    for f in snap.files:
        f = dict(f)
        regs = by_rel.get(f["path"])
        if regs is not None:
            stats = dict(f.get(_KEY, {}))
            stats[col] = base64.b64encode(regs).decode("ascii")
            f[_KEY] = stats
            indexed += 1
        new_files.append(f)
    metrics = {
        "ndv_col": col,
        "files_indexed": indexed,
        "files_total": len(new_files),
    }
    return table._commit(
        "index", new_files, job_id, metrics,
        keep_parent_files=False, schema=snap.schema,
    )


def approx_distinct_from_manifest(
    table: WarehouseTable,
    col: str,
    version: int | None = None,
    paths: list[str] | None = None,
) -> dict:
    """Approximate distinct ``col`` over a snapshot (or a pruned file
    subset) from manifests alone: max-merge the per-file registers,
    estimate, and report coverage honestly — ``covered_files`` <
    ``total_files`` means post-index appends exist and the estimate
    is a LOWER-bound view of those files only."""
    v = version if version is not None else table.current_version()
    snap = table.snapshot(v)
    files = snap.files if paths is None else [
        f for f in snap.files if f["path"] in set(paths)
    ]
    merged = np.zeros(_HLL_M, dtype=np.uint8)
    covered = 0
    for f in files:
        b64 = (f.get(_KEY) or {}).get(col)
        if b64 is None:
            continue
        regs = np.frombuffer(base64.b64decode(b64), dtype=np.uint8)
        np.maximum(merged, regs, out=merged)
        covered += 1
    return {
        "est_distinct": hll_estimate_from_registers(merged) if covered else None,
        "covered_files": covered,
        "total_files": len(files),
        "complete": covered == len(files),
    }
