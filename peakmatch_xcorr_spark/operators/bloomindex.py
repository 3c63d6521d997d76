"""Per-file Bloom-filter index for equality point lookups.

Manifest min/max bounds (operators/layout.py:prune_files) skip files
for RANGE predicates, but an equality lookup on a high-cardinality key
(``conv_id = 'conv12345'``) gets nothing from bounds unless the table
happens to be clustered on that key: every file's [min, max] spans the
id domain and zero files skip.  Iceberg/Delta solve this with a
secondary structure — per-file Bloom filters — consulted at plan time.
Same pattern here, engine-native:

- **Built executor-side, one column-pruned scan.**  The index build
  reads ONLY the indexed column (parquet column pruning), groups rows
  by ``input_file_name()``, and hashes each file's distinct values
  into a bitset inside ``applyInPandas`` — the driver receives one
  (path, bitset) row per data file, never the values.  At 10^12 rows
  this is the standard one-off cost of building an index, and it
  composes with the same maintenance pass as Z-order compaction.
- **Stored in the manifest, committed metadata-only.**  The bitsets
  attach to the snapshot's per-file records (``blooms`` key) and are
  re-committed as a new version with ``operation="index"`` — no data
  file is touched, the same metadata-only-commit shape as
  ``rollback``.  Readers pinned to older snapshots are unaffected.
- **Conservative by construction.**  Files appended AFTER the index
  commit simply lack a bloom and are always kept, as are legacy
  records; a bloom can only produce false POSITIVES (extra files
  read), never a skipped row.  Pruning correctness never depends on
  the filter parameters.
- **Deterministic double hashing.**  Values are canonicalized to
  strings (Spark ``CAST(col AS STRING)`` at build, ``str(value)`` at
  probe — bit-identical for string and integer keys, which is why
  other types are rejected) and hashed with pandas' keyed SipHash
  (``pd.util.hash_array``) under two fixed keys; bit i of k is
  ``(h1 + i*h2) mod m`` (Kirsch–Mitzenmacher).  NOTE pandas only
  applies ``hash_key`` to object arrays — hashing numerics directly
  would silently collapse h1 == h2 — hence the string canonical form
  is load-bearing, not cosmetic.

Sizing: ``m = ceil(-n ln p / ln^2 2)`` bits from the file's OBSERVED
distinct count, ``k = round(m/n ln 2)``, capped at 1 MiB per file so a
pathological file cannot bloat the JSON manifest.  At the default
p=0.01 a 100k-conversation file costs ~117 KiB — manifest-weight, not
data-weight.

Reference tie-in: the reference engine has no secondary indexes (its
xcorr.saved cache at PeakMatchProcessor.java:31 is the closest thing —
a key-value skip list for already-scored pairs); this module is part
of the engine's warehouse layer mandated by the north rule, not a port.
"""

from __future__ import annotations

import base64
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.sources.warehouse import Snapshot, WarehouseTable

_KEY1 = "0123456789123456"
_KEY2 = "6543210987654321"
_MAX_BITS = 1 << 23  # 1 MiB per file per column: manifest-bloat guard
_INDEXABLE_PREFIXES = ("string", "int", "bigint", "smallint", "tinyint", "long")


def _size_for(n: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for n distinct values at target fpp."""
    n = max(n, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) & ~7  # byte-align: bitset is stored packed, 8 bits/byte
    m = min(max(m, 64), _MAX_BITS)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(vals: np.ndarray, m: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flattened (byte_index, bit_mask) arrays for all k probe
    positions of every value.  ``vals`` must be an object array of
    canonical strings."""
    h1 = pd.util.hash_array(vals, hash_key=_KEY1)
    # |1 forces h2 odd -> full-period stride for power-of-two-free m;
    # also guards the degenerate h2 == 0 value
    h2 = pd.util.hash_array(vals, hash_key=_KEY2) | 1
    i = np.arange(k, dtype=np.uint64)[:, None]
    pos = (h1[None, :] + i * h2[None, :]) % np.uint64(m)
    pos = pos.ravel()
    return (pos >> 3).astype(np.int64), (1 << (pos & 7)).astype(np.uint8)


def _build_bitset(vals: np.ndarray, fpp: float) -> tuple[bytes, int, int, int]:
    """(packed bitset, m, k, ndv) over the distinct canonical strings."""
    uniq = pd.unique(pd.Series(vals).dropna().astype(str))
    ndv = len(uniq)
    m, k = _size_for(ndv, fpp)
    buf = np.zeros(m >> 3, dtype=np.uint8)
    if ndv:
        idx, bit = _positions(np.asarray(uniq, dtype=object), m, k)
        np.bitwise_or.at(buf, idx, bit)
    return buf.tobytes(), m, k, ndv


def bloom_may_contain(bloom: dict, value) -> bool:
    """Probe one manifest bloom record ({m, k, b64}) for ``value``.
    False means PROVEN absent; True means possibly present."""
    m, k = int(bloom["m"]), int(bloom["k"])
    buf = np.frombuffer(base64.b64decode(bloom["b64"]), dtype=np.uint8)
    idx, bit = _positions(np.array([str(value)], dtype=object), m, k)
    return bool(np.all(buf[idx] & bit))


def build_bloom_index(
    table: WarehouseTable,
    spark: SparkSession,
    col: str,
    fpp: float = 0.01,
    job_id: str | None = None,
) -> Snapshot:
    """Attach per-file Bloom filters for ``col`` to the current
    snapshot's file records and commit metadata-only (op="index").

    One Spark job: column-pruned scan -> group by input_file_name ->
    per-file bitset in applyInPandas -> tiny (path, bitset) collect.
    Existing blooms for other columns on the same record are kept, so
    indexes on several keys compose."""
    cur = table.current_version()
    if cur is None:
        raise ValueError(f"table {table.dir!r} has no snapshots to index")
    snap = table.snapshot(cur)
    df = table.read(spark, version=cur)
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"column {col!r} not in table {table.dir!r}")
    if not dt.startswith(_INDEXABLE_PREFIXES):
        # float/timestamp CASTs don't round-trip str(value) bit-exactly
        raise ValueError(
            f"bloom index supports string/integer keys, not {col!r}: {dt}"
        )

    def _per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        bits, m, k, ndv = _build_bitset(pdf["v"].to_numpy(), fpp)
        return pd.DataFrame(
            {"path": [pdf["f"].iloc[0]], "m": [m], "k": [k],
             "ndv": [ndv], "bits": [bits]}
        )

    rows = (
        df.select(
            F.input_file_name().alias("f"),
            F.col(col).cast("string").alias("v"),
        )
        .groupBy("f")
        .applyInPandas(
            _per_file, "path string, m long, k int, ndv long, bits binary"
        )
        .collect()  # bounded: one row per data file
    )
    # input_file_name is file:-prefixed and absolute; manifest paths
    # are relative to the table data dir
    prefix = os.path.abspath(table.data_dir) + os.sep
    by_rel = {}
    for r in rows:
        p = r["path"].removeprefix("file://").removeprefix("file:")
        if p.startswith(prefix):
            by_rel[p[len(prefix):]] = r
    new_files, indexed = [], 0
    for f in snap.files:
        f = dict(f)
        r = by_rel.get(f["path"])
        if r is not None:
            blooms = dict(f.get("blooms", {}))
            blooms[col] = {
                "m": r["m"], "k": r["k"], "ndv": r["ndv"],
                "b64": base64.b64encode(bytes(r["bits"])).decode("ascii"),
            }
            f["blooms"] = blooms
            indexed += 1
        new_files.append(f)
    metrics = {
        "indexed_col": col, "fpp": fpp, "files_indexed": indexed,
        "files_total": len(new_files),
        "index_bytes": sum(
            len(f["blooms"][col]["b64"]) * 3 // 4
            for f in new_files if col in f.get("blooms", {})
        ),
    }
    return table._commit(
        "index", new_files, job_id, metrics,
        keep_parent_files=False, schema=snap.schema,
    )


def prune_files_eq(
    table: WarehouseTable, col: str, value, version: int | None = None
) -> tuple[list[str], int]:
    """Files that may contain rows with ``col == value``: bounds prove
    exclusion for ordered types, blooms prove exclusion for hashed
    membership, anything unprovable is kept.  Driver-side manifest
    walk only.  Returns (paths_to_read, files_total)."""
    from peakmatch_xcorr_spark.operators.layout import _norm

    v = version if version is not None else table.current_version()
    if v is None:
        return [], 0
    keep, total = [], 0
    for f in table.snapshot(v).files:
        if f.get("rows", 1) == 0:
            continue
        total += 1
        b = f.get("bounds", {}).get(col)
        if b is not None and not (_norm(b[0]) <= _norm(value) <= _norm(b[1])):
            continue
        bloom = f.get("blooms", {}).get(col)
        if bloom is not None and not bloom_may_contain(bloom, value):
            continue
        keep.append(f["path"])
    return keep, total


def point_lookup(
    table: WarehouseTable,
    spark: SparkSession,
    col: str,
    value,
    version: int | None = None,
) -> tuple[DataFrame | None, dict]:
    """Bloom+bounds-pruned equality scan: plan driver-side from the
    manifest, read only the surviving files, apply the row filter.
    Returns (df_or_None, {files_total, files_read})."""
    paths, total = prune_files_eq(table, col, value, version)
    stats = {"files_total": total, "files_read": len(paths)}
    df = table.read_paths(spark, paths, version=version)
    if df is None:
        return None, stats
    return df.filter(F.col(col) == F.lit(value)), stats
