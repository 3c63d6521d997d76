"""MERGE / upsert and DELETE for the parquet warehouse, as file-level
copy-on-write.

SQL ``MERGE INTO t USING u ON t.k = u.k WHEN MATCHED THEN UPDATE WHEN
NOT MATCHED THEN INSERT`` re-expressed with the engine's snapshot
machinery: rows of ``updates`` replace current rows with equal keys,
new keys append — and only the files whose manifest bounds intersect
the updates' key range are rewritten.  Everything else is carried into
the new snapshot by manifest record (``overwrite_with_carried``), so
the cost of an upsert is proportional to the files it TOUCHES, not the
table — at 100 TB the difference between rewriting a few hundred MB
and rewriting the table.  Readers of older snapshot versions are
unaffected (time travel keeps working: commits never mutate data
files).

Soundness of the file pruning: the prune column must be one of the
merge keys.  Any current row whose key equals an update's key has that
key inside the updates' [min, max] of the prune column, so its file's
bounds intersect the range and the file is selected for rewrite — a
carried file therefore cannot contain a matched row.  (Pruning on a
non-key column would break exactly that argument, so it is rejected.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.layout import _norm, prune_files
from peakmatch_xcorr_spark.sources.warehouse import Snapshot, WarehouseTable

# Above this many distinct update keys, fall back from set-based file
# selection to a [min, max] range intersect (one driver list of keys
# is no longer "a delta").
_KEYSET_CAP = 100_000


def _affected_paths(
    table: WarehouseTable, prune_col: str, updates: DataFrame
) -> list[str]:
    """Files that can contain a matched row: selected per file against
    the updates' key SET, not the global [min, max] — a delta touching
    keys {100, 20000} has a range spanning nearly every file of a
    0..10k table, but its key set intersects almost none of them
    (observed: range pruning carried 0 of 16 files, set pruning 15)."""
    import bisect

    keys = [
        r[0]
        for r in updates.select(prune_col).distinct().limit(_KEYSET_CAP + 1).collect()
    ]
    if len(keys) > _KEYSET_CAP:
        lo, hi = updates.agg(F.min(prune_col), F.max(prune_col)).first()
        return prune_files(table, {prune_col: (lo, hi)})[0]
    keys = sorted(_norm(k) for k in keys if k is not None)
    v = table.current_version()
    out = []
    for f in table.snapshot(v).files:
        if f.get("rows", 1) == 0:
            continue
        b = f.get("bounds", {}).get(prune_col)
        if b is None:
            out.append(f["path"])  # no stats -> cannot exclude
            continue
        i = bisect.bisect_left(keys, _norm(b[0]))
        if i < len(keys) and keys[i] <= _norm(b[1]):
            out.append(f["path"])
    return out


def merge_upsert(
    table: WarehouseTable,
    spark: SparkSession,
    updates: DataFrame,
    key_cols: list[str],
    prune_col: str | None = None,
    job_id: str | None = None,
) -> Snapshot:
    """Upsert ``updates`` into ``table`` by ``key_cols``.  Returns the
    committed snapshot; its metrics record carried vs rewritten file
    counts (the lineage evidence that the COW stayed proportional to
    the delta).  ``updates`` must be unique per key — checked (one agg
    over the delta), because 'last writer wins among duplicates' would
    otherwise be decided by partition order, silently."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    prune_col = prune_col or key_cols[0]
    if prune_col not in key_cols:
        raise ValueError(
            f"prune_col {prune_col!r} must be one of the merge keys "
            f"{key_cols} — bounds pruning on a non-key column could "
            "carry a file that holds a matched row"
        )
    dup = (
        updates.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"updates contain duplicate keys (e.g. "
            f"{ {k: dup[0][k] for k in key_cols} }); MERGE requires one "
            "row per key"
        )

    if table.current_version() is None:
        return table.append(updates, job_id=job_id)

    if updates.limit(1).count() == 0:
        # empty delta (a common no-new-data pipeline tick): no-op —
        # return the current snapshot rather than committing an
        # identical one or failing the pipeline
        return table.snapshot(table.current_version())
    affected = _affected_paths(table, prune_col, updates)
    snap = table.snapshot(table.current_version())
    carried = [f["path"] for f in snap.files if f["path"] not in set(affected)]

    current = table.read_paths(spark, affected)
    if current is None:
        rewrite = updates
    else:
        # allowMissingColumns: an upsert may CARRY a brand-new column
        # (schema evolution through MERGE — current rows get null), or
        # omit an existing one (matched rows' omitted column becomes
        # null: full-row replace, not a partial patch)
        rewrite = current.join(
            F.broadcast(updates.select(*key_cols)), key_cols, "left_anti"
        ).unionByName(updates, allowMissingColumns=True)
    return table.overwrite_with_carried(
        rewrite,
        carried,
        job_id=job_id,
        metrics={"merge_keys": key_cols, "merge_affected_files": len(affected)},
    )


def delete_rows(
    table: WarehouseTable,
    spark: SparkSession,
    keys: DataFrame,
    key_cols: list[str],
    prune_col: str | None = None,
    job_id: str | None = None,
) -> Snapshot:
    """DELETE by key set (``DELETE FROM t WHERE (k...) IN (SELECT k...
    FROM keys)``) as file-level copy-on-write — the right-to-be-
    forgotten path a training-data warehouse needs: purging one
    conversation/user from a 100 TB tier must rewrite the few files
    whose manifest bounds can contain it, never the tier.

    Same pruning-soundness argument as MERGE (prune_col must be a key
    col, so every file holding a matched row intersects the key set
    and is selected for rewrite; carried files provably contain no
    matched row).  Duplicate rows in ``keys`` are harmless — the
    anti-join is set-semantics — so unlike MERGE no uniqueness check
    runs.  Older snapshot versions still see the deleted rows (commits
    never mutate data files): PHYSICAL purge of history additionally
    requires ``expire_snapshots`` past this commit, which the metrics
    record ("delete_committed_at") lets a compliance job verify.

    Returns the committed snapshot; metrics carry affected-file count
    and the affected files' pre-rewrite row total, so deleted-row
    count is derivable from the manifest alone (no extra scan)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    prune_col = prune_col or key_cols[0]
    if prune_col not in key_cols:
        raise ValueError(
            f"prune_col {prune_col!r} must be one of the delete keys "
            f"{key_cols} — bounds pruning on a non-key column could "
            "carry a file that holds a matched row"
        )
    cur = table.current_version()
    if cur is None:
        raise FileNotFoundError(f"table {table.dir} has no snapshots")
    if keys.limit(1).count() == 0:
        # empty key set (no-op compliance tick): return the current
        # snapshot rather than committing an identical one
        return table.snapshot(cur)
    affected = _affected_paths(table, prune_col, keys)
    snap = table.snapshot(cur)
    if not affected:
        return snap  # no file can contain a matched row
    affected_set = set(affected)
    carried = [f["path"] for f in snap.files if f["path"] not in affected_set]
    rows_before = sum(
        f["rows"] for f in snap.files if f["path"] in affected_set
    )
    current = table.read_paths(spark, affected)
    rewrite = current.join(
        F.broadcast(keys.select(*key_cols).distinct()), key_cols, "left_anti"
    )
    return table.overwrite_with_carried(
        rewrite,
        carried,
        job_id=job_id,
        metrics={
            "delete_keys": key_cols,
            "delete_affected_files": len(affected),
            "delete_rows_before_rewrite": rows_before,
        },
    )
