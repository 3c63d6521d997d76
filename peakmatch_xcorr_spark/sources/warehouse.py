"""Snapshot/manifest parquet warehouse.

The reference engine checkpoints between phases ONLY via files on disk
(xcorr.candidates / xcorr.postprocess / xcorr.saved + the mmap FFT
cache — XCorrProcessor.java:36-40, MMappedFFTCache.java:36-37).  The
engine keeps that property but expresses it as an Iceberg-style table
layer: every append/overwrite is an immutable snapshot with a JSON
manifest listing its data files, parent version, row counts, and
per-partition lineage.  When a real Iceberg catalog + runtime jar is
configured the same interface maps onto ``df.writeTo(...)`` — this
module is the jar-less fallback with identical semantics:

- append-only snapshot chain with atomic manifest commit (tmp+rename);
- snapshot diff (files added between two versions) driving
  incremental continuous-aggregate refresh;
- job checkpoint manifests (which phases committed against which
  source snapshot) so any retention-tier job is resumable mid-run.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same snapshot version first."""


def _exclusive_write_json(path: str, obj: dict) -> None:
    """Create-exclusive manifest write: two committers that both read
    current_version == N race to create vN+1; os.replace would let the
    second silently CLOBBER the first (orphaning its data files), so
    the loser must fail instead — the same contract as an Iceberg
    commit conflict.  os.link(tmp, path) is atomic and raises
    FileExistsError when the winner's manifest is already there."""
    tmp = path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise ConcurrentCommitError(
            f"snapshot manifest {path} already committed by another "
            "writer; re-read current_version and retry the commit"
        ) from None
    except OSError:
        # filesystem without hardlink support (overlay/NFS mounts):
        # O_CREAT|O_EXCL gives the same loser-must-fail contract —
        # slightly weaker atomicity (content lands after the name
        # claim), acceptable because manifests are only read via
        # current_version, which is flipped after this returns
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"snapshot manifest {path} already committed by another "
                "writer; re-read current_version and retry the commit"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
    finally:
        os.remove(tmp)


@dataclass
class Snapshot:
    version: int
    parent: int | None
    operation: str
    files: list[dict]  # [{path, rows}] relative to table data dir
    job_id: str | None = None
    metrics: dict = field(default_factory=dict)
    # table schema as of this snapshot (StructType.jsonValue()).
    # None on legacy manifests -> readers fall back to footer sampling.
    schema: dict | None = None

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "parent": self.parent,
            "operation": self.operation,
            "files": self.files,
            "job_id": self.job_id,
            "metrics": self.metrics,
            "schema": self.schema,
        }


class WarehouseTable:
    """One table = data/ parquet files + snapshots/vNNNNN.json chain."""

    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.snap_dir = os.path.join(self.dir, "snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.snap_dir, exist_ok=True)

    # ---- snapshot chain ----
    def versions(self) -> list[int]:
        # int(f[1:-5]) not a fixed width: v100000.json (6+ digits,
        # f-string widens past :05d) must parse as 100000, not 10000 —
        # a fixed slice made current_version lag and let the next
        # commit silently overwrite an existing manifest
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self.snap_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def snapshot(self, version: int) -> Snapshot:
        with open(os.path.join(self.snap_dir, f"v{version:05d}.json")) as f:
            j = json.load(f)
        return Snapshot(
            version=j["version"],
            parent=j["parent"],
            operation=j["operation"],
            files=j["files"],
            job_id=j.get("job_id"),
            metrics=j.get("metrics", {}),
            schema=j.get("schema"),
        )

    def _evolved_schema(self, df: DataFrame | None, reset: bool = False) -> dict | None:
        """Iceberg-style schema evolution: the committed snapshot
        records the table schema = parent schema UNION the write's
        columns (new columns appended, forced nullable — files written
        before the column existed read as null).  Same-name columns
        must keep their type; a type change is a rejected commit, not
        a silently corrupted read.  ``reset=True`` (plain overwrite:
        no parent data files survive) records the write's schema
        alone.  Returns None only when there is nothing to record
        (df None and no parent schema — legacy chains stay legacy)."""
        from pyspark.sql.types import StructField, StructType

        cur = self.current_version()
        parent_json = (
            self.snapshot(cur).schema if (cur is not None and not reset) else None
        )
        if df is None:
            return parent_json
        write_fields = [
            StructField(f.name, f.dataType, True) for f in df.schema.fields
        ]
        if parent_json is None:
            return StructType(write_fields).jsonValue()
        merged = [
            StructField(f.name, f.dataType, True)
            for f in StructType.fromJson(parent_json).fields
        ]
        by_name = {f.name: f for f in merged}
        for f in write_fields:
            have = by_name.get(f.name)
            if have is None:
                merged.append(f)
                by_name[f.name] = f
            elif have.dataType != f.dataType:
                raise ValueError(
                    f"schema evolution cannot change column {f.name!r} "
                    f"from {have.dataType.simpleString()} to "
                    f"{f.dataType.simpleString()}; write to a new column"
                )
        return StructType(merged).jsonValue()

    def _commit(self, op: str, new_files: list[dict], job_id: str | None,
                metrics: dict, keep_parent_files: bool,
                schema: dict | None = None) -> Snapshot:
        cur = self.current_version()
        files = []
        if keep_parent_files and cur is not None:
            files.extend(self.snapshot(cur).files)
        files.extend(new_files)
        snap = Snapshot(
            version=(cur or 0) + 1,
            parent=cur,
            operation=op,
            files=files,
            job_id=job_id,
            metrics=metrics,
            schema=schema,
        )
        _exclusive_write_json(
            os.path.join(self.snap_dir, f"v{snap.version:05d}.json"),
            snap.to_json(),
        )
        return snap

    # ---- writes ----
    @staticmethod
    def _footer_bounds(md) -> dict:
        """Per-column [min, max] from parquet footer statistics — the
        manifest-level column bounds Iceberg keeps, at zero scan cost.
        Only JSON-friendly types are recorded (datetimes → isoformat)."""
        import datetime as _dt

        def ser(v):
            if isinstance(v, (_dt.datetime, _dt.date)):
                return v.isoformat()
            if isinstance(v, (int, float, str, bool)):
                return v
            return None

        bounds: dict = {}
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = ser(st.min), ser(st.max)
                if mn is None or mx is None:
                    continue
                name = col.path_in_schema
                if name in bounds:
                    bounds[name] = [min(bounds[name][0], mn), max(bounds[name][1], mx)]
                else:
                    bounds[name] = [mn, mx]
        return bounds

    def _write_data(self, df: DataFrame) -> list[dict]:
        """Write df as parquet under a fresh uuid dir; return the
        per-file (= per output partition) lineage record: path, bytes,
        rows, column bounds (from parquet footers — no extra scan)."""
        import pyarrow.parquet as pq

        sub = uuid.uuid4().hex
        out = os.path.join(self.data_dir, sub)
        df.write.mode("overwrite").parquet(out)
        files = []
        empties: list[str] = []
        for fn in sorted(os.listdir(out)):
            if fn.endswith(".parquet"):
                p = os.path.join(sub, fn)
                full = os.path.join(self.data_dir, p)
                md = pq.ParquetFile(full).metadata
                if md.num_rows == 0:
                    empties.append(p)
                    continue
                files.append(
                    {
                        "path": p,
                        "bytes": os.path.getsize(full),
                        "rows": md.num_rows,
                        "bounds": self._footer_bounds(md),
                    }
                )
        # drop empty range/shuffle partitions from the manifest — but
        # when the WHOLE write is empty keep one as the schema carrier,
        # so read() on an empty snapshot still returns a typed frame
        keep_one = empties[:1] if not files else []
        for p in empties:
            if p in keep_one:
                full = os.path.join(self.data_dir, p)
                files.append({"path": p, "bytes": os.path.getsize(full), "rows": 0})
            else:
                os.remove(os.path.join(self.data_dir, p))
        return files

    def history(self, spark: SparkSession) -> DataFrame:
        """Snapshot-chain metadata as a DataFrame (Iceberg's
        ``table.history`` / ``snapshots`` UX): one row per committed
        version with operation, job_id, file/row counts, and live
        rows as of that snapshot.  Reads ONLY manifests — no data
        file is opened, so it is O(versions) regardless of table
        size; the per-partition lineage a resumable job inspects to
        decide where to pick up."""
        rows = []
        for v in self.versions():
            s = self.snapshot(v)
            rows.append((
                s.version,
                s.parent,
                s.operation,
                s.job_id,
                len(s.files),
                sum(int(f.get("rows") or 0) for f in s.files),
            ))
        return spark.createDataFrame(
            rows,
            "version int, parent int, operation string, job_id string, "
            "n_files int, live_rows long",
        )

    def count_rows(self, version: int | None = None) -> int:
        """COUNT(*) from the manifest alone — zero Spark jobs, zero
        file opens.  Sound because every commit records exact per-file
        row counts from the parquet footers at write time; at 100 TB
        this is the difference between a metadata lookup and a
        10^6-file scan for the most common query there is."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.dir} has no snapshots")
        return sum(f["rows"] for f in self.snapshot(v).files)

    def rollback(self, to_version: int, job_id: str | None = None) -> Snapshot:
        """Undo commits by re-committing an older snapshot's exact
        file list (and schema) as a NEW version — history is never
        rewritten, so the bad commits stay auditable and a concurrent
        reader pinned to them is unaffected.  Rolling back past an
        `expire_snapshots` horizon fails loudly: expiry may have
        physically deleted files only the expired snapshots
        referenced, and a rollback that resurrects a manifest whose
        data is gone would turn a recoverable mistake into a corrupt
        table."""
        old = self.snapshot(to_version)  # raises if expired/unknown
        missing = [
            f["path"] for f in old.files
            if not os.path.exists(os.path.join(self.data_dir, f["path"]))
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot roll back to v{to_version}: {len(missing)} data "
                f"file(s) no longer exist (e.g. {missing[0]!r}) — expired "
                "past the rollback horizon"
            )
        m = {
            "rolled_back_to": to_version,
            "rows": sum(f["rows"] for f in old.files),
            "committed_at": time.time(),
        }
        return self._commit(
            "rollback", old.files, job_id, m,
            keep_parent_files=False, schema=old.schema,
        )

    def manifest_column_max(self, col: str, version: int | None = None):
        """Max value of ``col`` across the snapshot's files, from the
        manifest bounds alone (no Spark job).  Returns None when any
        file lacks bounds for the column (legacy manifests) — callers
        must fall back to a scan."""
        v = version if version is not None else self.current_version()
        if v is None:
            return None
        files = self.snapshot(v).files
        vals = []
        for f in files:
            b = f.get("bounds", {}).get(col)
            if b is None:
                if f.get("rows", 1) == 0:
                    continue  # empty file legitimately has no stats
                return None
            vals.append(b[1])
        return max(vals) if vals else None

    def append(self, df: DataFrame, job_id: str | None = None, metrics: dict | None = None) -> Snapshot:
        schema = self._evolved_schema(df)  # before write: reject type conflicts without paying the write
        files = self._write_data(df)
        rows = sum(f["rows"] for f in files)
        m = {"rows_appended": rows, "committed_at": time.time(), **(metrics or {})}
        return self._commit(
            "append", files, job_id, m, keep_parent_files=True, schema=schema
        )

    def overwrite(self, df: DataFrame, job_id: str | None = None, metrics: dict | None = None) -> Snapshot:
        schema = self._evolved_schema(df, reset=True)
        files = self._write_data(df)
        rows = sum(f["rows"] for f in files)
        m = {"rows": rows, "committed_at": time.time(), **(metrics or {})}
        return self._commit(
            "overwrite", files, job_id, m, keep_parent_files=False, schema=schema
        )

    def overwrite_with_carried(
        self,
        df: DataFrame | None,
        carried_paths: list[str],
        job_id: str | None = None,
        metrics: dict | None = None,
    ) -> Snapshot:
        """File-level copy-on-write commit (Iceberg merge-on-write):
        the new snapshot = the parent's ``carried_paths`` file records
        verbatim (data untouched, bounds/rows reused) + the files of
        ``df``.  This is how an incremental refresh keeps its cost
        proportional to the DELTA instead of rewriting the whole tier."""
        cur = self.current_version()
        carried_set = set(carried_paths)
        carried = (
            [f for f in self.snapshot(cur).files if f["path"] in carried_set]
            if cur is not None else []
        )
        if len(carried) != len(carried_set):
            missing = carried_set - {f["path"] for f in carried}
            raise ValueError(f"carried paths not in current snapshot: {missing}")
        schema = self._evolved_schema(df)  # carried files keep reading under the union schema
        new_files = self._write_data(df) if df is not None else []
        rows = sum(f["rows"] for f in carried) + sum(f["rows"] for f in new_files)
        m = {
            "rows": rows,
            "committed_at": time.time(),
            "carried_files": len(carried),
            "rewritten_files": len(new_files),
            **(metrics or {}),
        }
        return self._commit(
            "merge", carried + new_files, job_id, m, keep_parent_files=False,
            schema=schema,
        )

    # ---- reads ----
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.dir} has no snapshots")
        snap = self.snapshot(v)
        paths = [os.path.join(self.data_dir, f["path"]) for f in snap.files]
        if snap.schema is not None:
            # the manifest-recorded schema, not footer sampling: files
            # written before a column existed read as null, and the
            # reader never pays a footer pass to discover the schema
            from pyspark.sql.types import StructType

            return spark.read.schema(
                StructType.fromJson(snap.schema)
            ).parquet(*paths)
        return spark.read.parquet(*paths)

    # ---- maintenance ----
    def expire_snapshots(self, keep_last: int = 5) -> dict:
        """Iceberg-style snapshot expiry: drop manifests older than the
        newest ``keep_last`` versions and delete data files no retained
        snapshot references.  Time travel / snapshot diffs older than
        the horizon become unavailable (standard Iceberg semantics);
        current reads are untouched."""
        vs = self.versions()
        tagged = set(self.tags().values())
        expired = [
            v for v in (vs[:-keep_last] if len(vs) > keep_last else [])
            if v not in tagged  # tagged snapshots are pinned until drop_tag
        ]
        if not expired:
            return {"expired_snapshots": 0, "deleted_files": 0}
        keep = set(vs) - set(expired)
        referenced = {
            f["path"] for v in keep for f in self.snapshot(v).files
        }
        # in-flight audits pin their files too: expiring main history
        # must never delete parquet a live branch still reads
        referenced |= self._branch_referenced_files()
        deleted = 0
        for v in expired:
            for f in self.snapshot(v).files:
                p = f["path"]
                if p not in referenced:
                    full = os.path.join(self.data_dir, p)
                    if os.path.exists(full):
                        os.remove(full)
                        deleted += 1
                    referenced.add(p)  # count each file once
            os.remove(os.path.join(self.snap_dir, f"v{v:05d}.json"))
        # clear now-empty uuid dirs so the data dir doesn't accrete
        for d in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, d)
            if os.path.isdir(full) and not os.listdir(full):
                os.rmdir(full)
        return {"expired_snapshots": len(expired), "deleted_files": deleted}

    def remove_orphans(self, older_than_s: float = 3600.0) -> dict:
        """Delete data files no snapshot manifest references — the
        debris of writers that died between ``_write_data`` and commit
        or lost a ``ConcurrentCommitError`` race.  Iceberg's
        remove_orphan_files counterpart; without it a crashy ingest
        leaks storage forever, silently.

        The age gate is the correctness condition: a LIVE writer that
        has finished its parquet write but not yet committed owns
        files younger than ``older_than_s``, so only files older than
        the gate are touched — run it with a gate comfortably above
        the longest plausible write-to-commit window (default 1h).
        Marker files (_SUCCESS etc.) are swept only when their dir no
        longer holds any data file."""
        referenced = {
            f["path"] for v in self.versions() for f in self.snapshot(v).files
        }
        # a live branch's un-published appends are NOT orphans
        referenced |= self._branch_referenced_files()
        referenced_dirs = {p.split(os.sep)[0] for p in referenced}
        now = time.time()
        deleted = 0
        for d in sorted(os.listdir(self.data_dir)):
            sub = os.path.join(self.data_dir, d)
            if not os.path.isdir(sub):
                continue
            for fn in sorted(os.listdir(sub)):
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.join(d, fn)
                full = os.path.join(sub, fn)
                if rel in referenced:
                    continue
                if now - os.path.getmtime(full) < older_than_s:
                    continue
                os.remove(full)
                deleted += 1
            leftover = os.listdir(sub)
            if (
                d not in referenced_dirs
                and not any(fn.endswith(".parquet") for fn in leftover)
                and all(
                    now - os.path.getmtime(os.path.join(sub, fn)) >= older_than_s
                    for fn in leftover
                )
            ):
                # fully orphaned write dir: sweep markers (_SUCCESS,
                # .crc) and drop the dir itself
                for fn in leftover:
                    os.remove(os.path.join(sub, fn))
                os.rmdir(sub)
        return {"orphans_deleted": deleted}

    def compact(self, spark: SparkSession, target_partitions: int = 1,
                job_id: str | None = None,
                zorder_keys: tuple[str, str] | None = None) -> Snapshot:
        """Rewrite the current snapshot's (possibly many small) files
        into ``target_partitions`` files — the small-file compaction an
        append-heavy ingest needs.  Commits as a new snapshot (an
        overwrite with identical rows), so resume/diff semantics are
        preserved going forward.

        ``zorder_keys=(a, b)``: compaction is the natural moment to
        (re)cluster — appends arrive in arrival order and erode any
        earlier layout, so the rewrite the table is paying for anyway
        also lays the rows along the (a, b) Z-curve, making every
        output file's manifest bounds tight in BOTH keys for
        ``pruned_read``."""
        if zorder_keys is not None:
            from peakmatch_xcorr_spark.operators.layout import zorder_layout

            df = zorder_layout(
                self.read(spark), *zorder_keys, target_files=target_partitions
            )
        else:
            df = self.read(spark).coalesce(target_partitions)
        before = len(self.snapshot(self.current_version()).files)
        snap = self.overwrite(
            df, job_id=job_id or "compact",
            metrics={
                "compacted_from_files": before,
                **({"zorder_keys": list(zorder_keys)} if zorder_keys else {}),
            },
        )
        return snap

    def incremental_ok(self, from_version: int | None, to_version: int) -> bool:
        """True when (from_version, to_version] is a readable chain of
        APPEND snapshots — the precondition for file-level diffs
        (Iceberg incremental reads are appends-only).  False when any
        manifest in the range was expired or any snapshot rewrote data
        (overwrite/compaction): new file paths then carry OLD rows, so
        a path diff would double-count — callers must fall back to a
        full recompute.  from_version=None is always ok (the 'diff' is
        the full current content)."""
        if from_version is None:
            return True
        # the walk below stops AT from_version without opening it, but
        # diff_files reads from_version's manifest — if snapshot expiry
        # removed exactly that boundary manifest, the incremental path
        # would crash on every retry instead of falling back to a full
        # rebuild (the intermediate-expiry case was covered; the
        # boundary case was not)
        if not os.path.exists(
            os.path.join(self.snap_dir, f"v{from_version:05d}.json")
        ):
            return False
        v: int | None = to_version
        while v != from_version:
            if v is None or v < from_version:
                return False
            try:
                s = self.snapshot(v)
            except FileNotFoundError:
                return False
            if s.operation != "append":
                return False
            v = s.parent
        return True

    def diff_files(self, from_version: int | None, to_version: int) -> list[str]:
        """Files added between two snapshots — the incremental-refresh
        input set (Iceberg snapshot-diff equivalent).  Only meaningful
        when ``incremental_ok(from_version, to_version)``."""
        new = {f["path"] for f in self.snapshot(to_version).files}
        old: set[str] = set()
        if from_version is not None:
            old = {f["path"] for f in self.snapshot(from_version).files}
        return sorted(new - old)

    def read_paths(
        self,
        spark: SparkSession,
        paths: list[str],
        version: int | None = None,
    ) -> DataFrame | None:
        """Read a subset of the table's data files (relative paths from
        a snapshot's file records), under the manifest-recorded schema
        of ``version`` (default: current) when one exists — a COW
        rewrite of pre-evolution files must carry the evolved columns
        (as nulls), or the rewritten frame couldn't union with new
        data."""
        if not paths:
            return None
        full = [os.path.join(self.data_dir, p) for p in paths]
        v = version if version is not None else self.current_version()
        schema_json = self.snapshot(v).schema if v is not None else None
        if schema_json is not None:
            from pyspark.sql.types import StructType

            return spark.read.schema(StructType.fromJson(schema_json)).parquet(*full)
        return spark.read.parquet(*full)

    def read_diff(self, spark: SparkSession, from_version: int | None, to_version: int) -> DataFrame | None:
        # diff files all belong to to_version -> read under ITS schema
        return self.read_paths(
            spark, self.diff_files(from_version, to_version),
            version=to_version,
        )

    def changelog(
        self, spark: SparkSession, from_version: int | None, to_version: int
    ) -> DataFrame:
        """Net row-level changes between two snapshots as a DataFrame
        with a ``_change_type`` column ('insert' | 'delete') — Iceberg
        ``create_changelog_view`` net-change semantics, the CDC feed a
        downstream consumer tails instead of re-reading the table.

        Cost is bounded by CHURN, not table size: only files present
        in exactly one of the two manifests are read (a COW rewrite
        that deleted 10 rows from one file reads that file pair, not
        the table), then one ``exceptAll`` each way nets out the rows
        the rewrite merely carried.  Multiset semantics: k extra
        copies of a duplicate row appear as k inserts.  Both sides are
        read under ``to_version``'s manifest schema so files written
        before a schema evolution align (missing columns as null).

        ``from_version=None`` reports the whole of ``to_version`` as
        inserts.  Works across any operation chain — append, delete,
        merge, publish — because it reasons over manifests, unlike
        ``read_diff``, which is the fast path for append-only chains
        (``incremental_ok``)."""
        new = {f["path"] for f in self.snapshot(to_version).files}
        old: set[str] = set()
        if from_version is not None:
            old = {f["path"] for f in self.snapshot(from_version).files}
        added_df = self.read_paths(spark, sorted(new - old), version=to_version)
        removed_df = self.read_paths(
            spark, sorted(old - new), version=to_version
        )
        from pyspark.sql import functions as F

        def tag(df: DataFrame, kind: str) -> DataFrame:
            return df.withColumn("_change_type", F.lit(kind))

        if added_df is None and removed_df is None:
            # no file churn: empty changelog under the table schema
            base = self.read(spark, version=to_version).limit(0)
            return tag(base, "insert").limit(0)
        if removed_df is None:
            return tag(added_df, "insert")
        if added_df is None:
            return tag(removed_df, "delete")
        return tag(added_df.exceptAll(removed_df), "insert").unionByName(
            tag(removed_df.exceptAll(added_df), "delete")
        )

    # ---- refs: tags + branches (write-audit-publish) ----
    # Iceberg keeps named refs in table metadata; here each ref is one
    # JSON file so creation inherits the same loser-must-fail commit
    # contract as snapshot manifests (_exclusive_write_json).

    @property
    def _refs_dir(self) -> str:
        d = os.path.join(self.dir, "refs")
        os.makedirs(d, exist_ok=True)
        return d

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under an immutable name (release audits,
        reproducible training runs).  Tagged snapshots — manifest AND
        data files — survive ``expire_snapshots`` until the tag is
        dropped; re-pointing requires drop + create, never overwrite."""
        v = version if version is not None else self.current_version()
        if v is None or not os.path.exists(
            os.path.join(self.snap_dir, f"v{v:05d}.json")
        ):
            raise FileNotFoundError(f"cannot tag: snapshot v{v} does not exist")
        try:
            _exclusive_write_json(
                os.path.join(self._refs_dir, f"{name}.json"),
                {"name": name, "type": "tag", "snapshot_version": v,
                 "created_at": time.time()},
            )
        except ConcurrentCommitError:
            raise ValueError(
                f"tag {name!r} already exists; tags are immutable — "
                "drop_tag first to re-point"
            ) from None
        return v

    def tags(self) -> dict[str, int]:
        if not os.path.isdir(os.path.join(self.dir, "refs")):
            return {}
        out = {}
        for fn in sorted(os.listdir(self._refs_dir)):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(self._refs_dir, fn)) as f:
                j = json.load(f)
            out[j["name"]] = j["snapshot_version"]
        return out

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        tags = self.tags()
        if name not in tags:
            raise FileNotFoundError(f"no tag {name!r} on table {self.dir}")
        return self.read(spark, version=tags[name])

    def drop_tag(self, name: str) -> None:
        os.remove(os.path.join(self._refs_dir, f"{name}.json"))

    @property
    def _branches_dir(self) -> str:
        return os.path.join(self.dir, "branches")

    def create_branch(self, name: str) -> "WarehouseBranch":
        """Start a write-audit-publish branch at the current head.
        Branch commits share the main table's data directory (publish
        is metadata-only, like an Iceberg fast-forward) but chain
        snapshots in their own directory, so main readers never see
        unaudited rows."""
        br = WarehouseBranch(self, name)
        if br.versions():
            raise ValueError(f"branch {name!r} already exists")
        cur = self.current_version()
        head = self.snapshot(cur) if cur is not None else None
        base = Snapshot(
            version=1, parent=None, operation="branch",
            files=list(head.files) if head else [],
            job_id=None,
            metrics={"base_version": cur, "created_at": time.time()},
            schema=head.schema if head else None,
        )
        _exclusive_write_json(
            os.path.join(br.snap_dir, "v00001.json"), base.to_json()
        )
        return br

    def branch(self, name: str) -> "WarehouseBranch":
        br = WarehouseBranch(self, name)
        if not br.versions():
            raise FileNotFoundError(f"no branch {name!r} on table {self.dir}")
        return br

    def list_branches(self) -> list[str]:
        if not os.path.isdir(self._branches_dir):
            return []
        return sorted(
            d for d in os.listdir(self._branches_dir)
            if os.path.isdir(os.path.join(self._branches_dir, d, "snapshots"))
        )

    def drop_branch(self, name: str) -> None:
        """Abandon a branch (audit failed).  Metadata-only: data files
        the branch wrote become unreferenced and are collected by the
        normal ``remove_orphans`` sweep — never deleted inline, because
        a concurrent publish racing the drop must lose at the manifest,
        not read half-deleted parquet."""
        import shutil

        br = self.branch(name)  # raises if absent
        shutil.rmtree(br.dir)

    def publish_branch(self, name: str, job_id: str | None = None) -> Snapshot:
        """Fast-forward the audited branch into the main chain as ONE
        atomic commit (squash publish).  The published manifest is
        pinned at ``base_version + 1``: if ANY writer committed to main
        since the branch was cut, the exclusive manifest write loses
        and the publisher must re-branch and re-audit — the same
        no-silent-clobber contract as every other commit here.  Data
        files are shared with main's data dir, so publish moves zero
        bytes."""
        br = self.branch(name)
        bhead = br.current_version()
        if bhead is None or bhead == 1:
            raise ValueError(f"branch {name!r} has no commits to publish")
        base = br.base_version
        expected = (base or 0) + 1
        cur = self.current_version()
        if cur != base:
            raise ConcurrentCommitError(
                f"cannot fast-forward branch {name!r}: main advanced to "
                f"v{cur} past the branch base v{base} — re-branch from "
                "the new head and re-run the audit"
            )
        head = br.snapshot(bhead)
        snap = Snapshot(
            version=expected, parent=base, operation="publish",
            files=head.files, job_id=job_id,
            metrics={
                "branch": name,
                "branch_commits": bhead - 1,
                "rows": sum(f["rows"] for f in head.files),
                "committed_at": time.time(),
            },
            schema=head.schema,
        )
        _exclusive_write_json(
            os.path.join(self.snap_dir, f"v{expected:05d}.json"),
            snap.to_json(),
        )
        return snap

    def _branch_referenced_files(self) -> set[str]:
        """Data files any live branch snapshot references — maintenance
        on main must treat these as reachable or a GC sweep would pull
        parquet out from under an in-flight audit."""
        out: set[str] = set()
        for name in self.list_branches():
            br = WarehouseBranch(self, name)
            for v in br.versions():
                out.update(f["path"] for f in br.snapshot(v).files)
        return out


class WarehouseBranch(WarehouseTable):
    """A branch is a WarehouseTable with its own snapshot chain under
    ``<table>/branches/<name>/snapshots`` sharing the parent's data
    directory — every write/read/diff/delete operator works on it
    unchanged, and publish is a metadata-only fast-forward."""

    def __init__(self, parent: WarehouseTable, name: str):
        if os.sep in name or not name:
            raise ValueError(f"invalid branch name {name!r}")
        self.parent_table = parent
        self.name = name
        self.dir = os.path.join(parent.dir, "branches", name)
        self.data_dir = parent.data_dir  # shared: publish moves no bytes
        self.snap_dir = os.path.join(self.dir, "snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    @property
    def base_version(self) -> int | None:
        return self.snapshot(1).metrics.get("base_version")

    # storage maintenance reasons over the UNION of main + branch
    # references; a branch-scoped sweep would see main-only files as
    # orphans and delete live data — refuse loudly instead.
    def expire_snapshots(self, keep_last: int = 5) -> dict:
        raise RuntimeError(
            "run expire_snapshots on the main table, not a branch"
        )

    def remove_orphans(self, older_than_s: float = 3600.0) -> dict:
        raise RuntimeError(
            "run remove_orphans on the main table, not a branch"
        )


class JobCheckpoint:
    """Phase-level checkpoint manifest: which phases of a job committed
    against which source snapshot version.  The engine's analogue of
    the reference's resume-from-file (AnalyseProcessor.java:190-257
    xcorr.saved skip-cached pattern)."""

    def __init__(self, root: str, job_id: str):
        self.path = os.path.join(root, "checkpoints", f"{job_id}.json")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self.state: dict = {"job_id": job_id, "phases": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)

    def phase_done(self, phase: str, source_version: int | None) -> bool:
        p = self.state["phases"].get(phase)
        return p is not None and p.get("source_version") == source_version

    def mark_done(self, phase: str, source_version: int | None, metrics: dict | None = None) -> None:
        self.state["phases"][phase] = {
            "source_version": source_version,
            "metrics": metrics or {},
            "committed_at": time.time(),
        }
        _atomic_write_json(self.path, self.state)
