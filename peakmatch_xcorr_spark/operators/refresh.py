"""Incremental continuous-aggregate refresh driven by snapshot diffs.

The engine's equivalent of the reference's resume-from-files phase
design (XCorrProcessor.java:36-40: each phase reads the previous
phase's file and appends its own; AnalyseProcessor.java:190-257:
xcorr.saved computes only missing pairs).  Here:

- the source table is a snapshot chain (sources/warehouse.py);
- tier 1m is refreshed by rolling up ONLY the files added since the
  last processed snapshot and merging decomposable stats
  (count/sum/min/max; avg re-derived) into the existing tier;
- coarser tiers recompute ONLY the coarse buckets touched by the
  delta (semi-join on affected buckets; untouched rows carried over
  with an anti-join);
- every tier commit writes a snapshot with metrics, and a job
  checkpoint manifest marks the phase done against the source
  version — a killed job restarted mid-cascade skips committed
  phases and produces identical output (tested).

At 100 TB this means a day's ingest refreshes the tiers touching only
that day's buckets, never rescanning history.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.rollup import (
    cascade_tier,
    tumbling_rollup,
)
from peakmatch_xcorr_spark.sources.warehouse import JobCheckpoint, WarehouseTable


def merge_rollups(existing: DataFrame | None, delta: DataFrame, keys: list[str], has_values: bool) -> DataFrame:
    """Merge two rollups of the same tier: decomposable re-aggregation."""
    if existing is None:
        return delta
    cols = [*keys, "bucket_start", "turns"] + (
        ["vcount", "vsum", "vmin", "vmax", "vavg"] if has_values else []
    )
    u = existing.select(*cols).unionByName(delta.select(*cols))
    aggs = [F.sum("turns").alias("turns")]
    if has_values:
        aggs += [
            F.sum("vcount").alias("vcount"),
            F.sum("vsum").alias("vsum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        ]
    out = u.groupBy(*keys, "bucket_start").agg(*aggs)
    if has_values:
        # vavg from the NON-NULL count (vsum ignores nulls; turns doesn't)
        out = out.withColumn(
            "vavg",
            F.when(F.col("vcount") > 0, F.col("vsum") / F.col("vcount")),
        )
    return out.select(*cols)


class ContinuousAggregate:
    """Rollup cascade materialized into warehouse tables with
    snapshot-diff incremental refresh and phase checkpoints."""

    def __init__(
        self,
        warehouse_root: str,
        source: WarehouseTable,
        keys: list[str],
        ts_col: str = "ts",
        value_col: str | None = None,
        tiers: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
        tier_names: tuple[str, ...] = ("1m", "1h", "1d"),
        name: str = "rollup",
        retention_s: tuple[int | None, ...] | None = None,
        pack_tiers: tuple[str, ...] = (),
    ):
        self.root = warehouse_root
        self.source = source
        self.keys = keys
        self.ts_col = ts_col
        self.value_col = value_col
        self.tiers = tiers
        self.tier_names = tier_names
        self.name = name
        self.retention_s = retention_s or (None,) * len(tier_names)
        self.pack_tiers = pack_tiers
        self.tier_tables = {
            tn: WarehouseTable(warehouse_root, f"{name}_{tn}")
            for tn in tier_names
        }
        self.packed_tables = {
            tn: WarehouseTable(warehouse_root, f"{name}_{tn}_packed")
            for tn in pack_tiers
        }

    def _apply_retention(self, tier_df: DataFrame, idx: int) -> DataFrame:
        """Event-time retention: drop buckets older than the horizon
        behind the tier's max bucket (deterministic — no wall clock)."""
        horizon = self.retention_s[idx]
        if horizon is None:
            return tier_df
        hi = tier_df.agg(F.max("bucket_start").alias("hi")).collect()[0]["hi"]
        if hi is None:
            return tier_df
        cutoff = hi - datetime.timedelta(seconds=horizon)
        return tier_df.filter(F.col("bucket_start") >= F.lit(cutoff))

    def _maybe_pack(self, tn: str, tier_df: DataFrame, src_v: int) -> None:
        if tn not in self.pack_tiers:
            return
        from peakmatch_xcorr_spark.operators.rollup import pack_tier

        packed = pack_tier(
            tier_df.withColumn(self.keys[0], F.col(self.keys[0]).cast("string")),
            [self.keys[0]],
            value_col="vavg" if self.value_col else "turns",
        )
        self.packed_tables[tn].overwrite(
            packed, job_id=f"{self.name}_pack",
            metrics={"source_version": src_v, "tier": tn},
        )

    def _ckpt(self, source_version: int) -> JobCheckpoint:
        return JobCheckpoint(self.root, f"{self.name}_refresh_v{source_version}")

    def last_processed_version(self) -> int | None:
        """Source version the finest tier has fully processed."""
        t0 = self.tier_tables[self.tier_names[0]]
        v = t0.current_version()
        if v is None:
            return None
        return t0.snapshot(v).metrics.get("source_version")

    def refresh(self, spark: SparkSession, fail_after_phase: str | None = None) -> dict:
        """Incrementally refresh all tiers to the source's current
        snapshot.  ``fail_after_phase`` injects a crash for the resume
        test.  Returns per-phase metrics."""
        src_v = self.source.current_version()
        if src_v is None:
            return {"status": "empty-source"}
        ckpt = self._ckpt(src_v)
        has_values = self.value_col is not None
        prev_v = self.last_processed_version()
        if prev_v == src_v and ckpt.phase_done(self.tier_names[-1], src_v):
            return {"status": "up-to-date", "source_version": src_v}

        metrics: dict = {"source_version": src_v}

        # --- finest tier: rollup of the snapshot diff, merged in ---
        tn0 = self.tier_names[0]
        t0 = self.tier_tables[tn0]
        if not ckpt.phase_done(tn0, src_v):
            delta_raw = self.source.read_diff(spark, prev_v, src_v)
            if delta_raw is None:
                delta_rolled = None
            else:
                delta_rolled = tumbling_rollup(
                    delta_raw, self.keys, self.ts_col, self.value_col, self.tiers[0]
                )
            existing = (
                t0.read(spark) if t0.current_version() is not None else None
            )
            if delta_rolled is None:
                merged = existing
            else:
                merged = merge_rollups(existing, delta_rolled, self.keys, has_values)
            # affected fine buckets drive the coarse-tier semi-joins
            if delta_rolled is not None:
                affected = delta_rolled.select(*self.keys, "bucket_start").distinct()
                affected.write.mode("overwrite").parquet(
                    f"{t0.dir}/affected_v{src_v}"
                )
            merged = self._apply_retention(merged, 0)
            snap = t0.overwrite(
                merged, job_id=f"{self.name}_refresh",
                metrics={"source_version": src_v, "tier": tn0},
            )
            self._maybe_pack(tn0, t0.read(spark), src_v)
            ckpt.mark_done(tn0, src_v, {"tier_version": snap.version})
            metrics[tn0] = {"rows": snap.metrics.get("rows")}
            if fail_after_phase == tn0:
                raise RuntimeError(f"injected failure after phase {tn0}")

        # --- coarser tiers: recompute only affected coarse buckets ---
        for i in range(1, len(self.tier_names)):
            tn = self.tier_names[i]
            if ckpt.phase_done(tn, src_v):
                continue
            finer = self.tier_tables[self.tier_names[i - 1]].read(spark)
            tier_table = self.tier_tables[tn]
            bucket = self.tiers[i]
            aff_path = f"{self.tier_tables[self.tier_names[0]].dir}/affected_v{src_v}"
            try:
                affected_fine = spark.read.parquet(aff_path)
            except Exception:
                affected_fine = None
            existing = (
                tier_table.read(spark)
                if tier_table.current_version() is not None
                else None
            )
            if existing is None or affected_fine is None:
                merged = cascade_tier(finer, self.keys, bucket, has_values)
            else:
                affected_coarse = affected_fine.select(
                    *self.keys,
                    F.window("bucket_start", bucket)["start"].alias("bucket_start"),
                ).distinct()
                # semi-join the finer tier down to rows inside affected
                # coarse buckets (broadcastable: affected set is small
                # relative to the tier)
                finer_cb = finer.withColumn(
                    "cb", F.window("bucket_start", bucket)["start"]
                )
                recompute_src = finer_cb.join(
                    F.broadcast(
                        affected_coarse.withColumnRenamed("bucket_start", "cb")
                    ),
                    [*self.keys, "cb"],
                    "left_semi",
                ).drop("cb")
                recomputed = cascade_tier(recompute_src, self.keys, bucket, has_values)
                untouched = existing.join(
                    affected_coarse, [*self.keys, "bucket_start"], "left_anti"
                )
                merged = untouched.unionByName(recomputed)
            merged = self._apply_retention(merged, i)
            snap = tier_table.overwrite(
                merged, job_id=f"{self.name}_refresh",
                metrics={"source_version": src_v, "tier": tn},
            )
            self._maybe_pack(tn, tier_table.read(spark), src_v)
            ckpt.mark_done(tn, src_v, {"tier_version": snap.version})
            metrics[tn] = {"rows": snap.metrics.get("rows")}
            if fail_after_phase == tn:
                raise RuntimeError(f"injected failure after phase {tn}")

        metrics["status"] = "refreshed"
        return metrics
