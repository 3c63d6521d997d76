"""Semi-structured (JSON string) column handling.

Event streams carry ragged attribute bags (the events table's
``props``); at 100 TB the rule is: extract ONCE, shred to real
columns, and never re-parse in the hot path.  Two layers:

- ``shred_json`` materializes chosen JSON fields as typed columns via
  ``get_json_object`` — JVM-side, whole-stage-codegen, no Python.
  Malformed JSON / missing fields yield NULL (never a task failure):
  at 10^12 rows some rows ARE garbage, and a parse that throws turns
  one bad row into a dead job.  The intended use is a one-off
  maintenance pass whose output is written back as parquet columns
  (the same economics as the bloom/Z-order passes: pay once, every
  later scan prunes and pushes down on REAL columns — a JSON parse
  can never be pushed to the parquet reader).
- ``json_field_rollup`` aggregates an extracted numeric field per
  key directly — the one-shot exploration path when shredding is not
  worth it yet.  Plain hash aggregate with map-side partials on top
  of the codegen extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shred_json(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
) -> DataFrame:
    """Materialize JSON fields as typed columns: ``fields`` maps new
    column name -> "path:type" (e.g. ``{"k": "$.k:long"}``).  NULL on
    missing/malformed — extraction must degrade per-row, not per-job.
    """
    out = df
    for name, spec in fields.items():
        path, _, typ = spec.rpartition(":")
        out = out.withColumn(
            name, F.get_json_object(F.col(json_col), path).cast(typ)
        )
    return out


def json_field_rollup(
    df: DataFrame,
    json_col: str,
    path: str,
    keys: list[str],
    cast: str = "long",
) -> DataFrame:
    """Grouped stats (n, non-null n, sum/min/max, 6 dp mean) of one
    numeric JSON field — exploration without a shred pass.  The sum
    is exact (int64) so the mean is a single fixed-order division,
    oracle-replayable."""
    v = F.get_json_object(F.col(json_col), path).cast(cast)
    return (
        df.select(*keys, v.alias("_v"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("_v").alias("n_present"),
            F.sum("_v").alias("sum_v"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
            F.round(
                F.sum("_v") / F.count("_v") + 1e-9, 6
            ).alias("avg_v"),
        )
    )
