"""JSON-lines transcript ingestion with per-row corruption accounting.

Parquet is the engine's native format, but transcript streams arrive
from logging systems as JSONL; at 10^12 turns some lines ARE garbage
(truncated writes, mixed schemas, stray log lines) and the ingest
contract is the same as semistructured.shred_json's: degrade per ROW,
never per job, and never silently.

``read_turns_jsonl`` reads with an EXPLICIT schema (schema inference
is a full extra pass over the data and is non-deterministic under
sampling — always wrong at scale) in PERMISSIVE mode with a
``_corrupt_record`` rescue column; ``split_corrupt`` separates clean
rows from rescued raw lines so the caller can quarantine them (the
badRecordsPath pattern) and assert an acceptable corruption rate
instead of discovering it downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
_RESCUE = "_corrupt_record"


def read_turns_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = TURN_SCHEMA,
) -> DataFrame:
    """Read a JSONL turn stream under the explicit schema; malformed
    lines land whole in ``_corrupt_record`` with every typed column
    NULL.  Spark requires the rescued frame to be cached (or the
    rescue column selected) before filtering on it — PERMISSIVE
    rescue is evaluated at parse time, and a filter pushed into the
    scan would otherwise prune the corrupt column away."""
    return (
        spark.read.schema(f"{schema}, {_RESCUE} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _RESCUE)
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the rescue column dropped,
    and the raw text of every malformed line for the quarantine sink.
    The input is cached first — both halves reference the same parse,
    and Spark's corrupt-record rescue requires it (filtering the
    un-cached frame on the rescue column raises AnalysisException by
    design)."""
    raw = raw.cache()
    clean = raw.filter(F.col(_RESCUE).isNull()).drop(_RESCUE)
    bad = raw.filter(F.col(_RESCUE).isNotNull()).select(
        F.col(_RESCUE).alias("raw_line")
    )
    return clean, bad
