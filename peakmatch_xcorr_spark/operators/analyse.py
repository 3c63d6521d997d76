"""ANALYSE mode (AnalyseProcessor.java): accuracy + performance
estimation of the peakmatch approximation against exact truth, plus
the xcorr.saved incremental pair cache (S11).

The reference's accuracy pass runs peakmatch on a SAMPLE dataset with
success+rejection collectors, computes exact truth (cached in
xcorr.saved, appending only missing pairs), and reports FP/FN rates
(AnalyseProcessor.java:34-88,166-258).  Engine mapping:

- sample = df.sample(fraction, seed) over features (S4)
- truth cache = a warehouse table of exact pair xcorrs; refresh
  appends ONLY pairs absent from the cache (left_anti), the
  reference's skip-cached pattern
- report = FP/FN/TP counts and rates as a one-row DataFrame
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.config import PeakmatchConf
from peakmatch_xcorr_spark.operators.pairs import (
    blocked_pair_keys,
    peakmatch_scores,
)
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable


def refresh_saved_xcorr(
    spark: SparkSession,
    features: DataFrame,
    saved: WarehouseTable,
    conf: PeakmatchConf,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact xcorr for every pair NOT already in the saved table;
    append the delta (xcorr.saved semantics, AnalyseProcessor.java:
    166-258).  Returns the full up-to-date pair table.

    The pair-key universe is enumerated BLOCKED (the J1 hash-block
    replication, pairs._replicated_sides): the id×id join is an
    equi-join on the (bi, bj) block pair, never a driver-planned
    BroadcastNestedLoopJoin — the same plan shape that keeps the
    kernel stage scalable holds for the key enumeration, so the
    missing-list derivation survives a features table that outgrows
    the ANALYSE sample scope (plan-gated in
    tests/test_partitioning_analyse.py)."""
    all_pairs_needed = blocked_pair_keys(features, n_blocks)
    if saved.current_version() is not None:
        existing = saved.read(spark)
        missing = all_pairs_needed.join(
            existing.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        )
    else:
        existing = None
        missing = all_pairs_needed
    if missing.limit(1).count() == 0:
        if existing is not None:
            return existing
        # cold table AND zero pairs (0/1-conversation features): an
        # empty typed frame, never None — callers chain DataFrame ops
        return spark.createDataFrame(
            [], "id_a string, id_b string, score double"
        )
    if existing is None:
        # cold start: ALL pairs are missing — the blocked cogroup is
        # the cheap plan (per-block FFT batching, zero per-pair FFT
        # array shuffle)
        delta = peakmatch_scores(features, conf, n_blocks, exact=True)
    else:
        # delta-only: score ONLY the missing pairs (skip-cached,
        # AnalyseProcessor.java:190-257) — join the missing pair list
        # to per-event FFTs; cost scales with |missing|, never N²/2
        from peakmatch_xcorr_spark.operators.features import fft_precache
        from peakmatch_xcorr_spark.operators.pairs import exact_pair_scores

        ffts = fft_precache(features)
        delta = exact_pair_scores(missing, ffts).withColumnRenamed(
            "xcorr", "score"
        )
    saved.append(delta, job_id="analyse_saved_xcorr")
    return saved.read(spark)


def analyse_accuracy(
    spark: SparkSession,
    features: DataFrame,
    conf: PeakmatchConf,
    saved: WarehouseTable | None = None,
    sample_fraction: float = 1.0,
    seed: int = 42,
    n_blocks: int = 8,
) -> DataFrame:
    """Accuracy report: peakmatch candidates vs exact truth on a
    sample.  Returns one row: counts + FP/FN rates (the reference
    prints these; we return them relationally, A6)."""
    sample = (
        features.sample(fraction=sample_fraction, seed=seed)
        if sample_fraction < 1.0
        else features
    )
    sample = sample.cache()
    approx = peakmatch_scores(sample, conf, n_blocks)
    if saved is not None:
        exact = refresh_saved_xcorr(spark, sample, saved, conf, n_blocks)
    else:
        exact = peakmatch_scores(sample, conf, n_blocks, exact=True)

    # ONE join + ONE aggregation = ONE action: both quadratic kernels
    # execute exactly once (the previous shape ran 5 actions over the
    # uncached cogroup stage — 5× the kernel bill).  approx holds every
    # sample pair, so the inner join keys the stats to the sample even
    # when the saved table carries extra pairs.
    key = ["id_a", "id_b"]
    j = approx.join(
        exact.withColumnRenamed("score", "exact_score"), key
    )
    is_cand = F.col("score") > conf.candidate_threshold
    is_truth = F.col("exact_score") > conf.final_threshold
    one = F.lit(1)
    stats = j.agg(
        F.count(one).alias("pairs"),
        F.sum(F.when(is_cand, one).otherwise(0)).alias("candidates"),
        F.sum(F.when(is_truth, one).otherwise(0)).alias("truth_matches"),
        F.sum(F.when(is_cand & ~is_truth, one).otherwise(0)).alias(
            "false_positives"
        ),
        F.sum(F.when(is_truth & ~is_cand, one).otherwise(0)).alias(
            "false_negatives"
        ),
    )
    return stats.select(
        "*",
        F.when(
            F.col("candidates") > 0,
            F.col("false_positives") / F.col("candidates"),
        ).otherwise(F.lit(0.0)).alias("fp_rate"),
        F.when(
            F.col("truth_matches") > 0,
            F.col("false_negatives") / F.col("truth_matches"),
        ).otherwise(F.lit(0.0)).alias("fn_rate"),
        F.when(
            F.col("pairs") > 0,
            F.lit(1.0) - F.col("candidates") / F.col("pairs"),
        ).otherwise(F.lit(0.0)).alias("prune_rate"),
    )
