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
from peakmatch_xcorr_spark.operators.pairs import peakmatch_scores
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
    166-258).  Returns the full up-to-date pair table."""
    all_pairs_needed = (
        features.select(F.col("conv_id").alias("id_a"))
        .crossJoin(features.select(F.col("conv_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    if saved.current_version() is not None:
        existing = saved.read(spark)
        missing = all_pairs_needed.join(
            existing.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        )
    else:
        existing = None
        missing = all_pairs_needed
    if missing.limit(1).count() == 0:
        return existing
    # compute exact scores for all pairs, keep only missing ones
    # (block-local FFT batching; the semi-join prunes persisted pairs)
    exact = peakmatch_scores(features, conf, n_blocks, exact=True)
    delta = exact.join(missing, ["id_a", "id_b"], "left_semi")
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
    cands = approx.filter(F.col("score") > conf.candidate_threshold)
    if saved is not None:
        exact = refresh_saved_xcorr(spark, sample, saved, conf, n_blocks)
    else:
        exact = peakmatch_scores(sample, conf, n_blocks, exact=True)
    truth = exact.filter(F.col("score") > conf.final_threshold)

    n_pairs = approx.count()
    n_cand = cands.count()
    n_truth = truth.count()
    key = ["id_a", "id_b"]
    n_fp = cands.join(truth, key, "left_anti").count()
    n_fn = truth.join(cands, key, "left_anti").count()
    return spark.createDataFrame(
        [
            {
                "pairs": n_pairs,
                "candidates": n_cand,
                "truth_matches": n_truth,
                "false_positives": n_fp,
                "false_negatives": n_fn,
                "fp_rate": n_fp / n_cand if n_cand else 0.0,
                "fn_rate": n_fn / n_truth if n_truth else 0.0,
                "prune_rate": 1.0 - n_cand / n_pairs if n_pairs else 0.0,
            }
        ]
    )
