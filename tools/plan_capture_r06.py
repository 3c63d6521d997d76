"""Capture .explain("formatted") for every query the r06 optimization
round touched, writing plans/r06/<name>_{before,after}.txt.

Run from a repo root:  python tools/plan_capture_r06.py after
(or ``before`` inside a worktree of the round-start commit; copy the
emitted files into the optimized tree's plans/r06/).

The headline bench closures (rollup_cascade / pack_1h / dedup_xcorr)
are not registry queries, so their DataFrames are rebuilt here exactly
as bench.headline_queries builds them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"


def main() -> None:
    from pyspark.sql import functions as F

    from peakmatch_xcorr_spark.config import EngineConf, PeakmatchConf, RollupConf
    from peakmatch_xcorr_spark.operators.pipeline import (
        find_duplicate_conversations,
    )
    from peakmatch_xcorr_spark.operators.rollup import (
        pack_tier,
        rollup_cascade,
        tumbling_rollup,
    )
    from peakmatch_xcorr_spark.plans import formatted_plan
    from peakmatch_xcorr_spark.session import get_spark

    spark = get_spark(cores=8, app_name="plan_capture", shuffle_partitions=16)
    import __spark_entry__ as entry

    events = spark.read.parquet(f"{SF}/events.parquet")
    conf = EngineConf(
        peakmatch=PeakmatchConf(expected_len=256),
        rollup=RollupConf(activity_curve_len=256),
    )
    transcripts = events.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string"), F.lit("-"),
                 F.pmod(F.col("event_id"), F.lit(8)).cast("string")
                 ).alias("conv_id"),
        "ts",
    )

    def bench_rollup_cascade():
        tiers = rollup_cascade(events, ["user_id"], "ts", "value")
        return tiers["1 day"]

    def bench_pack_1h():
        rolled = tumbling_rollup(
            events, ["user_id"], "ts", "value", "1 hour"
        ).withColumn("user_id", F.col("user_id").cast("string"))
        return pack_tier(rolled, ["user_id"])

    def bench_dedup_xcorr():
        return find_duplicate_conversations(transcripts, conf, n_blocks=None)

    def lsh_tier():
        from peakmatch_xcorr_spark.operators.features import (
            conversation_features,
        )
        from peakmatch_xcorr_spark.operators.pairs import lsh_scoped_matches

        feats = conversation_features(
            transcripts, conf.peakmatch,
            bucket=conf.rollup.activity_bucket,
            curve_len=conf.rollup.activity_curve_len,
        ).cache()
        return lsh_scoped_matches(feats, conf.peakmatch)

    registry = entry.queries()
    targets = {
        "rollup_cascade_1d": bench_rollup_cascade,
        "pack_1h": bench_pack_1h,
        "dedup_xcorr": bench_dedup_xcorr,
        "lsh_tier": lsh_tier,
    }
    for name in (
        "quantile_sketch_values",
        "occupancy_curve",
        "realtime_rollup_1h",
        "funnel_steps",
        "ewma_smooth",
        "rollup_1d_cascade",
    ):
        targets[name] = (lambda f=registry[name]: f(spark, SF))

    os.makedirs(OUT, exist_ok=True)
    for name, fn in targets.items():
        path = os.path.join(OUT, f"{name}_{TAG}.txt")
        try:
            plan = formatted_plan(fn())
        except Exception as exc:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
