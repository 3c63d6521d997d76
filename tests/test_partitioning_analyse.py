from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.config import EngineConf, PeakmatchConf, RollupConf
from peakmatch_xcorr_spark.operators.analyse import (
    analyse_accuracy,
    refresh_saved_xcorr,
)
from peakmatch_xcorr_spark.operators.features import conversation_features
from peakmatch_xcorr_spark.operators.partitioning import (
    repartition_by_ts_range,
    salted_two_phase_rollup,
)
from peakmatch_xcorr_spark.operators.rollup import tumbling_rollup
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable
from peakmatch_xcorr_spark.synth import SynthConf, generate_transcripts

CONF = EngineConf(
    peakmatch=PeakmatchConf(expected_len=256),
    rollup=RollupConf(activity_curve_len=256),
)


@pytest.fixture(scope="module")
def tdf(spark):
    res = generate_transcripts(SynthConf(n_convs=10, n_dup_pairs=2))
    df = spark.createDataFrame(res.transcripts)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def feats(spark, tdf):
    f = conversation_features(tdf, CONF.peakmatch, "1 minute", 256)
    f.cache().count()
    return f


def test_salted_rollup_equals_plain(spark, tdf):
    """The two-phase salted rollup (skew path) must be value-identical
    to the plain rollup — including for the planted giant conv."""
    plain = (
        tumbling_rollup(tdf, ["conv_id"], "ts", None, "1 minute")
        .toPandas().sort_values(["conv_id", "bucket_start"]).reset_index(drop=True)
    )
    salted = (
        salted_two_phase_rollup(tdf, "1 minute", salt_buckets=16)
        .toPandas().sort_values(["conv_id", "bucket_start"]).reset_index(drop=True)
    )
    assert len(plain) == len(salted)
    assert (plain.turns.to_numpy() == salted.turns.to_numpy()).all()
    assert (plain.conv_id.to_numpy() == salted.conv_id.to_numpy()).all()


def test_ts_range_repartition_sorts_ranges(spark, tdf):
    parts = repartition_by_ts_range(tdf, 4)
    assert parts.rdd.getNumPartitions() == 4
    # range partitioning: per-partition ts ranges must not overlap
    bounds = (
        parts.rdd.mapPartitionsWithIndex(
            lambda i, it: [
                (i, min(r.ts for r in rows), max(r.ts for r in rows))
                for rows in [list(it)] if rows
            ]
        ).collect()
    )
    bounds.sort()
    for (_, _, hi), (_, lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo


def test_analyse_accuracy_report(spark, feats):
    rep = analyse_accuracy(spark, feats, CONF.peakmatch, n_blocks=4).toPandas().iloc[0]
    n = feats.count()
    assert rep.pairs == n * (n - 1) // 2
    assert rep.false_negatives == 0  # planted dups survive at defaults
    assert 0 <= rep.prune_rate <= 1
    assert rep.truth_matches >= 2  # the planted pairs


def test_saved_xcorr_incremental_append(spark, feats, tmp_path):
    saved = WarehouseTable(str(tmp_path / "wh"), "xcorr_saved")
    sub = feats.limit(6).cache()
    full1 = refresh_saved_xcorr(spark, sub, saved, CONF.peakmatch, n_blocks=4)
    v1 = saved.current_version()
    n1 = full1.count()
    assert n1 == 6 * 5 // 2
    # second refresh with the same features: nothing missing, no append
    full2 = refresh_saved_xcorr(spark, sub, saved, CONF.peakmatch, n_blocks=4)
    assert saved.current_version() == v1
    assert full2.count() == n1
    # widen the feature set: only the delta pairs get appended
    full3 = refresh_saved_xcorr(spark, feats, saved, CONF.peakmatch, n_blocks=4)
    n = feats.count()
    assert full3.count() == n * (n - 1) // 2
    assert saved.current_version() == v1 + 1
    appended = saved.snapshot(saved.current_version()).metrics["rows_appended"]
    assert appended == n * (n - 1) // 2 - n1


def test_saved_xcorr_delta_is_join_path_with_exact_parity(spark, feats, tmp_path):
    """The incremental refresh must (a) score the delta through the
    pair-list join (cost ∝ |missing|, physical plan has NO cogroup —
    the old shape recomputed ALL pairs then semi-joined) and (b) agree
    with the blocked-cogroup exact kernel to float precision."""
    from peakmatch_xcorr_spark.operators.features import fft_precache
    from peakmatch_xcorr_spark.operators.pairs import (
        exact_pair_scores,
        peakmatch_scores,
    )

    saved = WarehouseTable(str(tmp_path / "wh2"), "xcorr_saved")
    sub = feats.limit(6).cache()
    refresh_saved_xcorr(spark, sub, saved, CONF.peakmatch, n_blocks=4)
    full = refresh_saved_xcorr(spark, feats, saved, CONF.peakmatch, n_blocks=4)

    # parity: every saved score equals the cogroup-exact score
    cg = peakmatch_scores(feats, CONF.peakmatch, n_blocks=4, exact=True)
    merged = (
        full.withColumnRenamed("score", "s_saved")
        .join(cg.withColumnRenamed("score", "s_cg"), ["id_a", "id_b"])
        .toPandas()
    )
    assert len(merged) == full.count()
    np.testing.assert_allclose(
        merged.s_saved.to_numpy(), merged.s_cg.to_numpy(), rtol=0, atol=1e-9
    )

    # plan shape: the delta path is joins + mapInPandas, never cogroup
    ffts = fft_precache(feats)
    pairs = full.select("id_a", "id_b").limit(3)
    plan = exact_pair_scores(pairs, ffts)._jdf.queryExecution().toString()
    assert "FlatMapCoGroupsInPandas" not in plan


def test_pair_key_universe_is_blocked_no_bnlj(spark, feats):
    """The xcorr.saved missing-list derivation enumerates the pair-key
    universe through the hash-block equi-join (blocked_pair_keys), so
    the plan must contain NO BroadcastNestedLoopJoin or
    CartesianProduct — the r2 crossJoin shape was driver-plannable as
    BNLJ.  Coverage must stay exact: every unordered pair exactly
    once."""
    from peakmatch_xcorr_spark.operators.analyse import blocked_pair_keys

    keys = blocked_pair_keys(feats, n_blocks=4)
    plan = keys._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    pdf = keys.toPandas()
    n = feats.count()
    assert len(pdf) == n * (n - 1) // 2
    assert not pdf.duplicated(["id_a", "id_b"]).any()
    assert (pdf.id_a < pdf.id_b).all()


def test_featurize_uses_curve_length_not_expected_len(spark):
    """Code-review r2: a conf whose expected_len differs from the
    activity-curve length (the EngineConf default: 4000 vs 256) must
    NOT re-pad curves to expected_len — padding would shift the
    mean-center across thousands of zeros and distort every peak."""
    from peakmatch_xcorr_spark.operators.features import conversation_features
    from peakmatch_xcorr_spark.synth import SynthConf, generate_transcripts

    res = generate_transcripts(SynthConf(n_convs=6, n_dup_pairs=1, giant_conv=False))
    tdf = spark.createDataFrame(res.transcripts)
    f_default = conversation_features(
        tdf, PeakmatchConf(), "1 minute", 256  # expected_len stays 4000
    ).toPandas().set_index("conv_id").sort_index()
    f_exact = conversation_features(
        tdf, PeakmatchConf(expected_len=256), "1 minute", 256
    ).toPandas().set_index("conv_id").sort_index()
    assert list(f_default.index) == list(f_exact.index)
    for cid in f_default.index:
        a, b = f_default.loc[cid], f_exact.loc[cid]
        assert len(a.series) == 256
        np.testing.assert_array_equal(np.asarray(a.series), np.asarray(b.series))
        np.testing.assert_array_equal(np.asarray(a.max_peaks), np.asarray(b.max_peaks))
