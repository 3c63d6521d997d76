"""Incremental LSH index refresh (operators/lsh_index.py): delta-only
scoring must reproduce the full-tier result on the same final corpus
(exact parity when no bucket crosses the cap between refreshes), and
cap-crossing clusters must stay connected through the stable
representative."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.config import EngineConf, PeakmatchConf, RollupConf
from peakmatch_xcorr_spark.operators.dedup import connected_components
from peakmatch_xcorr_spark.operators.features import conversation_features
from peakmatch_xcorr_spark.operators.lsh_index import lsh_index_refresh
from peakmatch_xcorr_spark.operators.pairs import lsh_scoped_matches
from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable
from peakmatch_xcorr_spark.synth import SynthConf, generate_transcripts

CONF = EngineConf(
    peakmatch=PeakmatchConf(expected_len=256),
    rollup=RollupConf(activity_curve_len=256),
)
LSH_KW = dict(n_planes=16, bands=8)


@pytest.fixture(scope="module")
def corpus(spark):
    """~34 featurizable conversations with 6 planted near-dup pairs;
    split so that batch B contains one side of several planted pairs
    (the new x old delta is non-trivial)."""
    res = generate_transcripts(SynthConf(n_convs=28, n_dup_pairs=6))
    tdf = spark.createDataFrame(res.transcripts)
    feats = conversation_features(tdf, CONF.peakmatch, "1 minute", 256)
    feats.cache().count()
    # the '-dup' copies sort last, so a suffix split puts every planted
    # pair's duplicate in batch B while its source stays in batch A
    ids = sorted(r.conv_id for r in feats.select("conv_id").collect())
    cut = len(ids) - 4
    a_ids, b_ids = set(ids[:cut]), set(ids[cut:])
    fa = feats.filter(F.col("conv_id").isin(list(a_ids))).cache()
    fb = feats.filter(F.col("conv_id").isin(list(b_ids))).cache()
    return feats, fa, fb, res.dup_pairs, b_ids


def _pairs(df):
    return {
        (r.id_a, r.id_b): r.xcorr for r in df.select("id_a", "id_b", "xcorr").collect()
    }


def test_incremental_equals_full_run(spark, corpus, tmp_path):
    feats, fa, fb, dup_pairs, b_ids = corpus
    index = WarehouseTable(str(tmp_path / "wh"), "lsh_index")
    matches = WarehouseTable(str(tmp_path / "wh"), "lsh_matches")

    cold = lsh_index_refresh(spark, fa, index, matches, CONF.peakmatch, **LSH_KW)
    full_a = lsh_scoped_matches(fa, CONF.peakmatch, **LSH_KW)
    assert _pairs(cold) == pytest.approx(_pairs(full_a), rel=1e-12)

    after = lsh_index_refresh(spark, feats, index, matches, CONF.peakmatch, **LSH_KW)
    full = lsh_scoped_matches(feats, CONF.peakmatch, **LSH_KW)
    got, want = _pairs(after), _pairs(full)
    # batch A's signatures perturb nothing: old x old verdicts carry
    # over verbatim, and the delta adds exactly the full run's pairs
    # that touch batch B (no bucket crosses the cap at this scale)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)
    # every pair in the delta really touches a new conversation
    delta = set(got) - set(_pairs(cold))
    assert delta and all(a in b_ids or b in b_ids for a, b in delta)
    # planted pairs split across the two batches were recovered by the
    # incremental path (same floor as the full tier's planted test)
    split_planted = [p for p in dup_pairs if (p[0] in b_ids) != (p[1] in b_ids)]
    assert split_planted
    found = sum(p in got for p in split_planted)
    assert found / len(split_planted) >= 0.8


def test_noop_refresh_appends_nothing(spark, corpus, tmp_path):
    feats, fa, _fb, _dp, _b = corpus
    index = WarehouseTable(str(tmp_path / "wh2"), "lsh_index")
    matches = WarehouseTable(str(tmp_path / "wh2"), "lsh_matches")
    lsh_index_refresh(spark, fa, index, matches, CONF.peakmatch, **LSH_KW)
    v_index, v_matches = index.current_version(), matches.current_version()
    again = lsh_index_refresh(spark, fa, index, matches, CONF.peakmatch, **LSH_KW)
    assert index.current_version() == v_index
    assert matches.current_version() == v_matches
    assert again.count() == matches.read(spark).count()


def test_cap_crossing_cluster_stays_connected(spark, corpus, tmp_path):
    """Batch A plants a 3-clone cluster (in-cap: pairwise-scored);
    batch B adds 6 more clones, pushing every shared bucket over a
    max_bucket of 4.  A full re-run would star-score where the first
    batch scored pairwise — the documented boundary effect — but the
    cluster must remain ONE connected component."""
    feats, _fa, _fb, _dp, _b = corpus
    one = feats.orderBy("conv_id").limit(1).cache()

    def clones(tag, n):
        out = None
        for i in range(n):
            c = one.withColumn(
                "conv_id", F.concat(F.lit(f"{tag}{i:02d}-"), "conv_id")
            )
            out = c if out is None else out.unionByName(c)
        return out

    base = feats.unionByName(clones("w1-", 3)).cache()
    grown = base.unionByName(clones("w2-", 6)).cache()
    index = WarehouseTable(str(tmp_path / "wh3"), "lsh_index")
    matches = WarehouseTable(str(tmp_path / "wh3"), "lsh_matches")
    kw = dict(n_planes=16, bands=4, max_bucket=4)
    lsh_index_refresh(spark, base, index, matches, CONF.peakmatch, **kw)
    final = lsh_index_refresh(spark, grown, index, matches, CONF.peakmatch, **kw)
    comps = connected_components(final).toPandas().set_index("id")["component"]
    clone_ids = [
        r.conv_id for r in grown.select("conv_id").collect()
        if r.conv_id.startswith(("w1-", "w2-"))
    ] + [one.collect()[0].conv_id]
    assert all(cid in comps.index for cid in clone_ids)
    assert len({comps[cid] for cid in clone_ids}) == 1
    # score-once: no duplicate pair rows across the two refreshes
    keys = [(r.id_a, r.id_b) for r in final.select("id_a", "id_b").collect()]
    assert len(keys) == len(set(keys))
