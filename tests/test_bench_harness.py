"""Bench-harness defect guards (VERDICT r4 "Next round" items 2 and 5):
compact driver-parseable stdout line, fingerprint-bound synthetic
inputs, kmeans cache hygiene, and the lsh_near_dups oracle
precondition."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pandas as pd
import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_bench()


def test_compact_report_fits_tail_capture(bench):
    """The driver grabs a short stdout tail; round 4's full report
    outgrew it (BENCH_r04.json parsed: null).  The compact line must
    stay under 1500 chars with the contract keys intact even with a
    full-size queries dict."""
    report = {
        "metric": "headline_queries_total",
        "value": 12.3,
        "unit": "sec",
        "queries": {f"query_name_{i:02d}": 1.234 for i in range(20)},
        "sf": 0.1,
        "cpus": 32,
        "rollup_turns_per_sec": 18886,
        "lsh_tier": {"turns_per_sec": 24348, "recall_vs_exact": 0.893},
        "kernel_microbench": {
            "peakmatch_us_per_pair": 1.72, "fft_xcorr_us_per_pair": 7.66,
        },
        "cold_passes": 3,
    }
    compact = bench._compact_report(report)
    line = json.dumps(compact)
    assert len(line) <= 1500, f"compact line {len(line)} chars"
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in compact
    assert compact["rollup_turns_per_sec"] == 18886
    assert compact["lsh_recall_vs_exact"] == 0.893


def test_gen_input_fingerprint_guard(bench, tmp_path):
    """transcripts.parquet + dup_pairs.json are only trusted together:
    a conf change (or tampered meta) regenerates the trio; an intact
    trio is left untouched (no multi-minute regeneration per run)."""
    from peakmatch_xcorr_spark.synth import SynthConf

    wd = str(tmp_path / "in")
    conf = SynthConf(n_convs=8, n_dup_pairs=2, seed=5)
    bench._gen_input(wd, conf)
    assert os.path.exists(f"{wd}/transcripts.parquet")
    pairs0 = json.load(open(f"{wd}/dup_pairs.json"))
    assert len(pairs0) == 2
    meta0 = json.load(open(f"{wd}/meta.json"))

    # intact trio -> no rewrite
    mtime = os.path.getmtime(f"{wd}/transcripts.parquet")
    bench._gen_input(wd, conf)
    assert os.path.getmtime(f"{wd}/transcripts.parquet") == mtime

    # changed conf -> regenerated, truth matches the NEW conf
    conf2 = SynthConf(n_convs=10, n_dup_pairs=3, seed=6)
    bench._gen_input(wd, conf2)
    pairs2 = json.load(open(f"{wd}/dup_pairs.json"))
    assert len(pairs2) == 3
    assert json.load(open(f"{wd}/meta.json"))["fingerprint"] != (
        meta0["fingerprint"]
    )

    # tampered/absent meta -> stale trio is NOT trusted
    os.remove(f"{wd}/meta.json")
    assert not bench._input_is_current(wd, conf2)


def test_kmeans_fit_unpersists_on_midflight_error(spark):
    """A Lloyd iteration that throws must not leak the cached
    unit-vector frame for the session lifetime (ADVICE r4 /
    similarity.py kmeans_fit try/finally)."""
    from peakmatch_xcorr_spark.operators import similarity as sim

    df = spark.createDataFrame(
        pd.DataFrame({
            "vec_id": list(range(12)),
            "embedding": [[float(i), 1.0, -1.0, 0.5] for i in range(12)],
        })
    )
    before = {r.id() for r in
              spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    orig = sim._assign_nearest

    def boom(*a, **k):
        raise RuntimeError("injected mid-iteration failure")

    sim._assign_nearest = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            sim.kmeans_fit(df, k=2, dim=4, max_iter=3)
    finally:
        sim._assign_nearest = orig
    after = {r.id() for r in
             spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after <= before, "kmeans_fit leaked a cached RDD on error"


def test_lsh_near_dups_guard_refuses_large_corpus(spark, tmp_path):
    """The lsh_near_dups oracle is only exhaustive when the natural
    max-cosine precondition can be verified, which is quadratic; the
    query must refuse corpora past the verification cap instead of
    silently betting on an sf0.01-specific fact (ADVICE r4 /
    __spark_entry__ lsh_near_dups)."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    sf_dir = str(tmp_path)
    n = 4001
    pd.DataFrame({
        "vec_id": list(range(n)),
        "embedding": [[float(i % 7), 1.0, 2.0, -1.0] for i in range(n)],
    }).to_parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="> 4000"):
        entrymod._q_lsh_near_dups(spark, sf_dir).collect()
