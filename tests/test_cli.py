"""Smoke tests for the spark-submit CLI: one per mode, completing the
reference's 9-mode dispatch parity (XCorrProcessor.java:141-160)."""

from __future__ import annotations

import json

import pytest

from peakmatch_xcorr_spark.__main__ import main
from peakmatch_xcorr_spark.synth import SynthConf, generate_transcripts


@pytest.fixture(scope="module")
def cli_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    res = generate_transcripts(SynthConf(n_convs=12, n_dup_pairs=2))
    inp = str(root / "transcripts.parquet")
    spark.createDataFrame(res.transcripts).write.mode("overwrite").parquet(inp)
    return {
        "input": inp,
        "warehouse": str(root / "wh"),
        "dup": res.dup_pairs[0],
    }


def _run(capsys, cli_env, mode, *extra):
    main([
        mode, "--input", cli_env["input"], "--warehouse", cli_env["warehouse"],
        "--blocks", "4", "--cores", "4", *extra,
    ])
    return capsys.readouterr().out.strip().splitlines()[-1]


def test_cli_xcorr(capsys, cli_env):
    a, b = cli_env["dup"]
    out = _run(capsys, cli_env, "xcorr", "--events", a, b)
    assert float(out) > 0.7  # planted dup pair correlates strongly


def test_cli_peakmatch_then_postprocess(capsys, cli_env):
    out = json.loads(_run(capsys, cli_env, "peakmatch"))
    assert out["candidates"] >= 2
    out = json.loads(_run(capsys, cli_env, "postprocess"))
    assert out["matches"] >= 2


def test_cli_fused_then_dedup(capsys, cli_env):
    out = json.loads(_run(capsys, cli_env, "fused"))
    assert out["matches"] >= 2
    out = json.loads(_run(capsys, cli_env, "dedup"))
    assert out["rows"] > 0


def test_cli_bruteforce(capsys, cli_env):
    out = json.loads(_run(capsys, cli_env, "bruteforce"))
    assert out["matches"] >= 2  # the planted dup pairs


def test_cli_analyse(capsys, cli_env):
    rep = json.loads(_run(capsys, cli_env, "analyse"))
    assert rep["false_negatives"] == 0
    assert rep["truth_matches"] >= 2
    assert 0 < rep["prune_rate"] <= 1


def test_cli_fftdom_table_and_stdout(capsys, cli_env):
    out = json.loads(_run(capsys, cli_env, "fftdom"))
    assert out["events"] >= 12
    a, b = cli_env["dup"]
    line = _run(capsys, cli_env, "fftdom", "--events", a)
    assert line.startswith(a + "\t")
    # reference-default bands [1-5] [5-8.5] [8.5-10] (xcorr.conf:58)
    # print three band columns like DominantFreqProcessor.java:142-159:
    # id, freqs, peak_amp, stddev, then 3 tab-separated band means
    assert len(line.split("\t")) == 4 + 3


def test_cli_fftdom_bands_flag(capsys, cli_env):
    a, _ = cli_env["dup"]
    line = _run(capsys, cli_env, "fftdom", "--events", a,
                "--bands", "[1-5]", "[5-7.8]")
    assert len(line.split("\t")) == 4 + 2
    with pytest.raises(SystemExit):
        main(["fftdom", "--input", cli_env["input"], "--bands", "[bad]"])
    assert "expecting hz ranges" in capsys.readouterr().err


def test_cli_cluster(capsys, cli_env):
    out = json.loads(_run(capsys, cli_env, "cluster"))
    assert out["clusters"] >= 1


def test_cli_rollup(capsys, cli_env):
    out = json.loads(_run(capsys, cli_env, "rollup"))
    assert out["status"] == "refreshed"
    out = json.loads(_run(capsys, cli_env, "rollup"))
    assert out["status"] == "up-to-date"


def test_cli_xcorr_requires_two_events(capsys, cli_env):
    a, _ = cli_env["dup"]
    with pytest.raises(SystemExit):
        main(["xcorr", "--input", cli_env["input"], "--events", a])
    assert "exactly 2" in capsys.readouterr().err


def test_cli_downsample_all_methods(capsys, cli_env):
    for method, extra in (
        ("m4", ("--out-bucket", "1 hour")),
        ("lttb", ("--n-out", "5")),
        ("ewma", ("--alpha", "0.4")),
        ("holt", ("--alpha", "0.4", "--beta", "0.2")),
        ("holtwinters", ("--alpha", "0.4", "--beta", "0.2",
                         "--gamma", "0.3", "--period", "6")),
        ("sax", ("--word-len", "4", "--alphabet", "4")),
    ):
        out = json.loads(
            _run(capsys, cli_env, "downsample", "--method", method, *extra)
        )
        assert out["rows"] > 0, method


def test_cli_maintain_delete_expire_compact(capsys, cli_env):
    """End-to-end warehouse maintenance via the CLI: ingest (rollup
    mode), purge one conversation, expire history, compact — each
    step reports JSON metrics and the purge survives on the current
    read."""
    _run(capsys, cli_env, "rollup")  # ensures 'transcripts' table exists
    doomed = cli_env["dup"][0]
    out = json.loads(_run(
        capsys, cli_env, "maintain", "--action", "delete",
        "--table", "transcripts", "--key-col", "conv_id",
        "--delete-keys", doomed,
    ))
    assert out["delete_affected_files"] >= 1
    exp = json.loads(_run(
        capsys, cli_env, "maintain", "--action", "expire", "--keep-last", "1",
        "--table", "transcripts",
    ))
    assert exp["expired_snapshots"] >= 1
    cmp_ = json.loads(_run(
        capsys, cli_env, "maintain", "--action", "compact",
        "--table", "transcripts", "--target-partitions", "1",
    ))
    assert cmp_["rows"] > 0
    # the purged conversation stayed gone through expire + compact
    from peakmatch_xcorr_spark.sources.warehouse import WarehouseTable

    t = WarehouseTable(cli_env["warehouse"], "transcripts")
    import pyspark.sql.functions as F  # noqa: N812

    # read via a fresh session-bound frame
    from peakmatch_xcorr_spark.session import get_spark

    sp = get_spark(4)
    assert t.read(sp).filter(F.col("conv_id") == doomed).count() == 0


def test_cli_maintain_delete_requires_keys(capsys, cli_env):
    with pytest.raises(SystemExit):
        main(["maintain", "--action", "delete", "--warehouse",
              cli_env["warehouse"], "--cores", "4"])


def test_cli_fromconf_runs_reference_conf_verbatim(capsys, cli_env, tmp_path):
    """A reference user's xcorr.conf drives the engine without
    translation: mode comes from the file's mode= line, knobs from
    its keys.  PEAKMATCH via a conf file must produce the same
    candidate count as the explicit CLI invocation."""
    conf_path = tmp_path / "xcorr.conf"
    conf_path.write_text(
        "# comment line\n"
        "mode\t= PEAKMATCH\n"
        "expected-file-line-count = 4000\n"
        "top-k-peaks = 2\n"
        "sampling-stride = 5\n"
        "top-amplitude-threshold = 0.3\n"
        "candidate-threshold = 0.55\n"
        "final-threshold = 0.7\n"
        "normalise-events = true\n"
        "dominantfreq.sample-rate = 100\n"
        "dominantfreq.mean-frequency-amplitude-bands = [1-5] [5-8.5]\n"
    )
    out = json.loads(_run(
        capsys, cli_env, "fromconf", "--conf", str(conf_path),
        "--output", "cands_fromconf",
    ))
    base = json.loads(_run(
        capsys, cli_env, "peakmatch", "--output", "cands_explicit",
    ))
    assert out["candidates"] == base["candidates"]


def test_cli_fromconf_requires_conf_and_rejects_typos(capsys, cli_env, tmp_path):
    with pytest.raises(SystemExit):
        main(["fromconf", "--input", cli_env["input"], "--cores", "4"])
    bad = tmp_path / "bad.conf"
    bad.write_text("mode = PEAKMATCH\ncandidat-threshold = 0.5\n")
    with pytest.raises(SystemExit):
        main(["fromconf", "--conf", str(bad), "--input", cli_env["input"],
              "--warehouse", cli_env["warehouse"], "--cores", "4"])


def test_cli_convstats_all_stats(capsys, cli_env):
    out = json.loads(_run(capsys, cli_env, "convstats"))
    assert out["rows"] > 0  # transitions over the role alphabet
    out = json.loads(_run(
        capsys, cli_env, "convstats", "--stat", "latency",
        "--from-role", "user", "--to-role", "assistant",
    ))
    assert out["rows"] > 0
    # one row per conversation: 12 base + 2 dup copies + the giant
    out = json.loads(_run(capsys, cli_env, "convstats", "--stat", "entropy"))
    assert out["rows"] == 15
    out = json.loads(_run(
        capsys, cli_env, "convstats", "--stat", "ngrams", "--ngram-n", "2",
    ))
    assert out["rows"] > 0


def test_cli_convstats_tool_column(capsys, cli_env):
    """The structure operators are generic over the label alphabet:
    --role-col tool mines tool-call chains instead of role turns."""
    out = json.loads(_run(
        capsys, cli_env, "convstats", "--stat", "ngrams",
        "--ngram-n", "2", "--role-col", "tool",
    ))
    assert out["rows"] > 0


def test_cli_maintain_ndv(capsys, cli_env):
    _run(capsys, cli_env, "rollup")  # ensure the transcripts table exists
    out = json.loads(_run(
        capsys, cli_env, "maintain", "--action", "ndv",
        "--table", "transcripts", "--key-col", "conv_id",
    ))
    assert out["complete"] is True
    assert out["files_indexed"] >= 1
    # 15 conversations; 1024-register sketch is near-exact here
    assert abs(out["est_distinct"] - 15) <= 2


def test_cli_maintain_history(capsys, cli_env):
    _run(capsys, cli_env, "rollup")
    out = json.loads(_run(
        capsys, cli_env, "maintain", "--action", "history",
        "--table", "transcripts",
    ))
    snaps = out["snapshots"]
    assert len(snaps) >= 1
    assert {"version", "operation", "job_id", "live_rows"} <= set(snaps[0])
