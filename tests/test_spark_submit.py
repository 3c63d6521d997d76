"""North-rule evidence: the job ships via ``spark-submit --py-files``
(a zipped package artifact + run_job.py), exactly as it would on a
real cluster — not just via in-process sessions."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile

import pytest

from peakmatch_xcorr_spark.synth import SynthConf, generate_transcripts

SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_rollup(tmp_path):
    res = generate_transcripts(SynthConf(n_convs=8, n_dup_pairs=1, giant_conv=False))
    inp = tmp_path / "transcripts.parquet"
    res.transcripts.to_parquet(inp, index=False)

    artifact = tmp_path / "pxs.zip"
    with zipfile.ZipFile(artifact, "w", zipfile.ZIP_DEFLATED) as z:
        import pathlib

        pkg = pathlib.Path("peakmatch_xcorr_spark")
        for p in pkg.rglob("*.py"):
            z.write(p, p.as_posix())

    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", str(artifact), "run_job.py",
            "rollup", "--input", str(inp),
            "--warehouse", str(tmp_path / "wh"),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    m = json.loads(last)
    assert m["status"] == "refreshed"
    assert m["1m"]["rows"] > 0 and m["1d"]["rows"] > 0
