"""The spark-submit --py-files artifact: build dist/pxs.zip and prove
the engine imports AND runs from the zip alone.

``spark-submit --py-files pxs.zip`` prepends the archive to every
Python worker's sys.path; CPython then imports the package through
zipimport.  These tests reproduce that mechanism faithfully: a child
interpreter whose cwd is a scratch dir (so the repo checkout is NOT
importable) and whose PYTHONPATH contains only the zip.  The Spark
test exercises the executor-side import too — featurize_curves'
mapInPandas body does ``from peakmatch_xcorr_spark.kernels.signal
import featurize`` inside the UDF, so the worker process must resolve
the package from the zip exactly as a cluster executor would.
"""
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
import package as pkgtool  # noqa: E402


@pytest.fixture(scope="module")
def pxs_zip(tmp_path_factory):
    out = tmp_path_factory.mktemp("dist") / "pxs.zip"
    return pkgtool.build(str(out), root=REPO)


def _run_from_zip(zip_path: str, code: str, cwd: str) -> str:
    env = dict(os.environ, PYTHONPATH=zip_path)
    env.pop("PYTHONSTARTUP", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def test_zip_is_deterministic(pxs_zip, tmp_path):
    again = pkgtool.build(str(tmp_path / "again.zip"), root=REPO)
    with open(pxs_zip, "rb") as a, open(again, "rb") as b:
        assert a.read() == b.read()
    names = zipfile.ZipFile(pxs_zip).namelist()
    assert "peakmatch_xcorr_spark/__init__.py" in names
    assert "peakmatch_xcorr_spark/kernels/xcorr.py" in names
    assert all(n.endswith(".py") for n in names)
    assert not any("__pycache__" in n for n in names)


def test_kernels_import_and_run_from_zip(pxs_zip, tmp_path):
    code = """
import sys
import numpy as np
import peakmatch_xcorr_spark as p
assert "pxs.zip" in p.__file__, p.__file__
from peakmatch_xcorr_spark.kernels.xcorr import (
    brute_force_xcorr_best, fft_xcorr_best)
rng = np.random.default_rng(7)
a, b = rng.standard_normal(256), rng.standard_normal(256)
exact, fast = brute_force_xcorr_best(a, b), fft_xcorr_best(a, b)
assert abs(exact - fast) < 1e-9, (exact, fast)
print("ZIP_KERNEL_OK", round(fast, 6))
"""
    out = _run_from_zip(pxs_zip, code, str(tmp_path))
    assert "ZIP_KERNEL_OK" in out


def test_spark_job_runs_from_zip(pxs_zip, tmp_path):
    # End-to-end from the zip: transcripts -> activity curves ->
    # featurize (worker-side package import inside the mapInPandas UDF).
    code = """
import sys
from pyspark.sql import SparkSession
import peakmatch_xcorr_spark as p
assert "pxs.zip" in p.__file__, p.__file__
from peakmatch_xcorr_spark.config import PeakmatchConf
from peakmatch_xcorr_spark.operators.features import (
    activity_curves, featurize_curves)

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
rows = [
    (f"c{i}", j, "user" if j % 2 == 0 else "assistant", f"t{j}", "",
     float(i * 10000 + j * 90))
    for i in range(6) for j in range(40)
]
df = spark.createDataFrame(
    rows, "conv_id string, turn_idx int, role string, text string, "
    "tool string, epoch double"
).selectExpr("conv_id", "turn_idx", "role", "text", "tool",
             "timestamp_seconds(epoch) as ts")
curves = activity_curves(df, bucket="1 minute", curve_len=64)
feats = featurize_curves(
    curves, PeakmatchConf(expected_len=64, int_cast_ingest=False),
    series_len=64)
got = {r["conv_id"]: r for r in feats.collect()}
assert len(got) == 6 and all(r["ok"] for r in got.values()), got.keys()
assert all(len(r["series"]) == 64 for r in got.values())
print("ZIP_SPARK_OK", len(got))
spark.stop()
"""
    out = _run_from_zip(pxs_zip, code, str(tmp_path))
    assert "ZIP_SPARK_OK 6" in out
