from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.operators.dtw import dtw_batch, dtw_pair_scores


def dtw_scalar(a: np.ndarray, b: np.ndarray, band: int | None = None) -> float:
    """Textbook O(n^2) DP, one pair, full matrix."""
    n = len(a)
    r = n - 1 if band is None else band
    D = np.full((n, n), np.inf)
    for i in range(n):
        for j in range(max(0, i - r), min(n, i + r + 1)):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i, j] = c
                continue
            best = np.inf
            if i > 0:
                best = min(best, D[i - 1, j])
            if j > 0:
                best = min(best, D[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, D[i - 1, j - 1])
            D[i, j] = c + best
    return float(D[n - 1, n - 1])


@pytest.mark.parametrize("band", [None, 3, 8])
def test_batch_matches_scalar_dp(rng, band):
    n, P = 24, 16
    A = np.round(rng.normal(0, 10, (P, n)))
    B = np.round(rng.normal(0, 10, (P, n)))
    got = dtw_batch(A, B, band)
    exp = np.array([dtw_scalar(A[p], B[p], band) for p in range(P)])
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_identity_and_symmetry(rng):
    A = rng.normal(0, 5, (4, 30))
    assert np.all(dtw_batch(A, A, 5) == 0.0)
    B = rng.normal(0, 5, (4, 30))
    np.testing.assert_allclose(
        dtw_batch(A, B, 5), dtw_batch(B, A, 5), atol=1e-12
    )


def test_stretch_is_warping_equal():
    # duplicate elements = time stretch: DTW must be exactly 0 even
    # though the series are NOT equal (this is what xcorr cannot do)
    a = np.array([1.0, 4.0, 2.0, 7.0, 3.0, 5.0])
    stretched = np.repeat(a, 2)[: len(a) * 2]
    padded_a = np.concatenate([a, np.full(len(a), a[-1])])
    d = dtw_batch(padded_a[None, :], stretched[None, :], band=len(a))
    assert d[0] == 0.0
    # sanity: plain Euclidean of the same two vectors is far from 0
    assert np.abs(padded_a - stretched).sum() > 1.0


def test_band_monotone(rng):
    a = np.round(rng.normal(0, 10, 20))
    b = np.round(rng.normal(0, 10, 20))
    ds = [dtw_batch(a[None], b[None], r)[0] for r in (1, 3, 6, None)]
    assert all(ds[i] >= ds[i + 1] - 1e-12 for i in range(len(ds) - 1))


def test_band_zero_is_euclidean_l1(rng):
    a = rng.normal(0, 1, 15)
    b = rng.normal(0, 1, 15)
    assert dtw_batch(a[None], b[None], 0)[0] == pytest.approx(
        np.abs(a - b).sum(), abs=1e-12
    )


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        dtw_batch(np.zeros((2, 5)), np.zeros((2, 6)), 2)


def test_pair_scores_operator(spark, rng):
    n = 32
    curves = {}
    base = np.round(rng.normal(0, 10, n))
    curves["c0"] = base
    # warping-equal: stretch the first half, truncate to n
    curves["c1"] = np.repeat(base, 2)[:n]
    curves["c2"] = np.round(rng.normal(0, 10, n))
    rows = [(k, [float(x) for x in v]) for k, v in curves.items()]
    cdf = spark.createDataFrame(rows, "conv_id string, series array<double>")
    pdf = spark.createDataFrame(
        [("c0", "c1"), ("c0", "c2"), ("c1", "c2")], "id_a string, id_b string"
    )
    out = {
        (r["id_a"], r["id_b"]): r["dtw"]
        for r in dtw_pair_scores(pdf, cdf, band=n - 1).collect()
    }
    assert len(out) == 3
    exp01 = dtw_scalar(curves["c0"], curves["c1"])
    assert out[("c0", "c1")] == pytest.approx(exp01, abs=1e-9)
    assert out[("c0", "c2")] == pytest.approx(
        dtw_scalar(curves["c0"], curves["c2"]), abs=1e-9
    )
    # random pair is far from zero
    assert out[("c0", "c2")] > 1.0


def test_pair_scores_z_norm(spark, rng):
    n = 16
    a = np.round(rng.normal(0, 10, n))
    b = 3.0 * a + 7.0  # affine copy: z-normed DTW must be 0
    cdf = spark.createDataFrame(
        [("x", [float(v) for v in a]), ("y", [float(v) for v in b])],
        "conv_id string, series array<double>",
    )
    pdf = spark.createDataFrame([("x", "y")], "id_a string, id_b string")
    (row,) = dtw_pair_scores(pdf, cdf, band=4, z_norm=True).collect()
    assert row["dtw"] == pytest.approx(0.0, abs=1e-9)
