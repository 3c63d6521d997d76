from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.operators.motif import (
    matrix_profile,
    matrix_profile_tier,
)


def brute_profile(v: np.ndarray, m: int, excl: int):
    """Literal O(n^2 * m) definition: z-normalize every window, take
    the min Euclidean distance over admissible pairs."""
    v = np.asarray(v, float)
    n = len(v) - m + 1
    Z = np.empty((n, m))
    flat = np.zeros(n, dtype=bool)
    for i in range(n):
        w = v[i : i + m]
        s = w.std()
        if s <= 1e-12 * max(1.0, abs(w.mean())):
            flat[i] = True
            Z[i] = 0.0
        else:
            Z[i] = (w - w.mean()) / s
    prof = np.full(n, np.inf)
    idx = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        for j in range(n):
            if abs(i - j) < excl:
                continue
            if flat[i] and flat[j]:
                d = 0.0
            elif flat[i] or flat[j]:
                d = float(np.sqrt(m))
            else:
                d = float(np.linalg.norm(Z[i] - Z[j]))
            if d < prof[i]:
                prof[i] = d
                idx[i] = j
    return prof, idx


@pytest.mark.parametrize("m,excl", [(8, 4), (12, 3), (16, None)])
def test_matrix_profile_matches_brute_force(rng, m, excl):
    v = np.round(rng.normal(50, 20, 120))
    prof, idx = matrix_profile(v, m, excl)
    ez = excl if excl is not None else max(1, m // 2)
    bp, bidx = brute_profile(v, m, ez)
    np.testing.assert_allclose(prof, bp, atol=1e-7)
    # neighbor indices may legitimately differ only between ties; check
    # the distance each index implies, not the index itself
    for i in range(len(idx)):
        j, k = int(idx[i]), int(bidx[i])
        assert abs(i - j) >= ez and abs(i - k) >= ez


def test_planted_exact_motif_wins(rng):
    v = np.round(rng.normal(0, 100, 200))
    m = 16
    v[130 : 130 + m] = v[40 : 40 + m]  # exact repeat, far apart
    prof, idx = matrix_profile(v, m)
    a = int(np.argmin(prof))
    assert {a, int(idx[a])} == {40, 130}
    assert prof[a] < 1e-4


def test_flat_window_conventions():
    # two flat windows -> 0; flat vs varying -> sqrt(m)
    v = np.concatenate([np.full(20, 5.0), np.arange(20.0), np.full(20, 9.0)])
    m = 10
    prof, idx = matrix_profile(v, m, excl=5)
    # window 0 (flat at 5) matches any other fully-flat window at 0 —
    # the nearest admissible one also sits in the flat run
    assert prof[0] == 0.0
    j = int(idx[0])
    w = v[j : j + m]
    assert w.std() <= 1e-12 and j >= 5
    # a mid-ramp window's nearest flat distance is exactly sqrt(m) only
    # if nothing varying is closer; just assert every profile entry is
    # finite and admissible
    assert np.isfinite(prof).all()


def test_exclusion_zone_blocks_trivial_matches(rng):
    # a smooth series: adjacent windows are near-identical, so without
    # the zone every profile entry would be ~0
    t = np.arange(100)
    v = np.sin(t / 7.0) * 100
    prof, _ = matrix_profile(v, 12, excl=6)
    assert prof.min() >= 0.0
    bp, _ = brute_profile(v, 12, 6)
    np.testing.assert_allclose(prof, bp, atol=1e-7)


def test_too_short_series_raises():
    with pytest.raises(ValueError):
        matrix_profile(np.arange(10.0), 9, excl=4)


def test_tier_operator_matches_kernel(spark, rng):
    m = 12
    rows = []
    series = {}
    for key in ("a", "b"):
        v = np.round(rng.normal(100, 30, 90)).astype(np.int64)
        if key == "a":
            v[60 : 60 + m] = v[10 : 10 + m]
        series[key] = v
        rows += [(key, 1000 + i, int(x)) for i, x in enumerate(v)]
    # a key too short for any admissible pair must emit nothing
    rows += [("tiny", i, 1) for i in range(m + 2)]
    dense = spark.createDataFrame(rows, "conv_id string, b long, v long")
    out = {
        r["conv_id"]: r
        for r in matrix_profile_tier(dense, ["conv_id"], m=m).collect()
    }
    assert set(out) == {"a", "b"}
    for key, v in series.items():
        prof, idx = matrix_profile(v.astype(float), m)
        mo = int(np.argmin(prof))
        di = int(np.argmax(prof))
        r = out[key]
        assert r["L"] == 90 and r["n_windows"] == 90 - m + 1
        assert {r["motif_a"] - 1000, r["motif_b"] - 1000} == {mo, int(idx[mo])}
        assert r["motif_dist"] == pytest.approx(prof[mo], abs=1e-9)
        assert r["discord_b"] - 1000 == di
        assert r["discord_dist"] == pytest.approx(prof[di], abs=1e-9)
    a = out["a"]
    assert {a["motif_a"] - 1000, a["motif_b"] - 1000} == {10, 60}
    assert a["motif_dist"] < 1e-4
