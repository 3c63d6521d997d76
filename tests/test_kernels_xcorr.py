from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.config import PeakmatchConf
from peakmatch_xcorr_spark.kernels.signal import featurize
from peakmatch_xcorr_spark.kernels.xcorr import (
    JAVA_DOUBLE_MIN_VALUE,
    brute_force_xcorr_best,
    fft_xcorr,
    fft_xcorr_best,
    get_highest,
    next_power_of_two,
    peakmatch_best,
    prepare_ffts,
)
from tests._java_port import (
    loop_brute_xcorr_best,
    loop_fft_xcorr,
    loop_peakmatch_best,
)
from tests.conftest import make_event_signal

CONF = PeakmatchConf(expected_len=200)


def feats(rng, kind="noise", m=200, conf=CONF):
    return featurize(make_event_signal(rng, m, kind), conf)


def test_next_power_of_two():
    assert next_power_of_two(8000) == 8192
    assert next_power_of_two(8192) == 8192
    assert next_power_of_two(1) == 1
    assert next_power_of_two(3) == 4


def test_get_highest_min_value_quirk():
    # all-negative array returns Double.MIN_VALUE, not the true max
    assert get_highest(np.array([-0.5, -0.9])) == JAVA_DOUBLE_MIN_VALUE
    assert get_highest(np.array([0.3, 0.7])) == 0.7


def test_fft_xcorr_matches_full_complex_fft(rng):
    a, b = feats(rng), feats(rng)
    got = fft_xcorr(a.series, b.series)
    exp = loop_fft_xcorr(a.series, b.series)
    np.testing.assert_allclose(got, exp, atol=1e-10)


def test_fft_xcorr_matches_brute_force(rng):
    for _ in range(5):
        a, b = feats(rng), feats(rng)
        got = fft_xcorr_best(a.series, b.series)
        exp = loop_brute_xcorr_best(a.series, b.series)
        assert got == pytest.approx(exp, abs=1e-9)
        assert got == pytest.approx(
            brute_force_xcorr_best(a.series, b.series), abs=1e-12
        )


def test_identical_signals_xcorr_one(rng):
    a = feats(rng, "burst")
    assert fft_xcorr_best(a.series, a.series) == pytest.approx(1.0, abs=1e-9)


def test_lagged_copy_xcorr_one():
    conf = PeakmatchConf(expected_len=256, normalise_events=False)
    base = np.round(1000 * np.sin(2 * np.pi * np.arange(200) / 25.0))
    a_raw = np.concatenate((base, np.zeros(56)))
    b_raw = np.concatenate((np.zeros(40), base, np.zeros(16)))
    a, b = featurize(a_raw, conf), featurize(b_raw, conf)
    assert fft_xcorr_best(a.series, b.series) == pytest.approx(1.0, abs=1e-9)


def test_precomputed_ffts_agree(rng):
    a, b = feats(rng), feats(rng)
    fwd, _, _ = prepare_ffts(a.series)
    _, rev, _ = prepare_ffts(b.series)
    np.testing.assert_allclose(
        fft_xcorr(a.series, b.series),
        fft_xcorr(a.series, b.series, a_fwd=fwd, b_rev=rev),
        atol=0,
    )


def test_peakmatch_matches_literal_port(rng):
    for kind in ("noise", "burst"):
        for _ in range(5):
            a, b = feats(rng, kind), feats(rng, kind)
            got = peakmatch_best(
                5, a.series, b.series,
                a.max_peaks, a.min_peaks, b.max_peaks, b.min_peaks, b.above_idx,
            )
            exp = loop_peakmatch_best(5, a, b)
            assert got == pytest.approx(exp, rel=1e-12)


def test_peakmatch_stride_one_exact_on_aligned_identical(rng):
    # identical signals, stride 1: peak alignment offset 0 is evaluated,
    # giving the sparse dot product over above-threshold indexes — a
    # lower bound that approaches 1.0 as the threshold set covers energy
    a = feats(rng, "burst")
    got = peakmatch_best(
        1, a.series, a.series,
        a.max_peaks, a.min_peaks, a.max_peaks, a.min_peaks, a.above_idx,
    )
    assert 0.5 < got <= 1.0 + 1e-9


def test_analyse_style_fp_fn(rng):
    """ANALYSE-equivalent accuracy check (AnalyseProcessor.java:34-88):
    planted near-duplicates must survive peakmatch pruning at the
    reference's default thresholds (FN rate 0 on planted pairs)."""
    conf = PeakmatchConf(expected_len=256, normalise_events=False)
    base = np.round(2000 * np.exp(-((np.arange(256) - 90) ** 2) / 800.0)
                    * np.sin(2 * np.pi * np.arange(256) / 20.0))
    events = {}
    # 4 planted near-duplicate variants of the same burst + 6 noise
    for i in range(4):
        noise = np.round(rng.normal(0, 30, 256))
        events[f"dup{i}"] = featurize(base + noise, conf)
    for i in range(6):
        events[f"noise{i}"] = featurize(
            np.round(rng.normal(0, 1000, 256)), conf
        )
    names = sorted(events)
    truth, candidates = set(), set()
    for i, na in enumerate(names):
        for nb in names[i + 1:]:
            a, b = events[na], events[nb]
            exact = fft_xcorr_best(a.series, b.series)
            if exact > conf.final_threshold:
                truth.add((na, nb))
            approx = peakmatch_best(
                conf.sampling_stride, a.series, b.series,
                a.max_peaks, a.min_peaks, b.max_peaks, b.min_peaks, b.above_idx,
            )
            if approx > conf.candidate_threshold:
                candidates.add((na, nb))
    assert truth, "fixture must plant at least one true match"
    false_negatives = truth - candidates
    assert not false_negatives  # FNs are permanent loss (README.md:22)
