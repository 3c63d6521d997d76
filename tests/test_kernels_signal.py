from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.config import PeakmatchConf
from peakmatch_xcorr_spark.kernels.signal import crop, featurize, ingest_values
from tests._java_port import loop_featurize
from tests.conftest import make_event_signal

CONF = PeakmatchConf(expected_len=400)


def assert_features_equal(got, exp):
    # float arrays: 1e-12 (numpy pairwise summation vs the reference's
    # sequential sum differs in the last ulp); int outputs: exact
    e_series, e_max, e_min, e_above, e_amp, e_n = exp
    np.testing.assert_allclose(got.series, e_series, rtol=1e-12, atol=1e-18)
    np.testing.assert_array_equal(got.max_peaks, e_max)
    np.testing.assert_array_equal(got.min_peaks, e_min)
    np.testing.assert_array_equal(got.above_idx, e_above)
    assert got.peak_amp == pytest.approx(e_amp, rel=1e-12)
    assert got.n_peaks == e_n


@pytest.mark.parametrize("kind", ["noise", "burst"])
@pytest.mark.parametrize("normalise", [True, False])
def test_featurize_matches_literal_port(kind, normalise, rng):
    conf = PeakmatchConf(expected_len=400, normalise_events=normalise)
    for _ in range(10):
        raw = make_event_signal(rng, 400, kind)
        assert_features_equal(featurize(raw, conf), loop_featurize(raw, conf))


def test_featurize_short_and_long_inputs(rng):
    conf = CONF
    raw = make_event_signal(rng, 350)  # padded to 400
    assert_features_equal(featurize(raw, conf), loop_featurize(raw, conf))
    raw = make_event_signal(rng, 450)  # truncated to 400
    assert_features_equal(featurize(raw, conf), loop_featurize(raw, conf))


def test_int_cast_ingest_truncates_toward_zero():
    out = ingest_values(np.array([1.9, -1.9, 0.5, -0.5]), 4)
    np.testing.assert_array_equal(out, [1.0, -1.0, 0.0, 0.0])


def test_zero_segments_carry_previous_winner():
    # +5 then a crossing, an all-zero negative-side segment (0 counts as
    # non-positive), then positive again: the zero segment re-emits the
    # previous winner (BasicEvent.java loop semantics)
    conf = PeakmatchConf(
        expected_len=8, normalise_events=False, int_cast_ingest=False, top_k_peaks=1
    )
    raw = np.array([0.0, 5.0, 0.0, 0.0, 3.0, -2.0, 1.0, 0.0])
    assert_features_equal(featurize(raw, conf), loop_featurize(raw, conf))


def test_index_zero_never_wins_unless_default():
    # index 0 has the largest |amp| in the first segment but the loop
    # starts comparisons at ii=1 — quirk preserved
    conf = PeakmatchConf(
        expected_len=6, normalise_events=False, int_cast_ingest=False, top_k_peaks=1
    )
    raw = np.array([9.0, 1.0, 2.0, -3.0, 4.0, -1.0])
    assert_features_equal(featurize(raw, conf), loop_featurize(raw, conf))


def test_not_enough_peaks_raises():
    conf = PeakmatchConf(expected_len=8, normalise_events=False, top_k_peaks=5)
    with pytest.raises(ValueError, match="enough peaks"):
        featurize(np.array([1.0, 2, 3, 4, 5, 6, 7, 8]), conf)


def test_crop_window():
    conf = PeakmatchConf(
        crop=True,
        crop_min_peak_range=10,
        crop_max_peak_range=20,
        crop_window_before_peak=5,
        crop_window_after_peak=7,
    )
    d = np.zeros(40)
    d[14] = -9.0  # |peak| inside range
    d[25] = 50.0  # outside range, ignored
    out = crop(d, conf)
    assert len(out) == 12
    assert out[5] == -9.0


def test_crop_out_of_bounds_raises():
    conf = PeakmatchConf(
        crop=True,
        crop_min_peak_range=0,
        crop_max_peak_range=4,
        crop_window_before_peak=5,
        crop_window_after_peak=7,
    )
    with pytest.raises(ValueError, match="crop"):
        crop(np.ones(10), conf)


def test_random_fuzz_vs_port(rng):
    conf = PeakmatchConf(expected_len=64, top_k_peaks=2)
    for _ in range(50):
        raw = np.round(rng.normal(0, 50, 64))
        try:
            got = featurize(raw, conf)
        except ValueError:
            with pytest.raises(ValueError):
                loop_featurize(raw, conf)
            continue
        assert_features_equal(got, loop_featurize(raw, conf))


def test_ingest_java_int_cast_nan_and_saturation():
    """JLS narrowing: (int)NaN == 0; +/-inf and out-of-range values
    saturate to Integer.MIN/MAX_VALUE (code-review r2: np.trunc alone
    propagated NaN through the whole series)."""
    from peakmatch_xcorr_spark.kernels.signal import ingest_values

    out = ingest_values(
        np.array([float("nan"), float("inf"), float("-inf"), 3e9, -3e9, 1.9]),
        6,
    )
    np.testing.assert_array_equal(
        out, [0.0, 2147483647.0, -2147483648.0, 2147483647.0, -2147483648.0, 1.0]
    )
