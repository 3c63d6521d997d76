from __future__ import annotations

import numpy as np
import pytest

from peakmatch_xcorr_spark.config import PeakmatchConf
from peakmatch_xcorr_spark.kernels.signal import featurize
from peakmatch_xcorr_spark.kernels.xcorr import fft_xcorr_best, peakmatch_best
from peakmatch_xcorr_spark.kernels.xcorr_batch import (
    fft_xcorr_block,
    peakmatch_block,
)
from tests.conftest import make_event_signal

CONF = PeakmatchConf(expected_len=200)


def _feats(rng, n, kind="noise"):
    out = []
    while len(out) < n:
        try:
            out.append(featurize(make_event_signal(rng, 200, kind), CONF))
        except ValueError:
            pass
    return out


def test_peakmatch_block_matches_per_pair(rng):
    a = _feats(rng, 6)
    b = _feats(rng, 5, "burst")
    mat = peakmatch_block(
        np.stack([f.series for f in a]),
        np.stack([f.max_peaks for f in a]),
        np.stack([f.min_peaks for f in a]),
        np.stack([f.series for f in b]),
        np.stack([f.max_peaks for f in b]),
        np.stack([f.min_peaks for f in b]),
        [f.above_idx for f in b],
        CONF.sampling_stride,
    )
    for i, fa in enumerate(a):
        for j, fb in enumerate(b):
            exp = peakmatch_best(
                CONF.sampling_stride, fa.series, fb.series,
                fa.max_peaks, fa.min_peaks, fb.max_peaks, fb.min_peaks,
                fb.above_idx,
            )
            assert mat[i, j] == pytest.approx(exp, rel=1e-12, abs=1e-15)


def test_peakmatch_block_empty_above_set(rng):
    a = _feats(rng, 2)
    b = _feats(rng, 2)
    mat = peakmatch_block(
        np.stack([f.series for f in a]),
        np.stack([f.max_peaks for f in a]),
        np.stack([f.min_peaks for f in a]),
        np.stack([f.series for f in b]),
        np.stack([f.max_peaks for f in b]),
        np.stack([f.min_peaks for f in b]),
        [np.empty(0, dtype=np.int64), b[1].above_idx],
        CONF.sampling_stride,
    )
    assert (mat[:, 0] == 0.0).all()  # empty index set → sum 0 > init -1


def test_fft_block_matches_per_pair(rng):
    a = _feats(rng, 4)
    b = _feats(rng, 7, "burst")
    mat = fft_xcorr_block(
        np.stack([f.series for f in a]),
        np.stack([f.series for f in b]),
        chunk=3,  # force chunk boundary handling
    )
    for i, fa in enumerate(a):
        for j, fb in enumerate(b):
            assert mat[i, j] == pytest.approx(
                fft_xcorr_best(fa.series, fb.series), abs=1e-10
            )
