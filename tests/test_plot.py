"""PLOT1D/PLOT2D formatter parity (Plot1DProcessor.java:42-106):
structure, gradient indexing, axis ticks — pure numpy, no Spark."""

from __future__ import annotations

import numpy as np

from peakmatch_xcorr_spark.config import SpectralConf
from peakmatch_xcorr_spark.plot import (
    ROWS,
    SPACING,
    VERTICAL,
    plot1d,
    plot1d_event,
    plot2d_event,
)

CONF = SpectralConf()


def sine(freq_hz: float, m: int = 800, sr: int = 100, amp: float = 100.0):
    t = np.arange(m) / sr
    return amp * np.sin(2 * np.pi * freq_hz * t)


def test_tiny_mode_shape_and_gradient():
    means = np.array([0.0, 1.0, 2.0, 4.0])
    out = plot1d("ev1", means, CONF, tiny=True)
    assert out.startswith("ev1\t") and out.endswith("#")
    body = out[len("ev1\t"):-1]
    assert len(body) == 4
    # max band gets the full block, zero band a space (index = 8*m/max)
    assert body[0] == VERTICAL[0]
    assert body[3] == VERTICAL[-1]
    assert body[1] == VERTICAL[(len(VERTICAL) - 1) * 1 // 4]


def test_full_mode_rows_and_axis():
    means = np.array([1.0, 3.0, 2.0] * 5)  # 15 bands
    out = plot1d("ev2", means, CONF)
    lines = out.splitlines()
    assert lines[0] == "ev2"
    assert len(lines) == 1 + ROWS + 1  # name + 20 rows + axis
    # rows print highest threshold first; row labels 10-wide
    first_row = lines[1]
    assert first_row[:10].endswith(" ")
    assert float(first_row[:10]) == max(means) * (ROWS - 1) / ROWS
    # the bottom row (threshold 0) is fully filled
    assert lines[ROWS].count("▊") == len(means)
    # axis ticks every SPACING columns at band_hz*i + filter_below_hz
    axis = lines[-1]
    assert axis.strip().startswith("hz")
    assert f"|{CONF.filter_below_hz:.3f}" in axis
    assert f"|{CONF.frequency_band_hz * SPACING + CONF.filter_below_hz:.3f}" in axis


def test_plot1d_event_highlights_planted_band():
    out = plot1d_event("sine7", sine(7.0), CONF, tiny=True)
    body = out.split("\t")[1][:-1]
    # the 7 Hz band ((7-1)/0.5 = 12th band) carries the peak gradient
    peak_idx = body.index(VERTICAL[-1])
    assert abs(peak_idx - 12) <= 1


def test_plot2d_event_one_line_per_bucket():
    d = np.concatenate([sine(3.0, 400), sine(9.0, 400)])
    out = plot2d_event("ev3", d, 4.0, CONF)
    lines = out.splitlines()
    assert lines[0] == "ev3"
    assert len(lines) == 3  # two 4s buckets at 100 Hz
    assert lines[1].startswith("t000 ") and lines[2].startswith("t001 ")
    # energy moves from low bands to high bands between buckets
    b0 = lines[1][5:].index(VERTICAL[-1])
    b1 = lines[2][5:].index(VERTICAL[-1])
    assert b0 < b1
