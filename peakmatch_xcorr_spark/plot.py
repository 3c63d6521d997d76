"""PLOT1D/PLOT2D console debug formatters (Plot1DProcessor.java:42-106,
Plot2DProcessor.java:39-88).

These are NOT dataflow operators — the reference renders band-mean
spectra as ASCII plots to stdout for eyeballing; the engine's
relational forms are band_mean_table / spectrogram_table.  Kept as
driver-side formatters so a reference user has every CLI surface.

Format parity with the reference:
- tiny mode: ``name<TAB>`` + one vertical-gradient char per band + '#'
  (gradient chars EventProcessorConf.PlotGradient.VERTICAL);
- full mode: ROWS=20 threshold rows printed top-down, '▊' (U+258A)
  where the band mean reaches the row's threshold, 10-wide left-padded
  3-decimal row labels, and an 'hz' axis with '|freq' ticks every 10
  columns at ``band_hz*i + filter_below_hz``.
"""

from __future__ import annotations

import numpy as np

from peakmatch_xcorr_spark.config import SpectralConf

ROWS = 20
SPACING = 10
# EventProcessorConf.PlotGradient.VERTICAL (java :160)
VERTICAL = [" ", "▁", "▂", "▃", "▄", "▅",
            "▆", "▇", "█"]
BLOCK = "▊"


def plot1d(
    name: str,
    means: np.ndarray,
    conf: SpectralConf,
    tiny: bool = False,
) -> str:
    """Render one event's band-mean vector the way the reference's
    PLOT1D does.  ``means`` in ascending band order (band_means)."""
    means = np.asarray(means, dtype=np.float64)
    mx = float(means.max()) if len(means) else 0.0
    if tiny:
        if mx <= 0:
            body = " " * len(means)
        else:
            idx = ((len(VERTICAL) - 1) * means / mx).astype(int)
            body = "".join(VERTICAL[i] for i in idx)
        return f"{name}\t{body}#"

    out = [name]
    # threshold rows 0, max/ROWS, 2·max/ROWS … printed highest-first
    thresholds = [i * mx / ROWS for i in range(ROWS)]
    for dd in reversed(thresholds):
        cells = "".join(BLOCK if dd <= m else " " for m in means)
        out.append(f"{dd:.3f} ".rjust(10) + cells)
    axis = "hz ".rjust(10)
    for i in range(0, len(means), SPACING):
        tick = f"|{conf.frequency_band_hz * i + conf.filter_below_hz:.3f}"
        axis += tick.ljust(SPACING)
    out.append(axis)
    return "\n".join(out) + "\n"


def plot1d_event(
    name: str,
    series: np.ndarray,
    conf: SpectralConf,
    tiny: bool = False,
) -> str:
    """series → band means → plot (the per-event path the reference's
    EventAction runs)."""
    from peakmatch_xcorr_spark.kernels.spectral import band_means

    _, means = band_means(np.asarray(series, dtype=np.float64), conf)
    return plot1d(name, means, conf, tiny)


def plot2d_event(
    name: str,
    series: np.ndarray,
    bucket_duration_sec: float,
    conf: SpectralConf,
) -> str:
    """Tumbling-window spectrogram as gradient rows, one line per time
    bucket (Plot2DProcessor.java:39-88 console form)."""
    from peakmatch_xcorr_spark.kernels.spectral import spectrogram_buckets

    lines = [name]
    for bi, (_, norm) in enumerate(
        spectrogram_buckets(np.asarray(series, dtype=np.float64),
                            bucket_duration_sec, conf)
    ):
        mx = float(norm.max()) if len(norm) else 0.0
        if mx <= 0:
            body = " " * len(norm)
        else:
            idx = ((len(VERTICAL) - 1) * norm / mx).astype(int)
            body = "".join(VERTICAL[i] for i in idx)
        lines.append(f"t{bi:03d} {body}")
    return "\n".join(lines) + "\n"
