"""Spark-side spectral operators: the FFTDOMINANTFREQ mode (S8) and
the band-mean rollup as tables.

``dominant_freq_table`` mirrors the reference's per-event output line
(DominantFreqProcessor.java:142-159): event id, top-k deduped
frequencies, peakAmp, stddev of filtered bins, mean amplitude per
configured Hz band — as typed columns instead of a TSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.config import SpectralConf

DOMFREQ_SCHEMA = (
    "id string, top_freqs array<double>, peak_amp double, "
    "stddev double, band_mean_amps array<double>"
)


def dominant_freq_table(
    events: DataFrame,
    spectral: SpectralConf,
    id_col: str = "conv_id",
    series_col: str = "series",
    peak_amp_col: str | None = "peak_amp",
) -> DataFrame:
    """Per-event dominant-frequency features via the A3/A4/A5 kernels
    in one Arrow pass.  peak_amp is taken from the featurized column
    when present (it needs the pre-normalization scale), else NaN."""
    cols = [id_col, series_col] + ([peak_amp_col] if peak_amp_col else [])

    def run(batches):
        import numpy as np
        import pandas as pd

        from peakmatch_xcorr_spark.kernels.spectral import (
            dominant_frequencies_from_half,
            padded_spectra,
        )

        for pdf in batches:
            ids, tops, amps, stds, bands = [], [], [], [], []
            # One FFT per equal-length group (series are fixed-length by
            # config, so this is normally ONE np.fft.rfft per Arrow batch
            # — the features.py fft_precache pattern).
            series = [np.asarray(s, dtype=np.float64) for s in pdf[series_col]]
            lens = np.array([len(s) for s in series], dtype=np.int64)
            # drop zero-length series (ok=false featurization rows
            # share this schema): continue-on-error, don't kill the task
            keep = np.nonzero(lens > 0)[0]
            series = [series[i] for i in keep]
            pdf = pdf.iloc[keep]
            lens = lens[keep]
            halves: list = [None] * len(series)
            ns = np.zeros(len(series), dtype=np.int64)
            for ln in np.unique(lens):
                idx = np.nonzero(lens == ln)[0]
                stacked = np.stack([series[i] for i in idx])
                hs, n = padded_spectra(stacked)
                for j, i in enumerate(idx):
                    halves[i] = hs[j]
                    ns[i] = n
            pa = (
                pdf[peak_amp_col].to_numpy(dtype=np.float64)
                if peak_amp_col
                else np.full(len(series), np.nan)
            )
            for i, ident in enumerate(pdf[id_col]):
                top, _, std, band_amps = dominant_frequencies_from_half(
                    halves[i], int(ns[i]), spectral
                )
                ids.append(ident)
                tops.append(top.tolist())
                amps.append(float(pa[i]))
                stds.append(std)
                bands.append(band_amps.tolist())
            # a batch whose rows were all filtered (zero-length series)
            # must not yield: pandas types empty array-columns float64
            # and pyarrow can't convert that to array<double>
            if ids:
                yield pd.DataFrame(
                    {"id": ids, "top_freqs": tops, "peak_amp": amps,
                     "stddev": stds, "band_mean_amps": bands}
                )

    return events.select(*cols).mapInPandas(run, schema=DOMFREQ_SCHEMA)


def band_mean_table(
    events: DataFrame,
    spectral: SpectralConf,
    id_col: str = "conv_id",
    series_col: str = "series",
) -> DataFrame:
    """Exploded (id, band, mean) rows — the engine-internal relational
    shape of the reference's LinkedHashMap band spectrum (A1)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from peakmatch_xcorr_spark.kernels.spectral import (
            band_means_from_half,
            padded_spectra,
        )

        for pdf in batches:
            ids, bands, means = [], [], []
            series = [np.asarray(s, dtype=np.float64) for s in pdf[series_col]]
            lens = np.array([len(s) for s in series], dtype=np.int64)
            keep = np.nonzero(lens > 0)[0]  # skip ok=false empty series
            series = [series[i] for i in keep]
            pdf = pdf.iloc[keep]
            lens = lens[keep]
            id_vals = list(pdf[id_col])
            for ln in np.unique(lens):
                idx = np.nonzero(lens == ln)[0]
                hs, n = padded_spectra(np.stack([series[i] for i in idx]))
                for j, i in enumerate(idx):
                    b, m = band_means_from_half(hs[j], n, spectral)
                    ids.extend([id_vals[i]] * len(b))
                    bands.extend(b)
                    means.extend(m)
            yield pd.DataFrame({"id": ids, "band": bands, "mean_mag": means})

    return events.select(id_col, series_col).mapInPandas(
        run, schema="id string, band double, mean_mag double"
    )


def spectrogram_table(
    events: DataFrame,
    spectral: SpectralConf,
    bucket_duration_sec: float,
    id_col: str = "conv_id",
    series_col: str = "series",
) -> DataFrame:
    """PLOT2D tumbling-window spectrogram as rows (W7,
    Plot2DProcessor.java:39-88): one row per (event, time bucket,
    frequency band) with the unit-normalized band mean."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from peakmatch_xcorr_spark.kernels.spectral import spectrogram_buckets

        for pdf in batches:
            ids, buckets, bands, mags = [], [], [], []
            for i, s in zip(pdf[id_col], pdf[series_col]):
                for bi, (bs, ms) in enumerate(
                    spectrogram_buckets(
                        np.asarray(s, dtype=np.float64),
                        bucket_duration_sec, spectral,
                    )
                ):
                    ids.extend([i] * len(bs))
                    buckets.extend([bi] * len(bs))
                    bands.extend(bs)
                    mags.extend(ms)
            yield pd.DataFrame(
                {"id": ids, "time_bucket": buckets, "band": bands,
                 "norm_mag": mags}
            )

    return events.select(id_col, series_col).mapInPandas(
        run, schema="id string, time_bucket int, band double, norm_mag double"
    )
