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

        from peakmatch_xcorr_spark.kernels.spectral import dominant_frequencies

        for pdf in batches:
            ids, tops, amps, stds, bands = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                d = np.asarray(getattr(row, series_col), dtype=np.float64)
                top, _, std, band_amps = dominant_frequencies(d, spectral)
                ids.append(getattr(row, id_col))
                tops.append(top)
                amps.append(
                    float(getattr(row, peak_amp_col)) if peak_amp_col else float("nan")
                )
                stds.append(std)
                bands.append(band_amps)
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

        from peakmatch_xcorr_spark.kernels.spectral import band_means

        for pdf in batches:
            ids, bands, means = [], [], []
            for i, s in zip(pdf[id_col], pdf[series_col]):
                b, m = band_means(np.asarray(s, dtype=np.float64), spectral)
                ids.extend([i] * len(b))
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
