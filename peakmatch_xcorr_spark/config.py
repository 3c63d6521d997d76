"""Engine configuration.

Mirrors the knobs of the reference's ``EventProcessorConf``
(/root/reference/src/main/java/com/thaze/peakmatch/EventProcessorConf.java:54-114
and xcorr.conf) that survive into the Spark engine, plus engine-only
knobs (rollup tiers, partitioning, codec settings).  Defaults match
the reference's ``xcorr.conf`` defaults where one exists.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PeakmatchConf:
    """Knobs of the peakmatch approximation + xcorr verify pipeline.

    Reference: xcorr.conf:12-49, EventProcessorConf.java:54-114.
    """

    # xcorr.conf:12 expected-file-line-count
    expected_len: int = 4000
    # xcorr.conf:23 top-k-peaks
    top_k_peaks: int = 2
    # xcorr.conf:27 sampling-stride
    sampling_stride: int = 5
    # xcorr.conf:33 top-amplitude-threshold
    top_amplitude_threshold: float = 0.3
    # xcorr.conf:38 candidate-threshold
    candidate_threshold: float = 0.55
    # xcorr.conf:41 final-threshold
    final_threshold: float = 0.7
    # xcorr.conf normalise-events (mean-center before unit-normalise)
    normalise_events: bool = True
    # crop window (Util.crop, Util.java:44-81); disabled by default
    crop: bool = False
    crop_min_peak_range: int = 3500
    crop_max_peak_range: int = 5500
    crop_window_before_peak: int = 700
    crop_window_after_peak: int = 1000
    # reference ingest quirk: (int) Double.parseDouble (BasicEvent.java:50)
    int_cast_ingest: bool = True


@dataclass(frozen=True)
class SpectralConf:
    """Dominant-frequency / band-rollup knobs.

    Reference: EventProcessorConf.java:33-44 + xcorr.conf dominantfreq.*
    """

    sample_rate: int = 100  # dominantfreq.sample-rate
    band_width: float = 0.5  # dominantfreq.band-width (top-freq dedup spacing)
    filter_below_hz: float = 1.0
    filter_above_hz: float = 10.0
    top_freq_count: int = 5
    frequency_band_hz: float = 0.5  # frequency-band-hz (band-mean rollup width)
    # xcorr.conf:58 dominantfreq.mean-frequency-amplitude-bands
    # "[1-5] [5-8.5] [8.5-10]" (parsed at EventProcessorConf.java:97,
    # consumed DominantFreqProcessor.java:114-140)
    mean_amplitude_bands: tuple[tuple[float, float], ...] = (
        (1.0, 5.0),
        (5.0, 8.5),
        (8.5, 10.0),
    )


@dataclass(frozen=True)
class ClusterConf:
    """Clustering knobs (ClusteringProcessor; EventProcessorConf.java:48-51)."""

    k: int = 5  # knn neighbours per node
    eta: float = 0.1  # max edge distance
    centre_threshold: float = 0.1
    max_cluster_size: int = 200  # ClusteringProcessor.java:253


@dataclass(frozen=True)
class RollupConf:
    """Engine-only: tumbling rollup cascade + retention tiers."""

    tiers: tuple[str, ...] = ("1 minute", "1 hour", "1 day")
    tier_names: tuple[str, ...] = ("1m", "1h", "1d")
    # retention horizon per tier, seconds (None = keep forever)
    retention_s: tuple[int | None, ...] = (None, None, None)
    # activity-curve bucket used for near-dup xcorr of conversations
    activity_bucket: str = "1 minute"
    activity_curve_len: int = 256  # fixed-length curve for xcorr kernels


@dataclass(frozen=True)
class EngineConf:
    peakmatch: PeakmatchConf = field(default_factory=PeakmatchConf)
    spectral: SpectralConf = field(default_factory=SpectralConf)
    cluster: ClusterConf = field(default_factory=ClusterConf)
    rollup: RollupConf = field(default_factory=RollupConf)
    # partitioning
    shuffle_partitions: int = 32
    pair_block_size: int = 512  # events per block in the blocked self-join
    salt_buckets: int = 16  # salt fan-out for skewed conv_id


DEFAULT_CONF = EngineConf()
