"""Pure-numpy numeric kernels.

Every reference-parity quirk (int-cast ingest, signed peak sort,
``Double.MIN_VALUE`` max-init, integer-division frequency indexing,
stride-over-index-array) is implemented exactly once in this package
and unit-tested directly; the Spark operators only ever call these.
"""

from peakmatch_xcorr_spark.kernels.signal import (  # noqa: F401
    EventFeatures,
    crop,
    featurize,
    ingest_values,
)
from peakmatch_xcorr_spark.kernels.xcorr import (  # noqa: F401
    JAVA_DOUBLE_MIN_VALUE,
    brute_force_xcorr_best,
    fft_xcorr,
    fft_xcorr_best,
    get_highest,
    next_power_of_two,
    peakmatch_best,
    prepare_ffts,
)
