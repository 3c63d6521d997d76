from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from peakmatch_xcorr_spark.session import get_spark

    s = get_spark(cores=4, app_name="pytest")
    yield s


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def make_event_signal(rng: np.ndarray, m: int = 400, kind: str = "noise") -> np.ndarray:
    """Seeded synthetic raw event values, int-scaled so the reference's
    int-cast ingest keeps structure (the reference's seismic counts are
    integer-amplitude)."""
    t = np.arange(m)
    if kind == "noise":
        return np.round(rng.normal(0, 1000, m))
    if kind == "burst":
        env = np.exp(-((t - m / 3) ** 2) / (2 * (m / 12) ** 2))
        return np.round(3000 * env * np.sin(2 * np.pi * 3.0 * t / 100))
    raise ValueError(kind)
