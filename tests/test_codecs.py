from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from peakmatch_xcorr_spark.kernels.codecs import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)


def roundtrip_f(values):
    arr = np.asarray(values, dtype=np.float64)
    out = gorilla_decode(gorilla_encode(arr))
    # bit-exact round-trip (NaN payloads included)
    np.testing.assert_array_equal(arr.view(np.uint64), out.view(np.uint64))


def roundtrip_t(values):
    arr = np.asarray(values, dtype=np.int64)
    np.testing.assert_array_equal(arr, dod_decode(dod_encode(arr)))


def test_gorilla_empty_single():
    roundtrip_f([])
    roundtrip_f([3.14159])
    roundtrip_f([0.0])


def test_gorilla_constant_series():
    roundtrip_f(np.full(1000, 42.5))
    # constant series compresses to ~1 bit/value
    enc = gorilla_encode(np.full(1000, 42.5))
    assert len(enc) < 8 + 8 + 1000 // 8 + 2


def test_gorilla_seeded_random(rng):
    roundtrip_f(rng.normal(0, 1e6, 4096))
    roundtrip_f(rng.normal(0, 1e-300, 512))


def test_gorilla_adversarial():
    roundtrip_f([1.0, -1.0, 1.0, -1.0])  # sign flips
    roundtrip_f([5e-324, -5e-324, 0.0, -0.0])  # denormals, signed zero
    roundtrip_f([np.inf, -np.inf, 1.0])
    roundtrip_f([np.nan, 1.0, np.nan])
    roundtrip_f(np.linspace(0, 1, 257))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), max_size=64))
def test_gorilla_property(values):
    roundtrip_f(values)


def test_dod_empty_single():
    roundtrip_t([])
    roundtrip_t([1704067200_000_000])


def test_dod_regular_cadence_compresses():
    ts = 1704067200_000_000 + np.arange(10_000, dtype=np.int64) * 60_000_000
    enc = dod_encode(ts)
    roundtrip_t(ts)
    # constant delta → dod 0 after the first: ~1 bit per point
    assert len(enc) < 8 + 8 + 9 + 10_000 // 8 + 16


def test_dod_gaps_and_jitter(rng):
    base = 1704067200_000_000
    deltas = rng.integers(1, 10_000_000, 500)
    deltas[100] = 86_400_000_000  # one-day gap
    ts = base + np.cumsum(deltas)
    roundtrip_t(ts.astype(np.int64))


def test_dod_negative_and_extremes():
    roundtrip_t([0, -1, -2, 5, 10**17, -(10**17)])
    roundtrip_t([np.iinfo(np.int64).min // 2, 0, np.iinfo(np.int64).max // 2])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=64))
def test_dod_property(values):
    roundtrip_t(values)


def test_bucket_boundaries():
    # exercise every dod bucket boundary exactly
    base = 10**12
    deltas = [100, 100, 100 + 64, 100, 100 - 63, 100 + 256, 100 - 255,
              100 + 2048, 100 - 2047, 100 + 5000, 100 + 10**9]
    ts = np.cumsum([base] + deltas).astype(np.int64)
    roundtrip_t(ts)


def roundtrip_fc(values):
    from peakmatch_xcorr_spark.kernels.codecs import (
        gorilla_decode_columnar,
        gorilla_encode_columnar,
    )

    arr = np.asarray(values, dtype=np.float64)
    out = gorilla_decode_columnar(gorilla_encode_columnar(arr))
    np.testing.assert_array_equal(arr.view(np.uint64), out.view(np.uint64))


def test_columnar_gorilla_cases(rng):
    roundtrip_fc([])
    roundtrip_fc([3.14159])
    roundtrip_fc([0.0, 0.0, 0.0])
    roundtrip_fc(np.full(1000, 42.5))
    roundtrip_fc(rng.normal(0, 1e6, 4096))
    roundtrip_fc([1.0, -1.0, 1.0, -1.0])
    roundtrip_fc([5e-324, -5e-324, 0.0, -0.0])
    roundtrip_fc([np.inf, -np.inf, 1.0, np.nan, 1.0])
    roundtrip_fc(np.linspace(0, 1, 257))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), max_size=64))
def test_columnar_gorilla_property(values):
    roundtrip_fc(values)


def test_columnar_decode_is_fast(rng):
    import time

    from peakmatch_xcorr_spark.kernels.codecs import (
        gorilla_decode,
        gorilla_decode_columnar,
        gorilla_encode,
        gorilla_encode_columnar,
    )

    vals = rng.normal(0, 1e5, 50_000)
    enc_c = gorilla_encode_columnar(vals)
    enc_s = gorilla_encode(vals)
    t0 = time.perf_counter(); gorilla_decode_columnar(enc_c); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); gorilla_decode(enc_s); ts = time.perf_counter() - t0
    assert tc < ts  # the vectorized read path must beat the bit walk


def roundtrip_tc(values):
    from peakmatch_xcorr_spark.kernels.codecs import (
        dod_decode_columnar,
        dod_encode_columnar,
    )

    arr = np.asarray(values, dtype=np.int64)
    np.testing.assert_array_equal(arr, dod_decode_columnar(dod_encode_columnar(arr)))


def test_columnar_dod_cases(rng):
    roundtrip_tc([])
    roundtrip_tc([1704067200_000_000])
    roundtrip_tc(1704067200_000_000 + np.arange(10_000, dtype=np.int64) * 60_000_000)
    deltas = rng.integers(1, 10_000_000, 500)
    deltas[100] = 86_400_000_000
    roundtrip_tc((1704067200_000_000 + np.cumsum(deltas)).astype(np.int64))
    roundtrip_tc([0, -1, -2, 5, 10**17, -(10**17)])
    base = 10**12
    deltas = [100, 100, 100 + 64, 100, 100 - 63, 100 + 256, 100 - 255,
              100 + 2048, 100 - 2047, 100 + 5000, 100 + 10**9]
    roundtrip_tc(np.cumsum([base] + deltas).astype(np.int64))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=64))
def test_columnar_dod_property(values):
    roundtrip_tc(values)


def test_chunked_emit_large_series_roundtrip():
    """_emit_bitstream is chunked (32k fields/chunk) to bound encode
    memory; a 200k-value series crosses many chunk boundaries with
    misaligned bit carries and must still round-trip exactly in BOTH
    layouts (code-review r3: the unchunked form allocated ~33 bytes of
    temporaries per emitted bit — ~1.3 GB for a 1M-value pack)."""
    import numpy as np

    from peakmatch_xcorr_spark.kernels import codecs

    rng = np.random.default_rng(0)
    v = np.round(rng.normal(50, 10, 200_000), 2)
    np.testing.assert_array_equal(
        codecs.gorilla_decode(codecs.gorilla_encode(v)), v
    )
    np.testing.assert_array_equal(
        codecs.gorilla_decode_columnar(codecs.gorilla_encode_columnar(v)), v
    )
    ts = np.cumsum(rng.integers(1, 5000, 200_000)).astype(np.int64)
    np.testing.assert_array_equal(codecs.dod_decode(codecs.dod_encode(ts)), ts)
    np.testing.assert_array_equal(
        codecs.dod_decode_columnar(codecs.dod_encode_columnar(ts)), ts
    )


# -------------------------------------------------------------- simple8b

def test_s8b_empty_single():
    from peakmatch_xcorr_spark.kernels.codecs import s8b_decode, s8b_encode

    assert s8b_decode(s8b_encode(np.array([], dtype=np.int64))).size == 0
    one = np.array([7], dtype=np.int64)
    assert np.array_equal(s8b_decode(s8b_encode(one)), one)


def test_s8b_zero_runs_collapse():
    from peakmatch_xcorr_spark.kernels.codecs import s8b_decode, s8b_encode

    z = np.zeros(960, dtype=np.int64)
    enc = s8b_encode(z)
    # 960 zeros = 4 x 240-run words + 8-byte header
    assert len(enc) == 8 + 4 * 8
    assert np.array_equal(s8b_decode(enc), z)


def test_s8b_poisson_counts_compress(rng):
    from peakmatch_xcorr_spark.kernels.codecs import s8b_decode, s8b_encode

    v = rng.poisson(3, 720).astype(np.int64)
    enc = s8b_encode(v)
    assert np.array_equal(s8b_decode(enc), v)
    assert len(v) * 8 / len(enc) > 10  # ~3-bit values in 64-bit slots


def test_s8b_bounds_rejected():
    from peakmatch_xcorr_spark.kernels.codecs import s8b_encode

    with pytest.raises(ValueError):
        s8b_encode(np.array([-1], dtype=np.int64))
    with pytest.raises(ValueError):
        s8b_encode(np.array([1 << 60], dtype=np.int64))


@given(st.lists(st.integers(min_value=0, max_value=2**60 - 1), max_size=300))
@settings(deadline=None, max_examples=60)
def test_s8b_property(values):
    from peakmatch_xcorr_spark.kernels.codecs import s8b_decode, s8b_encode

    v = np.array(values, dtype=np.int64)
    assert np.array_equal(s8b_decode(s8b_encode(v)), v)


def test_pack_count_tier_roundtrip_spark(spark, rng):
    from peakmatch_xcorr_spark.operators.rollup import (
        pack_count_tier,
        unpack_count_tier,
    )
    import datetime as dt
    import pandas as pd

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for key in ("a", "b"):
        for i in range(500):
            rows.append((key, t0 + dt.timedelta(hours=i),
                         int(rng.poisson(2))))
    pdf = pd.DataFrame(rows, columns=["k", "bucket_start", "turns"])
    pdf["bucket_start"] = pdf["bucket_start"].astype("datetime64[us]")
    tier = spark.createDataFrame(pdf)
    packed = pack_count_tier(tier, ["k"])
    prows = packed.collect()
    assert {r["k"] for r in prows} == {"a", "b"}
    assert all(r["codec"] == "s8b" for r in prows)
    # compression: 500 hourly (ts, count) rows -> well under raw 16B/row
    raw = 500 * 16
    for r in prows:
        assert len(r["ts_packed"]) + len(r["counts_packed"]) < raw / 8
    out = unpack_count_tier(packed, ["k"]).toPandas()
    out = out.sort_values(["k", "bucket_start"]).reset_index(drop=True)
    exp = pdf.sort_values(["k", "bucket_start"]).reset_index(drop=True)
    assert out["turns"].equals(exp["turns"])
    assert (out["bucket_start"] == exp["bucket_start"]).all()
