"""Pure-stdlib PNG/WAV codecs: round-trips, every PNG filter type
reconstructed correctly, RGB→luma parity with PIL's integer formula,
unsupported-variant refusal (strict mode relies on these errors)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from peakmatch_xcorr_spark.kernels import media_codecs as mc


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png(w, h, color, filtered_rows: list[bytes], depth=8) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    raw = b"".join(filtered_rows)
    return (mc.PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def test_png_gray_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 23), dtype=np.uint8)
    assert np.array_equal(mc.decode_png_gray(mc.encode_png_gray(img)), img)


def _filter_row(ftype: int, cur: np.ndarray, prior: np.ndarray,
                bpp: int) -> bytes:
    """Apply a PNG filter (encoder side) so the decoder's inverse can
    be checked against ground truth."""
    cur = cur.astype(np.int32)
    prior = prior.astype(np.int32)
    n = len(cur)
    out = np.zeros(n, dtype=np.int32)
    for x in range(n):
        a = cur[x - bpp] if x >= bpp else 0
        b = prior[x]
        c = prior[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[x] = (cur[x] - pred) & 0xFF
    return bytes([ftype]) + out.astype(np.uint8).tobytes()


@pytest.mark.parametrize("color,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_all_filters_all_colortypes(color, ch):
    """One scanline per filter type (0..4), every supported color
    type: the decoder's unfiltering must reproduce the source pixels
    exactly — Paeth/Average/Sub depend on left/up/diagonal state, so
    this catches off-by-bpp errors the roundtrip test cannot (the
    encoder only emits filter 0)."""
    rng = np.random.default_rng(color)
    w, h = 11, 5
    px = rng.integers(0, 256, (h, w * ch), dtype=np.uint8)
    rows = []
    for y in range(h):
        prior = px[y - 1] if y else np.zeros(w * ch, dtype=np.uint8)
        rows.append(_filter_row(y % 5, px[y], prior, ch))
    got = mc.decode_png_gray(_png(w, h, color, rows))
    truth = px.reshape(h, w, ch)
    if color in (0, 4):
        expect = truth[:, :, 0]
    else:
        r = truth[:, :, 0].astype(np.int32)
        g = truth[:, :, 1].astype(np.int32)
        b = truth[:, :, 2].astype(np.int32)
        # PIL's convert("L") fixed-point luma (ImagingConvert.c)
        expect = ((r * 19595 + g * 38470 + b * 7471) >> 16).astype(np.uint8)
    assert np.array_equal(got, expect)


def test_png_unsupported_variants_raise():
    img = np.zeros((4, 4), dtype=np.uint8)
    ok = mc.encode_png_gray(img)
    with pytest.raises(ValueError, match="signature"):
        mc.decode_png_gray(b"notapng" + ok)
    row = b"\x00" + bytes(8)  # 16-bit gray: 4px * 2 bytes
    deep = _png(4, 1, 0, [row], depth=16)
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        mc.decode_png_gray(deep)
    # corrupt IDAT must raise, not return garbage
    bad = ok[:ok.index(b"IDAT") + 8] + b"\x00" * 8
    with pytest.raises(Exception):
        mc.decode_png_gray(bad)


def test_wav_roundtrip_and_tone():
    sr = 8000
    sig = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    payload = mc.encode_wav_pcm16(sig, sr)
    assert mc.is_wav(payload)
    got, got_sr = mc.decode_wav(payload)
    assert got_sr == sr
    assert len(got) == len(sig)
    # 16-bit quantization: max error 1/32767
    assert np.abs(got - sig).max() < 1.0 / 32000


def test_wav_8bit_and_stereo():
    import io
    import wave

    # 8-bit unsigned mono
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(4000)
        wf.writeframes(bytes([128, 255, 0, 128]))
    sig, sr = mc.decode_wav(buf.getvalue())
    assert sr == 4000
    np.testing.assert_allclose(sig, [0.0, 127 / 128, -1.0, 0.0])

    # stereo 16-bit: first channel extracted
    left = np.array([0.1, -0.2, 0.3])
    right = np.array([0.9, 0.9, 0.9])
    inter = np.empty(6)
    inter[0::2], inter[1::2] = left, right
    pcm = np.round(np.clip(inter, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(4000)
        wf.writeframes(pcm.tobytes())
    sig, _ = mc.decode_wav(buf.getvalue())
    np.testing.assert_allclose(sig, left, atol=1e-4)


def test_wav_refuses_non_wav():
    with pytest.raises(ValueError, match="RIFF"):
        mc.decode_wav(b"\x00" * 64)
