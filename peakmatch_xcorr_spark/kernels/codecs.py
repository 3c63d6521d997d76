"""Time-series compression codecs: Gorilla XOR floats + delta-of-delta
timestamps, as vectorized numpy bit-packing (no per-row Python in the
encode hot path).

Based on the published Gorilla paper (Pelkonen et al., "Gorilla: A
Fast, Scalable, In-Memory Time Series Database", VLDB 2015).  The
encoder always emits the explicit control branch ('11' + 5-bit
leading-zero count + 6-bit meaningful-length + meaningful bits) for a
non-zero XOR — a valid encoder choice under the format that keeps the
encode fully vectorizable; '0' is emitted for a zero XOR.

Timestamp packing uses the paper's delta-of-delta buckets:
  dod == 0                  -> '0'
  dod in [-63, 64]          -> '10'  + 7 bits (zigzag-free, offset bias)
  dod in [-255, 256]        -> '110' + 9 bits
  dod in [-2047, 2048]      -> '1110'+ 12 bits
  else                      -> '1111'+ 64 bits (raw two's complement;
                               wider than the paper's 32 so arbitrary
                               microsecond timestamps round-trip)

Both encoders store the first value raw (64 bits) after an 8-byte
big-endian element count.  Round-trip identity is property-tested in
tests/test_codecs.py.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _emit_bitstream(
    fields: np.ndarray, lens: np.ndarray, chunk: int = 1 << 15
) -> bytes:
    """Pack (value, nbits) fields MSB-first into bytes, vectorized.

    fields: uint64 values (only the low ``lens`` bits are written);
    lens: uint64 bit widths, each <= 64.

    Chunked: the per-bit scatter materializes four int64 temporaries
    per emitted BIT (~33 bytes/bit); unchunked, a 1M-value series
    (~40M bits) would allocate ~1.3 GB of transients for a ~5 MB
    output — enough to OOM an executor mid-pack.  Chunking at field
    boundaries with a <8-bit carry bounds the peak at ~40 MB while
    producing byte-identical output (packbits zero-pads only the
    final partial byte, exactly as the single-shot form did)."""
    lens = lens.astype(np.int64)
    if int(lens.sum()) == 0:
        return b""
    out = []
    carry = np.zeros(0, dtype=np.uint8)
    for s in range(0, len(fields), chunk):
        f = fields[s:s + chunk]
        ln = lens[s:s + chunk]
        tot = int(ln.sum())
        if tot == 0:
            continue
        rep_vals = np.repeat(f, ln)
        rep_lens = np.repeat(ln, ln)
        offs = np.concatenate(([0], np.cumsum(ln)[:-1]))
        within = np.arange(tot, dtype=np.int64) - np.repeat(offs, ln)
        shift = (rep_lens - 1 - within).astype(np.uint64)
        bits = ((rep_vals >> shift) & _U64(1)).astype(np.uint8)
        bits = np.concatenate((carry, bits)) if len(carry) else bits
        nbytes_bits = len(bits) // 8 * 8
        out.append(np.packbits(bits[:nbytes_bits]).tobytes())
        carry = bits[nbytes_bits:]
    if len(carry):
        out.append(np.packbits(carry).tobytes())
    return b"".join(out)


def _window_table(raw: np.ndarray) -> np.ndarray:
    """win[i] = big-endian uint64 starting at byte i (8-lane widened
    window; shared by the sequential reader and the vectorized
    gather)."""
    padded = np.concatenate((raw, np.zeros(8, dtype=np.uint8)))
    return sum(
        padded[k : k + len(raw) + 1].astype(np.uint64) << np.uint64(8 * (7 - k))
        for k in range(8)
    )


def _clz_tz(xs: np.ndarray, lz_cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Leading/trailing-zero counts of NONZERO uint64 xors via 32-bit
    halves — float64 log2 is unsafe for >53-bit values, so bit_length
    cannot be taken in one double.  ``lz_cap`` caps the leading-zero
    count to the layout's field width (31 for the 5-bit stream field,
    62 for the columnar layout, whose 63 is the zero-XOR sentinel)."""
    hi = (xs >> _U64(32)).astype(np.uint32)
    lo = (xs & _U64(0xFFFFFFFF)).astype(np.uint32)
    lz32_hi = 31 - np.floor(np.log2(hi + (hi == 0))).astype(np.int64)
    lz32_lo = 31 - np.floor(np.log2(lo + (lo == 0))).astype(np.int64)
    lzv = np.where(hi != 0, lz32_hi, 32 + np.where(lo != 0, lz32_lo, 32))
    lzv = np.minimum(lzv, lz_cap)
    low = xs & (~xs + _U64(1))
    t_hi = (low >> _U64(32)).astype(np.uint32)
    t_lo = (low & _U64(0xFFFFFFFF)).astype(np.uint32)
    tzv = np.where(
        t_lo != 0,
        np.floor(np.log2(t_lo + (t_lo == 0))).astype(np.int64),
        32 + np.floor(np.log2(t_hi + (t_hi == 0))).astype(np.int64),
    )
    return lzv, tzv


class _BitReader:
    """Sequential MSB-first bit reader for decode (decode is inherently
    sequential: field lengths depend on prior control bits).

    Implementation: one widened uint64 window per starting byte,
    precomputed vectorized — read(n<=57) is two shifts and a mask,
    no per-bit Python."""

    __slots__ = ("win", "nbits", "pos")

    def __init__(self, data: bytes):
        raw = np.frombuffer(data, dtype=np.uint8)
        self.nbits = len(raw) * 8
        self.win = _window_table(raw)
        self.pos = 0

    def read(self, n: int) -> int:
        if n <= 57:
            byte, bit = divmod(self.pos, 8)
            v = (int(self.win[byte]) >> (64 - bit - n)) & ((1 << n) - 1)
            self.pos += n
            return v
        hi = self.read(32)
        return (hi << (n - 32)) | self.read(n - 32)


def gorilla_encode(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode a float64 series.  Vectorized."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(_U64)
    n = len(v)
    header = n.to_bytes(8, "big")
    if n == 0:
        return header
    x = v[1:] ^ v[:-1]
    nz = x != 0
    lz = np.zeros(len(x), dtype=np.uint64)
    tz = np.zeros(len(x), dtype=np.uint64)
    if nz.any():
        xs = x[nz]
        lzv, tzv = _clz_tz(xs, lz_cap=31)  # 5-bit field cap, per the paper
        lz[nz] = lzv.astype(np.uint64)
        tz[nz] = tzv.astype(np.uint64)
    mlen = np.where(nz, 64 - lz - tz, 0).astype(np.uint64)
    # 6-bit meaningful-length field: 64 wraps to 0, decoder maps 0 -> 64
    mfield = mlen & _U64(63)
    # control+lz+mlen field: '11'<<11 | lz<<6 | mfield  (13 bits) for
    # non-zero xor; single '0' bit otherwise
    ctrl = np.where(
        nz,
        (_U64(3) << _U64(11)) | (lz << _U64(6)) | mfield,
        _U64(0),
    ).astype(_U64)
    ctrl_len = np.where(nz, 13, 1).astype(np.uint64)
    # mask shift must stay < 64: zero-xor lanes have mlen=0, give them
    # a dummy shift of 0 (their where-branch is discarded anyway)
    mask_shift = np.where(nz, _U64(64) - mlen, _U64(0)).astype(_U64)
    mbits = np.where(nz, (x >> tz) & (_MASK64 >> mask_shift), _U64(0)) if len(x) else x
    # interleave: first raw value, then per-delta [ctrl, meaningful]
    fields = np.empty(1 + 2 * len(x), dtype=_U64)
    lens = np.empty(1 + 2 * len(x), dtype=np.uint64)
    fields[0] = v[0]
    lens[0] = 64
    fields[1::2] = ctrl
    lens[1::2] = ctrl_len
    fields[2::2] = mbits
    lens[2::2] = mlen
    return header + _emit_bitstream(fields, lens)


def gorilla_decode(data: bytes) -> np.ndarray:
    n = int.from_bytes(data[:8], "big")
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(data[8:])
    prev = r.read(64)
    out[0] = prev
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        r.read(1)  # second control bit (always 1 in this encoder)
        lz = r.read(5)
        mlen = r.read(6) or 64
        tz = 64 - lz - mlen
        x = r.read(mlen) << tz
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def dod_encode(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 microsecond timestamps.  Vectorized."""
    t = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = len(t)
    header = n.to_bytes(8, "big")
    if n == 0:
        return header
    fields_list = [np.array([t[0]], dtype=np.int64).view(_U64)]
    lens_list = [np.array([64], dtype=np.uint64)]
    if n >= 2:
        delta = np.diff(t)
        dod = np.diff(np.concatenate(([0], delta)))  # first dod = first delta
        zero = dod == 0
        b7 = ~zero & (dod >= -63) & (dod <= 64)
        b9 = ~zero & ~b7 & (dod >= -255) & (dod <= 256)
        b12 = ~zero & ~b7 & ~b9 & (dod >= -2047) & (dod <= 2048)
        b64 = ~zero & ~b7 & ~b9 & ~b12
        du = dod.view(_U64)
        # bucket payloads bias negative range into unsigned fields
        f = np.where(
            zero, _U64(0),
            np.where(b7, (_U64(2) << _U64(7)) | ((du + _U64(63)) & _U64(0x7F)),
            np.where(b9, (_U64(6) << _U64(9)) | ((du + _U64(255)) & _U64(0x1FF)),
            np.where(b12, (_U64(14) << _U64(12)) | ((du + _U64(2047)) & _U64(0xFFF)),
            _U64(15)))),
        ).astype(_U64)
        flen = np.where(zero, 1, np.where(b7, 9, np.where(b9, 12, np.where(b12, 16, 4)))).astype(np.uint64)
        # 64-bit escape: control nibble then raw dod
        extra = du
        extra_len = np.where(b64, 64, 0).astype(np.uint64)
        fields = np.empty(2 * len(dod), dtype=_U64)
        lens = np.empty(2 * len(dod), dtype=np.uint64)
        fields[0::2] = f
        lens[0::2] = flen
        fields[1::2] = extra
        lens[1::2] = extra_len
        fields_list.append(fields)
        lens_list.append(lens)
    return header + _emit_bitstream(
        np.concatenate(fields_list), np.concatenate(lens_list)
    )


def dod_decode(data: bytes) -> np.ndarray:
    n = int.from_bytes(data[:8], "big")
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(data[8:])
    # all arithmetic mod 2^64: the encoder's int64 deltas wrap, so the
    # decoder must wrap identically for inputs spanning > 2^63
    m = 1 << 64
    u = r.read(64)
    out[0] = u - m if u >= (1 << 63) else u
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
        delta = (delta + dod) % m
        u = (u + delta) % m
        out[i] = u - m if u >= (1 << 63) else u
    return out


# ---------------------------------------------------------------- columnar

def _extract_fields(payload: bytes, offs_bits: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized variable-width bitfield extraction at known offsets:
    the decode-side dual of _emit_bitstream.  lens <= 57 per field
    (callers split wider fields)."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    win = _window_table(raw)
    byte = (offs_bits // 8).astype(np.int64)
    bit = (offs_bits % 8).astype(np.uint64)
    lens_u = lens.astype(np.uint64)
    mask = np.where(
        lens_u > 0,
        (~np.uint64(0)) >> (np.uint64(64) - np.maximum(lens_u, 1)),
        np.uint64(0),
    )
    return (win[byte] >> (np.uint64(64) - bit - lens_u)) & mask


def gorilla_encode_columnar(values: np.ndarray) -> bytes:
    """Gorilla XOR compression in a COLUMNAR layout: the control /
    leading-zero / meaningful-length fields live in their own packed
    sections, so decode is one vectorized gather instead of a
    sequential bit walk.  Same compression idea and ratio class as the
    stream layout; use for read-heavy packed tiers.

    Layout: [n:8][first:8][lz 6b × n-1][ml 7b × n-1][payload bits]
    (lz=63 sentinel means zero XOR → no payload bits; ml field holds
    the true meaningful length 0..64)."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(_U64)
    n = len(v)
    header = n.to_bytes(8, "big")
    if n == 0:
        return header
    first = bytes(v[0:1].byteswap().tobytes())
    if n == 1:
        return header + first
    x = v[1:] ^ v[:-1]
    nz = x != 0
    lz = np.full(len(x), 63, dtype=np.uint64)  # 63 = zero-XOR sentinel
    ml = np.zeros(len(x), dtype=np.uint64)
    tz = np.zeros(len(x), dtype=np.uint64)
    if nz.any():
        xs = x[nz]
        lzv, tzv = _clz_tz(xs, lz_cap=62)  # 63 reserved for the sentinel
        lz[nz] = lzv.astype(np.uint64)
        tz[nz] = tzv.astype(np.uint64)
        ml[nz] = np.uint64(64) - lz[nz] - tz[nz]
    lz_sec = _emit_bitstream(lz, np.full(len(x), 6, dtype=np.uint64))
    ml_sec = _emit_bitstream(ml, np.full(len(x), 7, dtype=np.uint64))
    safe_shift = np.where(nz, np.uint64(64) - np.maximum(ml, 1), np.uint64(0))
    mbits = np.where(nz, (x >> tz) & (_MASK64 >> safe_shift), _U64(0))
    payload = _emit_bitstream(mbits, ml)
    return (
        header + first
        + len(lz_sec).to_bytes(4, "big") + lz_sec
        + len(ml_sec).to_bytes(4, "big") + ml_sec
        + payload
    )


def gorilla_decode_columnar(data: bytes) -> np.ndarray:
    n = int.from_bytes(data[:8], "big")
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = np.frombuffer(data[8:16], dtype=">u8").astype(np.uint64)[0]
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)
    pos = 16
    lz_len = int.from_bytes(data[pos : pos + 4], "big"); pos += 4
    lz_sec = data[pos : pos + lz_len]; pos += lz_len
    ml_len = int.from_bytes(data[pos : pos + 4], "big"); pos += 4
    ml_sec = data[pos : pos + ml_len]; pos += ml_len
    payload = data[pos:]
    m = n - 1
    lz = _extract_fields(lz_sec, np.arange(m, dtype=np.int64) * 6,
                         np.full(m, 6, dtype=np.int64))
    ml = _extract_fields(ml_sec, np.arange(m, dtype=np.int64) * 7,
                         np.full(m, 7, dtype=np.int64)).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(ml)[:-1]))
    # fields can be up to 64 bits: split into two <=32-bit halves
    hi_len = np.minimum(ml, 32)
    lo_len = ml - hi_len
    hi = _extract_fields(payload, offs, hi_len)
    lo = _extract_fields(payload, offs + hi_len, lo_len)
    mbits = (hi << lo_len.astype(np.uint64)) | lo
    tz = np.where(lz == 63, 0, 64 - lz.astype(np.int64) - ml)
    x = np.where(lz == 63, np.uint64(0), mbits << tz.astype(np.uint64))
    # prefix-XOR scan reconstructs the values
    out = np.bitwise_xor.accumulate(np.concatenate(([first], x)))
    return out.view(np.float64)


def dod_encode_columnar(ts_us: np.ndarray) -> bytes:
    """Columnar delta-of-delta: 3-bit bucket codes in one section,
    bucket payloads in another — vectorized decode like the columnar
    Gorilla layout.  Buckets: 0→dod=0 (no payload), 1→7b, 2→9b,
    3→12b, 4→64b raw."""
    t = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = len(t)
    header = n.to_bytes(8, "big")
    if n == 0:
        return header
    first = t[0:1].view(_U64).byteswap().tobytes()
    if n == 1:
        return header + first
    delta = np.diff(t)
    dod = np.diff(np.concatenate(([0], delta)))
    zero = dod == 0
    b7 = ~zero & (dod >= -63) & (dod <= 64)
    b9 = ~zero & ~b7 & (dod >= -255) & (dod <= 256)
    b12 = ~zero & ~b7 & ~b9 & (dod >= -2047) & (dod <= 2048)
    cat = np.select([zero, b7, b9, b12], [0, 1, 2, 3], default=4).astype(np.uint64)
    widths = np.array([0, 7, 9, 12, 64], dtype=np.uint64)[cat.astype(np.int64)]
    du = dod.view(_U64)
    payload_vals = np.select(
        [zero, b7, b9, b12],
        [_U64(0), (du + _U64(63)) & _U64(0x7F),
         (du + _U64(255)) & _U64(0x1FF), (du + _U64(2047)) & _U64(0xFFF)],
        default=du,
    ).astype(_U64)
    cat_sec = _emit_bitstream(cat, np.full(len(dod), 3, dtype=np.uint64))
    payload = _emit_bitstream(payload_vals, widths)
    return (
        header + first + len(cat_sec).to_bytes(4, "big") + cat_sec + payload
    )


def dod_decode_columnar(data: bytes) -> np.ndarray:
    n = int.from_bytes(data[:8], "big")
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first_u = np.frombuffer(data[8:16], dtype=">u8").astype(np.uint64)[0]
    if n == 1:
        return np.array([first_u], dtype=np.uint64).view(np.int64)
    pos = 16
    cat_len = int.from_bytes(data[pos : pos + 4], "big"); pos += 4
    cat_sec = data[pos : pos + cat_len]; pos += cat_len
    payload = data[pos:]
    m = n - 1
    cat = _extract_fields(cat_sec, np.arange(m, dtype=np.int64) * 3,
                          np.full(m, 3, dtype=np.int64)).astype(np.int64)
    widths = np.array([0, 7, 9, 12, 64], dtype=np.int64)[cat]
    offs = np.concatenate(([0], np.cumsum(widths)[:-1]))
    hi_len = np.minimum(widths, 32)
    lo_len = widths - hi_len
    hi = _extract_fields(payload, offs, hi_len)
    lo = _extract_fields(payload, offs + hi_len, lo_len)
    raw = (hi << lo_len.astype(np.uint64)) | lo
    dod_u = np.select(
        [cat == 0, cat == 1, cat == 2, cat == 3],
        [np.uint64(0), raw - np.uint64(63), raw - np.uint64(255),
         raw - np.uint64(2047)],
        default=raw,
    ).astype(np.uint64)
    # wrap-consistent reconstruction: all arithmetic mod 2^64
    delta = np.bitwise_and(np.cumsum(dod_u, dtype=np.uint64), _MASK64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = first_u
    out[1:] = first_u + np.cumsum(delta, dtype=np.uint64)
    return out.view(np.int64)


# -------------------------------------------------------------- simple8b

# (count, bits) per 4-bit selector — the classic simple8b table with
# 60 payload bits per 64-bit word.  Selectors 0/1 are run encodings of
# ZEROS (240 / 120 of them): rollup count tiers are gap-heavy, and a
# silent day of 1-minute buckets is then 6 words instead of 24.
_S8B_TABLE: list[tuple[int, int]] = [
    (240, 0), (120, 0), (60, 1), (30, 2), (20, 3), (15, 4), (12, 5),
    (10, 6), (8, 7), (7, 8), (6, 10), (5, 12), (4, 15), (3, 20),
    (2, 30), (1, 60),
]
_S8B_MAX = (1 << 60) - 1


def s8b_encode(values: np.ndarray) -> bytes:
    """Simple8b-pack a non-negative int64 sequence (counts) into
    64-bit words: 4-bit selector + 60 payload bits, greedy
    largest-fitting-selector per word (Anh & Moffat's Simple-8b, the
    integer codec InfluxDB/TimescaleDB use for counter columns).

    The loop advances one WORD per iteration (≤ 16 slice-max probes
    each), so a 720-bucket series costs ~30 iterations, not 720 —
    values themselves are packed with one vectorized shift-or.  Fit
    checks are integer compares (v < 2^bits), never float log2: a
    power-of-two count must not round into the wrong width."""
    v = np.asarray(values, dtype=np.int64)
    if len(v) and (v.min() < 0 or v.max() > _S8B_MAX):
        raise ValueError("s8b_encode: values must be in [0, 2^60)")
    u = v.astype(np.uint64)
    n = len(u)
    out = [np.uint64(n).tobytes()[::-1]]  # 8-byte big-endian count
    pos = 0
    while pos < n:
        for sel, (cnt, bits) in enumerate(_S8B_TABLE):
            take = min(cnt, n - pos)
            if bits == 0:
                # zero-run selectors must fill their full width from
                # actual zeros (a short tail of zeros falls through
                # to a wider selector)
                if take == cnt and not u[pos : pos + cnt].any():
                    word = np.uint64(sel) << np.uint64(60)
                    out.append(word.tobytes()[::-1])
                    pos += cnt
                    break
                continue
            chunk = u[pos : pos + take]
            if take and chunk.max() >= (np.uint64(1) << np.uint64(bits)):
                continue
            # a partial final word is valid: the decoder stops at the
            # element count, trailing slots decode as zeros and drop
            shifts = (np.arange(take, dtype=np.uint64)) * np.uint64(bits)
            word = np.uint64(sel) << np.uint64(60)
            word |= np.bitwise_or.reduce(chunk << shifts) if take else np.uint64(0)
            out.append(word.tobytes()[::-1])
            pos += take
            break
        else:  # pragma: no cover - table ends with 1x60, always fits
            raise AssertionError("simple8b: no selector fit")
    return b"".join(out)


def s8b_decode(data: bytes) -> np.ndarray:
    """Inverse of ``s8b_encode``: one vectorized shift-and per word."""
    n = int.from_bytes(data[:8], "big")
    out = np.empty(n, dtype=np.int64)
    pos = 0
    off = 8
    while pos < n:
        word = np.uint64(int.from_bytes(data[off : off + 8], "big"))
        off += 8
        sel = int(word >> np.uint64(60))
        cnt, bits = _S8B_TABLE[sel]
        take = min(cnt, n - pos)
        if bits == 0:
            out[pos : pos + take] = 0
        else:
            shifts = np.arange(take, dtype=np.uint64) * np.uint64(bits)
            mask = np.uint64((1 << bits) - 1)
            out[pos : pos + take] = ((word >> shifts) & mask).astype(np.int64)
        pos += take
    return out
