"""Mergeable-sketch operators beyond what the DataFrame API ships.

``quantile_sketch`` is a DDSketch-style RELATIVE-error quantile sketch:
Spark's built-in ``approx_percentile`` bounds RANK error, which in a
long-tailed latency/size distribution lets the p99.9 estimate drift by
orders of magnitude in VALUE; log-boundary buckets bound the value's
relative error by alpha at every quantile instead.  The bucket
histogram is produced map-side in one ``mapInPandas`` pass and merged
with an ordinary groupBy-sum (buckets add — associative/commutative),
so the shuffle moves O(log(max/min)/alpha) rows per partition, never
the data.

``frequent_items_sketch`` is one-pass distributed heavy hitters: the
DataFrame API has HyperLogLog (approx_count_distinct) and quantile
sketches (approx_percentile) built in, but no frequent-items sketch —
finding the top-k tokens of a 100 TB corpus with an exact
groupBy(token) means shuffling one row per distinct token per task,
while the sketch path moves a few KB per partition and never shuffles
the data at all.

Design (the standard candidate+estimate composition):

- per partition (ONE ``mapInPandas`` pass): an exact ``value_counts``
  of the partition (cheap: bounded by the partition), folded into a
  count-min sketch (depth x width int64 matrix) + the partition's
  top-m values kept as candidates (space-saving style: a true global
  heavy hitter is a top-m item of at least one partition whenever
  m >= k / skew; m defaults to 4k for slack);
- merge: CMS matrices ADD element-wise and candidate sets union —
  both associative and commutative, so the reduce is a bounded
  driver-side fold over n_partitions rows of a few KB each (the same
  bounded-collect contract as kmeans' k x dim centroids);
- estimate: each candidate's count = min over depth CMS rows (the
  classic CMS upper-bound estimate: never BELOW the true count,
  above it by at most eps*N with probability 1 - delta, where
  eps = e/width and delta = exp(-depth)).

Hashes are fixed md5-derived per-value integers (no per-session salt),
so results are deterministic across runs, partitionings, and engines.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_P = (1 << 61) - 1  # Mersenne prime for the pairwise-independent family


def _hash_indices(value: str, depth: int, width: int) -> np.ndarray:
    """depth row indices for one value: md5(value) -> 128-bit int,
    passed through depth fixed affine maps mod p mod width.
    Deterministic everywhere (no PYTHONHASHSEED dependence)."""
    x = int.from_bytes(hashlib.md5(value.encode()).digest(), "big") % _P
    # fixed coefficients: affine maps seeded by the row number
    out = np.empty(depth, dtype=np.int64)
    for d in range(depth):
        a = (0x9E3779B97F4A7C15 * (2 * d + 1)) % _P
        b = (0xC2B2AE3D27D4EB4F * (d + 1)) % _P
        out[d] = ((a * x + b) % _P) % width
    return out


_SKETCH_SCHEMA = StructType([
    StructField("cms", BinaryType()),
    StructField("cand_vals", ArrayType(StringType())),
    StructField("cand_counts", ArrayType(LongType())),
])


def _partition_sketches(depth: int, width: int, m: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cms = np.zeros((depth, width), dtype=np.int64)
        counts: dict[str, int] = {}
        for pdf in batches:
            vc = pdf.iloc[:, 0].dropna().astype(str).value_counts()
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
        for v, c in counts.items():
            idx = _hash_indices(v, depth, width)
            cms[np.arange(depth), idx] += c
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        if not counts:
            return  # empty partition: no sketch row (empty-frame guard)
        yield pd.DataFrame({
            "cms": [cms.tobytes()],
            "cand_vals": [[v for v, _ in top]],
            "cand_counts": [[c for _, c in top]],
        })
    return fn


def frequent_items_sketch(
    df: DataFrame,
    col: str,
    k: int = 20,
    width: int = 2048,
    depth: int = 4,
    m: int | None = None,
) -> list[tuple[str, int]]:
    """Top-k values of ``df[col]`` with CMS-estimated counts, one pass,
    no data shuffle.  Returns ``[(value, estimate), ...]`` sorted by
    estimate desc then value — a driver-side list, because the whole
    result is k rows by construction.

    Estimates are CMS upper bounds: >= the true count always, and
    within e/width * N of it with probability 1 - e^-depth.  The
    collected state is bounded: n_partitions x (depth*width*8 bytes
    + m candidates) — independent of data size."""
    if m is None:
        m = 4 * k
    rows = (
        df.select(F.col(col).cast("string"))
        .mapInPandas(_partition_sketches(depth, width, m), _SKETCH_SCHEMA)
        .collect()
    )
    if not rows:
        return []
    cms = np.zeros((depth, width), dtype=np.int64)
    cands: set[str] = set()
    for r in rows:
        cms += np.frombuffer(r["cms"], dtype=np.int64).reshape(depth, width)
        cands.update(r["cand_vals"])
    ests = []
    for v in cands:
        idx = _hash_indices(v, depth, width)
        ests.append((v, int(cms[np.arange(depth), idx].min())))
    ests.sort(key=lambda kv: (-kv[1], kv[0]))
    return ests[:k]


# --------------------------------------------------------------------------
# DDSketch-style relative-error quantile sketch
# --------------------------------------------------------------------------

_QS_SCHEMA = StructType([
    StructField("store", LongType()),   # -1 neg / 0 zero / +1 pos
    StructField("bucket", LongType()),
    StructField("cnt", LongType()),
])


def _qsketch_partition(alpha: float):
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        agg: dict[tuple[int, int], int] = {}
        for pdf in batches:
            x = pdf.iloc[:, 0].dropna().to_numpy(dtype=np.float64)
            if x.size == 0:
                continue
            if not np.isfinite(x).all():
                # log(inf) -> inf whose int64 cast is UNDEFINED (numpy
                # returns INT64_MIN silently) — fail loudly instead of
                # recording a corrupt bucket
                raise ValueError(
                    "quantile_sketch: non-finite value in input column"
                )
            for store, v in ((1, x[x > 0]), (-1, -x[x < 0])):
                if v.size == 0:
                    continue
                b = np.ceil(np.log(v) / lg).astype(np.int64)
                for bk, c in zip(*np.unique(b, return_counts=True)):
                    key = (store, int(bk))
                    agg[key] = agg.get(key, 0) + int(c)
            nz = int((x == 0.0).sum())
            if nz:
                agg[(0, 0)] = agg.get((0, 0), 0) + nz
        if not agg:
            return  # empty partition: no rows (empty-frame guard)
        yield pd.DataFrame(
            {
                "store": [k[0] for k in agg],
                "bucket": [k[1] for k in agg],
                "cnt": list(agg.values()),
            }
        )

    return fn


class QuantileSketch:
    """Merged DDSketch histogram with rank-walk quantile evaluation.

    ``quantile(q)`` returns a value within relative error ``alpha`` of
    the true q-quantile (bucket midpoint ``2*gamma^b/(gamma+1)``), for
    any q, over any distribution — zeros and negatives included (three
    stores, negatives walked in descending bucket order)."""

    def __init__(self, alpha: float, rows: list[tuple[int, int, int]]):
        import math

        self.alpha = alpha
        self._gamma = (1.0 + alpha) / (1.0 - alpha)
        self._mid = 2.0 * self._gamma / (self._gamma + 1.0)
        # ascending value order: neg store by bucket DESC (value
        # -gamma^b grows as b shrinks), then zeros, then pos by bucket
        neg = sorted(((b, c) for s, b, c in rows if s == -1), reverse=True)
        self._zero = sum(c for s, _, c in rows if s == 0)
        pos = sorted((b, c) for s, b, c in rows if s == 1)
        self._neg, self._pos = neg, pos
        self.n = sum(c for _, _, c in rows)

    def _bucket_value(self, b: int, sign: int) -> float:
        # midpoint of (gamma^(b-1), gamma^b]: gamma^b * 2/(gamma+1)
        return sign * (self._gamma ** (b - 1)) * self._mid

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0, 1], got {q}")
        if self.n == 0:
            raise ValueError("empty sketch")
        rank = q * (self.n - 1)
        seen = 0
        for b, c in self._neg:
            seen += c
            if seen > rank:
                return self._bucket_value(b, -1)
        seen += self._zero
        if seen > rank:
            return 0.0
        for b, c in self._pos:
            seen += c
            if seen > rank:
                return self._bucket_value(b, 1)
        return self._bucket_value(self._pos[-1][0], 1)

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if other.alpha != self.alpha:
            raise ValueError("cannot merge sketches with different alpha")
        rows: dict[tuple[int, int], int] = {}
        for sk in (self, other):
            for s, pairs in ((-1, sk._neg), (1, sk._pos)):
                for b, c in pairs:
                    rows[(s, b)] = rows.get((s, b), 0) + c
            rows[(0, 0)] = rows.get((0, 0), 0) + sk._zero
        return QuantileSketch(
            self.alpha, [(s, b, c) for (s, b), c in rows.items() if c]
        )


def quantile_sketch(df: DataFrame, col: str, alpha: float = 0.01) -> QuantileSketch:
    """One-pass distributed relative-error quantile sketch of
    ``df[col]``.  Map-side bucket histograms merge through a plain
    groupBy-sum (partial aggregation applies), and only the merged
    histogram — O(log(max/min)/alpha) rows, independent of data size —
    is collected."""
    rows = (
        df.select(F.col(col).cast("double"))
        .mapInPandas(_qsketch_partition(alpha), _QS_SCHEMA)
        .groupBy("store", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    return QuantileSketch(alpha, [(r["store"], r["bucket"], r["cnt"]) for r in rows])


# --------------------------------------------------------------- HLL tier

HLL_P = 10  # 2^10 = 1024 registers; rsd = 1.04/sqrt(m) ~ 3.25%
_HLL_M = 1 << HLL_P
_HLL_HASH_BITS = 60  # 15 md5 hex digits; BIGINT-safe in every engine
_HLL_W_BITS = _HLL_HASH_BITS - HLL_P  # 50 bits feed the rho estimator
# term exponent scale: register value r contributes 2^(SCALE - r), so
# the harmonic-mean denominator is an EXACT int64 sum (max 1024 terms
# of <= 2^51 < 2^63) instead of a float accumulation whose low bits
# depend on add order — the whole reason this sketch is cross-engine
# hash-checkable where approx_count_distinct is rows-only
_HLL_SCALE = _HLL_W_BITS + 1  # 51: rho in [1, 51] keeps terms >= 1
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)  # Flajolet bias constant


def hll_register_tier(
    df: DataFrame,
    id_col: str,
    ts_col: str = "ts",
    bucket: str = "1 day",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Per-bucket HyperLogLog REGISTER tier: ``(bucket, [keys...],
    idx, r)`` with ``idx`` the register index and ``r`` its max-rho —
    the distinct-count analogue of the engine's rollup tiers.

    The point of materializing registers instead of estimates: a
    register frame is MERGEABLE (max is associative/commutative), so
    "distinct users over any date range" is a groupBy-max over
    |range| x 1024 tiny rows — never a rescan of the raw turn stream.
    That is the sketch-rollup contract TimescaleDB ships as
    hyperloglog()/rollup() and Spark only exposes fused inside
    approx_count_distinct (registers unreachable, hence un-mergeable
    across precomputed tiers).

    Everything is integer codegen expressions: the 60-bit hash is the
    first 15 hex digits of md5 (the repo's cross-engine draw,
    trainprep._uniform_hash), idx its low HLL_P bits, and
    rho = leading-zeros+1 of the remaining 50-bit word via
    ``51 - length(bin(w))`` — bin-length, not floor(log2), because
    log2's last-ulp rounding near powers of two is exactly the
    cross-engine drift the hash contract can't absorb.  (w = 0, prob
    2^-50 per row, yields bin '0' of length 1 -> rho 50 instead of
    51; both engines agree on the same value, and one register held
    one notch low is far inside the sketch's own error.)

    Scale: one hash-aggregate exchange; output is <= buckets x keys x
    1024 rows with map-side partial max — at 10^12 turns the shuffle
    moves rows proportional to the TIER, not the corpus."""
    keys = list(extra_keys or [])
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    # shiftright, NOT h/1024: `/` is double division and h spans 60
    # bits > double's 53-bit mantissa, so the quotient would be lossy
    w = F.shiftright(h, HLL_P)
    return (
        df.select(
            F.window(ts_col, bucket).start.alias("bucket"),
            *keys,
            F.pmod(h, F.lit(_HLL_M)).cast("int").alias("idx"),
            (
                F.lit(_HLL_SCALE) - F.length(F.bin(w))
            ).cast("int").alias("rho"),
        )
        .groupBy("bucket", *keys, "idx")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Merge register frames down to ``keys``: groupBy-max, the HLL
    union.  Merging tiers is EXACTLY equal to sketching the unioned
    raw data (max of maxes — tested), so cascades of distinct-count
    tiers (day -> month -> all-time) compose without recall loss."""
    return registers.groupBy(*keys, "idx").agg(F.max("r").alias("r"))


def hll_estimate(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Distinct-count estimate per ``keys`` group from a register
    frame: the standard HLL harmonic mean with linear counting below
    2.5m, arranged so both engines compute bit-identical doubles —
    the denominator Σ 2^(SCALE−r) (+ 2^SCALE per absent register) is
    an exact int64, the bias constant is one shared literal, and the
    only libm call is linear counting's single ln, rounded at 6 dp
    with the oracle nudge."""
    s_int = F.sum(
        F.expr(f"shiftleft(cast(1 as bigint), {_HLL_SCALE} - r)")
    )
    n_regs = F.count(F.lit(1))
    agg = registers.groupBy(*keys).agg(
        s_int.alias("s_present"), n_regs.alias("n_regs")
    )
    v = F.lit(_HLL_M) - F.col("n_regs")  # zero (absent) registers
    s_total = (
        F.col("s_present") + v * F.lit(1 << _HLL_SCALE)
    ).cast("double")
    raw = F.lit(HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_SCALE)) / s_total
    lc = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * _HLL_M)) & (v > 0), lc).otherwise(raw)
    return agg.select(
        *keys, F.round(est + 1e-9, 6).alias("est_distinct")
    )
