"""Mergeable-sketch operators beyond what the DataFrame API ships.

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
