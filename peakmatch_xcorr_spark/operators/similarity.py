"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k neighbours — the exactness
  baseline.  JVM-side arithmetic: zip_with + aggregate (no UDF), a
  broadcast of the (small) query set, and a ranking window for top-k.
- ``lsh_signatures`` + ``embedding_near_dups``: the scale path —
  random-hyperplane LSH buckets (signed projections via deterministic
  per-plane hash vectors) so candidate generation is a bucket
  equi-join instead of a full cross product; exact cosine re-ranking
  inside buckets (the embedding analogue of the peakmatch
  prune-then-verify design).
- ``kmeans_fit`` + ``ivf_topk``: IVF ANN — k-means coarse quantizer,
  n-probe list equi-join, exact re-rank inside probed lists.

The reference's distance machinery is ClusteringProcessor.java:199-239
(euclidean/cosine over band-mean vectors); these operators generalize
it to the training-data embedding table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_unit_vectors(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Pre-normalize embeddings so cosine = dot (computed once).

    Zero-norm vectors (missing-embedding placeholders) map to the zero
    vector — cosine 0 against everything — instead of crashing: Spark
    4 runs ANSI mode by default, where an unguarded x/0 aborts the
    whole job with DIVIDE_BY_ZERO.

    The norm is materialized as its own column FIRST: embedding the
    _norm aggregate inside the transform lambda re-evaluates the full
    O(dim) reduction per element (higher-order lambdas are interpreted
    per call, not common-subexpression-eliminated), turning
    normalization O(dim^2) per row — ~590k multiply-adds at dim=768
    where ~1.5k suffice."""
    v = F.col(vec_col)
    ncol = f"_{out_col}_norm"
    return (
        df.withColumn(
            ncol, _norm(F.transform(v, lambda x: x.cast("double")))
        )
        .withColumn(
            out_col,
            F.when(
                F.col(ncol) > 0,
                F.transform(v, lambda x: x.cast("double") / F.col(ncol)),
            ).otherwise(F.transform(v, lambda x: F.lit(0.0))),
        )
        .drop(ncol)
    )


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector: broadcast the query
    side, zip_with/aggregate dot products (whole-stage codegen), rank
    window for the top-k cut.  Excludes self-matches by id."""
    it = with_unit_vectors(items, vec_col).select(
        F.col(id_col).alias("item_id"), F.col("unit").alias("iv")
    )
    qs = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qv")
    )
    scored = (
        it.join(F.broadcast(qs), F.col("item_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("iv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("item_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def _hyperplane(dim: int, plane: int, seed: int = 41) -> list[float]:
    """Deterministic pseudo-random unit hyperplane, seeded per plane.

    Gaussian via PCG64 keyed on (seed, plane) — planes are mutually
    independent.  (The previous LCG hash chain produced correlated
    consecutive planes — LCG streams with nearby seeds overlap — which
    silently cost LSH recall: planes that agree in direction are fewer
    effective bits per band AND correlate the misses across bands.)
    Driver-side only: the planes are folded into the plan as literals,
    so reproducibility across executors is free."""
    import numpy as np

    v = np.random.default_rng([seed, plane]).standard_normal(dim)
    n = float(np.linalg.norm(v)) or 1.0
    return (v / n).tolist()


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
) -> DataFrame:
    """Random-hyperplane (SRP) LSH: sign bit per plane, grouped into
    ``bands`` bucket keys per vector (multi-probe by banding).  All
    JVM-side: the planes are literal arrays folded into the plan."""
    if n_planes % bands != 0:
        raise ValueError(
            f"n_planes ({n_planes}) must be divisible by bands ({bands}); "
            "trailing planes would be computed but silently unused"
        )
    rows_per_band = n_planes // bands
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = [
        (_dot(v, F.array(*[F.lit(c) for c in _hyperplane(dim, p)])) > 0).cast("int")
        for p in range(n_planes)
    ]
    band_cols = []
    for b in range(bands):
        sig = F.concat_ws(
            "", *[bits[b * rows_per_band + r].cast("string") for r in range(rows_per_band)]
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col),
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select("id", vec_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 65536,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, candidate-blocked
    by SRP-LSH band buckets, exact re-rank inside buckets.

    ``max_bucket`` skips buckets whose membership exceeds it: an
    overfull bucket means that band's bits are non-discriminative for
    those vectors (a near-identical cluster, or too few planes for
    the corpus), and its self-join would be quadratic.  Real near-dup
    pairs still meet in their other, tighter bands; None disables.
    CAVEAT: a single uniform cluster LARGER than max_bucket has the
    same signature in every band and loses all its pairs — for
    cluster-forming dedup at that scale use ``lsh_scoped_matches``'s
    star-scoring pattern (pairs.py), which connects an overfull
    bucket through a representative at O(n)."""
    sig = lsh_signatures(df, dim, n_planes, id_col, vec_col, bands)
    if max_bucket is not None:
        ok = (
            sig.groupBy("band", "sig")
            .count()
            .filter(F.col("count") <= max_bucket)
            .select("band", "sig")
        )
        sig = sig.join(ok, ["band", "sig"], "left_semi")
    a = sig.alias("a")
    b = sig.alias("b")
    cands = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    denom = _norm(va) * _norm(vb)
    # ANSI-safe: a zero-norm side scores cosine 0 (never a near-dup)
    cos = F.when(denom > 0, _dot(va, vb) / denom).otherwise(F.lit(0.0))
    return (
        cands.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------------------------------ IVF ANN

def kmeans_fit(
    df: DataFrame,
    k: int,
    dim: int,
    max_iter: int = 10,
    seed: int = 17,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """DataFrame-native Lloyd's k-means over unit vectors (coarse
    quantizer for IVF).  Deterministic: centroids seeded from hashed
    row picks; each iteration is one broadcast-join + groupBy shuffle;
    ``localCheckpoint`` is unnecessary because centroids live on the
    driver (k × dim floats), not in a growing plan."""
    from pyspark.sql import functions as F

    # cached: the seed collect + every Lloyd iteration's collect would
    # otherwise re-scan the source and re-normalize per action
    unit = with_unit_vectors(df, vec_col).select(F.col("unit")).cache()
    # deterministic seed sample: first k rows under a hash order
    seeds = (
        unit.withColumn("h", F.xxhash64(F.col("unit").cast("string"), F.lit(seed)))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [list(r["unit"]) for r in seeds]
    try:
        for _ in range(max_iter):
            assigned = _assign_nearest(unit, centroids)
            new_rows = (
                assigned.groupBy("centroid_id")
                .agg(
                    F.array(*[
                        F.avg(F.col("unit")[i]).alias(f"c{i}") for i in range(dim)
                    ]).alias("mean_vec"),
                )
                .collect()
            )
            new_centroids = list(centroids)
            moved = 0.0
            for r in new_rows:
                import math

                v = r["mean_vec"]
                n = math.sqrt(sum(x * x for x in v)) or 1.0
                nv = [x / n for x in v]
                moved += sum(
                    (a - b) ** 2
                    for a, b in zip(nv, new_centroids[r["centroid_id"]])
                )
                new_centroids[r["centroid_id"]] = nv
            centroids = new_centroids
            if moved < 1e-12:
                break
    finally:
        # a failing Lloyd iteration must not leak the cached frame for
        # the session lifetime
        unit.unpersist()
    return centroids


def _assign_nearest(unit_df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Assign each unit vector to its max-cosine centroid — pure
    column expressions over literal centroid arrays (broadcast by
    constant folding)."""
    from pyspark.sql import functions as F

    scored = [
        F.struct(
            _dot(F.col("unit"), F.array(*[F.lit(c) for c in cent])).alias("cos"),
            F.lit(i).alias("cid"),
        )
        for i, cent in enumerate(centroids)
    ]
    best = F.array_max(F.array(*scored))
    return unit_df.withColumn("centroid_id", best["cid"]).withColumn(
        "centroid_cos", best["cos"]
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: items partitioned into centroid lists;
    each query probes its ``n_probe`` nearest lists and re-ranks with
    exact cosine inside them.  The scale path when the LSH variant's
    bucket skew is a concern: list sizes are ~uniform after k-means.

    ``n_probe == len(centroids)`` probes every list, making the result
    the EXACT brute-force top-k (the correctness anchor the oracle
    query uses).  ``round_dp`` rounds the cosine (with the repo's
    +1e-9 half-even nudge) BEFORE ranking so last-ulp float summation
    differences cannot flip ranks between engines — required for any
    hash-checked oracle over the output, harmless otherwise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    it = _assign_nearest(
        with_unit_vectors(items, vec_col), centroids
    ).select(F.col(id_col).alias("item_id"), F.col("unit").alias("iv"),
             F.col("centroid_id").alias("list_id"))

    qu = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qv")
    )
    probes = [
        F.struct(
            _dot(F.col("qv"), F.array(*[F.lit(c) for c in cent])).alias("cos"),
            F.lit(i).alias("cid"),
        )
        for i, cent in enumerate(centroids)
    ]
    ranked_lists = F.reverse(F.array_sort(F.array(*probes)))
    qu = qu.withColumn(
        "probe_list",
        F.slice(F.transform(ranked_lists, lambda s: s["cid"]), 1, n_probe),
    ).select("query_id", "qv", F.explode("probe_list").alias("list_id"))

    cos = _dot(F.col("iv"), F.col("qv"))
    if round_dp is not None:
        cos = F.round(cos + 1e-9, round_dp)
    scored = (
        it.join(qu, "list_id")
        .filter(F.col("item_id") != F.col("query_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def pca_fit(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
):
    """Fit a k-component PCA over an embedding column — the standard
    preprocessing in front of IVF/LSH ANN (decorrelate + truncate so
    bucketing spends its bits on directions that matter).

    Distributed moment accumulation, NOT a distributed eigensolver:
    each partition emits ONE row carrying (n, Σx, flattened Σxxᵀ) —
    dim + dim² doubles, ~32 KB at dim 64 — via mapInPandas, and the
    driver sums the bounded partition rows, forms the covariance, and
    runs one dim×dim ``numpy.linalg.eigh``.  The same
    collect-the-sufficient-statistics contract as kmeans' k×dim
    centroids (similarity.kmeans_fit): scale-safe because the
    collected payload is a function of DIM, never of N.  Component
    signs are fixed (largest-|coordinate| entry made positive) so the
    model is deterministic across partitionings.

    Returns (mean: np.ndarray, components: np.ndarray k×dim,
    explained_var: np.ndarray k)."""
    import numpy as np

    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("pca_fit: empty input")
    dim = len(first[0])
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")

    def partial(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += len(x)
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    rows = (
        embeddings.select(vec_col)
        .mapInPandas(
            partial, schema="n long, s array<double>, g array<double>"
        )
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # deterministic sign: the largest-|coordinate| entry is positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, np.maximum(vals[order], 0.0)


def pca_project(
    embeddings: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto fitted components: centered dot products
    as JVM zip_with/aggregate expressions (whole-stage codegen, no
    Python in the per-row path) — the components ride into the plan
    as array literals, k×dim doubles, trivially broadcastable."""
    centered = F.zip_with(
        F.col(vec_col),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    projs = [
        _dot(centered, F.array(*[F.lit(float(c)) for c in comp]))
        for comp in components
    ]
    return embeddings.withColumn(out_col, F.array(*projs))
