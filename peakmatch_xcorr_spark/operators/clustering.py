"""Clustering operators (reference CLUSTER mode,
ClusteringProcessor.java).

- ``band_features``: event series → unit-normalized band-mean vector
  (C1 = A1 + A2; all events share one band axis because the spectrum
  length is config-fixed, so the map-keyed euclidean collapses to a
  dense-vector euclidean)
- ``pair_distances``: blocked all-pairs euclidean/cosine distances
  (C2/C3 via the same blocked self-join design as peakmatch)
- ``knn_edges``: W3+W4 — per-node k-nearest pairs under eta.  The
  reference walks a globally distance-sorted pair list per node and
  BREAKS at the first pair ≥ eta (ClusteringProcessor.java:295-310);
  since the walk is ascending that equals: rank per endpoint ≤ k AND
  dist < eta, union over both endpoints
- ``cluster_members``: C5 (connected components) + C6 membership
  formatting with the maxClusterSize cap (W5).  The reference caps by
  HashSet iteration order (nondeterministic); we cap by name order —
  a deterministic refinement of unspecified behavior
- ``centre_distances``: J4 centre mode — broadcast centre × events
  distance join, filter ≤ centre-threshold, ascending sort (W6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.config import ClusterConf, SpectralConf

BAND_FEATURE_SCHEMA = "id string, bands array<double>, vec array<double>"


def band_features(
    events: DataFrame,
    spectral: SpectralConf,
    id_col: str = "conv_id",
    series_col: str = "series",
) -> DataFrame:
    """Series → (band starts, unit-normalized band-mean vector)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from peakmatch_xcorr_spark.kernels.spectral import (
            band_means,
            normalise_band_means,
        )

        for pdf in batches:
            ids, bands_out, vecs = [], [], []
            for i, s in zip(pdf[id_col], pdf[series_col]):
                b, m = band_means(np.asarray(s, dtype=np.float64), spectral)
                ids.append(i)
                bands_out.append(b)
                vecs.append(normalise_band_means(m))
            if ids:  # empty frames mistype array columns (see multimodal)
                yield pd.DataFrame({"id": ids, "bands": bands_out, "vec": vecs})

    return events.select(id_col, series_col).mapInPandas(
        run, schema=BAND_FEATURE_SCHEMA
    )


def pair_distances(
    feats: DataFrame,
    metric: str = "euclidean",
    n_blocks: int = 8,
) -> DataFrame:
    """All-pairs distances (id_a < id_b) via the blocked self-join.
    euclidean = sqrt(Σ(a-b)²); cosine = 1 - Σ a·b (unit vectors), the
    reference's two distance functions (ClusteringProcessor.java:199-239).
    """
    from peakmatch_xcorr_spark.operators.pairs import _replicated_sides

    left, right = _replicated_sides(feats, n_blocks, id_col="id")

    def compute(key, lpdf, rpdf):
        import numpy as np
        import pandas as pd

        bi, bj = key
        same = bi == bj
        empty = pd.DataFrame({"id_a": pd.Series(dtype="object"),
                              "id_b": pd.Series(dtype="object"),
                              "dist": pd.Series(dtype="float64")})
        if len(lpdf) == 0 or (not same and len(rpdf) == 0):
            return empty
        if "p" not in lpdf.columns or (not same and "p" not in rpdf.columns):
            raise RuntimeError("cogroup payload pruned by optimizer")

        def unpack(pdf):
            p = list(pdf["p"])
            ids = np.array([r["id"] for r in p])
            order = np.argsort(ids, kind="stable")
            return ids[order], np.stack(
                [np.asarray(p[i]["vec"], dtype=np.float64) for i in order]
            )

        l_ids, lv = unpack(lpdf)
        r_ids, rv = (l_ids, lv) if same else unpack(rpdf)
        if metric == "euclidean":
            d2 = (
                (lv * lv).sum(1)[:, None]
                + (rv * rv).sum(1)[None, :]
                - 2.0 * (lv @ rv.T)
            )
            mat = np.sqrt(np.maximum(d2, 0.0))
        elif metric == "cosine":
            mat = 1.0 - lv @ rv.T
        else:
            raise ValueError(metric)
        if same:
            mask = np.triu(np.ones(mat.shape, dtype=bool), k=1)
        else:
            mask = l_ids[:, None] < r_ids[None, :]
            ii, jj = np.nonzero(~mask)
            # emit flipped canonical keys for the other direction
            flipped = pd.DataFrame(
                {"id_a": r_ids[jj], "id_b": l_ids[ii], "dist": mat[ii, jj]}
            )
            ii2, jj2 = np.nonzero(mask)
            return pd.concat(
                [pd.DataFrame({"id_a": l_ids[ii2], "id_b": r_ids[jj2],
                               "dist": mat[ii2, jj2]}), flipped],
                ignore_index=True,
            )
        ii, jj = np.nonzero(mask)
        return pd.DataFrame(
            {"id_a": l_ids[ii], "id_b": r_ids[jj], "dist": mat[ii, jj]}
        )

    payload = F.struct("id", "vec").alias("p")
    lg = left.select("bi", "bj", payload).groupBy("bi", "bj")
    rg = right.select("bi", "bj", payload).groupBy("bi", "bj")
    return lg.cogroup(rg).applyInPandas(
        compute, schema="id_a string, id_b string, dist double"
    )


def knn_edges(distances: DataFrame, conf: ClusterConf) -> DataFrame:
    """Per-node k-nearest pairs under eta → undirected edge list.
    Ties in distance break by (id_a, id_b) — the reference's global
    stable sort ties break by pair enumeration order, which for our
    canonical pairs is exactly (id_a, id_b)."""
    both = distances.select(
        F.col("id_a").alias("node"), "id_a", "id_b", "dist"
    ).union(
        distances.select(F.col("id_b").alias("node"), "id_a", "id_b", "dist")
    )
    w = Window.partitionBy("node").orderBy("dist", "id_a", "id_b")
    picked = (
        both.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= conf.k) & (F.col("dist") < conf.eta))
        .select("id_a", "id_b", "dist")
        .dropDuplicates(["id_a", "id_b"])
    )
    return picked


def cluster_members(
    edges: DataFrame, conf: ClusterConf
) -> DataFrame:
    """Connected components over KNN edges → per-cluster member lists,
    deterministically capped at max_cluster_size (by name order)."""
    from peakmatch_xcorr_spark.operators.dedup import connected_components

    comps = connected_components(edges)
    return (
        comps.groupBy("component")
        .agg(F.array_sort(F.collect_list("id")).alias("members"))
        .withColumn("cluster_size", F.size("members"))
        .withColumn("members", F.slice("members", 1, conf.max_cluster_size))
    )


def centre_distances(
    feats: DataFrame,
    centre_ids: list[str],
    conf: ClusterConf,
    metric: str = "euclidean",
) -> DataFrame:
    """Centre mode (ClusteringProcessor.java:85-107): every event
    scored against each named centre, filtered to ≤ centre-threshold,
    ascending distance (broadcast nested-loop of a tiny centre set)."""
    centres = feats.filter(F.col("id").isin(centre_ids)).select(
        F.col("id").alias("centre_id"), F.col("vec").alias("cv")
    )
    joined = feats.join(
        F.broadcast(centres), F.col("id") != F.col("centre_id")
    )
    if metric == "euclidean":
        diff = F.zip_with("vec", "cv", lambda a, b: (a - b) * (a - b))
        dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))
    else:
        prod = F.zip_with("vec", "cv", lambda a, b: a * b)
        dist = 1.0 - F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)
    return (
        joined.withColumn("dist", dist)
        .filter(F.col("dist") <= conf.centre_threshold)
        .select("centre_id", "id", "dist")
        .orderBy("centre_id", "dist", "id")
    )
