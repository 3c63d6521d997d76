"""Fixed-point PageRank vs a literal scalar replica, plus the
centrality/determinism properties the operator exists for."""

from __future__ import annotations

import pytest

from peakmatch_xcorr_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
    symmetrize_edges,
)


def _scalar_pagerank(arcs, iterations=2, num=17, den=20):
    """Literal fixed-point replica: arcs = list of (src, dst)."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in arcs:
        deg[s] += 1
    nodes = {n for a in arcs for n in a}
    r = {n: PAGERANK_SCALE for n in nodes}
    base = (den - num) * PAGERANK_SCALE // den
    for _ in range(iterations):
        s = defaultdict(int)
        for u, v in arcs:
            s[v] += r[u] // deg[u]
        r = {n: base + num * s[n] // den for n in nodes}
    return r


def _run(spark, pairs, iterations=2):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = pagerank(symmetrize_edges(df), iterations=iterations)
    return {r["node"]: r["rank_scaled"] for r in out.collect()}


def test_matches_scalar_replica_exactly(spark):
    # a star (hub 0) plus a 3-cycle hanging off node 3
    pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (3, 5)]
    arcs = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    got = _run(spark, pairs, iterations=3)
    want = _scalar_pagerank(arcs, iterations=3)
    assert got == want  # bit-identical, not approx


def test_hub_outranks_leaves(spark):
    pairs = [(0, i) for i in range(1, 8)]
    got = _run(spark, pairs)
    hub = got[0]
    assert all(hub > got[i] for i in range(1, 8))


def test_mass_is_conserved_up_to_quantization(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]
    got = _run(spark, pairs, iterations=4)
    n = len(got)
    total = sum(got.values())
    # each DIV floors away < 1 unit and the damping split renormalizes
    # exactly, so per iteration the graph loses < (deg sums + 1) units
    # per node — bound generously at 100 units/node/iteration
    assert 0 <= n * PAGERANK_SCALE - total < 100 * n * 4


def test_partitioning_invariance(spark):
    """Integer arithmetic makes the result independent of partition
    count / add order — THE property float PageRank lacks."""
    pairs = [(i, (i * 7 + 1) % 40) for i in range(40) if i != (i * 7 + 1) % 40]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    e1 = symmetrize_edges(df).repartition(1)
    e32 = symmetrize_edges(df).repartition(32)
    r1 = {r["node"]: r["rank_scaled"] for r in pagerank(e1, 3).collect()}
    r32 = {r["node"]: r["rank_scaled"] for r in pagerank(e32, 3).collect()}
    assert r1 == r32


def test_damping_validation(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError):
        pagerank(symmetrize_edges(df), damping_num=20, damping_den=20)


def test_pagerank_storage_bounded_in_iterations(spark):
    """Each iteration's eager checkpoint must drop the previous
    iteration's blocks: executor storage is O(1) in iteration count,
    not linear for the session lifetime (ADVICE r4)."""
    import pandas as pd

    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    pairs = spark.createDataFrame(
        pd.DataFrame({
            "id_a": ["a", "b", "c", "d", "a"],
            "id_b": ["b", "c", "d", "a", "c"],
        })
    )
    out = pagerank(symmetrize_edges(pairs), iterations=6)
    out.collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    # only the final iteration's checkpoint may remain cached
    assert after - before <= 1, (
        f"pagerank leaked {after - before} cached RDDs over 6 iterations"
    )
