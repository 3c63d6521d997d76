"""Iterative graph analytics over edge DataFrames.

Connected components (operators/dedup.py pointer-jumping) answers
"which conversations are the same"; PageRank answers "which nodes
matter" — centrality over the similarity graph (which documents /
conversations sit at the middle of a near-dup cluster, useful for
picking the canonical representative the dedup stage keeps).

Determinism contract (the reason this file exists instead of three
lines of float joins): a float PageRank iterates Σ r(u)/deg(u) and
every iteration's sum order perturbs the low bits, so after k
iterations two engines disagree at ~1e-16·k — right at the 6 dp
rounding boundary for thousands of nodes, i.e. guaranteed occasional
hash mismatches.  This implementation runs in FIXED-POINT int64:
ranks start at SCALE = 10^12, contributions are exact integer
divisions (``DIV``), and the damping 0.85 is the rational 17/20
applied as ``(17·Σ) DIV 20``.  Integer sums are associative and
exact, so the result is bit-identical in any engine, any partition
count, any add order — the same trick the codecs and split-assignment
use (integers survive engines; float accumulation does not).  The
quantization error is ≤ one unit per division at SCALE 10^12 —
invisible at the 6 dp output.

Scale shape per iteration: one equi-join of the edge list with the
N-row rank frame on src (edges pre-partitioned by src reuse the
exchange across ALL iterations) and one groupBy(dst) sum with
map-side partials; ranks are localCheckpoint'd each iteration so the
lineage does not grow with the iteration count (the dedup.py
pointer-jumping lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.plans import drop_checkpoint as _drop_checkpoint

PAGERANK_SCALE = 10**12


def symmetrize_edges(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Undirected canonical pairs (a < b) → both directed arcs."""
    return pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping_num: int = 17,
    damping_den: int = 20,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list ``(src, dst)``:
    r₀ = SCALE, rₜ₊₁(v) = base + (num·Σ_{u→v} (rₜ(u) DIV deg(u)))
    DIV den with base = ((den−num)·SCALE) DIV den — the per-vertex-
    normalized variant (ranks sum ≈ N·SCALE), damping num/den.

    Every vertex in ``edges`` has out-degree ≥ 1 by construction of
    the vertex set (vertices = src ∪ dst of a symmetrized graph give
    each node its reverse arc); a genuinely dangling src-less vertex
    simply keeps base rank.  Returns (node, rank_scaled int64,
    pagerank double = rank/SCALE rounded 6 dp)."""
    if not 0 < damping_num < damping_den:
        raise ValueError(
            f"damping {damping_num}/{damping_den} must be in (0, 1)"
        )
    base = ((damping_den - damping_num) * PAGERANK_SCALE) // damping_den
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    vertices = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # deg rides along in the rank frame so the per-iteration join
    # count stays at one (edges ⋈ ranks), not two
    # Eager checkpoints: each iteration's ranks materialize to executor
    # storage immediately, so the PRIOR iteration's blocks can be
    # dropped right away — storage stays O(1) in iteration count
    # instead of growing linearly for the session lifetime (ADVICE r4).
    # Lazy checkpoints could not be unpersisted safely here: the next
    # frame's truncated lineage points AT the prior blocks, so dropping
    # them before materialization would make the result unrecoverable.
    ranks = vertices.join(
        deg.withColumnRenamed("src", "node"), "node", "left"
    ).select(
        "node",
        F.coalesce("deg", F.lit(1)).cast("long").alias("deg"),
        F.lit(PAGERANK_SCALE).cast("long").alias("r"),
    ).localCheckpoint(eager=True)
    # on a mid-loop failure (task loss, interrupt) the one live
    # checkpoint state must still be dropped, or it leaks for the
    # session lifetime — the kmeans_fit lesson (r4 advice); if the new
    # frame's checkpoint itself threw, `ranks` still names the prior
    # (undropped) state, so dropping `ranks` is exact either way
    try:
        for _ in range(iterations):
            contrib = (
                edges.join(
                    ranks.select(F.col("node").alias("src"), "r", "deg"),
                    "src",
                )
                .select("dst", F.expr("r DIV deg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            prev = ranks
            ranks = (
                ranks.join(
                    contrib.withColumnRenamed("dst", "node"), "node", "left"
                )
                .select(
                    "node",
                    "deg",
                    (
                        F.lit(base)
                        + F.expr(
                            f"({damping_num} * coalesce(s, 0))"
                            f" DIV {damping_den}"
                        )
                    ).cast("long").alias("r"),
                )
                .localCheckpoint(eager=True)
            )
            _drop_checkpoint(prev)
    except BaseException:
        _drop_checkpoint(ranks)
        raise
    return ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        F.round(F.col("r") / F.lit(float(PAGERANK_SCALE)) + 1e-9, 6).alias(
            "pagerank"
        ),
    )
