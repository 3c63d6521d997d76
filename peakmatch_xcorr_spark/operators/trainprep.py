"""Training-set preparation operators: reproducible split assignment
and GPT-style sequence packing.

Two properties matter at 10^8-document scale and both are structural,
not incidental:

* **Split assignment must be hash-based, not rank-based.**  A
  rank/modulo split ("every 20th doc is val") reassigns existing
  documents whenever the corpus grows or reorders; an md5-keyed
  uniform draw pins each document's split forever, so yesterday's
  val set never leaks into tomorrow's train set.  The comparison is
  done on the integer hash against integer cutoffs — no float
  round-trip, so Spark and any other engine (the DuckDB oracle)
  agree bit-for-bit.

* **Packing must be shard-local.**  GPT-style pretraining concatenates
  documents in a fixed order and slices the token stream at the
  sequence length; the chunk a document lands in is
  ``floor(start_token / budget)``.  A single global running sum would
  serialize the whole corpus through one task, so the running sum is
  per shard (source, file, or any bounded grouping) — shards pack
  independently and in parallel, which is also how a 1000-executor
  cluster would lay out the files.

Both are pure JVM column expressions (no UDF, whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32  # md5 prefix width: first 8 hex digits


def _uniform_hash(id_col: str, seed: str):
    """Deterministic uniform draw in [0, 2^32) from md5(seed ':' id).
    Stable across engines: md5 of the UTF-8 decimal rendering."""
    key = F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


def assign_splits(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column assigning each document to one of
    ``weights``' keys with the given proportions (must sum to ~1).

    Assignment is a pure function of (seed, id): appending, deleting,
    or reordering other documents never moves a document between
    splits.  Changing ``seed`` draws a fresh independent partition of
    the corpus."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    hv = _uniform_hash(id_col, seed)
    names = list(weights)
    cut = 0.0
    expr = F.lit(names[-1])  # everything above the last cutoff
    cases = []
    for name in names[:-1]:
        cut += weights[name]
        cases.append((int(cut * _HASH_SPACE), name))
    # build CASE from the last cutoff down so earlier ranges win
    for cutoff, name in reversed(cases):
        expr = F.when(hv < F.lit(cutoff), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def split_cutoffs(weights: dict[str, float]) -> list[tuple[int, str]]:
    """The integer hash cutoffs ``assign_splits`` compares against —
    exposed so an external checker (the DuckDB oracle) can reproduce
    the exact CASE expression."""
    cut, out = 0.0, []
    for name in list(weights)[:-1]:
        cut += weights[name]
        out.append((int(cut * _HASH_SPACE), name))
    return out


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-domain downsampling — the data-mixing step
    that turns raw per-source corpora into a weighted training
    mixture (e.g. wiki at 1.0, crawl at 0.1).

    A document survives iff its md5-keyed uniform draw falls under its
    domain's rate, so the decision is a pure function of
    (seed, id, rates): re-running over a grown corpus never flips an
    existing document in or out, and raising a domain's rate only ADDS
    documents (every previously sampled doc still passes — monotone,
    so mixtures can be re-weighted without churning the training set).
    Domains absent from ``rates`` get ``default_rate``.  Integer
    cutoff comparison, same engine-portability argument as
    ``assign_splits``."""
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {r}")
    hv = _uniform_hash(id_col, seed)
    cutoff = F.lit(int(default_rate * _HASH_SPACE))
    for name, r in rates.items():
        cutoff = F.when(
            F.col(domain_col) == name, F.lit(int(r * _HASH_SPACE))
        ).otherwise(cutoff)
    return docs.filter(hv < cutoff)


def pack_training_chunks(
    docs: DataFrame,
    budget: int,
    shard_cols: list[str],
    order_col: str = "doc_id",
    token_count=None,
) -> DataFrame:
    """Assign each document the training-chunk index where its first
    token lands when the shard's documents are concatenated in
    ``order_col`` order and sliced every ``budget`` tokens — the
    standard concat-and-chunk packing of GPT-style pretraining.

    ``token_count`` defaults to the chars/4 heuristic as an exact
    integer expression ((length+3) div 4) so the arithmetic is
    engine-portable; pass a real token-count column when one exists
    (e.g. ``textstats.token_counts``'s ``ws_tokens``).

    One window per shard: shards pack independently (bounded state,
    parallel across the cluster); only the intra-shard ordering is a
    sort, and it reuses the shuffle that partitioned by shard."""
    if token_count is None:
        token_count = F.expr("CAST((length(text) + 3) DIV 4 AS BIGINT)")
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(token_count).over(w) - token_count
    return docs.withColumn("n_tokens", token_count).withColumn(
        "chunk_id", F.floor(start / budget).cast("bigint")
    )


def _word_grams(
    df: DataFrame,
    width: int,
    text_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """Word ``width``-gram rows of normalized text (lowercase,
    collapse whitespace, trim) — the ONE gram generator both sides of
    the decontamination join use, so a gram matches iff the normalized
    word sequences match.  Rows shorter than ``width`` words emit
    their whole word sequence as one gram; empty/blank rows emit
    nothing (an empty-string gram would make one blank benchmark row
    flag every blank corpus document).

    Codegen end to end: split once per row, explode start positions,
    ``slice`` + ``concat_ws`` (the higher-order ``transform`` form
    evaluates interpreted per element — see dedup._shingle_rows)."""
    ws = F.split(
        F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    keys = [F.col(id_col).alias("id")] if id_col else []
    n_pos = F.greatest(F.size("ws") - F.lit(width - 1), F.lit(1))
    out = (
        df.select(*keys, ws.alias("ws"))
        .select(*(["id"] if id_col else []),
                F.explode(F.sequence(F.lit(1), n_pos)).alias("i"), "ws")
        .select(*(["id"] if id_col else []),
                F.concat_ws(" ", F.slice("ws", F.col("i"), width)).alias("gm"))
        .filter(F.length("gm") > 0)
    )
    return out.distinct()


def benchmark_ngrams(
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Distinct word grams of an eval/benchmark corpus at EVERY width
    1..n — the contamination reference set.  The n-width grams catch
    ordinary n-gram overlap; the shorter widths exist for the
    symmetric short-document case: a corpus document of w < n words
    emits its whole w-word sequence as one gram, and that leak is only
    caught if the benchmark also indexes its w-word windows (a short
    training doc sitting verbatim inside a long eval prompt IS
    contamination).  Cost is bounded: eval suites are tiny and the
    result is broadcast."""
    grams = None
    for w in range(1, n + 1):
        g = _word_grams(benchmark, w, text_col)
        grams = g if grams is None else grams.unionByName(g)
    return grams.distinct()


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: ``(id, hits)`` where
    ``hits`` counts the document's distinct word n-grams (whole word
    sequence for documents shorter than ``n`` words) that appear
    anywhere in the benchmark corpus.  Only contaminated documents
    (hits >= 1) are returned.

    The 100 TB shape: the benchmark gram set is small (eval suites are
    thousands of documents) and is broadcast, so the corpus-side scan
    never shuffles — each task filters its own documents' grams
    against the broadcast set and the only exchange is the per-doc
    ``groupBy(id)`` count of surviving grams (map-side combinable).
    The corpus is never joined to itself and never collected."""
    bench = benchmark_ngrams(benchmark, n=n, text_col=bench_text_col)
    grams = _word_grams(docs, n, text_col, id_col=id_col)
    return (
        grams.join(F.broadcast(bench), "gm", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Drop every document sharing >= ``min_hits`` distinct word
    n-grams with the benchmark corpus — the test-set decontamination
    pass a pretraining pipeline runs before packing.  Anti-join on the
    contaminated id list, which is at most corpus-sized but in
    practice tiny; Spark broadcasts it when it fits."""
    bad = contamination_report(
        docs, benchmark, n=n, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col,
    ).filter(F.col("hits") >= min_hits).select(F.col("id").alias(id_col))
    return docs.join(bad, id_col, "left_anti")


def deterministic_sample(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: str = "sample-v1",
) -> DataFrame:
    """Exactly-k uniform sample, reproducible across engines and runs:
    rank every row by its md5-keyed draw (ties broken by id — the
    draw is 32 bits, so collisions exist at corpus scale) and keep the
    k smallest.  Unlike ``df.sample`` (per-partition Bernoulli:
    approximate size, layout-dependent membership), membership here is
    a pure function of (seed, id, k) — re-running on a re-partitioned
    or grown corpus keeps every previously sampled id whose rank still
    clears k.

    Scale shape: global top-k by hash compiles to TakeOrdered
    (per-partition partial top-k, then a k-row merge) — no full sort,
    no full shuffle."""
    hv = _uniform_hash(id_col, seed)
    return docs.orderBy(hv.asc(), F.col(id_col).asc()).limit(k)


def stratified_sample(
    docs: DataFrame,
    keys: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: str = "sample-v1",
) -> DataFrame:
    """Exactly-k-PER-GROUP reproducible sample (stratified bottom-k):
    within each ``keys`` group, rank rows by the same md5-keyed draw
    as ``deterministic_sample`` (ties broken by id) and keep the k
    smallest — "5 documents per source/language/quality-bucket" for
    balanced eval sets and per-stratum inspection.

    Membership is a pure function of (seed, id, k) WITHIN a group:
    growth in one stratum never perturbs another's sample, and a
    grown stratum keeps every previous member whose rank still clears
    k.  ONE window exchange on the keys; rank k is a running counter
    per partition (no per-group sort materialization beyond the
    window's own), and groups smaller than k pass through whole."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hv = _uniform_hash(id_col, seed)
    w = Window.partitionBy(*keys).orderBy(hv.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "wsample-v1",
) -> DataFrame:
    """Exactly-k WEIGHTED sample without replacement (Efraimidis &
    Spirakis A-ES): each row draws an exponential clock
    key = −ln(u)/w from its md5-keyed uniform u and the k SMALLEST
    keys win — inclusion probability rises with weight, membership
    stays a pure function of (seed, id, weight).  The mixture/
    curriculum sampler a training run uses when documents carry
    quality or domain weights rather than uniform worth.

    Determinism contract: the clock is quantized ONCE to integer
    nanokeys (round(−ln(u)/w · 1e9)) so the ranking compares int64s
    with the id as tie-break — ranking raw doubles would let the two
    engines' last-ulp ln() disagreement flip near-tied ranks.  u is
    offset to (h+0.5)/2^32 so u = 0 (infinite clock) cannot occur.

    Weights must be > 0 (rows with NULL/≤0 weight are dropped — a
    zero-weight row should never win, and −ln(u)/0 is the kind of
    Inf that poisons a TakeOrdered).  Scale shape: same as
    deterministic_sample — global top-k compiles to TakeOrdered,
    per-partition partial top-k then a k-row merge."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (_uniform_hash(id_col, seed) + F.lit(0.5)) / F.lit(float(_HASH_SPACE))
    w = F.col(weight_col).cast("double")
    key = F.round(-F.log(u) / w * 1e9 + 1e-9, 0).cast("long")
    return (
        docs.filter(w.isNotNull() & (w > 0))
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_wkey")
    )
