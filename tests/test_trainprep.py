"""trainprep: reproducible splits and GPT-style packing."""

import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.trainprep import (
    assign_splits,
    pack_training_chunks,
    split_cutoffs,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 4).cast("string").alias("source"),
    )


def test_splits_are_complete_disjoint_and_roughly_weighted(spark):
    out = assign_splits(_docs(spark), WEIGHTS)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # md5 is uniform: 2000 draws land within ~5 sigma of each weight
    for name, w in WEIGHTS.items():
        assert abs(counts.get(name, 0) - 2000 * w) < 5 * (2000 * w * (1 - w)) ** 0.5


def test_split_is_stable_under_corpus_growth(spark):
    """The 100 TB property: adding documents must never move an
    existing document between splits."""
    small = assign_splits(_docs(spark, 500), WEIGHTS).collect()
    big = assign_splits(_docs(spark, 2000), WEIGHTS)
    big_map = {r["doc_id"]: r["split"] for r in big.collect()}
    for r in small:
        assert big_map[r["doc_id"]] == r["split"]


def test_split_seed_draws_independent_partition(spark):
    a = {r["doc_id"]: r["split"]
         for r in assign_splits(_docs(spark), WEIGHTS, seed="a").collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_splits(_docs(spark), WEIGHTS, seed="b").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 100  # different seeds genuinely re-draw


def test_split_weights_must_sum_to_one(spark):
    with pytest.raises(ValueError):
        assign_splits(_docs(spark), {"train": 0.5, "val": 0.1})


def test_packing_chunk_ids_are_sequential_starts(spark):
    """Within a shard, concatenating docs in order and slicing every
    `budget` tokens: each doc's chunk is floor(start/budget), so chunk
    ids are non-decreasing in doc order and every chunk boundary is
    where the running sum crosses a multiple of the budget."""
    out = pack_training_chunks(
        _docs(spark), budget=64, shard_cols=["source"]
    ).orderBy("source", "doc_id").collect()
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r["source"], []).append(r)
    for rows in by_shard.values():
        start = 0
        prev_chunk = 0
        for r in rows:
            assert r["chunk_id"] == start // 64
            assert r["chunk_id"] >= prev_chunk
            prev_chunk = r["chunk_id"]
            start += r["n_tokens"]


def test_packing_single_window_exchange(spark):
    """Scale gate: one shuffle (partition by shard), no global sort."""
    plan = pack_training_chunks(
        _docs(spark), budget=64, shard_cols=["source"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()


def test_cutoffs_match_assignment(spark):
    cuts = split_cutoffs(WEIGHTS)
    assert cuts == [(int(0.8 * 2**32), "train"), (int(0.9 * 2**32), "val")]


def test_mixture_sample_rates_and_monotonicity(spark):
    from peakmatch_xcorr_spark.operators.trainprep import sample_mixture

    docs = _docs(spark, 4000)  # sources "0".."3", 1000 docs each
    low = sample_mixture(docs, {"0": 1.0, "1": 0.2}, default_rate=0.0)
    rows = low.groupBy("source").agg(F.count("*").alias("n")).collect()
    counts = {r["source"]: r["n"] for r in rows}
    assert counts["0"] == 1000              # rate 1.0 keeps everything
    assert abs(counts["1"] - 200) < 5 * (1000 * 0.2 * 0.8) ** 0.5
    assert "2" not in counts and "3" not in counts  # default 0.0 drops
    # monotone: raising a rate only ADDS documents
    kept_low = {r["doc_id"] for r in low.filter("source = '1'").collect()}
    high = sample_mixture(docs, {"0": 1.0, "1": 0.6}, default_rate=0.0)
    kept_high = {r["doc_id"] for r in high.filter("source = '1'").collect()}
    assert kept_low <= kept_high
    assert len(kept_high) > len(kept_low)


def test_mixture_sample_rejects_bad_rate(spark):
    from peakmatch_xcorr_spark.operators.trainprep import sample_mixture

    with pytest.raises(ValueError):
        sample_mixture(_docs(spark), {"0": 1.5})


# ---------------------------------------------------------- decontamination

def _contaminated_corpus(spark):
    """Corpus + benchmark with a planted verbatim eval leak, a partial
    n-gram leak, and clean documents."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),   # verbatim leak
            (2, "a quick brown fox jumps over something else ok"), # partial leak
            (3, "completely unrelated words about spark engines"), # clean
            (4, "tiny doc"),                                       # shorter than n
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "THE  quick Brown fox jumps over the lazy dog")],  # same after norm
        ["doc_id", "text"],
    )
    return corpus, bench


def test_contamination_report_counts_shared_ngrams(spark):
    from peakmatch_xcorr_spark.operators.trainprep import contamination_report

    corpus, bench = _contaminated_corpus(spark)
    rep = {r["id"]: r["hits"]
           for r in contamination_report(corpus, bench, n=4).collect()}
    # doc 1 == the benchmark text after normalization: all 6 of its
    # distinct 4-grams hit; doc 2 shares exactly the 4-grams fully
    # inside "quick brown fox jumps over" (2 of them); 3 and 4 clean
    assert rep == {1: 6, 2: 2}


def test_decontaminate_drops_only_flagged_docs(spark):
    from peakmatch_xcorr_spark.operators.trainprep import decontaminate

    corpus, bench = _contaminated_corpus(spark)
    kept = sorted(r["doc_id"]
                  for r in decontaminate(corpus, bench, n=4).collect())
    assert kept == [3, 4]
    # min_hits raises the bar: the partial leak (2 shared grams) survives
    kept3 = sorted(r["doc_id"]
                   for r in decontaminate(corpus, bench, n=4, min_hits=3)
                   .collect())
    assert kept3 == [2, 3, 4]


def test_short_docs_decontaminate_as_whole_sequences(spark):
    """A benchmark row shorter than n words still decontaminates: its
    whole word sequence is one gram, and a corpus doc containing those
    words as a full gram window is NOT flagged (window is n words),
    but an identical short corpus doc IS."""
    from peakmatch_xcorr_spark.operators.trainprep import contamination_report

    corpus = spark.createDataFrame(
        [(1, "tiny doc"), (2, "this tiny doc sits inside a longer text")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(9, "Tiny  DOC")], ["doc_id", "text"])
    rep = {r["id"]: r["hits"]
           for r in contamination_report(corpus, bench, n=4).collect()}
    assert rep == {1: 1}


def test_contamination_benchmark_side_is_broadcast(spark):
    """The 100 TB plan shape: the gram semi-join must broadcast the
    benchmark set — a shuffled corpus-side exchange on grams would be
    the scale killer."""
    from peakmatch_xcorr_spark.operators.trainprep import contamination_report

    corpus, bench = _contaminated_corpus(spark)
    df = contamination_report(corpus, bench, n=4)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_short_corpus_doc_inside_long_benchmark_doc_is_flagged(spark):
    """The symmetric containment case the first cut missed: a training
    doc SHORTER than n words appearing verbatim inside a longer
    benchmark document is contamination and must be flagged."""
    from peakmatch_xcorr_spark.operators.trainprep import contamination_report

    corpus = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quick purple fox")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    rep = {r["id"]: r["hits"]
           for r in contamination_report(corpus, bench, n=4).collect()}
    assert rep == {1: 1}


def test_blank_rows_never_cross_contaminate(spark):
    """A blank/whitespace benchmark row must not flag blank corpus
    docs: empty-string grams are dropped on both sides."""
    from peakmatch_xcorr_spark.operators.trainprep import contamination_report

    corpus = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real words here")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "  ")], ["doc_id", "text"])
    assert contamination_report(corpus, bench, n=4).count() == 0


def test_deterministic_sample_exact_k_and_growth_stable(spark):
    """Membership is a pure function of (seed, id, k): growing the
    corpus only evicts ids whose hash-rank no longer clears k, never
    reshuffles arbitrarily — and the size is EXACTLY k, unlike
    Bernoulli df.sample."""
    from peakmatch_xcorr_spark.operators.trainprep import deterministic_sample

    small = {r["doc_id"]
             for r in deterministic_sample(_docs(spark, 500), 50).collect()}
    assert len(small) == 50
    big = {r["doc_id"]
           for r in deterministic_sample(_docs(spark, 2000), 50).collect()}
    assert len(big) == 50
    # every id sampled from the big corpus that already existed in the
    # small corpus must also have been sampled there (rank only grows)
    assert {i for i in big if i < 500} <= small


def test_deterministic_sample_plan_is_take_ordered(spark):
    from peakmatch_xcorr_spark.operators.trainprep import deterministic_sample

    df = deterministic_sample(_docs(spark, 2000), 50)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no full-sort shuffle


def test_stratified_sample_exact_k_per_group(spark):
    from peakmatch_xcorr_spark.operators.trainprep import stratified_sample

    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": range(200),
        "source": ["web"] * 120 + ["books"] * 77 + ["tiny"] * 3,
    })
    docs = spark.createDataFrame(pdf)
    got = stratified_sample(docs, ["source"], k=10).toPandas()
    counts = got.groupby("source").size().to_dict()
    # full groups yield exactly k; a group smaller than k passes whole
    assert counts == {"web": 10, "books": 10, "tiny": 3}


def test_stratified_sample_stable_under_growth_and_repartition(spark):
    """Adding rows to ONE stratum never perturbs another stratum's
    sample, and within the grown stratum previously sampled ids stay
    sampled while their rank still clears k."""
    from peakmatch_xcorr_spark.operators.trainprep import stratified_sample

    import pandas as pd
    base = pd.DataFrame({
        "doc_id": range(100),
        "source": ["web"] * 60 + ["books"] * 40,
    })
    grown = pd.concat([
        base,
        pd.DataFrame({"doc_id": range(100, 160), "source": ["web"] * 60}),
    ])
    s1 = stratified_sample(
        spark.createDataFrame(base), ["source"], k=8
    ).toPandas()
    s2 = stratified_sample(
        spark.createDataFrame(grown).repartition(7), ["source"], k=8
    ).toPandas()
    assert set(s1[s1.source == "books"].doc_id) == set(
        s2[s2.source == "books"].doc_id
    )
    # grown stratum: survivors of the old sample are exactly the old
    # members whose draw still ranks in the new top-8
    old_web = set(s1[s1.source == "web"].doc_id)
    new_web = set(s2[s2.source == "web"].doc_id)
    assert new_web & set(range(100)) <= old_web


def test_stratified_sample_rejects_bad_k(spark):
    from peakmatch_xcorr_spark.operators.trainprep import stratified_sample

    import pandas as pd
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "source": ["web"]})
    )
    with pytest.raises(ValueError, match="k must"):
        stratified_sample(docs, ["source"], k=0)


# --------------------------------------------------------- weighted sample

def _aes_scalar(ids, weights, k, seed="wsample-v1"):
    import hashlib
    import math

    keyed = []
    for i, w in zip(ids, weights):
        h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        keyed.append((round(-math.log(u) / w * 1e9 + 1e-9), i))
    return [i for _, i in sorted(keyed)[:k]]


def test_weighted_sample_matches_scalar_replica(spark):
    from peakmatch_xcorr_spark.operators.trainprep import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        r["doc_id"]
        for r in weighted_sample(df, 15, "w").orderBy("doc_id").collect()
    ]
    want = sorted(_aes_scalar([i for i, _ in rows], [w for _, w in rows], 15))
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    """Across seeds, a row with 50x the weight must be selected far
    more often than a unit-weight row (A-ES inclusion monotonicity) --
    checked on the scalar replica (same math, no Spark loop)."""
    import hashlib
    import math

    n, k, trials = 100, 10, 200
    heavy_hits = light_hits = 0
    for t in range(trials):
        seed = f"s{t}"
        weights = [50.0 if i == 0 else 1.0 for i in range(n)]
        win = _aes_scalar(list(range(n)), weights, k, seed)
        heavy_hits += 0 in win
        light_hits += 1 in win
    assert heavy_hits > trials * 0.9   # ~always in at 50x weight
    assert light_hits < trials * 0.4   # unit rows win ~k/n of the time


def test_weighted_sample_drops_nonpositive_and_validates(spark):
    from peakmatch_xcorr_spark.operators.trainprep import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
        "doc_id long, w double",
    )
    got = weighted_sample(df, 10, "w").collect()
    assert [r["doc_id"] for r in got] == [1]
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w")
