"""frequent_items_sketch: one-pass distributed heavy hitters
(count-min + space-saving candidates, merged driver-side)."""

from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.sketches import frequent_items_sketch


def _zipf_tokens(spark, n=50_000, vocab=500):
    # deterministic zipf-ish stream: token_j appears ~ n/(j+1) times
    return spark.range(n).select(
        F.concat(
            F.lit("tok"),
            F.floor(
                F.pow(F.lit(float(vocab)), F.pmod(F.xxhash64("id"), 10_000) / 10_000.0)
            ).cast("long").cast("string"),
        ).alias("tok")
    )


def test_cms_estimates_bound_exact_counts(spark):
    toks = _zipf_tokens(spark).repartition(16).cache()
    toks.count()
    n = toks.count()
    exact = {r["tok"]: r["c"] for r in
             toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()}
    est = dict(frequent_items_sketch(toks, "tok", k=20, width=2048, depth=4))
    eps_n = int(2.718 / 2048 * n) + 1
    for v, e in est.items():
        assert e >= exact[v], f"{v}: CMS must never underestimate"
        assert e - exact[v] <= eps_n, f"{v}: over by {e - exact[v]} > {eps_n}"
    # the true top-10 must all be found (space-saving candidate slack)
    true_top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert {v for v, _ in true_top} <= set(est)
    toks.unpersist()


def test_sketch_is_deterministic_and_partition_invariant(spark):
    toks = _zipf_tokens(spark, n=20_000)
    a = frequent_items_sketch(toks.repartition(4), "tok", k=10)
    b = frequent_items_sketch(toks.repartition(32), "tok", k=10)
    assert a == b  # CMS adds are commutative; hashes carry no session salt


def test_sketch_handles_empty_and_null_partitions(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], ["tok"]
    ).repartition(8)  # most partitions end up empty
    top = frequent_items_sketch(df, "tok", k=5)
    assert top[0] == ("a", 2)
    assert ("b", 1) in top
    assert frequent_items_sketch(
        spark.createDataFrame([], "tok string"), "tok", k=5
    ) == []
