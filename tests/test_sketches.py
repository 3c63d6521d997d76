"""frequent_items_sketch: one-pass distributed heavy hitters
(count-min + space-saving candidates, merged driver-side).
quantile_sketch: DDSketch-style relative-error quantiles (map-side
bucket histograms merged by groupBy-sum)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from peakmatch_xcorr_spark.operators.sketches import (
    QuantileSketch,
    frequent_items_sketch,
    quantile_sketch,
)


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


def _mixed_values(seed=3, n=40_000):
    """Long-tailed positives + negatives + zeros + nulls — the shape
    relative-error sketches exist for."""
    rng = np.random.default_rng(seed)
    pos = rng.lognormal(mean=2.0, sigma=2.5, size=n)  # spans ~7 decades
    neg = -rng.lognormal(mean=0.5, sigma=1.0, size=n // 10)
    zero = np.zeros(n // 20)
    return np.concatenate([pos, neg, zero])


def test_quantile_sketch_relative_error_bound(spark):
    vals = _mixed_values()
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"]).repartition(16)
    alpha = 0.02
    sk = quantile_sketch(df, "v", alpha=alpha)
    assert sk.n == len(vals)
    for q in (0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999, 0.9999):
        exact = float(np.quantile(vals, q, method="lower"))
        est = sk.quantile(q)
        if exact == 0.0:
            assert est == 0.0
        else:
            rel = abs(est - exact) / abs(exact)
            # alpha per bucket midpoint; 1.05 slack for a boundary-ulp
            # bucket slip on values that land exactly on gamma^b
            assert rel <= alpha * 1.05, f"q={q}: rel err {rel:.4f} > {alpha}"


def test_quantile_sketch_partition_invariant_and_mergeable(spark):
    vals = _mixed_values(seed=11, n=8_000)
    rows = [(float(v),) for v in vals]
    df = spark.createDataFrame(rows, ["v"])
    a = quantile_sketch(df.repartition(2), "v", alpha=0.01)
    b = quantile_sketch(df.repartition(31), "v", alpha=0.01)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    assert [a.quantile(q) for q in qs] == [b.quantile(q) for q in qs]
    # merge(left half, right half) == sketch of the whole
    half = len(rows) // 2
    left = quantile_sketch(spark.createDataFrame(rows[:half], ["v"]), "v", 0.01)
    right = quantile_sketch(spark.createDataFrame(rows[half:], ["v"]), "v", 0.01)
    merged = left.merge(right)
    assert merged.n == a.n
    assert [merged.quantile(q) for q in qs] == [a.quantile(q) for q in qs]


def test_quantile_sketch_bound_on_contract_data(spark):
    """Same data the quantile_sketch_values contract query sketches:
    events.value at sf0.01, alpha=0.01 — the companion bound that
    stands in for a SQL oracle (estimate is algorithm-specific)."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    sk = quantile_sketch(ev, "value", alpha=0.01)
    vals = ev.select("value").toPandas().value.to_numpy(dtype=float)
    assert sk.n == len(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
        exact = float(np.quantile(vals, q, method="lower"))
        est = sk.quantile(q)
        if exact == 0.0:
            assert est == 0.0
        else:
            assert abs(est - exact) / abs(exact) <= 0.01 * 1.05, q


def _sketch_from_values(vals, alpha):
    """Driver-side sketch via the same partition kernel Spark runs."""
    import pandas as pd

    from peakmatch_xcorr_spark.operators.sketches import _qsketch_partition

    out = list(_qsketch_partition(alpha)(iter([pd.DataFrame({"v": vals})])))
    rows = []
    if out:
        for _, r in out[0].iterrows():
            rows.append((int(r["store"]), int(r["bucket"]), int(r["cnt"])))
    return QuantileSketch(alpha, rows)


@pytest.mark.parametrize("alpha", [0.005, 0.01, 0.05])
def test_quantile_sketch_property_bound(alpha):
    """Hypothesis-style property sweep without Spark: for adversarial
    value sets (denormals, huge magnitudes, negatives, zeros, exact
    powers of gamma), every quantile estimate is within alpha relative
    error of the true order statistic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    finite = st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-1e30,
        max_value=1e30,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(finite, min_size=1, max_size=300))
    def check(vals):
        sk = _sketch_from_values(vals, alpha)
        assert sk.n == len(vals)
        for q in (0.0, 0.25, 0.5, 0.75, 1.0):
            exact = float(np.quantile(np.array(vals), q, method="lower"))
            est = sk.quantile(q)
            if exact == 0.0:
                assert est == 0.0
            else:
                # 1.06 slack: a value EXACTLY on a gamma^b boundary can
                # slip one bucket from fp log roundoff (locality only)
                assert abs(est - exact) / abs(exact) <= alpha * 1.06

    check()


def test_quantile_sketch_merge_is_associative_and_commutative():
    rng = np.random.default_rng(7)
    parts = [rng.lognormal(1.0, 2.0, 500) for _ in range(3)]
    a, b, c = (_sketch_from_values(list(p), 0.01) for p in parts)
    qs = (0.1, 0.5, 0.9, 0.99)
    left = a.merge(b).merge(c)
    right = a.merge(b.merge(c))
    swapped = c.merge(a).merge(b)
    whole = _sketch_from_values([v for p in parts for v in p], 0.01)
    for sk in (right, swapped, whole):
        assert [left.quantile(q) for q in qs] == [sk.quantile(q) for q in qs]
    assert left.n == whole.n == 1500


def test_quantile_sketch_edge_cases(spark):
    df = spark.createDataFrame(
        [(0.0,), (0.0,), (None,), (-5.0,), (5.0,)], ["v"]
    ).repartition(8)
    sk = quantile_sketch(df, "v", alpha=0.01)
    assert sk.n == 4  # null dropped
    assert sk.quantile(0.0) == pytest.approx(-5.0, rel=0.01)
    assert sk.quantile(0.5) == 0.0
    assert sk.quantile(1.0) == pytest.approx(5.0, rel=0.01)
    with pytest.raises(ValueError):
        sk.quantile(1.5)
    with pytest.raises(ValueError):
        QuantileSketch(0.01, []).quantile(0.5)
    with pytest.raises(ValueError):
        sk.merge(QuantileSketch(0.05, [(0, 0, 1)]))


# --------------------------------------------------------------- HLL tier

def _ids(spark, n, prefix="u"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("uid"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("id") * 3600
        ).alias("ts"),
    )


def test_hll_register_formula_matches_hashlib(spark):
    """idx/rho must be exactly the md5-derived values the docstring
    claims (and the DuckDB oracle recomputes)."""
    import hashlib

    from peakmatch_xcorr_spark.operators.sketches import (
        HLL_P,
        _HLL_SCALE,
        hll_register_tier,
    )

    df = _ids(spark, 64)
    regs = hll_register_tier(df, "uid", bucket="3650 days")
    got = {(r["idx"], r["r"]) for r in regs.collect()}
    want = {}
    for i in range(64):
        h = int(hashlib.md5(f"u{i}".encode()).hexdigest()[:15], 16)
        idx = h % (1 << HLL_P)
        w = h >> HLL_P
        rho = _HLL_SCALE - len(format(w, "b"))
        want[idx] = max(want.get(idx, 0), rho)
    assert got == set(want.items())


@pytest.mark.parametrize("n", [40, 500, 20_000])
def test_hll_estimate_within_3_rsd(spark, n):
    from peakmatch_xcorr_spark.operators.sketches import (
        _HLL_M,
        hll_estimate,
        hll_register_tier,
    )

    df = _ids(spark, n)
    est = hll_estimate(
        hll_register_tier(df, "uid", bucket="36500 days").drop("bucket"),
        [],
    ).collect()[0]["est_distinct"]
    rsd = 1.04 / (_HLL_M ** 0.5)
    assert abs(est - n) / n <= 3 * rsd, (n, est)


def test_hll_merge_equals_direct_sketch(spark):
    """max-of-max: merging per-bucket register tiers gives EXACTLY the
    registers (hence estimate) of sketching the union directly."""
    from peakmatch_xcorr_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_register_tier,
    )

    df = _ids(spark, 5_000)  # hourly ts -> ~209 daily buckets
    daily = hll_register_tier(df, "uid", bucket="1 day")
    merged = hll_merge(daily.drop("bucket"), [])
    direct = hll_register_tier(df, "uid", bucket="36500 days").drop("bucket")
    m = {(r["idx"], r["r"]) for r in merged.collect()}
    d = {(r["idx"], r["r"]) for r in direct.collect()}
    assert m == d
    em = hll_estimate(merged, []).collect()[0]["est_distinct"]
    ed = hll_estimate(direct, []).collect()[0]["est_distinct"]
    assert em == ed


def test_hll_tier_is_map_side_combinable(spark):
    """The register build must plan partial aggregation (max combines
    map-side) — the property that keeps the shuffle proportional to
    the tier, not the corpus."""
    from peakmatch_xcorr_spark.operators.sketches import hll_register_tier

    df = _ids(spark, 1000)
    plan = (
        hll_register_tier(df, "uid", bucket="1 day")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1, plan
    assert "partial_max" in plan, plan


def test_hll_range_merge_query_survives_epoch_window_straddle(spark, tmp_path):
    """The hll_range_merge contract query's 'direct' side must route
    through hll_merge: a corpus straddling an epoch-aligned 3650-day
    window boundary (next one ~2029-12) yields two buckets, and
    estimating the concatenated registers without max-merging counts
    duplicate idx rows as registers (ADVICE r4).  Plant exactly that
    corpus and require merged == direct."""
    import sys

    import pandas as pd

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    ts = pd.to_datetime(
        ["2025-06-01"] * 40 + ["2031-06-01"] * 40
    ).astype("datetime64[us]")
    pd.DataFrame({
        "ts": ts,
        "user_id": list(range(40)) + list(range(20, 60)),  # 60 distinct
        "event_type": ["click"] * 80,
    }).to_parquet(tmp_path / "events.parquet")
    row = entrymod._q_hll_range_merge(spark, str(tmp_path)).collect()[0]
    assert row["est_merged"] == row["est_direct"]
