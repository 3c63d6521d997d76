"""JSON shredding / extraction: per-row degradation and typed casts."""

from __future__ import annotations

from peakmatch_xcorr_spark.operators.semistructured import (
    json_field_rollup,
    shred_json,
)


def _df(spark):
    rows = [
        ("a", '{"k": 5, "tag": "x"}'),
        ("a", '{"k": 7}'),
        ("a", '{"tag": "y"}'),          # field missing
        ("b", "{not json"),              # malformed
        ("b", None),                     # null bag
        ("b", '{"k": "12"}'),            # string number: casts
    ]
    return spark.createDataFrame(rows, "key string, props string")


def test_shred_json_types_and_null_degradation(spark):
    out = shred_json(
        _df(spark), "props", {"k": "$.k:long", "tag": "$.tag:string"}
    ).collect()
    got = [(r["key"], r["k"], r["tag"]) for r in out]
    assert got == [
        ("a", 5, "x"),
        ("a", 7, None),
        ("a", None, "y"),
        ("b", None, None),
        ("b", None, None),
        ("b", 12, None),
    ]


def test_json_field_rollup_counts_nulls_separately(spark):
    got = {
        r["key"]: r
        for r in json_field_rollup(
            _df(spark), "props", "$.k", ["key"]
        ).collect()
    }
    a, b = got["a"], got["b"]
    assert (a["n"], a["n_present"], a["sum_v"]) == (3, 2, 12)
    assert a["avg_v"] == 6.0
    assert (b["n"], b["n_present"], b["sum_v"]) == (3, 1, 12)


def test_extraction_is_codegen_no_python(spark):
    """The parse must stay JVM-side: no BatchEvalPython / ArrowEval
    in the plan (a Python UDF here would be the 100 TB anti-pattern).
    """
    plan = (
        json_field_rollup(_df(spark), "props", "$.k", ["key"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan, plan
