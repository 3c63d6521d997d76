"""Mimics the driver's correctness gate: run every ``queries()`` entry
on Spark and its ``oracle_sql()`` on DuckDB over the same parquet
tables, compare row count, schema shape, and (order-insensitive)
values — strictly, so hash-style comparison cannot surprise us."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("bool")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check for non-SQL ops — the driver still sorts and
        # hashes the Spark result, so run the same canonicalization:
        # a result with array/map cells MUST fail here, not in CI.
        df = q(spark, SF_DIR)
        pdf = df.toPandas()
        _normalize(pdf)  # raises TypeError on unhashable (list) cells
        assert len(df.schema) > 0
        return
    got = _normalize(q(spark, SF_DIR).toPandas())
    exp = _normalize(duck.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch {got.columns} vs {exp.columns}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            np.testing.assert_array_equal(
                got[c].to_numpy(), exp[c].to_numpy(),
                err_msg=f"{name}.{c}",
            )
        else:
            assert got[c].equals(exp[c]), f"{name}.{c} values differ"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
