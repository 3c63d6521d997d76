"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely (SURVEY §4 / pyspark guide partitioning
lever) — proven at the plan level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
        (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
         .sortBy("o_custkey").saveAsTable("b_orders"))
        (cust.withColumnRenamed("c_custkey", "o_custkey")
         .write.mode("overwrite").bucketBy(8, "o_custkey")
         .sortBy("o_custkey").saveAsTable("b_cust"))
        j = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        # co-located buckets: no shuffle on either side of the join
        # (count formatted-mode "(N) Exchange" detail headers — the
        # "Exchange hashpartitioning" substring only exists in simple
        # mode, so the old assertion was vacuous)
        import re

        assert not re.findall(r"\(\d+\) Exchange", plan), plan
        assert j.count() == orders.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
