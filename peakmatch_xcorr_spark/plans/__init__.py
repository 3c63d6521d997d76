"""Plan inspection helpers (the engineering feedback loop used by the
plan-quality tests and during operator tuning)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict:
    """Summary of scan pushdown / pruning / shuffle structure —
    the checklist every operator is reviewed against (README:
    'push down and prune', 'minimize shuffles')."""
    p = formatted_plan(df)
    read_schema = ""
    if "ReadSchema:" in p:
        read_schema = p.split("ReadSchema:")[1].splitlines()[0].strip()
    pushed = ""
    if "PushedFilters:" in p:
        pushed = p.split("PushedFilters:")[1].splitlines()[0].strip()
    return {
        "exchanges": p.count("Exchange"),
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "partial_aggs": p.count("partial_"),
        "pushed_filters": pushed,
        "read_schema": read_schema,
        "python_stages": p.count("InPandas") + p.count("ArrowEvalPython"),
    }
