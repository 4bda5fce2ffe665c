"""Physical-plan audit helpers.

The 100 TB posture is only real if the plans say so: filters reaching the
parquet scan (PushedFilters), projections pruning the read schema
(ReadSchema), dims broadcasting (BroadcastHashJoin), expressions staying in
whole-stage codegen. These helpers extract those facts so tests can assert
them and bench runs can report them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def final_plan(df: DataFrame) -> str:
    """Executed plan string (post-AQE if the query already ran)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def simple_plan(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Distinct whole-stage-codegen subtrees. Under AQE the codegen phase
    only exists in the FINAL plan, so the query is executed first (collect)
    and the post-execution executedPlan inspected."""
    if execute:
        df.collect()
    plan = final_plan(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))) or len(
        set(re.findall(r"\*\((\d+)\)", plan))
    )


def audit(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "shuffles": plan.count("Exchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "cartesian": "CartesianProduct" in plan,
        "codegen_stages": codegen_stage_count(df, execute=False),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
    }
