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


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the analyzed logical plan.

    Distinct from has_broadcast_join: a hint FORCES the strategy regardless
    of size, so it must only ever sit on constant-size dims (nation/region);
    AQE-chosen broadcasts of sf-scaling tables are fine because they degrade
    gracefully when the table outgrows the threshold."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", plan))


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
