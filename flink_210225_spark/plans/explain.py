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


def _walk_physical(node):
    """Depth-first walk of an executed physical plan via py4j, descending
    through AQE wrappers (AdaptiveSparkPlan → executedPlan, *QueryStage →
    plan, ReusedExchange → child) whose children() are empty."""
    yield node
    name = node.nodeName()
    if name.startswith("AdaptiveSparkPlan"):
        yield from _walk_physical(node.executedPlan())
        return
    if "QueryStage" in name:
        yield from _walk_physical(node.plan())
        return
    if name.startswith("ReusedExchange"):
        yield from _walk_physical(node.child())
        return
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk_physical(it.next())


def bnlj_broadcast_rows(df: DataFrame) -> list[int]:
    """RUNTIME row counts of every BroadcastExchange that feeds a
    BroadcastNestedLoopJoin — executes the query (metrics only exist after
    execution) and reads each exchange's numOutputRows. This is the
    mechanical check behind the CARTESIAN_OK allowlist: a bounded BNLJ is
    only bounded if the broadcast side's ACTUAL cardinality stays at the
    documented handful of rows (query sets, block grids), never the corpus."""
    df.collect()
    out: list[int] = []
    for n in _walk_physical(df._jdf.queryExecution().executedPlan()):
        if "BroadcastNestedLoopJoin" in n.nodeName():
            for sub in _walk_physical(n):
                if sub.nodeName().startswith("BroadcastExchange"):
                    out.append(int(sub.metrics().apply("numOutputRows").value()))
                    break
    return out


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
