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


def _unwrap_exchange(node):
    """Descend through transparent single-child wrappers (AQE QueryStage,
    ReusedExchange, codegen InputAdapter/WholeStageCodegen) to the
    underlying node, without entering the plan subtree below an exchange."""
    name = node.nodeName()
    if "QueryStage" in name:
        return _unwrap_exchange(node.plan())
    if name.startswith("ReusedExchange"):
        return _unwrap_exchange(node.child())
    if name.startswith(("InputAdapter", "WholeStageCodegen")):
        return _unwrap_exchange(node.children().iterator().next())
    return node


def bnlj_broadcast_rows(df: DataFrame) -> list[int]:
    """RUNTIME row counts of every BroadcastExchange that feeds a
    BroadcastNestedLoopJoin — executes the query (metrics only exist after
    execution) and reads each exchange's numOutputRows. This is the
    mechanical check behind the CARTESIAN_OK allowlist: a bounded BNLJ is
    only bounded if the broadcast side's ACTUAL cardinality stays at the
    documented handful of rows (query sets, block grids), never the corpus.

    Only the BNLJ's DIRECT children are inspected (unwrapping AQE stage
    wrappers): a depth-first scan of the whole subtree would find the
    streamed side's own broadcast joins first and report the wrong
    exchange — a corpus-sized build side could then hide behind a 25-row
    dim broadcast deeper in the plan. Returns [] when the query holds no
    live BNLJ (e.g. it was consumed by an eager localCheckpoint) — the
    caller must decide whether vacuous is acceptable."""
    df.collect()
    out: list[int] = []
    for n in _walk_physical(df._jdf.queryExecution().executedPlan()):
        if "BroadcastNestedLoopJoin" in n.nodeName():
            it = n.children().iterator()
            while it.hasNext():
                child = _unwrap_exchange(it.next())
                if child.nodeName().startswith("BroadcastExchange"):
                    out.append(int(child.metrics().apply("numOutputRows").value()))
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
