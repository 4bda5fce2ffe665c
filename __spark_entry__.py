"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (each takes
``(spark, sf_dir)`` and returns a DataFrame); ``oracle_sql()`` provides the
DuckDB-equivalent SQL with identical column names for the driver's
hash-match correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    """name -> (table_fn, oracle_sql_or_None); assembled from the operator
    modules' QUERIES/ORACLES pairs."""
    from flink_210225_spark.operators import (
        colocate,
        joins,
        logsplit,
        router,
        serving,
        sessions,
        stateful,
        warehouse,
        windows,
    )
    from flink_210225_spark.ops import dedup, multimodal, sampling, similarity, text
    from flink_210225_spark.streaming import sql_jobs

    modules = [
        sql_jobs,
        colocate,
        serving,
        windows,
        joins,
        stateful,
        logsplit,
        router,
        sessions,
        warehouse,
        text,
        dedup,
        similarity,
        multimodal,
        sampling,
    ]
    reg: dict[str, tuple] = {}
    for mod in modules:
        for name, fn in mod.QUERIES.items():
            reg[name] = (fn, mod.ORACLES.get(name))
    return reg


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from flink_210225_spark.io import load_tables

        return fn(load_tables(spark, sf_dir))

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_210225_spark.io import load_tables
    from flink_210225_spark.operators.serving import trademark_topn

    return trademark_topn(load_tables(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
