"""flink_210225_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
streaming warehouse (smh8520/flink-210225, a Flink 1.12 "gmall" real-time
DW) as an idiomatic Spark engine:

- ``sources``   — batch/stream readers (parquet fixtures, CDC envelope, JSON logs)
- ``operators`` — DWD/DWM/DWS logic as composable DataFrame -> DataFrame fns
- ``functions`` — scalar/vector/text helpers built on pyspark.sql.functions
- ``plans``     — plan-inspection helpers (pushdown/broadcast/codegen audits)
- ``streaming`` — Structured Streaming variants (watermarks, stateful ops)

Everything is DataFrame-first so Catalyst handles pushdown, pruning, join
strategy and whole-stage codegen; Python UDFs appear only where Spark has no
built-in equivalent (and then as Arrow-batched pandas UDFs).
"""

__all__ = ["get_spark"]
__version__ = "0.1.0"


def __getattr__(name):
    # PEP 562 lazy export: importing the PACKAGE must not import
    # pyspark.sql. Executor-side Python workers re-import
    # flink_210225_spark.ops.* for every Arrow UDF, and an eager
    # `from .session import get_spark` here made each fresh worker pay
    # ~0.8 s of pyspark.sql import it never uses (driver-only API) —
    # measured as additive per-query overhead on every mapInPandas
    # kernel, worst on the smallest ones (wav_decode 0.85→1.5 s across
    # rounds). `from flink_210225_spark import get_spark` still works —
    # module __getattr__ serves from-imports.
    if name == "get_spark":
        from flink_210225_spark.session import get_spark

        return get_spark
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
