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

from flink_210225_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
