"""T3: config-driven dynamic routing (BaseDbApp.java:61-89 +
TableProcessFunction.java:51-175).

The reference broadcasts a CDC-streamed ``table_process`` config table to
every task; each fact record looks up ``(sourceTable, opType)``, gets its
columns pruned to the configured list, a ``sinkTable`` stamped, and is routed
kafka (fact) vs hbase (dim). Unknown keys are logged & dropped
(TableProcessFunction.java:155-157).

Spark-first: the config is small ⇒ a **broadcast inner join** on
(tableName, type) replaces the broadcast state; ``map_filter`` prunes the
payload map to the configured column list JVM-side; two filtered projections
replace the side output. In streaming this runs per micro-batch inside
``foreachBatch`` (see streaming/pipelines.py), which also re-reads the config
— giving the same effective semantics as the reference's cache invalidation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_210225_spark.schemas import SINK_TYPE_HBASE, SINK_TYPE_KAFKA


def filter_deletes(cdc: DataFrame) -> DataFrame:
    """P2: drop delete images before routing (BaseDbApp.java:43)."""
    return cdc.filter(F.col("type") != "delete")


def route(cdc: DataFrame, config: DataFrame) -> DataFrame:
    """Join fact envelopes to routing config and prune payload columns.

    Returns one row per routed record: (tableName, type, sink_type,
    sink_table, data) with ``data`` pruned to sink_columns. Unmatched
    (tableName, type) pairs drop out via the inner join — the reference's
    "no config, discard" branch."""
    cfg = config.select(
        F.col("source_table"),
        F.col("operate_type"),
        F.col("sink_type"),
        F.col("sink_table"),
        F.split(F.col("sink_columns"), ",").alias("cols"),
        F.coalesce(F.col("sink_pk"), F.lit("id")).alias("sink_pk"),
    )
    joined = filter_deletes(cdc).join(
        F.broadcast(cfg),
        (F.col("tableName") == F.col("source_table"))
        & (F.col("type") == F.col("operate_type")),
    )
    pruned = joined.withColumn(
        "data",
        F.map_filter("data", lambda k, _v: F.array_contains(F.col("cols"), k)),
    )
    return pruned.select("tableName", "type", "sink_type", "sink_table", "sink_pk", "data")


def split_sinks(routed: DataFrame) -> dict[str, DataFrame]:
    """The kafka-main / hbase-side split (BaseDbApp.java:76-82)."""
    return {
        SINK_TYPE_KAFKA: routed.filter(F.col("sink_type") == SINK_TYPE_KAFKA),
        SINK_TYPE_HBASE: routed.filter(F.col("sink_type") == SINK_TYPE_HBASE),
    }


def cdc_route_demo(tables: dict[str, DataFrame]) -> DataFrame:
    """Driver-checkable T3 end-to-end: render nation/region as CDC snapshot
    envelopes (sources/cdc.py), route them through a two-row config (nation →
    kafka topic, region → hbase dim), and project the routed identity +
    pruned-map width. ``n_cols`` proves the column pruning (4-col source maps
    shrink to the 2 configured columns)."""
    from flink_210225_spark.sources.cdc import snapshot_envelopes

    spark = tables["nation"].sparkSession
    cdc = snapshot_envelopes(tables["nation"], "gmall", "nation").unionByName(
        snapshot_envelopes(tables["region"], "gmall", "region")
    )
    config = spark.createDataFrame(
        [
            ("nation", "insert", SINK_TYPE_KAFKA, "dwd_nation", "n_nationkey,n_name", "n_nationkey", None),
            ("region", "insert", SINK_TYPE_HBASE, "dim_region", "r_regionkey,r_name", "r_regionkey", None),
        ],
        "source_table string, operate_type string, sink_type string, sink_table string,"
        "sink_columns string, sink_pk string, sink_extend string",
    )
    routed = route(cdc, config)
    return routed.select(
        F.col("tableName").alias("table_name"),
        F.col("type").alias("op_type"),
        "sink_type",
        "sink_table",
        F.col("data")[F.col("sink_pk")].alias("rec_id"),
        F.coalesce(F.col("data")["n_name"], F.col("data")["r_name"]).alias("rec_name"),
        F.size("data").alias("n_cols"),
    )


QUERIES = {"cdc_route_config": cdc_route_demo}

ORACLES = {
    "cdc_route_config": """
        SELECT 'nation' AS table_name, 'insert' AS op_type, 'kafka' AS sink_type,
               'dwd_nation' AS sink_table, n_nationkey::VARCHAR AS rec_id,
               n_name AS rec_name, 2 AS n_cols
        FROM nation
        UNION ALL
        SELECT 'region', 'insert', 'hbase', 'dim_region',
               r_regionkey::VARCHAR, r_name, 2
        FROM region
    """,
}


def upsert_dim(batch: DataFrame, dim_path: str, pk: str = "id") -> None:
    """K4/K5: dim upsert sink. The reference upserts by PK into Phoenix and
    invalidates the Redis cache (DimSinkFunction.java:33-67); here the dim
    table is parquet and the upsert is read-union-dedup-overwrite per batch.
    Broadcast-join consumers re-read per micro-batch, so no cache exists to
    invalidate. (With Delta available this would be MERGE INTO.)"""
    spark = batch.sparkSession
    batch = batch.withColumn("__v", F.monotonically_increasing_id())
    try:
        existing = spark.read.parquet(dim_path).withColumn("__v", F.lit(-1).cast("long"))
        merged = existing.unionByName(batch)
    except Exception:  # first write: no existing table (K5 auto-create)
        merged = batch
    from pyspark.sql import Window

    w = Window.partitionBy(pk).orderBy(F.desc("__v"))
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__v")
    )
    # Materialize before overwrite: the plan reads the same path it writes.
    latest.cache()
    latest.count()
    latest.write.mode("overwrite").parquet(dim_path)
    latest.unpersist()
