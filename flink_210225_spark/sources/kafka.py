"""Kafka source/sink builders (SURVEY §2.1 S3/S4, §2.2 K1/K2) and the socket
test source (S5).

The reference wraps FlinkKafkaConsumer/Producer in MyKafkaUtils
(MyKafkaUtils.java:24-65); the Spark-first equivalents are thin builders over
``format("kafka")``. They return *unstarted* DataFrames/writers, so they are
constructible (and the value-shaping transforms testable) without a broker;
``.start()`` is the caller's act, exactly like ``env.execute()``.

Exactly-once posture: the reference's transactional producer
(MyKafkaUtils.java:31-40) maps to checkpointed writes — Spark's Kafka sink is
at-least-once per micro-batch with checkpoint-based replay; true end-to-end
exactly-once needs an idempotent or transactional consumer downstream, which
is the same contract Flink's read-committed consumers provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    group_id: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S3: consumer with ``auto.offset.reset=earliest`` semantics
    (MyKafkaUtils.java:44-56); value decoded to string like
    SimpleStringSchema."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.group.id", group_id)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def shape_for_topic(df: DataFrame, topic: str, value_cols: list[str] | None = None) -> DataFrame:
    """K1 value shaping: serialize rows to a JSON ``value`` bound for one
    fixed topic. Split from the writer so it is unit-testable batch-side."""
    value = (
        F.to_json(F.struct(*[F.col(c) for c in value_cols])) if value_cols else F.to_json(F.struct("*"))
    )
    return df.select(F.lit(topic).alias("topic"), value.alias("value"))


def shape_dynamic_topic(
    routed: DataFrame, topic_col: str = "sink_table", payload_col: str = "data"
) -> DataFrame:
    """K2: per-row topic routing — the reference's dynamic
    KafkaSerializationSchema reads ``record["sinkTable"]``
    (BaseDbApp.java:83-89); Spark's Kafka sink honors a per-row ``topic``
    column natively, so the whole custom serializer collapses to a select."""
    return routed.select(
        F.col(topic_col).alias("topic"), F.to_json(F.col(payload_col)).alias("value")
    )


def kafka_writer(
    shaped: DataFrame, bootstrap_servers: str, checkpoint_dir: str
):
    """K1/K2 writer: expects (topic, value) columns from the shapers above;
    checkpointed for replay-on-failure (the reference's EXACTLY_ONCE
    transactional producer analog)."""
    return (
        shaped.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S5: line-per-record test source (TestFlinkSQLJoin.java:20-29)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
