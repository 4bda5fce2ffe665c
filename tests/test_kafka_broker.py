"""Broker-gated Kafka runtime proof (SURVEY §2 S3/K1/K2 — VERDICT r8 "What's
missing" #1).

The sandbox ships no Kafka broker and no spark-sql-kafka connector jar, so
the S3/K1/K2 builders (`sources/kafka.py`) have never round-tripped a real
message. This module makes that gap EXPLICIT and closable: the moment an
environment provides a broker (``SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port``)
and the connector resolves, these tests run a full produce→consume
round trip through the exact builder functions the engine exposes; until
then they SKIP with a reason string the report shows, instead of the gap
being invisible.

Gate order matters: env var first (cheap), then a TCP reach check (no JVM),
then the connector probe (needs the session). Reference parity:
MyKafkaUtils.java:24-56 (consumer + fixed-topic producer),
BaseDbApp.java:83-89 (dynamic per-row topic).
"""

from __future__ import annotations

import json
import os
import socket

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.broker


def _reachable(bootstrap: str, timeout: float = 2.0) -> bool:
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=timeout):
            return True
    except OSError:
        return False


def _require_broker():
    if not BOOTSTRAP:
        pytest.skip(
            "no broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port to run the "
            "S3/K1/K2 runtime proof (sandbox has no Kafka broker)"
        )
    if not _reachable(BOOTSTRAP):
        pytest.skip(f"broker {BOOTSTRAP} not reachable")


def _require_connector(spark):
    """The kafka data source is a separate jar (spark-sql-kafka); probe by
    building an unstarted reader and checking the lookup error, not by
    parsing version strings."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "__probe__").load()
    except Exception as ex:  # noqa: BLE001 — any lookup failure means absent
        if "Failed to find data source: kafka" in str(ex) or "kafka" in str(
            ex
        ).lower():
            pytest.skip(
                "spark-sql-kafka connector jar not on the classpath "
                "(add --packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
            )
        raise


def test_kafka_roundtrip_fixed_topic(spark, tmp_path):
    """K1+S3: shape_for_topic → kafka_writer → kafka_source round trip."""
    _require_broker()
    _require_connector(spark)
    from flink_210225_spark.sources.kafka import (
        kafka_source,
        kafka_writer,
        shape_for_topic,
    )

    topic = f"graft_rt_{os.getpid()}"
    rows = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, tag string"
    )
    shaped = shape_for_topic(rows, topic)
    # one-shot batch write through the same (topic, value) contract
    shaped.write.format("kafka").option(
        "kafka.bootstrap.servers", BOOTSTRAP
    ).save()

    stream = kafka_source(spark, BOOTSTRAP, topic, group_id=f"g_{topic}")
    q = (
        stream.writeStream.format("memory")
        .queryName(f"mem_{topic}")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        json.loads(r.value)["id"]
        for r in spark.sql(f"SELECT value FROM mem_{topic}").collect()
    }
    assert got == {1, 2, 3}
    # writer builder itself must accept the shaped frame (unstarted)
    kafka_writer(shaped, BOOTSTRAP, str(tmp_path / "ck2"))


def test_kafka_dynamic_topic_routing(spark, tmp_path):
    """K2: per-row topic column routes each record to its own topic
    (BaseDbApp.java:83-89 parity)."""
    _require_broker()
    _require_connector(spark)
    from pyspark.sql import functions as F

    from flink_210225_spark.sources.kafka import kafka_source, shape_dynamic_topic

    suffix = os.getpid()
    routed = spark.createDataFrame(
        [(f"graft_dyn_a_{suffix}", {"k": "1"}), (f"graft_dyn_b_{suffix}", {"k": "2"})],
        "sink_table string, data map<string,string>",
    )
    shape_dynamic_topic(routed).write.format("kafka").option(
        "kafka.bootstrap.servers", BOOTSTRAP
    ).save()

    for t, want in ((f"graft_dyn_a_{suffix}", "1"), (f"graft_dyn_b_{suffix}", "2")):
        stream = kafka_source(spark, BOOTSTRAP, t, group_id=f"g_{t}")
        q = (
            stream.writeStream.format("memory")
            .queryName(f"mem_{t}")
            .option("checkpointLocation", str(tmp_path / f"ck_{t}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        vals = [
            json.loads(r.value)["k"]
            for r in spark.sql(f"SELECT value FROM mem_{t}").collect()
        ]
        assert vals == [want]
