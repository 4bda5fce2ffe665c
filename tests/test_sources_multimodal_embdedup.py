"""CDC/Kafka source builders, router driver query, multimodal driver queries,
and embedding-cosine near-dup."""

import pytest

from pyspark.sql import functions as F

from flink_210225_spark.operators import router
from flink_210225_spark.ops import dedup, multimodal
from flink_210225_spark.sources import cdc, kafka

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


def test_parse_envelopes_clean_and_dirty(spark):
    raw = spark.createDataFrame(
        [
            ('{"databaseName":"g","tableName":"t","type":"insert","data":{"id":"1"}}',),
            ('{"tableName":"t","type":"update","data":{"id":"2"},"before":{"id":"1"}}',),
            ("not json at all",),
            ('{"databaseName":"g","data":{"id":"3"}}',),  # no tableName/type
        ],
        "value string",
    )
    clean, dirty = cdc.parse_envelopes(raw)
    rows = {r["data"]["id"]: r for r in clean.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["2"]["before"] == {"id": "1"}
    assert dirty.count() == 2


def test_snapshot_and_initial_load(spark, tables):
    snap = cdc.snapshot_envelopes(tables["region"], "gmall", "region")
    got = snap.collect()
    assert len(got) == tables["region"].count()
    assert all(r["type"] == "insert" and r["tableName"] == "region" for r in got)
    assert all("r_name" in r["data"] for r in got)

    live = spark.createDataFrame(
        [("gmall", "region", "update", {"r_regionkey": "0"}, {"r_regionkey": "0"})],
        cdc.CDC_ENVELOPE_SCHEMA,
    )
    combined = cdc.initial_load(tables["region"], live, "gmall", "region")
    assert combined.count() == len(got) + 1


def test_kafka_shapers_batch_side(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    fixed = kafka.shape_for_topic(df, "dwd_x", ["id", "name"])
    assert fixed.columns == ["topic", "value"]
    assert {r["topic"] for r in fixed.collect()} == {"dwd_x"}

    routed = spark.createDataFrame(
        [("dwd_a", {"id": "1"}), ("dwd_b", {"id": "2"})],
        "sink_table string, data map<string,string>",
    )
    dyn = kafka.shape_dynamic_topic(routed)
    got = {r["topic"]: r["value"] for r in dyn.collect()}
    assert got == {"dwd_a": '{"id":"1"}', "dwd_b": '{"id":"2"}'}


def test_cdc_route_config_matches_oracle(tables):
    assert_matches_oracle(
        router.QUERIES["cdc_route_config"](tables),
        router.ORACLES["cdc_route_config"],
        SF_DIR,
    )


@pytest.mark.parametrize("name", sorted(multimodal.QUERIES))
def test_multimodal_match_oracle(name, tables):
    assert_matches_oracle(
        multimodal.QUERIES[name](tables), multimodal.ORACLES[name], SF_DIR
    )


def test_embedding_near_dups_matches_oracle(tables_med):
    assert_matches_oracle(
        dedup.embedding_near_dups(tables_med),
        dedup.ORACLES["dedup_embedding_cosine"],
        "/root/testdata/sf0.01",
    )


def test_embedding_near_dups_symmetric_threshold(tables_med):
    out = dedup.embedding_near_dups(tables_med, threshold=0.35)
    rows = out.collect()
    assert all(r["vec_a"] < r["vec_b"] for r in rows)
    assert all(r["cosine"] >= 0.35 for r in rows)


def test_decode_media_feature_shape(spark):
    assets = multimodal.make_demo_assets(spark, n=12)
    out = multimodal.decode_media(assets).collect()
    assert len(out) == 12
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in out)
    assert all(-1.0 <= x <= 1.0 for r in out for x in r["feature"])


def test_socket_source_runtime_end_to_end(spark):
    """S5 at runtime, not just construction: a real TCP listener feeds the
    socket source (reference TestFlinkSQLJoin.java:20-29 reads nc lines);
    lines stream through a parse projection into a memory sink."""
    import socket
    import threading
    import time

    from pyspark.sql import functions as F

    lines = ["1001,click", "1002,view", "1003,click"]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop_evt = threading.Event()

    def serve():
        conn, _ = srv.accept()
        try:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop_evt.wait(timeout=30)  # hold the connection until asserted
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    raw = kafka.socket_source(spark, "127.0.0.1", port)
    parsed = raw.select(F.split("value", ",").alias("p")).select(
        F.col("p").getItem(0).cast("long").alias("user_id"),
        F.col("p").getItem(1).alias("event_type"),
    )
    q = (
        parsed.writeStream.format("memory")
        .queryName("socket_rt")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.sql(
                "SELECT user_id, event_type FROM socket_rt ORDER BY user_id"
            ).collect()
            if len(got) >= len(lines):
                break
            time.sleep(0.5)
        assert [(r.user_id, r.event_type) for r in got] == [
            (1001, "click"),
            (1002, "view"),
            (1003, "click"),
        ]
    finally:
        stop_evt.set()
        q.stop()
        srv.close()


def test_pyds_batch_read_row_groups(spark):
    """Custom Python DataSource (batch): row-group-partitioned read must
    return exactly the parquet fixture's rows."""
    from flink_210225_spark.sources.pyds import register

    register(spark)
    path = "/root/testdata/sf0.001/documents.parquet"
    got = (
        spark.read.format("fixture_replay").option("path", path).load()
    )
    want = spark.read.parquet(path)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pyds_stream_offsets_and_restart_recovery(spark, tmp_path):
    """Custom source streaming: row-offset cursor serves batch_rows per
    micro-batch; repeated availableNow restarts over the SAME checkpoint
    drain the fixture without loss or duplication (offset recovery) into a
    file sink with exactly-once commit log."""
    from flink_210225_spark.sources.pyds import register

    register(spark)
    path = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    prev = -1
    for _ in range(10):
        stream = (
            spark.readStream.format("fixture_replay")
            .option("path", path)
            .option("batch_rows", "150")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = spark.read.parquet(out).count()
        if n == prev:
            break
        prev = n
    got = spark.read.parquet(out)
    want = spark.read.parquet(path)
    assert got.count() == want.count() == 500
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
