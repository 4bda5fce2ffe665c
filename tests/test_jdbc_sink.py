"""Real-JDBC smoke for the K3 drop-in (ClickHouseUtil.java:20-54 analog).

Spark bundles Apache Derby (the Hive-metastore store), which doubles as an
in-process JDBC database with a Spark-shipped dialect — so ``df.write.jdbc``
runs the genuine batched-INSERT protocol end-to-end with no external
service: create table, per-partition connections, addBatch/executeBatch,
then a read-back through ``spark.read.jdbc``.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_210225_spark.operators.warehouse import read_stats_jdbc, write_stats_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/servingdb;create=true"


def test_jdbc_roundtrip_stats(spark, tables, tmp_path):
    stats = (
        tables["orders"]
        .groupBy(F.to_date("o_orderdate").cast("string").alias("dt"))
        .agg(
            F.count("*").cast("long").alias("order_ct"),
            F.sum(F.col("o_totalprice").cast("double")).alias("gmv"),
        )
    )
    url = _url(tmp_path)
    write_stats_jdbc(stats, url, "product_stats", DERBY_DRIVER, mode="overwrite")
    back = read_stats_jdbc(spark, url, "product_stats", DERBY_DRIVER)
    want = {(r["dt"], r["order_ct"]) for r in stats.collect()}
    got = {(r["dt"], r["order_ct"]) for r in back.collect()}
    assert got == want
    assert back.count() == stats.count()


def test_jdbc_append_mode_accumulates(spark, tables, tmp_path):
    """K3 is an append sink (one batch per buffered window) — two appends
    of the same frame must double the row count, not dedup or fail."""
    one_day = (
        tables["orders"]
        .groupBy(F.to_date("o_orderdate").cast("string").alias("dt"))
        .agg(F.count("*").cast("long").alias("order_ct"))
        .limit(5)
    )
    url = _url(tmp_path)
    write_stats_jdbc(one_day, url, "daily_ct", DERBY_DRIVER, mode="overwrite")
    write_stats_jdbc(one_day, url, "daily_ct", DERBY_DRIVER, mode="append")
    back = read_stats_jdbc(spark, url, "daily_ct", DERBY_DRIVER)
    assert back.count() == 2 * one_day.count()
