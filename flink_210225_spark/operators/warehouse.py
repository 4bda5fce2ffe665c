"""Serving-store layout (K3's scale posture).

The reference lands DWS output in ClickHouse tables keyed by stt and filters
dashboards with ``toYYYYMMDD(stt)=?`` (ProductStatsMapper.java:17) — i.e. a
date-partitioned serving store. Here the store is parquet partitioned by
``dt``: writes append per micro-batch (idempotent per checkpoint), and every
serving query that filters on ``dt`` prunes to the matching directories —
``PartitionFilters`` in the scan, zero I/O outside the window. At 100 TB,
day-partitioning bounds every dashboard query to ~1/365th of the store
regardless of total history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_stats(df: DataFrame, path: str, dt_col: str = "stt", mode: str = "append") -> None:
    """Land a stats table partitioned by calendar day of ``dt_col``.
    Rows are sorted by ``dt_col`` within each task so parquet row-group
    min/max stats stay tight — sub-day time-range filters skip whole row
    groups on top of the directory-level day pruning."""
    (
        df.withColumn("dt", F.to_date(F.col(dt_col)))
        .sortWithinPartitions("dt", dt_col)
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(path)
    )


def read_stats(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def stats_for_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """The toYYYYMMDD(stt)=? access path: dt predicate → partition pruning."""
    return read_stats(spark, path).filter(F.col("dt") == day)
