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


def dq_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Data-quality profile of a table: per column, row count, null count,
    null fraction, and exact distinct count — the ingest-gate audit every
    warehouse load runs before publishing a partition (freshness/completeness
    checks compose on top via ``stats_for_day``).

    Plan: ONE aggregation pass. The multi-column exact countDistinct plans an
    Expand (input multiplied by #profiled columns before the partial agg) —
    the documented cost of exactness; at 100 TB swap
    ``approx_count_distinct`` in via the same expression slot for an
    Expand-free single scan. The unpivot to long form happens on the single
    aggregated row (driver-sized)."""
    names = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __null_{c}, __dist_{c}" for c in names)
    long = row.selectExpr(
        "__n AS n_rows",
        f"stack({len(names)}, {stack_args}) AS (col_name, n_null, n_distinct)",
    )
    return long.select(
        "col_name",
        "n_rows",
        "n_null",
        (F.floor(F.col("n_null") * 1000000.0 / F.col("n_rows") + 0.5) / 1000000).alias(
            "null_frac"
        ),
        "n_distinct",
    )


def dq_profile_events(tables: dict[str, DataFrame]) -> DataFrame:
    """Driver entry: profile the events stream table."""
    return dq_profile(tables["events"])


QUERIES = {"warehouse_dq_profile": dq_profile_events}

ORACLES = {
    "warehouse_dq_profile": """
        SELECT c.col_name,
               (SELECT count(*) FROM events)::BIGINT AS n_rows,
               c.n_null::BIGINT AS n_null,
               floor(c.n_null * 1000000.0 / (SELECT count(*) FROM events) + 0.5)
                   / 1000000 AS null_frac,
               c.n_distinct::BIGINT AS n_distinct
        FROM (
            SELECT 'event_id' AS col_name,
                   sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS n_null,
                   count(DISTINCT event_id) AS n_distinct FROM events
            UNION ALL
            SELECT 'ts', sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END),
                   count(DISTINCT ts) FROM events
            UNION ALL
            SELECT 'user_id', sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END),
                   count(DISTINCT user_id) FROM events
            UNION ALL
            SELECT 'event_type', sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END),
                   count(DISTINCT event_type) FROM events
            UNION ALL
            SELECT 'value', sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END),
                   count(DISTINCT value) FROM events
            UNION ALL
            SELECT 'props', sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END),
                   count(DISTINCT props) FROM events
        ) c
    """,
}
