"""Streaming SQL jobs — the reference's Flink-SQL entry path (SURVEY §3.2).

ProvinceStatsSqlApp/KeywordStatsApp register a Kafka-backed dynamic table
with a watermark DDL, run a TUMBLE group-by in SQL, and bridge back to a
DataStream (ProvinceStatsSqlApp.java:26-74). The Spark spelling: register the
stream as a temp view, run ``spark.sql`` with ``window()`` — the SAME SQL
text works on batch and streaming inputs, which is how these jobs are
checked (batch run hash-matched against DuckDB; streaming run compared to
the batch result in tests).

Streaming nuance: ``COUNT(DISTINCT ...)`` is not a supported streaming
aggregate, so the SQL uses ``size(collect_set(...))`` — identical semantics
(the reference's HashSet-state distinct, A2/A3, is literally collect_set),
legal in both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROVINCE_TUMBLE_SQL = """
SELECT
  date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
  date_format(window.end,   'yyyy-MM-dd HH:mm:ss') AS edt,
  event_type,
  size(collect_set(user_id)) AS uv_ct,
  count(*) AS pv_ct,
  floor(sum(value) * 100 + 0.5) / 100 AS value_sum
FROM {view}
GROUP BY window(ts, '1 hour'), event_type
"""

KEYWORD_TUMBLE_SQL = """
SELECT
  date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
  event_type AS keyword,
  count(*) AS ct,
  'SEARCH' AS source
FROM {view}
GROUP BY window(ts, '1 day'), event_type
"""


def register_and_run(
    spark: SparkSession, df: DataFrame, view: str, sql_template: str
) -> DataFrame:
    """§3.2 steps 2-3: register the (batch or streaming) DataFrame as a
    dynamic-table view, run the tumble SQL over it. For streaming inputs add
    ``withWatermark`` upstream and write with outputMode('complete'/'append')
    — tumble aggs are append-safe exactly as the reference's toAppendStream
    bridge."""
    df.createOrReplaceTempView(view)
    return spark.sql(sql_template.format(view=view))


def province_stats_sql(spark: SparkSession, events: DataFrame) -> DataFrame:
    """ProvinceStatsSqlApp analog (group-dims + tumble + distinct count +
    stt/edt date_format — ProvinceStatsSqlApp.java:47-65)."""
    return register_and_run(spark, events, "events_view_province", PROVINCE_TUMBLE_SQL)


def keyword_stats_sql(spark: SparkSession, events: DataFrame) -> DataFrame:
    """KeywordStatsApp analog (tumble COUNT(*) + constant source tag —
    KeywordStatsApp.java:56-66)."""
    return register_and_run(spark, events, "events_view_keyword", KEYWORD_TUMBLE_SQL)


def _province_q(tables: dict[str, DataFrame]) -> DataFrame:
    ev = tables["events"]
    return province_stats_sql(ev.sparkSession, ev)


def _keyword_q(tables: dict[str, DataFrame]) -> DataFrame:
    ev = tables["events"]
    return keyword_stats_sql(ev.sparkSession, ev)


QUERIES = {
    "sql_province_tumble": _province_q,
    "sql_keyword_tumble": _keyword_q,
}

# Epoch-aligned tumble bounds: Spark window() aligns to the epoch, so the
# DuckDB oracle buckets with to_timestamp(floor(epoch/width)*width).
ORACLES = {
    "sql_province_tumble": """
        SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600), '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600 + 3600), '%Y-%m-%d %H:%M:%S') AS edt,
               event_type,
               count(DISTINCT user_id) AS uv_ct,
               count(*) AS pv_ct,
               floor(sum(value) * 100 + 0.5) / 100 AS value_sum
        FROM events
        GROUP BY 1, 2, 3
    """,
    "sql_keyword_tumble": """
        SELECT strftime(to_timestamp(floor(epoch(ts) / 86400) * 86400), '%Y-%m-%d %H:%M:%S') AS stt,
               event_type AS keyword,
               count(*) AS ct,
               'SEARCH' AS source
        FROM events
        GROUP BY 1, 2
    """,
}
