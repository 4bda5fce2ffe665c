"""StructType schemas for the reference-native data shapes (FIXTURES.md §1-§5).

The reference keeps ODS/DWD data schemaless (fastjson JSONObject,
BaseLogApp.java:63-127); Spark-first means declaring the shape once and
letting ``from_json`` + Catalyst do typed, prunable parsing.
"""

from __future__ import annotations

from pyspark.sql import types as T

# App-log event envelope (ods_base_log; FIXTURES.md §1,
# reference BaseLogApp.java:46-141).
COMMON_SCHEMA = T.StructType(
    [
        T.StructField("mid", T.StringType()),
        T.StructField("uid", T.StringType()),
        T.StructField("vc", T.StringType()),
        T.StructField("ch", T.StringType()),
        T.StructField("ar", T.StringType()),
        T.StructField("is_new", T.StringType()),
        T.StructField("ba", T.StringType()),
        T.StructField("md", T.StringType()),
        T.StructField("os", T.StringType()),
    ]
)

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.StringType()),
        T.StructField("last_page_id", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("during_time", T.LongType()),
    ]
)

DISPLAY_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("display_type", T.StringType()),
        T.StructField("order", T.LongType()),
    ]
)

START_SCHEMA = T.StructType(
    [
        T.StructField("entry", T.StringType()),
        T.StructField("open_ad_id", T.LongType()),
        T.StructField("loading_time", T.LongType()),
    ]
)

LOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("common", COMMON_SCHEMA),
        T.StructField("page", PAGE_SCHEMA),
        T.StructField("displays", T.ArrayType(DISPLAY_SCHEMA)),
        T.StructField("start", START_SCHEMA),
        T.StructField("ts", T.LongType()),
    ]
)

# CDC change envelope (ods_base_db; FIXTURES.md §2, reference
# MyDeserializationSchema.java:23-73). data/before stay MapType: the payload
# schema varies per source table, exactly like the reference's JSONObject.
CDC_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("databaseName", T.StringType()),
        T.StructField("tableName", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Routing config (table_process; FIXTURES.md §5, reference
# bean/TableProcess.java:14-34).
TABLE_PROCESS_SCHEMA = T.StructType(
    [
        T.StructField("source_table", T.StringType()),
        T.StructField("operate_type", T.StringType()),
        T.StructField("sink_type", T.StringType()),
        T.StructField("sink_table", T.StringType()),
        T.StructField("sink_columns", T.StringType()),
        T.StructField("sink_pk", T.StringType()),
        T.StructField("sink_extend", T.StringType()),
    ]
)

SINK_TYPE_KAFKA = "kafka"
SINK_TYPE_HBASE = "hbase"
