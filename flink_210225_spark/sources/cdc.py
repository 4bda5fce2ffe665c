"""CDC ingestion (SURVEY §2.1 S1/S2 + §2.9 D2).

The reference captures MySQL binlogs with Debezium and normalizes each
SourceRecord into a canonical JSON envelope
``{databaseName, tableName, type: insert|update|delete, data:{...},
before:{...}}`` (reference MyDeserializationSchema.java:23-73), with startup
mode ``initial()`` = full snapshot then live binlog, or ``latest()`` = binlog
only (FlinkCDCApp.java:38-48).

Spark has no binlog source, so the engine's contract is the envelope itself:
anything that can deliver envelope JSON lines (Kafka topic, file drop,
Debezium Server → Kafka) plugs in here. ``parse_envelopes`` is the D2
equivalent — typed parse-or-NULL with the dirty side split out, the same
dead-letter pattern as the log source (BaseLogApp.java:57-70).
``snapshot_envelopes`` renders a static table into bootstrap envelopes, so
``initial()`` = snapshot_envelopes(dim) unioned ahead of the live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_210225_spark.schemas import CDC_ENVELOPE_SCHEMA


def parse_envelopes(raw: DataFrame, json_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """(clean, dirty): typed envelopes where the JSON parses AND carries the
    minimum routable fields (tableName + type); everything else goes to the
    dirty side for a dead-letter sink. Works identically on batch and
    streaming inputs."""
    parsed = raw.withColumn("env", F.from_json(F.col(json_col), CDC_ENVELOPE_SCHEMA))
    ok = F.col("env").isNotNull() & F.col("env.tableName").isNotNull() & F.col(
        "env.type"
    ).isNotNull()
    clean = parsed.filter(ok).select("env.*")
    dirty = parsed.filter(~ok).select(F.col(json_col).alias("raw"))
    return clean, dirty


def snapshot_envelopes(
    table: DataFrame, database: str, table_name: str
) -> DataFrame:
    """Startup-mode ``initial()``: render a static table as bootstrap insert
    envelopes (the Debezium snapshot phase). All values go through the
    varchar map exactly like the reference's Phoenix dims store everything as
    varchar (TableProcessFunction.java:105-107)."""
    kvs: list = []
    for f in table.schema.fields:
        kvs.append(F.lit(f.name))
        kvs.append(F.col(f.name).cast("string"))
    return table.select(
        F.lit(database).alias("databaseName"),
        F.lit(table_name).alias("tableName"),
        F.lit("insert").alias("type"),
        F.create_map(*kvs).alias("data"),
        F.lit(None).cast("map<string,string>").alias("before"),
    )


def initial_load(
    snapshot: DataFrame, live: DataFrame, database: str, table_name: str
) -> DataFrame:
    """``StartupOptions.initial()``: snapshot envelopes then the live change
    stream (binlog). In batch tests both sides are DataFrames; in production
    the live side is the Kafka envelope stream and the snapshot is a one-off
    backfill written through the same sink."""
    return snapshot_envelopes(snapshot, database, table_name).unionByName(live)
