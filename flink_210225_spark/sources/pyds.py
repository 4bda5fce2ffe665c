"""Custom Python DataSource (PySpark 4 DataSource API): a deterministic
fixture-replay source, batch + streaming.

The reference's custom source surface is Kafka consumers and the socket
text source (SURVEY §2.1 S3/S5, ``utils/MyKafkaUtils.java:24-65``,
``TestFlinkSQLJoin.java:20-29``) — sources that REPLAY an external feed
into the engine. No broker exists in this container, so this module
implements the same capability as a first-class Spark data source instead
of a wrapper: ``spark.read.format("fixture_replay")`` /
``spark.readStream.format("fixture_replay")`` serve a parquet fixture as
if it were an external feed, with real offset management (streaming) and
real partition planning (batch).

Scale notes baked into the design:
- Batch: one ``InputPartition`` per parquet ROW GROUP — executors read
  only their row group (pyarrow), so a 100 TB dataset fans out without any
  driver materialization; this is the same partition-planning contract the
  built-in parquet source uses.
- Streaming: ``SimpleDataSourceStreamReader`` with a row-offset cursor —
  each micro-batch serves the next ``batch_rows`` rows and advances the
  offset, exactly a Kafka consumer's (partition, offset) bookkeeping in
  one dimension. The simple API serves from the driver (prefetch path);
  the partition-planning ``DataSourceStreamReader`` is the drop-in upgrade
  once per-executor fan-out matters.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


def _paths(options: dict) -> list[str]:
    """``path`` may be one file or a comma-separated list (multi-part
    datasets) — every file participates in partition planning."""
    return [p for p in options["path"].split(",") if p]


class _FixtureBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.paths = _paths(options)

    def partitions(self):
        import pyarrow.parquet as pq

        return [
            _RowGroupPartition(path, g)
            for path in self.paths
            for g in range(pq.ParquetFile(path).num_row_groups)
        ]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read_row_group(partition.row_group)
        cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
        for row in zip(*cols):
            yield row


class _FixtureStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.paths = _paths(options)
        self.batch_rows = int(options.get("batch_rows", "200"))
        self._rows = None

    def _load(self):
        if self._rows is None:
            import pyarrow.parquet as pq

            rows: list = []
            for path in self.paths:
                table = pq.read_table(path)
                cols = [
                    table.column(i).to_pylist() for i in range(table.num_columns)
                ]
                rows.extend(zip(*cols))
            self._rows = rows
        return self._rows

    def initialOffset(self):
        return {"row": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = start["row"]
        hi = min(lo + self.batch_rows, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = self._load()
        return iter(rows[start["row"] : end["row"]])

    def commit(self, end: dict):
        pass


class FixtureReplaySource(DataSource):
    """``format("fixture_replay")``: options ``path`` (parquet file) and
    ``batch_rows`` (streaming micro-batch size)."""

    @classmethod
    def name(cls) -> str:
        return "fixture_replay"

    def schema(self) -> str:
        return self.options.get("schemaDDL", DOCS_SCHEMA)

    def reader(self, schema):
        return _FixtureBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _FixtureStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FixtureReplaySource)


def replay_lang_counts(tables):
    """Driver query: the documents fixture read back through the CUSTOM
    Python data source (row-group-partitioned batch path), aggregated per
    language — the oracle reads the same parquet through DuckDB, so a
    wrong row, a dropped row group, or a type mismatch in the source
    implementation breaks the row-count/hash gate."""
    from pyspark.sql import functions as F

    docs = tables["documents"]
    spark = docs.sparkSession
    register(spark)
    locals_ = sorted(
        "/" + f.split(":", 1)[1].lstrip("/") for f in docs.inputFiles()
    )
    replayed = (
        spark.read.format("fixture_replay").option("path", ",".join(locals_)).load()
    )
    return replayed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("char_total"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


QUERIES = {"source_pyds_replay": replay_lang_counts}

ORACLES = {
    "source_pyds_replay": """
        SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS char_total,
               min(doc_id)::BIGINT AS min_id, max(doc_id)::BIGINT AS max_id
        FROM documents GROUP BY lang
    """,
}
