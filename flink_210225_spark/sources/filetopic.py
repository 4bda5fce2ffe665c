"""An embedded file-backed topic broker as a custom Python DataSource —
the runtime stand-in for Kafka in this broker-less container (SURVEY §2.2
K1/K2; reference producer surface ``MyKafkaUtils.java:24-65``).

``format("file_topic")`` gives both halves of the contract the Kafka
builders in ``sources/kafka.py`` target, with REAL streaming machinery on
each side:

- **Sink** (``writeStream.format("file_topic").option("path", broker)``):
  consumes the same ``(topic, value)`` rows ``shape_for_topic`` /
  ``shape_dynamic_topic`` produce for the Kafka writer — including K2's
  per-row dynamic topic routing. Executors stage one file per (task,
  topic) under ``<topic>/staged/``; the driver-side ``commit(messages,
  batchId)`` publishes them into the append-only ``<topic>/log/`` under
  batch-prefixed names. Publish is idempotent per batch (a replayed batch
  first clears its own prefix), which is exactly the transactional
  producer's effective guarantee (``MyKafkaUtils.java:31-40``): a batch's
  rows appear in the log once no matter how many times the batch runs.

- **Source** (``readStream.format("file_topic").option("topic", t)``):
  replays one topic's committed log in offset order with a file-index
  cursor — the (partition, offset) bookkeeping of a Kafka consumer in one
  dimension. Restart from a checkpoint resumes at the cursor: no rows
  re-delivered, none skipped. Log files are immutable after publish, so
  ``readBetweenOffsets`` replay is deterministic.

Scale: staged writes are per-executor (no driver data path); the driver
commit renames file handles only. The file-index offset serves from the
driver like ``SimpleDataSourceStreamReader`` prescribes — the
partition-planning ``DataSourceStreamReader`` is the drop-in upgrade once
per-executor read fan-out matters, same note as ``pyds.py``.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

TOPIC_SCHEMA = "value string"


@dataclass
class _StagedFiles(WriterCommitMessage):
    files: list  # [(topic, staged_path), ...]


class _TopicStreamWriter(DataSourceStreamWriter):
    """Per-query stream writer. ``producer_id`` (option) is the
    transactional-producer analog: batch file names are prefixed
    ``<producer_id>-b<batchId>`` so a REPLAYED batch from the same producer
    republishes idempotently (its old files and sequence entries are
    cleared first), while distinct producers never collide. Without an
    explicit producer_id a random one is drawn per query start —
    at-least-once across checkpoint restarts, exactly Kafka's
    non-transactional producer posture."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.producer_id = options.get("producer_id") or f"p{uuid.uuid4().hex[:8]}"

    def write(self, iterator):
        by_topic: dict[str, list[str]] = {}
        for row in iterator:
            by_topic.setdefault(row.topic, []).append(
                "" if row.value is None else str(row.value)
            )
        staged = []
        for topic, values in by_topic.items():
            sdir = os.path.join(self.path, topic, "staged")
            os.makedirs(sdir, exist_ok=True)
            fpath = os.path.join(sdir, f"t{uuid.uuid4().hex}.log")
            with open(fpath, "w") as f:
                f.write("\n".join(values) + "\n")
            staged.append((topic, fpath))
        return _StagedFiles(files=staged)

    def commit(self, messages, batchId: int) -> None:
        prefix = f"{self.producer_id}-b{batchId:012d}"
        staged = sorted(
            (t, p) for m in messages if m is not None for (t, p) in m.files
        )
        # Publish = rename into log/ + append the file name to the topic's
        # append-only _seq index (the reader's offset axis: indices only
        # ever grow at the end, so a committed cursor stays valid however
        # later producers' names sort). Idempotent republish: a replayed
        # batch first clears its own prefix from both the log dir and the
        # index. The index rewrite is a temp+atomic-replace; concurrent
        # producers on ONE topic could interleave here — the embedded
        # broker models single-writer-per-topic, the usual CDC layout
        # (real Kafka's broker serializes this).
        per_topic: dict[str, list[str]] = {}
        for i, (topic, fpath) in enumerate(staged):
            per_topic.setdefault(topic, []).append(fpath)
        for topic, files in per_topic.items():
            ldir = os.path.join(self.path, topic, "log")
            os.makedirs(ldir, exist_ok=True)
            for f in os.listdir(ldir):
                if f.startswith(prefix):
                    os.remove(os.path.join(ldir, f))
            seq_path = os.path.join(self.path, topic, "_seq")
            kept = []
            if os.path.exists(seq_path):
                with open(seq_path) as f:
                    kept = [
                        ln for ln in f.read().splitlines() if not ln.startswith(prefix)
                    ]
            names = []
            for i, fpath in enumerate(files):
                name = f"{prefix}-{i:06d}.log"
                os.replace(fpath, os.path.join(ldir, name))
                names.append(name)
            tmp_seq = seq_path + f".tmp_{uuid.uuid4().hex}"
            with open(tmp_seq, "w") as f:
                f.write("\n".join(kept + names) + "\n")
            os.replace(tmp_seq, seq_path)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for _topic, fpath in m.files:
                try:
                    os.remove(fpath)
                except OSError:
                    pass


class _LogFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _log_files(path: str, topic: str) -> list[str]:
    """Committed log files in PUBLISH order (the _seq index), not name
    order — offsets are indices into this list and must never shift."""
    seq_path = os.path.join(path, topic, "_seq")
    if not os.path.exists(seq_path):
        return []
    ldir = os.path.join(path, topic, "log")
    with open(seq_path) as f:
        return [os.path.join(ldir, ln) for ln in f.read().splitlines() if ln]


def _read_lines(fpath: str):
    with open(fpath) as f:
        for line in f.read().splitlines():
            yield (line,)


class _TopicBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.topic = options["topic"]

    def partitions(self):
        return [_LogFilePartition(p) for p in _log_files(self.path, self.topic)]

    def read(self, partition: _LogFilePartition):
        yield from _read_lines(partition.path)


class _TopicStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.topic = options["topic"]
        self.max_files = int(options.get("max_files_per_batch", "1"))

    def initialOffset(self):
        return {"files": 0}

    def read(self, start: dict):
        files = _log_files(self.path, self.topic)
        lo = start["files"]
        hi = min(lo + self.max_files, len(files))
        rows = [r for f in files[lo:hi] for r in _read_lines(f)]
        return iter(rows), {"files": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _log_files(self.path, self.topic)
        return iter(
            [r for f in files[start["files"] : end["files"]] for r in _read_lines(f)]
        )

    def commit(self, end: dict):
        pass


class FileTopicSource(DataSource):
    """``format("file_topic")``: options ``path`` (broker dir), ``topic``
    (reader side), ``max_files_per_batch`` (reader micro-batch size)."""

    @classmethod
    def name(cls) -> str:
        return "file_topic"

    def schema(self) -> str:
        return TOPIC_SCHEMA

    def reader(self, schema):
        return _TopicBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _TopicStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return _TopicStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(FileTopicSource)


def topic_roundtrip_lang_counts(tables):
    """Driver-gated K1/K2 capstone: the documents fixture streams through
    the FULL producer→broker→consumer loop — rows shaped to (topic, value)
    with a PER-ROW DYNAMIC TOPIC (one topic per language, the reference's
    sinkTable routing, BaseDbApp.java:83-89), stream-written into the
    file_topic broker via staged-files + driver commit, then every topic
    read back through the broker's log, JSON-parsed, and aggregated. The
    oracle aggregates the fixture directly, so a row lost or duplicated
    anywhere in the sink's commit protocol or the reader's log walk breaks
    the count/hash gate.

    Scale: the broker write is executor-parallel (one staged file per
    task×topic); the read-back fans out one task per log file. The
    per-language topic list is collected driver-side but is vocabulary-
    sized (≤ tens), the same boundedness argument as run_router_stream's
    table-name collect."""
    import os

    from pyspark.sql import functions as F

    from flink_210225_spark.streaming.pipelines import _scratch, _stage_fixture

    docs = tables["documents"]
    spark = docs.sparkSession
    register(spark)
    broker = _scratch(prefix="file_topic_broker_")
    cp = _scratch(prefix="file_topic_wcp_")
    srcdir = _scratch(prefix="file_topic_src_")
    _stage_fixture(docs, srcdir, "docs")
    stream = spark.readStream.schema(docs.schema).parquet(srcdir)
    shaped = stream.select(
        F.concat(F.lit("docs_"), F.col("lang")).alias("topic"),
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("value"),
    )
    q = (
        shaped.writeStream.format("file_topic")
        .option("path", broker)
        .option("producer_id", "roundtrip")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    topics = sorted(
        d for d in os.listdir(broker) if os.path.isdir(os.path.join(broker, d))
    )
    reads = None
    for t in topics:
        r = spark.read.format("file_topic").option("path", broker).option("topic", t).load()
        reads = r if reads is None else reads.unionByName(r)
    parsed = reads.select(
        F.from_json("value", "doc_id bigint, lang string, n_chars bigint").alias("j")
    ).select("j.*")
    return parsed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("char_total"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


QUERIES = {"stream_topic_roundtrip": topic_roundtrip_lang_counts}

ORACLES = {
    "stream_topic_roundtrip": """
        SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS char_total,
               min(doc_id)::BIGINT AS min_id, max(doc_id)::BIGINT AS max_id
        FROM documents GROUP BY lang
    """,
}
