"""transformWithStateInPandas (Spark 4 arbitrary-stateful-v2) capstone —
per-key running totals whose ValueState must survive across micro-batches
of a double fixture replay (the stream_dedup_wm pattern applied to the
NEW operator API).

Environment-bound like the Kafka broker tests: the Python side of
transformWithState speaks a protobuf protocol to the JVM state server,
and this sandbox ships no `google.protobuf` — the test SKIPS (not
deleted) and runs for real the moment the dependency exists. Verified
against pyspark 4.1.2: without protobuf the runner dies with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (ImportError: descriptor).
"""

import os

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas needs protobuf (not shipped here)",
)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningTotals(StatefulProcessor):
    """Per-user running (event count, cent sum) in ONE ValueState row."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._tot = handle.getValueState("tot", "n BIGINT, cents BIGINT")

    def handleInputRows(self, key, rows, timer_values):
        n, cents = 0, 0
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        prev = self._tot.get()
        if prev:
            n += prev[0]
            cents += prev[1]
        self._tot.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "cents": [cents]})

    def close(self) -> None:
        pass


def test_transform_with_state_running_totals(spark, tables, tmp_path):
    from flink_210225_spark.streaming.pipelines import _local_paths

    ev = tables["events"]
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    os.makedirs(src)
    base = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    fix = str(tmp_path / "fix")
    base.write.mode("overwrite").parquet(fix)
    parts = [f for f in os.listdir(fix) if f.endswith(".parquet")]
    for stem in ("replay_a", "replay_b"):
        for i, p in enumerate(parts):
            os.symlink(os.path.join(fix, p), os.path.join(src, f"{stem}_{i}.parquet"))

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    res = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n bigint, cents bigint",
        outputMode="Update",
        timeMode="None",
    )
    q = (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # final per-user totals = MAX over emitted updates (both counters are
    # monotone); must equal exactly 2x the batch totals (double replay
    # through carried state — a state loss halves, a leak doubles)
    got = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max("cents").alias("cents"))
    )
    want = base.groupBy("user_id").agg(
        (F.count("*") * 2).alias("n"), (F.sum("cents") * 2).alias("cents")
    )
    diff = got.join(want, "user_id", "full").where(
        got["n"].isNull()
        | want["n"].isNull()
        | (got["n"] != want["n"])
        | (got["cents"] != want["cents"])
    )
    assert diff.count() == 0
