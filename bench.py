#!/usr/bin/env python
"""BENCH harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing excludes result transfer to the driver: each query executes into the
noop sink (full computation, no collect)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from flink_210225_spark import get_spark  # noqa: E402


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="spark_graft_bench", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # Warm-up on the smallest fixture so per-query numbers measure the
    # engine, not first-call JIT — one JVM-side query for codegen, plus one
    # trivial mapInPandas so the Python/Arrow worker pool is already spawned
    # when the first Pandas-UDF query runs (worker spawn is ~3 s of pure
    # fixed overhead otherwise, billed to whichever query happens first).
    next(iter(queries.values()))(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
