#!/usr/bin/env python
"""Reproducer probe for the r10 dedup signature-family regression.

Runs a list of registry queries bench-style (noop sink, rep-major) and, after
each query, samples the driver block manager via getRDDStorageInfo(): number
of cached/checkpointed RDDs still alive and their total memory footprint.
Prints per-query times plus the storage-accumulation trace so the
"eager localCheckpoint blocks pile up across the session and squeeze
execution memory / bloat GC" hypothesis (VERDICT r10 what's-wrong #1) can be
confirmed or refuted directly.

Usage:
    python tools/probe_accum.py --reps 2 --trace-every 10 q1 q2 ...
    python tools/probe_accum.py --prefix-file names.txt --victims dedup_simhash,...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from flink_210225_spark import get_spark  # noqa: E402


def storage_sample(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    n = len(infos)
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return n, mem, disk


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--prefix-file", default=None,
                    help="file with one query name per line, run before names")
    ap.add_argument("--victims", default=None,
                    help="comma-separated victim queries timed at the end")
    ap.add_argument("--trace-every", type=int, default=10)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (e.g. spark.cleaner.periodicGC.interval=60s)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "false",
    }
    for kv in args.conf:
        k, _, v = kv.partition("=")
        extra[k] = v
    spark = get_spark(app_name="probe_accum", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    names = list(args.names)
    if args.prefix_file:
        with open(args.prefix_file) as f:
            names = [ln.strip() for ln in f if ln.strip()] + names
    victims = [v for v in (args.victims or "").split(",") if v]
    missing = [n for n in names + victims if n not in queries]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    # same warm-up as bench.py
    next(iter(queries.values()))(spark, "/root/testdata/sf0.001").write.format(
        "noop").mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()
    next(iter(queries.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    times: dict[str, list[float]] = {n: [] for n in names + victims}
    trace = []
    for rep in range(args.reps):
        for i, n in enumerate(names + victims):
            spark.sparkContext.setJobDescription(f"probe:{n}")
            t0 = time.perf_counter()
            queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[n].append(time.perf_counter() - t0)
            if i % args.trace_every == 0 or n in victims:
                cnt, mem, disk = storage_sample(spark)
                trace.append({
                    "rep": rep, "i": i, "q": n,
                    "t": round(times[n][-1], 2),
                    "rdds": cnt, "mem_mb": round(mem / 2**20, 1),
                    "disk_mb": round(disk / 2**20, 1),
                })
    med = {n: round(statistics.median(ts), 3) for n, ts in times.items()}
    out = {
        "victims": {n: med[n] for n in victims} if victims else {},
        "all": med,
        "trace": trace,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
