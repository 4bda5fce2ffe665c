#!/usr/bin/env python
"""Targeted per-query timing + plan dump for optimization work.

Usage:
    python tools/bench_some.py [--reps 3] [--plans-dir plans/r10 --suffix before]
        query1 query2 ...

Times each named registry query into the noop sink (median of --reps),
prints one JSON line {name: sec}, and (optionally) writes each query's
explain("formatted") to <plans-dir>/<name>_<suffix>.txt. Same session
config and warm-up discipline as bench.py so numbers are comparable.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None, help="also write the JSON map here")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_some", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    missing = [n for n in args.names if n not in queries]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    # same warm-up as bench.py: one JVM query + one mapInPandas worker spawn
    next(iter(queries.values()))(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        from flink_210225_spark.plans.explain import formatted_plan

        for n in args.names:
            spark.sparkContext.setJobDescription(f"plan:{n}")
            df = queries[n](spark, sf_dir)
            with open(os.path.join(args.plans_dir, f"{n}_{args.suffix}.txt"), "w") as f:
                f.write(formatted_plan(df))

    times: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.reps):
        for n in args.names:
            spark.sparkContext.setJobDescription(f"time:{n}")
            t0 = time.perf_counter()
            queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[n].append(time.perf_counter() - t0)
    med = {n: round(statistics.median(ts), 3) for n, ts in times.items()}
    line = json.dumps(med, separators=(",", ":"))
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
