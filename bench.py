#!/usr/bin/env python
"""BENCH harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing excludes result transfer to the driver: each query executes into the
noop sink (full computation, no collect).

Protocol (drift-proofing, VERDICT r1 #4/#10): the whole suite runs
$SPARK_GRAFT_BENCH_REPS times (default 3, rep-major order) and each query
reports its MEDIAN — a transient VM stall inflates one rep, not the
recorded number (r1's lone >2x outlier, dedup_normalized at 10.98 s vs
2.01 s recorded, was exactly such a stall). "value" is the sum of medians;
"rep_totals" exposes each rep's wall-clock sum so cross-round comparisons
can spot whole-run drift, not just per-query spikes."""

from __future__ import annotations

import json
import os
import statistics
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
    # r10 (VERDICT r9 #3): ALSO warm up at the benched SF — footer reads,
    # file listing and broadcast machinery at sf0.1 otherwise bill their
    # first-touch cost to whichever query sits first in registry order
    # (window_haar_energy absorbed ~0.4 s of first-query residue in r9).
    next(iter(queries.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, list[float]] = {name: [] for name in queries}
    for _ in range(reps):
        for name, fn in queries.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)

    per_query = {name: round(statistics.median(ts), 3) for name, ts in times.items()}

    # Regression gate vs the pinned baseline medians (VERDICT r2 #8): the
    # latest driver-confirmed green round's run is the reference; every
    # query present in both runs reports its ratio, and ratios > 1.5x are
    # called out in their own key so a regression is visible in the bench
    # line itself, not only by diffing files across rounds. Re-pinned to the
    # r8 driver run per VERDICT r8 #1 (the r4-era pins had drifted ~1.6x
    # loose after the footer-cache + heap fixes, blunting the gate).
    baseline_path = os.environ.get(
        "SPARK_GRAFT_BASELINE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_PIN_r8.json"),
    )
    baseline_info = {}
    try:
        with open(baseline_path) as f:
            base_doc = json.load(f)
        base = base_doc["queries"]
        # Refuse a COMPACT bench line as baseline (the printed line carries
        # only the slowest-25, rounded — using it would silently narrow the
        # regression gate): follow its queries_file sidecar if present,
        # else flag and skip the gate.
        if "queries_file" in base_doc:
            try:
                with open(base_doc["queries_file"]) as f:
                    base = json.load(f)["queries"]
            except (OSError, KeyError, ValueError, TypeError):
                raise ValueError("baseline is a truncated compact line")
        common = [n for n in per_query if n in base and base[n] > 0]
        ratios = {n: round(per_query[n] / base[n], 2) for n in common}
        # Drift normalization (VERDICT r9 #3): raw ratios conflate host
        # drift with real regressions — in r9 the suite ran 0.89x overall
        # yet 12 queries flagged >1.5x, 11 of which drifted identically to
        # untouched controls on re-adjudication. Divide every ratio by the
        # median ratio of a pinned NEVER-OPTIMIZED control set (spanning
        # families and cost classes) so a real 1.5x can't hide inside (or
        # be faked by) 1.8x host drift. Raw "regressions" stays for
        # cross-round continuity; the normalized key is the gate to read.
        controls = [
            "serving_gmv",
            "dedup_exact",
            "log_props_extract",
            "join_interval_order_detail",
            "window_visitor_stats",
            "state_uv_dedup",
            "cdc_route_config",
            "sql_province_tumble",
            "text_repetition",
            "sample_hash_split",
        ]
        ctrl_ratios = [ratios[n] for n in controls if n in ratios]
        drift = (
            round(statistics.median(ctrl_ratios), 3) if len(ctrl_ratios) >= 5 else 1.0
        )
        normalized = {n: round(r / drift, 2) for n, r in ratios.items()}
        baseline_info = {
            "baseline": os.path.basename(baseline_path),
            "common_total": round(sum(per_query[n] for n in common), 3),
            "baseline_total": round(sum(base[n] for n in common), 3),
            "drift_factor": drift,
            "regressions": {
                n: r for n, r in sorted(ratios.items(), key=lambda kv: -kv[1]) if r > 1.5
            },
            "regressions_normalized": {
                n: r
                for n, r in sorted(normalized.items(), key=lambda kv: -kv[1])
                if r > 1.5
            },
        }
    except (OSError, KeyError, ValueError):
        pass  # no baseline available: emit the plain bench line

    # The driver records only the last ~2 KB of stdout ("tail") — a full
    # 369-query map is ~11 KB and can never parse there (every BENCH_rN.json
    # landed "parsed": null). So: the FULL per-query map goes to a sidecar
    # file next to this script, and the printed line carries the aggregates,
    # the regression gate, and the slowest-25 map — compact separators,
    # sized to fit the tail cap.
    full = {
        "metric": "total_query_seconds",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_from_dir(sf_dir),
        "reps": reps,
        "rep_totals": [
            round(sum(ts[i] for ts in times.values()), 3) for i in range(reps)
        ],
        **baseline_info,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_FULL_last_run.json")
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        full_path = None
    slowest = dict(sorted(per_query.items(), key=lambda kv: -kv[1])[:25])
    compact = {
        **{k: v for k, v in full.items() if k != "queries"},
        "n_queries": len(per_query),
        "queries": {k: round(v, 1) for k, v in slowest.items()},
        "queries_file": full_path,
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
