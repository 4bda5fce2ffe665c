"""Plan census: for every registry query, count `Scan parquet` occurrences
per source table in the RETURNED plan (build-time actions run too — their
cost is the build, not the census). Flags queries scanning one table >= 3x.

Usage: python tools/scan_census.py [--sf 0.001] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from flink_210225_spark import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = "0.001"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    sf_dir = f"/root/testdata/sf{sf}"
    spark = get_spark(
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = args or list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR {name}: {ex!r}"[:200], flush=True)
            continue
        tables = re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
        counts: dict[str, int] = {}
        for t in tables:
            counts[t] = counts.get(t, 0) + 1
        n_scan = plan.count("Scan parquet")
        n_sub = plan.count("Subquery")
        flag = "FLAG" if any(v >= 3 for v in counts.values()) else "ok  "
        print(f"{flag} {name} scans={n_scan} sub={n_sub} {counts}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
