"""Focused oracle sweep: verify named queries (or all) at one or more SFs.

Usage: python tools/sweep.py [--sf 0.001,0.01,0.1] [name ...]
No names = full registry sweep. Exits non-zero on any mismatch.
Reuses tests/oracle.py's view registration + canonicalization so the
fixture table list lives in exactly one place.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as e  # noqa: E402
from flink_210225_spark import get_spark  # noqa: E402
from tests.oracle import canonical_rows, duck_connect  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sfs = ["0.01"]
    if args and args[0] == "--sf":
        sfs = args[1].split(",")
        args = args[2:]
    names = args
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    sqls = e.oracle_sql()
    if not names:
        names = list(qs)
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duck_connect(sf_dir)
        for name in names:
            try:
                got = qs[name](spark, sf_dir).toPandas()
                sql = sqls.get(name)
                if sql is None:
                    print(f"ROWS-ONLY sf{sf} {name} {len(got)}", flush=True)
                    continue
                want = con.sql(sql).df()
                ok = (
                    sorted(got.columns) == sorted(want.columns)
                    and len(got) == len(want)
                    and canonical_rows(got) == canonical_rows(want)
                )
            except Exception as ex:  # noqa: BLE001
                print(f"ERROR    sf{sf} {name}: {ex!r}"[:400], flush=True)
                bad += 1
                continue
            print(
                f"{'MATCH   ' if ok else 'MISMATCH'} sf{sf} {name} {len(got)}",
                flush=True,
            )
            if not ok:
                bad += 1
                if sorted(got.columns) != sorted(want.columns):
                    print("  cols spark:", sorted(got.columns))
                    print("  cols oracle:", sorted(want.columns))
                elif len(got) != len(want):
                    print(f"  rows spark={len(got)} oracle={len(want)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
