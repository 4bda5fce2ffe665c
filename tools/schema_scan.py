"""Scan every registered query's OUTPUT schema for complex-typed columns.

The driver's correctness gate canonicalizes result frames with a pandas
sort over all columns; list/struct/map cells are unhashable there and err
the entry before comparison (the text_inverted_index round-4 red row).
This tool flags, for the whole registry:
  - Spark side: any ArrayType / MapType / StructType field in the query's
    schema (lazy build — streaming capstones do execute);
  - oracle side: any list/ndarray/dict cell in the DuckDB result at
    sf0.001.
Exit non-zero if anything is flagged.

Usage: python tools/schema_scan.py [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as e  # noqa: E402
from flink_210225_spark import get_spark  # noqa: E402
from tests.oracle import duck_connect  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    names = sys.argv[1:]
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    sqls = e.oracle_sql()
    if not names:
        names = list(qs)
    con = duck_connect(SF_DIR)
    flagged = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            complex_cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                print(f"SPARK-COMPLEX {name}: {complex_cols}", flush=True)
                flagged += 1
            sql = sqls.get(name)
            if sql is not None:
                want = con.sql(sql).df()
                # Check the first NON-NULL cell per column (iloc[0] alone
                # misses a column whose head row is NULL but holds list
                # cells further down).
                bad = []
                for c in want.columns:
                    nn = want[c].dropna()
                    if len(nn) and isinstance(
                        nn.iloc[0], (list, tuple, dict, np.ndarray)
                    ):
                        bad.append(c)
                if bad:
                    print(f"ORACLE-COMPLEX {name}: {bad}", flush=True)
                    flagged += 1
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex!r}"[:300], flush=True)
            flagged += 1
    print(f"flagged: {flagged} / {len(names)}", flush=True)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
