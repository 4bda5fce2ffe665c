"""Full driver-contract verify: entry smoke + every queries() entry vs
oracle_sql() through DuckDB at sf0.01 (the /verify skill's script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
import duckdb

from flink_210225_spark import get_spark

spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
print("ENTRY rows:", e.entry(spark).count(), flush=True)
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
    )
from tests.oracle import canonical_rows  # noqa: E402

for name, fn in e.queries().items():
    sql = e.oracle_sql().get(name)
    got = fn(spark, "/root/testdata/sf0.01").toPandas()
    if sql is None:
        print("ROWS-ONLY", name, len(got), flush=True)
        continue
    want = con.sql(sql).df()
    ok = (
        sorted(got.columns) == sorted(want.columns)
        and len(got) == len(want)
        and canonical_rows(got) == canonical_rows(want)
    )
    print("MATCH " if ok else "MISMATCH", name, len(got), flush=True)
print("VERIFY_DONE", flush=True)
