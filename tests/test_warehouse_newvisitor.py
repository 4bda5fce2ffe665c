"""Partitioned serving store (pruning must reach the scan) and the T1
new-visitor streaming kernel vs its batch oracle."""

from pyspark.sql import functions as F

from flink_210225_spark.operators import warehouse
from flink_210225_spark.operators.windows import visitor_stats_window
from flink_210225_spark.plans import explain
from flink_210225_spark.streaming import pipelines as sp

from .conftest import SF_DIR


def test_stats_store_partition_pruning(spark, tables, tmp_path):
    stats = visitor_stats_window(tables)
    path = str(tmp_path / "visitor_stats")
    warehouse.write_stats(stats, path)

    days = [r["dt"] for r in warehouse.read_stats(spark, path).select("dt").distinct().collect()]
    assert len(days) > 1, "fixture must span multiple days for a pruning test"
    day = str(days[0])

    q = warehouse.stats_for_day(spark, path, day)
    plan = explain.formatted_plan(q)
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters")[1][:200], (
        "dt filter did not reach the scan as a partition filter"
    )
    assert q.count() > 0


def test_write_stats_append_idempotent_layout(spark, tables, tmp_path):
    stats = visitor_stats_window(tables)
    path = str(tmp_path / "visitor_stats")
    warehouse.write_stats(stats, path)
    warehouse.write_stats(stats, path)  # second micro-batch append
    assert warehouse.read_stats(spark, path).count() == 2 * stats.count()


def test_new_visitor_stream_matches_batch(spark, tables):
    from flink_210225_spark.operators.stateful import new_visitor_correction

    stream = sp.stream_events(spark, SF_DIR)
    got = sp.run_stream_to_memory(sp.new_visitor_stream(stream), "nv_stream")
    want = new_visitor_correction(tables).select(
        "event_id", "user_id", F.col("is_new").cast("string").alias("is_new")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dq_profile_matches_oracle(tables):
    from flink_210225_spark.operators import warehouse

    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        warehouse.QUERIES["warehouse_dq_profile"](tables),
        warehouse.ORACLES["warehouse_dq_profile"],
        SF_DIR,
    )


def test_dq_profile_semantics(spark):
    from flink_210225_spark.operators.warehouse import dq_profile

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")], "a long, b string"
    )
    got = {r.col_name: r for r in dq_profile(df).collect()}
    assert got["a"].n_rows == 4 and got["a"].n_null == 1 and got["a"].n_distinct == 3
    assert got["b"].n_null == 1 and got["b"].n_distinct == 2
    assert got["a"].null_frac == 0.25


def test_snapshot_diff_matches_oracle(tables):
    from flink_210225_spark.operators import warehouse

    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        warehouse.QUERIES["warehouse_snapshot_diff"](tables),
        warehouse.ORACLES["warehouse_snapshot_diff"],
        SF_DIR,
    )


def test_snapshot_diff_semantics(spark):
    from flink_210225_spark.operators.warehouse import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_delete_cascade_matches_oracle(tables):
    from flink_210225_spark.operators import warehouse

    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        warehouse.QUERIES["warehouse_delete_cascade"](tables),
        warehouse.ORACLES["warehouse_delete_cascade"],
        SF_DIR,
    )


def test_delete_cascade_consistency(tables):
    from flink_210225_spark.operators import warehouse

    rows = {r.table_name: r for r in warehouse.delete_cascade(tables).collect()}
    for t in ("customer", "orders", "lineitem"):
        assert rows[t].rows_deleted + rows[t].rows_kept == rows[t].rows_total
    assert rows["customer"].rows_deleted >= 1
    # cascade can only delete orders of deleted customers
    assert rows["orders"].rows_deleted <= rows["orders"].rows_total
