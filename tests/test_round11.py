"""Round-11 optimization gates.

Scale-conditional ``_spread`` (VERDICT r10 #2): the round-robin
repartition that parallelizes single-split fixture scans must NOT fire
when the source already arrives in many file splits — on a cluster the
unconditional version was a full corpus network pass (guide §2.3/§2.4).
"""

import pytest


def _n_files(spark, tmpdir, n):
    path = str(tmpdir.join(f"many_{n}"))
    spark.range(10_000).repartition(n).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_few_input_splits_single_fixture_file(tables):
    from flink_210225_spark.io import few_input_splits

    # premise: every fixture table is one parquet file -> one split
    assert few_input_splits(tables["documents"]) is True


def test_few_input_splits_many_files(spark, tmpdir):
    from flink_210225_spark.io import few_input_splits

    par = spark.sparkContext.defaultParallelism
    many = _n_files(spark, tmpdir, max(par, 2))
    assert few_input_splits(many) is False


@pytest.mark.parametrize(
    "module",
    ["similarity", "text", "multimodal"],
)
def test_spread_skips_many_split_source(spark, tmpdir, module):
    """A many-file source must pass through _spread without a repartition:
    the plan keeps the scan's own partitioning (no added Exchange)."""
    import importlib

    mod = importlib.import_module(f"flink_210225_spark.ops.{module}")
    par = spark.sparkContext.defaultParallelism
    many = _n_files(spark, tmpdir, max(par, 2))
    spread = mod._spread(many)
    assert spread is many  # identity: no Exchange added
    assert "Exchange" not in spread._jdf.queryExecution().executedPlan().toString()


def test_spread_still_fires_on_single_split(tables):
    """Fixture scans (one file) must keep the local-mode parallelism fix."""
    from flink_210225_spark.ops.text import _spread

    docs = tables["documents"]
    spread = _spread(docs.select("doc_id"))
    assert (
        spread.rdd.getNumPartitions()
        == docs.sparkSession.sparkContext.defaultParallelism
    )


def test_doc_shingles_skips_spread_on_many_files(spark, tmpdir):
    from flink_210225_spark.ops.dedup import doc_shingles

    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.range(10_000)
        .selectExpr("id as doc_id", "concat('tok a b c d ', id) as text")
        .repartition(max(par, 2))
    )
    path = str(tmpdir.join("docs_many"))
    docs.write.mode("overwrite").parquet(path)
    many = spark.read.parquet(path)
    sh = doc_shingles(many)
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
