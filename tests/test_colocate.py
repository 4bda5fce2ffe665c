"""Bucketed co-located joins must be exchange-free; salted joins must match
their unsalted equivalents row-for-row."""

import pytest

from pyspark.sql import functions as F

from flink_210225_spark.operators import colocate
from flink_210225_spark.plans import explain


@pytest.fixture(scope="module")
def bucketed_tables(spark, tables, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    colocate.write_bucketed(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        "b_orders",
        "o_orderkey",
        num_buckets=8,
        path=f"{wh}/b_orders",
    )
    colocate.write_bucketed(
        tables["lineitem"].select("l_orderkey", "l_quantity"),
        "b_lineitem",
        "l_orderkey",
        num_buckets=8,
        path=f"{wh}/b_lineitem",
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocate.bucketed_join(
            spark, lt, rt, F.col("o_orderkey") == F.col("l_orderkey")
        )
        a = explain.audit(joined)
        assert a["shuffles"] == 0, f"bucketed join still shuffles: {a}"
        # formatted plans name each op in the tree AND the details section
        assert a["sort_merge_joins"] >= 1
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert explain.audit(agg)["shuffles"] == 0, "groupBy on bucket key should reuse layout"


def test_salted_join_matches_plain(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_quantity")
    part = tables["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    plain = li.join(part, "l_partkey").groupBy("p_brand").agg(
        F.sum("l_quantity").alias("q"), F.count("*").alias("n")
    )
    salted = colocate.salted_join(li, part, "l_partkey", n_salts=8).groupBy(
        "p_brand"
    ).agg(F.sum("l_quantity").alias("q"), F.count("*").alias("n"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, payload string"
    )
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k long, dim string")
    got = colocate.salted_join(big, small, "k", n_salts=4, how="left").collect()
    assert len(got) == 4
    assert {(r["k"], r["payload"], r["dim"]) for r in got} == {
        (1, "a", "x"), (1, "b", "x"), (2, "c", "y"), (3, "d", None),
    }


def test_salted_join_rejects_right_joins(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        colocate.salted_join(df, df, "k", how="full")


def test_key_skew_profile(spark):
    rows = [(1,)] * 90 + [(2,)] * 5 + [(3,)] * 5
    df = spark.createDataFrame(rows, "k long")
    prof = colocate.key_skew_profile(df, "k", top=1).collect()
    assert prof[0]["k"] == 1 and prof[0]["ct"] == 90
    assert prof[0]["skew_ratio"] > 2


def test_zorder_value_locality(spark):
    """Morton-key sanity: interleaving is exact on known bit patterns, and
    z-distance tracks 2-D locality (the four quadrant corners sort into
    quadrant order)."""
    df = spark.createDataFrame([(0, 0), (0, 1), (1, 0), (1, 1)], "a int, b int")
    z = colocate.zorder_value(F.col("a"), F.col("b"), (0, 1), (0, 1), bits=1)
    got = {(r.a, r.b): r.z for r in df.withColumn("z", z).collect()}
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """Per-file min/max must be tight on BOTH z-ordered columns, while a
    single-column sort leaves the second column's per-file range at full
    width — the property parquet footer pruning feeds on."""
    import glob

    n = 1 << 12
    df = spark.range(n).select(
        (F.col("id") % 64).cast("int").alias("x"),
        F.floor(F.col("id") / 64).cast("int").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    colocate.write_zordered(df, zpath, "x", "y", (0, 63), (0, 63), n_files=16)
    spath = str(tmp_path / "sorted")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def avg_width(path, col):
        widths = []
        for f in glob.glob(path + "/part-*.parquet"):
            r = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).collect()[0]
            widths.append(r.hi - r.lo)
        return sum(widths) / len(widths)

    # z-order: both dims clustered (each file ≈ a quadrant-ish rectangle)
    assert avg_width(zpath, "x") < 63 * 0.6
    assert avg_width(zpath, "y") < 63 * 0.6
    # linear sort: x tight but y spans nearly the full range per file
    assert avg_width(spath, "x") < 63 * 0.6
    assert avg_width(spath, "y") > 63 * 0.8


def test_salted_join_spreads_hot_key_partitions(spark):
    """VERDICT r2 #7 — exercise the SKEW BENEFIT, not just row parity: on a
    90 %-hot-key fixture with broadcast and AQE off (forcing a shuffle
    join), the plain join lands every hot-key row in ONE output partition;
    the salted join spreads them across many (the (key, salt) shuffle
    key), which is exactly the max-task-size win salting exists for."""
    from pyspark.sql import functions as F

    from flink_210225_spark.operators import colocate

    big = spark.range(60_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod("id", F.lit(50)))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        hot_parts_plain = (
            big.join(small, "k")
            .filter(F.col("k") == 0)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        salted = colocate.salted_join(big, small, "k", n_salts=16)
        hot_parts_salted = (
            salted.filter(F.col("k") == 0)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert hot_parts_plain == 1, "plain join should funnel the hot key"
        assert hot_parts_salted >= 8, (
            f"salting spread the hot key over only {hot_parts_salted} partitions"
        )
        # parity on the same fixture (hot-key multiplicities included)
        plain_counts = {
            (r.k, r.ct): None
            for r in big.join(small, "k").groupBy("k").agg(F.count("*").alias("ct")).collect()
        }
        salted_counts = {
            (r.k, r.ct): None
            for r in salted.groupBy("k").agg(F.count("*").alias("ct")).collect()
        }
        assert plain_counts == salted_counts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_aqe_skew_split_triggers_on_hot_key(spark):
    """The AQE half of the skew posture: with skew-join thresholds scaled
    to fixture size, the UNsalted shuffle join over the hot-key fixture
    must be rewritten by AQE with skew=true — proof the runtime path we
    rely on for moderate skew actually engages on this shape."""
    from pyspark.sql import functions as F

    big = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod("id", F.lit(50)))
        .alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        joined = big.join(small, "k")
        # materialize THIS DataFrame's QueryExecution (a .count() would
        # execute a different one and leave this plan isFinalPlan=false)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
