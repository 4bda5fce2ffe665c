import os

import pytest

from flink_210225_spark.operators import sessions
from flink_210225_spark.streaming import joins as sjoins
from flink_210225_spark.streaming import pipelines as sp

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sessions.QUERIES))
def test_sessions_match_oracle(name, tables):
    assert_matches_oracle(sessions.QUERIES[name](tables), sessions.ORACLES[name], SF_DIR)


def _file_stream(spark, sf_dir, table):
    import tempfile

    src = os.path.join(sf_dir, f"{table}.parquet")
    link_dir = tempfile.mkdtemp(prefix=f"stream_{table}_")
    os.symlink(src, os.path.join(link_dir, f"{table}.parquet"))
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(link_dir)


def test_stream_interval_join_matches_batch(spark, tables):
    orders_s = _file_stream(spark, SF_DIR, "orders")
    details_s = _file_stream(spark, SF_DIR, "lineitem")
    got = sp.run_stream_to_memory(
        sjoins.order_detail_wide_stream(orders_s, details_s), "swide"
    )
    from flink_210225_spark.operators.joins import interval_join_order_detail

    want = interval_join_order_detail(tables).select(
        "o_orderkey", "l_linenumber", "order_date", "ship_date"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
