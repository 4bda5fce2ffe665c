import pytest

from flink_210225_spark.operators import joins, stateful

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(joins.QUERIES))
def test_joins_match_oracle(name, tables):
    assert_matches_oracle(joins.QUERIES[name](tables), joins.ORACLES[name], SF_DIR)


@pytest.mark.parametrize("name", sorted(stateful.QUERIES))
def test_stateful_match_oracle(name, tables):
    assert_matches_oracle(stateful.QUERIES[name](tables), stateful.ORACLES[name], SF_DIR)


def test_order_wide_broadcasts_dims(tables):
    plan = joins.order_wide(tables)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_jump_detection_semantics(spark):
    import datetime as dt

    rows = [
        # user 1: entry, next event 5s later (no jump), then 700s gap (jump), then last (jump)
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10),
        (2, dt.datetime(2024, 1, 1, 0, 0, 5), 10),
        (3, dt.datetime(2024, 1, 1, 0, 12, 0), 10),
        # user 2: single event -> jump (CEP timeout branch)
        (4, dt.datetime(2024, 1, 1, 0, 0, 0), 20),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        r.event_id
        for r in stateful.jump_detection({"events": ev}, timeout_sec=600).collect()
    }
    assert got == {2, 3, 4}
