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


def test_asof_join_semantics(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, 1, t(10), 1.0, "view"),
        (2, 1, t(20), 2.0, "view"),      # latest view <= purchase@25
        (3, 1, t(25), 9.0, "purchase"),
        (4, 1, t(30), 3.0, "view"),      # after the purchase: ignored
        (5, 2, t(40), 4.0, "view"),
        (6, 2, t(40), 5.0, "purchase"),  # equal ts: view counts (inclusive)
        (7, 3, t(50), 6.0, "purchase"),  # no prior view: NULL
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double, event_type string"
    )
    got = {r.event_id: r for r in joins.asof_join_events({"events": ev}).collect()}
    assert got[3].view_value == 2.0 and got[3].view_ts == t(20)
    assert got[6].view_value == 4.0 and got[6].view_ts == t(40)
    assert got[7].view_value is None and got[7].view_ts is None


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
