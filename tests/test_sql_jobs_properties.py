"""Streaming SQL jobs (§3.2) and hypothesis property tests for the CEP
jump-detection semantics (SURVEY §7.4: encode matched+timeout union as a
property against a brute-force model)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_210225_spark.streaming import pipelines as sp
from flink_210225_spark.streaming import sql_jobs

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sql_jobs.QUERIES))
def test_sql_jobs_match_oracle(name, tables):
    assert_matches_oracle(
        sql_jobs.QUERIES[name](tables), sql_jobs.ORACLES[name], SF_DIR
    )


def test_keyword_sql_streaming_equals_batch(spark, tables):
    """§3.2 end-to-end: the SAME SQL text over a readStream view (complete
    mode) must produce the batch result."""
    stream = sp.stream_events(spark, SF_DIR)
    out = sql_jobs.keyword_stats_sql(spark, stream)
    q = (
        out.writeStream.format("memory")
        .queryName("kw_sql_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("kw_sql_stream").collect()))
    want = sorted(map(tuple, sql_jobs.QUERIES["sql_keyword_tumble"](tables).collect()))
    assert got == want


# --- CEP jump-detection property tests ---


def _model_jumps(ts_list: list[int], timeout: int) -> set[int]:
    """Brute-force reference semantics: event i is a jump iff the next event
    of the same user is > timeout seconds later, or absent (matched-pattern
    and timed-out branches of UserJumpDetailApp.java:85 both count)."""
    jumps = set()
    for i in range(len(ts_list)):
        if i + 1 == len(ts_list) or ts_list[i + 1] - ts_list[i] > timeout:
            jumps.add(i)
    return jumps


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=2000), min_size=1, max_size=25),
    timeout=st.integers(min_value=1, max_value=1200),
)
@settings(max_examples=25, deadline=None)
def test_jump_batch_matches_model(spark_global, gaps, timeout):
    from flink_210225_spark.operators.stateful import jump_detection

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    from datetime import datetime, timezone

    rows = [
        (i, 7, datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None), "page_view", 0.0)
        for i, t in enumerate(ts)
    ]
    df = spark_global.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {
        r["event_id"]
        for r in jump_detection({"events": df}, timeout_sec=timeout).collect()
    }
    want = _model_jumps(ts, timeout)
    assert got == want


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=2000), min_size=1, max_size=12),
    timeout=st.integers(min_value=1, max_value=1200),
)
@settings(max_examples=8, deadline=None)
def test_jump_stateful_func_matches_model(gaps, timeout):
    """The applyInPandasWithState kernel (in-batch path + final pending state)
    agrees with the model: gap-jumps emitted, last event left pending with a
    timer — which the model counts as a jump, so kernel ∪ {pending} = model."""
    from flink_210225_spark.streaming.pipelines import make_jump_func

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)

    class FakeState:
        hasTimedOut = False
        exists = False

        def __init__(self):
            self.value = None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v
            self.exists = True

        def setTimeoutTimestamp(self, ts_ms):
            self.timeout_ms = ts_ms

        def remove(self):
            self.value = None
            self.exists = False

    f = make_jump_func(timeout)
    state = FakeState()
    pdf = pd.DataFrame(
        {
            "event_id": range(len(ts)),
            "ts": pd.to_datetime(pd.Series(ts), unit="s"),
        }
    )
    emitted = list(f((7,), iter([pdf]), state))
    got = set()
    for out in emitted:
        got.update(out["event_id"].tolist())
    pending = {state.value[0]}
    want = _model_jumps(ts, timeout)
    assert got | pending >= want
    assert got <= want, "kernel emitted a non-jump"
    # pending is exactly the last event, whose jump-ness the timer decides
    assert pending == {len(ts) - 1}


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


# --- sessionization properties ---


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=4000), min_size=1, max_size=20),
)
@settings(max_examples=10, deadline=None)
def test_sessionize_matches_model(spark_global, gaps):
    """Gaps-and-islands session count and sizes match a brute-force model,
    and the native session_window agg agrees on session starts/sizes
    (gap timeout 1800 s)."""
    from flink_210225_spark.operators.sessions import session_window_agg, sessionize

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    from datetime import datetime, timezone

    rows = [
        (i, 3, datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None), "x", 1.0)
        for i, t in enumerate(ts)
    ]
    df = spark_global.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )

    # model: sessions split where gap > 1800
    sizes, cur = [], 1
    for g in gaps:
        if g > 1800:
            sizes.append(cur)
            cur = 1
        else:
            cur += 1
    sizes.append(cur)

    got = sessionize({"events": df}).collect()
    assert sorted(r["n_events"] for r in got) == sorted(sizes)

    native = session_window_agg(df).collect()
    assert sorted(r["n_events"] for r in native) == sorted(sizes)
    assert {r["session_start"] for r in native} == {r["session_start"] for r in got}


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=3 * 86400),  # ts offset
        ),
        min_size=1,
        max_size=30,
    ),
)
@settings(max_examples=10, deadline=None)
def test_uv_dedup_matches_model(spark_global, pairs):
    """First event per (user, day) — exactly one survivor per active
    (user, day), and it is the earliest (ties broken by event_id)."""
    from flink_210225_spark.operators.stateful import unique_visitor_dedup
    from datetime import datetime, timezone

    rows = [
        (i, u, datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None), "x", 0.0)
        for i, (u, t) in enumerate(pairs)
    ]
    df = spark_global.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = unique_visitor_dedup({"events": df}).collect()

    best: dict = {}
    for i, (u, t) in enumerate(pairs):
        day = t // 86400
        if (u, day) not in best or (t, i) < best[(u, day)]:
            best[(u, day)] = (t, i)
    want_ids = {i for (_t, i) in best.values()}
    assert {r["event_id"] for r in got} == want_ids
