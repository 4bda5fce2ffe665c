import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

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


def test_session_window_streaming_matches_batch(spark, tables):
    """Native session_window works on a stream (watermarked, append mode)
    and reproduces the batch result once the stream drains."""
    from pyspark.sql import functions as F

    stream = (
        sp.stream_events(spark, SF_DIR)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    got = sp.run_stream_to_memory(
        sessions.session_window_agg(stream), "sess_stream", output_mode="append"
    )
    want = sessions.session_window_agg(
        tables["events"].withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got_rows = set(map(tuple, got.collect()))
    want_rows = set(map(tuple, want.collect()))
    # Append mode only emits sessions closed before the final watermark
    # (max event time - 1h); the undecided tail stays in state. So the
    # streamed result is a subset, and everything withheld must sit within
    # the final watermark horizon.
    assert got_rows <= want_rows
    max_ts = tables["events"].agg(F.max("ts")).collect()[0][0]
    horizon = (max_ts - pd.Timedelta(hours=2)).strftime("%Y-%m-%d %H:%M:%S")
    missing = want_rows - got_rows
    assert all(row[1] >= horizon for row in missing), missing
    assert len(got_rows) >= 0.9 * len(want_rows)


def test_stream_interval_join_matches_batch(spark, tables):
    orders_s = _file_stream(spark, SF_DIR, "orders")
    details_s = _file_stream(spark, SF_DIR, "lineitem")
    got = sp.run_stream_to_memory(
        sjoins.order_detail_wide_stream(orders_s, details_s).drop("o_custkey"), "swide"
    )
    from flink_210225_spark.operators.joins import interval_join_order_detail

    want = interval_join_order_detail(tables).select(
        "o_orderkey", "l_linenumber", "order_date", "ship_date"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_orderwide_dim_enrichment_matches_batch(spark, tables):
    """OrderWideApp end-to-end as a stream: interval join + broadcast dim
    enrichment (stream-static), equal to the same composition in batch."""
    orders_s = _file_stream(spark, SF_DIR, "orders")
    details_s = _file_stream(spark, SF_DIR, "lineitem")
    enriched = sjoins.enrich_with_dims(
        sjoins.order_detail_wide_stream(orders_s, details_s),
        tables["customer"],
        tables["nation"],
    )
    got = sp.run_stream_to_memory(enriched, "swide_enriched")

    o, li = tables["orders"], tables["lineitem"]
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.date_add(o.o_orderdate, 5))
    )
    want = (
        li.join(o, cond)
        .join(tables["customer"], o.o_custkey == F.col("c_custkey"), "left")
        .join(tables["nation"], F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .select(
            "o_orderkey",
            "l_linenumber",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            F.col("c_name").alias("user_name"),
            F.col("n_name").alias("province_name"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_funnel_ordering_semantics(spark):
    """Stage k needs its event AT-OR-AFTER stage k-1's time: a user with
    view-before-signup reaches stage 1 only if ANOTHER view follows."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: full ordered funnel
        (1, 1, t(1), "signup"), (2, 1, t(2), "view"), (3, 1, t(3), "purchase"),
        # user 2: view BEFORE signup, purchase after -> stops at stage 0
        (4, 2, t(1), "view"), (5, 2, t(2), "signup"), (6, 2, t(3), "purchase"),
        # user 3: signup then purchase, no view -> purchase can't count
        (7, 3, t(1), "signup"), (8, 3, t(2), "purchase"),
    ]
    ev = spark.createDataFrame(
        [(i, u, ts, et, 0.0) for i, u, ts, et in rows],
        "event_id long, user_id long, ts timestamp_ntz, event_type string, value double",
    )
    got = {r.step: r.users for r in
           sessions.funnel_conversion({"events": ev}).collect()}
    assert got == {"signup": 3, "view": 1, "purchase": 1}


def test_interval_outer_join_stream(spark, tables):
    """Left-outer streaming interval join: matched rows equal the inner
    streaming join; unmatched left rows surface NULL-padded after the
    watermark passes (availableNow's final batch flushes expired state)."""
    from flink_210225_spark.streaming import joins as sj
    from flink_210225_spark.streaming import pipelines as sp

    orders = _file_stream(spark, SF_DIR, "orders")
    details = _file_stream(spark, SF_DIR, "lineitem")
    outer = sj.interval_join_streams_outer(
        orders, details, "o_orderkey", "l_orderkey", "o_orderdate", "l_shipdate",
        0, 5 * 86400,
    ).select("o_orderkey", "l_linenumber")
    got = sp.run_stream_to_memory(outer, "outer_join_t").collect()
    matched = {(r.o_orderkey, r.l_linenumber) for r in got if r.l_linenumber is not None}
    nulls = {r.o_orderkey for r in got if r.l_linenumber is None}

    o = tables["orders"].withColumn("ts", F.col("o_orderdate").cast("timestamp"))
    li = tables["lineitem"].withColumn("lts", F.col("l_shipdate").cast("timestamp"))
    inner = (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["lts"] >= o["ts"])
            & (li["lts"] < o["ts"] + F.expr("INTERVAL 5 DAYS")),
        )
        .select("o_orderkey", "l_linenumber")
        .collect()
    )
    want_matched = {(r.o_orderkey, r.l_linenumber) for r in inner}
    want_null = {r.o_orderkey for r in tables["orders"].select("o_orderkey").collect()} - {
        k for k, _ in want_matched
    }
    assert matched == want_matched
    # outer rows: every unmatched order eventually null-padded, no matched
    # order ever null-padded
    assert nulls <= want_null
    assert nulls, "no outer rows flushed — watermark never expired state"


def test_attribution_matches_oracle(tables):
    assert_matches_oracle(
        sessions.QUERIES["session_attribution"](tables),
        sessions.ORACLES["session_attribution"],
        SF_DIR,
    )


def test_attribution_semantics(spark):
    """u1: view(1) → purchase(2) credits 1; later view(3) → purchase(4)
    credits 3 (LAST touch); u2 purchase with no prior view → NULL; same-ts
    tie credits the touch (at-or-before)."""
    import datetime as dt

    t0 = dt.datetime(2021, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=30), 1, "purchase", 1.0, "{}"),
        (3, t0 + dt.timedelta(seconds=60), 1, "view", 0.0, "{}"),
        (4, t0 + dt.timedelta(seconds=90), 1, "purchase", 1.0, "{}"),
        (5, t0, 2, "purchase", 1.0, "{}"),
        (6, t0, 3, "view", 0.0, "{}"),
        (7, t0, 3, "purchase", 1.0, "{}"),  # same ts, higher event_id
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.conversion_id: r for r in sessions.last_touch_attribution({"events": ev}).collect()}
    assert got[2].touch_event_id == 1 and got[2].lag_sec == 30
    assert got[4].touch_event_id == 3 and got[4].lag_sec == 30
    assert got[5].touch_event_id is None and got[5].lag_sec is None
    assert got[7].touch_event_id == 6 and got[7].lag_sec == 0


def test_funnel_windowed_span_constraint(spark):
    """windowFunnel semantics: the WHOLE chain must fit in the window, and
    the greedy latest-start DP must pick the later view when it rescues an
    otherwise-too-wide chain."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # user 1: v@0 c@5 p@9, window 10 -> depth 3
        (1, 1, t(0), "view"), (2, 1, t(5), "click"), (3, 1, t(9), "purchase"),
        # user 2: v@0 c@5 p@11 -> span 11 > 10, but no later view: depth 2
        (4, 2, t(0), "view"), (5, 2, t(5), "click"), (6, 2, t(11), "purchase"),
        # user 3: v@0 c@9 p@12 AND v@4 -> chain v@4,c@9,p@12 fits: depth 3
        (7, 3, t(0), "view"), (8, 3, t(4), "view"),
        (9, 3, t(9), "click"), (10, 3, t(12), "purchase"),
        # user 4: purchase before click -> depth 2 only
        (11, 4, t(0), "view"), (12, 4, t(1), "purchase"), (13, 4, t(2), "click"),
        # user 5: click only -> depth 0 (stage 1 is view)
        (14, 5, t(0), "click"),
    ]
    ev = spark.createDataFrame(
        [(i, u, ts, et, 0.0) for i, u, ts, et in rows],
        "event_id long, user_id long, ts timestamp_ntz, event_type string, value double",
    )
    got = {r.step: r.users for r in
           sessions.funnel_windowed({"events": ev}, window_sec=10).collect()}
    # depths: u1=3, u2=2, u3=3, u4=2, u5=0
    assert got == {"view": 4, "click": 4, "purchase": 2}


def test_funnel_windowed_matches_bruteforce_exists(tables):
    """Cross-check the DP against the O(n^3) EXISTS-chain definition on the
    small fixture — an independent algorithm for the same semantics."""
    from tests.oracle import duck_connect

    con = duck_connect("/root/testdata/sf0.001")
    brute = con.sql("""
        WITH e AS (SELECT user_id, event_id, event_type AS et, epoch_us(ts) AS us
                   FROM events WHERE event_type IN ('view','click','purchase')),
        d1 AS (SELECT DISTINCT user_id FROM e WHERE et = 'view'),
        d2 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b USING (user_id)
               WHERE a.et='view' AND b.et='click'
                 AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
                 AND b.us - a.us <= 21600000000),
        d3 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b USING (user_id)
                                          JOIN e c USING (user_id)
               WHERE a.et='view' AND b.et='click' AND c.et='purchase'
                 AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
                 AND (c.us > b.us OR (c.us = b.us AND c.event_id > b.event_id))
                 AND c.us - a.us <= 21600000000)
        SELECT (SELECT count(*) FROM d1), (SELECT count(*) FROM d2),
               (SELECT count(*) FROM d3)
    """).fetchone()
    con.close()
    got = {r.stage: r.users for r in sessions.funnel_windowed(tables).collect()}
    assert (got[0], got[1], got[2]) == brute


def test_markov_probs_sum_to_one(tables):
    """Per-prev-type probabilities must sum to ~1 and counts to the total."""
    rows = sessions.markov_transitions(tables).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-3, prev
        assert sum(r.pair_ct for r in rs) == rs[0].from_total
