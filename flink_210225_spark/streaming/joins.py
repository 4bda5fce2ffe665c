"""Stream-stream interval joins (SURVEY §2.4 J1/J2 as true streaming ops).

The reference's OrderWideApp joins two live Kafka streams with an event-time
interval (order_info.id == order_detail.order_id, detail.ts ∈ info.ts ± 5s,
OrderWideApp.java:59-66). Structured Streaming expresses exactly this:
watermarks on both sides bound the join state, the equi-key drives the
shuffle, and the range condition both filters matches and lets Spark evict
state (state retention ≈ watermark + interval width). PaymentWideApp's
asymmetric [0, 15 min] window (PaymentWideApp.java:75-83) is the same shape
with different bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """right.ts ∈ [left.ts + lower_sec, left.ts + upper_sec) on matching keys;
    both sides watermarked so join state is bounded and evictable."""
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
        left_ts, watermark
    )
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
        right_ts, watermark
    )
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower_sec} SECONDS"))
        & (r[right_ts] < l[left_ts] + F.expr(f"INTERVAL {upper_sec} SECONDS"))
    )
    return l.join(r, cond)


def order_detail_wide_stream(
    orders: DataFrame, details: DataFrame, window_days: int = 5
) -> DataFrame:
    """J1 streaming: orders ⋈ lineitem within [0, +window_days) — the
    OrderWide join re-expressed over the fixture streams."""
    sec = window_days * 86400
    joined = interval_join_streams(
        orders, details, "o_orderkey", "l_orderkey", "o_orderdate", "l_shipdate", 0, sec
    )
    return joined.select(
        "o_orderkey",
        F.col("o_custkey"),
        "l_linenumber",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


def enrich_with_dims(fact_stream: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """J3 streaming form: stream-static broadcast joins against dim
    snapshots — the full OrderWideApp composition (interval join feeding six
    async dim lookups, OrderWideApp.java:59-171) as
    interval-join → broadcast-enrich. Static sides re-resolve per micro-batch,
    giving the dim-freshness the reference buys with cache invalidation."""
    return (
        fact_stream.join(
            F.broadcast(customer), fact_stream["o_custkey"] == customer["c_custkey"], "left"
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left")
        .select(
            "o_orderkey",
            "l_linenumber",
            "order_date",
            "ship_date",
            F.col("c_name").alias("user_name"),
            F.col("n_name").alias("province_name"),
        )
    )


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: same key + time-bound shape as
    ``interval_join_streams``, but left rows with no match inside their
    interval are emitted NULL-padded once the watermark passes the
    interval's end (Spark holds the left row in state exactly that long —
    the outer result is as late as the watermark, never wrong). This is the
    reference's J4 outer-join surface (TestFlinkSQLJoin.java:34-44) combined
    with J1's interval bounds, a shape Flink SQL couldn't express without
    idle-state-retention hacks."""
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
        left_ts, watermark
    )
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
        right_ts, watermark
    )
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower_sec} SECONDS"))
        & (r[right_ts] < l[left_ts] + F.expr(f"INTERVAL {upper_sec} SECONDS"))
    )
    return l.join(r, cond, "left_outer")
