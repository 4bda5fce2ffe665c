"""Keyed-state operators, batch semantics (SURVEY §2.5 T1/T2/T4).

The reference implements these with Flink keyed ValueState / CEP; the
batch-equivalent semantics are analytic window functions over (key, time) —
one shuffle on the key, sort within partition, no Python. The streaming
variants (dropDuplicates + watermark, transformWithState) live in
``streaming/``; these batch forms double as their correctness oracles,
exactly as SURVEY §5 prescribes.

- T1 new-visitor correction (BaseLogApp.java:72-101): keyed ValueState marks
  a device's first-ever event; later events claiming is_new='1' are rewritten
  to '0'. Batch: first row per user by (ts, event_id) keeps is_new=1.
- T2 daily UV dedup (UniqueVisitApp.java:49-88): keep the first event per
  (mid, calendar day); ValueState holds last-seen date with 24h TTL. Batch:
  row_number over (user_id, day) = 1.
- T4 CEP jump detection (UserJumpDetailApp.java:46-86): an entry event is a
  "jump" iff the next event of the same mid is >10s later, absent
  (CEP timeout), or itself another entry. Batch: lead(ts) over (mid order by
  ts); NULL or gap>timeout ⇒ jump. The matched+timed-out union at
  UserJumpDetailApp.java:85 is exactly the OR of those two predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _by_user_time() -> Window:
    """Deterministic per-user event ordering: ts then event_id tie-break.
    (Built lazily — WindowSpec construction needs an active session.)"""
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def new_visitor_correction(tables: dict[str, DataFrame]) -> DataFrame:
    """Emit every event with corrected is_new: 1 only on the user's first-ever
    event (T1)."""
    ev = tables["events"]
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.row_number().over(_by_user_time()) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_new"),
    )


def unique_visitor_dedup(tables: dict[str, DataFrame]) -> DataFrame:
    """First event per (user_id, calendar day) — the daily UV stream (T2)."""
    ev = tables["events"]
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("dt"),
        )
    )


def jump_detection(tables: dict[str, DataFrame], timeout_sec: int = 600) -> DataFrame:
    """Events whose successor (same user) is absent or >timeout later (T4).
    Covers both CEP branches: matched pattern (quick re-entry is NOT a jump
    for the middle event — its gap is small) and the timeout side output."""
    ev = tables["events"]
    nxt = F.lead("ts").over(_by_user_time())
    return (
        ev.withColumn("__next_ts", nxt)
        .filter(
            F.col("__next_ts").isNull()
            # microsecond diff (not SECOND) so fractional-second gaps round
            # the same way as the oracle's epoch() subtraction
            | (
                F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("__next_ts"))
                > timeout_sec * 1_000_000
            )
        )
        .select("event_id", "user_id")
    )


QUERIES = {
    "state_new_visitor": new_visitor_correction,
    "state_uv_dedup": unique_visitor_dedup,
    "state_jump_detection": jump_detection,
}

ORACLES = {
    "state_new_visitor": """
        SELECT event_id, user_id,
               CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    """,
    "state_uv_dedup": """
        SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS dt
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) = 1
    """,
    "state_jump_detection": """
        SELECT event_id, user_id
        FROM (
            SELECT event_id, user_id, ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
            FROM events
        )
        WHERE next_ts IS NULL OR epoch(next_ts) - epoch(ts) > 600
    """,
}
