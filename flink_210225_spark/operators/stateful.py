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


def match_pattern_kernel(
    rows: list[tuple[int, str, int]],
    steps: tuple[str, ...],
    within_us: int,
    init: tuple[int, int | None, int | None] = (0, None, None),
) -> tuple[list[tuple[int, int]], tuple[int, int | None, int | None]]:
    """Greedy earliest-start sequential pattern matcher over ONE user's
    time-ordered (event_id, event_type, ts_us) rows — the deterministic
    semantics both the batch and streaming paths run (Flink CEP
    ``begin.followedBy...within`` relaxed contiguity, non-overlapping
    matches): advance a stage pointer on each event matching the next step;
    a match whose span would exceed ``within_us`` resets and re-tries the
    current event at stage 0; completing the last stage emits
    (start_event_id, end_event_id) and resets. ``init`` is the in-flight
    partial match carried across micro-batches; returns (matches, final
    state). ONE shared kernel so batch, streaming and the hypothesis model
    can't drift apart."""
    out: list[tuple[int, int]] = []
    stage, start_id, start_ts = init
    for eid, etype, ts in rows:
        while True:
            if stage > 0 and ts - start_ts > within_us:
                stage, start_id, start_ts = 0, None, None
                continue
            if etype == steps[stage]:
                if stage == 0:
                    start_id, start_ts = eid, ts
                if stage == len(steps) - 1:
                    out.append((start_id, eid))
                    stage, start_id, start_ts = 0, None, None
                else:
                    stage += 1
            break
    return out, (stage, start_id, start_ts)


def pattern_matches(
    tables: dict[str, DataFrame],
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_sec: int = 86400,
) -> DataFrame:
    """Generalized CEP (T4's arbitrary-step form): per user, non-overlapping
    greedy occurrences of the ordered ``steps`` sequence completing within
    ``within_sec`` — the reference's 2-entry jump pattern
    (UserJumpDetailApp.java:57-63) generalized to any step list, relaxed
    contiguity. Batch spelling: sort each user's events once
    (``applyInPandas`` — sequential stage state is inherently per-key
    imperative), emit (user_id, start/end event ids, span). Streaming
    sibling: ``streaming/pipelines.pattern_stream`` carries (stage, start)
    across micro-batches with the same kernel."""
    import pandas as pd

    ev = tables["events"]

    def f(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        rows = list(
            zip(
                pdf["event_id"],
                pdf["event_type"],
                pdf["ts"].astype("int64") // 1000,  # ns -> us
            )
        )
        got, _final = match_pattern_kernel(rows, steps, within_sec * 1_000_000)
        uid = pdf["user_id"].iloc[0]
        return pd.DataFrame(
            {
                "user_id": [uid] * len(got),
                "start_event_id": [a for a, _ in got],
                "end_event_id": [b for _, b in got],
            }
        )

    return ev.select("user_id", "event_id", "event_type", "ts").groupBy(
        "user_id"
    ).applyInPandas(f, "user_id long, start_event_id long, end_event_id long")


QUERIES = {
    "state_new_visitor": new_visitor_correction,
    "state_uv_dedup": unique_visitor_dedup,
    "state_jump_detection": jump_detection,
    "state_pattern_matches": pattern_matches,
}

# DuckDB spelling of the greedy kernel for the registered defaults
# (steps=view/click/purchase, within=24h): a recursive CTE walks each
# user's (ts, event_id)-ordered events one seq at a time carrying
# (stage, start_id, start_tus) — the exact state machine of
# match_pattern_kernel, incl. the reset-then-reprocess on timeout.
_PATTERN_ORACLE = """
WITH RECURSIVE ev AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
),
walk AS (
    SELECT user_id, 0::BIGINT AS seq, 0 AS stage,
           NULL::BIGINT AS start_id, NULL::BIGINT AS start_tus,
           NULL::BIGINT AS emit_start, NULL::BIGINT AS emit_end
    FROM (SELECT DISTINCT user_id FROM ev)
    UNION ALL
    SELECT t.user_id, t.seq,
           CASE WHEN NOT t.hit THEN t.s0 WHEN t.s0 = 2 THEN 0 ELSE t.s0 + 1 END,
           CASE WHEN t.hit AND t.s0 = 0 THEN t.event_id
                WHEN t.hit AND t.s0 = 2 THEN NULL ELSE t.sid0 END,
           CASE WHEN t.hit AND t.s0 = 0 THEN t.tus
                WHEN t.hit AND t.s0 = 2 THEN NULL ELSE t.sts0 END,
           CASE WHEN t.hit AND t.s0 = 2 THEN t.sid0 END,
           CASE WHEN t.hit AND t.s0 = 2 THEN t.event_id END
    FROM (
        SELECT w.user_id, e.seq, e.event_id, e.tus,
               CASE WHEN w.stage > 0 AND e.tus - w.start_tus > 86400000000
                    THEN 0 ELSE w.stage END AS s0,
               CASE WHEN w.stage > 0 AND e.tus - w.start_tus > 86400000000
                    THEN NULL ELSE w.start_id END AS sid0,
               CASE WHEN w.stage > 0 AND e.tus - w.start_tus > 86400000000
                    THEN NULL ELSE w.start_tus END AS sts0,
               e.event_type = CASE (CASE WHEN w.stage > 0
                                          AND e.tus - w.start_tus > 86400000000
                                         THEN 0 ELSE w.stage END)
                              WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                              ELSE 'purchase' END AS hit
        FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.seq = w.seq + 1
    ) t
)
SELECT user_id, emit_start AS start_event_id, emit_end AS end_event_id
FROM walk WHERE emit_start IS NOT NULL
"""

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
    "state_pattern_matches": _PATTERN_ORACLE,
}
