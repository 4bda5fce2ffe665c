"""Session windows — the §2.6 extension beyond the reference's tumbling-only
surface (the reference has no session windows; Spark gives them natively via
``session_window``, and the DWM "visit" notion — UV dedup + jump detection —
is really sessionization in disguise, so this is the natural unification).

Batch oracle: classic gaps-and-islands — a session starts where the gap from
the previous event of the same user exceeds the timeout; the session id is a
running count of starts."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_210225_spark.functions.scalars import fmt_ymd_hms, round2, round6


def sessionize(tables: dict[str, DataFrame], gap_sec: int = 1800) -> DataFrame:
    """Per-user sessions with a 30-min inactivity gap: session start/end,
    event count, value sum. Built on gaps-and-islands (deterministic,
    oracle-checkable); ``session_window_agg`` below is the native Spark
    spelling of the same thing for streaming."""
    ev = tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "__new_session",
        F.when(
            F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
            > gap_sec * 1_000_000,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "__session_seq",
        F.sum("__new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return gapped.groupBy("user_id", "__session_seq").agg(
        fmt_ymd_hms(F.min("ts")).alias("session_start"),
        fmt_ymd_hms(F.max("ts")).alias("session_end"),
        F.count("*").alias("n_events"),
        round2(F.sum("value")).alias("value_sum"),
    ).select(
        "user_id",
        F.col("__session_seq").alias("session_seq"),
        "session_start",
        "session_end",
        "n_events",
        "value_sum",
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session_window form — usable batch AND streaming (with
    withWatermark upstream); semantics match ``sessionize`` on gap merging
    (window end extends gap past the last event, hence different bound
    columns)."""
    return (
        events.groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), round2(F.sum("value")).alias("value_sum"))
        .select(
            "user_id",
            fmt_ymd_hms(F.col("session_window.start")).alias("session_start"),
            F.col("n_events"),
            F.col("value_sum"),
        )
    )


FUNNEL_STEPS = ("signup", "view", "purchase")


def funnel_conversion(
    tables: dict[str, DataFrame], steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage k when an event of
    type ``steps[k]`` occurs at-or-after the time they reached stage k-1
    (min-time chain — deterministic, tie-tolerant via >=). Emits one row per
    stage with the surviving user count.

    Shape: the chained stage times are consecutive Window aggregates over
    the SAME (user_id) partitioning, so Catalyst plans ONE Exchange and
    reuses the sort; the final count is a global agg over one row per user.
    No joins, no self-reads of the events table."""
    from pyspark.sql import Window

    ev = tables["events"].filter(F.col("event_type").isin(*steps))
    w = Window.partitionBy("user_id")
    cur = ev
    prev_t = None
    t_cols = []
    for k, step in enumerate(steps):
        cond = F.col("event_type") == step
        if prev_t is not None:
            cond &= F.col("ts") >= F.col(prev_t)
        name = f"t{k}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col("ts"))).over(w))
        prev_t = name
        t_cols.append(name)
    per_user = cur.groupBy("user_id").agg(
        *[F.max(t).alias(t) for t in t_cols]
    )
    counts = per_user.agg(
        *[F.count(t).alias(f"users_{k}") for k, t in enumerate(t_cols)]
    )
    stack = ", ".join(
        f"{k}, '{step}', users_{k}" for k, step in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack}) AS (stage, step, users)"
    )


def funnel_windowed(
    tables: dict[str, DataFrame],
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_sec: int = 21600,
) -> DataFrame:
    """Time-constrained funnel (ClickHouse ``windowFunnel`` semantics): a
    user reaches depth k iff there exist events e1 < e2 < ... < ek of the
    step types, ordered by (ts, event_id), whose total span ek.ts - e1.ts
    fits inside ``window_sec``. Differs from ``funnel_conversion`` (the
    unbounded min-time chain): here the WHOLE chain must fit in the window,
    which is the form product funnels actually ask for ("purchased within
    six hours of first view"; 6 h keeps all three
    stages non-degenerate at every fixture SF).

    Algorithm: greedy latest-start DP. Scanning a user's events in time
    order, carry s_j = the LATEST chain-start among depth-(j+1) chains
    ending at-or-before the current position (maximizing the start
    minimizes the span, so it dominates every other chain — the standard
    exchange argument). An event of type steps[j] extends s_{j-1} iff
    ts - s_{j-1} <= window. Each s_j is a running ``max`` over a window
    frame ending 1 ROW BEFORE current (chains need strictly-earlier
    events), so the whole DP is k chained window aggregates over the SAME
    (user_id) sort — Catalyst plans ONE Exchange + one sort, no joins, no
    Python. Scales as a single keyed sort, the same posture as
    ``funnel_conversion``."""
    # events.ts loads as TIMESTAMP_NTZ (unix_micros wants TIMESTAMP) —
    # epoch micros via timestamp_diff from the NTZ epoch, matching the
    # oracle's epoch_us()
    us = F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), F.col("ts")
    )
    t_us = window_sec * 1_000_000
    ev = (
        tables["events"]
        .filter(F.col("event_type").isin(*steps))
        .select("user_id", "event_id", F.col("event_type").alias("et"), us.alias("us"))
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cur = ev
    prev_start = None
    reach_cols = []
    for j, step in enumerate(steps):
        if j == 0:
            start = F.when(F.col("et") == step, F.col("us"))
            reached = F.col("et") == step
        else:
            viable = (
                (F.col("et") == step)
                & F.col(prev_start).isNotNull()
                & (F.col("us") - F.col(prev_start) <= t_us)
            )
            start = F.when(viable, F.col(prev_start))
            reached = viable
        sname, rname = f"s{j}", f"r{j}"
        cur = cur.withColumn(sname, start).withColumn(rname, reached)
        # next stage sees the running max of this stage's chain starts,
        # over strictly-earlier rows only
        cur = cur.withColumn(sname, F.max(sname).over(w_prev))
        prev_start = sname
        reach_cols.append(rname)
    depth = F.greatest(
        *[
            F.when(F.col(r), F.lit(j + 1)).otherwise(F.lit(0))
            for j, r in enumerate(reach_cols)
        ]
    )
    per_user = cur.groupBy("user_id").agg(F.max(depth).alias("depth"))
    counts = per_user.agg(
        *[
            F.count(F.when(F.col("depth") >= j + 1, 1)).alias(f"users_{j}")
            for j in range(len(steps))
        ]
    )
    stack = ", ".join(f"{j}, '{s}', users_{j}" for j, s in enumerate(steps))
    return counts.selectExpr(f"stack({len(steps)}, {stack}) AS (stage, step, users)")


def time_to_convert(tables: dict[str, DataFrame]) -> DataFrame:
    """Signup→purchase latency distribution — the TIME axis the funnel
    family doesn't measure (``session_funnel`` counts who converts,
    ``session_funnel_windowed`` whether steps fit a window; this reports
    how LONG conversion takes, the activation metric growth teams chart).
    Per user: first signup, first purchase AT OR AFTER it; delay carried
    as exact integer microseconds (the NTZ-safe ``timestamp_diff`` both
    engines share), summarized as conversion rate (4dp) and interpolated
    p50/p90 in seconds (2dp — Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the (n−1)·p rule, the ship_latency
    precedent).

    Plan: two event-type-pruned user aggs + one user equi-join, then a
    1-row summary — the user-keyed shuffle carries two timestamps per
    user, nothing else, at any event volume."""
    ev = tables["events"]
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c"), F.first("s").alias("s"))
    )
    delays = pu.select(
        "user_id", F.timestamp_diff("MICROSECOND", F.col("s"), F.col("c")).alias("d_us")
    )
    n_signup = su.agg(F.count("*").cast("long")).scalar()
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / 100  # noqa: E731
    return delays.agg(
        F.count("*").cast("long").alias("n_converted"),
        r2(F.percentile("d_us", F.lit(0.5)) / 1000000).alias("p50_sec"),
        r2(F.percentile("d_us", F.lit(0.9)) / 1000000).alias("p90_sec"),
    ).select(
        n_signup.alias("n_signup"),
        "n_converted",
        r4(F.col("n_converted") / n_signup).alias("conv_rate"),
        "p50_sec",
        "p90_sec",
    )


def markov_transitions(tables: dict[str, DataFrame]) -> DataFrame:
    """First-order Markov model of user behavior: for every (prev_type →
    next_type) pair of consecutive events in a user's timeline, the
    transition count and conditional probability. The behavioral fingerprint
    dashboards build journey sankeys from — and drift in it is a cheap
    bot/anomaly detector.

    Plan: one lag() over the (user_id) sort (same single Exchange as the
    sessionizer), then a groupBy on the 5×5-bounded pair space; the row
    total rides a window over the GROUPED result (state-space-sized, not
    corpus-sized). prob = floor(ct·10⁶/total + 0.5)/10⁶ — integer-ratio
    division, bit-identical cross-engine."""
    ev = tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("pair_ct"))
    )
    total = F.sum("pair_ct").over(Window.partitionBy("prev_type"))
    return pairs.select(
        "prev_type",
        "next_type",
        "pair_ct",
        total.alias("from_total"),
        (F.floor(F.col("pair_ct") * 1000000.0 / total + 0.5) / 1000000).alias("prob"),
    )


def retention_cohorts(tables: dict[str, DataFrame]) -> DataFrame:
    """Cohort retention: for each first-seen day (cohort) and day-offset k,
    the distinct users active k days after their first event. First-seen day
    is a min-window over the same user_id partitioning the activity dedup
    uses. One explicit repartition(user_id) feeds BOTH the (user_id, day)
    dedup-aggregate and the first-day window without re-shuffling
    (HashPartitioning(user_id) satisfies the clustered distribution of any
    superset key), so raw events are deduped to user-days BEFORE the window
    sort — 2 shuffles total instead of 3, and the window sorts user-days,
    not raw events. Exact countDistinct here (oracle-gated); at extreme
    cardinality this is where the HLL sketch (window_uv_sketch) swaps in."""
    ev = (
        tables["events"]
        .select("user_id", F.to_date("ts").alias("day"))
        .repartition("user_id")
    )
    w = Window.partitionBy("user_id")
    act = ev.distinct().withColumn("first_day", F.min("day").over(w))
    return (
        act.groupBy(
            F.date_format("first_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff("day", "first_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("users"))
    )


def last_touch_attribution(
    tables: dict[str, DataFrame],
    touch_type: str = "view",
    convert_type: str = "purchase",
) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    user's most recent preceding touch event (ties at the same timestamp
    break toward the touch — "at-or-before" — then by event id; conversions
    with no prior touch attribute to NULL). The marketing-analytics sibling
    of the as-of join: here both sides live in ONE events table, so instead
    of a union-LOCF two-table as-of, a single running `last(ignorenulls)`
    window over the user's interleaved timeline does it — one shuffle keyed
    by user_id, no join at all.

    Latency credit (seconds from touch to conversion) uses exact timestamp
    arithmetic — deterministic across engines."""
    ev = tables["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_id = F.last(
        F.when(F.col("event_type") == touch_type, F.col("event_id")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(F.col("event_type") == touch_type, F.col("ts")), ignorenulls=True
    ).over(w)
    attributed = ev.select(
        "event_id", "user_id", "ts", "event_type", touch_id.alias("touch_event_id"),
        touch_ts.alias("touch_ts"),
    ).filter(F.col("event_type") == convert_type)
    lag_sec = F.floor(
        F.timestamp_diff("MICROSECOND", F.col("touch_ts"), F.col("ts")) / 1_000_000
    )
    return attributed.select(
        F.col("event_id").alias("conversion_id"),
        "user_id",
        "touch_event_id",
        lag_sec.alias("lag_sec"),
    )


def path_trigrams_topk(tables: dict[str, DataFrame], top: int = 20) -> DataFrame:
    """Top-k three-step navigation paths — the order-2 sequence member of
    the journey family (``session_markov`` is order-1: it can say
    view→click is common, but not whether view→click→purchase beats
    view→click→view; path mining needs the actual k-step sequences).
    Every run of three consecutive events in a user's timeline contributes
    one path; the top ``top`` paths by count are the sankey/funnel-design
    input.

    Plan: two lead() columns over the same (user_id) sort the sessionizer
    uses — ONE Exchange, one Window stage (both leads share the frame),
    then a groupBy on the ≤|types|³-bounded path space and a
    TakeOrderedAndProject for the cut (no global sort). share =
    floor(ct·10⁶/total + 0.5)/10⁶ — integer-ratio division, bit-identical
    cross-engine; ordering fully tie-broken on the three steps."""
    ev = tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("path_ct"))
    )
    total = tri.agg(F.sum("path_ct").alias("n")).scalar()
    rank_w = Window.orderBy(F.desc("path_ct"), "e1", "e2", "e3")
    return (
        tri.orderBy(F.desc("path_ct"), "e1", "e2", "e3")
        .limit(top)
        .select(
            "e1",
            "e2",
            "e3",
            "path_ct",
            (F.floor(F.col("path_ct") * 1000000.0 / total + 0.5) / 1000000).alias(
                "share"
            ),
            F.row_number().over(rank_w).alias("rank"),
        )
    )


def bounce_rate_daily(tables: dict[str, DataFrame]) -> DataFrame:
    """Daily bounce rate — the engagement-quality rollup over the
    sessionizer (a bounce = a session that ends after one event; the
    canonical landing-page health metric). Composes ``sessionize``
    directly, so the gaps-and-islands machinery sits under this hash too.
    Plan: the session table rolls up per start-day — one extra
    map-side-combined groupBy over session-sized (not event-sized) rows.
    bounce_rate = floor(nb·10⁴/ns + 0.5)/10⁴ — integer-ratio division,
    bit-identical cross-engine."""
    s = sessionize(tables)
    daily = s.groupBy(F.substring("session_start", 1, 10).alias("day")).agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
    )
    return daily.select(
        "day",
        "n_sessions",
        "n_bounces",
        (
            F.floor(F.col("n_bounces") * 10000.0 / F.col("n_sessions") + 0.5) / 10000
        ).alias("bounce_rate"),
    )


def stickiness_weekly(tables: dict[str, DataFrame]) -> DataFrame:
    """DAU/WAU stickiness per (event type, ISO week) — the product-analytics
    engagement ratio (how much of the weekly audience shows up on an average
    day). Numerator = Σ daily-distinct users over the week's ACTIVE days,
    denominator = active-day count × weekly-distinct users; both distinct
    counts exact, the ratio is one integer division pinned at 6dp.

    Plan: one (type, day) distinct agg feeding the weekly rollup, one
    (type, week) distinct agg off the fact scan, joined on the
    calendar-bounded (type, week) key — AQE broadcasts the smaller side.
    At 100 TB swap the exact distincts for hll_sketch_agg and union daily
    sketches into the weekly one (the ``window_uv_sketch_weekly`` path)."""
    ev = tables["events"]
    week = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
        "week_start"
    )
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    daily = ev.groupBy("event_type", week, day).agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly_dau = daily.groupBy("event_type", "week_start").agg(
        F.count("*").alias("n_days"), F.sum("dau").alias("sum_dau")
    )
    wau = ev.groupBy("event_type", week).agg(
        F.countDistinct("user_id").alias("wau")
    )
    joined = weekly_dau.join(wau, ["event_type", "week_start"])
    ratio = F.col("sum_dau") / (F.col("n_days") * F.col("wau"))
    return joined.select(
        "event_type",
        "week_start",
        "n_days",
        "sum_dau",
        "wau",
        (F.floor(ratio * 1000000 + F.lit(0.5)) / 1000000).alias("stickiness"),
    )


def survival_km(tables: dict[str, DataFrame]) -> DataFrame:
    """Kaplan-Meier survival of user lifetime per event type — the
    censoring-aware churn curve (users still active near the corpus end
    are CENSORED, not churned; naive retention curves get exactly this
    wrong). Lifetime = whole days between a user's first and last event;
    a user whose last event is within 2 days of the corpus max is
    censored. Per lifetime day d: n_risk = users surviving ≥ d, n_events
    = churns at d, and S(d) folds Π(1 − dᵢ/nᵢ) with the product PINNED to
    6dp after every step — the ``window_ema``/Holt-Winters recurrence
    discipline, so the float product is bit-identical cross-engine.

    Independent-algorithm gate: Spark computes risk sets with windows and
    folds the product in an Arrow kernel per type (the day table is
    calendar-bounded — ~30 rows — the canonical applyInPandas shape);
    the oracle walks the literal KM recurrence one day at a time in a
    recursive CTE."""
    ev = tables["events"]
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.min("ts").alias("f"), F.max("ts").alias("l")
    )
    wall = Window.partitionBy()
    gmax = F.max("l").over(wall)
    diff = F.timestamp_diff("MICROSECOND", F.col("f"), F.col("l"))
    day_us = F.lit(86_400_000_000)
    dur = ((diff - diff % day_us) / day_us).cast("long")
    churned = (
        F.timestamp_diff("MICROSECOND", F.col("l"), gmax) >= 2 * day_us
    ).cast("int")
    du = per_user.select(
        "event_type", dur.alias("dur_days"), churned.alias("ev")
    )
    day = du.groupBy("event_type", "dur_days").agg(
        F.sum("ev").alias("n_events"),
        F.sum(1 - F.col("ev")).alias("n_censored"),
        F.count("*").alias("cnt"),
    )
    wt = Window.partitionBy("event_type")
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("dur_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = day.select(
        "event_type",
        "dur_days",
        "n_events",
        "n_censored",
        (
            F.sum("cnt").over(wt)
            - F.coalesce(F.sum("cnt").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )

    import math

    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dur_days").reset_index(drop=True)
        s = 1.0
        surv = []
        for d_i, n_i in zip(pdf["n_events"], pdf["n_risk"]):
            s = math.floor(s * (1 - int(d_i) / int(n_i)) * 1000000 + 0.5) / 1000000
            surv.append(s)
        pdf["survival"] = surv
        return pdf[
            ["event_type", "dur_days", "n_risk", "n_events", "n_censored", "survival"]
        ]

    return risk.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, dur_days long, n_risk long, n_events long,"
        " n_censored long, survival double",
    )


def bot_detection(tables: dict[str, DataFrame]) -> DataFrame:
    """Heuristic bot/automation detection from inter-arrival timing — the
    log-hygiene pass traffic pipelines run before any engagement metric
    (a scripted client fires fast AND regularly; humans are slow and
    bursty). Per user: event count, active span, events-per-minute, and
    the squared coefficient of variation of inter-arrival gaps — cv² ≈ 0
    is metronome-regular (bot), cv² ≈ 1 is Poisson (human). The flag
    requires n ≥ 20 and cv² < 0.1; on this organic fixture that flags
    nobody — like the zone-map report, the negative result IS the
    measurement (and the hash gate pins every per-user statistic).

    Numerics: gaps are exact microsecond integers; the variance numerator
    n·Σd² − (Σd)² rides decimal(38,0) (µs² overflows int64 fast); cv² =
    that over (Σd)²·n_d-normalized — two exact casts, one division, 6dp.

    Plan: one lag window keyed by user, one user-grain agg."""
    ev = tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    base = ev.select(
        "user_id", "ts", d.alias("d")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = base.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.timestamp_diff(
            "MICROSECOND", F.min("ts"), F.max("ts")
        ).alias("span_us"),
        F.count("d").alias("n_d"),
        F.coalesce(F.sum(dec(F.col("d"))), F.lit(0).cast("decimal(38,0)")).alias(
            "sd"
        ),
        F.coalesce(
            F.sum(dec(F.col("d")) * dec(F.col("d"))),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("sdd"),
    )
    r6 = round6
    epm = F.when(
        F.col("span_us") > 0,
        r6(F.col("n_events") * F.lit(60_000_000) / F.col("span_us")),
    ).otherwise(F.lit(0.0))
    cv2 = F.when(
        F.col("sd") > 0,
        r6(
            (
                dec(F.col("n_d")) * F.col("sdd") - F.col("sd") * F.col("sd")
            ).cast("double")
            / (F.col("sd") * F.col("sd")).cast("double")
        ),
        # all-zero gaps (≥2 events, every one at the same timestamp) is the
        # LIMITING metronome case — cv² = 0, not NULL, or the most regular
        # automation possible would dodge the flag
    ).when(F.col("n_d") > 0, F.lit(0.0))
    out = agg.select(
        "user_id",
        "n_events",
        "span_us",
        epm.alias("events_per_min"),
        cv2.alias("cv2"),
    )
    return out.withColumn(
        "is_bot",
        (F.col("n_events") >= 20)
        & F.col("cv2").isNotNull()
        & (F.col("cv2") < 0.1),
    )


def new_vs_returning(tables: dict[str, DataFrame]) -> DataFrame:
    """Daily new-vs-returning visitor split — the acquisition/retention
    decomposition on every traffic dashboard (and the batch twin of the
    reference's keyed new-visitor correction, SURVEY §2.5 T1: there the
    stream fixes the is_new flag with state; here the whole history
    decides it exactly). A user's first active day is NEW; every later
    active day is RETURNING. Exact distinct semantics ride the (user, day)
    grain; the share is one integer-ratio division.

    Plan: one (user, day) distinct agg, one user-grain min, one
    broadcast-friendly join back, one day rollup."""
    ev = tables["events"]
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
        "day"
    )
    ud = ev.select("user_id", day).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    flagged = ud.join(first, "user_id").select(
        "day", (F.col("day") == F.col("first_day")).alias("is_new")
    )
    agg = flagged.groupBy("day").agg(
        F.sum(F.col("is_new").cast("long")).alias("n_new"),
        F.sum((~F.col("is_new")).cast("long")).alias("n_returning"),
    )
    pct = F.col("n_new") / (F.col("n_new") + F.col("n_returning"))
    return agg.select(
        "day",
        "n_new",
        "n_returning",
        (F.floor(pct * 1000000 + F.lit(0.5)) / 1000000).alias("pct_new"),
    )


QUERIES = {
    "session_new_vs_returning": new_vs_returning,
    "session_bot_detection": bot_detection,
    "session_survival_km": survival_km,
    "session_stickiness": stickiness_weekly,
    "session_gaps_islands": sessionize,
    "session_path_topk": path_trigrams_topk,
    "session_bounce_rate": bounce_rate_daily,
    "session_window_native": lambda tables: session_window_agg(tables["events"]),
    "session_funnel": funnel_conversion,
    "session_funnel_windowed": funnel_windowed,
    "session_retention": retention_cohorts,
    "session_attribution": last_touch_attribution,
    "session_markov": markov_transitions,
    "session_time_to_convert": time_to_convert,
}

ORACLES = {
    # Same (user, day) grain, first-day rule, one integer-ratio division.
    "session_new_vs_returning": """
        WITH ud AS (
            SELECT DISTINCT user_id,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
            FROM events
        ),
        fi AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1)
        SELECT ud.day,
               sum(CASE WHEN ud.day = fi.first_day THEN 1 ELSE 0 END)::BIGINT
                   AS n_new,
               sum(CASE WHEN ud.day != fi.first_day THEN 1 ELSE 0 END)::BIGINT
                   AS n_returning,
               floor(sum(CASE WHEN ud.day = fi.first_day THEN 1 ELSE 0 END)
                     / (count(*)::DOUBLE) * 1000000 + 0.5) / 1000000
                   AS pct_new
        FROM ud JOIN fi ON ud.user_id = fi.user_id
        GROUP BY 1
    """,
    # Same µs gaps, HUGEINT variance numerator, one double division.
    "session_bot_detection": """
        WITH b AS (
            SELECT user_id, ts,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS d
            FROM events
        ),
        a AS (
            SELECT user_id, count(*)::BIGINT AS n_events,
                   (max(epoch_us(ts)) - min(epoch_us(ts)))::BIGINT AS span_us,
                   count(d)::BIGINT AS n_d,
                   coalesce(sum(d::HUGEINT), 0) AS sd,
                   coalesce(sum(d::HUGEINT * d::HUGEINT), 0) AS sdd
            FROM b GROUP BY 1
        ),
        s AS (
            SELECT user_id, n_events, span_us,
                   CASE WHEN span_us > 0
                        THEN floor(n_events * 60000000 / (span_us::DOUBLE)
                                   * 1000000 + 0.5) / 1000000
                        ELSE 0.0 END AS events_per_min,
                   CASE WHEN sd > 0
                        THEN floor((n_d::HUGEINT * sdd - sd * sd)::DOUBLE
                                   / ((sd * sd))::DOUBLE * 1000000 + 0.5)
                             / 1000000
                        WHEN n_d > 0 THEN 0.0
                        END AS cv2
            FROM a
        )
        SELECT user_id, n_events, span_us, events_per_min, cv2,
               (n_events >= 20 AND cv2 IS NOT NULL AND cv2 < 0.1) AS is_bot
        FROM s
    """,
    # Literal KM recurrence walked one lifetime-day at a time, product
    # pinned to 6dp each step (matches the Arrow fold bit-for-bit).
    "session_survival_km": """
        WITH RECURSIVE pu AS (
            SELECT event_type, user_id, min(ts) AS f, max(ts) AS l
            FROM events GROUP BY 1, 2
        ),
        du AS (
            SELECT event_type,
                   (epoch_us(l) - epoch_us(f)) // 86400000000 AS dur_days,
                   CASE WHEN (SELECT max(epoch_us(ts)) FROM events)
                             - epoch_us(l) >= 2 * 86400000000
                        THEN 1 ELSE 0 END AS ev
            FROM pu
        ),
        day AS (
            SELECT event_type, dur_days, sum(ev)::BIGINT AS n_events,
                   sum(1 - ev)::BIGINT AS n_censored, count(*)::BIGINT AS cnt
            FROM du GROUP BY 1, 2
        ),
        rk AS (
            SELECT event_type, dur_days, n_events, n_censored,
                   (sum(cnt) OVER (PARTITION BY event_type)
                    - coalesce(sum(cnt) OVER (
                          PARTITION BY event_type ORDER BY dur_days
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0))::BIGINT AS n_risk,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY dur_days) AS rn
            FROM day
        ),
        walk AS (
            SELECT event_type, dur_days, n_events, n_censored, n_risk, rn,
                   floor(1.0 * (1 - n_events / (n_risk::DOUBLE))
                         * 1000000 + 0.5) / 1000000 AS survival
            FROM rk WHERE rn = 1
            UNION ALL
            SELECT r.event_type, r.dur_days, r.n_events, r.n_censored,
                   r.n_risk, r.rn,
                   floor(w.survival * (1 - r.n_events / (r.n_risk::DOUBLE))
                         * 1000000 + 0.5) / 1000000
            FROM walk w JOIN rk r ON r.event_type = w.event_type
                                 AND r.rn = w.rn + 1
        )
        SELECT event_type, dur_days, n_risk, n_events, n_censored, survival
        FROM walk
    """,
    # Exact distinct counts on both engines; date_trunc('week') is
    # Monday-start on both; one integer-ratio division, 6dp pin.
    "session_stickiness": """
        WITH daily AS (
            SELECT event_type,
                   strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(DISTINCT user_id)::BIGINT AS dau
            FROM events GROUP BY 1, 2, 3
        ),
        wd AS (
            SELECT event_type, week_start, count(*)::BIGINT AS n_days,
                   sum(dau)::BIGINT AS sum_dau
            FROM daily GROUP BY 1, 2
        ),
        wk AS (
            SELECT event_type,
                   strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
                   count(DISTINCT user_id)::BIGINT AS wau
            FROM events GROUP BY 1, 2
        )
        SELECT wd.event_type, wd.week_start, n_days, sum_dau, wau,
               floor(sum_dau / ((n_days * wau)::DOUBLE) * 1000000 + 0.5)
                   / 1000000 AS stickiness
        FROM wd JOIN wk ON wd.event_type = wk.event_type
                       AND wd.week_start = wk.week_start
    """,
    # Same first-signup/first-purchase-after rule; microsecond-exact delay,
    # quantile_cont == Spark percentile interpolation, 2dp/4dp rounding.
    "session_time_to_convert": """
        WITH su AS (
            SELECT user_id, min(ts) AS s FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ),
        pu AS (
            SELECT e.user_id, min(e.ts) AS c, min(su.s) AS s
            FROM events e JOIN su ON su.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= su.s
            GROUP BY e.user_id
        ),
        d AS (
            SELECT user_id, date_diff('microsecond', s, c) AS d_us FROM pu
        )
        SELECT (SELECT count(*) FROM su)::BIGINT AS n_signup,
               count(*)::BIGINT AS n_converted,
               floor(count(*) / (SELECT count(*) FROM su) * 10000 + 0.5)
                   / 10000 AS conv_rate,
               floor(quantile_cont(d_us, 0.5) / 1000000 * 100 + 0.5) / 100
                   AS p50_sec,
               floor(quantile_cont(d_us, 0.9) / 1000000 * 100 + 0.5) / 100
                   AS p90_sec
        FROM d
    """,
    "session_bounce_rate": """
        WITH gapped AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        seq AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING)
                          AS session_seq
            FROM gapped
        ),
        sess AS (
            SELECT user_id, session_seq,
                   strftime(min(ts), '%Y-%m-%d') AS day,
                   count(*) AS n_events
            FROM seq GROUP BY user_id, session_seq
        )
        SELECT day,
               count(*)::BIGINT AS n_sessions,
               sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
               floor(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000.0
                     / count(*) + 0.5) / 10000 AS bounce_rate
        FROM sess GROUP BY day
    """,
    "session_path_topk": """
        WITH t AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        g AS (
            SELECT e1, e2, e3, count(*)::BIGINT AS path_ct
            FROM t WHERE e3 IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        tot AS (SELECT sum(path_ct)::BIGINT AS n FROM g)
        SELECT e1, e2, e3, path_ct,
               floor(path_ct * 1000000.0 / (SELECT n FROM tot) + 0.5)
                   / 1000000 AS share,
               row_number() OVER (ORDER BY path_ct DESC, e1, e2, e3) AS rank
        FROM g
        ORDER BY path_ct DESC, e1, e2, e3
        LIMIT 20
    """,
    "session_markov": """
        WITH p AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type,
                   event_type AS next_type
            FROM events
        ),
        g AS (
            SELECT prev_type, next_type, count(*)::BIGINT AS pair_ct
            FROM p WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, pair_ct,
               sum(pair_ct) OVER (PARTITION BY prev_type)::BIGINT AS from_total,
               floor(pair_ct * 1000000.0
                     / sum(pair_ct) OVER (PARTITION BY prev_type) + 0.5)
                   / 1000000 AS prob
        FROM g
    """,
    "session_funnel_windowed": """
        WITH e AS (
            SELECT user_id, event_id, event_type AS et, epoch_us(ts) AS us
            FROM events WHERE event_type IN ('view', 'click', 'purchase')
        ),
        a AS (
            SELECT *, max(CASE WHEN et = 'view' THEN us END) OVER wprev AS s0
            FROM e
            WINDOW wprev AS (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        b AS (
            SELECT *,
                   CASE WHEN et = 'click' AND s0 IS NOT NULL
                             AND us - s0 <= 21600000000 THEN s0 END AS s1row,
                   (et = 'click' AND s0 IS NOT NULL
                        AND us - s0 <= 21600000000) AS r1
            FROM a
        ),
        c AS (
            SELECT *, max(s1row) OVER wprev AS s1
            FROM b
            WINDOW wprev AS (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        pu AS (
            SELECT user_id,
                   max(CASE WHEN et = 'purchase' AND s1 IS NOT NULL
                                 AND us - s1 <= 21600000000 THEN 3
                            WHEN r1 THEN 2
                            WHEN et = 'view' THEN 1 ELSE 0 END) AS depth
            FROM c GROUP BY user_id
        )
        SELECT 0 AS stage, 'view' AS step,
               count(*) FILTER (WHERE depth >= 1)::BIGINT AS users FROM pu
        UNION ALL
        SELECT 1, 'click', count(*) FILTER (WHERE depth >= 2)::BIGINT FROM pu
        UNION ALL
        SELECT 2, 'purchase', count(*) FILTER (WHERE depth >= 3)::BIGINT FROM pu
    """,
    "session_attribution": """
        WITH w AS (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'view' THEN event_id END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS touch_event_id,
                   last_value(CASE WHEN event_type = 'view' THEN ts END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS touch_ts
            FROM events
        )
        SELECT event_id AS conversion_id, user_id, touch_event_id,
               floor((epoch_us(ts) - epoch_us(touch_ts)) / 1000000.0) AS lag_sec
        FROM w WHERE event_type = 'purchase'
    """,
    "session_retention": """
        WITH act AS (
            SELECT DISTINCT user_id, ts::DATE AS day FROM events
        ),
        firsts AS (
            SELECT user_id, min(day) AS first_day FROM act GROUP BY user_id
        )
        SELECT strftime(f.first_day, '%Y-%m-%d') AS cohort,
               date_diff('day', f.first_day, a.day)::INT AS day_offset,
               count(DISTINCT a.user_id) AS users
        FROM act a JOIN firsts f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "session_funnel": """
        WITH t0 AS (
            SELECT user_id, min(ts) FILTER (event_type = 'signup') AS t0
            FROM events GROUP BY user_id
        ),
        t1 AS (
            SELECT e.user_id, min(e.ts) AS t1
            FROM events e JOIN t0 ON e.user_id = t0.user_id
            WHERE e.event_type = 'view' AND e.ts >= t0.t0
            GROUP BY e.user_id
        ),
        t2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= t1.t1
            GROUP BY e.user_id
        )
        SELECT 0 AS stage, 'signup' AS step,
               (SELECT count(*) FROM t0 WHERE t0 IS NOT NULL)::BIGINT AS users
        UNION ALL
        SELECT 1, 'view', (SELECT count(*) FROM t1)::BIGINT
        UNION ALL
        SELECT 2, 'purchase', (SELECT count(*) FROM t2)::BIGINT
    """,
    "session_gaps_islands": """
        WITH gapped AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        seq AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM gapped
        )
        SELECT user_id, session_seq::BIGINT AS session_seq,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events,
               floor((sum(value)) * 100 + 0.5) / 100 AS value_sum
        FROM seq
        GROUP BY user_id, session_seq
    """,
    # the native session_window's start bounds coincide with gaps-and-islands
    # session starts, so it shares the same oracle minus the end column
    "session_window_native": """
        WITH gapped AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        seq AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM gapped
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               count(*) AS n_events,
               floor((sum(value)) * 100 + 0.5) / 100 AS value_sum
        FROM seq
        GROUP BY user_id, session_seq
    """,
}


def growth_accounting(tables: dict[str, DataFrame]) -> DataFrame:
    """Daily growth accounting — the new / retained / resurrected /
    churned decomposition (the Social-Capital "growth accounting"
    identity) that ``session_new_vs_returning`` only begins: RETAINED
    users were also active the previous calendar day, RESURRECTED were
    seen before but not yesterday, CHURNED (attributed to today) were
    active yesterday and absent today. The identity
    active_today = new + retained + resurrected is emitted per day and
    any violation is a kernel bug — the oracle recomputes every class
    independently so a drifting lag/first-day rule breaks the hash.

    Plan: one (user, day) distinct agg, ONE user-keyed window computing
    first_day and prev_active_day (lag over the user's own day series),
    one day rollup; churn re-keys the same frame by next-day attribution
    — all shuffles on (user) or (day), never a day×user grid."""
    ev = tables["events"]
    ud = ev.select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    flagged = ud.select(
        "user_id",
        "day",
        F.min("day").over(Window.partitionBy("user_id")).alias("first_day"),
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    one_day = lambda d: F.date_format(F.date_add(F.to_date(d), 1), "yyyy-MM-dd")  # noqa: E731
    classes = flagged.select(
        "day",
        F.when(F.col("day") == F.col("first_day"), 1).otherwise(0).alias("is_new"),
        F.when(
            F.col("prev_day").isNotNull()
            & (F.col("prev_day") == F.date_format(
                F.date_sub(F.to_date("day"), 1), "yyyy-MM-dd"
            )),
            1,
        ).otherwise(0).alias("is_retained"),
    ).withColumn(
        "is_resurrected",
        F.when((F.col("is_new") == 0) & (F.col("is_retained") == 0), 1).otherwise(0),
    )
    active = classes.groupBy("day").agg(
        F.count("*").cast("long").alias("active"),
        F.sum("is_new").cast("long").alias("new_users"),
        F.sum("is_retained").cast("long").alias("retained"),
        F.sum("is_resurrected").cast("long").alias("resurrected"),
    )
    churn = (
        flagged.where(
            F.col("next_day").isNull()
            | (F.col("next_day") != one_day(F.col("day")))
        )
        .select(one_day(F.col("day")).alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("churned"))
    )
    return (
        active.join(churn, "day", "left")
        .select(
            "day",
            "active",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).cast("long").alias("churned"),
        )
    )


QUERIES["session_growth_accounting"] = growth_accounting
# Churn attributes to the day AFTER the last consecutive active day; days
# with zero activity but nonzero churn are absent on BOTH engines (the
# join is from the active-day spine), keeping the frames congruent.
ORACLES["session_growth_accounting"] = """
    WITH ud AS (
        SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
    ),
    flagged AS (
        SELECT user_id, day,
               min(day) OVER (PARTITION BY user_id) AS first_day,
               lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
               lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
        FROM ud
    ),
    classes AS (
        SELECT day,
               CASE WHEN day = first_day THEN 1 ELSE 0 END AS is_new,
               CASE WHEN prev_day IS NOT NULL AND prev_day =
                         strftime(day::DATE - INTERVAL 1 DAY, '%Y-%m-%d')
                    THEN 1 ELSE 0 END AS is_retained
        FROM flagged
    ),
    active AS (
        SELECT day, count(*)::BIGINT AS active,
               sum(is_new)::BIGINT AS new_users,
               sum(is_retained)::BIGINT AS retained,
               sum(CASE WHEN is_new = 0 AND is_retained = 0 THEN 1
                        ELSE 0 END)::BIGINT AS resurrected
        FROM classes GROUP BY 1
    ),
    churn AS (
        SELECT strftime(day::DATE + INTERVAL 1 DAY, '%Y-%m-%d') AS day,
               count(*)::BIGINT AS churned
        FROM flagged
        WHERE next_day IS NULL
           OR next_day != strftime(day::DATE + INTERVAL 1 DAY, '%Y-%m-%d')
        GROUP BY 1
    )
    SELECT a.day, a.active, a.new_users, a.retained, a.resurrected,
           coalesce(c.churned, 0)::BIGINT AS churned
    FROM active a LEFT JOIN churn c ON c.day = a.day
"""


def peak_concurrency(tables: dict[str, DataFrame]) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line interval problem
    (capacity planning's first question: how many users are on AT ONCE,
    not per day). Sessions come from the same 30-min gaps-and-islands rule
    as ``sessionize``; each contributes a +1 tick at its start and a −1
    tick just after its end (inclusive intervals: at an exact start==end
    collision the +1 sorts first, so touching sessions DO overlap). The
    global running sum over (ts, −delta)-ordered ticks is the concurrency
    curve; a day's peak is the max of the curve over its ticks — including
    the level carried INTO each tick (max of cum and cum−delta), so a day
    that only loses sessions still reports the inherited level.

    Scale: one user-keyed window builds sessions, one GLOBAL ordered
    running sum builds the curve — the one genuinely serial axis of the
    problem (the curve is a prefix sum; at 100 TB you'd segment it per
    day-partition with carry-in aggregation, the same two-pass trick as
    any distributed prefix sum). Tick volume is 2·|sessions|, tiny next
    to events."""
    ev = tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.select("user_id", "ts", "event_id").withColumn(
        "new_session",
        F.when(
            F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
            > 1800 * 1_000_000,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = gapped.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    ticks = sessions.select(
        F.col("s").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionByName(
        sessions.select(
            F.col("e").alias("t"), F.lit(-1).cast("long").alias("delta")
        )
    )
    wcum = Window.orderBy("t", F.col("delta").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = ticks.withColumn("cum", F.sum("delta").over(wcum))
    return curve.groupBy(
        F.date_format("t", "yyyy-MM-dd").alias("day")
    ).agg(
        F.greatest(
            F.max("cum"), F.max(F.col("cum") - F.col("delta"))
        ).cast("long").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_sessions_started"),
    )


QUERIES["session_peak_concurrency"] = peak_concurrency
# Same session rule, same tick ordering (+1 before -1 at equal ts), same
# carried-level max.
ORACLES["session_peak_concurrency"] = """
    WITH gapped AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seq AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                      AS session_seq
        FROM gapped
    ),
    sessions AS (
        SELECT user_id, session_seq, min(ts) AS s, max(ts) AS e
        FROM seq GROUP BY 1, 2
    ),
    ticks AS (
        SELECT s AS t, 1::BIGINT AS delta FROM sessions
        UNION ALL
        SELECT e AS t, -1::BIGINT AS delta FROM sessions
    ),
    curve AS (
        SELECT t, delta,
               sum(delta) OVER (ORDER BY t, delta DESC
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM ticks
    )
    SELECT strftime(t, '%Y-%m-%d') AS day,
           greatest(max(cum), max(cum - delta))::BIGINT AS peak_concurrency,
           sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_sessions_started
    FROM curve GROUP BY 1
"""


def return_gaps(tables: dict[str, DataFrame]) -> DataFrame:
    """Return-time distribution — the gap BETWEEN a user's consecutive
    sessions (``sessionize``'s complement: gaps-and-islands finds the
    session boundaries; retention planning needs what happens ACROSS
    them). Per returning user, gap = this session's start − previous
    session's END, in exact minutes; emits one distribution row: user /
    gap volumes and the exact p25/p50/p75/p90 return times (rank order
    statistics over the pooled gaps — the "when do users come back"
    curve behind re-engagement scheduling; ``session_retention`` tracks
    day-grain cohorts, this the intra-month fine grain).

    Exactness: session bounds are exact microsecond min/max; gap minutes
    are integer floor division; percentiles are EXACT order statistics
    (rank = ceil(q·n), the lower-of-the-two discrete convention) — no
    interpolation, no float.

    Scale: the sessionize rollup (user-keyed shuffle), one user-ordered
    window for the lag, one global rank over the gap pool (two-phase
    range-partitioned at 100 TB, same posture as the quantile kernels).

    Session bounds are recomputed here on RAW microsecond timestamps —
    ``sessionize``'s formatted second-grain strings would shift a gap
    across a minute boundary when sub-second parts straddle one."""
    ev = tables["events"]
    we = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        F.sum(
            F.when(
                F.timestamp_diff("MICROSECOND", F.lag("ts").over(we), F.col("ts"))
                > 1800 * 1_000_000,
                1,
            ).otherwise(0)
        )
        .over(we.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    sess = seq.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    w = Window.partitionBy("user_id").orderBy("session_seq")
    gaps = sess.select(
        "user_id",
        F.floor(
            F.timestamp_diff(
                "MICROSECOND", F.lag("s_end").over(w), F.col("s_start")
            )
            / 60_000_000
        )
        .cast("long")
        .alias("gap_min"),
    ).where(F.col("gap_min").isNotNull())
    # localCheckpoint + literal n (r11, the theil_sen/medallion lesson):
    # the n scalar fed FIVE uses (n_gaps + the four percentile targets) and
    # ReuseSubquery dedups none of them — every use replayed the whole
    # sessionize pipeline (plan scanned events 18x). gaps is session-count
    # rows × 2 narrow columns, far smaller than events.
    gaps = gaps.localCheckpoint()
    n = int(gaps.agg(F.count("*")).collect()[0][0])
    wr = Window.orderBy("gap_min")
    ranked = gaps.select("user_id", "gap_min", F.row_number().over(wr).alias("rk"))

    def pct(q_num: int, q_den: int):
        # exact discrete percentile: value at rank ceil(q·n), the ceil now
        # exact Python int arithmetic instead of a double-divide Column
        target = (n * q_num + q_den - 1) // q_den
        return F.max(
            F.when(F.col("rk") == F.lit(target), F.col("gap_min"))
        )

    return ranked.agg(
        F.lit(n).cast("long").alias("n_gaps"),
        F.countDistinct("user_id").cast("long").alias("n_returning_users"),
        F.min("gap_min").cast("long").alias("min_gap_min"),
        F.max("gap_min").cast("long").alias("max_gap_min"),
        pct(1, 4).cast("long").alias("p25_min"),
        pct(1, 2).cast("long").alias("p50_min"),
        pct(3, 4).cast("long").alias("p75_min"),
        pct(9, 10).cast("long").alias("p90_min"),
    )


QUERIES["session_return_gaps"] = return_gaps
# Same 30-min sessionization, same exact ceil-rank order statistics.
ORACLES["session_return_gaps"] = """
    WITH gapped AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))
                        > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    seq AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts,
                   event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM gapped
    ),
    sess AS (
        SELECT user_id, session_seq, min(ts) AS s_start, max(ts) AS s_end
        FROM seq GROUP BY 1, 2
    ),
    gaps AS (
        SELECT user_id,
               (epoch_us(s_start)
                - epoch_us(lag(s_end) OVER (PARTITION BY user_id
                                            ORDER BY session_seq)))
               // 60000000 AS gap_min
        FROM sess
    ),
    nn AS (SELECT gap_min, user_id FROM gaps WHERE gap_min IS NOT NULL),
    ranked AS (
        SELECT user_id, gap_min,
               row_number() OVER (ORDER BY gap_min) AS rk,
               count(*) OVER () AS n
        FROM nn
    )
    SELECT max(n)::BIGINT AS n_gaps,
           count(DISTINCT user_id)::BIGINT AS n_returning_users,
           min(gap_min)::BIGINT AS min_gap_min,
           max(gap_min)::BIGINT AS max_gap_min,
           max(CASE WHEN rk = (n + 3) // 4 THEN gap_min END)::BIGINT
               AS p25_min,
           max(CASE WHEN rk = (n + 1) // 2 THEN gap_min END)::BIGINT
               AS p50_min,
           max(CASE WHEN rk = (3 * n + 3) // 4 THEN gap_min END)::BIGINT
               AS p75_min,
           max(CASE WHEN rk = (9 * n + 9) // 10 THEN gap_min END)::BIGINT
               AS p90_min
    FROM ranked
"""


def shapley_attribution(tables: dict[str, DataFrame]) -> DataFrame:
    """EXACT Shapley-value channel attribution (Shapley 1953; the
    simplified data-driven marketing form of Zhao et al. 2018, public):
    each non-purchase event type is a "player", a user's coalition is the
    SET of channels they touched, the characteristic function v(T) is the
    empirical conversion rate (≥1 purchase) among users whose touched-set
    is exactly T (unobserved coalitions contribute v = 0), and channel
    i's credit is the exact 4-player Shapley sum
    φ_i = Σ_{T ⊆ C\\{i}} |T|!(3−|T|)!/4! · (v(T∪{i}) − v(T)).
    Completes the attribution family: ``session_attribution`` is
    last-touch (order-based, ignores synergy), ``session_markov`` is the
    transition fingerprint; Shapley is the order-free cooperative-game
    answer marketing platforms call data-driven attribution.

    Exactness: coalitions are BITMASKS (alphabetical channel order), the
    16-subset × 4-channel grid derives from ``range(64)`` arithmetic (no
    literal tables, no BNLJ), v is integer ppm (``div``), factorial
    weights ride a popcount CASE, and φ is carried as the exact integer
    Σ w·Δppm (×24 scale) with ONE pinned division at the end — the
    efficiency axiom Σφ = v(full)−v(∅) holds as an integer identity on
    both engines (pytest-gated). Output also carries per-channel reach
    and converted-reach counts.

    Scale: one user-keyed agg (corpus → |users| rows), one 16-row
    coalition census, a 64-row grid with two 16-row lookups, a 4-row
    result — past the first agg everything is state-space-sized. At
    100 TB the only corpus-wide work is the per-user bit/flag reduce."""
    ev = tables["events"]
    chans = ["click", "error", "signup", "view"]
    bit = {c: 1 << i for i, c in enumerate(chans)}
    per_user = ev.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("event_type") == c, 1).otherwise(0)).alias(f"b_{c}")
            for c in chans
        ],
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    bits = sum(F.col(f"b_{c}") * F.lit(bit[c]) for c in chans)
    users = per_user.select(bits.cast("int").alias("set_id"), "conv")
    # localCheckpoint: the 16-row coalition census feeds THREE consumers
    # (the grid's v1/v0 lookups and the per-channel reach below) — left
    # lazy, each replayed the corpus-wide per-user agg
    vsets = users.groupBy("set_id").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
    ).select(
        "set_id", "n_users", "n_conv",
        F.expr("n_conv * 1000000 div n_users").alias("v_ppm"),
    ).localCheckpoint()
    spark = ev.sparkSession
    # shiftrightunsigned/shiftleft take a LITERAL bit count in the Python
    # DSL; column-valued shifts go through the SQL expression form
    grid = (
        spark.range(64)
        .select(
            (F.col("id") % 16).cast("int").alias("t"),
            (F.col("id") / 16).cast("int").alias("i"),
        )
        .where(F.expr("(shiftrightunsigned(t, i) & 1) = 0"))
        .withColumn("t1_key", F.expr("t + shiftleft(1, i)"))
    )
    w_num = (
        F.when(F.bit_count("t") == 0, 6)
        .when(F.bit_count("t") == 3, 6)
        .otherwise(2)
    )
    with_v = (
        grid.join(
            vsets.select(F.col("set_id").alias("t1"), F.col("v_ppm").alias("v1")),
            grid.t1_key == F.col("t1"),
            "left",
        )
        .join(
            vsets.select(F.col("set_id").alias("t0"), F.col("v_ppm").alias("v0")),
            grid.t == F.col("t0"),
            "left",
        )
        .select(
            "i",
            (w_num * (F.coalesce("v1", F.lit(0)) - F.coalesce("v0", F.lit(0))))
            .cast("long")
            .alias("term"),
        )
    )
    phi = with_v.groupBy("i").agg(F.sum("term").cast("long").alias("phi_x24_ppm"))
    # per-channel reach folds from the CHECKPOINTED 16-row census (a
    # second corpus scan pre-fix): Σ n_users / n_conv over the coalitions
    # containing each channel bit
    reach = (
        vsets.select(
            "n_users",
            "n_conv",
            F.explode(
                F.expr(
                    "filter(sequence(0, 3),"
                    " i -> (shiftrightunsigned(set_id, i) & 1) = 1)"
                )
            ).alias("i"),
        )
        .groupBy("i")
        .agg(
            F.sum("n_users").cast("long").alias("n_touched"),
            F.sum("n_conv").cast("long").alias("n_conv_touched"),
        )
    )
    name = F.element_at(
        F.array(*[F.lit(c) for c in chans]), (F.col("i") + 1).cast("int")
    )
    return (
        phi.join(reach, "i", "left")
        .select(
            name.alias("channel"),
            F.coalesce("n_touched", F.lit(0)).cast("long").alias("n_touched"),
            F.coalesce("n_conv_touched", F.lit(0)).cast("long").alias(
                "n_conv_touched"
            ),
            "phi_x24_ppm",
            (F.floor(F.col("phi_x24_ppm") / 24.0 + F.lit(0.5)) / 1_000_000).alias(
                "phi"
            ),
        )
    )


QUERIES["session_shapley"] = shapley_attribution
ORACLES["session_shapley"] = """
    WITH per_user AS (
        SELECT user_id,
               max((event_type = 'click')::INT) AS b0,
               max((event_type = 'error')::INT) AS b1,
               max((event_type = 'signup')::INT) AS b2,
               max((event_type = 'view')::INT) AS b3,
               max((event_type = 'purchase')::INT) AS conv
        FROM events GROUP BY user_id
    ),
    users AS (
        SELECT (b0 + b1 * 2 + b2 * 4 + b3 * 8)::INT AS set_id, conv
        FROM per_user
    ),
    vsets AS (
        SELECT set_id, count(*)::BIGINT AS n_users, sum(conv)::BIGINT AS n_conv,
               (sum(conv)::BIGINT * 1000000) // count(*)::BIGINT AS v_ppm
        FROM users GROUP BY set_id
    ),
    grid AS (
        SELECT t::INT AS t, i::INT AS i
        FROM (SELECT unnest(range(16)) AS t), (SELECT unnest(range(4)) AS i)
        WHERE ((t >> i) & 1) = 0
    ),
    terms AS (
        SELECT g.i,
               (CASE WHEN bit_count(g.t) IN (0, 3) THEN 6 ELSE 2 END)::BIGINT
               * (coalesce(v1.v_ppm, 0) - coalesce(v0.v_ppm, 0)) AS term
        FROM grid g
        LEFT JOIN vsets v1 ON v1.set_id = g.t + (1 << g.i)
        LEFT JOIN vsets v0 ON v0.set_id = g.t
    ),
    phi AS (
        SELECT i, sum(term)::BIGINT AS phi_x24_ppm FROM terms GROUP BY i
    ),
    reach AS (
        SELECT i, count(*)::BIGINT AS n_touched,
               sum(conv)::BIGINT AS n_conv_touched
        FROM users, (SELECT unnest(range(4)) AS i)
        WHERE ((set_id >> i) & 1) = 1
        GROUP BY i
    )
    SELECT ['click', 'error', 'signup', 'view'][p.i + 1] AS channel,
           coalesce(r.n_touched, 0)::BIGINT AS n_touched,
           coalesce(r.n_conv_touched, 0)::BIGINT AS n_conv_touched,
           p.phi_x24_ppm,
           floor(p.phi_x24_ppm / 24.0 + 0.5) / 1000000 AS phi
    FROM phi p LEFT JOIN reach r USING (i)
"""
