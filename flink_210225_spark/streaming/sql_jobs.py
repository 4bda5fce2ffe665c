"""Streaming SQL jobs — the reference's Flink-SQL entry path (SURVEY §3.2).

ProvinceStatsSqlApp/KeywordStatsApp register a Kafka-backed dynamic table
with a watermark DDL, run a TUMBLE group-by in SQL, and bridge back to a
DataStream (ProvinceStatsSqlApp.java:26-74). The Spark spelling: register the
stream as a temp view, run ``spark.sql`` with ``window()`` — the SAME SQL
text works on batch and streaming inputs, which is how these jobs are
checked (batch run hash-matched against DuckDB; streaming run compared to
the batch result in tests).

Streaming nuance: ``COUNT(DISTINCT ...)`` is not a supported streaming
aggregate, so the SQL uses ``size(collect_set(...))`` — identical semantics
(the reference's HashSet-state distinct, A2/A3, is literally collect_set),
legal in both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROVINCE_TUMBLE_SQL = """
SELECT
  date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
  date_format(window.end,   'yyyy-MM-dd HH:mm:ss') AS edt,
  event_type,
  size(collect_set(user_id)) AS uv_ct,
  count(*) AS pv_ct,
  floor(sum(value) * 100 + 0.5) / 100 AS value_sum
FROM {view}
GROUP BY window(ts, '1 hour'), event_type
"""

KEYWORD_TUMBLE_SQL = """
SELECT
  date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
  event_type AS keyword,
  count(*) AS ct,
  'SEARCH' AS source
FROM {view}
GROUP BY window(ts, '1 day'), event_type
"""


def register_and_run(
    spark: SparkSession, df: DataFrame, view: str, sql_template: str
) -> DataFrame:
    """§3.2 steps 2-3: register the (batch or streaming) DataFrame as a
    dynamic-table view, run the tumble SQL over it. For streaming inputs add
    ``withWatermark`` upstream and write with outputMode('complete'/'append')
    — tumble aggs are append-safe exactly as the reference's toAppendStream
    bridge."""
    df.createOrReplaceTempView(view)
    return spark.sql(sql_template.format(view=view))


def province_stats_sql(spark: SparkSession, events: DataFrame) -> DataFrame:
    """ProvinceStatsSqlApp analog (group-dims + tumble + distinct count +
    stt/edt date_format — ProvinceStatsSqlApp.java:47-65)."""
    return register_and_run(spark, events, "events_view_province", PROVINCE_TUMBLE_SQL)


def keyword_stats_sql(spark: SparkSession, events: DataFrame) -> DataFrame:
    """KeywordStatsApp analog (tumble COUNT(*) + constant source tag —
    KeywordStatsApp.java:56-66)."""
    return register_and_run(spark, events, "events_view_keyword", KEYWORD_TUMBLE_SQL)


SESSION_GAPS_SQL = """
WITH gapped AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN timestampdiff(MICROSECOND,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM {view}
),
seq AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM gapped
)
SELECT user_id, session_seq,
       date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS session_start,
       date_format(max(ts), 'yyyy-MM-dd HH:mm:ss') AS session_end,
       count(*) AS n_events,
       floor(sum(value) * 100 + 0.5) / 100 AS value_sum
FROM seq GROUP BY user_id, session_seq
"""

BRAND_TOPN_SQL = """
WITH rev AS (
  SELECT p_type AS category, p_brand AS brand,
         sum(cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - cast(floor(l_discount * 100 + 0.5) AS BIGINT)))
             AS rev_e4
  FROM {li} JOIN {part} ON l_partkey = p_partkey
  GROUP BY 1, 2
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY category
                               ORDER BY rev_e4 DESC, brand) AS rn
  FROM rev
)
SELECT category, brand, floor(rev_e4 / 100 + 0.5) / 100 AS revenue, rn
FROM rk WHERE rn <= 3
"""


PIVOT_MATRIX_SQL = """
SELECT event_type,
       cast(coalesce(mon, 0) AS BIGINT) AS mon,
       cast(coalesce(tue, 0) AS BIGINT) AS tue,
       cast(coalesce(wed, 0) AS BIGINT) AS wed,
       cast(coalesce(thu, 0) AS BIGINT) AS thu,
       cast(coalesce(fri, 0) AS BIGINT) AS fri,
       cast(coalesce(sat, 0) AS BIGINT) AS sat,
       cast(coalesce(sun, 0) AS BIGINT) AS sun
FROM (
  SELECT event_type, weekday(ts) + 1 AS isodow FROM {view}
)
PIVOT (
  count(*) FOR isodow IN (1 AS mon, 2 AS tue, 3 AS wed, 4 AS thu,
                          5 AS fri, 6 AS sat, 7 AS sun)
)
"""


SET_OPS_SQL = """
WITH buyers AS (SELECT DISTINCT user_id FROM {view} WHERE event_type = 'purchase'),
clickers AS (SELECT DISTINCT user_id FROM {view} WHERE event_type = 'click'),
viewers AS (SELECT DISTINCT user_id FROM {view} WHERE event_type = 'view')
SELECT 'buy_and_click' AS cohort, cast(count(*) AS BIGINT) AS n_users,
       cast(sum(user_id) AS BIGINT) AS sum_ids
FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
UNION ALL
SELECT 'buy_not_view', cast(count(*) AS BIGINT), cast(sum(user_id) AS BIGINT)
FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM viewers)
UNION ALL
SELECT 'click_or_view', cast(count(*) AS BIGINT), cast(sum(user_id) AS BIGINT)
FROM (SELECT user_id FROM clickers UNION SELECT user_id FROM viewers)
"""


LATERAL_TOKENS_SQL = """
SELECT lang, tok, ct, rn FROM (
  SELECT lang, tok, cast(count(*) AS BIGINT) AS ct,
         cast(row_number() OVER (PARTITION BY lang
                                 ORDER BY count(*) DESC, tok) AS INT) AS rn
  FROM {view}
  LATERAL VIEW explode(split(trim(text), '\\\\s+')) t AS tok
  WHERE tok != ''
  GROUP BY lang, tok
) WHERE rn <= 5
"""


RANGE_FRAME_SQL = """
WITH c AS (
  SELECT event_type,
         count(*) OVER (PARTITION BY event_type ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                        AND CURRENT ROW) AS cnt
  FROM {view}
)
SELECT event_type,
       cast(max(cnt) AS BIGINT) AS max_trailing_1h,
       cast(count(*) AS BIGINT) AS n_events,
       floor(avg(cnt) * 1000000 + 0.5) / 1000000 AS avg_trailing_1h
FROM c GROUP BY event_type
"""


RECURSIVE_SPINE_SQL = """
WITH RECURSIVE sparse AS (
  SELECT event_type, to_date(ts) AS day, count(*) AS pv
  FROM {view} WHERE user_id % 97 = 0
  GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(day) AS day, max(day) AS max_day
  FROM sparse GROUP BY 1
),
spine AS (
  SELECT event_type, day, max_day FROM bounds
  UNION ALL
  SELECT event_type, date_add(day, 1), max_day FROM spine
  WHERE day < max_day
)
SELECT s.event_type, date_format(s.day, 'yyyy-MM-dd') AS day,
       cast(coalesce(p.pv, 0) AS BIGINT) AS pv,
       (p.pv IS NULL) AS gap_filled
FROM spine s
LEFT JOIN sparse p ON p.event_type = s.event_type AND p.day = s.day
"""


def _recursive_spine_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Date-spine gap filling as ONE spark.sql TEXT using WITH RECURSIVE
    (Spark 4's recursive CTE — the SQL-surface feature classic calendar
    dimension tables were invented to work around): the recursion GROWS
    the per-type day spine from min to max date, so the grid needs no
    cross join and no prebuilt calendar table; the sparse series (a
    deterministic user slice, so gaps genuinely exist) left-joins onto it
    with zero-filled, flagged gap rows. The recursion depth is the
    calendar span — bounded regardless of data volume."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_spine")
    return ev.sparkSession.sql(
        RECURSIVE_SPINE_SQL.format(view="events_view_sql_spine")
    )


def _session_gaps_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Gaps-and-islands sessionization as ONE spark.sql TEXT (CTEs + lag +
    running sum + rollup) — the SQL-surface twin of
    ``operators/sessions.sessionize``; shares its oracle, so the gate
    proves the SQL entry path produces byte-identical sessions. The gap
    compare stays in MICROSECONDS: a SECOND-granular timestampdiff
    truncates 1800.5 s gaps to 1800 and mis-merges boundary sessions."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_sessions")
    return ev.sparkSession.sql(
        SESSION_GAPS_SQL.format(view="events_view_sql_sessions")
    )


def _brand_topn_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-category brand top-3 as ONE spark.sql TEXT — the SQL spelling of
    the per-group top-N pattern (rank window + cut; Catalyst rewrites the
    rn<=3 filter into a WindowGroupLimit below the Exchange, same as the
    DataFrame quota op). Revenue flows as integer cents×pct so no fp
    boundary can flip the 2dp hash."""
    li, part = tables["lineitem"], tables["part"]
    li.createOrReplaceTempView("li_view_sql_topn")
    part.createOrReplaceTempView("part_view_sql_topn")
    return li.sparkSession.sql(
        BRAND_TOPN_SQL.format(li="li_view_sql_topn", part="part_view_sql_topn")
    )


def _province_q(tables: dict[str, DataFrame]) -> DataFrame:
    ev = tables["events"]
    return province_stats_sql(ev.sparkSession, ev)


def _keyword_q(tables: dict[str, DataFrame]) -> DataFrame:
    ev = tables["events"]
    return keyword_stats_sql(ev.sparkSession, ev)


def _pivot_matrix_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Day-of-week × event-type count matrix as ONE spark.sql TEXT using
    the SQL PIVOT clause — the SQL-surface spelling of the wide-report
    shape (``serving_pivot_roundtrip`` covers the DataFrame pivot/unpivot
    pair; this gates the PIVOT grammar itself). Pivot values are PINNED
    literals (1..7 aliased mon..sun): value inference would add a distinct
    scan and make column order data-dependent. Spark ``weekday()+1`` ==
    DuckDB ``isodow`` (the one dow convention both engines share)."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_pivot")
    return ev.sparkSession.sql(PIVOT_MATRIX_SQL.format(view="events_view_sql_pivot"))


def _range_frame_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Time-RANGE window frames as ONE spark.sql TEXT — the SQL-surface
    grammar for \"count of same-type events in the trailing hour\" (a RANGE
    frame over the ORDER BY timestamp, not a ROWS frame: simultaneous
    bursts must all see the same window regardless of row order). The avg
    over per-row counts is an exact-integer sum divided once (ints < 2⁵³
    sum exactly in double in any order), pinned anyway by discipline."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_range")
    return ev.sparkSession.sql(RANGE_FRAME_SQL.format(view="events_view_sql_range"))


def _lateral_tokens_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """HiveQL LATERAL VIEW explode as ONE spark.sql TEXT — the table-
    generating-function grammar (UDTF surface D1 exposes via DataFrame
    explode; this gates the SQL spelling): per-language top-5 tokens via
    the exploded token stream + rank-and-cut. All counts exact; rank ties
    break on token."""
    docs = tables["documents"]
    docs.createOrReplaceTempView("docs_view_sql_lateral")
    return docs.sparkSession.sql(
        LATERAL_TOKENS_SQL.format(view="docs_view_sql_lateral")
    )


def _set_ops_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """ANSI set operators as ONE spark.sql TEXT — INTERSECT / EXCEPT /
    UNION cohort algebra (buyers∩clickers, buyers∖viewers,
    clickers∪viewers), the audience-overlap grammar every SQL user
    reaches for before window tricks. Exact membership pinned by id sums,
    not just counts. U1–U3 cover UNION of conformed streams; this gates
    the distinct-set forms."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_setops")
    return ev.sparkSession.sql(SET_OPS_SQL.format(view="events_view_sql_setops"))


QUERIES = {
    "sql_set_ops": _set_ops_sql_q,
    "sql_lateral_tokens": _lateral_tokens_sql_q,
    "sql_range_frame": _range_frame_sql_q,
    "sql_pivot_matrix": _pivot_matrix_sql_q,
    "sql_recursive_spine": _recursive_spine_sql_q,
    "sql_province_tumble": _province_q,
    "sql_keyword_tumble": _keyword_q,
    "sql_session_gaps": _session_gaps_sql_q,
    "sql_brand_topn": _brand_topn_sql_q,
}


def _session_gaps_oracle() -> str:
    from flink_210225_spark.operators.sessions import ORACLES as _S

    return _S["session_gaps_islands"]

# Epoch-aligned tumble bounds: Spark window() aligns to the epoch, so the
# DuckDB oracle buckets with to_timestamp(floor(epoch/width)*width).
ORACLES = {
    # Same set algebra; id sums pin exact membership.
    "sql_set_ops": """
        WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        viewers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
        SELECT 'buy_and_click' AS cohort, count(*)::BIGINT AS n_users,
               sum(user_id)::BIGINT AS sum_ids
        FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
        UNION ALL
        SELECT 'buy_not_view', count(*)::BIGINT, sum(user_id)::BIGINT
        FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM viewers)
        UNION ALL
        SELECT 'click_or_view', count(*)::BIGINT, sum(user_id)::BIGINT
        FROM (SELECT user_id FROM clickers UNION SELECT user_id FROM viewers)
    """,
    # unnest replays LATERAL VIEW explode; same rank-and-cut.
    "sql_lateral_tokens": """
        SELECT lang, tok, ct, rn FROM (
            SELECT lang, tok, count(*)::BIGINT AS ct,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY count(*) DESC, tok)::INT AS rn
            FROM (
                SELECT lang,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
            GROUP BY lang, tok
        ) WHERE rn <= 5
    """,
    # Same RANGE INTERVAL frame; avg is an exact integer sum / n.
    "sql_range_frame": """
        WITH c AS (
            SELECT event_type,
                   count(*) OVER (PARTITION BY event_type ORDER BY ts
                                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                  AND CURRENT ROW)::BIGINT AS cnt
            FROM events
        )
        SELECT event_type, max(cnt)::BIGINT AS max_trailing_1h,
               count(*)::BIGINT AS n_events,
               floor(avg(cnt) * 1000000 + 0.5) / 1000000 AS avg_trailing_1h
        FROM c GROUP BY event_type
    """,
    # Conditional aggregation replays the pivot; isodow == weekday()+1.
    "sql_pivot_matrix": """
        SELECT event_type,
               sum(CASE WHEN isodow(ts) = 1 THEN 1 ELSE 0 END)::BIGINT AS mon,
               sum(CASE WHEN isodow(ts) = 2 THEN 1 ELSE 0 END)::BIGINT AS tue,
               sum(CASE WHEN isodow(ts) = 3 THEN 1 ELSE 0 END)::BIGINT AS wed,
               sum(CASE WHEN isodow(ts) = 4 THEN 1 ELSE 0 END)::BIGINT AS thu,
               sum(CASE WHEN isodow(ts) = 5 THEN 1 ELSE 0 END)::BIGINT AS fri,
               sum(CASE WHEN isodow(ts) = 6 THEN 1 ELSE 0 END)::BIGINT AS sat,
               sum(CASE WHEN isodow(ts) = 7 THEN 1 ELSE 0 END)::BIGINT AS sun
        FROM events GROUP BY event_type
    """,
    # Same recursion: DuckDB grows the spine with DATE + 1 per type.
    "sql_recursive_spine": """
        WITH RECURSIVE sparse AS (
            SELECT event_type, date_trunc('day', ts)::DATE AS day,
                   count(*)::BIGINT AS pv
            FROM events WHERE user_id % 97 = 0
            GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(day) AS day, max(day) AS max_day
            FROM sparse GROUP BY 1
        ),
        spine AS (
            SELECT event_type, day, max_day FROM bounds
            UNION ALL
            SELECT event_type, day + 1, max_day FROM spine
            WHERE day < max_day
        )
        SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
               coalesce(p.pv, 0)::BIGINT AS pv,
               (p.pv IS NULL) AS gap_filled
        FROM spine s
        LEFT JOIN sparse p ON p.event_type = s.event_type AND p.day = s.day
    """,
    # SQL-surface twin shares the DataFrame sessionizer's oracle.
    "sql_session_gaps": _session_gaps_oracle(),
    # Same integer cents×pct revenue, same rank cut.
    "sql_brand_topn": """
        WITH rev AS (
            SELECT p_type AS category, p_brand AS brand,
                   sum(floor(l_extendedprice * 100 + 0.5)::BIGINT
                       * (100 - floor(l_discount * 100 + 0.5)::BIGINT))
                       ::BIGINT AS rev_e4
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2
        ),
        rk AS (
            SELECT *, row_number() OVER (PARTITION BY category
                                         ORDER BY rev_e4 DESC, brand) AS rn
            FROM rev
        )
        SELECT category, brand,
               floor(rev_e4 / 100 + 0.5) / 100 AS revenue, rn
        FROM rk WHERE rn <= 3
    """,
    "sql_province_tumble": """
        SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600), '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600 + 3600), '%Y-%m-%d %H:%M:%S') AS edt,
               event_type,
               count(DISTINCT user_id) AS uv_ct,
               count(*) AS pv_ct,
               floor(sum(value) * 100 + 0.5) / 100 AS value_sum
        FROM events
        GROUP BY 1, 2, 3
    """,
    "sql_keyword_tumble": """
        SELECT strftime(to_timestamp(floor(epoch(ts) / 86400) * 86400), '%Y-%m-%d %H:%M:%S') AS stt,
               event_type AS keyword,
               count(*) AS ct,
               'SEARCH' AS source
        FROM events
        GROUP BY 1, 2
    """,
}


UNPIVOT_SQL = """
    WITH wide AS (
        SELECT o_orderstatus AS status,
               sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS p1,
               sum(CASE WHEN o_orderpriority LIKE '2%' THEN 1 ELSE 0 END) AS p2,
               sum(CASE WHEN o_orderpriority LIKE '3%' THEN 1 ELSE 0 END) AS p3
        FROM {view} GROUP BY o_orderstatus
    )
    SELECT status, priority, CAST(n AS BIGINT) AS n
    FROM wide UNPIVOT (n FOR priority IN (p1, p2, p3))
"""


def _unpivot_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """SQL UNPIVOT grammar as ONE spark.sql TEXT — the inverse surface of
    ``sql_pivot_matrix`` (wide report back to long; Spark 3.4+ UNPIVOT
    clause). DuckDB spells UNPIVOT differently, so the oracle replays the
    SEMANTICS with a 3-arm UNION ALL over the same wide CTE — grammar is
    what this op gates on the Spark side, values are what the hash gates.
    Exact integer counts end-to-end; UNPIVOT drops NULL cells by default
    on both spellings, and every cell here is a COUNT (never NULL)."""
    o = tables["orders"]
    o.createOrReplaceTempView("orders_view_sql_unpivot")
    return o.sparkSession.sql(UNPIVOT_SQL.format(view="orders_view_sql_unpivot"))


QUERIES["sql_unpivot"] = _unpivot_sql_q
ORACLES["sql_unpivot"] = """
    WITH wide AS (
        SELECT o_orderstatus AS status,
               sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END)::BIGINT AS p1,
               sum(CASE WHEN o_orderpriority LIKE '2%' THEN 1 ELSE 0 END)::BIGINT AS p2,
               sum(CASE WHEN o_orderpriority LIKE '3%' THEN 1 ELSE 0 END)::BIGINT AS p3
        FROM orders GROUP BY o_orderstatus
    )
    SELECT status, 'p1' AS priority, p1 AS n FROM wide
    UNION ALL SELECT status, 'p2', p2 FROM wide
    UNION ALL SELECT status, 'p3', p3 FROM wide
"""


HOF_SQL = """
    WITH t AS (
        SELECT doc_id, split(trim(text), '\\\\s+') AS toks
        FROM {view}
    )
    SELECT doc_id,
           size(filter(toks, t -> length(t) > 4)) AS n_long,
           aggregate(toks, 0L, (acc, t) -> acc + length(t)) AS n_chars,
           CAST(exists(toks, t -> t = 'the') AS BOOLEAN) AS has_the,
           size(array_distinct(transform(toks, t -> substring(t, 1, 1))))
               AS n_initials,
           reduce(toks, 0L,
                  (acc, t) -> acc + CASE WHEN length(t) % 2 = 0 THEN 1 ELSE 0 END,
                  acc -> acc * 10) AS even_len_x10
    FROM t
"""


def _hof_arrays_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Spark SQL higher-order-function grammar as ONE spark.sql TEXT —
    lambda expressions inside SQL (filter/aggregate/exists/transform and
    reduce WITH a finish lambda), the surface a SQL-first user hits long
    before the DataFrame API. The DuckDB oracle replays each lambda with
    its list_* twins (list_filter/list_sum/list_transform — reduce's
    finish step is plain arithmetic there), so the hash gates lambda
    SEMANTICS (per-element eval order, empty-array identity, integer
    accumulation) while the Spark side gates the GRAMMAR. All counts
    exact integers; zero shuffles — the whole thing rides the scan
    projection."""
    docs = tables["documents"]
    docs.createOrReplaceTempView("documents_view_sql_hof")
    return docs.sparkSession.sql(HOF_SQL.format(view="documents_view_sql_hof"))


QUERIES["sql_hof_arrays"] = _hof_arrays_sql_q
ORACLES["sql_hof_arrays"] = """
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(list_filter(toks, t -> length(t) > 4))::INT AS n_long,
           coalesce(list_sum(list_transform(toks, t -> length(t))), 0)::BIGINT
               AS n_chars,
           (len(list_filter(toks, t -> t = 'the')) > 0) AS has_the,
           len(list_distinct(list_transform(toks, t -> t[1:1])))::INT
               AS n_initials,
           (coalesce(list_sum(list_transform(toks,
                t -> CASE WHEN length(t) % 2 = 0 THEN 1 ELSE 0 END)), 0)
            * 10)::BIGINT AS even_len_x10
    FROM t
"""


WINDOW_CLAUSE_SQL = """
    SELECT o_custkey,
           o_orderkey,
           cents,
           CAST(sum(cents) OVER w_cum AS BIGINT) AS cum_cents,
           row_number() OVER w_seq AS order_seq,
           max(cents)   OVER w_all AS cust_max_cents
    FROM (
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM {view}
        WHERE o_custkey % 100 = 0
    )
    WINDOW w_cum AS (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_seq AS (PARTITION BY o_custkey ORDER BY o_orderkey),
           w_all AS (PARTITION BY o_custkey)
"""


def _window_clause_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Named-WINDOW-clause grammar as ONE spark.sql TEXT — the
    define-once-reference-thrice SQL surface (three OVER references to
    WINDOW definitions sharing a partition key), which also pins the
    PLAN property that matters: all three windows share ONE o_custkey
    Exchange (Catalyst groups same-keyed window specs), so adding a
    metric never adds a shuffle. DuckDB supports the same clause — the
    oracle replays it verbatim-shaped. Exact integer cents throughout."""
    o = tables["orders"]
    o.createOrReplaceTempView("orders_view_sql_window")
    return o.sparkSession.sql(WINDOW_CLAUSE_SQL.format(view="orders_view_sql_window"))


QUERIES["sql_window_clause"] = _window_clause_sql_q
ORACLES["sql_window_clause"] = """
    SELECT o_custkey, o_orderkey, cents,
           (sum(cents) OVER w_cum)::BIGINT AS cum_cents,
           row_number() OVER w_seq AS order_seq,
           max(cents)   OVER w_all AS cust_max_cents
    FROM (
        SELECT o_custkey, o_orderkey,
               floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
        FROM orders
        WHERE o_custkey % 100 = 0
    )
    WINDOW w_cum AS (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_seq AS (PARTITION BY o_custkey ORDER BY o_orderkey),
           w_all AS (PARTITION BY o_custkey)
"""


TRY_CAST_SQL = """
    WITH raw AS (
        SELECT event_id,
               CASE CAST(event_id % 4 AS INT)
                    WHEN 0 THEN CAST(event_id AS STRING)
                    WHEN 1 THEN CONCAT(CAST(event_id AS STRING), '.25')
                    WHEN 2 THEN 'N/A'
                    ELSE '99999999999999999999999999'
               END AS s
        FROM {view}
    )
    SELECT CAST(event_id % 4 AS BIGINT) AS class,
           COUNT(*) AS n_rows,
           SUM(CASE WHEN TRY_CAST(s AS BIGINT) IS NULL THEN 1 ELSE 0 END)
               AS null_bigint,
           SUM(CASE WHEN TRY_CAST(s AS DOUBLE) IS NULL THEN 1 ELSE 0 END)
               AS null_double,
           COALESCE(SUM(TRY_CAST(s AS BIGINT)), 0) AS sum_bigint,
           CAST(COALESCE(SUM(CASE WHEN event_id % 4 = 1
                                  THEN TRY_CAST(s AS DOUBLE) * 100 END), 0)
                AS BIGINT) AS frac_cents
    FROM raw GROUP BY 1
"""


def _try_cast_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """TRY_CAST dirty-data grammar as ONE spark.sql TEXT — the ANSI-mode
    survival kit (under ANSI SQL a bad CAST kills the job; TRY_CAST turns
    it into a NULL the pipeline can route, the SQL-text twin of the
    PERMISSIVE-parse sources). Four deterministic string classes: clean
    integers, decimal strings (a BIGINT try fails, a DOUBLE try
    succeeds — ×100 stays exact, .25 cents are representable), garbage,
    and a 26-digit overflow that must NULL out of BIGINT rather than
    wrap. DuckDB replays with its own TRY_CAST except for ONE measured
    dialect divergence this op exists to document: DuckDB TRY_CAST
    ROUNDS a decimal string into BIGINT ('123.25' -> 123) where Spark's
    ANSI rule rejects it to NULL — the oracle pins Spark's stricter
    behavior by rule (CASE on the decimal class), so the gate still
    breaks if Spark ever starts silently rounding."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_trycast")
    return ev.sparkSession.sql(TRY_CAST_SQL.format(view="events_view_sql_trycast"))


QUERIES["sql_try_cast_dirty"] = _try_cast_sql_q
ORACLES["sql_try_cast_dirty"] = """
    WITH raw AS (
        SELECT event_id,
               CASE (event_id % 4)::INT
                    WHEN 0 THEN event_id::VARCHAR
                    WHEN 1 THEN event_id::VARCHAR || '.25'
                    WHEN 2 THEN 'N/A'
                    ELSE '99999999999999999999999999'
               END AS s
        FROM events
    )
    SELECT (event_id % 4)::BIGINT AS class,
           count(*)::BIGINT AS n_rows,
           -- Spark's ANSI rule: a decimal string does NOT cast to BIGINT
           -- (DuckDB's TRY_CAST would round it — measured divergence)
           sum(CASE WHEN event_id % 4 = 1 THEN 1
                    WHEN TRY_CAST(s AS BIGINT) IS NULL THEN 1 ELSE 0 END)
               ::BIGINT AS null_bigint,
           sum(CASE WHEN TRY_CAST(s AS DOUBLE) IS NULL THEN 1 ELSE 0 END)
               ::BIGINT AS null_double,
           coalesce(sum(CASE WHEN event_id % 4 != 1
                             THEN TRY_CAST(s AS BIGINT) END), 0)::BIGINT
               AS sum_bigint,
           coalesce(sum(CASE WHEN event_id % 4 = 1
                             THEN TRY_CAST(s AS DOUBLE) * 100 END),
                    0)::BIGINT AS frac_cents
    FROM raw GROUP BY 1
"""


CORRELATED_SQL = """
    SELECT c.c_nationkey AS nation,
           CAST(count(*) AS BIGINT) AS n_above,
           CAST(sum(CASE WHEN EXISTS (
                    SELECT 1 FROM {orders} o
                    WHERE o.o_custkey = c.c_custkey
               ) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
           CAST(sum(
               CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
               * (SELECT count(*) FROM {customer} c3
                  WHERE c3.c_nationkey = c.c_nationkey)
               - (SELECT CAST(sum(floor(c2.c_acctbal * 100 + 0.5))
                         AS BIGINT)
                  FROM {customer} c2
                  WHERE c2.c_nationkey = c.c_nationkey)
           ) AS BIGINT) AS excess_x_n
    FROM {customer} c
    WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
          * (SELECT count(*) FROM {customer} c3
             WHERE c3.c_nationkey = c.c_nationkey)
          > (SELECT CAST(sum(floor(c2.c_acctbal * 100 + 0.5)) AS BIGINT)
             FROM {customer} c2
             WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY c.c_nationkey
"""


def _correlated_scalar_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Correlated-subquery SQL grammar as ONE spark.sql text — two
    correlated SCALAR subqueries (per-nation count and per-nation balance
    sum, referenced in both WHERE and SELECT) plus a correlated EXISTS.
    This is the surface Catalyst must DECORRELATE
    (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery turn each
    into an aggregate-then-join); a SQL-first analyst writes exactly this
    shape for "customers above their nation's average balance".

    The above-average predicate is the exact integer cross-multiply
    (cents · nation_count > nation_cents_sum) — no float average ever
    exists, so the boundary rows can't flip between engines. The oracle
    runs the IDENTICAL text through DuckDB's own decorrelation.

    Scale: decorrelation rewrites the O(n²) nested form into two
    nation-keyed aggregates joined back — nation is the shuffle key, the
    EXISTS becomes a left-semi join on custkey."""
    cust = tables["customer"]
    ords = tables["orders"]
    cust.createOrReplaceTempView("customer_view_sql_corr")
    ords.createOrReplaceTempView("orders_view_sql_corr")
    return cust.sparkSession.sql(
        CORRELATED_SQL.format(
            customer="customer_view_sql_corr", orders="orders_view_sql_corr"
        )
    )


QUERIES["sql_correlated_scalar"] = _correlated_scalar_sql_q
ORACLES["sql_correlated_scalar"] = CORRELATED_SQL.format(
    customer="customer", orders="orders"
)


STAR_EXCEPT_SQL = """
    SELECT * EXCEPT (o_comment_free, day)
    FROM (
        SELECT o_orderstatus,
               o_orderpriority,
               strftime(o_orderdate, '%Y') AS yr,
               strftime(o_orderdate, '%Y%m%d') AS day,
               'x' AS o_comment_free,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM {orders}
        GROUP BY ALL
    )
    WHERE yr = '1997'
"""


def _star_except_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Modern SQL sugar grammar as ONE spark.sql text — ``SELECT * EXCEPT
    (cols)`` (the wide-table projection idiom BigQuery popularized; Spark
    4 grammar) composed with ``GROUP BY ALL`` (group on every non-aggregate
    select item — the de-facto analyst default DuckDB popularized). The
    inner aggregate groups by ALL four dimension columns, the outer
    star-except drops two of them — so the result is a (status, priority,
    yr) grain that still carries per-DAY aggregates, i.e. the EXCEPT must
    prune columns WITHOUT re-aggregating. The DuckDB oracle replays the
    semantics with explicit column lists + GROUP BY (its own EXCLUDE
    spelling differs), so the hash gates what the sugar MEANS.

    The shared text carries DuckDB's strftime spelling; the Spark run
    rewrites it to date_format (the one dialect seam, same yyyyMMdd
    rendering on both).

    Scale: sugar only — the plan is the same pre-agg + filter Catalyst
    builds for the explicit projection; the WHERE on yr prunes at the
    aggregate, not the scan (documented: yr is derived)."""
    o = tables["orders"]
    o.createOrReplaceTempView("orders_view_sql_sx")
    sql = STAR_EXCEPT_SQL.format(orders="orders_view_sql_sx").replace(
        "strftime(o_orderdate, '%Y%m%d')", "date_format(o_orderdate, 'yyyyMMdd')"
    ).replace(
        "strftime(o_orderdate, '%Y')", "date_format(o_orderdate, 'yyyy')"
    )
    return o.sparkSession.sql(sql)


QUERIES["sql_star_except_all"] = _star_except_sql_q
ORACLES["sql_star_except_all"] = """
    SELECT o_orderstatus, o_orderpriority,
           strftime(o_orderdate, '%Y') AS yr,
           count(*)::BIGINT AS n_orders,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority, yr,
             strftime(o_orderdate, '%Y%m%d')
    HAVING yr = '1997'
"""


IDENTIFIER_SQL = """
    SELECT IDENTIFIER({gcol}) AS segment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(IDENTIFIER({vcol}) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents,
           CAST(count(DISTINCT IDENTIFIER({kcol})) AS BIGINT) AS n_keys
    FROM IDENTIFIER({table})
    GROUP BY IDENTIFIER({gcol})
"""


def _identifier_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """The Spark 4 ``IDENTIFIER()`` clause — SQL-injection-safe templating
    of table AND column names (the parameterized-DDL/DML surface that
    replaces string concatenation when a config drives which table or
    column a job reads; the config-driven-routing theme of the reference's
    T3, at the SQL grammar layer). The template binds one table and three
    column identifiers through string literals; the planner resolves them
    as identifiers, never as expressions — a pytest proves the injection
    ('customer; DROP ...') dies at parse/analysis instead of executing.

    The oracle replays the resolved query in plain SQL, so the hash gates
    that IDENTIFIER binding is a pure name indirection."""
    cust = tables["customer"]
    cust.createOrReplaceTempView("customer_view_sql_ident")
    binds = {
        "table": "'customer_view_sql_ident'",
        "gcol": "'c_mktsegment'",
        "vcol": "'c_acctbal'",
        "kcol": "'c_nationkey'",
    }
    return cust.sparkSession.sql(IDENTIFIER_SQL.format(**binds))


QUERIES["sql_identifier_clause"] = _identifier_sql_q
ORACLES["sql_identifier_clause"] = """
    SELECT c_mktsegment AS segment, count(*)::BIGINT AS n_rows,
           sum(floor(c_acctbal * 100 + 0.5)::BIGINT)::BIGINT AS cents,
           count(DISTINCT c_nationkey)::BIGINT AS n_keys
    FROM customer GROUP BY 1
"""


PIPE_SQL = """
FROM {view}
 |> EXTEND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
 |> EXTEND date_format(o_orderdate, 'yyyy') AS yr
 |> WHERE o_orderstatus <> 'F'
 |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(cents) AS BIGINT) AS cents,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    GROUP BY o_orderpriority, yr
 |> WHERE n_orders > 2
 |> SELECT o_orderpriority AS priority, yr, n_orders, cents, n_custs
"""


def _pipe_syntax_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """SQL pipe syntax (SIGMOD '24 "Pipe Syntax in SQL", shipped in Spark
    4.0) as ONE spark.sql text — the linear `FROM |> EXTEND |> WHERE |>
    AGGREGATE |> WHERE |> SELECT` dataflow spelling of a filtered rollup
    with a post-aggregation filter (the stage order IS the evaluation
    order, so the second WHERE needs no HAVING keyword and the EXTENDed
    columns are plainly in scope downstream). The oracle replays the same
    pipeline as classic nested SQL in DuckDB — the hash gates that the
    sugar evaluates stage-by-stage with standard semantics.

    Scale: sugar only — Catalyst plans the identical pre-agg + filter."""
    o = tables["orders"]
    o.createOrReplaceTempView("orders_view_sql_pipe")
    return o.sparkSession.sql(PIPE_SQL.format(view="orders_view_sql_pipe"))


QUERIES["sql_pipe_syntax"] = _pipe_syntax_sql_q
ORACLES["sql_pipe_syntax"] = """
    SELECT o_orderpriority AS priority,
           strftime(o_orderdate, '%Y') AS yr,
           count(*)::BIGINT AS n_orders,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents,
           count(DISTINCT o_custkey)::BIGINT AS n_custs
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY 1, 2
    HAVING count(*) > 2
"""


HINTS_SQL = """
    SELECT /*+ BROADCAST(c), REPARTITION(8) */
           c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM {orders} o JOIN {customer} c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


def _hints_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """SQL join/partitioning HINT grammar as ONE spark.sql text —
    ``/*+ BROADCAST(alias) */`` (forces the build side regardless of
    autoBroadcastJoinThreshold — the production escape hatch when stats
    mislead the planner) plus ``REPARTITION(n)``. Hints must be
    semantics-neutral: the oracle replays the same join with no hints and
    the hash must not move. The PLAN effect is gated separately in pytest:
    with the broadcast threshold disabled (-1), the un-hinted join
    degrades to SortMerge while the hinted text still plans a
    BroadcastHashJoin."""
    o, c = tables["orders"], tables["customer"]
    o.createOrReplaceTempView("orders_view_sql_hints")
    c.createOrReplaceTempView("customer_view_sql_hints")
    return o.sparkSession.sql(
        HINTS_SQL.format(
            orders="orders_view_sql_hints", customer="customer_view_sql_hints"
        )
    )


QUERIES["sql_hints_grammar"] = _hints_sql_q
ORACLES["sql_hints_grammar"] = """
    SELECT c.c_mktsegment AS segment, count(*)::BIGINT AS n_orders,
           sum(floor(o.o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
"""


VALUES_SQL = """
    WITH tier(status, tier_name, priority_weight) AS (
        VALUES ('O', 'open', 3),
               ('P', 'pending', 2),
               ('F', 'filled', 1)
    )
    SELECT t.tier_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                    * t.priority_weight) AS BIGINT) AS weighted_cents
    FROM {orders} o JOIN tier t ON o.o_orderstatus = t.status
    GROUP BY t.tier_name
"""


def _values_inline_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Inline VALUES table constructor grammar — config-as-code dims
    (tier maps, weight tables, routing rules) written directly in the
    query text instead of a side file, the SQL-first spelling of the
    broadcast-config pattern (reference T3's routing config, at the
    grammar layer). A named 3-row CTE with column aliases joins the fact
    table and weights an exact-cents aggregate; the oracle runs the
    IDENTICAL text through DuckDB, so the hash gates VALUES binding,
    CTE column aliasing, and the join semantics together.

    Scale: Catalyst folds the VALUES into a LocalRelation and broadcasts
    it — the production shape for any hand-sized dim."""
    o = tables["orders"]
    o.createOrReplaceTempView("orders_view_sql_values")
    return o.sparkSession.sql(VALUES_SQL.format(orders="orders_view_sql_values"))


QUERIES["sql_values_inline"] = _values_inline_sql_q
ORACLES["sql_values_inline"] = VALUES_SQL.format(orders="orders")


VARIANT_SQL = """
    WITH v AS (
        SELECT event_type, parse_json(props) AS pv
        FROM {events}
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(variant_get(pv, '$.k', 'long')) AS BIGINT) AS k_sum,
           CAST(min(variant_get(pv, '$.k', 'long')) AS BIGINT) AS k_min,
           CAST(max(variant_get(pv, '$.k', 'long')) AS BIGINT) AS k_max,
           CAST(sum(CASE WHEN variant_get(pv, '$.k', 'long') < 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS k_low,
           CAST(sum(CASE WHEN try_variant_get(pv, '$.missing', 'string')
                              IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM v
    GROUP BY event_type
"""


def _variant_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Spark 4 VARIANT grammar as ONE spark.sql TEXT — ``parse_json`` into
    the open-schema VARIANT type, typed path extraction with
    ``variant_get`` and null-safe ``try_variant_get`` on an absent path —
    the semi-structured surface that replaces string-JSON re-parsing per
    field (the reference's P1 JSON shaping, at the engine-type layer;
    gmall `BaseLogApp.java` parses the same envelope per access). The
    DuckDB oracle extracts the same paths with native JSON operators, so
    the hash gates typed extraction + missing-path semantics cross-engine.

    Scale: parse_json runs once per row in the scan projection (binary
    variant, no per-field string re-parse); the agg shuffles
    |event_type| rows. At 100 TB the variant column would be materialized
    once at ingest (shredded parquet), not re-parsed per query."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_variant")
    return ev.sparkSession.sql(VARIANT_SQL.format(events="events_view_sql_variant"))


QUERIES["sql_variant_extract"] = _variant_sql_q
# json_extract returns JSON; ::BIGINT on the extracted scalar is DuckDB's
# typed-get twin. The '$.missing' probe is NULL on every row in both
# engines (try_variant_get vs json_extract_string on an absent path).
ORACLES["sql_variant_extract"] = """
    SELECT event_type,
           count(*)::BIGINT AS n,
           sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_sum,
           min(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_min,
           max(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_max,
           sum(CASE WHEN json_extract(props, '$.k')::BIGINT < 50
                    THEN 1 ELSE 0 END)::BIGINT AS k_low,
           sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_missing
    FROM events
    GROUP BY event_type
"""


LATERAL_JOIN_SQL = """
    SELECT n.n_name AS nation, t.c_name, t.acctbal_cents
    FROM {nation} n,
    LATERAL (
        SELECT c_name,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
        FROM {customer} c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY acctbal_cents DESC, c_name
        LIMIT 3
    ) t
"""


def _lateral_join_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Correlated LATERAL subquery grammar as ONE spark.sql TEXT — the
    top-N-per-group join spelled as a dependent subquery with ORDER BY +
    LIMIT (SQL:1999 lateral derived table; Spark 3.2+), the SQL-first
    twin of the ``serving_*_topn`` window-function kernels. Catalyst
    DECORRELATES the per-row subquery into a ranked window join — the
    plan a hand-written rank()<=3 would produce, so the grammar costs
    nothing at scale (no per-outer-row re-execution, unlike a naive
    nested-loop reading). Tie-break on (cents, name) makes top-3
    deterministic; cents are exact BIGINT before the sort.

    DuckDB executes the IDENTICAL text (its LATERAL spelling matches),
    so the hash gates decorrelation semantics — per-group LIMIT, ORDER
    stability, correlation predicate — not just the row set."""
    tables["nation"].createOrReplaceTempView("nation_view_sql_lat")
    tables["customer"].createOrReplaceTempView("customer_view_sql_lat")
    return tables["nation"].sparkSession.sql(
        LATERAL_JOIN_SQL.format(nation="nation_view_sql_lat", customer="customer_view_sql_lat")
    )


QUERIES["sql_lateral_join"] = _lateral_join_sql_q
ORACLES["sql_lateral_join"] = LATERAL_JOIN_SQL.format(
    nation="nation", customer="customer"
)


EXEC_IMMEDIATE_INNER = (
    "SELECT o_orderstatus AS status, o_orderpriority AS priority, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS cents "
    "FROM {orders} WHERE o_totalprice > :minp "
    "GROUP BY o_orderstatus, o_orderpriority"
)


def _execute_immediate_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """EXECUTE IMMEDIATE + named parameter markers (Spark 4 / SQL:2016
    dynamic SQL) — the templated-query surface a SQL-first orchestration
    layer hits: the query TEXT is a runtime value and ``:minp`` binds via
    USING, so the engine (not string interpolation) handles typing and
    injection safety — the grammar twin of ``sql_identifier_clause``
    (which templates IDENTIFIERS, while this templates the whole
    statement + scalar parameters). The oracle runs the inner SELECT with
    the literal inlined, so the hash gates that parameter binding is
    value-identical to literal substitution.

    Scale: the bound plan is the same Catalyst plan as the literal form —
    parameter markers constant-fold before optimization, so pushdown/
    pruning are unaffected."""
    o = tables["orders"]
    o.createOrReplaceTempView("orders_view_sql_execimm")
    inner = EXEC_IMMEDIATE_INNER.format(orders="orders_view_sql_execimm")
    quoted = inner.replace("'", "''")
    return o.sparkSession.sql(
        f"EXECUTE IMMEDIATE '{quoted}' USING 150000.0 AS minp"
    )


QUERIES["sql_execute_immediate"] = _execute_immediate_sql_q
ORACLES["sql_execute_immediate"] = (
    EXEC_IMMEDIATE_INNER.format(orders="orders").replace(":minp", "150000.0")
)


COLLATION_SQL = """
    WITH v AS (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                    WHEN c_custkey % 3 = 1 THEN c_mktsegment
                    ELSE substr(c_mktsegment, 1, 1)
                         || lower(substr(c_mktsegment, 2)) END AS seg,
               c_custkey
        FROM {customer}
    )
    SELECT min(lower(seg)) AS segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants,
           CAST(count(DISTINCT {ci_expr}) AS BIGINT) AS n_ci
    FROM v
    GROUP BY {group_expr}
"""


def _collation_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """Spark 4 COLLATION grammar as ONE spark.sql TEXT — GROUP BY and
    COUNT(DISTINCT) under ``COLLATE UTF8_LCASE``, the engine-level
    case-insensitive comparison that replaces ad-hoc ``lower()`` wrapping
    (and, unlike lower(), composes with indexes/stats on collated
    columns). The fixture's segments are case-exploded three ways by
    custkey; the collated GROUP BY must collapse them back: per group,
    ``n_case_variants`` (binary-distinct spellings) is 2-3 and ``n_ci``
    (collated-distinct) must be exactly 1 — the semantic contract of the
    collation. DuckDB replays with lower() equivalence, so the hash
    gates that UTF8_LCASE equality == lowercase equality on this
    alphabet.

    Scale: the collated group key hashes its collation key — same
    shuffle shape as any groupBy; no row explosion."""
    c = tables["customer"]
    c.createOrReplaceTempView("customer_view_sql_collation")
    return c.sparkSession.sql(
        COLLATION_SQL.format(
            customer="customer_view_sql_collation",
            ci_expr="seg COLLATE UTF8_LCASE",
            group_expr="seg COLLATE UTF8_LCASE",
        )
    )


QUERIES["sql_collation_groupby"] = _collation_sql_q
ORACLES["sql_collation_groupby"] = COLLATION_SQL.format(
    customer="customer", ci_expr="lower(seg)", group_expr="lower(seg)"
)


SQL_UDF_BODY = (
    "SELECT o_orderstatus AS status, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum({cents_call}) AS BIGINT) AS cents, "
    "CAST(sum({tier_call}) AS BIGINT) AS tier_sum "
    "FROM {orders} GROUP BY o_orderstatus"
)


def _sql_udf_q(tables: dict[str, DataFrame]) -> DataFrame:
    """SQL-defined scalar functions (CREATE TEMPORARY FUNCTION … RETURN
    expr, Spark 3.5+/SQL-standard SQL-body UDF) — the engine-native way
    to centralize expression logic WITHOUT leaving codegen: unlike a
    Python UDF the body INLINES into the caller's plan (the optimizer
    sees floor/CASE, not an opaque call), so the canonical-cents rule
    can live in one named function at zero runtime cost. Two functions:
    the repo's canonical cents pin and a CASE tier, one calling context
    each; the oracle inlines the identical bodies, gating that function
    inlining is semantics-preserving.

    Scale: zero — the inlined plan is byte-identical to the hand-written
    expression (no serialization boundary, full WholeStageCodegen)."""
    o = tables["orders"]
    spark = o.sparkSession
    o.createOrReplaceTempView("orders_view_sql_udf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_cents(x DOUBLE) RETURNS"
        " BIGINT RETURN CAST(floor(x * 100 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_tier(x DOUBLE) RETURNS INT"
        " RETURN CASE WHEN x > 200000 THEN 3 WHEN x > 100000 THEN 2"
        " ELSE 1 END"
    )
    return spark.sql(
        SQL_UDF_BODY.format(
            orders="orders_view_sql_udf",
            cents_call="sg_cents(o_totalprice)",
            tier_call="sg_tier(o_totalprice)",
        )
    )


QUERIES["sql_udf_scalar"] = _sql_udf_q
# The oracle inlines the two function bodies verbatim.
ORACLES["sql_udf_scalar"] = SQL_UDF_BODY.format(
    orders="orders",
    cents_call="floor(o_totalprice * 100 + 0.5)::BIGINT",
    tier_call=(
        "CASE WHEN o_totalprice > 200000 THEN 3"
        " WHEN o_totalprice > 100000 THEN 2 ELSE 1 END"
    ),
)


MULTISET_SQL = """
    WITH views AS (
        SELECT user_id FROM {events} WHERE event_type = 'view'
    ),
    clicks AS (
        SELECT user_id FROM {events} WHERE event_type = 'click'
    )
    SELECT 'views_minus_clicks_all' AS op,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(user_id) AS BIGINT) AS id_mass
    FROM (SELECT user_id FROM views EXCEPT ALL SELECT user_id FROM clicks)
    UNION ALL
    SELECT 'views_intersect_clicks_all',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(sum(user_id) AS BIGINT)
    FROM (SELECT user_id FROM views INTERSECT ALL
          SELECT user_id FROM clicks)
    UNION ALL
    SELECT 'except_distinct',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(sum(user_id) AS BIGINT)
    FROM (SELECT user_id FROM views EXCEPT SELECT user_id FROM clicks)
"""


def _multiset_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """MULTISET set operations (EXCEPT ALL / INTERSECT ALL, SQL:1999 —
    Spark 3.0+) as ONE spark.sql TEXT — bag semantics where
    ``sql_set_ops``' distinct variants collapse duplicates: EXCEPT ALL
    subtracts per-OCCURRENCE (a user with 5 views and 2 clicks keeps 3
    rows — the "excess exposure" count distinct-EXCEPT can't express),
    INTERSECT ALL keeps min(multiplicity). The distinct-EXCEPT arm rides
    along so the hash gates the bag-vs-set divergence itself (n_rows
    differs, n_users agrees). DuckDB runs the identical text.

    Scale: Catalyst plans ALL-variants as count-aggregating joins on the
    compare key — same shuffle shape as the distinct forms, no row
    explosion."""
    ev = tables["events"]
    ev.createOrReplaceTempView("events_view_sql_multiset")
    return ev.sparkSession.sql(
        MULTISET_SQL.format(events="events_view_sql_multiset")
    )


QUERIES["sql_multiset_ops"] = _multiset_sql_q
ORACLES["sql_multiset_ops"] = MULTISET_SQL.format(events="events")


GROUP_BY_ALL_SQL = """
    SELECT o_orderstatus AS status,
           substring(o_orderpriority, 1, 1) AS pclass,
           (o_custkey % 2 = 0) AS even_cust,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM {orders}
    GROUP BY ALL
    ORDER BY ALL
"""


def _group_by_all_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL grammar as ONE spark.sql TEXT — the
    modern analyst shorthand (Spark 3.4+, DuckDB native) that infers the
    grouping key set from the non-aggregate select items, including a
    COMPUTED item (substring) and a boolean expression — exactly where
    hand-maintained GROUP BY 1,2,3 lists silently rot when a column is
    added. DuckDB runs the IDENTICAL text, so the hash gates that both
    engines infer the same key set and the same ALL-ordering. Counts and
    cents exact integers.

    Scale: plans as a plain hash aggregate on the inferred keys — the
    grammar is free; ORDER BY ALL is a bounded 12-row sort."""
    o = tables["orders"]
    o.createOrReplaceTempView("orders_view_sql_gba")
    return o.sparkSession.sql(GROUP_BY_ALL_SQL.format(orders="orders_view_sql_gba"))


QUERIES["sql_group_by_all"] = _group_by_all_sql_q
ORACLES["sql_group_by_all"] = GROUP_BY_ALL_SQL.format(orders="orders")


RECURSIVE_CTE_SQL = """
    WITH RECURSIVE walk(k, d) AS (
        SELECT CAST(n_nationkey AS BIGINT), CAST(0 AS BIGINT)
        FROM {nation} WHERE n_nationkey = 0
        UNION ALL
        SELECT (w.k * 7 + 3) % 25, w.d + 1
        FROM walk w WHERE w.d < 30
    )
    SELECT w.k AS nationkey,
           CAST(min(w.d) AS BIGINT) AS hops,
           CAST(count(*) AS BIGINT) AS n_visits
    FROM walk w
    GROUP BY w.k
"""


def _recursive_cte_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """WITH RECURSIVE grammar as ONE spark.sql TEXT (new in Spark 4.x;
    DuckDB native) — the iterate-inside-SQL surface behind hierarchy
    walks, BFS reachability, and sequence generation that previously
    forced a driver-side loop. The walk follows the deterministic
    functional graph succ(u) = (7u+3) mod 25 from nation 0 with a depth
    bound (single out-edge ⇒ the frontier stays ONE row per step — no
    UNION ALL path explosion; the rho-shaped orbit revisits its cycle,
    which n_visits exposes and min(d) collapses). Both engines run the
    IDENTICAL text, so the hash gates anchor/step typing, the
    depth-guard cutoff, and the post-recursion aggregate. Exact
    integers throughout.

    Scale: the recursion is depth-bounded and frontier-bounded by
    construction (31 rows total); the nation scan is the only table
    access. For data-sized iteration the engine's loop stays the Pregel
    envelope (``dedup_pagerank``) — a recursive CTE shines for
    DIMENSION-sized walks exactly like this."""
    nat = tables["nation"]
    nat.createOrReplaceTempView("nation_view_sql_rec")
    return nat.sparkSession.sql(RECURSIVE_CTE_SQL.format(nation="nation_view_sql_rec"))


QUERIES["sql_recursive_cte"] = _recursive_cte_sql_q
ORACLES["sql_recursive_cte"] = RECURSIVE_CTE_SQL.format(nation="nation")


def _session_variables_sql_q(tables: dict[str, DataFrame]) -> DataFrame:
    """SQL session variables (Spark 4.x DECLARE / SET VAR) as spark.sql
    TEXT — the parameterized-query surface that replaces string
    interpolation for dashboard filters (SQL-injection-proof, typed,
    session-scoped). DECLARE OR REPLACE keeps the query re-runnable in a
    long-lived session; two variables (a cents threshold and a status)
    drive the aggregate so the hash gates that variable REFERENCES
    resolve with their assigned values and types. DuckDB's variable
    syntax differs (SET VARIABLE / getvariable), so the oracle inlines
    the same constants — the gate pins the semantics, the Spark side
    pins the grammar.

    Scale: the variables are driver-side session state; the query plans
    exactly as its constant-folded equivalent (one scan + aggregate)."""
    o = tables["orders"]
    spark = o.sparkSession
    o.createOrReplaceTempView("orders_view_sql_vars")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE r8_min_cents BIGINT DEFAULT 0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE r8_status STRING DEFAULT 'O'")
    spark.sql("SET VAR r8_min_cents = 15000000")
    spark.sql("SET VAR r8_status = 'F'")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders_view_sql_vars
        WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= r8_min_cents
          AND o_orderstatus = r8_status
        GROUP BY o_orderpriority
        """
    )


QUERIES["sql_session_variables"] = _session_variables_sql_q
ORACLES["sql_session_variables"] = """
    SELECT o_orderpriority AS priority,
           count(*)::BIGINT AS n_orders,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents
    FROM orders
    WHERE floor(o_totalprice * 100 + 0.5)::BIGINT >= 15000000
      AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
"""
