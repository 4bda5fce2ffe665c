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
    """The applyInPandasWithState kernel agrees with the model when the
    watermark has passed every event's decision deadline: gap-jumps AND the
    final event's timeout-jump all emit in one invocation, and no state
    row survives (the buffered kernel releases events at/below the
    watermark and resolves the pending event once wm > ts+timeout)."""
    from flink_210225_spark.streaming.pipelines import make_jump_func

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    wm_ms = (ts[-1] + timeout + 10) * 1000  # past every deadline

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

        def getCurrentWatermarkMs(self):
            return wm_ms

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
    want = _model_jumps(ts, timeout)
    assert got == want
    assert not state.exists, "fully-resolved key must not pin a state row"


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=2000), min_size=1, max_size=12),
    timeout=st.integers(min_value=1, max_value=1200),
    wm_lag=st.integers(min_value=0, max_value=3000),
)
@settings(max_examples=8, deadline=None)
def test_jump_stateful_func_partial_watermark(gaps, timeout, wm_lag):
    """With the watermark mid-stream, the kernel must emit exactly the
    model's jumps among FULLY-DECIDED events (both the event and its
    successor at/below wm, or its timeout deadline passed) and buffer the
    rest — never a wrong emission, never a lost event: emitted ∪ buffered
    ∪ pending == all events."""
    from flink_210225_spark.streaming.pipelines import make_jump_func

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    wm_s = max(ts[-1] - wm_lag, 0)
    wm_ms = wm_s * 1000

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

        def getCurrentWatermarkMs(self):
            return wm_ms

        def remove(self):
            self.value = None
            self.exists = False

    f = make_jump_func(timeout)
    state = FakeState()
    pdf = pd.DataFrame(
        {"event_id": range(len(ts)), "ts": pd.to_datetime(pd.Series(ts), unit="s")}
    )
    emitted = set()
    for out in f((7,), iter([pdf]), state):
        emitted.update(out["event_id"].tolist())
    want_all = _model_jumps(ts, timeout)
    assert emitted <= want_all, "kernel emitted a non-jump"
    ready = [i for i, t in enumerate(ts) if t <= wm_s]
    # every decided gap-jump among released events must have emitted
    for i in range(len(ready) - 1):
        a, b = ready[i], ready[i + 1]
        if ts[b] - ts[a] > timeout:
            assert a in emitted
    # accounting: nothing lost
    if state.exists:
        stage_pend = {state.value[0]} if state.value[0] is not None else set()
        buffered = set(state.value[2])
    else:
        stage_pend, buffered = set(), set()
    decided_nonjump = set(range(len(ts))) - want_all
    assert emitted | stage_pend | buffered | decided_nonjump == set(range(len(ts)))


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


# --- SCD2 property test: random change streams vs a brute-force model ---


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # key
            st.sampled_from(["insert", "update", "delete"]),
            st.integers(min_value=0, max_value=100),     # ts (may collide)
        ),
        min_size=1,
        max_size=15,
    ),
)
@settings(max_examples=25, deadline=None)
def test_scd2_matches_model(spark_global, events):
    """scd2_history vs a brute-force model: for each key, sort events by
    (ts, seq); non-delete event i opens a version closed by the next event's
    ts; version numbers count non-delete events; is_current = open and not
    followed by anything."""
    from flink_210225_spark.operators.router import scd2_history

    # de-dup (key, ts) collisions: window order must be deterministic for
    # the comparison, so keep the first occurrence per (key, ts)
    seen, rows = set(), []
    for k, typ, ts in events:
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        rows.append((k, typ, ts, f"v{len(rows)}"))
    df = spark_global.createDataFrame(rows, "key long, type string, ts long, val string")
    got = {
        (r.key, r.version): (r.val, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, ["key"], "ts").collect()
    }

    want = {}
    by_key: dict[int, list] = {}
    for k, typ, ts, val in rows:
        by_key.setdefault(k, []).append((ts, typ, val))
    for k, evs in by_key.items():
        evs.sort(key=lambda e: e[0])
        version = 0
        for i, (ts, typ, val) in enumerate(evs):
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            if typ == "delete":
                continue
            version += 1
            want[(k, version)] = (val, ts, nxt, nxt is None)
    assert got == want


# --- chunk_windows property test ---


@given(
    n_tokens=st.integers(min_value=1, max_value=300),
    size=st.integers(min_value=2, max_value=60),
    stride_frac=st.floats(min_value=0.2, max_value=1.0),
)
@settings(max_examples=25, deadline=None)
def test_chunk_windows_invariants(spark_global, n_tokens, size, stride_frac):
    """For any (doc length, chunk size, stride ≤ size): chunks start every
    `stride`, every token is covered, the reconstruction of the doc from
    non-overlapping chunk parts is exact, and the final chunk reaches the
    last token."""
    from flink_210225_spark.ops.text import chunk_windows

    stride = max(1, int(size * stride_frac))
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark_global.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_windows({"documents": df}, size=size, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert chunks[0].start_tok == 0
    for i, c in enumerate(chunks):
        assert c.start_tok == i * stride
        assert c.chunk_len == min(size, n_tokens - c.start_tok)
        assert c.chunk_len >= 1
        assert len(c.chunk_text.split()) == c.chunk_len
    last = chunks[-1]
    assert last.start_tok + last.chunk_len == n_tokens  # tail reached
    if len(chunks) > 1:  # penultimate chunk must not already cover the tail
        prev = chunks[-2]
        assert prev.start_tok + size < n_tokens or last.start_tok + size >= n_tokens
    covered = set()
    for c in chunks:
        covered.update(range(c.start_tok, c.start_tok + c.chunk_len))
    assert covered == set(range(n_tokens))


# --- prefix-filter lossless-pruning property test ---


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=9), min_size=3, max_size=25),
        min_size=2,
        max_size=8,
    ),
)
@settings(max_examples=10, deadline=None)
def test_prefix_filter_lossless_on_random_docs(spark_global, docs):
    """On random token sequences over a tiny alphabet (maximal shingle
    collisions — the prefix theorem's stress zone), prefix filtering must
    emit exactly the quadratic baseline's pairs."""
    from flink_210225_spark.ops.dedup import ngram_jaccard_pairs, prefix_filter_pairs

    rows = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark_global.createDataFrame(rows, "doc_id long, text string")
    t = {"documents": df}
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(t).collect()}
    pref = {(r.doc_a, r.doc_b): r.jaccard for r in prefix_filter_pairs(t).collect()}
    assert pref == exact


# --- last-touch attribution property test ---


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user
            st.integers(min_value=0, max_value=50),  # ts seconds (ties likely)
            st.sampled_from(["view", "purchase", "click"]),
        ),
        min_size=1,
        max_size=30,
    ),
)
@settings(max_examples=20, deadline=None)
def test_attribution_matches_bruteforce(spark_global, events):
    """Random interleaved timelines: running-last window == brute-force
    'latest view at-or-before by (ts, event_id)' credit."""
    from datetime import datetime, timezone

    from flink_210225_spark.operators.sessions import last_touch_attribution

    rows = [
        (i, datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None), u, k, 0.0, "{}")
        for i, (u, t, k) in enumerate(events)
    ]
    df = spark_global.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r.conversion_id: (r.touch_event_id, r.lag_sec)
        for r in last_touch_attribution({"events": df}).collect()
    }
    want = {}
    for i, (u, t, k) in enumerate(events):
        if k != "purchase":
            continue
        cands = [
            (tv, j) for j, (uv, tv, kv) in enumerate(events)
            if kv == "view" and uv == u and (tv, j) <= (t, i)
        ]
        if cands:
            tv, j = max(cands)
            want[i] = (j, t - tv)
        else:
            want[i] = (None, None)
    assert got == want


# --- rolling active users property test ---


@given(
    activity=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),   # user
            st.integers(min_value=1, max_value=20),  # day of month
        ),
        min_size=1,
        max_size=40,
    ),
)
@settings(max_examples=20, deadline=None)
def test_rolling_active_matches_bruteforce(spark_global, activity):
    from datetime import datetime

    from flink_210225_spark.operators.windows import rolling_active_users

    rows = [
        (i, datetime(2021, 1, d, 12), u, "view", 0.0, "{}")
        for i, (u, d) in enumerate(activity)
    ]
    df = spark_global.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.as_of: r.active_users for r in rolling_active_users({"events": df}).collect()}
    days = sorted({d for _, d in activity})
    max_day = days[-1]
    want = {}
    for d in range(days[0], max_day + 1):
        users = {u for u, ad in activity if d - 6 <= ad <= d}
        if users:
            want[f"2021-01-{d:02d}"] = len(users)
    assert got == want


# --- pattern-matcher property test vs an independent recursive model ---


@given(
    seq=st.lists(st.sampled_from(["a", "b", "c", "x"]), min_size=1, max_size=30),
    gaps=st.lists(st.integers(min_value=1, max_value=400), min_size=30, max_size=30),
    within=st.integers(min_value=50, max_value=2000),
)
@settings(max_examples=25, deadline=None)
def test_pattern_kernel_matches_recursive_model(seq, gaps, within):
    """The greedy kernel vs an independent recursive definition: scan left
    to right; when stalled-out-of-window, the current event re-seeds; a
    completed match consumes its span."""
    from flink_210225_spark.operators.stateful import match_pattern_kernel

    ts = []
    t = 0
    for g in gaps[: len(seq)]:
        ts.append(t)
        t += g
    rows = [(i, typ, ts[i] * 1_000_000) for i, typ in enumerate(seq)]
    got, _ = match_pattern_kernel(rows, ("a", "b", "c"), within * 1_000_000)

    def model(rows):
        # structurally independent formulation (index-based two-level scan,
        # vs the kernel's single-pass stage machine): find the next 'a',
        # walk forward taking the first 'b' then the first 'c' inside the
        # window; on completion resume AFTER the 'c'; on falling out of the
        # window resume AT the stalling event (it may itself re-seed)
        w_us = within * 1_000_000
        out = []
        i, n = 0, len(rows)
        while i < n:
            if rows[i][1] != "a":
                i += 1
                continue
            s_ts = rows[i][2]
            stage, j, done, stall = 1, i + 1, None, None
            while j < n:
                if rows[j][2] - s_ts > w_us:
                    stall = j
                    break
                if rows[j][1] == ("a", "b", "c")[stage]:
                    if stage == 2:
                        done = j
                        break
                    stage += 1
                j += 1
            if done is not None:
                out.append((rows[i][0], rows[done][0]))
                i = done + 1
            elif stall is not None:
                i = stall
            else:
                break
        return out

    assert got == model(rows)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),   # ts seconds
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=30,
    ),
    window=st.integers(min_value=1, max_value=400),
)
@settings(max_examples=25, deadline=None)
def test_funnel_windowed_matches_bruteforce_model(spark_global, events, window):
    """Property: the greedy latest-start DP equals the O(n^3) existence
    definition — exists e1 < e2 < e3 (by (ts, event_id)) of the step types
    with e3.ts - e1.ts <= window — on arbitrary event soups."""
    from datetime import datetime, timezone

    from flink_210225_spark.operators.sessions import funnel_windowed

    rows = [
        (i, 9, datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None),
         et, 0.0, "{}")
        for i, (t, et) in enumerate(events)
    ]
    ev = spark_global.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, event_type string, "
        "value double, props string",
    )
    got = {r.stage: r.users for r in
           funnel_windowed({"events": ev}, window_sec=window).collect()}

    # brute-force model over (ts, event_id)-ordered tuples
    evs = sorted(
        [(t, i, et) for i, (t, et) in enumerate(events)], key=lambda e: (e[0], e[1])
    )
    steps = ("view", "click", "purchase")
    depth = 0
    n = len(evs)
    for a in range(n):
        if evs[a][2] == steps[0]:
            depth = max(depth, 1)
            for b in range(a + 1, n):
                if evs[b][2] == steps[1] and evs[b][0] - evs[a][0] <= window:
                    depth = max(depth, 2)
                    for c in range(b + 1, n):
                        if (evs[c][2] == steps[2]
                                and evs[c][0] - evs[a][0] <= window):
                            depth = max(depth, 3)
    want = {k: (1 if depth >= k + 1 else 0) for k in range(3)}
    assert got == want, (events, window, depth)
