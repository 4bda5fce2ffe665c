"""Property/model tests for the round-4 third-session operators — the
pytest layer UNDER the driver oracle gates: each test checks an invariant
an oracle hash can't see (model parity on random inputs, structural
invariants, contract edges)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# --- interval overlap: bucketed equi-join == brute force on random sets ---


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(1, 7)),
        min_size=0,
        max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(1, 7)),
        min_size=0,
        max_size=30,
    ),
)
def test_interval_overlap_bucketing_model(a_iv, b_iv):
    """The ±1-bucket candidate rule finds EVERY overlapping pair exactly
    once (the correctness core of join_interval_overlap, in pure Python:
    spans ≤ 7 days, bucket = 8 days)."""
    W = 8
    brute = {
        (i, j)
        for i, (sa, da) in enumerate(a_iv)
        for j, (sb, db) in enumerate(b_iv)
        if sa <= sb + db and sb <= sa + da
    }
    bucketed = set()
    for i, (sa, da) in enumerate(a_iv):
        for off in (-1, 0, 1):
            k = sa // W + off
            for j, (sb, db) in enumerate(b_iv):
                if sb // W == k and sa <= sb + db and sb <= sa + da:
                    bucketed.add((i, j))
    assert bucketed == brute


# --- k-core: fixed-round peel reaches the true core on small graphs ---


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=40,
    ),
    st.integers(2, 3),
)
def test_kcore_peel_model(edge_list, k):
    """8 synchronous peel rounds == peel-to-fixpoint on graphs this small
    (and the surviving subgraph really is a k-core: every node keeps
    degree ≥ k inside it)."""
    edges = {(min(u, v), max(u, v)) for u, v in edge_list if u != v}

    def peel(rounds):
        e = set(edges)
        for _ in range(rounds):
            deg: dict[int, int] = {}
            for u, v in e:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            alive = {n for n, d in deg.items() if d >= k}
            e = {(u, v) for u, v in e if u in alive and v in alive}
        return e

    fixed = peel(8)
    # fixpoint: keep peeling until stable
    prev, cur = None, fixed
    while prev != cur:
        prev = cur
        deg: dict[int, int] = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        cur = {(u, v) for u, v in cur if u in alive and v in alive}
    assert fixed == cur
    deg: dict[int, int] = {}
    for u, v in fixed:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert all(d >= k for d in deg.values())


# --- Holt-Winters: Spark fold == pure-Python recurrence ---


def test_holt_winters_python_model(tables):
    from flink_210225_spark.operators.windows import holt_winters_daily

    got = {
        (r["event_type"], r["day"]): r
        for r in holt_winters_daily(tables).collect()
    }
    daily = (
        tables["events"]
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(daily, key=lambda r: (r["event_type"], r["day"])):
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    r4 = lambda v: np.floor(v * 10000 + 0.5) / 10000  # noqa: E731
    for et, pts in series.items():
        l = b = s = 0.0
        sl = [0.0] * 7
        for i, (day, x) in enumerate(pts):
            if i == 0:
                l, b, s = float(x), 0.0, 0.0
            else:
                sprev = sl[0]
                lnew = 0.5 * (x - sprev) + 0.5 * (l + b)
                bnew = 0.25 * (lnew - l) + 0.75 * b
                s = 0.25 * (x - lnew) + 0.75 * sprev
                sl = sl[1:] + [s]
                l, b = lnew, bnew
            row = got[(et, day)]
            assert row["level"] == r4(l), (et, day)
            assert row["trend"] == r4(b), (et, day)
            assert row["seasonal"] == r4(s), (et, day)
            assert row["forecast"] == r4(l + b + sl[0]), (et, day)


# --- wHash: encoding-invariance + Haar DC anchor ---


def test_whash_filter_invariance_and_dc(tables):
    from flink_210225_spark.ops.multimodal import image_whash_groups

    rows = image_whash_groups(tables).collect()
    by_seed: dict[int, set] = {}
    for r in rows:
        by_seed.setdefault(r["asset_id"] % 16, set()).add(r["whash"])
    # every seed group collapses to ONE hash across all 5 scanline filters
    assert all(len(hs) == 1 for hs in by_seed.values())
    # DC coefficient == total pixel sum (H·M·Hᵀ [0,0] is the full sum)
    for r in rows[:20]:
        seed = r["asset_id"] % 16
        w = 8 + 4 * (seed % 5)
        h = 8 + 4 * ((seed * 3) % 4)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        px = (seed * 7 + 3 * x + 11 * y) % 256
        assert r["dc"] == int(px.sum())


# --- Haitsma-Kalker: bit definition replayed in numpy ---


def test_audio_fingerprint_model(tables):
    from flink_210225_spark.ops.multimodal import audio_fingerprint

    got = {
        (r["asset_id"], r["frame_idx"]): r["word"]
        for r in audio_fingerprint(tables).collect()
    }
    docs = tables["documents"].select("doc_id", "n_chars").collect()
    checked = 0
    for r in docs[:50]:
        doc_id, n = r["doc_id"], r["n_chars"] % 200 + 50
        k = np.arange(n)
        s = (((doc_id * 31 + k * 7) % 256) - 128) * 256
        nf = n // 32
        if nf < 2:
            continue
        e = (s[: nf * 32].reshape(nf, 4, 8).astype(np.int64) ** 2).sum(axis=2)
        d = e[:, :3] - e[:, 1:]
        words = (((d[1:] - d[:-1] > 0).astype(int)) << np.arange(3)).sum(axis=1)
        for f, wd in enumerate(words, start=1):
            assert got[(doc_id, f)] == int(wd)
            checked += 1
    assert checked > 0


# --- IVM: delta-merge equals brute-force recompute (already the oracle,
#     here the EDGE: a group deleted to zero stays reported) ---


def test_ivm_zeroed_groups_reported(tables):
    from flink_210225_spark.operators.warehouse import ivm_incremental_agg

    out = ivm_incremental_agg(tables)
    # every touched group reports; new_ct == 0 rows are legal and non-neg
    assert out.filter(F.col("new_ct") < 0).count() == 0
    assert out.filter(F.col("old_ct") < 0).count() == 0


# --- stupid backoff: every tier really occurs, scores are finite ---


def test_stupid_backoff_tiers(tables):
    from flink_210225_spark.ops.text import stupid_backoff_score

    agg = stupid_backoff_score(tables).agg(
        F.sum("n_tri_hits").alias("t3"),
        F.sum("n_bi_backoffs").alias("t2"),
        F.sum("n_uni_backoffs").alias("t1"),
        F.max(F.isnan("avg_logscore").cast("int")).alias("nan"),
    ).collect()[0]
    assert agg["t3"] > 0 and agg["t2"] > 0
    assert agg["nan"] == 0


# --- weak labels: resolution rule model check on the fixture ---


def test_weak_labels_majority_rule(tables):
    from flink_210225_spark.ops.text import weak_labels

    rows = weak_labels(tables).collect()
    for r in rows:
        votes = {
            "analytics": r["v_analytics"],
            "storage": r["v_storage"],
            "streaming": r["v_streaming"],
        }
        if max(votes.values()) == 0:
            assert r["label"] == "abstain"
        else:
            best = max(votes.values())
            expect = min(k for k, v in votes.items() if v == best)
            assert r["label"] == expect
        assert r["conflict"] == (sum(1 for v in votes.values() if v > 0) >= 2)


# --- bloom prefilter: the sieve narrows the fact side but never the rows ---


def test_bloom_prefilter_matches_plain_join(tables):
    from flink_210225_spark.operators.joins import bloom_prefilter_join

    got = {
        r["ship_month"]: (r["n_items"], r["revenue"])
        for r in bloom_prefilter_join(tables).collect()
    }
    li, o, c, n = (
        tables["lineitem"],
        tables["orders"],
        tables["customer"],
        tables["nation"],
    )
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == "NATION_7")
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("m"))
        .agg(F.count("*").alias("ct"))
        .collect()
    )
    assert {r["m"]: r["ct"] for r in plain} == {
        m: v[0] for m, v in got.items()
    }


# --- jsonl dirty source: corrupt count is exactly the %7 cohort ---


def test_jsonl_dirty_counts(tables):
    from flink_210225_spark.sources.jsonl import jsonl_dirty_counts

    rows = {r["event_type"]: r for r in jsonl_dirty_counts(tables).collect()}
    n_corrupt = tables["events"].filter(F.col("event_id") % 7 == 0).count()
    n_total = tables["events"].count()
    assert rows["__corrupt__"]["n_rows"] == n_corrupt
    assert rows["__corrupt__"]["value_cents"] == 0
    assert sum(r["n_rows"] for r in rows.values()) == n_total


# --- weighted median UDAF: numpy model parity ---


def test_weighted_median_model(tables):
    from flink_210225_spark.operators.serving import weighted_median_prices

    got = {
        r["priority"]: r["wmedian_price"]
        for r in weighted_median_prices(tables).collect()
    }
    rows = (
        tables["lineitem"]
        .join(
            tables["orders"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_orderpriority", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        c = int(np.floor(r["l_extendedprice"] * 100 + 0.5))
        q = int(np.floor(r["l_quantity"]))
        groups.setdefault(r["o_orderpriority"], []).append((c, q))
    for pri, pairs in groups.items():
        pairs.sort()
        tot = sum(q for _, q in pairs)
        cum = 0
        for c, q in pairs:
            cum += q
            if 2 * cum >= tot:
                assert got[pri] == c / 100.0, pri
                break


# --- autocorrelation: numpy corrcoef parity ---


def test_autocorr_numpy_model(tables):
    from flink_210225_spark.operators.windows import autocorr_daily

    got = {
        (r["event_type"], r["lag"]): r["autocorr"]
        for r in autocorr_daily(tables).collect()
    }
    daily = (
        tables["events"]
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(daily, key=lambda r: (r["event_type"], r["day"])):
        series.setdefault(r["event_type"], []).append(r["x"])
    for et, xs in series.items():
        for k in (1, 7):
            if len(xs) <= k:
                continue
            a = np.array(xs[k:], dtype=float)
            b = np.array(xs[:-k], dtype=float)
            if a.std() == 0 or b.std() == 0:
                assert got[(et, k)] is None
                continue
            r = float(np.corrcoef(a, b)[0, 1])
            assert abs(got[(et, k)] - r) < 2e-4, (et, k)


# --- nearest as-of: brute-force parity ---


def test_asof_nearest_brute_force(tables):
    from flink_210225_spark.operators.joins import asof_join_nearest

    got = {
        r["event_id"]: (r["direction"], r["view_id"], r["dt_us"])
        for r in asof_join_nearest(tables).collect()
    }
    ev = tables["events"].select("event_id", "user_id", "ts", "event_type").collect()
    views: dict[int, list] = {}
    for r in ev:
        if r["event_type"] == "view":
            views.setdefault(r["user_id"], []).append(r)
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        vs = views.get(r["user_id"], [])
        prev = [v for v in vs if v["ts"] <= r["ts"]]
        nxt = [v for v in vs if v["ts"] >= r["ts"]]
        direction, _vid, dt = got[r["event_id"]]
        if not prev and not nxt:
            assert direction == "none" and dt is None
            continue
        dp = (
            min((r["ts"] - v["ts"] for v in prev), default=None)
            if prev
            else None
        )
        dn = (
            min((v["ts"] - r["ts"] for v in nxt), default=None)
            if nxt
            else None
        )
        us = lambda td: (  # noqa: E731  exact; total_seconds() floats drift
            td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
        )
        if dp is not None and (dn is None or dp <= dn):
            assert direction == "prev"
            assert dt == us(dp)
        else:
            assert direction == "next"
            assert dt == us(dn)


# --- pivot roundtrip: inverse property vs plain long-form agg ---


def test_pivot_roundtrip_is_identity(tables):
    from flink_210225_spark.operators.serving import pivot_roundtrip

    got = {
        (r["month"], r["status"]): r["revenue"]
        for r in pivot_roundtrip(tables).collect()
    }
    plain = (
        tables["orders"]
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
                / 100.0
            ).alias("rev")
        )
        .collect()
    )
    assert got == {(r["m"], r["s"]): r["rev"] for r in plain}


# --- winsorize: clip accounting sanity ---


def test_winsorize_bounds(tables):
    from flink_210225_spark.ops.sampling import winsorize_values

    rows = winsorize_values(tables).collect()
    n_total = tables["events"].count()
    assert sum(r["n_events"] for r in rows) == n_total
    # ~1% clipped each side globally (interpolated thresholds, so ±1)
    lo = sum(r["n_clip_lo"] for r in rows)
    hi = sum(r["n_clip_hi"] for r in rows)
    assert 0 < lo <= n_total * 0.011 + 1
    assert 0 < hi <= n_total * 0.011 + 1
    for r in rows:
        assert r["mean_winsorized"] <= r["mean_raw"] or r["n_clip_hi"] == 0


# --- JS divergence: bounds + self-consistency ---


def test_js_divergence_bounds(tables):
    from flink_210225_spark.ops.text import js_divergence_by_source

    rows = js_divergence_by_source(tables).collect()
    ln2 = float(np.log(2.0))
    for r in rows:
        assert -1e-9 <= r["js_div"] <= ln2 + 1e-9, r
        assert 0 < r["vocab_coverage"] <= 1.0 + 1e-9
