"""Round-7 second-session semantic battery — third-implementation replays
for the new kernels (Kruskal–Wallis, winnowing fingerprints, VARIANT
extraction), per the round-6 lesson: both engines can share a wrong
definition, so every new family gets a check the cross-engine hash gate
cannot provide."""

import hashlib
import json

import numpy as np
import pandas as pd


def _orders_pd():
    import duckdb

    return duckdb.sql(
        "SELECT o_orderpriority, o_totalprice"
        " FROM '/root/testdata/sf0.001/orders.parquet'"
    ).df()


def _docs_pd():
    import duckdb

    return duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()


def _events_pd():
    import duckdb

    return duckdb.sql(
        "SELECT event_type, props FROM '/root/testdata/sf0.001/events.parquet'"
    ).df()


# ---------------------------------------------------------------- kruskal


def _kw_replay():
    """Textbook scipy-style Kruskal–Wallis on exact cents: rank with
    average ties over the pooled sample, H from group rank sums, tie
    correction from the tie spectrum."""
    o = _orders_pd()
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    grp = o["o_orderpriority"].to_numpy()
    order = np.argsort(cents, kind="stable")
    ranks = np.empty(len(cents), dtype=np.float64)
    sc = cents[order]
    i = 0
    while i < len(sc):
        j = i
        while j < len(sc) and sc[j] == sc[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    n = len(cents)
    h = 0.0
    for g in np.unique(grp):
        m = grp == g
        h += ranks[m].sum() ** 2 / m.sum()
    h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
    _, t = np.unique(cents, return_counts=True)
    corr = 1.0 - (t**3 - t).sum() / (n**3 - n)
    return n, len(np.unique(grp)), int((t > 1).sum()), h, h / corr


def test_kruskal_wallis_pure_numpy_replay(tables):
    from flink_210225_spark.operators.serving import kruskal_wallis

    row = kruskal_wallis(tables).collect()[0]
    n, n_groups, tie_values, h, h_adj = _kw_replay()
    assert row["n"] == n
    assert row["n_groups"] == n_groups
    assert row["tie_values"] == tie_values
    assert abs(row["h"] - h) < 1e-6
    assert abs(row["h_adj"] - h_adj) < 1e-6


def test_kruskal_wallis_adjusted_not_smaller(tables):
    """Tie correction divides by C ≤ 1, so H_adj ≥ H always."""
    from flink_210225_spark.operators.serving import kruskal_wallis

    row = kruskal_wallis(tables).collect()[0]
    assert row["h_adj"] >= row["h"]


# -------------------------------------------------------------- winnowing


def _gram_hash(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _winnow_doc(text: str, k: int = 3, w: int = 4):
    toks = text.strip().split()
    if len(toks) < k:
        return None
    hs = [_gram_hash(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    wl = min(w, len(hs))
    pos = set()
    for i in range(len(hs) - wl + 1):
        win = hs[i : i + wl]
        mn = min(win)
        # rightmost occurrence of the min
        j = max(idx for idx, v in enumerate(win) if v == mn)
        pos.add(i + j)
    fps = {hs[p] for p in pos}
    return {
        "n_grams": len(hs),
        "n_windows": len(hs) - wl + 1,
        "n_selected": len(pos),
        "fps": fps,
    }


def test_winnowing_pure_python_replay(tables):
    """Full third implementation over every fixture doc: hashlib md5
    grams, explicit rightmost-min loop, set-based sharing counts."""
    from flink_210225_spark.ops.dedup import winnowing_fingerprints

    got = {r["doc_id"]: r for r in winnowing_fingerprints(tables).collect()}
    docs = _docs_pd()
    expect = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        r = _winnow_doc(text)
        if r is not None:
            expect[doc_id] = r
    assert set(got) == set(expect)
    fp_docs = {}
    for doc_id, r in expect.items():
        for f in r["fps"]:
            fp_docs.setdefault(f, set()).add(doc_id)
    for doc_id, r in expect.items():
        row = got[doc_id]
        assert row["n_grams"] == r["n_grams"]
        assert row["n_windows"] == r["n_windows"]
        assert row["n_selected"] == r["n_selected"]
        assert row["n_fps"] == len(r["fps"])
        shared = sum(1 for f in r["fps"] if len(fp_docs[f]) >= 2)
        assert row["n_shared_fps"] == shared


def test_winnowing_density_bound(tables):
    """The paper's selection bound: at most one NEW fingerprint per
    window, at least one fingerprint per document."""
    from flink_210225_spark.ops.dedup import winnowing_fingerprints

    for r in winnowing_fingerprints(tables).collect():
        assert 1 <= r["n_selected"] <= r["n_windows"]
        assert r["n_fps"] <= r["n_selected"]


def test_winnowing_guarantee_constructed_positive(spark):
    """Two docs sharing a run of w+k-1 = 6 tokens MUST share at least one
    fingerprint (the winnowing guarantee); two docs with disjoint token
    sets share none."""
    from flink_210225_spark.ops.dedup import winnowing_fingerprints

    shared_run = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared_run} four five six"),
            (2, f"seven eight {shared_run} nine ten eleven twelve"),
            (3, "completely different words in this document here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in winnowing_fingerprints({"documents": docs}).collect()
    }
    assert out[1]["n_shared_fps"] >= 1
    assert out[2]["n_shared_fps"] >= 1
    assert out[3]["n_shared_fps"] == 0


# ---------------------------------------------------------------- variant


def test_variant_extract_json_replay(tables):
    """Replay the VARIANT path extraction with python json.loads."""
    from flink_210225_spark.streaming.sql_jobs import _variant_sql_q

    got = {r["event_type"]: r for r in _variant_sql_q(tables).collect()}
    ev = _events_pd()
    ks = ev["props"].map(lambda p: json.loads(p)["k"])
    by = pd.DataFrame({"et": ev["event_type"], "k": ks}).groupby("et")
    for et, g in by:
        row = got[et]
        assert row["n"] == len(g)
        assert row["k_sum"] == g["k"].sum()
        assert row["k_min"] == g["k"].min()
        assert row["k_max"] == g["k"].max()
        assert row["k_low"] == int((g["k"] < 50).sum())
        assert row["n_missing"] == len(g)  # '$.missing' absent on every row


# ----------------------------------------------------- cross-correlation


def test_cross_correlation_pandas_replay(tables):
    """Replay each lag's Pearson r with pandas/numpy over exact ints."""
    import duckdb

    from flink_210225_spark.operators.windows import cross_correlation

    got = {r["lag"]: r for r in cross_correlation(tables).collect()}
    ev = duckdb.sql(
        "SELECT ts::DATE AS day, event_type, value"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).df()
    x = ev[ev.event_type == "click"].groupby("day").size()
    y = (
        ev[ev.event_type == "purchase"]
        .assign(c=lambda d: np.floor(d.value * 100 + 0.5).astype(np.int64))
        .groupby("day")["c"]
        .sum()
    )
    for lag in range(-3, 4):
        ys = y.copy()
        ys.index = ys.index - pd.Timedelta(days=lag)
        j = pd.concat([x, ys], axis=1, join="inner").dropna()
        row = got[lag]
        assert row["n_days"] == len(j)
        r = np.corrcoef(j.iloc[:, 0], j.iloc[:, 1])[0, 1]
        assert abs(row["r"] - r) < 1e-5
        assert -1.0 <= row["r"] <= 1.0


# ----------------------------------------------------------- lateral join


def test_lateral_join_topn_replay(tables):
    """The decorrelated LATERAL must equal a pandas nlargest-per-group."""
    import duckdb

    from flink_210225_spark.streaming.sql_jobs import _lateral_join_sql_q

    out = _lateral_join_sql_q(tables).collect()
    cust = duckdb.sql(
        "SELECT c_nationkey, c_name, floor(c_acctbal*100+0.5)::BIGINT AS cents"
        " FROM '/root/testdata/sf0.001/customer.parquet'"
    ).df()
    nat = duckdb.sql(
        "SELECT n_nationkey, n_name FROM '/root/testdata/sf0.001/nation.parquet'"
    ).df()
    expect = set()
    for nk, g in cust.groupby("c_nationkey"):
        top = g.sort_values(["cents", "c_name"], ascending=[False, True]).head(3)
        nname = nat[nat.n_nationkey == nk]["n_name"].iloc[0]
        for _, r in top.iterrows():
            expect.add((nname, r["c_name"], int(r["cents"])))
    got = {(r["nation"], r["c_name"], r["acctbal_cents"]) for r in out}
    assert got == expect
    assert len(out) == len(got)  # no duplicate rows from decorrelation


# ------------------------------------------------------------ good-turing


def test_good_turing_counter_replay(tables):
    """collections.Counter third implementation of the bigram spectrum."""
    from collections import Counter

    from flink_210225_spark.ops.text import good_turing

    got = {r["r"]: r for r in good_turing(tables).collect()}
    docs = _docs_pd()
    bigrams = Counter()
    for text in docs["text"]:
        toks = text.strip().split()
        bigrams.update(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
    n = sum(bigrams.values())
    spectrum = Counter(bigrams.values())
    for r, row in got.items():
        if r == 0:
            assert row["n_types"] == spectrum.get(1, 0)
            assert row["mass_micro"] == np.floor(
                spectrum.get(1, 0) / n * 1e6 + 0.5
            )
            assert row["r_star"] is None
            continue
        assert r <= 10
        assert row["n_types"] == spectrum[r]
        assert row["mass_micro"] == np.floor(r * spectrum[r] / n * 1e6 + 0.5)
        if spectrum.get(r + 1):
            assert (
                abs(row["r_star"] - (r + 1) * spectrum[r + 1] / spectrum[r])
                < 1e-6
            )
        else:
            assert row["r_star"] is None
    # every populated band <= 10 must be present
    for r in [r for r in spectrum if r <= 10]:
        assert r in got


# --------------------------------------------------- benjamini-hochberg


def test_benjamini_hochberg_pure_python_replay(tables):
    """Third implementation: exact counts from pandas, logistic-Phi
    p-values, textbook step-up loop."""
    import math

    import duckdb

    from flink_210225_spark.operators.serving import benjamini_hochberg

    got = {r["brand"]: r for r in benjamini_hochberg(tables).collect()}
    li = duckdb.sql(
        "SELECT p_brand AS brand, l_returnflag FROM"
        " '/root/testdata/sf0.001/lineitem.parquet' l JOIN"
        " '/root/testdata/sf0.001/part.parquet' p ON l_partkey = p_partkey"
    ).df()
    p0 = (li.l_returnflag == "R").mean()
    rows = []
    for brand, g in li.groupby("brand"):
        n, k = len(g), int((g.l_returnflag == "R").sum())
        z = (k / n - p0) / math.sqrt(p0 * (1 - p0) / n)
        p = 2.0 / (1.0 + math.exp(1.702 * abs(z)))
        rows.append((brand, n, k, int(math.floor(p * 1e6 + 0.5))))
    rows.sort(key=lambda r: (r[3], r[0]))
    m = len(rows)
    k_star = 0
    for i, (_, _, _, pm) in enumerate(rows, 1):
        if pm <= math.floor(i * 100000 / m + 0.5):
            k_star = i
    for i, (brand, n, k, pm) in enumerate(rows, 1):
        row = got[brand]
        assert (row["n"], row["k"], row["p_micro"], row["rank"]) == (n, k, pm, i)
        assert row["discovered"] == (i <= k_star)


def test_benjamini_hochberg_stepup_shape(tables):
    """Discoveries are a PREFIX of the p-sorted ranks (step-up), and any
    rank past the frontier with p above threshold is not discovered."""
    from flink_210225_spark.operators.serving import benjamini_hochberg

    rows = sorted(
        benjamini_hochberg(tables).collect(), key=lambda r: r["rank"]
    )
    flags = [r["discovered"] for r in rows]
    assert flags == sorted(flags, reverse=True)


# ------------------------------------------------------ anti interval join


def test_anti_followup_pandas_replay(tables):
    """Replay the NOT-EXISTS interval anti join with a pandas loop."""
    import duckdb

    from flink_210225_spark.operators.joins import anti_followup_join

    got = {r["day"]: r for r in anti_followup_join(tables).collect()}
    ev = duckdb.sql(
        "SELECT event_id, user_id, ts, event_type"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).df()
    v = ev[ev.event_type == "view"]
    b = ev[ev.event_type == "purchase"]
    by_user = {u: g["ts"].to_numpy() for u, g in b.groupby("user_id")}
    lim = np.timedelta64(30 * 60 * 1_000_000, "us")
    n_views, n_ab = {}, {}
    for _, r in v.iterrows():
        day = str(r["ts"].date())
        n_views[day] = n_views.get(day, 0) + 1
        bs = by_user.get(r["user_id"])
        ts = np.datetime64(r["ts"])
        followed = bs is not None and bool(
            ((bs > ts) & (bs <= ts + lim)).any()
        )
        if not followed:
            n_ab[day] = n_ab.get(day, 0) + 1
    assert set(got) == set(n_views)
    for day in n_views:
        assert got[day]["n_views"] == n_views[day]
        assert got[day]["n_abandoned"] == n_ab.get(day, 0)


# ------------------------------------------------------- execute immediate


def test_execute_immediate_binds_like_literal(tables):
    """Parameter binding must be value-identical to literal text."""
    from flink_210225_spark.streaming.sql_jobs import _execute_immediate_sql_q

    got = {
        (r["status"], r["priority"]): (r["n"], r["cents"])
        for r in _execute_immediate_sql_q(tables).collect()
    }
    o = _orders_pd_full()
    sel = o[o.o_totalprice > 150000.0]
    cents = np.floor(sel.o_totalprice * 100 + 0.5).astype(np.int64)
    g = sel.assign(cents=cents).groupby(["o_orderstatus", "o_orderpriority"])
    assert len(got) == len(g)
    for (st, pr), gg in g:
        assert got[(st, pr)] == (len(gg), gg["cents"].sum())


def _orders_pd_full():
    import duckdb

    return duckdb.sql(
        "SELECT o_orderstatus, o_orderpriority, o_totalprice"
        " FROM '/root/testdata/sf0.001/orders.parquet'"
    ).df()


# ---------------------------------------------------------- burrows delta


def test_burrows_delta_numpy_replay(tables):
    """Full third implementation: Counter-based counts, numpy moments,
    explicit z-score / delta loops."""
    from collections import Counter

    from flink_210225_spark.ops.text import burrows_delta

    got = {
        (r["src_a"], r["src_b"]): r for r in burrows_delta(tables).collect()
    }
    import duckdb

    docs = duckdb.sql(
        "SELECT source, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    per_src = {}
    overall = Counter()
    for src, text in zip(docs["source"], docs["text"]):
        toks = [t for t in text.strip().split() if t]
        c = per_src.setdefault(src, Counter())
        c.update(toks)
        overall.update(toks)
    top = [
        t for t, _ in sorted(overall.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    ]
    srcs = sorted(per_src)
    f = np.array(
        [
            [per_src[s][t] / sum(per_src[s].values()) for t in top]
            for s in srcs
        ]
    )
    mu = f.mean(axis=0)
    sigma = np.sqrt((f * f).mean(axis=0) - mu * mu)
    z = np.where(sigma > 0, (f - mu) / sigma, 0.0)
    for i, a in enumerate(srcs):
        for j, b in enumerate(srcs):
            if a >= b:
                continue
            delta = np.abs(z[i] - z[j]).mean()
            row = got[(a, b)]
            assert row["n_markers"] == 20
            assert abs(row["delta_micro"] - np.floor(delta * 1e6 + 0.5)) <= 1
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2


# ----------------------------------------------------------- pps estimator


def test_pps_estimator_threshold_walk_replay(tables):
    """Replay the systematic PPS design with the LITERAL threshold walk
    (Fraction-exact t_j = (j+1/2)W/n, not the telescoped floor-div) and
    the Hansen-Hurwitz sum."""
    from fractions import Fraction

    import duckdb

    from flink_210225_spark.ops.sampling import pps_estimator

    row = pps_estimator(tables).collect()[0]
    part = duckdb.sql(
        "SELECT p_partkey, p_size, floor(p_retailprice*100+0.5)::BIGINT AS w"
        " FROM '/root/testdata/sf0.001/part.parquet' ORDER BY p_partkey"
    ).df()
    ws = part["w"].to_numpy()
    cum = np.cumsum(ws)
    W, n = int(cum[-1]), 100
    picks = np.zeros(len(ws), dtype=np.int64)
    idx = 0
    for j in range(n):
        t = Fraction(2 * j + 1, 2) * Fraction(W, n)
        while Fraction(int(cum[idx])) < t:
            idx += 1
        picks[idx] += 1
    assert picks.sum() == n
    sampled = picks > 0
    assert row["n_sampled_items"] == int(sampled.sum())
    assert row["n_draws"] == n
    assert row["n_multi_picked"] == int((picks > 1).sum())
    y = part["p_size"].to_numpy()
    est = float((picks[sampled] * y[sampled] * W / ws[sampled]).sum()) / n
    assert row["true_total"] == int(y.sum())
    assert abs(row["estimate_micro"] - np.floor(est * 1e6 + 0.5)) <= 1


# ------------------------------------------------------------------ phash


def _phash_replay(seed: int):
    cf = np.array(
        [[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
        dtype=np.int64,
    )
    w = 8 + 4 * (seed % 5)
    h = 8 + 4 * ((seed * 3) % 4)
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)[:, None]
    px = (seed * 7 + 3 * x + 11 * y) % 256
    m = px.reshape(4, h // 4, 4, w // 4).sum(axis=(1, 3))
    c = np.zeros((4, 4), dtype=np.int64)
    for u in range(4):
        for v in range(4):
            for a in range(4):
                for b in range(4):
                    c[u, v] += cf[u, a] * m[a, b] * cf[v, b]
    flat = c.ravel()
    med = int(np.sort(flat[1:])[7])
    bits = (flat[1:] > med).astype(np.int64)
    return int((bits << np.arange(15)).sum()), int(flat[0])


def test_phash_formula_replay(tables):
    """Pixel-formula third implementation (no PNG codec): explicit
    triple-loop H.264 transform must reproduce every hash through the
    real encode->decode path."""
    from flink_210225_spark.ops.multimodal import image_phash_groups

    got = {r["asset_id"]: r for r in image_phash_groups(tables).collect()}
    for asset_id, row in got.items():
        ph, dc = _phash_replay(asset_id % 16)
        assert row["phash"] == ph
        assert row["dc_sum"] == dc


def test_phash_groups_collapse_by_seed(tables):
    """Docs with equal doc_id%16 MUST share a hash across all five PNG
    filter paths (perceptually-equal-despite-encoding contract)."""
    from flink_210225_spark.ops.multimodal import image_phash_groups

    rows = image_phash_groups(tables).collect()
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r["asset_id"] % 16, set()).add(r["phash"])
    for seed, hashes in by_seed.items():
        assert len(hashes) == 1, f"seed {seed} split into {hashes}"
    # Cross-seed collisions are CORRECT pHash semantics here — the
    # synthetic ramps differ mostly in brightness (DC), which DCT-AC
    # hashing deliberately ignores — so gate the exact collision
    # structure against the formula replay instead of demanding 16
    # distinct values.
    expect_distinct = len({_phash_replay(s)[0] for s in by_seed})
    assert (
        len({next(iter(h)) for h in by_seed.values()}) == expect_distinct
    )
    # brightness DOES differ: dc_sum separates seeds the AC hash merges
    dc_by_seed = {r["asset_id"] % 16: r["dc_sum"] for r in rows}
    assert len(set(dc_by_seed.values())) > len(
        {next(iter(h)) for h in by_seed.values()}
    )


# -------------------------------------------------------------------- zcr


def test_audio_zcr_pure_numpy_replay(tables):
    """Replay sign runs from the PCM formula directly (no WAV codec)."""
    from flink_210225_spark.ops.multimodal import audio_zcr_stats

    got = {r["asset_id"]: r for r in audio_zcr_stats(tables).collect()}
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, n_chars FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    for doc_id, n_chars in zip(docs["doc_id"], docs["n_chars"]):
        n = int(n_chars) % 200 + 50
        k = np.arange(n)
        s = ((doc_id * 31 + k * 7) % 256) - 128
        neg = (s < 0).astype(int)
        crossings = int((neg[1:] != neg[:-1]).sum())
        runs = []
        cur = 1
        for i in range(1, n):
            if neg[i] == neg[i - 1]:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        row = got[doc_id]
        assert row["n_frames"] == n
        assert row["n_crossings"] == crossings
        assert row["n_runs"] == crossings + 1 == len(runs)
        assert row["longest_run"] == max(runs)
        assert row["zcr_micro"] == np.floor(crossings / (n - 1) * 1e6 + 0.5)


# ------------------------------------------------------------- periodogram


def test_periodogram_integer_basis_replay(tables):
    """numpy third implementation with the SAME integer basis, plus the
    float-DFT sanity check: the integer periodogram's relative powers
    must track numpy's float periodogram to the basis quantization."""
    import duckdb

    from flink_210225_spark.operators.windows import (
        _PGRAM_N,
        _pgram_basis,
        periodogram,
    )

    got = {r["k"]: r for r in periodogram(tables).collect()}
    daily = duckdb.sql(
        "SELECT ts::DATE AS day, sum(floor(value*100+0.5)::BIGINT)::BIGINT x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    x = daily["x"].to_numpy()[:_PGRAM_N].astype(object)  # python ints, exact
    xc = _PGRAM_N * x - x.sum()
    basis = {}
    for k, t, c, s in _pgram_basis():
        basis.setdefault(k, [[0] * _PGRAM_N, [0] * _PGRAM_N])
        basis[k][0][t] = c
        basis[k][1][t] = s
    powers = {}
    for k, (cs, ss) in basis.items():
        sc = sum(int(a) * b for a, b in zip(xc, cs))
        si = sum(int(a) * b for a, b in zip(xc, ss))
        powers[k] = sc * sc + si * si
    tot = sum(powers.values())
    peak = max(powers.values())
    for k, p in powers.items():
        row = got[k]
        assert row["power_rel_micro"] == int(np.floor(p / tot * 1e6 + 0.5))
        assert row["is_peak"] == (p == peak)
    # float-DFT agreement: same peak harmonic as numpy's rfft
    xf = np.abs(np.fft.rfft(xc.astype(np.float64)))[1:16] ** 2
    assert int(np.argmax(xf)) + 1 == max(powers, key=powers.get)


# -------------------------------------------------------------------- theil


def test_theil_decomposition_replay(tables):
    """numpy replay of T, T_between, T_within; additivity is exact by
    construction, so also check T >= T_between >= 0."""
    import duckdb

    from flink_210225_spark.operators.serving import theil_index

    row = theil_index(tables).collect()[0]
    j = duckdb.sql(
        "SELECT sum(floor(o_totalprice*100+0.5)::BIGINT)::BIGINT x,"
        " max(c_mktsegment) seg FROM"
        " '/root/testdata/sf0.001/orders.parquet' o JOIN"
        " '/root/testdata/sf0.001/customer.parquet' c"
        " ON o_custkey = c_custkey GROUP BY o_custkey"
    ).df()
    x = j["x"].to_numpy().astype(np.float64)
    n, t = len(x), x.sum()
    r = x * n / t
    T = float((r * np.log(r)).sum() / n)
    tb = 0.0
    for _, g in j.groupby("seg"):
        sg = g["x"].sum() / t
        ng = len(g) / n
        tb += sg * np.log(sg / ng)
    assert row["n_customers"] == n
    assert abs(row["theil_micro"] - np.floor(T * 1e6 + 0.5)) <= 1
    assert abs(row["between_micro"] - np.floor(tb * 1e6 + 0.5)) <= 1
    assert abs(row["within_micro"] - np.floor((T - tb) * 1e6 + 0.5)) <= 1
    assert row["theil_micro"] >= row["between_micro"] >= 0


# --------------------------------------------------------- parquet footer


def test_parquet_metadata_vs_pyarrow_direct(tables):
    """Footer aggregation must equal a direct driver-side pyarrow read."""
    import pyarrow.parquet as pq

    from flink_210225_spark.sources.jsonl import parquet_metadata_audit

    got = {r["col"]: r for r in parquet_metadata_audit(tables).collect()}
    md = pq.ParquetFile("/root/testdata/sf0.001/orders.parquet").metadata
    idx = {
        md.row_group(0).column(i).path_in_schema: i
        for i in range(md.row_group(0).num_columns)
    }
    for col in ("o_orderkey", "o_custkey", "o_totalprice"):
        nv = nc = 0
        mns, mxs = [], []
        for g in range(md.num_row_groups):
            c = md.row_group(g).column(idx[col])
            nv += c.num_values
            nc += c.statistics.null_count
            mns.append(float(c.statistics.min))
            mxs.append(float(c.statistics.max))
        row = got[col]
        assert row["num_values"] == nv
        assert row["null_count"] == nc
        assert row["min_val"] == min(mns)
        assert row["max_val"] == max(mxs)


# ------------------------------------------------------------ snake shards


def test_snake_shards_pure_python_replay(tables):
    """Replay the boustrophedon deal; loads must cover all docs and the
    snake bound must hold: max-min load <= max doc tokens."""
    from flink_210225_spark.ops.sampling import snake_shards

    got = {r["shard"]: r for r in snake_shards(tables).collect()}
    docs = _docs_pd()
    toks = [
        (len(t.strip().split()), did)
        for did, t in zip(docs["doc_id"], docs["text"])
    ]
    toks.sort(key=lambda p: (-p[0], p[1]))
    loads = [0] * 8
    counts = [0] * 8
    checks = [0] * 8
    for r, (n, did) in enumerate(toks):
        pos = r % 8
        shard = pos if (r // 8) % 2 == 0 else 7 - pos
        loads[shard] += n
        counts[shard] += 1
        checks[shard] += did
    for s in range(8):
        assert got[s]["n_docs"] == counts[s]
        assert got[s]["token_load"] == loads[s]
        assert got[s]["doc_id_checksum"] == checks[s]
    assert max(loads) - min(loads) <= max(n for n, _ in toks)


# ------------------------------------------------------------ recall curve


def test_recall_curve_contract(tables):
    """All contract booleans true; floors match the module constants."""
    from flink_210225_spark.ops.similarity import (
        RECALL_CURVE_FLOORS,
        ivf_recall_curve,
    )

    rows = {r["n_probe"]: r for r in ivf_recall_curve(tables).collect()}
    assert set(rows) == set(RECALL_CURVE_FLOORS)
    for np_, r in rows.items():
        assert r["recall_floor"] == RECALL_CURVE_FLOORS[np_]
        assert r["recall_ok"] and r["monotone_ok"] and r["exact_at_full"]
        assert r["n_queries"] == 20


# ------------------------------------------------------------ market share


def test_market_share_pandas_replay(tables):
    """pandas merge-chain third implementation of the Q8 star."""
    import duckdb

    from flink_210225_spark.operators.serving import market_share

    got = {
        (r["o_year"], r["supp_nation"]): r
        for r in market_share(tables).collect()
    }
    sf = "/root/testdata/sf0.001"
    li = duckdb.sql(f"SELECT * FROM '{sf}/lineitem.parquet'").df()
    o = duckdb.sql(f"SELECT * FROM '{sf}/orders.parquet'").df()
    p = duckdb.sql(f"SELECT * FROM '{sf}/part.parquet'").df()
    s = duckdb.sql(f"SELECT * FROM '{sf}/supplier.parquet'").df()
    c = duckdb.sql(f"SELECT * FROM '{sf}/customer.parquet'").df()
    n = duckdb.sql(f"SELECT * FROM '{sf}/nation.parquet'").df()
    r = duckdb.sql(f"SELECT * FROM '{sf}/region.parquet'").df()
    asia = r[r.r_name == "ASIA"].r_regionkey.iloc[0]
    cn = c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
    cust = set(cn[cn.n_regionkey == asia].c_custkey)
    econ = set(p[p.p_type == "ECONOMY"].p_partkey)
    sn = s.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    supp_nat = dict(zip(sn.s_suppkey, sn.n_name))
    j = li[li.l_partkey.isin(econ)].merge(
        o[["o_orderkey", "o_custkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j = j[j.o_custkey.isin(cust)]
    cents = np.floor(
        j.l_extendedprice * (1 - j.l_discount) * 100 + 0.5
    ).astype(np.int64)
    agg = (
        pd.DataFrame(
            {
                "y": j.o_orderdate.dt.year,
                "nat": j.l_suppkey.map(supp_nat),
                "c": cents,
            }
        )
        .groupby(["y", "nat"])["c"]
        .sum()
    )
    assert len(got) == len(agg)
    ytot = agg.groupby(level=0).sum()
    for (y, nat), cval in agg.items():
        row = got[(y, nat)]
        assert row["nation_cents"] == cval
        assert row["year_cents"] == ytot[y]
        assert row["share_micro"] == np.floor(cval / ytot[y] * 1e6 + 0.5)


def test_market_share_shares_sum_to_one(tables):
    """Within each year the shares must account for the whole market
    (micro-rounded: sum within 15 micro of 1e6 per year)."""
    from flink_210225_spark.operators.serving import market_share

    rows = market_share(tables).collect()
    by_year = {}
    for r in rows:
        by_year.setdefault(r["o_year"], []).append(r["share_micro"])
    for y, shares in by_year.items():
        assert abs(sum(shares) - 1_000_000) <= len(shares)


# ------------------------------------------------------- waiting supplier


def test_waiting_supplier_pure_python_replay(tables):
    """Dict-based replay of the EXISTS / NOT EXISTS stack."""
    import duckdb

    from flink_210225_spark.operators.joins import waiting_supplier_join

    got = {r["supplier"]: r for r in waiting_supplier_join(tables).collect()}
    sf = "/root/testdata/sf0.001"
    per = duckdb.sql(
        f"""SELECT l_orderkey, l_suppkey, max(l_shipdate) ls,
            sum(floor(l_extendedprice*(1-l_discount)*100+0.5)::BIGINT)::BIGINT c
            FROM '{sf}/lineitem.parquet' GROUP BY 1,2"""
    ).df()
    sup = duckdb.sql(
        f"SELECT s_suppkey, s_name FROM '{sf}/supplier.parquet'"
    ).df()
    names = dict(zip(sup.s_suppkey, sup.s_name))
    by_order = {}
    for t in per.itertuples():
        by_order.setdefault(t.l_orderkey, []).append(t)
    blame = {}
    for rows_in_order in by_order.values():
        if len(rows_in_order) < 2:
            continue  # EXISTS(other supplier) fails
        for t in rows_in_order:
            others = [o for o in rows_in_order if o.l_suppkey != t.l_suppkey]
            if all(o.ls < t.ls for o in others):  # NOT EXISTS(o.ls >= t.ls)
                b = blame.setdefault(names[t.l_suppkey], [0, 0])
                b[0] += 1
                b[1] += int(t.c)
    assert set(got) == set(blame)
    for name, (cnt, cents) in blame.items():
        assert got[name]["n_blamed_orders"] == cnt
        assert got[name]["blamed_cents"] == cents


def test_waiting_supplier_unique_blame_per_order(tables):
    """At most one strictly-last supplier can exist per order, so total
    blamed orders <= number of multi-supplier orders."""
    import duckdb

    from flink_210225_spark.operators.joins import waiting_supplier_join

    total_blamed = sum(
        r["n_blamed_orders"] for r in waiting_supplier_join(tables).collect()
    )
    multi = duckdb.sql(
        "SELECT count(*) FROM (SELECT l_orderkey FROM"
        " '/root/testdata/sf0.001/lineitem.parquet'"
        " GROUP BY 1 HAVING count(DISTINCT l_suppkey) > 1)"
    ).fetchone()[0]
    assert 0 < total_blamed <= multi


# --------------------------------------------------------------- collation


def test_collation_groups_collapse(tables):
    """Every collated group must hold >1 binary spelling but exactly 1
    collated-distinct value; lowercase keys must match the base segs."""
    import duckdb

    from flink_210225_spark.streaming.sql_jobs import _collation_sql_q

    rows = _collation_sql_q(tables).collect()
    segs = duckdb.sql(
        "SELECT DISTINCT lower(c_mktsegment) s FROM"
        " '/root/testdata/sf0.001/customer.parquet'"
    ).df()["s"]
    assert {r["segment"] for r in rows} == set(segs)
    for r in rows:
        assert r["n_ci"] == 1
        assert 2 <= r["n_case_variants"] <= 3


# --------------------------------------------------------- important stock


def test_important_stock_threshold_replay(tables):
    """pandas replay of the 1.25x-mean HAVING, exact cross-multiply."""
    import duckdb

    from flink_210225_spark.operators.serving import important_stock

    got = {r["partkey"]: r for r in important_stock(tables).collect()}
    per = duckdb.sql(
        "SELECT l_partkey, sum(floor(l_extendedprice*(1-l_discount)*100+0.5)"
        "::BIGINT)::BIGINT v FROM '/root/testdata/sf0.001/lineitem.parquet'"
        " GROUP BY 1"
    ).df()
    n, tot = len(per), int(per.v.sum())
    keep = per[per.v * n * 4 > 5 * tot]
    assert set(got) == set(keep.l_partkey)
    for _, r in keep.iterrows():
        assert got[r.l_partkey]["value_cents"] == r.v
        assert got[r.l_partkey]["share_micro"] == np.floor(
            r.v / tot * 1e6 + 0.5
        )


# --------------------------------------------------------------------- ipw


def test_ipw_ate_pure_python_replay(tables):
    """Textbook stratified IPW with dicts; also checks the positivity
    filter and the estimator's structure (naive != ipw only via
    stratum-mix reweighting; both are finite)."""
    import duckdb

    from flink_210225_spark.operators.serving import ipw_ate

    row = ipw_ate(tables).collect()[0]
    u = duckdb.sql(
        "SELECT user_id,"
        " sum(CASE WHEN event_type='purchase' THEN floor(value*100+0.5)::BIGINT"
        " ELSE 0 END)::BIGINT y,"
        " isodow(min(ts)::DATE) s"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY user_id"
    ).df()
    u["t"] = (u.user_id % 2 == 0).to_numpy()
    strata = {}
    for _, r in u.iterrows():
        d = strata.setdefault(r.s, [0, 0])
        d[0] += 1
        d[1] += int(r.t)
    ok = {s for s, (n, nt) in strata.items() if 0 < nt < n}
    j = u[u.s.isin(ok)]
    terms = []
    for _, r in j.iterrows():
        n, nt = strata[r.s]
        p = nt / n
        terms.append(r.y / p if r.t else -r.y / (1 - p))
    ate = sum(terms) / len(j)
    tr, ct = j[j.t], j[~j.t]
    naive = tr.y.mean() - ct.y.mean()
    assert row["n_users"] == len(j)
    assert row["n_strata"] == len(ok)
    assert abs(row["ipw_ate_micro"] - np.floor(ate * 1e6 + 0.5)) <= 1
    assert abs(row["naive_diff_micro"] - np.floor(naive * 1e6 + 0.5)) <= 1


# ----------------------------------------------------------------- sql udf


def test_sql_udf_inlines_like_literal(tables):
    """The SQL-body functions must compute exactly the inlined exprs."""
    from flink_210225_spark.streaming.sql_jobs import _sql_udf_q

    got = {r["status"]: r for r in _sql_udf_q(tables).collect()}
    o = _orders_pd_full()
    cents = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    tier = np.where(
        o.o_totalprice > 200000, 3, np.where(o.o_totalprice > 100000, 2, 1)
    )
    g = pd.DataFrame(
        {"st": o.o_orderstatus, "c": cents, "t": tier}
    ).groupby("st")
    for st, gg in g:
        row = got[st]
        assert row["n"] == len(gg)
        assert row["cents"] == gg.c.sum()
        assert row["tier_sum"] == gg.t.sum()


# ------------------------------------------------------- segment migration


def test_segment_migration_matrix_properties(tables):
    """Margins must equal the per-period tier populations; terciles must
    be near-equal within a period; matrix covers every customer."""
    import duckdb

    from flink_210225_spark.operators.serving import segment_migration

    rows = segment_migration(tables).collect()
    total = sum(r["n_customers"] for r in rows)
    n_cust = duckdb.sql(
        "SELECT count(DISTINCT o_custkey) FROM"
        " '/root/testdata/sf0.001/orders.parquet'"
    ).fetchone()[0]
    assert total == n_cust
    from_m = {}
    to_m = {}
    for r in rows:
        from_m[r["tier_from"]] = from_m.get(r["tier_from"], 0) + r["n_customers"]
        to_m[r["tier_to"]] = to_m.get(r["tier_to"], 0) + r["n_customers"]
    # terciles within each period differ by at most 1 (plus the 0-tier)
    p1 = [v for k, v in from_m.items() if k > 0]
    p2 = [v for k, v in to_m.items() if k > 0]
    assert max(p1) - min(p1) <= 1
    assert max(p2) - min(p2) <= 1


def test_segment_migration_pandas_replay(tables):
    """Full replay: literal 1998 split, rank terciles, outer matrix."""
    import duckdb

    from flink_210225_spark.operators.serving import segment_migration

    got = {
        (r["tier_from"], r["tier_to"]): r["n_customers"]
        for r in segment_migration(tables).collect()
    }
    o = duckdb.sql(
        "SELECT o_custkey, o_orderdate,"
        " floor(o_totalprice*100+0.5)::BIGINT c"
        " FROM '/root/testdata/sf0.001/orders.parquet'"
    ).df()
    o["period"] = np.where(o.o_orderdate < pd.Timestamp("1998-01-01"), 1, 2)
    tiers = {}
    for p, g in o.groupby("period"):
        s = g.groupby("o_custkey")["c"].sum().reset_index()
        s = s.sort_values(["c", "o_custkey"]).reset_index(drop=True)
        n = len(s)
        for rk, r in s.iterrows():
            t = 1 if rk * 3 <= (n - 1) else (2 if rk * 3 <= (n - 1) * 2 else 3)
            tiers.setdefault(r.o_custkey, {})[p] = t
    expect = {}
    for cust, d in tiers.items():
        key = (d.get(1, 0), d.get(2, 0))
        expect[key] = expect.get(key, 0) + 1
    assert got == expect


# ----------------------------------------------------------- sentence stats


def test_sentence_stats_pure_python_replay(tables):
    """re.split third implementation of the sentence segmentation."""
    import re

    import duckdb

    from flink_210225_spark.ops.text import sentence_stats

    got = {r["lang"]: r for r in sentence_stats(tables).collect()}
    docs = duckdb.sql(
        "SELECT lang, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    agg = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        sents = [s for s in re.split(r"[.!?]+(?:\s+|$)", text.strip()) if s]
        if not sents:
            continue
        toks = len(text.strip().split())
        mx = max(len(s.strip().split()) for s in sents)
        a = agg.setdefault(lang, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(sents)
        a[2] += toks
        a[3] = max(a[3], mx)
        a[4] += 1 if len(sents) == 1 else 0
    assert set(got) == set(agg)
    for lang, (nd, ns, nt, mx, single) in agg.items():
        row = got[lang]
        assert row["n_docs"] == nd
        assert row["n_sentences"] == ns
        assert row["n_tokens"] == nt
        assert row["longest_sentence_toks"] == mx
        assert row["toks_per_sentence_micro"] == np.floor(nt / ns * 1e6 + 0.5)
        assert row["single_sentence_share_micro"] == np.floor(
            single / nd * 1e6 + 0.5
        )


# --------------------------------------------------------------------- dpp


def test_dpp_join_weekend_replay(tables):
    """pandas replay of the dim-filtered join (weekend days only)."""
    import duckdb

    from flink_210225_spark.operators.joins import dpp_prune_join

    got = {r["dow"]: r for r in dpp_prune_join(tables).collect()}
    ev = duckdb.sql(
        "SELECT ts, floor(value*100+0.5)::BIGINT c"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).df()
    dows = ev.ts.dt.dayofweek + 1  # Monday=1..Sunday=7 (ISO)
    weekend = ev[dows >= 6]
    wdow = dows[dows >= 6]
    for dow in (6, 7):
        sel = weekend[wdow == dow]
        row = got.get(dow)
        assert row is not None
        assert row["n_rows"] == len(sel)
        assert row["cents"] == sel.c.sum()
        assert row["n_days"] == sel.ts.dt.date.nunique()


# ---------------------------------------------------------- price endings


def test_price_endings_replay(tables):
    """Digit-bucket replay plus chi2 over exact counts."""
    import duckdb

    from flink_210225_spark.operators.serving import price_endings

    rows = price_endings(tables).collect()
    p = duckdb.sql(
        "SELECT floor(p_retailprice*100+0.5)::BIGINT c"
        " FROM '/root/testdata/sf0.001/part.parquet'"
    ).df()["c"]
    n = len(p)
    got = {(r["dim"], r["bucket"]): r for r in rows}
    end = p % 100
    buckets = {
        "00": (end == 0).sum(),
        "99": (end == 99).sum(),
        "95": (end == 95).sum(),
        "50": (end == 50).sum(),
    }
    buckets["other"] = n - sum(buckets.values())
    for b, cnt in buckets.items():
        if cnt == 0:
            assert ("cents_ending", b) not in got
            continue
        r = got[("cents_ending", b)]
        assert r["n"] == cnt
        assert r["share_micro"] == np.floor(cnt / n * 1e6 + 0.5)
    digits = ((p % 1000) // 100).value_counts()
    # full 10-digit grid: zero-count digits contribute (0-E)^2/E = E
    chi2 = sum(
        (digits.get(d, 0) - n / 10) ** 2 / (n / 10) for d in range(10)
    )
    r = got[("chi2_dollar_digit", "all")]
    assert abs(r["share_micro"] - np.floor(chi2 * 1e6 + 0.5)) <= 1


# ---------------------------------------------------------- record breaks


def test_record_breaks_pure_python_replay(tables):
    """Sequential running-max walk per event type."""
    import duckdb

    from flink_210225_spark.operators.windows import record_breaks

    got = {r["event_type"]: r for r in record_breaks(tables).collect()}
    daily = duckdb.sql(
        "SELECT event_type et, ts::DATE d,"
        " sum(floor(value*100+0.5)::BIGINT)::BIGINT x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1,2 ORDER BY 1,2"
    ).df()
    for et, g in daily.groupby("et"):
        best = None
        recs = []
        for _, r in g.iterrows():
            if best is None or r.x > best:
                best = int(r.x)
                recs.append(r.d)
        droughts = [
            (b - a).days for a, b in zip(recs, recs[1:])
        ]
        row = got[et]
        assert row["n_records"] == len(recs)
        assert row["record_cents"] == best
        assert row["last_record_day"] == str(pd.Timestamp(recs[-1]).date())
        if droughts:
            assert row["longest_drought_days"] == max(droughts)
        else:
            assert row["longest_drought_days"] is None


# ---------------------------------------------------------------- pq curve


def test_pq_distortion_curve_contract(tables):
    """All booleans true; m/bits columns are the documented sweep."""
    from flink_210225_spark.ops.similarity import pq_distortion_curve

    rows = {r["m_subspaces"]: r for r in pq_distortion_curve(tables).collect()}
    assert set(rows) == {2, 4, 8}
    for m, r in rows.items():
        assert r["bits_per_vector"] == 4 * m
        assert r["beats_mean"] and r["monotone_ok"]


# -------------------------------------------------------------- return gaps


def test_return_gaps_pure_python_replay(tables):
    """Sequential sessionize + gap walk with exact ceil-rank percentiles."""
    import duckdb

    from flink_210225_spark.operators.sessions import return_gaps

    row = return_gaps(tables).collect()[0]
    ev = duckdb.sql(
        "SELECT user_id, ts, event_id FROM"
        " '/root/testdata/sf0.001/events.parquet' ORDER BY user_id, ts, event_id"
    ).df()
    gaps = []
    users = set()
    for uid, g in ev.groupby("user_id"):
        sessions = []
        cur_start = cur_end = None
        for t in g["ts"]:
            if cur_end is None or (t - cur_end).total_seconds() > 1800:
                if cur_end is not None:
                    sessions.append((cur_start, cur_end))
                cur_start = t
            cur_end = t
        sessions.append((cur_start, cur_end))
        for (s1, e1), (s2, _) in zip(sessions, sessions[1:]):
            us = int((s2 - e1).value // 1000)  # ns -> us
            gaps.append(us // 60_000_000)
            users.add(uid)
    gaps.sort()
    n = len(gaps)
    assert row["n_gaps"] == n
    assert row["n_returning_users"] == len(users)
    assert row["min_gap_min"] == gaps[0]
    assert row["max_gap_min"] == gaps[-1]
    import math

    assert row["p25_min"] == gaps[math.ceil(n / 4) - 1]
    assert row["p50_min"] == gaps[math.ceil(n / 2) - 1]
    assert row["p75_min"] == gaps[math.ceil(3 * n / 4) - 1]
    assert row["p90_min"] == gaps[math.ceil(9 * n / 10) - 1]


# ---------------------------------------------------------- integral image


def test_integral_image_sat_identity(tables):
    """total_sum equals the direct pixel-formula sum; box sums fit
    within it; the SAT corner identity holds per asset."""
    from flink_210225_spark.ops.multimodal import image_integral_audit

    rows = image_integral_audit(tables).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for aid, rs in by_asset.items():
        seed = aid % 16
        w = 8 + 4 * (seed % 5)
        h = 8 + 4 * ((seed * 3) % 4)
        x = np.arange(w)
        y = np.arange(h)[:, None]
        px = (seed * 7 + 3 * x + 11 * y) % 256
        total = int(px.sum())
        assert len(rs) == 3
        for r in rs:
            assert r["total_sum"] == total
            assert 0 < r["box_sum"] <= total
        # box 0 replay: top-left half x half? spec: (0,0) extent 2*(w//4)
        r0 = next(r for r in rs if r["box_id"] == 0)
        bw, bh = (w // 4) * 2, (h // 4) * 2
        assert r0["box_sum"] == int(px[:bh, :bw].sum())


# ---------------------------------------------------------------- textrank


def test_textrank_pure_python_replay(tables):
    """networkx-free third implementation: dict-based weighted damped
    power iteration, 6 rounds, exact same edge construction."""
    from collections import Counter

    from flink_210225_spark.ops.text import textrank_keywords

    got = {r["token"]: r for r in textrank_keywords(tables).collect()}
    docs = _docs_pd()
    edges = Counter()
    for text in docs["text"]:
        toks = text.strip().split()
        for a, b in zip(toks, toks[1:]):
            if len(a) >= 4 and len(b) >= 4 and a != b:
                edges[(min(a, b), max(a, b))] += 1
    adj = {}
    strength = Counter()
    for (u, v), w in edges.items():
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
        strength[u] += w
        strength[v] += w
    nodes = sorted(adj)
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(6):
        nxt = {}
        for u in nodes:
            s = sum(rank[v] * w / strength[v] for v, w in adj[u])
            nxt[u] = 0.15 / n + 0.85 * s
        rank = nxt
    assert set(got) == set(nodes)
    for u in nodes:
        assert got[u]["strength"] == strength[u]
        assert abs(got[u]["rank_nano"] - np.floor(rank[u] * 1e9 + 0.5)) <= 2
    # ranks form a probability-ish mass: sum near 1 (damped leakage only
    # through dangling-free graph => exactly 1 in the limit; 6 rounds close)
    total = sum(r["rank_nano"] for r in got.values()) / 1e9
    assert 0.9 < total < 1.1


# ------------------------------------------------- accumulating snapshot


def test_accumulating_snapshot_replay(tables):
    import duckdb

    from flink_210225_spark.operators.warehouse import accumulating_snapshot

    got = {r["priority"]: r for r in accumulating_snapshot(tables).collect()}
    sf = "/root/testdata/sf0.001"
    ms = duckdb.sql(
        f"""SELECT o.o_orderpriority p, count(*) n_lines,
            min(l.l_shipdate) f, max(l.l_shipdate) l,
            o.o_orderdate d
            FROM '{sf}/lineitem.parquet' l JOIN '{sf}/orders.parquet' o
            ON l_orderkey = o_orderkey GROUP BY l_orderkey, p, d"""
    ).df()
    ms["d_first"] = (ms.f.dt.normalize() - ms.d.dt.normalize()).dt.days
    ms["d_span"] = (ms.l.dt.normalize() - ms.f.dt.normalize()).dt.days
    for p, g in ms.groupby("p"):
        row = got[p]
        assert row["n_orders"] == len(g)
        assert row["n_lines"] == g.n_lines.sum()
        assert row["mean_days_to_first_ship_micro"] == np.floor(
            g.d_first.sum() / len(g) * 1e6 + 0.5
        )
        assert row["max_ship_span_days"] == g.d_span.max()
        assert row["within_30d_share_micro"] == np.floor(
            ((g.d_first + g.d_span) <= 30).sum() / len(g) * 1e6 + 0.5
        )


# ------------------------------------------------------------ ord plot


def test_basket_poissonness_replay(tables):
    import duckdb

    from flink_210225_spark.operators.serving import basket_poissonness

    rows = {r["k"]: r for r in basket_poissonness(tables).collect()}
    sizes = duckdb.sql(
        "SELECT count(*)::BIGINT k FROM"
        " '/root/testdata/sf0.001/lineitem.parquet' GROUP BY l_orderkey"
    ).df()["k"]
    spec = sizes.value_counts().sort_index()
    pts = []
    for k in spec.index:
        row = rows[k]
        assert row["n_k"] == spec[k]
        if k - 1 in spec.index:
            u = np.floor(k * spec[k] / spec[k - 1] * 1e6 + 0.5)
            assert row["ord_ratio_micro"] == u
            pts.append((float(k), u / 1e6))
        else:
            assert row["ord_ratio_micro"] is None
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    n = len(pts)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    assert abs(rows[-1]["ord_ratio_micro"] - np.floor(slope * 1e6 + 0.5)) <= 1
    assert rows[-1]["n_k"] == n


# ---------------------------------------------------------- cascade funnel


def test_cascade_funnel_set_replay(tables):
    """Set-algebra third implementation of the three stages."""
    import hashlib as hl

    from flink_210225_spark.ops.dedup import cascade_funnel

    rows = {r["stage"]: r for r in cascade_funnel(tables).collect()}
    docs = _docs_pd()
    by_exact = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        by_exact.setdefault(hl.md5(text.encode()).hexdigest(), []).append(did)
    keep1 = {min(v) for v in by_exact.values()}
    texts = dict(zip(docs["doc_id"], docs["text"]))
    by_ts = {}
    for did in keep1:
        h = hl.md5(
            " ".join(sorted(texts[did].strip().lower().split())).encode()
        ).hexdigest()
        by_ts.setdefault(h, []).append(did)
    keep2 = {min(v) for v in by_ts.values()}
    sh = {
        did: {
            " ".join(texts[did].strip().split()[i : i + 3])
            for i in range(max(len(texts[did].strip().split()) - 2, 1))
        }
        for did in keep2
    }
    removed = set()
    ks = sorted(keep2)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = np.floor(inter / len(sh[a] | sh[b]) * 10000 + 0.5) / 10000
            if j >= 0.5:
                removed.add(b)
    n0, n1, n2 = len(docs), len(keep1), len(keep2)
    n3 = n2 - len(removed)
    assert (rows["1_exact"]["docs_in"], rows["1_exact"]["docs_out"]) == (n0, n1)
    assert (rows["2_token_sort"]["docs_in"], rows["2_token_sort"]["docs_out"]) == (n1, n2)
    assert (
        rows["3_jaccard_keep_first"]["docs_in"],
        rows["3_jaccard_keep_first"]["docs_out"],
    ) == (n2, n3)
    for r in rows.values():
        assert r["docs_in"] - r["removed"] == r["docs_out"]


# ---------------------------------------------------------- padding waste


def test_padding_waste_policies_ordered(tables):
    """Loop replay of all three policies; sorting must dominate arrival
    order and bucketing must sit between (or equal)."""
    from flink_210225_spark.ops.sampling import padding_waste

    rows = {r["policy"]: r for r in padding_waste(tables).collect()}
    docs = _docs_pd()
    lens = [
        (len(t.strip().split()), did)
        for did, t in zip(docs["doc_id"], docs["text"])
    ]

    def waste(order):
        padded = real = 0
        for i in range(0, len(order), 16):
            chunk = order[i : i + 16]
            padded += max(chunk) * len(chunk)
            real += sum(chunk)
        return padded, real

    arrival = [l for l, d in sorted(lens, key=lambda p: p[1])]
    sorted_ = [l for l, d in sorted(lens)]
    bucketed = [l for l, d in sorted(lens, key=lambda p: (p[0] // 32, p[1]))]
    for name, order in (
        ("1_arrival", arrival),
        ("2_sorted", sorted_),
        ("3_bucketed_32", bucketed),
    ):
        p, r = waste(order)
        row = rows[name]
        assert row["padded_tokens"] == p
        assert row["real_tokens"] == r
        assert row["waste_micro"] == np.floor((p - r) / p * 1e6 + 0.5)
    assert rows["2_sorted"]["waste_micro"] <= rows["1_arrival"]["waste_micro"]
    assert (
        rows["2_sorted"]["waste_micro"]
        <= rows["3_bucketed_32"]["waste_micro"]
        <= rows["1_arrival"]["waste_micro"]
    )


# --------------------------------------------------------------------- did


def test_did_estimator_replay(tables):
    import duckdb

    from flink_210225_spark.operators.serving import did_estimator

    row = did_estimator(tables).collect()[0]
    c = duckdb.sql(
        "SELECT user_id % 2 = 0 t, ts::DATE >= DATE '2024-01-16' p,"
        " user_id, ts::DATE d, sum(floor(value*100+0.5)::BIGINT)::BIGINT y"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type = 'purchase' GROUP BY 1,2,3,4"
    ).df()
    means = {}
    n_tot = 0
    for (t, p), g in c.groupby(["t", "p"]):
        means[(bool(t), bool(p))] = g.y.sum() / len(g)
        n_tot += len(g)
    did = (means[(True, True)] - means[(True, False)]) - (
        means[(False, True)] - means[(False, False)]
    )
    assert row["n_user_days"] == n_tot
    assert row["t_post_micro"] == np.floor(means[(True, True)] * 1e6 + 0.5)
    assert row["c_pre_micro"] == np.floor(means[(False, False)] * 1e6 + 0.5)
    assert abs(row["did_micro"] - np.floor(did * 1e6 + 0.5)) <= 1
    # DiD identity over the emitted micro cells (rounding-tolerant)
    recomposed = (row["t_post_micro"] - row["t_pre_micro"]) - (
        row["c_post_micro"] - row["c_pre_micro"]
    )
    assert abs(recomposed - row["did_micro"]) <= 2


# ------------------------------------------------------------ rolling beta


def test_rolling_beta_pandas_replay(tables):
    import duckdb

    from flink_210225_spark.operators.windows import rolling_beta

    got = {r["day"]: r for r in rolling_beta(tables).collect()}
    daily = duckdb.sql(
        "SELECT ts::DATE d,"
        " sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)::BIGINT x,"
        " sum(CASE WHEN event_type='purchase' THEN floor(value*100+0.5)::BIGINT"
        " ELSE 0 END)::BIGINT y"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    xs, ys = daily.x.to_list(), daily.y.to_list()
    for i, d in enumerate(daily.d):
        lo = max(0, i - 13)
        fx, fy = xs[lo : i + 1], ys[lo : i + 1]
        n = len(fx)
        den = n * sum(v * v for v in fx) - sum(fx) ** 2
        row = got[str(pd.Timestamp(d).date())]
        assert row["n_days_in_frame"] == n
        if n >= 7 and den > 0:
            num = n * sum(a * b for a, b in zip(fx, fy)) - sum(fx) * sum(fy)
            assert row["beta_micro"] == np.floor(num / den * 1e6 + 0.5)
        else:
            assert row["beta_micro"] is None


# ------------------------------------------------------ cdc reconciliation


def test_cdc_reconciliation_divergence_detector(spark):
    """Constructed NEGATIVE: a broken fold (op order by seq ASCENDING —
    the classic compactor bug) must diverge from the replay on a log
    with updates; the kernel's own paths must agree (zeros)."""
    import duckdb

    from flink_210225_spark.operators.router import state_reconciliation

    tables = {
        "customer": spark.read.parquet(
            "/root/testdata/sf0.001/customer.parquet"
        )
    }
    rows = state_reconciliation(tables).collect()
    for r in rows:
        assert r["only_in_fold"] == 0
        assert r["only_in_replay"] == 0
    # replay totals must cover every non-deleted customer exactly once
    n_cust = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/customer.parquet'"
    ).fetchone()[0]
    n_deleted = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/customer.parquet'"
        " WHERE c_custkey % 17 = 0 AND c_custkey % 51 != 0"
    ).fetchone()[0]
    assert sum(r["n_rows"] for r in rows) == n_cust - n_deleted


def test_cdc_reconciliation_reborn_and_updated_segments(tables):
    from flink_210225_spark.operators.router import state_reconciliation

    segs = {r["segment"]: r for r in state_reconciliation(tables).collect()}
    assert "REBORN" in segs and "UPDATED" in segs
    # REBORN rows carry custkey*10 balances — the re-insert payload
    r = segs["REBORN"]
    assert r["sum_bal_cents"] == r["sum_keys"] * 10


# --------------------------------------------------------------- morphology


def test_morphology_numpy_replay_and_identities(tables):
    """Formula replay (no codec) + the containment identity
    eroded <= fg <= dilated <= n_px."""
    from flink_210225_spark.ops.multimodal import image_morphology_audit

    got = {r["asset_id"]: r for r in image_morphology_audit(tables).collect()}
    for aid, row in list(got.items())[:64]:
        seed = aid % 16
        w = 8 + 4 * (seed % 5)
        h = 8 + 4 * ((seed * 3) % 4)
        x = np.arange(w)
        y = np.arange(h)[:, None]
        fg = ((seed * 7 + 3 * x + 11 * y) % 256 >= 128).astype(int)
        ero = 0
        dil = 0
        for yy in range(h):
            for xx in range(w):
                neigh = [
                    fg[yy + dy, xx + dx]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                    if 0 <= yy + dy < h and 0 <= xx + dx < w
                ]
                if (
                    1 <= yy < h - 1
                    and 1 <= xx < w - 1
                    and len(neigh) == 9
                    and all(neigh)
                ):
                    ero += 1
                if any(neigh):
                    dil += 1
        assert row["n_fg"] == fg.sum()
        assert row["n_eroded"] == ero
        assert row["n_dilated"] == dil
        assert row["n_eroded"] <= row["n_fg"] <= row["n_dilated"] <= row["n_px"]
        assert row["gradient"] == row["n_dilated"] - row["n_eroded"]


# -------------------------------------------------------------- csv quoting


def test_csv_quoting_row_integrity(tables):
    """Every row must survive the embedded-newline round trip intact."""
    import duckdb

    from flink_210225_spark.sources.jsonl import csv_quoting_roundtrip

    row = csv_quoting_roundtrip(tables).collect()[0]
    n = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]
    assert row["n_rows"] == n
    assert row["n_with_newline"] == n
    assert row["n_with_quote_comma"] == n


# ------------------------------------------------------------ scd2 integrity


def test_scd2_integrity_all_clean_and_census(tables):
    import duckdb

    from flink_210225_spark.operators.warehouse import scd2_integrity

    row = scd2_integrity(tables).collect()[0]
    assert row["overlap_violations"] == 0
    assert row["gap_violations"] == 0
    assert row["multi_open_keys"] == 0
    deleted = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/customer.parquet'"
        " WHERE c_custkey % 1000 = 0"
    ).fetchone()[0]
    assert row["closed_out_keys"] == deleted
    n_cust = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/customer.parquet'"
    ).fetchone()[0]
    assert row["n_keys"] == n_cust


def test_scd2_integrity_detects_overlap(spark):
    """Constructed NEGATIVE: hand-built overlapping intervals must count."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    hist = spark.createDataFrame(
        [(1, 0, 10, False), (1, 5, None, True), (2, 0, None, True)],
        "custkey long, valid_from long, valid_to long, is_current boolean",
    )
    w = Window.partitionBy("custkey").orderBy("valid_from")
    ann = hist.select(
        "custkey", "valid_from",
        F.lag("valid_to").over(w).alias("prev_to"),
    )
    overlaps = ann.where(
        F.col("prev_to").isNotNull() & (F.col("valid_from") < F.col("prev_to"))
    ).count()
    assert overlaps == 1


# ------------------------------------------------------------------ gumbel


def test_gumbel_mom_replay(tables):
    import duckdb
    import math

    from flink_210225_spark.operators.windows import gumbel_maxima

    rows = {r["t_days"]: r for r in gumbel_maxima(tables).collect()}
    weekly = duckdb.sql(
        "SELECT date_trunc('week', ts::DATE) w, max(s) mx FROM ("
        " SELECT ts, sum(floor(value*100+0.5)::BIGINT) OVER () dummy,"
        " ts::DATE d, 0 s FROM '/root/testdata/sf0.001/events.parquet')"
        " GROUP BY 1"
    )
    daily = duckdb.sql(
        "SELECT ts::DATE d, sum(floor(value*100+0.5)::BIGINT)::BIGINT x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1"
    ).df()
    daily["w"] = daily.d.map(
        lambda d: pd.Timestamp(d) - pd.Timedelta(days=pd.Timestamp(d).weekday())
    )
    mx = daily.groupby("w")["x"].max()
    n = len(mx)
    mean = mx.sum() / n
    var = float((mx.astype(float) ** 2).sum()) / n - mean * mean
    sigma = math.sqrt(var) * 0.7796968012336761
    mu = mean - 0.5772156649015329 * sigma
    for t in (30, 100, 365):
        rl = mu - sigma * math.log(-math.log(1.0 - 1.0 / t))
        row = rows[t]
        assert row["n_blocks"] == n
        assert abs(row["mu_micro"] - np.floor(mu * 1e6 + 0.5)) <= 1
        assert abs(row["return_level_micro"] - np.floor(rl * 1e6 + 0.5)) <= 1
    # return levels must increase with horizon
    assert (
        rows[30]["return_level_micro"]
        < rows[100]["return_level_micro"]
        < rows[365]["return_level_micro"]
    )


# ------------------------------------------------------------ cluster design


def test_cluster_design_icc_replay(tables):
    import duckdb

    from flink_210225_spark.ops.sampling import cluster_design

    row = cluster_design(tables).collect()[0]
    u = duckdb.sql(
        "SELECT user_id, count(*)::BIGINT m,"
        " sum(floor(value*100+0.5)::BIGINT)::BIGINT s,"
        " sum(floor(value*100+0.5)::BIGINT ** 2)::BIGINT ss"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1"
    ).df()
    k, n, t = len(u), int(u.m.sum()), int(u.s.sum())
    between = float((u.s.astype(float) ** 2 / u.m.astype(float)).sum())
    ss_all = float(u.ss.sum())
    cf = t * t / n
    msb = (between - cf) / (k - 1)
    msw = (ss_all - between) / (n - k)
    m0 = (n - float((u.m.astype(float) ** 2).sum()) / n) / (k - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1.0 + (n / k - 1.0) * icc
    assert row["n_users_total"] == k
    assert row["n_events_total"] == n
    assert abs(row["icc_micro"] - np.floor(icc * 1e6 + 0.5)) <= 1
    assert abs(row["deff_micro"] - np.floor(deff * 1e6 + 0.5)) <= 1
    assert 0 < row["n_users_sampled"] <= 41


# ---------------------------------------------------------------- multiset


def test_multiset_ops_counter_replay(tables):
    """Bag-semantics third implementation with collections.Counter."""
    from collections import Counter

    import duckdb

    from flink_210225_spark.streaming.sql_jobs import _multiset_sql_q

    got = {r["op"]: r for r in _multiset_sql_q(tables).collect()}
    ev = duckdb.sql(
        "SELECT user_id, event_type FROM"
        " '/root/testdata/sf0.001/events.parquet'"
    ).df()
    v = Counter(ev[ev.event_type == "view"].user_id)
    c = Counter(ev[ev.event_type == "click"].user_id)
    exc_all = v - c  # Counter subtraction = per-occurrence EXCEPT ALL
    int_all = v & c  # min multiplicity = INTERSECT ALL
    exc_d = set(v) - set(c)
    r = got["views_minus_clicks_all"]
    assert r["n_rows"] == sum(exc_all.values())
    assert r["n_users"] == len(exc_all)
    assert r["id_mass"] == sum(u * m for u, m in exc_all.items())
    r = got["views_intersect_clicks_all"]
    assert r["n_rows"] == sum(int_all.values())
    assert r["id_mass"] == sum(u * m for u, m in int_all.items())
    r = got["except_distinct"]
    assert r["n_rows"] == r["n_users"] == len(exc_d)
    # bag vs set divergence must be visible
    assert (
        got["views_minus_clicks_all"]["n_rows"]
        > got["except_distinct"]["n_rows"]
    )


# ---------------------------------------------------------------------- xmr


def test_xmr_chart_replay(tables):
    import duckdb

    from flink_210225_spark.operators.windows import xmr_chart

    rows = sorted(xmr_chart(tables).collect(), key=lambda r: r["day"])
    daily = duckdb.sql(
        "SELECT ts::DATE d, sum(floor(value*100+0.5)::BIGINT)::BIGINT x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    xs = daily.x.to_list()
    mrs = [abs(b - a) for a, b in zip(xs, xs[1:])]
    xbar = sum(xs) / len(xs)
    mrbar = sum(mrs) / len(mrs)
    ucl = np.floor((xbar + 2.66 * mrbar) * 1e6 + 0.5) / 1e6
    lcl = np.floor((xbar - 2.66 * mrbar) * 1e6 + 0.5) / 1e6
    for i, r in enumerate(rows):
        assert r["x"] == xs[i]
        assert r["mr"] == (None if i == 0 else mrs[i - 1])
        assert r["above_ucl"] == (xs[i] > ucl)
        assert r["below_lcl"] == (xs[i] < lcl)


# -------------------------------------------------------------------- hurst


def test_hurst_rs_numpy_replay(tables):
    import duckdb

    from flink_210225_spark.operators.windows import hurst_rs

    rows = {r["n"]: r for r in hurst_rs(tables).collect()}
    daily = duckdb.sql(
        "SELECT ts::DATE d, sum(floor(value*100+0.5)::BIGINT)::BIGINT x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    xs = daily.x.to_numpy()[:30].astype(np.float64)
    pts = []
    for nn in (5, 10, 15, 30):
        rss = []
        for b in range(30 // nn):
            blk = xs[b * nn : (b + 1) * nn]
            z = np.cumsum(blk - blk.mean())
            r = z.max() - z.min()
            s = np.sqrt((blk**2).mean() - blk.mean() ** 2)
            if s > 0:
                rss.append(r / s)
        mean_rs = float(np.mean(rss))
        assert rows[nn]["n_blocks"] == len(rss)
        assert abs(rows[nn]["rs_micro"] - np.floor(mean_rs * 1e6 + 0.5)) <= 1
        pts.append((np.log(nn), np.log(mean_rs)))
    lx = np.array([p[0] for p in pts])
    ly = np.array([p[1] for p in pts])
    k = len(pts)
    h = (k * (lx * ly).sum() - lx.sum() * ly.sum()) / (
        k * (lx * lx).sum() - lx.sum() ** 2
    )
    assert abs(rows[-1]["rs_micro"] - np.floor(h * 1e6 + 0.5)) <= 1
    assert 0 < h < 1  # a valid Hurst exponent


# --------------------------------------------------------------- medallion


def test_medallion_ledger_replay(tables):
    import json as _json

    import duckdb

    from flink_210225_spark.operators.warehouse import medallion_recon

    row = medallion_recon(tables).collect()[0]
    ev = duckdb.sql(
        "SELECT user_id, event_type, value, ts::DATE d, props"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).df()
    def props_ok(p):
        try:
            return "k" in _json.loads(p)
        except Exception:
            return False
    ok_p = ev.props.map(props_ok)
    ok_v = ev.value >= 0
    known = {"click", "view", "purchase", "signup", "error"}
    ok_t = ev.event_type.isin(known)
    clean = ev[ok_p & ok_v & ok_t]
    silver = clean.groupby(["user_id", "event_type", "value", "d"]).size()
    assert row["bronze_rows"] == len(ev)
    assert row["rejected_props"] == int((~ok_p).sum())
    assert row["rejected_value"] == int((ok_p & ~ok_v).sum())
    assert row["rejected_type"] == int((ok_p & ok_v & ~ok_t).sum())
    assert row["silver_rows"] == len(silver)
    assert row["deduped_rows"] == len(clean) - len(silver)
    assert row["ledger_balances"] and row["gold_covers_silver"]


# ------------------------------------------------------------- char entropy


def test_char_entropy_counter_replay(tables):
    import math
    from collections import Counter

    import duckdb

    from flink_210225_spark.ops.text import char_entropy

    got = {r["lang"]: r for r in char_entropy(tables).collect()}
    docs = duckdb.sql(
        "SELECT lang, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    by_lang = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        c1, c2 = by_lang.setdefault(lang, (Counter(), Counter()))
        c1.update(text)
        c2.update(text[i : i + 2] for i in range(len(text) - 1))
    for lang, (c1, c2) in by_lang.items():
        n1, n2 = sum(c1.values()), sum(c2.values())
        h1 = -sum(c / n1 * math.log2(c / n1) for c in c1.values())
        h2 = -sum(c / n2 * math.log2(c / n2) for c in c2.values())
        row = got[lang]
        assert row["n_chars"] == n1
        assert row["alphabet"] == len(c1)
        assert abs(row["h1_micro"] - np.floor(h1 * 1e6 + 0.5)) <= 1
        assert abs(row["h2_micro"] - np.floor(h2 * 1e6 + 0.5)) <= 1
        # conditional rate within [0, h1] and h2 <= 2*h1 (subadditivity)
        assert 0 < row["cond_rate_micro"] <= row["h1_micro"] + 1
        assert row["h2_micro"] <= 2 * row["h1_micro"] + 1


# ---------------------------------------------------------------- ljung box


def test_ljung_box_numpy_replay(tables):
    import duckdb

    from flink_210225_spark.operators.windows import ljung_box

    rows = {r["lag"]: r for r in ljung_box(tables).collect()}
    daily = duckdb.sql(
        "SELECT ts::DATE d, sum(floor(value*100+0.5)::BIGINT)::BIGINT x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    x = daily.x.to_numpy().astype(np.float64)
    n = len(x)
    d = x - x.mean()
    c0 = (d * d).sum()
    q = 0.0
    for k in range(1, 8):
        rho = (d[k:] * d[:-k]).sum() / c0
        assert abs(rows[k]["stat_micro"] - np.floor(rho * 1e6 + 0.5)) <= 1
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    assert abs(rows[-1]["stat_micro"] - np.floor(q * 1e6 + 0.5)) <= 1


# ----------------------------------------------------------------- skyline


def test_skyline_quadratic_replay_and_properties(tables):
    """Brute-force dominance third implementation + frontier staircase
    property (sorted by cents asc, sizes strictly decrease... increase)."""
    import duckdb

    from flink_210225_spark.operators.serving import skyline_parts

    got = {r["p_partkey"]: (r["cents"], r["size"]) for r in skyline_parts(tables).collect()}
    p = duckdb.sql(
        "SELECT p_partkey, floor(p_retailprice*100+0.5)::BIGINT c,"
        " p_size::BIGINT s FROM '/root/testdata/sf0.001/part.parquet'"
    ).df()
    pts = list(zip(p.p_partkey, p.c, p.s))
    expect = {}
    for k, c, s in pts:
        dominated = any(
            (oc <= c and os >= s and (oc < c or os > s or (oc == c and os == s and ok < k)))
            for ok, oc, os in pts
            if ok != k
        )
        if not dominated:
            expect[k] = (c, s)
    assert got == expect
    # staircase: sorted by cents asc, sizes strictly DECREASE? No —
    # cheaper frontier points have SMALLER size; as cents rise, size rises
    fr = sorted(got.values())
    for (c1, s1), (c2, s2) in zip(fr, fr[1:]):
        assert c1 < c2 and s1 < s2


# ---------------------------------------------------------------- tf shift


def test_tf_shift_counter_replay(tables):
    import hashlib as hl
    from collections import Counter

    from flink_210225_spark.ops.dedup import tf_shift

    got = {r["tok"]: r for r in tf_shift(tables).collect()}
    docs = _docs_pd()
    raw = Counter()
    groups = {}
    texts = dict(zip(docs.doc_id, docs.text))
    for did, t in texts.items():
        raw.update(w for w in t.strip().split() if w)
        groups.setdefault(hl.md5(t.encode()).hexdigest(), []).append(did)
    keep = {min(v) for v in groups.values()}
    dd = Counter()
    for did in keep:
        dd.update(w for w in texts[did].strip().split() if w)
    n_raw, n_dd = sum(raw.values()), sum(dd.values())
    top = sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert set(got) == {t for t, _ in top}
    for tok, ct in top:
        r = got[tok]
        assert r["raw_ct"] == ct
        assert r["dd_ct"] == dd.get(tok, 0)
        assert r["raw_ppm"] == np.floor(ct / n_raw * 1e6 + 0.5)
        assert r["shift_ppm"] == np.floor(
            dd.get(tok, 0) / n_dd * 1e6 - ct / n_raw * 1e6 + 0.5
        )


# --------------------------------------------- review-fix regression pins


def test_textrank_survives_short_docs(spark):
    """Review finding (live-verified crash): sub-2-token docs hit
    Spark's DESCENDING sequence(1, 0) and indexed element_at(t, 0).
    The guard must make them contribute zero edges, not abort."""
    from flink_210225_spark.ops.text import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "hello"),
            (2, ""),
            (3, "alpha beta gamma alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    rows = textrank_keywords({"documents": docs}).collect()
    assert {r["token"] for r in rows} == {"alpha", "beta", "gamma", "delta"}


def test_char_entropy_survives_empty_docs(spark):
    """Review finding (live-verified divergence): empty text exploded
    two phantom '' rows via sequence(1, 0). Guarded: empty docs are
    invisible to the counts."""
    from flink_210225_spark.ops.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "abab", "en"), (2, "", "en")],
        "doc_id long, text string, lang string",
    )
    row = char_entropy({"documents": docs}).collect()[0]
    assert row["n_chars"] == 4
    assert row["alphabet"] == 2


# ------------------------------------------------------------- haar energy


def test_haar_energy_pyramid_replay(tables):
    """Explicit pyramid walk + Parseval-style identity: total detail
    energy + final approximation spread equals 16x the series variance
    structure (checked via direct recomputation)."""
    import duckdb

    from flink_210225_spark.operators.windows import haar_energy

    rows = {r["level"]: r for r in haar_energy(tables).collect()}
    daily = duckdb.sql(
        "SELECT ts::DATE d, sum(floor(value*100+0.5)::BIGINT)::BIGINT x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    a = daily.x.to_list()[:16]
    total = 0
    for level in (1, 2, 3, 4):
        d = [a[2 * i] - a[2 * i + 1] for i in range(len(a) // 2)]
        a = [a[2 * i] + a[2 * i + 1] for i in range(len(a) // 2)]
        e = sum(v * v for v in d)
        row = rows[level]
        assert row["n_coeffs"] == len(d)
        assert row["energy"] == e
        assert row["scale_days"] == 2**level
        total += e
    shares = sum(r["share_micro"] for r in rows.values())
    assert abs(shares - 1_000_000) <= 4


# ---------------------------------------------------------- storage tiering


def test_storage_tiering_replay(tables):
    import duckdb

    from flink_210225_spark.operators.warehouse import storage_tiering

    got = {r["tier"]: r for r in storage_tiering(tables).collect()}
    per = duckdb.sql(
        "SELECT l_partkey, max(l_shipdate::DATE) ls,"
        " sum(floor(l_extendedprice*(1-l_discount)*100+0.5)::BIGINT)::BIGINT c"
        " FROM '/root/testdata/sf0.001/lineitem.parquet' GROUP BY 1"
    ).df()
    anchor = per.ls.max()
    age = (anchor - per.ls).dt.days
    tiers = np.where(age <= 180, "1_hot", np.where(age <= 720, "2_warm", "3_cold"))
    tot = per.c.sum()
    for t in set(tiers):
        sel = per[tiers == t]
        row = got[t]
        assert row["n_parts"] == len(sel)
        assert row["cents"] == sel.c.sum()
        assert row["revenue_share_micro"] == np.floor(
            sel.c.sum() / tot * 1e6 + 0.5
        )
    assert sum(r["n_parts"] for r in got.values()) == len(per)


# ------------------------------------------------------------ bucket prune


def test_bucket_prune_replay(tables):
    import duckdb

    from flink_210225_spark.operators.colocate import bucket_prune_demo

    got = {r["user_id"]: r for r in bucket_prune_demo(tables).collect()}
    ev = duckdb.sql(
        "SELECT user_id, event_type, floor(value*100+0.5)::BIGINT c"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " WHERE user_id IN (7, 42)"
    ).df()
    for uid, g in ev.groupby("user_id"):
        row = got[uid]
        assert row["n_events"] == len(g)
        assert row["cents"] == g.c.sum()
        assert row["n_types"] == g.event_type.nunique()
    assert set(got) == set(ev.user_id.unique())


# --------------------------------------------------------------------- otsu


def test_otsu_brute_force_replay(tables):
    """Classic float-Otsu brute force must agree with the ratio argmax;
    plus the separation identity w0*mu0 + w1*mu1 == global mean."""
    from flink_210225_spark.ops.multimodal import image_otsu_threshold

    got = {r["asset_id"]: r for r in image_otsu_threshold(tables).collect()}
    for aid, row in list(got.items())[:48]:
        seed = aid % 16
        w = 8 + 4 * (seed % 5)
        h = 8 + 4 * ((seed * 3) % 4)
        x = np.arange(w)
        y = np.arange(h)[:, None]
        px = ((seed * 7 + 3 * x + 11 * y) % 256).ravel()
        n = len(px)
        best_t, best_v = -1, -1.0
        for t in range(255):
            lo = px[px <= t]
            hi = px[px > t]
            if len(lo) == 0 or len(hi) == 0:
                continue
            v = (
                len(lo) / n * len(hi) / n * (lo.mean() - hi.mean()) ** 2
            )
            if v > best_v + 1e-12:
                best_t, best_v = t, v
        assert row["otsu_t"] == best_t
        lo = px[px <= best_t]
        hi = px[px > best_t]
        assert row["n_below"] == len(lo)
        assert row["n_above"] == len(hi)
        assert row["mean_below_micro"] == np.floor(
            lo.sum() / len(lo) * 1e6 + 0.5
        )
        # separation identity
        total_mean = (
            row["n_below"] * row["mean_below_micro"]
            + row["n_above"] * row["mean_above_micro"]
        ) / (row["n_below"] + row["n_above"]) / 1e6
        assert abs(total_mean - px.mean()) < 1e-3


# ----------------------------------------------------------- concentration


def test_user_concentration_replay(tables):
    import duckdb

    from flink_210225_spark.operators.serving import user_concentration

    got = {r["cohort"]: r for r in user_concentration(tables).collect()}
    per = duckdb.sql(
        "SELECT user_id, sum(floor(value*100+0.5)::BIGINT)::BIGINT c"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1"
    ).df().sort_values(["c", "user_id"], ascending=[False, True])
    n, tot = len(per), per.c.sum()
    import math

    prev_share = 0
    for pct, label in ((1, "top_1pct"), (5, "top_5pct"), (10, "top_10pct"),
                       (25, "top_25pct")):
        k = math.ceil(n * pct / 100)
        cohort = per.head(k)
        row = got[label]
        assert row["n_users"] == k
        assert row["cents"] == cohort.c.sum()
        assert row["share_micro"] == np.floor(cohort.c.sum() / tot * 1e6 + 0.5)
        # Lorenz monotonicity + concentration (share > population share)
        assert row["share_micro"] >= prev_share
        assert row["share_micro"] >= pct * 10000
        prev_share = row["share_micro"]
