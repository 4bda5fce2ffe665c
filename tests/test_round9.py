"""Round-9 battery: regression gates for the ADVICE r8 fixes — the RFM
degenerate quartile path (n<4 customers → <3 cut values; both engines must
score a missing threshold as "not exceeded"), bucket_prune catalog
bookkeeping (re-entry drops the previous run's table), the io table-cache
dir fingerprint (in-place fixture regeneration must rotate the key), and
the derived driver-memory default.
"""

import shutil

import duckdb
import pandas as pd
import pytest

from flink_210225_spark.operators import serving

from .oracle import canonical_rows


# ------------------------------------------------- RFM degenerate quartiles


@pytest.mark.parametrize("n_cust", [1, 2, 3])
def test_rfm_degenerate_small_n(spark, n_cust):
    """With n<4 customers the rank identity yields <3 distinct cut ranks,
    so the threshold array has <3 elements; Spark's element_at past the end
    is NULL → when(NULL).otherwise(0) scores 0, and the oracle's COALESCE
    must agree (ADVICE r8 #2 — pre-fix, DuckDB propagated NULL into r/f/m)."""
    pdf = pd.DataFrame(
        {
            "o_custkey": list(range(1, n_cust + 1)),
            "o_orderdate": ["1995-01-01", "1995-03-01", "1995-06-01"][:n_cust],
            "o_totalprice": [10.0, 20.0, 30.0][:n_cust],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = serving.QUERIES["serving_rfm_segments"]({"orders": sdf}).toPandas()
    con = duckdb.connect()
    try:
        con.register("orders", pdf)
        want = con.sql(serving.ORACLES["serving_rfm_segments"]).df()
    finally:
        con.close()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want) == n_cust  # distinct (r,f,m) cells per cust here
    assert canonical_rows(got) == canonical_rows(want)
    # every customer accounted for, no NULL scores anywhere
    assert int(got["n_customers"].sum()) == n_cust
    assert got[["r", "f", "m"]].notna().all().all()


# ------------------------------------------------- bucket_prune bookkeeping


def test_bucket_prune_reentry_drops_previous_table(spark, tables):
    from flink_210225_spark.operators import colocate

    fn = colocate.QUERIES["colocate_bucket_prune"]
    fn(tables).collect()
    fn(tables).collect()
    live = [
        r.tableName
        for r in spark.sql("SHOW TABLES").collect()
        if "bktprune" in r.tableName
    ]
    assert len(live) == 1, f"stale bucket_prune catalog entries: {live}"


# ------------------------------------------------- io cache fingerprint


def test_table_cache_rotates_on_fixture_regeneration(spark, tmp_path):
    from flink_210225_spark.io import TABLES, load_tables

    fix = tmp_path / "sf_regen"
    shutil.copytree("/root/testdata/sf0.001", fix)
    d = str(fix)
    n0 = load_tables(spark, d)["region"].count()
    assert n0 == 5
    # regenerate region IN PLACE (the ADVICE r8 #4 scenario): pre-fix the
    # cached listing/schema survived and served the stale plan
    (fix / "region.parquet").unlink()
    load_tables(spark, "/root/testdata/sf0.001")["region"].limit(3).write.parquet(
        str(fix / "region.parquet")
    )
    n1 = load_tables(spark, d)["region"].count()
    assert n1 == 3, "stale cached plan served after in-place regeneration"
    # untouched dirs keep their cache entry shape (smoke: still loadable)
    assert set(load_tables(spark, d)) == set(TABLES)


# ------------------------------------------------- driver-memory default


def test_driver_mem_default_clamped(monkeypatch):
    import os

    from flink_210225_spark.session import _default_driver_mem

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    v = _default_driver_mem()
    assert v.endswith("g") and 2 <= int(v[:-1]) <= 16
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "3g")
    assert _default_driver_mem() == "3g"
    # quarter-of-RAM derivation on this box
    total_gib = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) / 1024**3
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    assert int(_default_driver_mem()[:-1]) == max(2, min(16, int(total_gib // 4)))


# ------------------------------------------------- new round-9 operators


def test_triangles_clique_semantics(spark):
    """3 identical docs: the md5 star contributes (1,2),(1,3) and the
    Jaccard verifier closes the clique with (2,3) — every member must sit
    in exactly 1 triangle with lcc = 1. The isolated pair (4,5) has
    degree 1 and must NOT appear (lcc undefined below degree 2)."""
    from flink_210225_spark.ops.dedup import triangle_clustering

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "the quick brown fox jumps over the lazy dog", "en"),
            (3, "the quick brown fox jumps over the lazy dog", "en"),
            (4, "pack my box with five dozen liquor jugs", "en"),
            (5, "pack my box with five dozen liquor jugs", "en"),
            (6, "completely unrelated text about mountain weather", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: (r.degree, r.triangles, r.lcc)
        for r in triangle_clustering({"documents": docs}).collect()
    }
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_zorder_prune_beats_linear(tables):
    """The layout comparison must demonstrate the z-order claim on real
    data: identical exact match counts (layout cannot change WHAT
    matches), strictly fewer files scanned for the 2-D box."""
    from flink_210225_spark.operators.warehouse import zorder_prune_stats

    rows = {r.layout: r for r in zorder_prune_stats(tables).collect()}
    assert set(rows) == {"linear", "zorder"}
    assert rows["linear"].rows_matching == rows["zorder"].rows_matching
    assert rows["zorder"].files_scanned < rows["linear"].files_scanned
    assert rows["zorder"].rows_scanned <= rows["linear"].rows_scanned
    for r in rows.values():
        assert r.rows_matching <= r.rows_scanned  # zonemaps never lie


def test_decode_spread_parallelism(tables):
    """The _spread fix: multimodal decode inputs must not run on the
    single scan partition (r9 bench root-cause — 27 s single-threaded vs
    ~1.5 s spread at sf0.1 for the video kernels)."""
    from flink_210225_spark.ops.multimodal import _spread

    docs = tables["documents"]
    assert docs.rdd.getNumPartitions() <= 2  # the premise: tiny scan
    spread = _spread(docs.select("doc_id"))
    assert (
        spread.rdd.getNumPartitions()
        == docs.sparkSession.sparkContext.defaultParallelism
    )


def test_novelty_knn_matches_oracle(tables):
    from flink_210225_spark.ops import similarity

    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        similarity.QUERIES["sim_novelty_knn"](tables),
        similarity.ORACLES["sim_novelty_knn"],
        SF_DIR,
    )


def test_novelty_knn_replays_numpy(tables):
    """Third implementation (the round-6 both-engines-share-a-bug lesson):
    brute-force numpy kNN → integer novelty → decile census must equal the
    Spark kernel's census exactly."""
    import numpy as np

    from flink_210225_spark.ops.similarity import novelty_knn_census

    emb = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 10_000 + 0.5)
        for r in tables["embeddings"].collect()
    }
    emb = {i: v for i, v in emb.items() if (v * v).sum() > 0}
    ids = sorted(emb)
    mat = np.array([emb[i] for i in ids])
    nrm = np.sqrt((mat * mat).sum(axis=1))
    cos = np.floor((mat @ mat.T) / np.outer(nrm, nrm) * 1_000_000 + 0.5) / 1_000_000
    want: dict[int, list] = {}
    for xi, vid in enumerate(ids):
        order = sorted(
            (j for j in range(len(ids)) if j != xi),
            key=lambda j: (-cos[xi][j], ids[j]),
        )[:5]
        sum_ppm = sum(int(round(cos[xi][j] * 1_000_000)) for j in order)
        n_nb = len(order)
        nov_ppm = (n_nb * 1_000_000 - sum_ppm) // n_nb
        band = min((n_nb * 1_000_000 - sum_ppm) * 10 // (n_nb * 1_000_000), 9)
        want.setdefault(band, [0, 10**9, -1, 0])
        w = want[band]
        w[0] += 1
        w[1] = min(w[1], nov_ppm)
        w[2] = max(w[2], nov_ppm)
        w[3] += vid
    got = {
        r.band: [r.n_vecs, r.min_ppm, r.max_ppm, r.id_checksum]
        for r in novelty_knn_census(tables).collect()
    }
    assert got == want


def test_shapley_attribution_brute_force_replay(spark):
    """Non-trivial 4-player game (the fixture's game is degenerate — every
    user touches every channel): synthetic journeys with varied coalitions,
    checked against an itertools brute-force Shapley with exact Fraction
    arithmetic on the SAME ppm-quantized v."""
    from itertools import permutations

    from flink_210225_spark.operators.sessions import shapley_attribution

    # journeys: (user, [touch types], converted)
    journeys = [
        (1, ["click"], 1),
        (2, ["click"], 0),
        (3, ["view"], 0),
        (4, ["view", "click"], 1),
        (5, ["view", "click"], 1),
        (6, ["signup"], 1),
        (7, ["view", "signup"], 1),
        (8, ["error"], 0),
        (9, ["click", "error"], 0),
        (10, ["view", "click", "signup", "error"], 1),
    ]
    rows = []
    eid = 0
    for uid, touches, conv in journeys:
        for t in touches:
            rows.append((eid, uid, t)); eid += 1
        if conv:
            rows.append((eid, uid, "purchase")); eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    got = {r.channel: r.phi_x24_ppm for r in shapley_attribution({"events": ev}).collect()}

    chans = ["click", "error", "signup", "view"]
    sets: dict[frozenset, list] = {}
    for _, touches, conv in journeys:
        s = frozenset(touches)
        sets.setdefault(s, [0, 0])
        sets[s][0] += 1
        sets[s][1] += conv

    def v(s: frozenset) -> int:  # ppm-quantized, 0 for unobserved
        if s in sets:
            n, c = sets[s]
            return c * 1_000_000 // n
        return 0

    # Shapley via the permutation form, x24 to stay integer (4! orders)
    want = {c: 0 for c in chans}
    for order in permutations(chans):
        cur: frozenset = frozenset()
        for c in order:
            want[c] += v(cur | {c}) - v(cur)
            cur = cur | {c}
    assert got == want
    assert sum(got.values()) == 24 * (v(frozenset(chans)) - v(frozenset()))


def test_mmr_rerank_replays_greedy(spark):
    """Brute-force python replay of the exact MMR protocol (6dp-pinned
    cosines -> integer ppm -> greedy 7*rel - 3*maxsim, ties to lowest id)
    on a synthetic 6-vector space with a near-duplicate pair at the top —
    the replay confirms BOTH the arithmetic and that the duplicate is
    demoted behind a sufficiently-relevant distinct candidate."""
    import math

    from flink_210225_spark.ops.similarity import mmr_rerank

    dim = 64

    def vec(*pairs):
        v = [0.0] * dim
        for i, x in pairs:
            v[i] = x
        return v

    rows = [
        (0, vec((0, 1.0))),                      # query
        (1, vec((0, 0.95), (1, 0.3122))),         # top rel
        (2, vec((0, 0.94), (1, 0.3412))),         # near-dup of 1
        (3, vec((0, 0.90), (2, 0.4359))),         # relevant, distinct dim
        (4, vec((0, 0.20), (3, 0.9798))),         # diverse low-rel filler
        (5, vec((4, 1.0))),                       # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r.pick, r.neighbor_id, r.score_x10_ppm)
        for r in sorted(
            mmr_rerank({"embeddings": emb}, num_queries=1, n_cand=4).collect(),
            key=lambda r: r.pick,
        )
    ]

    # float32 round-trip first (the table stores array<float>), then the
    # exact engine protocol in python
    import numpy as np

    v32 = {i: np.array(v, dtype=np.float32).astype(float) for i, v in rows}

    def cos_ppm(x, y):
        c = float(np.dot(v32[x], v32[y])) / (
            math.sqrt(float(np.dot(v32[x], v32[x])))
            * math.sqrt(float(np.dot(v32[y], v32[y])))
        )
        return int(math.floor(c * 1_000_000 + 0.5))

    cand = sorted(range(1, 6), key=lambda n: (-cos_ppm(0, n), n))[:4]
    rel = {n: cos_ppm(0, n) for n in cand}
    picked = [cand[0]]
    want = [(1, cand[0], 7 * rel[cand[0]])]
    for step in (2, 3):
        pool = [n for n in cand if n not in picked]
        scored = sorted(
            (
                (7 * rel[n] - 3 * max(cos_ppm(n, s) for s in picked), n)
                for n in pool
            ),
            key=lambda t: (-t[0], t[1]),
        )
        sc, n = scored[0]
        picked.append(n)
        want.append((step, n, sc))
    assert got == want
    # and the near-duplicate demotion actually happened in this geometry
    assert [n for _, n, _ in want[:2]] == [1, 3]


def test_conformal_interval_replays_python(tables):
    """Python replay of the whole conformal protocol on sf0.001: splits,
    cents quantization, integer train means, the exact calibration order
    statistic, and per-type coverage must match the kernel row-for-row."""
    import hashlib
    import math

    from flink_210225_spark.ops.sampling import conformal_interval

    rows = tables["events"].select("event_id", "event_type", "value").collect()
    by_type: dict[str, dict[str, list]] = {}
    for r in rows:
        h1 = hashlib.md5(str(r.event_id).encode()).hexdigest()[0]
        split = "cal" if h1 in "abc" else "test" if h1 in "def" else "train"
        cents = int(math.floor(r.value * 100 + 0.5))
        by_type.setdefault(r.event_type, {"train": [], "cal": [], "test": []})[
            split
        ].append((r.event_id, cents))
    want = {}
    for et, sp in by_type.items():
        if not sp["train"] or not sp["cal"] or not sp["test"]:
            continue
        n_train = len(sp["train"])
        pred = sum(c for _, c in sp["train"]) // n_train
        cal = sorted((abs(c - pred), eid) for eid, c in sp["cal"])
        n_cal = len(cal)
        k = ((n_cal + 1) * 90 + 99) // 100
        qhat = None if k > n_cal else cal[k - 1][0]
        test = [abs(c - pred) for _, c in sp["test"]]
        n_cov = sum(1 for r_ in test if qhat is None or r_ <= qhat)
        want[et] = (
            n_train, n_cal, qhat, len(test), n_cov,
            n_cov * 1_000_000 // len(test),
        )
    got = {
        r.event_type: (
            r.n_train, r.n_cal, r.qhat_cents, r.n_test, r.n_covered, r.cov_ppm
        )
        for r in conformal_interval(tables).collect()
    }
    assert got == want
    # Realized coverage is ~90% at sf0.1 but noisy on sf0.001's ~35-row
    # calibration slivers (measured floor 78% for one type); the guarantee
    # is in expectation over splits, so the sanity bound is loose — the
    # exact protocol equality above is the real gate.
    assert all(v[5] >= 750_000 for v in got.values())


def test_ab_power_replays_statistics(tables):
    """Statistics replay: the kernel's MDE must match a direct
    numpy/statistics computation (sample variance on cents, the
    normal-approximation MDE identity) to the pinned precision — and
    shrink with sqrt(n): doubling traffic must cut every MDE by ~sqrt 2."""
    import math

    from flink_210225_spark.operators.serving import ab_power_mde

    rows = tables["events"].select("event_type", "value").collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            int(math.floor(r.value * 100 + 0.5))
        )
    got = {r.event_type: r for r in ab_power_mde(tables).collect()}
    assert set(got) == {t for t, xs in by_type.items() if len(xs) >= 2}
    for t, xs in by_type.items():
        n = len(xs)
        if n < 2:
            continue
        s, s2 = sum(xs), sum(x * x for x in xs)
        var = (n * s2 - s * s) / (n * (n - 1))
        mde = 2.8015855 * math.sqrt(2.0 * var / n)
        assert got[t].mde_cents == math.floor(mde * 10000 + 0.5) / 10000
        assert got[t].rel_mde_ppm == math.floor(mde / (s / n) * 1_000_000 + 0.5)
        # statistics.variance cross-check (same quantity, different formula)
        import statistics

        assert abs(var - statistics.variance(xs)) < 1e-6 * max(var, 1.0)
