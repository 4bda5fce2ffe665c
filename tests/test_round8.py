"""Round-8 battery: oracle-match gates for the new queries PLUS
third-implementation semantic replays for the genuinely new kernels
(Theil–Sen, NDCG/MRR, Sobel, Heaps curve, RFM quartiles, the PQ
degenerate-identity gates) — per the round-6 lesson that both engines can
share a wrong definition, every new family gets a check the cross-engine
hash gate cannot provide."""

import numpy as np

from flink_210225_spark.operators import serving, windows
from flink_210225_spark.ops import multimodal, similarity, text
from flink_210225_spark.streaming import sql_jobs

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


# ------------------------------------------------------------ oracle gates


def _gate(mod, name, tables):
    assert_matches_oracle(mod.QUERIES[name](tables), mod.ORACLES[name], SF_DIR)


def test_percentile_bands_matches_oracle(tables):
    _gate(serving, "serving_percentile_bands", tables)


def test_rfm_segments_matches_oracle(tables):
    _gate(serving, "serving_rfm_segments", tables)


def test_group_by_all_matches_oracle(tables):
    _gate(sql_jobs, "sql_group_by_all", tables)


def test_heaps_law_matches_oracle(tables):
    _gate(text, "text_heaps_law", tables)


def test_theil_sen_matches_oracle(tables):
    _gate(windows, "window_theil_sen_daily", tables)


def test_image_sobel_matches_oracle(tables):
    _gate(multimodal, "multimodal_image_sobel", tables)


def test_mrr_ndcg_matches_oracle(tables):
    _gate(text, "text_mrr_ndcg_eval", tables)


def test_pq_k1_identity_matches_oracle(tables):
    _gate(similarity, "sim_pq_k1_identity", tables)


def test_ivfpq_residual_exact_matches_oracle(tables):
    _gate(similarity, "sim_ivfpq_residual_exact", tables)


# ------------------------------------------------- third-impl replays


def test_theil_sen_replays_numpy(tables):
    """Median-of-pairwise-slopes recomputed straight from the daily series
    with numpy — independent of both engines' window/join machinery."""
    import duckdb

    daily = duckdb.sql(
        "SELECT ts::DATE AS day,"
        " sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS y"
        f" FROM '{SF_DIR}/events.parquet'"
        " WHERE event_type = 'purchase' GROUP BY 1 ORDER BY day"
    ).df()
    t = (daily["day"] - daily["day"].min()).dt.days.to_numpy(dtype=np.int64)
    y = daily["y"].to_numpy(dtype=np.int64)
    slopes = [
        (y[j] - y[i]) / (t[j] - t[i])
        for i in range(len(y))
        for j in range(i + 1, len(y))
    ]
    med = float(np.median(slopes))
    icept = float(np.median(y.astype(np.float64) - med * t))
    row = windows.QUERIES["window_theil_sen_daily"](tables).collect()[0]
    assert row["n_days"] == len(y)
    assert row["n_pairs"] == len(slopes)
    assert abs(row["slope6"] - med) < 1e-6
    assert abs(row["intercept6"] - icept) < 1e-6


def test_sobel_replays_direct_convolution(tables):
    """Per-image Sobel census recomputed with an explicit convolution loop
    over the SYNTHESIS FORMULA (no PNG, no slicing tricks) for a sample of
    assets — independent of the codec path and of both engines."""
    out = {
        r["asset_id"]: r
        for r in multimodal.QUERIES["multimodal_image_sobel"](tables)
        .where("asset_id < 32")
        .collect()
    }
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    for doc_id in range(32):
        seed = doc_id % 16
        w = 8 + 4 * (seed % 5)
        h = 8 + 4 * ((seed * 3) % 4)
        img = np.array(
            [[(seed * 7 + 3 * x + 11 * y) % 256 for x in range(w)] for y in range(h)],
            dtype=np.int64,
        )
        es = []
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                blk = img[y - 1 : y + 2, x - 1 : x + 2]
                gx = int((blk * kx).sum())
                gy = int((blk * kx.T).sum())
                es.append(abs(gx) + abs(gy))
        r = out[doc_id]
        assert r["n_interior"] == len(es)
        assert r["grad_abs_sum"] == sum(es)
        assert r["grad_max"] == max(es)
        assert r["n_edge"] == sum(1 for e in es if e >= 128)


def test_ndcg_replays_numpy(tables):
    """NDCG/MRR recomputed from raw texts with plain Python sets/sorting
    for every query — independent of both engines' joins and windows."""
    import duckdb
    import math

    docs = duckdb.sql(
        f"SELECT doc_id, lower(trim(text)) AS t FROM '{SF_DIR}/documents.parquet'"
    ).df()
    toks = {r.doc_id: r.t.split() for r in docs.itertuples()}
    uni = {d: set(ts) for d, ts in toks.items()}
    bg = {
        d: set(" ".join(ts[i : i + 2]) for i in range(len(ts) - 1))
        for d, ts in toks.items()
    }
    got = {
        r["query_id"]: r
        for r in text.QUERIES["text_mrr_ndcg_eval"](tables).collect()
    }
    for q in range(8):
        cand = [
            (d, len(uni[q] & uni[d]), min(3, len(bg[q] & bg[d])))
            for d in uni
            if d != q and uni[q] & uni[d]
        ]
        ranked = sorted(cand, key=lambda c: (-c[1], c[0]))
        ideal = sorted(cand, key=lambda c: (-c[2], c[0]))
        dcg = sum(
            (2.0 ** rel - 1) / math.log2(pos + 2)
            for pos, (_, _, rel) in enumerate(ranked[:10])
        )
        idcg = sum(
            (2.0 ** rel - 1) / math.log2(pos + 2)
            for pos, (_, _, rel) in enumerate(ideal[:10])
        )
        first = next(
            (pos + 1 for pos, (_, _, rel) in enumerate(ranked[:10]) if rel >= 1),
            None,
        )
        r = got[q]
        assert r["n_cand"] == len(cand)
        if idcg > 0:
            assert abs(r["ndcg6"] - dcg / idcg) < 2e-6
        if first is not None:
            assert abs(r["mrr6"] - 1.0 / first) < 1e-6
        else:
            assert r["mrr6"] is None


def test_heaps_curve_is_monotone_and_totals(tables):
    """Structural invariants independent of the decile arithmetic: the
    curve is non-decreasing in both coordinates, ends at the full corpus
    doc count, and the final vocab equals the corpus-wide distinct token
    count recomputed flat."""
    import duckdb

    rows = sorted(
        text.QUERIES["text_heaps_law"](tables).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == list(range(1, 11))
    assert all(a["n_docs"] <= b["n_docs"] for a, b in zip(rows, rows[1:]))
    assert all(a["vocab"] <= b["vocab"] for a, b in zip(rows, rows[1:]))
    flat = duckdb.sql(
        "SELECT count(DISTINCT tok), count(DISTINCT doc_id) FROM ("
        " SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),"
        " '\\s+')) AS tok"
        f" FROM '{SF_DIR}/documents.parquet') WHERE tok <> ''"
    ).fetchone()
    assert rows[-1]["vocab"] == flat[0]
    assert rows[-1]["n_docs"] == flat[1]


def test_rfm_census_partitions_customers(tables):
    """The segment census partitions the active-customer set exactly, all
    codes are in 1..4, and each quartile's population is within the
    arithmetic bound of the threshold rule (≤ ceil(n/4) at or below each
    cut rank plus ties above it — every customer appears exactly once)."""
    rows = serving.QUERIES["serving_rfm_segments"](tables).collect()
    import duckdb

    n = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n
    for r in rows:
        assert 1 <= r["r"] <= 4 and 1 <= r["f"] <= 4 and 1 <= r["m"] <= 4


def test_pq_k1_identity_is_variance(tables):
    """The degenerate PQ gate's own claim, re-derived with numpy: k=1
    coding mse per vector == squared deviation from the per-dim corpus
    mean / dim."""
    emb = (
        tables["embeddings"].select("vec_id", "embedding").toPandas()
    )
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    mu = mat.mean(axis=0)
    want = ((mat - mu) ** 2).sum(axis=1) / mat.shape[1]
    got = (
        similarity.QUERIES["sim_pq_k1_identity"](tables)
        .orderBy("vec_id")
        .toPandas()
    )
    assert (got["n_codes"] == 8).all()
    assert (got["code_sum"] == 0).all()
    order = np.argsort(emb["vec_id"].to_numpy())
    np.testing.assert_allclose(
        got["mse6"].to_numpy(), np.floor(want[order] * 1e6 + 0.5) / 1e6, atol=2e-6
    )


def test_ivfpq_residual_exact_is_brute_force(tables):
    """The degenerate IVFPQ-residual gate replayed as plain brute-force kNN
    with numpy over the 16-vector corpus."""
    emb = tables["embeddings"].where("vec_id < 16").toPandas()
    ids = emb["vec_id"].to_numpy()
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    got = similarity.QUERIES["sim_ivfpq_residual_exact"](tables).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(8))
    for q in range(8):
        d2 = ((mat - mat[q]) ** 2).sum(axis=1) / mat.shape[1]
        cand = sorted(
            ((float(np.floor(d * 1e6 + 0.5) / 1e6), int(i)) for d, i in zip(d2, ids) if i != q)
        )[:3]
        rows = sorted(by_q[q], key=lambda r: r["rank"])
        assert [(r["exact_d"], r["neighbor_id"]) for r in rows] == cand


def test_percentile_bands_replays_numpy(tables):
    """percentile_cont/disc recomputed with numpy's 'linear' and
    'inverted_cdf' quantile methods per priority group."""
    import duckdb

    o = duckdb.sql(
        "SELECT o_orderpriority AS p,"
        " floor(o_totalprice * 100 + 0.5)::BIGINT AS cents"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).df()
    got = {
        r["priority"]: r
        for r in serving.QUERIES["serving_percentile_bands"](tables).collect()
    }
    for p, grp in o.groupby("p"):
        v = np.sort(grp["cents"].to_numpy(dtype=np.float64))
        r = got[p]
        assert r["n_orders"] == len(v)
        for q, col in ((0.5, "p50_cents"), (0.9, "p90_cents"), (0.99, "p99_cents")):
            assert abs(r[col] - np.quantile(v, q, method="linear")) < 1e-6
        # percentile_disc: smallest value whose cume_dist >= q
        k = int(np.ceil(0.9 * len(v)))
        assert r["p90_disc_cents"] == int(v[k - 1])


def test_no_module_registers_a_query_name_twice():
    """Dict assignment silently shadows: QUERIES["x"] = f twice in one
    module replaces the first registration with no collision anywhere
    (the cross-module uniqueness test sees only the final dict). Caught
    live in round 8 (the daily Theil-Sen overwrote the monthly one) —
    this scans every registry module's SOURCE for literal
    QUERIES[...]= / ORACLES[...]= statements and asserts each name is
    bound at most once per module."""
    import inspect
    from collections import Counter

    import __spark_entry__ as entry_mod

    import ast

    for mod in entry_mod._registry_modules():
        tree = ast.parse(inspect.getsource(mod))
        names = {"QUERIES": [], "ORACLES": []}
        for node in ast.walk(tree):
            # QUERIES = { "name": ... } literal keys
            if isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if (
                        isinstance(tgt, ast.Name)
                        and tgt.id in names
                        and isinstance(node.value, ast.Dict)
                    ):
                        for k in node.value.keys:
                            if isinstance(k, ast.Constant):
                                names[tgt.id].append(k.value)
                    # QUERIES["name"] = ... subscript rebinds
                    if (
                        isinstance(tgt, ast.Subscript)
                        and isinstance(tgt.value, ast.Name)
                        and tgt.value.id in names
                        and isinstance(tgt.slice, ast.Constant)
                    ):
                        names[tgt.value.id].append(tgt.slice.value)
        for kind, ns in names.items():
            dupes = [n for n, c in Counter(ns).items() if c > 1]
            assert not dupes, f"{mod.__name__} rebinds {kind} keys: {dupes}"
        # same class of bug one level up: a second top-level `def name`
        # silently shadows the first (round 8 hit this twice — the daily
        # Theil-Sen over window_theil_sen, the quartile census over the
        # quintile rfm_segments)
        defs = [
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        ddupes = [n for n, c in Counter(defs).items() if c > 1]
        assert not ddupes, f"{mod.__name__} defines twice: {ddupes}"


# ------------------------------------------------- bonus-wave gates


def test_session_variables_matches_oracle(tables):
    _gate(sql_jobs, "sql_session_variables", tables)


def test_purged_walkforward_matches_oracle(tables):
    from flink_210225_spark.ops import sampling

    _gate(sampling, "sample_purged_walkforward", tables)


def test_file_skew_audit_matches_oracle(tables):
    from flink_210225_spark.operators import warehouse

    _gate(warehouse, "warehouse_file_skew_audit", tables)


def test_recursive_cte_matches_oracle(tables):
    _gate(sql_jobs, "sql_recursive_cte", tables)


def test_purged_walkforward_never_leaks(tables):
    """Structural CV invariants independent of the band arithmetic: test
    folds partition the corpus, every fold's purge gap holds, and train
    size is non-decreasing in fold order (walk-forward property)."""
    import duckdb

    from flink_210225_spark.ops import sampling

    rows = sorted(
        sampling.QUERIES["sample_purged_walkforward"](tables).collect(),
        key=lambda r: r["fold"],
    )
    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert sum(r["n_test"] for r in rows) == total
    assert all(r["leak_ok"] for r in rows)
    trains = [r["n_train"] for r in rows]
    assert trains == sorted(trains)
    assert trains[0] == 0  # fold 1 has no history before its gap
    for r in rows[1:]:
        assert r["train_max_off"] + 2 < r["test_min_off"]


def test_file_skew_layout_invariants(tables):
    """One file per partition under the repartition-by-key writer, footer
    row counts reconcile with the data, and the census covers every
    event exactly once."""
    import duckdb

    from flink_210225_spark.operators import warehouse

    rows = warehouse.QUERIES["warehouse_file_skew_audit"](tables).collect()
    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert all(r["n_files"] == 1 for r in rows)
    assert all(r["rows_match"] for r in rows)
    assert sum(r["data_rows"] for r in rows) == total
