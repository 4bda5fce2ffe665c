"""Semantic gates for the round-5 wave-A operators (the oracle sweep covers
cross-engine equality; these pin the math against independent references)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_210225_spark.operators.serving import mann_whitney, retention_matrix, wilson_ci
from flink_210225_spark.operators.windows import binary_changepoint
from flink_210225_spark.ops.dedup import graph_modularity
from flink_210225_spark.ops.sampling import negative_downsample
from flink_210225_spark.ops.similarity import embedding_drift
from flink_210225_spark.sources.jsonl import multiline_stack_counts


def test_mann_whitney_matches_pure_python(spark, tables):
    rows = (
        tables["events"]
        .where(F.col("event_type").isin("click", "view"))
        .select("event_type", "value")
        .collect()
    )
    vals = sorted(r["value"] for r in rows)
    # 2x-scaled average ranks via bisect over the sorted list
    import bisect

    def rank2(v):
        lo = bisect.bisect_left(vals, v)
        hi = bisect.bisect_right(vals, v)
        return 2 * lo + (hi - lo) + 1  # 2*cl + tie + 1

    r1_x2 = sum(rank2(r["value"]) for r in rows if r["event_type"] == "click")
    n1 = sum(1 for r in rows if r["event_type"] == "click")
    got = mann_whitney(tables).first()
    assert got["n1"] == n1
    assert got["u1_x2"] == r1_x2 - n1 * (n1 + 1)


def test_wilson_interval_brackets_point_estimate(tables):
    for r in wilson_ci(tables).collect():
        p = r["k"] / r["n"]
        assert r["lo"] <= p <= r["hi"]
        assert 0.0 <= r["lo"] <= r["hi"] <= 1.0


def test_retention_week_zero_is_full_cohort(tables):
    rows = retention_matrix(tables).collect()
    w0 = {r["cohort_wk"]: r for r in rows if r["weeks_since"] == 0}
    # Every user is active in their own cohort week by construction.
    for r in w0.values():
        assert r["active_users"] == r["cohort_size"]
        assert r["retention_pct"] == 1.0


def test_changepoint_is_argmax_of_brute_force(spark, tables):
    ev = tables["events"].groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("pv"))
    pdf = ev.toPandas()
    lo, hi = pdf["day"].min(), pdf["day"].max()
    import datetime as dt

    days = [lo + dt.timedelta(days=i) for i in range((hi - lo).days + 1)]
    got = {r["event_type"]: r for r in binary_changepoint(tables).collect()}
    for etype, grp in pdf.groupby("event_type"):
        cnt = dict(zip(grp["day"], grp["pv"]))
        xs = [int(cnt.get(d, 0)) for d in days]
        n, s = len(xs), sum(xs)
        best = None
        sl = 0
        for k in range(1, n):
            sl += xs[k - 1]
            diff = sl * (n - k) - (s - sl) * k
            score = float(diff) * float(diff) / float(k * (n - k) * n)
            score = int(score * 1_000_000 + 0.5) / 1_000_000
            if best is None or score > best[0]:
                best = (score, days[k - 1])
        assert str(got[etype]["change_day"]) == str(best[1])
        assert abs(got[etype]["score"] - best[0]) < 1e-9


def test_negative_downsample_keeps_all_positives(tables):
    rows = {r["label"]: r for r in negative_downsample(tables).collect()}
    assert rows["pos"]["n_kept"] == rows["pos"]["n_total"]
    # thinned to ~2 negatives per positive (md5 Bernoulli: loose band)
    target = 2 * rows["pos"]["n_total"]
    assert rows["neg"]["n_kept"] <= rows["neg"]["n_total"]
    assert abs(rows["neg"]["n_kept"] - target) < 0.2 * target + 50


def test_multiline_reassembles_every_event(tables):
    rows = multiline_stack_counts(tables).collect()
    n_events = tables["events"].count()
    assert sum(r["n_records"] for r in rows) == n_events
    for r in rows:
        assert r["n_lines"] == (3 if r["event_type"] == "error" else 1)


def test_modularity_terms_are_bounded(tables):
    rows = graph_modularity(tables).collect()
    q = sum(r["q_term"] for r in rows)
    assert -0.5 <= q <= 1.0
    for r in rows:
        # intra edges have both endpoints in the language: 2*m_c <= d_c
        assert 2 * r["intra_edges"] <= r["degree_sum"]


def test_embedding_drift_bounds(tables):
    rows = embedding_drift(tables).collect()
    assert len(rows) == 64
    for r in rows:
        assert 0.0 <= r["tvd"] <= 1.0


def test_knn_graph_shape_and_self_exclusion(tables):
    from flink_210225_spark.ops.similarity import knn_graph

    rows = knn_graph(tables).collect()
    n_nodes = tables["embeddings"].count()
    assert len(rows) == 5 * n_nodes
    by_node = {}
    for r in rows:
        assert r["neighbor_id"] != r["vec_id"]
        by_node.setdefault(r["vec_id"], []).append((r["rank"], r["cos6"]))
    for picks in by_node.values():
        picks.sort()
        assert [p[0] for p in picks] == [1, 2, 3, 4, 5]
        # cosine non-increasing down the ranks
        cs = [p[1] for p in picks]
        assert all(a >= b for a, b in zip(cs, cs[1:]))


def test_temporal_split_is_80_20_and_disjoint(tables):
    from flink_210225_spark.ops.sampling import temporal_split

    rows = temporal_split(tables).collect()
    n = tables["events"].count()
    n_train = sum(r["n_rows"] for r in rows if r["split"] == "train")
    assert n_train == (80 * n) // 100
    assert sum(r["n_rows"] for r in rows) == n


def test_late_arriving_counts_the_delayed_subset(tables):
    from flink_210225_spark.operators.warehouse import late_arriving_facts

    rows = late_arriving_facts(tables).collect()
    n_late = sum(r["n_late"] for r in rows)
    # every %13 event is delivered 10 min late; only those whose delay
    # crosses a later event's ts land late (at sf0.001 inter-arrival gaps
    # are ~2 h, so few do — density, not the rule, drives the count)
    n13 = tables["events"].where(F.col("event_id") % 13 == 0).count()
    assert 0 < n_late <= n13
    assert max(r["max_delay_us"] for r in rows) <= 600_000_000


def test_vocab_coverage_rates_bounded(tables):
    from flink_210225_spark.ops.text import vocab_coverage

    for r in vocab_coverage(tables).collect():
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] < 1.0


def test_knn_graph_matches_numpy_brute_force(tables):
    """Exact top-5 per node vs a NumPy brute force on the SAME quantized
    integers — pick-for-pick, including tie-breaks."""
    import numpy as np

    from flink_210225_spark.ops.similarity import knn_graph

    pdf = tables["embeddings"].select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    q = np.floor(np.array(pdf["embedding"].tolist(), dtype=np.float64) * 10_000 + 0.5)
    nrm = np.sqrt((q * q).sum(axis=1))
    cos = (q @ q.T) / np.outer(nrm, nrm)
    cos = np.floor(cos * 1_000_000 + 0.5) / 1_000_000
    want = {}
    for i in range(len(ids)):
        row = cos[i].copy()
        row[i] = -2.0
        order = np.lexsort((ids, -row))[:5]
        want[int(ids[i])] = [(r + 1, int(ids[j])) for r, j in enumerate(order)]
    got = {}
    for r in knn_graph(tables).collect():
        got.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor_id"]))
    for k in want:
        assert sorted(got[k]) == want[k], f"node {k}"


def test_drawdown_zero_only_if_monotone_rising(tables):
    from flink_210225_spark.operators.windows import max_drawdown

    for r in max_drawdown(tables).collect():
        assert r["drawdown_cents"] >= 0
        assert 0.0 <= r["depth"] < 1.0
        assert r["peak_cents"] > 0


def test_image_quantize_error_is_consistent(tables):
    """Per band: palette is the floor-mean, so |p − palette| < 64 and the
    per-pixel mean squared error is bounded by the band width squared."""
    from flink_210225_spark.ops.multimodal import image_quantize_palette

    for r in image_quantize_palette(tables).limit(200).collect():
        assert 64 * r["band"] <= r["palette"] < 64 * (r["band"] + 1)
        assert 0 <= r["sq_err"] <= r["n_px"] * 64 * 64
