"""Semantic gates for the round-6 operators (the oracle sweep covers
cross-engine equality; these pin the math against independent references
— brute-force replays, constructed positives, algebraic invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_210225_spark.ops.dedup import tail_head_stitch
from flink_210225_spark.ops.multimodal import (
    audio_clipping,
    image_border_detect,
    image_contrast,
    video_fingerprint_groups,
)
from flink_210225_spark.ops.sampling import chronological_cv, grouped_split, matched_pairs
from flink_210225_spark.ops.similarity import hubness_audit, triplet_mining
from flink_210225_spark.ops.text import (
    code_detect,
    encoding_audit,
    preference_pairs,
    simpson_diversity,
    watermark_detect,
)
from flink_210225_spark.operators.serving import price_elasticity
from flink_210225_spark.operators.warehouse import row_policy_audit
from flink_210225_spark.operators.windows import page_hinkley


def test_watermark_natural_text_scores_near_zero(tables):
    """Natural (non-generated) text hits the 50% green rate in expectation:
    the corpus-wide green fraction must sit near γ=0.5 and the flagged
    rate must be the z>2 tail, not the bulk."""
    rows = watermark_detect(tables).collect()
    total_t = sum(r["n_bigrams"] for r in rows)
    total_g = sum(r["n_green"] for r in rows)
    assert 0.45 < total_g / total_t < 0.55
    flagged = sum(r["flagged"] for r in rows)
    assert flagged / len(rows) < 0.1


def test_watermark_flags_constructed_watermarked_doc(spark):
    """A greedily green-picked token sequence (always choose a continuation
    whose bigram hashes green) must z-score far above 2 — the detector
    detects what it claims to."""
    import hashlib

    vocab = [f"w{i}" for i in range(50)]
    toks = ["w0"]
    for _ in range(120):
        prev = toks[-1]
        pick = next(
            w
            for w in vocab
            if int(hashlib.md5(f"{prev}|{w}".encode()).hexdigest()[:4], 16) < 32768
        )
        toks.append(pick)
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = watermark_detect({"documents": df}).first()
    assert got["n_green"] == got["n_bigrams"]
    assert got["flagged"] == 1 and got["z6"] > 2


def test_simpson_extremes(spark):
    """All-same tokens → collision index 1; all-distinct → 0."""
    df = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "b c d e f g")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in simpson_diversity({"documents": df}).collect()}
    assert got[1]["simpson6"] == 1.0 and got[1]["flag_low_diversity"] == 1
    assert got[2]["simpson6"] == 0.0 and got[2]["top_share6"] < 0.3


def test_encoding_audit_injection_is_exercised(tables):
    """Every %7 doc carries exactly one control char, every %11 (and not
    %7) doc one replacement char; everything else is clean ASCII."""
    for r in encoding_audit(tables).collect():
        if r["doc_id"] % 7 == 0:
            assert r["n_ctrl"] == 1 and r["flag_encoding"] == 1
        elif r["doc_id"] % 11 == 0:
            assert r["n_repl"] == 1 and r["flag_encoding"] == 1
        else:
            assert r["flag_encoding"] == 0 and r["n_nonascii"] == 0


def test_code_detect_flags_exactly_the_injected_class(tables):
    for r in code_detect(tables).collect():
        assert r["flag_code"] == (1 if r["doc_id"] % 5 == 0 else 0)


def test_preference_margin_nonnegative_and_ids_distinct(tables):
    for r in preference_pairs(tables).collect():
        assert r["margin"] >= 0
        assert r["chosen_id"] != r["rejected_id"]
        assert r["n_stratum"] >= 2


def test_triplet_semi_hard_negative_is_inside_margin(tables):
    """When semi_hard=1 the negative must sit strictly below the positive
    cosine (the FaceNet rule); when 0 the fallback hardest negative must
    violate it (cos_neg >= cos_pos)."""
    for r in triplet_mining(tables).collect():
        if r["semi_hard"] == 1:
            assert r["neg_cos6"] < r["pos_cos6"] and r["margin6"] > 0
        else:
            assert r["neg_cos6"] >= r["pos_cos6"]


def test_hubness_histogram_accounts_every_edge_and_node(tables):
    """Σ(in_deg · n_nodes) == total kNN edges (n_valid_nodes × k) and
    Σ n_nodes == the norm-guarded node count."""
    rows = hubness_audit(tables).collect()
    n_nodes = sum(r["n_nodes"] for r in rows)
    n_edges = sum(r["in_deg"] * r["n_nodes"] for r in rows)
    assert n_edges == n_nodes * 5


def test_image_contrast_bounds(tables):
    for r in image_contrast(tables).collect():
        assert 0 <= r["mean6"] <= 255
        assert 0 <= r["rms6"] <= 128  # pop stddev of [0,255] is ≤ 127.5
        assert r["michelson6"] is None or 0 <= r["michelson6"] <= 1


def test_image_border_pads_match_construction(tables):
    """Detected pads must equal the constructed seed-derived pads — the
    all-zero-interior impossibility argument, checked not assumed."""
    for r in image_border_detect(tables).limit(64).collect():
        s = r["seed"]
        assert r["pad_top"] == s % 3
        assert r["pad_bottom"] == (s * 2) % 3
        assert r["pad_left"] == s % 2
        assert r["pad_right"] == (s + 1) % 2


def test_audio_clipping_matches_brute_force(tables):
    """Re-derive clipped count and max run from the PCM formula for a
    sample of assets."""
    rows = audio_clipping(tables).limit(32).collect()
    for r in rows:
        doc_id, n = r["asset_id"], r["n_samples"]
        clipped = [
            abs((((doc_id * 31 + k * 7) % 256) - 128) * 256) >= 30000
            for k in range(n)
        ]
        runs, cur = [0], 0
        for c in clipped:
            cur = cur + 1 if c else 0
            runs.append(cur)
        assert r["n_clipped"] == sum(clipped)
        assert r["max_run"] == max(runs)


def test_video_fingerprint_groups_cover_every_clip(tables):
    """Groups are profile-keyed: 24 profiles, every clip in exactly one
    group, membership sums add to the doc-id total."""
    rows = video_fingerprint_groups(tables).collect()
    n_docs = tables["documents"].count()
    assert sum(r["n_clips"] for r in rows) == n_docs
    total = tables["documents"].agg(F.sum("doc_id")).collect()[0][0]
    assert sum(r["sum_doc_ids"] for r in rows) == total


def test_tail_head_stitch_finds_every_injected_pair(tables):
    """Every (i, i+1) pair with i%10==0 whose modified doc and successor
    both have ≥8 tokens must be detected."""
    docs = tables["documents"].select("doc_id", "text").collect()
    by_id = {r["doc_id"]: r["text"] for r in docs}
    got = {(r["doc_a"], r["doc_b"]) for r in tail_head_stitch(tables).collect()}
    for i in by_id:
        if i % 10 == 0 and (i + 1) in by_id:
            nxt = by_id[i + 1].split()
            if len(nxt) >= 8:
                assert (i, i + 1) in got, f"missed injected stitch ({i},{i+1})"


def test_grouped_split_has_zero_leakage_and_covers_everyone(tables):
    rows = grouped_split(tables).collect()
    assert all(r["n_leaked_groups"] == 0 for r in rows)
    assert sum(r["n_events"] for r in rows) == tables["events"].count()


def test_chronological_cv_train_precedes_test(tables):
    """Within every fold the train partition is exactly the rank prefix:
    train rows == b_i and test rows == b_{i+1} - b_i."""
    n = tables["events"].count()
    got = {(r["fold"], r["role"]): r["n_rows"] for r in chronological_cv(tables).collect()}
    for i in range(1, 5):
        assert got[(i, "train")] == (i * n) // 5
        assert got[(i, "test")] == ((i + 1) * n) // 5 - (i * n) // 5


def test_matched_pairs_are_balanced_and_disjoint(tables):
    rows = matched_pairs(tables).collect()
    cases = [r["case_user"] for r in rows]
    controls = [r["control_user"] for r in rows]
    assert len(set(cases)) == len(cases)
    assert len(set(controls)) == len(controls)
    assert not set(cases) & set(controls)


def test_row_policy_partitions_customers(tables):
    """Region roles partition the customer table: visible counts sum to
    the table size and the unassigned row is zero."""
    rows = {r["role"]: r for r in row_policy_audit(tables).collect()}
    assert rows["__unassigned__"]["n_visible"] == 0
    total = sum(r["n_visible"] for n, r in rows.items() if n != "__unassigned__")
    assert total == tables["customer"].count()


def test_price_elasticity_matches_brute_force(tables):
    """Recompute the midpoint-formula cross-multiply from the (brand,
    month) aggregates in pure Python for every emitted pair."""
    import math

    li = tables["lineitem"]
    p = tables["part"]
    agg = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.floor("l_quantity")).alias("q"),
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5)).alias("r"),
        )
        .collect()
    )
    bm = {(r["p_brand"], r["month"]): (int(r["q"]), int(r["r"])) for r in agg}
    # lag() runs over each brand's OWN month series (calendar gaps skip)
    per_brand: dict = {}
    for b, m in bm:
        per_brand.setdefault(b, []).append(m)
    prev = {}
    for b, ms in per_brand.items():
        ms.sort()
        for m1, m2 in zip(ms, ms[1:]):
            prev[(b, m2)] = (b, m1)
    for r in price_elasticity(tables).collect():
        b, m2 = r["brand"], r["month"]
        q2, r2 = bm[(b, m2)]
        _, m1 = prev[(b, m2)]
        q1, r1 = bm[(b, m1)]
        num = (q2 - q1) * (r2 * q1 + r1 * q2)
        den = (q2 + q1) * (r2 * q1 - r1 * q2)
        assert den != 0
        want = math.floor(num / den * 1000000 + 0.5) / 1000000
        assert r["e6"] == want, (b, m2, r["e6"], want)
        assert r["q1"] == q1 and r["q2"] == q2


def test_page_hinkley_max_is_brute_force_max(spark, tables):
    """Recompute the scaled PH statistic per event type in pure Python."""
    daily = (
        tables["events"]
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    got = {r["event_type"]: r for r in page_hinkley(tables).collect()}
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        n, s = len(xs), sum(xs)
        m, mn, best = 0, 0, 0
        prefix = 0
        for t, x in enumerate(xs, 1):
            prefix += x
            m = n * prefix - t * s
            mn = min(mn, m)
            best = max(best, m - mn)
        assert got[et]["max_ph_scaled"] == best
        assert got[et]["n_days"] == n


def test_gmv_bridge_reconciles_to_headline_delta(tables):
    """Per month: Σ brand deltas must equal total GMV(m) − total GMV(prev)
    — the waterfall property (disappeared brands must bridge to 0)."""
    from flink_210225_spark.operators.serving import gmv_bridge

    li, p = tables["lineitem"], tables["part"]
    totals = {
        r["month"]: r["t"]
        for r in li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5)).alias("t"))
        .collect()
    }
    months = sorted(totals)
    prev = dict(zip(months[1:], months))
    per_month: dict = {}
    for r in gmv_bridge(tables).collect():
        per_month[r["month"]] = per_month.get(r["month"], 0) + r["delta_cents"]
    for m, s in per_month.items():
        assert s == totals[m] - totals[prev[m]], m


def test_stop_shingles_mass_identity(tables):
    """pairs_before − pairs_after must equal the stop shingles' own pair
    mass, recomputed from the df histogram."""
    from flink_210225_spark.ops.dedup import stop_shingles, shingles_col

    row = stop_shingles(tables).first()
    docs = tables["documents"]
    n_docs = docs.count()
    cutoff = (n_docs * 10) // 100
    dfs = (
        docs.select(F.explode(shingles_col(F.col("text"), 3)).alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    before = sum(r["df"] * (r["df"] - 1) // 2 for r in dfs)
    after = sum(r["df"] * (r["df"] - 1) // 2 for r in dfs if r["df"] <= cutoff)
    assert row["pairs_before"] == before
    assert row["pairs_after"] == after
    assert row["n_stop"] == sum(1 for r in dfs if r["df"] > cutoff)


def test_preference_pairs_fully_tied_stratum_not_degenerate(spark):
    """A stratum where every doc scores identically must still pair two
    DISTINCT documents (the worst-rank window tie-breaks doc_id DESC for
    exactly this reason — with ASC both windows land on the min doc_id
    and emit a chosen==rejected self-pair the oracle would replicate)."""
    from flink_210225_spark.ops.text import preference_pairs

    df = spark.createDataFrame(
        [
            (1, "same text here okay", "en", "s", 19),
            (2, "same text here okay", "en", "s", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = preference_pairs({"documents": df}).collect()
    assert len(rows) == 1
    assert rows[0]["chosen_id"] != rows[0]["rejected_id"]
    assert rows[0]["margin"] == 0.0
