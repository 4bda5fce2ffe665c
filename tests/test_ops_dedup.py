import pytest

from flink_210225_spark.ops import dedup

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_normalized",
        "dedup_ngram_jaccard",
        "dedup_keep_best",
        "dedup_shingle_hotspots",
    ],
)
def test_dedup_matches_oracle(name, tables):
    assert_matches_oracle(dedup.QUERIES[name](tables), dedup.ORACLES[name], SF_DIR)


@pytest.fixture(scope="module")
def dup_docs(spark):
    words = [f"tok{i}" for i in range(60)]
    base = " ".join(words)  # 58 shingles
    near_words = list(words)
    near_words[30] = "changed"  # 3 shingles differ -> jaccard ~ 55/61 ≈ 0.90
    near = " ".join(near_words)
    other = "completely different words describing nothing of relevance to foxes"
    rows = [(1, base), (2, base), (3, near), (4, other)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_dups(dup_docs):
    cand = dedup.minhash_lsh_candidates({"documents": dup_docs}).collect()
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in cand}
    assert pairs[(1, 2)] == 1.0  # exact dup always collides with estimate 1
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup caught by some band
    assert all(o not in p for p in pairs for o in [4]) or pairs  # 4 may appear only by chance


def test_minhash_candidates_cover_true_pairs(tables):
    """LSH recall on fixture data: every exact-Jaccard pair ≥ 0.8 must appear
    among LSH candidates (16 hashes / 4 bands → collision prob ≥ 0.97 @ 0.8)."""
    truth = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(tables, threshold=0.8).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_candidates(tables).collect()
    }
    assert truth <= cand, f"missed: {truth - cand}"


def test_minhash_verified_equals_exact_on_candidates(tables):
    """The propose+verify pipeline returns exactly the exact-verifier pairs
    restricted to LSH candidates — same jaccard values, no extras."""
    cand = {
        (r.doc_a, r.doc_b) for r in dedup.minhash_lsh_candidates(tables).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(tables).collect()
    }
    verified = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_verified_pairs(tables).collect()
    }
    want = {p: j for p, j in exact.items() if p in cand}
    assert verified == want
    # recall of the composed pipeline vs the full quadratic verifier
    assert len(verified) >= 0.9 * len(exact)


def test_dedup_components_consistent(tables):
    comp = {
        r.doc_id: r.component for r in dedup.dedup_components(tables).collect()
    }
    # every document labeled, component id is a member and is minimal
    assert set(comp.values()) <= set(comp)
    assert all(comp[c] == c for c in set(comp.values()))
    assert all(c <= d for d, c in comp.items())
    # both edge kinds connect their endpoints
    for r in dedup.ngram_jaccard_pairs(tables).collect():
        assert comp[r.doc_a] == comp[r.doc_b]
    for r in dedup.exact_dedup(tables).collect():
        assert comp[r.keep_id] == comp[r.keep_id]  # keep_id labeled
    assert_matches_oracle(
        dedup.QUERIES["dedup_components"](tables),
        dedup.ORACLES["dedup_components"],
        SF_DIR,
    )


def test_simhash_exact_dups_zero_distance(dup_docs):
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures({"documents": dup_docs}).collect()}
    assert sigs[1] == sigs[2]
    near = dedup.simhash_near_dups({"documents": dup_docs}, max_hamming=10).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in near}
    assert got[(1, 2)] == 0


def test_normalized_dedup_merges_case_and_spacing(spark):
    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "HELLO WORLD  "), (4, "other")],
        "doc_id long, text string",
    )
    rows = dedup.normalized_dedup({"documents": docs}).collect()
    by_keep = {r.keep_id: r.dup_ct for r in rows}
    assert by_keep == {1: 3, 4: 1}


def test_keep_best_prefers_quality_over_min_id(spark):
    """Within a normalized group the survivor is the highest-quality doc,
    not the lowest id. 'The ...' and 'the ...' normalize to one group, but
    quality is computed on the RAW tokens, where only lowercase 'the' counts
    as a stopword — stop_balance 0.925 vs 0.900 — so doc 5 must win despite
    the larger id; exact quality ties fall back to min doc_id."""
    body = " ".join(f"w{i}" for i in range(39))
    docs = spark.createDataFrame(
        [(2, "The " + body), (5, "the " + body)],
        "doc_id long, text string",
    )
    rows = dedup.keep_best_dedup({"documents": docs}).collect()
    assert len(rows) == 1 and rows[0].keep_id == 5 and rows[0].dup_ct == 2

    tied = spark.createDataFrame(
        [(4, "w0 w1  w2"), (9, "w0 w1 w2  ")],  # identical tokens -> tie
        "doc_id long, text string",
    )
    rows = dedup.keep_best_dedup({"documents": tied}).collect()
    assert len(rows) == 1 and rows[0].keep_id == 4 and rows[0].dup_ct == 2


def test_shingle_hotspots_flags_shared_boilerplate(spark):
    footer = "copyright acme corp all rights reserved"  # 6 tokens -> 2 5-grams
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + footer),
            (2, "delta epsilon zeta " + footer),
            (3, "unique page body with no shared phrasing at all"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.shingle_hotspots({"documents": docs}).collect()
    shingles = {r.shingle: r.doc_ct for r in rows}
    assert shingles.get("copyright acme corp all rights") == 2
    assert shingles.get("acme corp all rights reserved") == 2
    assert all(ct >= 2 for ct in shingles.values())


def test_blocked_embedding_dedup_equals_broadcast(tables):
    """The chunked block-pair GEMM must emit exactly the broadcast variant's
    pairs — different physical plan, identical result, including pairs whose
    lower id hashes into the higher block."""
    a = sorted(map(tuple, dedup.embedding_near_dups(tables).collect()))
    b = sorted(map(tuple, dedup.embedding_near_dups_blocked(tables).collect()))
    assert a == b
