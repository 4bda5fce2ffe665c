import pytest

from flink_210225_spark.ops import text

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(set(text.QUERIES) & set(text.ORACLES)))
def test_text_matches_oracle(name, tables):
    assert_matches_oracle(text.QUERIES[name](tables), text.ORACLES[name], SF_DIR)


def test_quality_topq_keeps_per_lang_quartile(tables):
    """Kept fraction per language ≈ keep_frac (percent_rank boundary: at
    most one extra tie-run past 25%), and every kept doc beats its
    language's dropped docs on (quality, doc_id) order."""
    kept = text.quality_top_quantile(tables).collect()
    all_q = {
        (r.doc_id, r.lang): r.quality for r in text.quality_score(tables)
        .join(tables["documents"].select("doc_id", "lang"), "doc_id")
        .collect()
    }
    from collections import Counter

    lang_n = Counter(lang for (_d, lang) in all_q)
    kept_n = Counter(r.lang for r in kept)
    for lang, n in lang_n.items():
        frac = kept_n[lang] / n
        assert 0.15 <= frac <= 0.35, (lang, frac)
    worst_kept = {}
    for r in kept:
        key = (r.quality, -r.doc_id)
        if r.lang not in worst_kept or key < worst_kept[r.lang]:
            worst_kept[r.lang] = key
    for (doc_id, lang), q in all_q.items():
        if all(r.doc_id != doc_id for r in kept if r.lang == lang):
            assert (q, -doc_id) <= worst_kept[lang], (doc_id, lang)


def test_corpus_stats_approx_within_rank_window(tables):
    """Each approx percentile must land inside the exact ±5-percentile-rank
    window of its group's n_chars distribution (GK guarantee at
    accuracy=1000 is ±0.1 ranks — 5 is generous slack, catches wiring bugs
    like wrong column/group, not sketch noise)."""
    from pyspark.sql import functions as F

    approx = {r.lang: r for r in text.corpus_stats_approx(tables).collect()}
    bounds = {
        r.lang: r
        for r in tables["documents"]
        .groupBy("lang")
        .agg(
            F.percentile("n_chars", F.lit(0.45)).alias("p45"),
            F.percentile("n_chars", F.lit(0.55)).alias("p55"),
            F.percentile("n_chars", F.lit(0.85)).alias("p85"),
            F.percentile("n_chars", F.lit(0.95)).alias("p95"),
            F.count("*").alias("n_docs"),
        )
        .collect()
    }
    assert set(approx) == set(bounds)
    for lang, a in approx.items():
        b = bounds[lang]
        assert a.n_docs == b.n_docs
        # the query now self-audits against the same exact window and
        # exposes the verdict as oracle-gated booleans
        assert a.p50_ok and a.p90_ok, (lang, a, b.p45, b.p55, b.p85, b.p95)


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in text.fingerprint({"documents": docs}).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_pack_plan_offsets_contiguous(tables):
    rows = text.pack_plan(tables).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang_rows in by_lang.values():
        lang_rows.sort(key=lambda r: r.doc_id)
        run = 0
        for r in lang_rows:
            assert r.offset == run  # concatenation stream has no gaps
            assert r.first_seq == r.offset // 256
            assert r.first_seq <= r.last_seq
            run += r.n_tokens


def test_contamination_flags_real_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6", "src1"),      # benchmark
            (2, "x w2 w3 w4 w5 w6", "src2"),       # shares 5-gram w2..w6
            (3, "a b c d e f", "src2"),            # clean
        ],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: r.n_overlap for r in
           text.contamination_check({"documents": docs}).collect()}
    assert got == {2: 1}


def test_repetition_flags_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),          # one token repeated
            (2, "buy now buy now buy now buy now"),        # looping bigram
            (3, "a quick brown fox jumps over the dog"),   # all-distinct prose
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           text.repetition_filter({"documents": docs}).collect()}
    assert got[1].top_token_frac == 1.0 and not got[1].keep
    assert got[2].dup_bigram_frac > 0.55 and not got[2].keep
    assert got[3].dup_token_frac == 0.0 and got[3].keep


def test_repetition_splits_fixture_corpus(tables):
    """Thresholds must actually discriminate on the driver corpus — a filter
    that keeps (or drops) everything is a no-op, not a filter."""
    rows = text.repetition_filter(tables).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)


def test_curation_pipeline_composes_components(tables):
    """Fused columns must equal the standalone queries', and `selected` must
    actually discriminate on the fixture corpus."""
    pipe = {r.doc_id: r for r in text.curation_pipeline(tables).collect()}
    q = {r.doc_id: r.quality for r in text.quality_score(tables).collect()}
    rep = {r.doc_id: r.keep for r in text.repetition_filter(tables).collect()}
    assert all(pipe[d].quality == v for d, v in q.items())
    assert all(pipe[d].keep_repetition == v for d, v in rep.items())
    sel = sum(r.selected for r in pipe.values())
    assert 0 < sel < len(pipe)


def test_curation_pipeline_is_stream_composable(spark, tables):
    """All four fused filters are per-row projections — the same code path
    runs on a readStream and agrees with batch row-for-row."""
    from .test_sessions_streamjoin import _file_stream
    from flink_210225_spark.streaming import pipelines as sp

    stream_tables = {"documents": _file_stream(spark, SF_DIR, "documents")}
    got = sp.run_stream_to_memory(text.curation_pipeline(stream_tables), "s_curation")
    want = text.curation_pipeline(tables)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bpe_token_counts_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "windowing 12345 a,b")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.token_stats_bpe({"documents": docs}).collect()}
    assert (got[1].n_words, got[1].n_bpe) == (2, 2)          # short words: 1:1
    # windowing -> wind|owin|g (3), 12345 -> 123|45 (2), a,b -> a|,|b (3)
    assert (got[2].n_words, got[2].n_bpe) == (3, 8)
    assert got[2].tokens_per_word > 2.0


def test_pack_bins_bfd_dominates_next_fit(tables):
    """BFD must pack every doc, never overfill a bin, and use no more bins
    than next-fit in any language group (best-fit-decreasing dominance)."""
    nf = text.pack_bins(tables, seq_len=256).collect()
    bfd = text.pack_bins_bfd(tables, seq_len=256).collect()
    assert sorted(r.doc_id for r in bfd) == sorted(r.doc_id for r in nf)
    fills: dict = {}
    for r in bfd:
        fills[(r.lang, r.bin)] = fills.get((r.lang, r.bin), 0) + min(r.n_tokens, 256)
    assert all(v <= 256 for v in fills.values())
    nf_bins: dict = {}
    bfd_bins: dict = {}
    for r in nf:
        nf_bins.setdefault(r.lang, set()).add(r.bin)
    for r in bfd:
        bfd_bins.setdefault(r.lang, set()).add(r.bin)
    for lang in nf_bins:
        assert len(bfd_bins[lang]) <= len(nf_bins[lang]), lang


def test_pack_bins_invariants(tables):
    rows = text.pack_bins(tables, seq_len=256).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang_rows in by_lang.values():
        lang_rows.sort(key=lambda r: r.doc_id)
        bins = [r.bin for r in lang_rows]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))  # dense, monotone
        fill: dict = {}
        for r in lang_rows:
            fill[r.bin] = fill.get(r.bin, 0) + min(r.n_tokens, 256)
        assert all(v <= 256 for v in fill.values())
        # greedy: a doc opens a new bin only because it didn't fit
        for r1, r2 in zip(lang_rows, lang_rows[1:]):
            if r2.bin == r1.bin + 1:
                assert fill[r1.bin] + min(r2.n_tokens, 256) > 256


def test_pii_redact_battery(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org end"),
            (2, "call 555-123-4567 or ssn 123-45-6789"),
            (3, "host 192.168.1.254 twice 10.0.0.1"),
            (4, "clean text no pii at all"),
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    red, counts = text.pii_redact_col(F.col("text"))
    out = {
        r.doc_id: r
        for r in docs.select("doc_id", red.alias("red"), *counts.values()).collect()
    }
    assert out[1].red == "mail <EMAIL> end" and out[1].n_email == 1
    assert out[2].red == "call <PHONE> or ssn <SSN>"
    assert out[2].n_phone == 1 and out[2].n_ssn == 1
    assert out[3].red == "host <IP> twice <IP>" and out[3].n_ip == 2
    assert out[4].red == out[4].red == "clean text no pii at all"
    assert out[4].n_email == out[4].n_phone == out[4].n_ip == out[4].n_ssn == 0


def test_tfidf_ranking_and_ties(spark):
    # 3 docs: "rare" appears only in doc 1 (df=1, idf=3), "mid" in docs 1-2
    # (df=2), "common" everywhere (df=3, idf=1). Within doc 1 the ranking
    # must be rare > mid > common; equal-score terms break ties term-ASC.
    docs = spark.createDataFrame(
        [
            (1, "rare mid common"),
            (2, "mid common zz aa"),
            (3, "common common"),
        ],
        "doc_id long, text string",
    )
    rows = text.tfidf_top_terms({"documents": docs}, k=4).collect()
    d1 = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["rare", "mid", "common"]
    assert [r.score for r in d1] == [3.0, 1.5, 1.0]
    d2 = sorted([r for r in rows if r.doc_id == 2], key=lambda r: r.rank)
    # aa and zz both have tf=1, df=1 → equal score 3.0; term-ASC tie-break.
    assert [r.term for r in d2][:2] == ["aa", "zz"]
    # doc 3: tf=2 for common → score 2·(3/3) = 2.0 beats nothing else there.
    d3 = [r for r in rows if r.doc_id == 3]
    assert len(d3) == 1 and d3[0].score == 2.0


def test_unigram_logprob_orders_common_above_rare(spark):
    """A doc made of corpus-common tokens must out-score a doc of
    singleton tokens; scores are ≤ 0 and n_tokens matches the tokenizer."""
    common = "the the the cat cat"        # 'the' and 'cat' dominate the corpus
    filler = "the cat the cat the cat"
    rare = "zyx wvu tsr qpo nml"          # every token appears exactly once
    docs = spark.createDataFrame(
        [(1, common), (2, filler), (3, rare)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in text.unigram_logprob({"documents": docs}).collect()}
    assert got[1].n_tokens == 5 and got[3].n_tokens == 5
    assert all(r.avg_logprob <= 0 for r in got.values())
    assert got[1].avg_logprob > got[3].avg_logprob
    # rare doc: every token has p = 1/16 (16 corpus tokens) -> ln(1/16)
    import math

    assert abs(got[3].avg_logprob - round(math.log(1 / 16), 4)) < 5e-4


def test_chunk_windows_semantics(spark):
    """Overlap and tail semantics: 100 tokens at size 50 / stride 40 →
    chunks [0,50) [40,90) [80,100); 50 tokens → one full chunk; 10 tokens →
    one short chunk. Consecutive chunks overlap by size − stride tokens."""
    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),
        (2, " ".join(f"t{i}" for i in range(50))),
        (3, " ".join(f"t{i}" for i in range(10))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = text.chunk_windows({"documents": docs}).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.start_tok, r.chunk_len) for r in c1] == [(0, 50), (40, 50), (80, 20)]
    # overlap: last 10 tokens of chunk 0 == first 10 tokens of chunk 1
    assert c1[0].chunk_text.split()[40:] == c1[1].chunk_text.split()[:10]
    # tail chunk text is the real tail
    assert c1[2].chunk_text.split() == [f"t{i}" for i in range(80, 100)]
    assert [(r.start_tok, r.chunk_len) for r in by_doc[2]] == [(0, 50)]
    assert [(r.start_tok, r.chunk_len) for r in by_doc[3]] == [(0, 10)]


def test_chunk_windows_shuffle_free(tables):
    """Chunking is a per-row explode — any Exchange means a join/groupBy
    crept in."""
    df = text.chunk_windows(tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan


def test_bigram_lm_matches_oracle(tables):
    assert_matches_oracle(
        text.QUERIES["text_bigram_lm"](tables),
        text.ORACLES["text_bigram_lm"],
        SF_DIR,
    )


def test_bigram_lm_semantics(spark):
    """'a b a b a c' → pairs ab, ba, ab, ba, ac: P(b|a)=2/3, P(c|a)=1/3,
    P(a|b)=1. Single-token docs contribute nothing."""
    docs = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "solo")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2): r for r in text.bigram_condprob({"documents": docs}).collect()}
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c")}
    assert got[("a", "b")].pair_ct == 2 and got[("a", "b")].w1_ct == 3
    assert abs(got[("a", "b")].cond_p - 0.666667) < 1e-6
    assert abs(got[("a", "c")].cond_p - 0.333333) < 1e-6
    assert got[("b", "a")].cond_p == 1.0


def test_curation_report_matches_oracle(tables):
    assert_matches_oracle(
        text.QUERIES["text_curation_report"](tables),
        text.ORACLES["text_curation_report"],
        SF_DIR,
    )


def test_curation_report_dup_accounting(spark):
    """Two identical docs + one unique in one cell: dup_frac = 1/3; token
    totals add across duplicates (dedup policy is downstream's call)."""
    docs = spark.createDataFrame(
        [
            (1, "same text here", "en", "web", 14),
            (2, "same text here", "en", "web", 14),
            (3, "unique document text", "en", "web", 20),
            (4, "altro documento", "it", "web", 15),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {(r.lang, r.source): r for r in text.curation_report({"documents": docs}).collect()}
    en = got[("en", "web")]
    assert en.n_docs == 3 and en.n_uniq == 2
    assert abs(en.dup_frac - 0.333333) < 1e-6
    assert en.token_total == 9
    assert got[("it", "web")].dup_frac == 0.0


def test_langid_confusion_matches_oracle(tables):
    assert_matches_oracle(
        text.QUERIES["text_langid_confusion"](tables),
        text.ORACLES["text_langid_confusion"],
        SF_DIR,
    )


def test_langid_confusion_consistent_with_langid(tables):
    """Cell counts must re-aggregate the per-doc lang_id output exactly, and
    each true-language's shares must sum to 1."""
    from collections import Counter

    per_doc = Counter((r.lang, r.pred_lang) for r in text.lang_id(tables).collect())
    cells = {(r.lang, r.pred_lang): r for r in text.langid_confusion(tables).collect()}
    assert {k: v.n for k, v in cells.items()} == dict(per_doc)
    by_lang = {}
    for (lang, _), r in cells.items():
        by_lang.setdefault(lang, 0.0)
        by_lang[lang] += r.share_of_true
    assert all(abs(s - 1.0) < 2e-3 for s in by_lang.values()), by_lang


def test_length_histogram_matches_oracle(tables):
    assert_matches_oracle(
        text.QUERIES["text_length_histogram"](tables),
        text.ORACLES["text_length_histogram"],
        SF_DIR,
    )


def test_length_histogram_shares_sum_to_one(tables):
    rows = text.length_histogram(tables).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, 0.0)
        by_lang[r.lang] += r.share
        assert r.min_tokens == r.bucket * 50
    assert all(abs(s - 1.0) < 2e-3 for s in by_lang.values()), by_lang


def test_frequent_tokens_mg_superset_small_partitions(spark):
    """MG propose must keep its superset guarantee even when the corpus is
    split across many tiny partitions (worst case for per-partition
    undercounting): sketch output == exact output regardless of layout."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, ("hot " * 40 + f"tail{i} unique{i} w{i % 7}").strip()) for i in range(60)],
        "doc_id long, text string",
    ).repartition(16)
    out = {r.tok: r.ct for r in text.frequent_tokens({"documents": docs}).collect()}
    toks = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")).where(
        F.col("tok") != ""
    )
    n = toks.count()
    exact = {
        r.tok: r.ct
        for r in toks.groupBy("tok").agg(F.count("*").alias("ct")).collect()
        if r.ct * 500 >= n
    }
    assert out == exact


def test_frequent_tokens_candidates_bounded(tables):
    """STAGE-1 candidate volume stays ≤ partitions·k — the sketch's whole
    point: the exact-verify shuffle is candidate-sized, not vocab-sized.
    Asserted on the candidate stage itself (the final output is always a
    tiny subset, so bounding it would be vacuous), plus the superset
    guarantee: every emitted frequent token is a stage-1 candidate."""
    from pyspark.sql import functions as F

    docs = tables["documents"]
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    k = 2 * 500 + 64
    cands = {r.tok for r in text.mg_candidates(toks, k).collect()}
    n_parts = toks.rdd.getNumPartitions()
    assert len(cands) <= n_parts * k, (len(cands), n_parts, k)
    out = {r.tok for r in text.frequent_tokens(tables).collect()}
    assert out <= cands


def test_langid_trigram_on_real_language_samples(spark):
    """Self-trained char-trigram profiles classify real multilingual prose
    perfectly — the fixture corpus shares one vocabulary across declared
    langs (stopword-vote baseline itself only reaches ~0.4 there), so
    operator quality is demonstrated on genuine text."""
    samples = {
        "en": [
            "the quick brown fox jumps over the lazy dog and runs through the field",
            "a government of the people by the people shall not perish from the earth",
            "science is the belief in the ignorance of experts and the joy of finding things out",
        ],
        "es": [
            "el rapido zorro marron salta sobre el perro perezoso y corre por el campo",
            "un gobierno del pueblo por el pueblo no desaparecera de la tierra jamas",
            "la ciencia es la creencia en la ignorancia de los expertos y la alegria de descubrir",
        ],
        "de": [
            "der schnelle braune fuchs springt ueber den faulen hund und laeuft durch das feld",
            "eine regierung des volkes durch das volk wird nicht von der erde verschwinden",
            "die wissenschaft ist der glaube an die unwissenheit der experten und die freude",
        ],
        "fr": [
            "le renard brun rapide saute par dessus le chien paresseux et court dans le champ",
            "un gouvernement du peuple par le peuple ne disparaitra jamais de la terre",
            "la science est la croyance en l ignorance des experts et la joie de decouvrir",
        ],
    }
    rows = []
    i = 0
    for lang, texts in samples.items():
        for t in texts:
            rows.append((i, t, lang, "src", len(t)))
            i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = text.langid_trigram({"documents": docs}).collect()
    acc = sum(r.lang == r.pred_lang for r in got) / len(got)
    assert acc == 1.0, [(r.doc_id, r.lang, r.pred_lang) for r in got if r.lang != r.pred_lang]


def test_nb_quality_separates_teacher_classes(tables):
    """The self-trained NB scorer must separate its own training labels:
    mean nb_score of teacher-positive docs above teacher-negative docs, and
    training-set decision agreement above the majority-class baseline (a
    broken scorer — zeroed counts, flipped sign — collapses both)."""
    rows = text.nb_quality(tables).collect()
    pos = [r.nb_score for r in rows if r.teacher]
    neg = [r.nb_score for r in rows if not r.teacher]
    assert pos and neg
    assert sum(pos) / len(pos) > sum(neg) / len(neg)
    acc = sum((r.nb_score > 0) == r.teacher for r in rows) / len(rows)
    majority = max(len(pos), len(neg)) / len(rows)
    assert acc >= majority, (acc, majority)


def test_dsir_target_domain_scores_higher(spark):
    """On a corpus where the target domain has genuinely distinct vocabulary,
    every target doc's importance weight must exceed every raw doc's — the
    log-likelihood ratio is exactly what separates the domains. (On the
    shared-vocabulary fixtures the means are smoothing-noise; a distinct
    vocabulary makes the direction a hard guarantee.)"""
    rows = []
    for i in range(20):
        words = " ".join(f"med{j}" for j in range(i % 5, i % 5 + 30))
        rows.append((i, words, "en", "src0", len(words)))
    for i in range(20, 80):
        words = " ".join(f"web{j}" for j in range(i % 7, i % 7 + 30))
        rows.append((i, words, "en", "src1", len(words)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = text.dsir_weights({"documents": docs}).collect()
    t = [r.logw for r in got if r.is_target]
    r_ = [r.logw for r in got if not r.is_target]
    assert t and r_
    assert min(t) > max(r_), (min(t), max(r_))


def test_bloom_contamination_no_false_negatives(tables):
    """Bloom membership can only over-approximate: every exactly
    contaminated doc (contamination_check) must surface with its full
    exact overlap count, and per doc bloom_hits >= exact_hits."""
    bloom = {r.doc_id: r for r in text.bloom_contamination(tables).collect()}
    exact = {r.doc_id: r.n_overlap for r in text.contamination_check(tables).collect()}
    for doc_id, n_overlap in exact.items():
        assert doc_id in bloom, doc_id
        assert bloom[doc_id].exact_hits == n_overlap, doc_id
    for r in bloom.values():
        assert r.bloom_hits >= r.exact_hits, r


def test_line_filter_semantics(spark):
    """Hand-checkable micro: 16 tokens → 2 lines of 8; doc 2 tags lines
    where (2+i)%3 != 0 → line 0 ('.'), line 1 ((2+1)%3=0, no '.'). Kept =
    line 0 only: 8 tokens, digest of that exact line."""
    import hashlib

    text16 = " ".join(f"w{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(2, text16, "en", "s", len(text16))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = text.line_filter({"documents": docs}).collect()[0]
    assert (r.n_lines, r.kept_lines, r.kept_tokens) == (2, 1, 8)
    expect = " ".join(f"w{i}" for i in range(8)) + "."
    assert r.cleaned_digest == hashlib.md5(expect.encode()).hexdigest()


def test_cdc_chunks_insertion_stability(spark):
    """The CDC property: inserting one token must leave every other chunk's
    digest intact — boundaries are content-defined, so chunks resynchronize
    at the next cut point (fixed-stride chunking would shift every
    downstream chunk). Also: chunks partition the doc exactly."""
    base_toks = [f"w{i}" for i in range(200)]
    ins_toks = base_toks[:100] + ["XXINSERT"] + base_toks[100:]
    docs = spark.createDataFrame(
        [
            (1, " ".join(base_toks), "en", "s", 0),
            (2, " ".join(ins_toks), "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = text.cdc_chunks({"documents": docs}).collect()
    by_doc: dict = {1: [], 2: []}
    for r in rows:
        by_doc[r.doc_id].append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        # exact partition: contiguous, covers all tokens
        pos = 0
        for r in rs:
            assert r.start_tok == pos, (d, r)
            pos += r.chunk_len
        assert pos == rs[0].n_tokens
    d1 = [r.chunk_digest for r in by_doc[1]]
    d2 = [r.chunk_digest for r in by_doc[2]]
    from collections import Counter

    common = sum((Counter(d1) & Counter(d2)).values())
    assert common >= len(d1) - 2, (len(d1), len(d2), common)


def test_corpus_manifest_composes_verified_components(tables):
    """Every manifest column must equal the standalone oracle-gated query it
    reuses: quality, repetition keep, split, contamination doc set, and
    exact-dedup survivorship; selected must discriminate."""
    man = {r.doc_id: r for r in text.corpus_manifest(tables).collect()}
    q = {r.doc_id: r.quality for r in text.quality_score(tables).collect()}
    rep = {r.doc_id: r.keep for r in text.repetition_filter(tables).collect()}
    from flink_210225_spark.ops import sampling

    split = {r.doc_id: r.split for r in sampling.hash_split(tables).collect()}
    contam = {r.doc_id for r in text.contamination_check(tables).collect()}
    assert all(man[d].quality == v for d, v in q.items())
    assert all(man[d].keep_repetition == v for d, v in rep.items())
    assert all(man[d].split == v for d, v in split.items())
    assert {d for d, r in man.items() if r.contaminated} == contam
    # survivors: exactly one per digest group, the min doc_id
    import hashlib

    texts = {r.doc_id: r.text for r in tables["documents"].select("doc_id", "text").collect()}
    by_digest: dict = {}
    for d, t in texts.items():
        by_digest.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(d)
    for ds in by_digest.values():
        keep = min(ds)
        for d in ds:
            assert man[d].is_survivor == (d == keep), d
    sel = sum(r.selected for r in man.values())
    assert 0 < sel < len(man)


def test_turn_mask_plan_partitions_and_masks(tables):
    """Turns must partition each doc exactly (contiguous offsets covering
    all tokens), lengths follow 5 + ((doc_id + j) mod 7) except the
    truncated tail, and loss_mask is exactly the assistant turns."""
    rows = text.turn_mask_plan(tables).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {
        r.doc_id: len(r.text.strip().split())
        for r in tables["documents"].select("doc_id", "text").collect()
    }
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r.turn_idx)
        pos = 0
        for j, r in enumerate(rs):
            assert r.turn_idx == j and r.tok_start == pos
            expect = 5 + (d + j) % 7
            if j < len(rs) - 1:
                assert r.tok_len == expect, (d, j)
            else:
                assert r.tok_len <= expect or len(rs) == 1
            assert r.loss_mask == (r.role == "assistant") == (j % 2 == 1)
            pos += r.tok_len
        assert pos == n_tok[d], d


def test_url_canonicalizer_unit_cases(spark):
    """Spot-check the canonicalization rules on crafted URLs via the full
    operator (doc_ids chosen to hit each variant branch)."""
    rows = [(0,), (3,), (5,), (199,), (398,)]
    docs = spark.createDataFrame(rows, "doc_id long")
    out = {r.canonical_url: (r.n_docs, r.keeper_doc) for r in
           text.url_canonical_dedup({"documents": docs}).collect()}
    # doc 0: WWW + trailing slash + utm + ref + fragment -> article 0, ?ref survives
    # doc 199, 398: article 0 as well (199 odd -> no params; 398 even -> ?ref)
    assert "https://news.example.com/en/article/0?ref=home" in out
    assert out["https://news.example.com/en/article/0?ref=home"] == (2, 0)  # docs 0, 398
    assert out["https://news.example.com/en/article/0"] == (1, 199)
    # doc 3: www stripped, odd -> bare canonical article 3
    assert out["https://news.example.com/en/article/3"][1] == 3
    # doc 5: fragment stripped, odd -> bare article 5
    assert out["https://docs.example.com/en/article/5"][1] == 5
    assert all("utm_" not in u and "#" not in u and "WWW" not in u for u in out)


def test_perplexity_filter_flags_low_probability_docs(tables):
    """Flagged docs must sit strictly below unflagged docs on avg_logprob
    (threshold semantics), and flags must be a strict minority."""
    rows = text.perplexity_filter(tables).collect()
    flagged = [r.avg_logprob for r in rows if r.is_flagged]
    clear = [r.avg_logprob for r in rows if not r.is_flagged]
    assert flagged and clear
    assert max(flagged) < min(clear)
    assert len(flagged) < len(rows) / 2
    for r in rows[:50]:
        assert abs(r.ppl - round(__import__("math").exp(-r.avg_logprob), 2)) < 0.02


def test_zipf_profile_shape(tables):
    """The fixture corpus has a 31-word near-uniform vocabulary — the
    profile must DETECT that (weak fit, shallow slope): that is the QA
    signal the operator exists for."""
    (row,) = text.zipf_profile(tables).collect()
    assert row.n_ranks == 31 == row.n_vocab  # top-100 clamps to the vocab
    assert -0.5 < row.slope < 0
    assert row.r2 < 0.3  # near-uniform -> NOT Zipf, and the fit says so
    assert row.n_tokens > row.n_vocab


def test_zipf_profile_recovers_power_law(spark):
    """On a crafted corpus where word k appears floor(2000/k) times the
    fit must recover slope ~ -1 with a near-perfect r2."""
    words = []
    for k in range(1, 21):
        words += [f"w{k:02d}"] * (2000 // k)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    (row,) = text.zipf_profile({"documents": docs}).collect()
    assert row.n_ranks == 20
    assert abs(row.slope + 1.0) < 0.02, row.slope
    assert row.r2 > 0.999


def test_bpe_pair_counts_hand_corpus(spark):
    """On 'aaab aab' the dominant word-internal pair is a+a (3 occurrences:
    2 in aaab, 1 in aab); rank 1 is the BPE merge."""
    docs = spark.createDataFrame([(0, "aaab aab")], "doc_id long, text string")
    rows = text.bpe_pair_counts({"documents": docs}).collect()
    by_pair = {r.pair: (r.ct, r.rank) for r in rows}
    assert by_pair["a+a"] == (3, 1)
    assert by_pair["a+b"][0] == 2


def test_quality_rrf_consistency(tables):
    """Ranks must be permutations per language and rrf must decode back to
    exactly the three rank reciprocals."""
    rows = text.quality_rrf(tables).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        for col in ("rank_q", "rank_d", "rank_p"):
            assert sorted(getattr(r, col) for r in rs) == list(range(1, n + 1)), (lang, col)
    import math
    for r in rows[:100]:
        want = sum(1.0 / (60 + k) for k in (r.rank_q, r.rank_d, r.rank_p))
        assert abs(r.rrf - math.floor(want * 1e6 + 0.5) / 1e6) < 1e-12


def test_bpe_merge_round_greedy_overlap(spark):
    """Greedy left-to-right non-overlap on a self-overlapping pair: with
    best pair (a,a), 'aaaa' yields 2 merges and 'aaa' yields 1 — the
    run-length//2 rule the recursive oracle must also produce."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaa xy"), (2, "aa zz")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.bpe_merge_round({"documents": docs}).collect()}
    assert rows[1].pair == "a+a"
    assert rows[1].n_symbols == 9 and rows[1].n_merges == 3
    assert rows[1].n_symbols_after == 6
    assert rows[2].n_merges == 1 and rows[2].n_symbols_after == 3


def test_lr_quality_train_learns(tables):
    """The fitted classifier must beat the majority-class baseline on its
    own training set (the teacher labels are linearly separable enough in
    the hashed-share features for GD to make real progress)."""
    from pyspark.sql import functions as F

    out = {r.param: r.value for r in text.lr_quality_train(tables).collect()}
    toks = text.tokens_col(F.col("text"))
    labels = tables["documents"].select(
        (text._quality_expr(toks) >= 0.55).cast("int").alias("y")
    )
    pos = labels.agg(F.avg("y")).first()[0]
    baseline = max(pos, 1.0 - pos)
    assert out["train_acc"] >= baseline, (out["train_acc"], baseline)
    assert any(abs(out[f"w{b}"]) > 1e-6 for b in range(8))


def test_pmi_prefers_exclusive_pairs(spark):
    """PMI must rank an always-together pair above a frequent-but-
    promiscuous one, regardless of raw pair count."""
    docs = spark.createDataFrame(
        [(i, "new york " * 5 + "of the of a of x of y of z") for i in range(5)],
        "doc_id long, text string",
    )
    rows = text.pmi_collocations({"documents": docs}, min_count=5, top=10).collect()
    ranks = {(r.w1, r.w2): r.rank for r in rows}
    assert ranks[("new", "york")] < ranks[("of", "the")]


def test_rake_scores_phrases_above_parts(spark):
    """A recurring multi-word phrase must outrank its constituent words:
    phrase score sums member word scores, the RAKE property that makes it
    a PHRASE extractor rather than a term counter."""
    docs = spark.createDataFrame(
        [(i, "neural scaling laws of the data and a neural scaling laws")
         for i in range(3)],
        "doc_id long, text string",
    )
    rows = text.rake_keyphrases({"documents": docs}, top=10).collect()
    scores = {r.phrase: r.score for r in rows}
    assert scores["neural scaling laws"] > scores["data"]
    assert rows[0].phrase == "neural scaling laws" and rows[0].n_words == 3
