import pytest

from flink_210225_spark.ops import text

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_matches_oracle(name, tables):
    assert_matches_oracle(text.QUERIES[name](tables), text.ORACLES[name], SF_DIR)


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
