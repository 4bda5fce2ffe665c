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
