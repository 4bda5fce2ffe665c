import pytest

from flink_210225_spark.operators import serving

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(serving.QUERIES))
def test_serving_matches_oracle(name, tables):
    df = serving.QUERIES[name](tables)
    assert_matches_oracle(df, serving.ORACLES[name], SF_DIR)


def test_ship_latency_matches_oracle(tables):
    assert_matches_oracle(
        serving.QUERIES["serving_ship_latency"](tables),
        serving.ORACLES["serving_ship_latency"],
        SF_DIR,
    )
