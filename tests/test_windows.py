import pytest

from flink_210225_spark.operators import windows

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(windows.QUERIES))
def test_windows_match_oracle(name, tables):
    df = windows.QUERIES[name](tables)
    assert_matches_oracle(df, windows.ORACLES[name], SF_DIR)


def test_product_stats_approx_mode(tables):
    df = windows.product_stats_window(tables, exact=False)
    assert df.count() > 0
    assert set(df.columns) == {"stt", "edt", "sku_id", "order_ct", "order_sku_num", "order_amount"}
