import pytest

from flink_210225_spark.operators import windows

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(set(windows.QUERIES) & set(windows.ORACLES)))
def test_windows_match_oracle(name, tables):
    df = windows.QUERIES[name](tables)
    assert_matches_oracle(df, windows.ORACLES[name], SF_DIR)


def test_product_stats_approx_mode(tables):
    df = windows.product_stats_window(tables, exact=False)
    assert df.count() > 0
    assert set(df.columns) == {"stt", "edt", "sku_id", "order_ct", "order_sku_num", "order_amount"}


def test_uv_sketch_error_bound(tables):
    """HLL++ at rsd=2% must land within 3x the nominal rsd of exact on every
    (day, event_type) group (fixture cardinalities are thousands, where the
    bound is meaningful)."""
    from flink_210225_spark.operators.windows import uv_approx_sketch

    rows = uv_approx_sketch(tables).collect()
    assert rows
    for r in rows:
        assert abs(r.uv_approx - r.uv_exact) <= max(0.06 * r.uv_exact, 2.0), (
            r.dt, r.event_type, r.uv_approx, r.uv_exact)
