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


def test_moving_avg_frame_semantics(spark):
    """Trailing frame excludes the current row; the first row per key has an
    empty frame -> NULL avg and ratio."""
    import pandas as pd

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    ["2021-01-01 00:10", "2021-01-01 01:10", "2021-01-01 02:10", "2021-01-01 03:10"]
                ),
                "event_type": ["a"] * 4,
                "value": [0.0] * 4,
            }
        )
    )
    # hourly counts are all 1 -> trail_avg 1.0 from the second row on
    rows = {r.hr: r for r in windows.hourly_moving_stats({"events": ev}).collect()}
    assert rows["2021-01-01 00:00:00"].trail_avg is None
    assert rows["2021-01-01 00:00:00"].dev_ratio is None
    assert rows["2021-01-01 01:00:00"].trail_avg == 1.0
    assert rows["2021-01-01 03:00:00"].dev_ratio == 1.0


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
