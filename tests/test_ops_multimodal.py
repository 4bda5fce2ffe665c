from flink_210225_spark.ops import multimodal


def test_decode_media_plumbing(spark):
    assets = multimodal.make_demo_assets(spark, 32)
    out = multimodal.decode_media(assets)
    rows = out.collect()
    assert len(rows) == 32
    assert all(len(r.feature) == multimodal.FEATURE_DIM for r in rows)
    assert all(-1.0 <= x <= 1.0 for r in rows for x in r.feature)
    # determinism: same payload -> same checksum/feature across runs
    again = {r.asset_id: (r.checksum, tuple(r.feature)) for r in multimodal.decode_media(assets).collect()}
    first = {r.asset_id: (r.checksum, tuple(r.feature)) for r in rows}
    assert first == again


def test_frame_sample_plan(spark):
    assets = multimodal.make_demo_assets(spark, 9)
    plan = multimodal.frame_sample_plan(assets, every_n=10)
    rows = plan.collect()
    assert all(r.frame_idx % 10 == 0 for r in rows)
    vids = {r.asset_id for r in rows}
    assert vids == {2, 5, 8}  # every third demo asset is a video


def test_rebalance_runs(spark):
    assets = multimodal.make_demo_assets(spark, 16)
    assert multimodal.rebalance_by_size(assets).count() == 16
