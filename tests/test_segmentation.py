"""D1 UDTF surface: registration + LATERAL VIEW explode + aggregation."""

from flink_210225_spark.functions import segmentation


def test_segment_fallback_semantics():
    assert segmentation._segment("hello world 42") == ["hello", "world", "42"]
    assert segmentation._segment("") == []
    if segmentation.SEGMENTER == "regex-fallback":
        # CJK degrades to per-character tokens
        assert segmentation._segment("中文abc") == ["中", "文", "abc"]


def test_keyword_counts_lateral(spark, tables):
    out = segmentation.keyword_counts_lateral(spark, tables["documents"])
    rows = {r["word"]: r["ct"] for r in out.collect()}
    assert len(rows) > 10
    assert all(ct >= 1 for ct in rows.values())
    # spot-check one word against a direct computation
    from pyspark.sql import functions as F

    word = next(iter(rows))
    direct = (
        tables["documents"]
        .select(F.explode(F.udf(segmentation._segment, "array<string>")("text")).alias("w"))
        .filter(F.col("w") == word)
        .count()
    )
    assert rows[word] == direct
