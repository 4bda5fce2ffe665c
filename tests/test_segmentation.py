"""D1 UDTF surface: registration + LATERAL VIEW explode + aggregation,
plus the vendored-lexicon FMM kernel itself."""

from flink_210225_spark.functions import segmentation


def test_segment_fallback_semantics():
    assert segmentation._segment("hello world 42") == ["hello", "world", "42"]
    assert segmentation._segment("") == []


def test_fmm_kernel():
    seg = segmentation._segment_fmm
    # longest match wins: 'agg' over 'a'
    assert seg("aggtable") == ["agg", "table"]
    # despaced dictionary text re-segments exactly
    assert seg("atablekeyagg") == ["a", "table", "key", "agg"]
    # unknown latin run passes through whole; CJK compounds from the
    # vendored lexicon; OOV CJK degrades per character
    assert seg("小米手机hello键盘") == ["小米", "手机", "hello", "键", "盘"]
    # whitespace separates, never emits
    assert seg("scan  value") == ["scan", "value"]


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


def test_segment_fmm_counts_inverts_despacing(tables):
    """Despace-then-FMM must recover exactly the whitespace-split token
    counts on the closed-vocabulary fixture (no lexicon word crosses a
    boundary: no word's remainder-after-prefix starts another word)."""
    from pyspark.sql import functions as F

    got = {
        r["word"]: r["ct"]
        for r in segmentation.segment_fmm_counts(tables).collect()
    }
    want = {
        r["w"]: r["ct"]
        for r in tables["documents"]
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("ct"))
        .collect()
    }
    assert got == want
