"""Word-segmentation UDTF (SURVEY §2.9 D1).

The reference registers an IK-analyzer table function and applies it with
``LATERAL TABLE(splitFunction(full_word))`` (MyUDTF.java:14-22,
KeywordStatsApp.java:48-54; IK fine-grained mode = smart=false). The Spark
spelling of a UDTF is a registered UDF returning ``array<string>`` exploded
with ``LATERAL VIEW explode`` — registration + SQL below mirror that surface
exactly.

Segmenter choice: jieba (the public Python analog of IK's fine-grained
Chinese segmentation) when importable; otherwise a deterministic
regex word-splitter so the pipeline runs in codec-less containers. NOTE the
hot-path keyword pipeline (serving.keyword_topn, ops/text.tokens_col) stays
JVM-side ``split``+``explode`` on purpose — this module exists for D1 API
parity and for corpora that genuinely need dictionary segmentation, and pays
the Python-UDF toll only where that's true.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

try:  # public analog of IK fine-grained mode; absent in this container
    import jieba  # type: ignore

    def _segment(text: str) -> list[str]:
        if not text:
            return []
        return [w for w in jieba.lcut_for_search(text) if w.strip()]

    SEGMENTER = "jieba"
except ImportError:
    _WORD_RE = re.compile(r"[A-Za-z0-9]+|[一-鿿]")

    def _segment(text: str) -> list[str]:
        """Fallback: latin word runs + per-CJK-character tokens (the
        character-level degenerate case of fine-grained segmentation)."""
        if not text:
            return []
        return _WORD_RE.findall(text)

    SEGMENTER = "regex-fallback"


def register_segment_udtf(spark: SparkSession, name: str = "segment") -> str:
    """spark.udf.register analog of tableEnv.createTemporarySystemFunction
    (KeywordStatsApp.java:48). Returns the registered name."""
    spark.udf.register(name, _segment, T.ArrayType(T.StringType()))
    return name


LATERAL_SQL = """
SELECT word, count(*) AS ct
FROM {view}
LATERAL VIEW explode(segment(text)) t AS word
GROUP BY word
"""


def keyword_counts_lateral(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The KeywordStatsApp shape end-to-end: register UDTF, LATERAL VIEW
    explode it, aggregate (KeywordStatsApp.java:50-66)."""
    register_segment_udtf(spark)
    docs.createOrReplaceTempView("docs_for_segment")
    return spark.sql(LATERAL_SQL.format(view="docs_for_segment"))
