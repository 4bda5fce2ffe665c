"""Word-segmentation UDTF (SURVEY §2.9 D1).

The reference registers an IK-analyzer table function and applies it with
``LATERAL TABLE(splitFunction(full_word))`` (MyUDTF.java:14-22,
KeywordStatsApp.java:48-54; IK fine-grained mode = smart=false). The Spark
spelling of a UDTF is a registered UDF returning ``array<string>`` exploded
with ``LATERAL VIEW explode`` — registration + SQL below mirror that surface
exactly.

Segmenter: a vendored-lexicon forward-maximum-match (FMM) tokenizer — the
core algorithm of dictionary segmenters like IK: at each position take the
LONGEST lexicon word; unknown latin/digit runs pass through whole; unknown
CJK degrades to per-character tokens. jieba (the public Python analog of IK
fine-grained mode) is preferred for the generic ``segment`` UDTF when
importable; the FMM path is always available and is what the driver-gated
query uses (deterministic, so the DuckDB oracle can re-implement it
independently as a recursive CTE). NOTE the hot-path keyword pipeline
(serving.keyword_topn, ops/text.tokens_col) stays JVM-side
``split``+``explode`` on purpose — this module exists for D1 API parity and
for corpora that genuinely need dictionary segmentation, and pays the
Python toll (Arrow-batched) only where that's true.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Vendored lexicon — the dictionary the FMM segmenter matches against.
# Two sections: the synthetic corpus' closed vocabulary (so fixture text
# despaced re-segments exactly), and a handful of common zh compounds
# mirroring the reference's e-commerce keyword demo (KeywordStatsApp) so the
# CJK path is exercised by unit tests without jieba.
VENDORED_LEXICON = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split() + ["小米", "手机", "华为", "平板", "电视", "苹果", "笔记本"]

_LEX = frozenset(VENDORED_LEXICON)
_MAXLEN = max(len(w) for w in VENDORED_LEXICON)
# no ^ anchor: re.Pattern.match(text, pos) anchors at pos itself, while ^
# would only match at position 0 and silently break mid-string runs
_ALNUM_RUN = re.compile(r"[A-Za-z0-9]+")


def _segment_fmm(text: str) -> list[str]:
    """Forward maximum match over the vendored lexicon.

    Per position: (1) longest lexicon word starting here wins; (2) else a
    maximal latin/digit run passes through as one unknown token (IK keeps
    unknown latin words whole); (3) else one char (the per-character
    degenerate case for out-of-lexicon CJK). Whitespace separates, never
    emits. Deterministic — mirrored 1:1 by the DuckDB recursive-CTE oracle
    in ``ORACLES['text_segment_fmm']``."""
    if not text:
        return []
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        for length in range(min(_MAXLEN, n - i), 0, -1):
            cand = text[i : i + length]
            if cand in _LEX:
                out.append(cand)
                i += length
                break
        else:
            m = _ALNUM_RUN.match(text, i)
            if m:
                out.append(m.group(0))
                i = m.end()
            else:
                out.append(ch)
                i += 1
    return out


try:  # public analog of IK fine-grained mode; absent in this container
    import jieba  # type: ignore

    def _segment(text: str) -> list[str]:
        if not text:
            return []
        return [w for w in jieba.lcut_for_search(text) if w.strip()]

    SEGMENTER = "jieba"
except ImportError:
    _segment = _segment_fmm
    SEGMENTER = "fmm-vendored"


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


def segment_fmm_counts(tables: dict[str, DataFrame]) -> DataFrame:
    """Driver-gated D1 query: corpus keyword counts from DICTIONARY
    segmentation of unspaced text — each document's text is despaced
    (the latin stand-in for Chinese's missing word boundaries, the problem
    IK exists to solve) and re-segmented by forward maximum match against
    the vendored lexicon, LATERAL VIEW explode + count, exactly the
    KeywordStatsApp shape.

    Scale: the segmenter is an Arrow-batched pandas UDF (pure-Python FMM is
    the unavoidable Python part of D1; ~µs/doc), one narrow map stage before
    the single count shuffle — partial aggregation keeps the Exchange at
    |vocab| rows per partition."""
    docs = tables["documents"]
    spark = docs.sparkSession

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _segment_fmm(t if t else ""))

    spark.udf.register("segment_fmm", seg)
    docs.select(
        "doc_id", F.regexp_replace("text", r"\s+", "").alias("despaced")
    ).createOrReplaceTempView("docs_despaced")
    return spark.sql(
        """
        SELECT word, count(*) AS ct
        FROM docs_despaced
        LATERAL VIEW explode(segment_fmm(despaced)) t AS word
        GROUP BY word
        """
    )


def _lexicon_values_sql() -> str:
    """Inline VALUES list for the oracle — generated from VENDORED_LEXICON
    so the two engines can never disagree on the dictionary."""
    return ", ".join(f"('{w}')" for w in VENDORED_LEXICON)


QUERIES = {
    "text_segment_fmm": segment_fmm_counts,
}

# The oracle re-implements FMM from scratch: a recursive CTE walks each
# despaced document one token per iteration; the next token is the longest
# lexicon word at the cursor, else the maximal alnum run, else one char —
# the same three-way rule as _segment_fmm.
ORACLES = {
    "text_segment_fmm": f"""
        WITH RECURSIVE lex(word) AS (VALUES {_lexicon_values_sql()}),
        d AS (
            SELECT doc_id, regexp_replace(text, '\\s+', '', 'g') AS s
            FROM documents
        ),
        walk AS (
            SELECT doc_id, s, 1::BIGINT AS pos, NULL::VARCHAR AS tok FROM d
            UNION ALL
            SELECT doc_id, s, pos + length(nxt), nxt
            FROM (
                SELECT doc_id, s, pos,
                       coalesce(
                           (SELECT word FROM lex
                            WHERE substr(s, pos, length(word)) = word
                            ORDER BY length(word) DESC LIMIT 1),
                           nullif(regexp_extract(substr(s, pos),
                                                 '^[A-Za-z0-9]+'), ''),
                           substr(s, pos, 1)
                       ) AS nxt
                FROM walk WHERE pos <= length(s)
            )
        )
        SELECT tok AS word, count(*)::BIGINT AS ct
        FROM walk WHERE tok IS NOT NULL GROUP BY 1
    """,
}
