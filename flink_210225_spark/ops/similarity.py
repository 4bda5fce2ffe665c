"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  query side is tiny (explicit id predicate) and broadcast; the corpus side
  streams through one pass computing dot/norm via JVM lambda expressions
  (zip_with + aggregate — no Python). Cost O(|queries| × corpus) per batch:
  right for small query sets or as the re-rank stage.
- ``lsh_ann_topk``: the scale path — random-hyperplane (sign) LSH buckets
  both sides; only same-bucket pairs get exact cosine, then per-query top-k.
  Hyperplane components are deterministic pseudo-randoms derived from
  xxhash64(plane, dim), so signatures are reproducible across runs/engines.
  Probing all buckets at hamming ≤ 1 keeps recall high at 8 bits.

Embeddings are cast float→double elementwise BEFORE any arithmetic so
results are bit-identical to the DuckDB oracle's ::DOUBLE math (float32
intermediate rounding would diverge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(emb: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return emb.select("vec_id", v.alias("v"), _norm(v).alias("nrm"))


def cosine_topk(
    tables: dict[str, DataFrame], num_queries: int = 20, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``num_queries`` vectors.
    Deterministic ranking: cosine rounded to 6dp desc, then neighbor id asc."""
    emb = with_norm(tables["embeddings"])
    q = emb.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    n = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), F.col("nrm").alias("nn")
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.floor(cos * 1000000 + 0.5) / 1000000)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").alias("rank"))
    )


# --- LSH-bucketed ANN (scale path) ---


def _hyperplane_bit(v: Column, plane: int) -> Column:
    """Sign bit of <v, h_plane> with h components in [-1,1] derived from
    xxhash64(plane, dim) — deterministic, no stored model."""
    comp = F.transform(
        v,
        lambda x, i: x
        * ((F.xxhash64(F.lit(plane), i) % 10007).cast("double") / 10007.0),
    )
    s = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(v: Column, bits: int = 8) -> Column:
    b = F.lit(0)
    for p in range(bits):
        b = b * 2 + _hyperplane_bit(v, p)
    return b


def lsh_ann_topk(
    tables: dict[str, DataFrame],
    num_queries: int = 20,
    k: int = 5,
    bits: int = 4,
    probe_radius: int = 2,
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to candidates whose LSH
    bucket is within hamming ≤ probe_radius of the query's bucket
    (multi-probe LSH). Size ``bits`` ≈ log2(corpus / target bucket size): 4
    suits the 500-vector fixtures; a 10^9-vector corpus wants ~16-20 bits
    (and probe_radius 1) so buckets stay executor-memory sized."""
    emb = with_norm(tables["embeddings"]).withColumn("bucket", lsh_bucket(F.col("v"), bits))
    masks = [0] + [1 << i for i in range(bits)]
    if probe_radius >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(bits) for j in range(i + 1, bits)
        ]
    q = emb.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("probe"),
    )
    n = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nn"),
        F.col("bucket").alias("nbucket"),
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    scored = (
        F.broadcast(q)
        .join(n, (F.col("probe") == F.col("nbucket")) & (F.col("query_id") != F.col("neighbor_id")))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.floor(cos * 1000000 + 0.5) / 1000000)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").alias("rank"))
    )


def embedding_cluster_stats(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-label centroid norm + dispersion — array aggregation surface
    (element-wise mean via zip_with fold over collected partial sums)."""
    emb = tables["embeddings"]
    v = _as_double(F.col("embedding"))
    per_row = emb.select("label", v.alias("v"), _norm(v).alias("nrm"))
    return per_row.groupBy("label").agg(
        F.count("*").alias("n"),
        (F.floor(F.avg("nrm") * 1000000 + 0.5) / 1000000).alias("avg_norm"),
        (F.floor(F.stddev_pop("nrm") * 1000000 + 0.5) / 1000000).alias("std_norm"),
    )


QUERIES = {
    "sim_cosine_topk": cosine_topk,
    "sim_lsh_ann_topk": lsh_ann_topk,  # rows-only (xxhash64 planes not in DuckDB)
    "sim_cluster_stats": embedding_cluster_stats,
}

_COS = """
    list_sum(list_transform(range(64),
        i -> q.embedding[i + 1]::DOUBLE * n.embedding[i + 1]::DOUBLE))
    / (sqrt(list_sum(list_transform(range(64), i -> q.embedding[i + 1]::DOUBLE * q.embedding[i + 1]::DOUBLE)))
       * sqrt(list_sum(list_transform(range(64), i -> n.embedding[i + 1]::DOUBLE * n.embedding[i + 1]::DOUBLE))))
"""

ORACLES = {
    "sim_cosine_topk": f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   floor(({_COS}) * 1000000 + 0.5) / 1000000 AS cosine
            FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id
            WHERE q.vec_id < 20
        )
        SELECT query_id, neighbor_id, cosine,
               rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        ) WHERE rank <= 5
    """,
    "sim_cluster_stats": """
        WITH per_row AS (
            SELECT label,
                   sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
            FROM embeddings
        )
        SELECT label, count(*) AS n,
               floor(avg(nrm) * 1000000 + 0.5) / 1000000 AS avg_norm,
               floor(stddev_pop(nrm) * 1000000 + 0.5) / 1000000 AS std_norm
        FROM per_row GROUP BY label
    """,
}
