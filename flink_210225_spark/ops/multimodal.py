"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Container constraint: no image/audio codecs are installed, so the actual
byte-decode is STUBBED — ``_decode_fake`` derives deterministic pseudo
pixels/samples from the payload bytes (size-preserving, reproducible), and
``decode_media`` documents the seam where Pillow/torchaudio/pyav would slot
in. Everything around the stub is real Spark:

- the asset schema (binary payload + struct metadata),
- Arrow batch transfer via ``mapInPandas`` (the right shape for bulky binary
  columns: one Python roundtrip per batch, not per row),
- salted repartitioning by byte size so a few huge videos can't skew
  executors,
- feature extraction returning fixed-width array<float> columns ready for
  the ``similarity`` ops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("content_type", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("checksum", T.StringType()),
    ]
)


def _decode_fake(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decode+embed: sha256-expand the
    payload into ``dim`` floats in [-1, 1]. Replace with Pillow/pyav decode +
    a real encoder; the signature (bytes -> fixed-width float list) is the
    contract the Spark plumbing depends on."""
    out: list[float] = []
    seed = payload or b"\x00"
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        out.extend(int.from_bytes(h[i : i + 4], "big") / 2**31 - 1.0 for i in range(0, 32, 4))
        counter += 1
    return out[:dim]


def decode_media(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract. Real decode would raise
    NotImplementedError per unsupported content_type; the fake keeps the
    pipeline runnable in this container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "feature": payloads.map(lambda b: _decode_fake(bytes(b or b""))),
                    "checksum": payloads.map(
                        lambda b: hashlib.sha256(bytes(b or b"")).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(batches, DECODED_SCHEMA)


def rebalance_by_size(assets: DataFrame, target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Salted repartition so oversized payloads spread across executors
    instead of skewing one task: shuffle key = hash(asset_id, size_bucket)."""
    with_size = assets.withColumn("__sz", F.length("payload").cast("long"))
    bucket = F.floor(F.col("__sz") / F.lit(target_partition_bytes))
    salted = with_size.withColumn("__salt", F.pmod(F.hash("asset_id", bucket), F.lit(1024)))
    return salted.repartition(F.col("__salt")).drop("__sz", "__salt")


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index, produced
    from metadata only (no decode) — explode(sequence()) JVM-side, so the
    expensive decode fans out to exactly the frames wanted."""
    vids = assets.filter(F.col("kind") == "video")
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def audio_segment_plan(assets: DataFrame, seg_samples: int = 16000) -> DataFrame:
    """Audio segmentation plan: fixed-duration segments (1 s at 16 kHz mono
    16-bit ⇒ 16000 samples = 32000 bytes) per audio asset, from metadata +
    payload length only — the binary sibling of ``text.chunk_windows``. The
    decode stage then fans out per segment instead of per file, so one long
    recording can't pin an executor. Last partial segment kept (ASR-style);
    sample count = floor(bytes/2) for 16-bit PCM."""
    auds = assets.filter(F.col("kind") == "audio")
    n_samples = F.floor(F.length("payload") / 2).cast("long")
    base = auds.select("asset_id", n_samples.alias("n_samples")).filter(
        F.col("n_samples") > 0
    )
    n_segs = F.ceil(F.col("n_samples") / F.lit(seg_samples)).cast("long")
    segs = base.select(
        "asset_id",
        "n_samples",
        F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
    )
    start = F.col("seg_idx") * seg_samples
    return segs.select(
        "asset_id",
        "seg_idx",
        start.alias("start_sample"),
        F.least(F.lit(seg_samples), F.col("n_samples") - start).alias("seg_samples"),
    )


def image_tile_plan(assets: DataFrame, tile: int = 32) -> DataFrame:
    """Image tiling plan: the ``tile``×``tile`` grid over each image's
    (width, height), metadata-only — the ViT-patch / tiled-inference layout.
    One explode over a flat tile index, x/y recovered by mod/div; edge tiles
    carry their clipped extents so the decode stage reads exact byte
    windows."""
    imgs = assets.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    nx = F.ceil(w / F.lit(tile)).cast("long")
    base = imgs.select(
        "asset_id",
        w.alias("w"),
        h.alias("h"),
        nx.alias("nx"),
        (nx * F.ceil(h / F.lit(tile)).cast("long")).alias("n_tiles"),
    )
    tiles = base.select(
        "asset_id",
        "w",
        "h",
        "nx",
        F.explode(F.sequence(F.lit(0), F.col("n_tiles") - 1)).alias("tile_id"),
    )
    x0 = F.pmod(F.col("tile_id"), F.col("nx")) * tile
    y0 = F.floor(F.col("tile_id") / F.col("nx")) * tile
    return tiles.select(
        "asset_id",
        "tile_id",
        x0.alias("x0"),
        y0.cast("long").alias("y0"),
        F.least(F.lit(tile), F.col("w") - x0).alias("tile_w"),
        F.least(F.lit(tile), F.col("h") - y0).cast("long").alias("tile_h"),
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media assets derived from the documents fixture:
    payload = UTF-8 bytes of the text, kind by doc_id mod 3, frame count from
    text length — so the binary pipeline is driver-checkable against a SQL
    oracle (sha256/octet_length are pure functions of the text)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(F.length("text"), F.lit(96)) + 32).cast("int").alias("width"),
            (F.pmod(F.length("text") * 7, F.lit(64)) + 32).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.pmod(F.length("text"), F.lit(120)) + 1).cast("int").alias("n_frames"),
            F.lit("x-demo").alias("content_type"),
        ).alias("meta"),
    )


def decode_documents(tables: dict[str, DataFrame]) -> DataFrame:
    """Arrow-batched decode over document-derived assets; feature column
    dropped here so checksum/n_bytes hash-match the oracle (the feature path
    is covered by tests/test_ops_multimodal.py)."""
    return decode_media(assets_from_documents(tables["documents"])).select(
        "asset_id", "kind", "n_bytes", "checksum"
    )


def frame_plan_documents(tables: dict[str, DataFrame]) -> DataFrame:
    """Metadata-only frame sampling plan over the video-kind assets."""
    return frame_sample_plan(assets_from_documents(tables["documents"]))


def audio_segments_documents(tables: dict[str, DataFrame]) -> DataFrame:
    # 128-sample segments so fixture-sized payloads still produce multi-
    # segment plans (production default is 1 s = 16000).
    return audio_segment_plan(assets_from_documents(tables["documents"]), 128)


def tile_plan_documents(tables: dict[str, DataFrame]) -> DataFrame:
    return image_tile_plan(assets_from_documents(tables["documents"]))


def shard_layout(assets: DataFrame, shard_bytes: int = 4096) -> DataFrame:
    """WebDataset-style shard packing: per media kind, assets in asset_id
    order are packed greedily (next-fit) into ~``shard_bytes`` shards, each
    asset annotated with its shard id and byte offset — exactly the layout a
    tar-shard writer consumes and a dataloader seeks into. An oversized
    asset gets a shard alone (media can't be truncated; byte budget is a
    target, not a cap).

    Sequential state per kind ⇒ ``applyInPandas`` (the ``text.pack_bins``
    kernel shape, reference-free LLM-pipeline extension). At 100 TB the
    group key must be (kind × hash bucket of asset ranges) so one kind is
    not one task — shard ids are only meaningful within a group either way,
    and the production default budget is ~1 GiB, not the fixture-sized 4 KiB
    used so driver fixtures produce multi-asset shards."""
    import pandas as pd

    base = assets.select(
        "asset_id", "kind", F.length("payload").cast("long").alias("n_bytes")
    )

    def assign(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("asset_id").reset_index(drop=True)
        shard, fill = 0, 0
        shards, offsets = [], []
        for n in pdf["n_bytes"]:
            n = int(n)
            if fill > 0 and fill + n > shard_bytes:
                shard, fill = shard + 1, 0
            shards.append(shard)
            offsets.append(fill)
            fill += n
        pdf["shard"] = shards
        pdf["byte_offset"] = offsets
        return pdf[["asset_id", "kind", "n_bytes", "shard", "byte_offset"]]

    return base.groupBy("kind").applyInPandas(
        assign, "asset_id long, kind string, n_bytes long, shard long, byte_offset long"
    )


def shard_layout_documents(tables: dict[str, DataFrame]) -> DataFrame:
    return shard_layout(assets_from_documents(tables["documents"]))


def caption_pairs(tables: dict[str, DataFrame]) -> DataFrame:
    """Caption-pair curation — the LAION-style image-text filtering step:
    each asset joins its caption document (asset_id == doc_id, the pair
    contract) and the pair is kept only if the caption is substantial
    (≥ 5 tokens) and clears the quality floor (0.55, the same cut curation_pipeline discriminates with). This is the multimodal
    member of the selection family: the asset axis carries bytes/kind, the
    text axis carries the quality signal, and the decision column is what
    a pair-dataset writer consumes.

    Scale: assets derive from the same scan here; in production this is a
    key-partitioned join of an asset table to a caption table — equi-join
    on the pair id, no special machinery. All columns are deterministic
    functions of the text, so the whole pair table hash-gates."""
    from flink_210225_spark.ops.text import _quality_expr, tokens_col

    docs = tables["documents"]
    assets = assets_from_documents(docs)
    toks = tokens_col(F.col("text"))
    caps = docs.select(
        "doc_id",
        F.size(toks).alias("caption_tokens"),
        _quality_expr(toks).alias("caption_quality"),
    )
    joined = assets.join(caps, assets.asset_id == caps.doc_id)
    keep = (F.col("caption_tokens") >= 5) & (F.col("caption_quality") >= 0.55)
    return joined.select(
        "asset_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("caption_tokens").cast("long").alias("caption_tokens"),
        "caption_quality",
        keep.alias("keep_pair"),
    )


QUERIES = {
    "multimodal_caption_pairs": caption_pairs,
    "multimodal_decode": decode_documents,
    "multimodal_frame_plan": frame_plan_documents,
    "multimodal_audio_segments": audio_segments_documents,
    "multimodal_tile_plan": tile_plan_documents,
    "multimodal_shard_layout": shard_layout_documents,
}

ORACLES = {
    "multimodal_caption_pairs": """
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
                   octet_length(encode(text)) AS nb
            FROM documents
        ),
        q AS (
            SELECT doc_id, nb,
                   len(toks)::BIGINT AS caption_tokens,
                   floor((0.4 * least(len(toks) / 100.0, 1.0)
                          + 0.3 * (len(list_distinct(toks)) * 1.0 / len(toks))
                          + 0.3 * (1.0 - abs(len(list_filter(toks, tk -> tk IN ('the','a')))
                                             * 1.0 / len(toks) - 0.1))) * 10000 + 0.5)
                       / 10000 AS caption_quality
            FROM t
        )
        SELECT doc_id AS asset_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               nb::BIGINT AS n_bytes,
               caption_tokens,
               caption_quality,
               (caption_tokens >= 5 AND caption_quality >= 0.55) AS keep_pair
        FROM q
    """,
    # Recursive-CTE walk of the same next-fit kernel per kind: state tuple
    # (shard, fill) advances one asset per iteration; byte_offset is the
    # fill BEFORE placement. Any drift in ordering, the overflow rule, or
    # the oversized-asset case breaks the driver hash.
    "multimodal_shard_layout": """
        WITH RECURSIVE d AS (
            SELECT doc_id AS asset_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   octet_length(encode(text))::BIGINT AS n_bytes,
                   row_number() OVER (PARTITION BY doc_id % 3 ORDER BY doc_id)
                       AS seq
            FROM documents
        ),
        walk AS (
            SELECT kind, 0::BIGINT AS seq, 0::BIGINT AS shard, 0::BIGINT AS fill,
                   NULL::BIGINT AS asset_id, NULL::BIGINT AS n_bytes,
                   NULL::BIGINT AS out_shard, NULL::BIGINT AS out_offset
            FROM (SELECT DISTINCT kind FROM d)
            UNION ALL
            SELECT w.kind, e.seq,
                   CASE WHEN w.fill > 0 AND w.fill + e.n_bytes > 4096
                        THEN w.shard + 1 ELSE w.shard END,
                   CASE WHEN w.fill > 0 AND w.fill + e.n_bytes > 4096
                        THEN e.n_bytes ELSE w.fill + e.n_bytes END,
                   e.asset_id, e.n_bytes,
                   CASE WHEN w.fill > 0 AND w.fill + e.n_bytes > 4096
                        THEN w.shard + 1 ELSE w.shard END,
                   CASE WHEN w.fill > 0 AND w.fill + e.n_bytes > 4096
                        THEN 0 ELSE w.fill END
            FROM walk w JOIN d e ON e.kind = w.kind AND e.seq = w.seq + 1
        )
        SELECT asset_id, kind, n_bytes, out_shard AS shard,
               out_offset AS byte_offset
        FROM walk WHERE asset_id IS NOT NULL
    """,
    "multimodal_decode": """
        SELECT doc_id AS asset_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               octet_length(encode(text))::BIGINT AS n_bytes,
               sha256(text) AS checksum
        FROM documents
    """,
    "multimodal_frame_plan": """
        SELECT doc_id AS asset_id,
               unnest(range(0, length(text) % 120 + 1, 10))::INT AS frame_idx
        FROM documents
        WHERE doc_id % 3 = 2
    """,
    "multimodal_audio_segments": """
        WITH a AS (
            SELECT doc_id AS asset_id,
                   floor(octet_length(encode(text)) / 2)::BIGINT AS n_samples
            FROM documents WHERE doc_id % 3 = 1
        ),
        s AS (
            SELECT asset_id, n_samples,
                   unnest(range(ceil(n_samples / 128.0)::BIGINT)) AS seg_idx
            FROM a WHERE n_samples > 0
        )
        SELECT asset_id, seg_idx, seg_idx * 128 AS start_sample,
               least(128, n_samples - seg_idx * 128) AS seg_samples
        FROM s
    """,
    "multimodal_tile_plan": """
        WITH i AS (
            SELECT doc_id AS asset_id,
                   (length(text) % 96 + 32)::BIGINT AS w,
                   (length(text) * 7 % 64 + 32)::BIGINT AS h
            FROM documents WHERE doc_id % 3 = 0
        ),
        g AS (
            SELECT asset_id, w, h, ceil(w / 32.0)::BIGINT AS nx,
                   (ceil(w / 32.0)::BIGINT * ceil(h / 32.0)::BIGINT) AS n_tiles
            FROM i
        ),
        t AS (SELECT asset_id, w, h, nx, unnest(range(n_tiles)) AS tile_id FROM g)
        SELECT asset_id, tile_id,
               (tile_id % nx) * 32 AS x0,
               (tile_id // nx) * 32 AS y0,
               least(32, w - (tile_id % nx) * 32) AS tile_w,
               least(32, h - (tile_id // nx) * 32) AS tile_h
        FROM t
    """,
}


def make_demo_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture assets (no external media needed)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64 + i)])
        rows.append(
            (
                i,
                kind,
                payload,
                (64, 48, 16000, 30 * (i % 5 + 1), f"x-demo/{kind}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
