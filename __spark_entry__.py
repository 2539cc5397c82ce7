"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL per query (omitted
only for genuinely non-SQL-expressible / approximate operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Queries whose correctness evidence is most valuable next round are
# registered first: the driver's CORRECTNESS sweep covers a prefix of
# the registration order (50 names), generated at ROUND START from the
# previous round's final commit. Round 5's window = 50 NEVER
# driver-checked names drawn from the highest-risk cohorts (the full
# UDF-surface exhibits, the core streaming ops, the multimodal
# metadata family, the warehouse lifecycle trio, the 9 newest
# analytics-wave ops, and the last TPC-H shapes q14/q17/q18 that
# complete the driver-green Q1-Q22 sweep). Every name is green in
# this session's vanilla sf0.01 oracle sweep. The tail lists the
# next never-checked cohort that leads round 6.
_FIRST_NAMES = (
    # --- newest analytics wave (post-validation ops, ADVICE fixes applied) ---
    "pipeline_experiment_readout",
    "stats_sprt_monitoring",
    "stat_empirical_bayes_rates",
    "stat_matched_pairs_uplift",
    "basket_association_rules",
    "embedding_pca_second_component",
    "ts_forecast_baseline_backtest",
    "multimodal_histogram_dedup",
    "stats_classifier_kappa",
    # --- TPC-H completion (only shapes never driver-checked) ---
    "q14_promo_effect",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    # --- UDF surface (10/11 never checked before this round) ---
    "udf_python_scalar",
    "udf_arrow_optimized",
    "udf_pandas_vectorized",
    "udf_pandas_iter",
    "udaf_apply_in_pandas",
    "udaf_grouped_agg_pandas",
    "udtf_bigrams",
    "udtf_dynamic_schema",
    "udf_map_in_arrow",
    "udf_cogrouped_merge",
    # --- streaming core (15/20 never checked before this round) ---
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_watermark",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_stream_left_outer_join",
    "stream_update_mode_history",
    "stream_upsert_warehouse",
    "stream_static_enrich",
    "stream_ivm_aggregate",
    "stream_backfill_then_tail",
    # --- multimodal metadata family ---
    "multimodal_media_meta",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize_thumbnail",
    "multimodal_modality_stats",
    "multimodal_decode_image_real",
    # --- warehouse lifecycle ---
    "warehouse_load_fetch",
    "warehouse_expiry_sweep",
    "warehouse_schema_evolution",
    "warehouse_compact_small_files",
    "warehouse_time_travel",
    "warehouse_merge_cdc",
    # --- schema inference + core relational never-checked ---
    "schema_infer_documents",
    "join_skew_stress",
    "join_asof_nearest",
    "histogram_fixed_bins",
    "dedup_levenshtein_verify",
    # --- past the 50-wide window: never-checked cohort, leads round 6 ---
    "stream_transform_with_state",
    "stream_chained_windows",
    "stream_temporal_dim_join",
    "multimodal_decode_audio_real",
    "multimodal_pipeline_prep",
    "multimodal_audio_energy",
    "multimodal_video_shot_boundaries",
    "multimodal_image_dhash",
    "multimodal_payload_entropy",
    "multimodal_video_frame_dedup",
    "warehouse_vacuum_snapshots",
    "window_running_drawdown",
    "window_moving_median",
    "window_ema_fold",
    "window_running_distinct",
    "window_rolling_zscore",
    "window_share_of_total",
    "ts_seasonal_decompose",
    "ts_cusum_changepoint",
    "orders_month_pacing_curve",
    "agg_filtered_aggregates",
    "agg_argmax_struct",
    "setop_intersect_all",
    "setop_except_all",
    "scalar_null_semantics",
    "join_null_safe_eq",
    "agg_mode",
    "agg_string_agg",
    "scalar_url_extract",
    "dedup_exact_groups",
    "dedup_exact_keep_first",
    "text_stats",
    "dedup_ngram_jaccard",
    "dedup_simhash_neardup",
    "doc_fingerprint_simhash",
    "lang_id_markers",
    "dedup_embedding_neardup",
    "dedup_connected_components",
    "pipeline_training_prep",
    "text_normalize",
    "pii_scrub",
)


def _registry():
    from load_datawarehouse_spark.ops import (
        analytics,
        llm,
        multimodal,
        relational,
        streaming,
        tpch,
        udfs,
        windows,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (llm, streaming, multimodal, udfs, relational, windows, tpch, analytics):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)

    def _reorder(d: dict) -> dict:
        head = {k: d[k] for k in _FIRST_NAMES if k in d}
        return head | {k: v for k, v in d.items() if k not in head}

    return _reorder(queries), _reorder(oracles)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from load_datawarehouse_spark.ops.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
