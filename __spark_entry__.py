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
# previous round's final commit. Round 5's window = the 36 operators
# NEW in the round-4 session (every one verified locally against the
# sf0.01 oracle on a vanilla driver-style session) + the 14 oldest
# never-driver-checked names (the remaining TPC-H suite +
# scalar_try_arith). The tail lists the next never-checked cohort
# (streaming, UDF, multimodal metadata, warehouse lifecycle) that
# leads round 6; all are green in this session's local sweeps.
_FIRST_NAMES = (
    # --- round-4 session additions (driver rows needed first) ---
    "events_funnel_regex",
    "orders_concurrent_pairs",
    "part_bom_rollup",
    "sample_balanced_classes",
    "stat_theil_sen_monthly",
    "geo_radius_pairs_bucketed",
    "agg_sketch_set_intersection",
    "heavy_hitters_misra_gries",
    "quality_hashed_classifier",
    "corpus_token_budget_allocation",
    "contamination_embedding_check",
    "text_novelty_per_doc",
    "stream_exactly_once_sink",
    "stream_union_sources",
    "multimodal_audio_silence_segments",
    "warehouse_branch_merge",
    "udtf_sessionize_table_arg",
    "lang_id_confusion",
    "sample_priority_weighted",
    "stat_mannwhitney_u",
    "warehouse_quarantine_load",
    "ts_gap_fill_locf",
    "embedding_pca_power_iteration",
    "stat_subsample_bootstrap_ci",
    "basket_frequent_triples",
    "pipeline_source_quality_card",
    "scalar_ip_cidr_family",
    "ts_holt_linear",
    "dq_json_schema_drift",
    "events_velocity_flags",
    "events_bot_detection",
    "stats_ab_test_proportions",
    "text_rake_keyphrases",
    "multimodal_cdc_chunk_dedup",
    "warehouse_clone_zero_copy",
    "warehouse_two_table_atomic_publish",
    # --- oldest never-driver-checked (TPC-H completion) ---
    "scalar_try_arith",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_priority_lines",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_sole_late_supplier",
    "q22_idle_rich_segments",
    # --- past the 50-wide window: never-checked cohort, leads round 6 ---
    "stream_upsert_warehouse",
    "join_skew_stress",
    "q14_promo_effect",
    "warehouse_load_fetch",
    "schema_infer_documents",
    "udf_arrow_optimized",
    "udf_pandas_vectorized",
    "udaf_apply_in_pandas",
    "udtf_bigrams",
    "udf_python_scalar",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_watermark",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_stream_left_outer_join",
    "stream_update_mode_history",
    "multimodal_media_meta",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize_thumbnail",
    "multimodal_modality_stats",
    "warehouse_expiry_sweep",
    "warehouse_schema_evolution",
    "warehouse_compact_small_files",
    "histogram_fixed_bins",
    "dedup_levenshtein_verify",
    "window_running_drawdown",
    "join_asof_nearest",
    "agg_filtered_aggregates",
    "agg_argmax_struct",
    "setop_intersect_all",
    "setop_except_all",
    "scalar_null_semantics",
    "join_null_safe_eq",
    "agg_mode",
    "agg_string_agg",
    "scalar_url_extract",
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
