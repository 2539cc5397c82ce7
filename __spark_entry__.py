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
# previous round's final commit. Every registered query has been
# driver-checked at least once (the r1-r10 union covers all of the
# pre-r15 378; round 15 added warehouse_load_dataframe, round 16
# warehouse_load_nested_evolution, #380), so the head is now always
# the ops whose plan/code changed most recently.
_FIRST_NAMES = (
    # --- round-16 head: every op whose PLAN, kernel, or semantics
    # changed this round, first. The six VERDICT r15 #1 re-anchors
    # (driver-scale evidence now non-vacuous: populated at sf0.01),
    # the NEW warehouse_load_nested_evolution + the recursive
    # nested-struct conform the whole S2 DataFrame path now routes
    # through (ADVICE r15 #1), and the eval-gram memo tag re-key
    # (per gram order — the bloom site's 6-gram frame no longer
    # counts under the 8-gram tag, ADVICE r15 #3). ---
    "warehouse_load_nested_evolution",
    "warehouse_load_dataframe",
    "join_anti",
    "setop_except",
    "q22_idle_rich_segments",
    "subq_not_exists_idle_rich",
    "multimodal_audio_silence_segments",
    "orders_price_time_band_pairs",
    "dedup_exact_groups",
    "contamination_bloom_prefilter",
    "contamination_ngram_check",
    "pipeline_training_prep_v2",
    "contamination_decontaminate_apply",
    # --- S2 load() conform refactor: the verb family re-checks ---
    "warehouse_load_fetch",
    "warehouse_merge_cdc",
    "warehouse_etl_capstone",
    "warehouse_partitioned_upsert",
    "warehouse_vacuum_snapshots",
    "warehouse_expiry_sweep",
    "warehouse_quarantine_load",
    "warehouse_schema_evolution",
    "warehouse_snapshot_diff",
    "warehouse_time_travel",
    "warehouse_right_to_forget",
    "warehouse_two_table_atomic_publish",
    "warehouse_incremental_view",
    "warehouse_idempotent_backfill",
    # --- siblings of the re-anchored ops (shared claims/predicates) ---
    "setop_except_all",
    "setop_intersect",
    "dedup_exact_normalized",
    "dedup_exact_keep_first",
    "multimodal_audio_energy",
    "join_range_bucketed",
    # --- round-15 head re-checks: measured eval-gram gate family,
    # the re-anchored scalar/window ops, the banding memo re-key ---
    "scalar_try_arith",
    "window_ranking",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_minhash_estimate_quality",
    "dedup_lsh_bucket_skew",
    "join_asof_nearest",
    "join_asof_forward",
    "events_velocity_flags",
    "join_asof_tolerance",
    "join_theta",
    "dedup_tfidf_cosine_pairs",
    "scalar_string",
    "tokenizer_vocab_coverage",
    # --- shared-gate path (embedding family on require_pair_budget) ---
    "dedup_embedding_neardup",
    "dedup_semantic_clusters",
    "dedup_connected_components",
    # --- earlier-round re-checks (banding, jaccard histogram,
    # federated union, MG merge, lazy PCA, kmeans, FLAC trio) ---
    "dedup_jaccard_threshold_histogram",
    "dedup_neardup_clusters",
    "source_federated_union",
    "multimodal_video_frame_dedup",
    "join_range_bands",
    "embedding_pca_second_component",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_simhash_neardup",
    "dedup_levenshtein_verify",
    "embedding_pca_power_iteration",
    "kmeans_lloyd",
    "multimodal_decode_flac_real",
    "multimodal_payload_entropy",
    "multimodal_cdc_chunk_dedup",
    # --- dedup/pipeline family siblings of the gated probes ---
    "dedup_incremental_batch",
    "dedup_strategy_comparison",
    "dedup_cascade_report",
    "dedup_template_groups",
    "text_novelty_per_doc",
    "pipeline_source_quality_card",
    "pipeline_curation_v3",
    # --- embedding-family re-checks ---
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_sq_topk",
    "embedding_norm_outliers",
    # --- join/flagship representatives ---
    "q10_returned_items",
    "q3_shipping_priority",
    "q1_pricing_summary",
    "join_inner",
    "join_null_safe_eq",
    "join_asof",
    "join_skew_salted",
    "graph_triangle_count",
    "basket_association_rules",
    "stream_static_enrich",
    "search_rrf_fusion",
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
