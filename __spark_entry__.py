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
# previous round's final commit. Round 9's head-50 = the FINAL 30
# never-driver-checked names (staged in round 8's tail; zero overlap
# with the r1-r8 CORRECTNESS union, which covers 347 of the 377
# registered names) + `orders_revenue_bridge` (round 8's one hash-fail,
# fixed this round: signed-zero canonicalization in the oracle) + 19
# re-checks of ops whose code changed in rounds 7-9 (pointer-jumping CC
# propagation, exact-neardup restoration, support-pruned triangles,
# widened PNG decoder, kmeans mean-update broadcast drop, pair-first
# minhash verify, cosine 6-dp quantization family, warehouse verbs).
# After this window converts, every registered query has been
# driver-checked at least once.
_FIRST_NAMES = (
    # --- round-10 head: ops whose PLANS changed this round (the
    # broadcast-audit de-hinting + the kmeans persist drop) — every
    # registered query is already driver-checked, so the window is
    # 100% re-checks of changed code ---
    "dedup_minhash_estimate_quality",
    "dq_expectations_report",
    "basket_affinity_lift",
    "contamination_decontaminate_apply",
    "kmeans_lloyd",
    # --- NEW op this round (never driver-checked) ---
    "multimodal_decode_flac_real",
    # --- re-checks (round-9 window, all green there) ---
    "agg_corr_matrix_single_pass",
    "bpe_first_merges",
    "dedup_embedding_exact",
    "dedup_incremental_batch",
    "dedup_jaccard_threshold_histogram",
    "dedup_lsh_bucket_skew",
    "dedup_shingle_containment",
    "dedup_strategy_comparison",
    "dedup_tfidf_cosine_pairs",
    "embedding_norm_outliers",
    "features_user_hash_vector",
    "graph_label_propagation",
    "lang_id_ngram_profile",
    "orders_price_time_band_pairs",
    "orders_spc_control_chart",
    "pipeline_curation_v3",
    "pipeline_split_decontam_audit",
    "quality_dedup_rate_by_source",
    "quality_source_kl_divergence",
    "quality_source_lang_entropy",
    "search_bm25_topk",
    "search_rrf_fusion",
    "split_train_val_test",
    "stat_wasserstein_1d",
    "stats_ab_power_mde",
    "stats_diff_in_diff",
    "text_heaps_law_curve",
    "text_readability_score",
    "text_zipf_fit",
    "warehouse_partitioned_upsert",
    # --- re-checks: ops whose code changed in rounds 7-9, plus the
    # round-8 red row (signed-zero oracle, fixed in round 9) ---
    "orders_revenue_bridge",
    "dedup_embedding_neardup",
    "dedup_connected_components",
    "dedup_semantic_clusters",
    "graph_triangle_count",
    "multimodal_decode_image_real",
    "multimodal_decode_audio_real",
    "dedup_minhash_verified",
    "dedup_minhash_lsh",
    "embedding_pca_second_component",
    "embedding_pca_power_iteration",
    "graph_pagerank",
    "similarity_cosine_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "dedup_simhash_neardup",
    "dedup_ngram_jaccard",
    "warehouse_merge_cdc",
    "warehouse_load_fetch",
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
