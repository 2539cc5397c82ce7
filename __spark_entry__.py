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
# driver-checked at least once (the r1-r10 union covers all 378), so
# the head is now always the ops whose plan/code changed most
# recently.
_FIRST_NAMES = (
    # --- round-11 head: every op whose PLAN or code changed this
    # round, first. The Misra-Gries second-level merge (VERDICT r10
    # #1), both PCA ops under the kmeans un-persist/co-partition
    # template (#2), the partitioned-JDBC federated union (#3), the
    # kmeans shuffle_partitions guard, and the FLAC advice fixes.
    # Every registered query is already driver-checked, so the rest
    # of the window re-checks round-10's plan-changed ops + the two
    # jitter-adjudication queries. ---
    "heavy_hitters_misra_gries",
    "embedding_pca_power_iteration",
    "embedding_pca_second_component",
    "source_federated_union",
    "kmeans_lloyd",
    "multimodal_decode_flac_real",
    "multimodal_payload_entropy",
    "multimodal_cdc_chunk_dedup",
    # --- jitter adjudication pair (VERDICT r10 #6) ---
    "stream_tumbling_counts",
    "part_bom_rollup",
    # --- round-10 plan-changed re-checks ---
    "dedup_minhash_estimate_quality",
    "dq_expectations_report",
    "basket_affinity_lift",
    "contamination_decontaminate_apply",
    "lang_id_ngram_profile",
    "stats_classifier_kappa",
    "contamination_bloom_prefilter",
    "contamination_ngram_check",
    "dedup_simhash_neardup",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_shingle_containment",
    "dedup_jaccard_threshold_histogram",
    "dedup_incremental_batch",
    "text_novelty_per_doc",
    "pipeline_source_quality_card",
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_sq_topk",
    "embedding_norm_outliers",
    "tfidf_top_terms",
    "dedup_tfidf_cosine_pairs",
    "importance_resample_dsir",
    "multimodal_histogram_dedup",
    "multimodal_decode_image_real",
    "multimodal_decode_audio_real",
    "dedup_connected_components",
    "dedup_semantic_clusters",
    "dedup_embedding_neardup",
    # --- dim-table de-hint representatives (audit commit; AQE now
    # sizes the customer/supplier/part joins at runtime) ---
    "q10_returned_items",
    "q21_sole_late_supplier",
    "q9_product_profit",
    "q15_top_supplier",
    "q20_excess_suppliers",
    "join_inner",
    "join_theta",
    "join_null_safe_eq",
    "join_range_bands",
    "join_cross",
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
