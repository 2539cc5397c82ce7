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
    # --- round-13 head: every op whose PLAN, kernel, or semantics
    # changed this round, first. The corpus-derived LSH banding
    # (ordered-concat band keys + _lsh_band_size, mirrored by the
    # params CTE in every banding oracle), the in-op pair-budget gate
    # on the exact embedding family (_label_cos_edges measures
    # sum C(n_label,2) before scheduling), the
    # jaccard-threshold-histogram refactor onto the shared
    # _capped_shingle_pairs stage, the bloom probe's zero-length
    # reduceat guard, and the federated-union fallback logging. ---
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_minhash_estimate_quality",
    "dedup_lsh_bucket_skew",
    "dedup_embedding_neardup",
    "dedup_semantic_clusters",
    "dedup_connected_components",
    "dedup_jaccard_threshold_histogram",
    "dedup_neardup_clusters",
    "contamination_bloom_prefilter",
    "source_federated_union",
    # --- round-12 head re-checks (video signature, range bands, PC2,
    # shingle/tfidf/simhash candidate stages) ---
    "multimodal_video_frame_dedup",
    "join_range_bands",
    "embedding_pca_second_component",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_tfidf_cosine_pairs",
    "dedup_simhash_neardup",
    "dedup_levenshtein_verify",
    "join_theta",
    # --- round-11 head re-checks (MG merge, lazy PCA, kmeans guard,
    # FLAC trio) ---
    "heavy_hitters_misra_gries",
    "embedding_pca_power_iteration",
    "kmeans_lloyd",
    "multimodal_decode_flac_real",
    "multimodal_payload_entropy",
    "multimodal_cdc_chunk_dedup",
    # --- jitter adjudication pair (VERDICT r10 #6) ---
    "stream_tumbling_counts",
    "part_bom_rollup",
    # --- dedup/pipeline family siblings of this round's refactors ---
    "dedup_incremental_batch",
    "dedup_strategy_comparison",
    "dedup_cascade_report",
    "dedup_template_groups",
    "dedup_exact_normalized",
    "contamination_ngram_check",
    "contamination_decontaminate_apply",
    "text_novelty_per_doc",
    "pipeline_source_quality_card",
    "pipeline_training_prep_v2",
    "pipeline_curation_v3",
    # --- embedding-family re-checks (share helpers with the gated
    # pair family above) ---
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
    "join_range_bucketed",
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
