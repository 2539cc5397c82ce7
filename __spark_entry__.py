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
    # --- round-12 head: every op whose PLAN, kernel, or semantics
    # changed this round, first. The md5 video-frame signature (the
    # second-decade scale fix), the vectorized bloom probe kernel,
    # the bucketed-equi join_range_bands reshape, the candidate-stage
    # refactors of the shingle/tfidf/simhash/minhash dedup family,
    # PC2's lineage-cut element scan, and the federated-union staging
    # fallback. All were re-certified this session at sf0.001/0.01
    # (pytest + vanilla-session oracle) and sf1 (scaleverify --only,
    # 18/18 match). ---
    "multimodal_video_frame_dedup",
    "contamination_bloom_prefilter",
    "join_range_bands",
    "embedding_pca_second_component",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_tfidf_cosine_pairs",
    "dedup_simhash_neardup",
    "dedup_minhash_verified",
    "dedup_minhash_lsh",
    "dedup_levenshtein_verify",
    "source_federated_union",
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
    "dedup_jaccard_threshold_histogram",
    "dedup_incremental_batch",
    "dedup_strategy_comparison",
    "dedup_lsh_bucket_skew",
    "dedup_cascade_report",
    "dedup_neardup_clusters",
    "dedup_template_groups",
    "dedup_exact_normalized",
    "contamination_ngram_check",
    "contamination_decontaminate_apply",
    "text_novelty_per_doc",
    "pipeline_source_quality_card",
    "pipeline_training_prep_v2",
    "pipeline_curation_v3",
    # --- embedding-family re-checks (scale corpus changed; driver
    # data unchanged, but these share helpers with the PCA/kmeans
    # shapes above) ---
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_sq_topk",
    "embedding_norm_outliers",
    "dedup_connected_components",
    "dedup_semantic_clusters",
    "dedup_embedding_neardup",
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
