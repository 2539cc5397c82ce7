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
    # --- round-14 head: every op whose PLAN, kernel, or semantics
    # changed this round, first. The three re-anchored event-time ops
    # (predicates moved from the unsatisfiable events-vs-orders era
    # onto populated events-domain shapes), the in-op pair-budget
    # gates on join_theta and dedup_tfidf_cosine_pairs (shared
    # require_pair_budget helper with validated env overrides), the
    # as-of-nearest forward-leg rewire onto _asof_forward_day_orders,
    # and the band-size memo's full-file-tuple cache key. ---
    "join_range_bucketed",
    "join_asof_forward",
    "events_velocity_flags",
    "join_asof_nearest",
    "join_theta",
    "dedup_tfidf_cosine_pairs",
    # --- late-round-14 numeric-census re-anchors (freshness gate to
    # the events domain, is_red color predicate, OOV-capable vocab) ---
    "join_asof_tolerance",
    "scalar_string",
    "tokenizer_vocab_coverage",
    # --- shared-gate path (the embedding family now routes through
    # ops/_util.require_pair_budget) ---
    "dedup_embedding_neardup",
    "dedup_semantic_clusters",
    "dedup_connected_components",
    # --- band-size memo cache-key change (ADVICE r13 #2) ---
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_minhash_estimate_quality",
    "dedup_lsh_bucket_skew",
    # --- sf1-dilution docstring subjects + the bench-adjudication
    # target (fresh driver evidence is cheap) ---
    "q11_important_stock",
    "heavy_hitters_misra_gries",
    "pipeline_curation_v3",
    "tfidf_top_terms",
    # --- round-13 head re-checks (corpus-derived banding, jaccard
    # histogram refactor, bloom guard, federated union) ---
    "dedup_jaccard_threshold_histogram",
    "dedup_neardup_clusters",
    "contamination_bloom_prefilter",
    "source_federated_union",
    "multimodal_video_frame_dedup",
    "join_range_bands",
    "embedding_pca_second_component",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_simhash_neardup",
    "dedup_levenshtein_verify",
    # --- round-11/12 re-checks (MG merge, lazy PCA, kmeans guard,
    # FLAC trio) ---
    "embedding_pca_power_iteration",
    "kmeans_lloyd",
    "multimodal_decode_flac_real",
    "multimodal_payload_entropy",
    "multimodal_cdc_chunk_dedup",
    # --- jitter adjudication pair (VERDICT r10 #6) ---
    "stream_tumbling_counts",
    "part_bom_rollup",
    # --- dedup/pipeline family siblings of the gated refactors ---
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
