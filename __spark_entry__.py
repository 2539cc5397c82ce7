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
# pre-r15 378; round 15 adds warehouse_load_dataframe, #379), so
# the head is now always the ops whose plan/code changed most
# recently.
_FIRST_NAMES = (
    # --- round-15 head: every op whose PLAN, kernel, or semantics
    # changed this round, first. The four eval-gram probes now route
    # through the MEASURED broadcast gate (_bcast_eval_grams /
    # bcast_measured: counted per corpus, hinted only under 1M rows,
    # bare + AQE above), scalar_try_arith's flag_as_number re-anchored
    # onto a mixed string feed (both try_cast branches live — the last
    # vacuous column), the NEW warehouse_load_dataframe op (S2 bulk
    # path: DataFrame in, distributed inference, widen-only append),
    # and the S2 load() refactor every warehouse verb op exercises. ---
    "scalar_try_arith",
    "warehouse_load_dataframe",
    "window_ranking",
    "contamination_ngram_check",
    "pipeline_training_prep_v2",
    "contamination_bloom_prefilter",
    "contamination_decontaminate_apply",
    "warehouse_load_fetch",
    "warehouse_merge_cdc",
    "warehouse_etl_capstone",
    "warehouse_partitioned_upsert",
    "warehouse_vacuum_snapshots",
    "warehouse_expiry_sweep",
    # --- band-size memo re-key AGAIN (size+mtime identity tuple,
    # ADVICE r14 #3) — the whole banding family re-checks ---
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_minhash_estimate_quality",
    "dedup_lsh_bucket_skew",
    # --- forward-leg fixture subject (code unchanged; the fixture
    # locks the forward-wins/tie branches) ---
    "join_asof_nearest",
    # --- round-14 head re-checks: the re-anchored event-time ops
    # (now with second-decade rows), the in-op pair gates, and the
    # late-r14 numeric-census re-anchors ---
    "join_range_bucketed",
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
    # --- round-13 re-checks (corpus-derived banding, jaccard
    # histogram refactor, federated union) ---
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
    # --- round-11/12 re-checks (MG merge, lazy PCA, kmeans guard,
    # FLAC trio) ---
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
    "dedup_exact_normalized",
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
