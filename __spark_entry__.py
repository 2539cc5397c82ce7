"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL per query (omitted
only for genuinely non-SQL-expressible / approximate operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Queries whose correctness evidence is most valuable this round are
# registered first: the driver's CORRECTNESS sweep covers a prefix of
# the registration order, so the LLM-pipeline / streaming / multimodal
# / UDF surface (the north-star ops) and queries whose oracles changed
# this round must land inside that verified prefix. Relational +
# window queries follow — they were all driver-verified in round 1.
_FIRST_NAMES = (
    # oracles fixed / added in round 2 — need fresh driver rows
    "join_left_outer",
    "join_right_outer",
    "json_extract_props",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "dedup_minhash_verified",
    # new in round 2
    "subq_exists_late_ship",
    "subq_scalar_avg_qty",
    "subq_in_groupby_having",
    "subq_not_exists_idle_rich",
    "scd2_order_history",
    "rollup_hypertable",
    "similarity_lsh_topk",
    "doc_repetition_score",
    "quality_gopher_filters",
    "dedup_url_canonical",
    "dedup_crossdoc_segments",
    "contamination_ngram_check",
    "dedup_exact_normalized",
    "stream_ingest_warehouse",
    "stream_topk_per_window",
    "gap_islands_streaks",
    "q7_nation_volume",
    "kmeans_lloyd",
    "pack_training_sequences",
    "sample_temperature_mix",
    "lm_commonness_score",
    "sample_topk_hash_per_group",
    "multimodal_shard_packing",
    "multimodal_dedup_payload",
    "multimodal_caption_pairs",
    "agg_hll_mergeable_rollup",
    "ts_resample_interpolate",
    "graph_pagerank",
    "pipeline_training_prep_v2",
    "stream_late_data_drop",
    "join_bucketed_colocated",
    "join_dynamic_partition_pruned",
    "stat_corr_cov",
    "funnel_conversion",
    "retention_cohorts",
    "dedup_neardup_clusters",
    # changed after the r1 driver snapshot (two-phase top-k rewrite /
    # int-width fixes) — need fresh driver rows
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "token_count",
    "quality_score",
    "dedup_minhash_lsh",
    # valuable but lower-priority for the fixed-size driver window —
    # still ahead of the module-order tail
    "window_dedup_latest",
    "chunking_distributed",
    "join_asof_forward",
    "q14_promo_effect",
    "warehouse_load_fetch",
    "schema_infer_documents",
    "udf_arrow_optimized",
    "histogram_fixed_bins",
    "stream_update_mode_history",
    "dedup_levenshtein_verify",
    "window_running_drawdown",
    "warehouse_expiry_sweep",
    "warehouse_schema_evolution",
    "warehouse_compact_small_files",
    "join_asof_nearest",
    "agg_filtered_aggregates",
    "agg_argmax_struct",
    "setop_intersect_all",
    "setop_except_all",
    "scalar_null_semantics",
)


def _registry():
    from load_datawarehouse_spark.ops import (
        llm,
        multimodal,
        relational,
        streaming,
        udfs,
        windows,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (llm, streaming, multimodal, udfs, relational, windows):
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
