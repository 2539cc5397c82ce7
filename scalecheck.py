"""Measured scaling evidence: wall-time slope sf0.1 -> sf1.

Runs the scale-relevant queries at the driver's sf0.1 data AND the
replicated sf1 data from ``scalegen.py`` (10x rows, key space scaled,
perturbed text/embeddings) and reports the per-query slope

    slope = t(sf1) / t(sf0.1)

against the 10x data growth. A slope near (or below) 10 on local[32]
means the plan does per-row work with no superlinear term — the hard
evidence behind the plan-shape locks in tests/test_plans.py. Also
times the skew-stress join salted vs unsalted on the sf1 data, where
the zipfian hot key is big enough for straggler effects to show.

Usage: python scalegen.py 10 && python scalecheck.py
Writes SCALECHECK.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

SCALE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q10_returned_items",
    "join_asof",
    "time_window_session",
    "topk_per_group",
    "dedup_exact_keep_first",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "dedup_simhash_neardup",
    "similarity_cosine_topk",
    "similarity_lsh_topk",
    "tfidf_top_terms",
    "contamination_ngram_check",
    "pipeline_training_prep_v2",
    "ts_resample_interpolate",
    "graph_pagerank",  # at sf1 the event graph is real, not stage overhead
    # round-4 additions
    "q18_large_volume_customer",
    "similarity_sq_topk",
    "importance_resample_dsir",
    "dedup_intradoc_segments",
    "quality_perplexity_buckets",
    "basket_affinity_lift",
    # round-8: support-pruned + hub-capped semantics (min co-order
    # support 4, degree cap 2048) turned the near-complete synthetic
    # co-order graph into a 1.1M-edge affinity graph at sf1, closing
    # the one slope-table hole (see the op's docstring).
    "graph_triangle_count",
    "attribution_last_touch",
    "features_user_daily",
    "search_bm25_topk",
    "text_token_entropy",
    "quality_domain_cap",
    "window_running_distinct",
    "dq_key_skew_gini",
    "ts_cusum_changepoint",
    "dedup_tfidf_cosine_pairs",
    "pipeline_split_decontam_audit",
    "pipeline_curation_v3",
    "events_rolling_wau",
    "orders_open_backlog_daily",
    "bpe_first_merges",
    "orders_pareto_skyline",
    # round-4 session additions
    "events_funnel_regex",
    "heavy_hitters_misra_gries",
    "text_novelty_per_doc",
    "quality_hashed_classifier",
    "sample_balanced_classes",
    "part_bom_rollup",
    "orders_concurrent_pairs",
    "embedding_pca_power_iteration",
    "sample_priority_weighted",
    "stat_subsample_bootstrap_ci",
    "basket_frequent_triples",
    "ts_gap_fill_locf",
    "geo_radius_pairs_bucketed",
    "text_rake_keyphrases",
    "lang_id_ngram_profile",
    "multimodal_cdc_chunk_dedup",
    "stats_classifier_kappa",
    "stat_wasserstein_1d",
    "orders_price_time_band_pairs",
    "orders_spc_control_chart",
    "multimodal_video_frame_dedup",
    "ts_holt_linear",
    # round-4 post-validation wave + round-5 additions
    "stats_sprt_monitoring",
    "basket_association_rules",
    "stat_empirical_bayes_rates",
    "pipeline_experiment_readout",
    "stat_matched_pairs_uplift",
    "embedding_pca_second_component",
    "ts_forecast_baseline_backtest",
    "multimodal_histogram_dedup",
    "stream_backfill_then_tail",
    "multimodal_decode_audio_real",
    "multimodal_decode_flac_real",
    # round-6 additions: the pair-view variants and lineage-cut
    # beneficiaries whose physical plans changed in r5 (verdict ask) —
    # lock their slopes post-change
    "dedup_jaccard_threshold_histogram",
    "dedup_incremental_batch",
    "dedup_shingle_containment",
    "dedup_strategy_comparison",
    "dedup_lsh_bucket_skew",
    "dedup_cascade_report",
    "contamination_bloom_prefilter",
    "dedup_neardup_clusters",
    # dedup_semantic_clusters was OUT in round 6 (>35 min at sf1: the
    # label-blocked pair graph on replicated embeddings was ~100x
    # denser). Round 7's banded-LSH edge blocking cut one sf1
    # evaluation to ~78 s, so it is measured again.
    "dedup_semantic_clusters",
    "quality_dedup_rate_by_source",
    # round-7 expansion: one representative per plan family that had
    # no sf1 evidence yet — join strategies, grouping shuffles,
    # window frames, set ops, streaming at volume, pipeline
    # analytics, UDF/Arrow paths, and distributed schema inference
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_approx_count_distinct",
    "agg_weighted_median",
    "join_inner",
    "join_semi",
    "join_anti",
    "join_skew_salted",
    "join_range_bands",
    "window_ranking",
    "window_rows_frame",
    "window_moving_median",
    "window_share_of_total",
    "setop_except_all",
    "pivot_multi_agg",
    "unpivot_long",
    "topk_global",
    "gap_islands_streaks",
    "subq_in_groupby_having",
    "q8_market_share",
    "q9_product_profit",
    "scd2_order_history",
    "retention_cohorts",
    "funnel_conversion",
    "markov_event_transitions",
    "rfm_segmentation",
    "survival_kaplan_meier",
    "events_dau_wau_stickiness",
    "events_peak_concurrency_daily",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_watermark",
    "dedup_exact_groups",
    "dedup_url_canonical",
    "doc_fingerprint_simhash",
    "split_train_val_test",
    "sample_stratified_hash",
    "quality_gopher_filters",
    "pii_scrub",
    "token_count",
    "udf_pandas_vectorized",
    "udaf_grouped_agg_pandas",
    "kmeans_lloyd",
    "schema_infer_documents",
    # round-7 expansion, second wave: the remaining scalar / set-op /
    # window / join / subquery / TPC-H / UDF-flavor / multimodal-meta
    # faces, the streaming remainder, and the warehouse verbs that
    # write real data at volume
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "scalar_case_when",
    "scalar_array",
    "scalar_map",
    "scalar_url_extract",
    "scalar_null_semantics",
    "scalar_try_arith",
    "scalar_bitwise_family",
    "scalar_calendar_edges",
    "scalar_string_shape",
    "scalar_encoding_family",
    "scalar_geo_wkt",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "setop_distinct",
    "setop_intersect_all",
    "window_lag_lead",
    "window_ntile",
    "window_first_last",
    "window_distribution",
    "window_range_frame",
    "window_dedup_latest",
    "window_rank_delta",
    "window_ema_fold",
    "window_rolling_zscore",
    "window_running_drawdown",
    "join_left_outer",
    "join_full_outer",
    "join_cross",
    "join_theta",
    "join_null_safe_eq",
    "join_asof_forward",
    "join_bucketed_colocated",
    "join_hint_shuffle_hash",
    "q4_order_priority",
    "q11_important_stock",
    "q12_priority_lines",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "q22_idle_rich_segments",
    "subq_scalar_avg_qty",
    "subq_not_exists_idle_rich",
    "agg_basic",
    "agg_percentiles",
    "agg_mode",
    "agg_approx_percentile",
    "agg_string_agg",
    "events_velocity_flags",
    "events_bot_detection",
    "funnel_time_to_convert",
    "attribution_first_touch",
    "udf_python_scalar",
    "udf_arrow_optimized",
    "udf_map_in_arrow",
    "udf_pandas_iter",
    "udf_cogrouped_merge",
    "udtf_bigrams",
    "udtf_sessionize_table_arg",
    "udaf_apply_in_pandas",
    "time_window_tumbling",
    "time_window_sliding",
    "multimodal_media_meta",
    "multimodal_modality_stats",
    "multimodal_payload_entropy",
    "multimodal_image_dhash",
    "multimodal_audio_energy",
    "text_normalize",
    "text_readability_score",
    "text_zipf_fit",
    "text_heaps_law_curve",
    "lang_id_markers",
    "lang_id_confusion",
    "doc_repetition_score",
    "histogram_fixed_bins",
    "warehouse_load_fetch",
    "warehouse_load_dataframe",
    "warehouse_load_nested_evolution",
    "warehouse_merge_cdc",
    "warehouse_time_travel",
    "warehouse_incremental_view",
    # round-7 expansion, third wave: the full registry remainder
    "agg_higher_moments",
    "events_anomaly_zscore",
    "abc_pareto_analysis",
    "regression_ols_exact",
    "events_burst_hours",
    "orders_monthly_growth",
    "events_interarrival_stats",
    "stat_chi_square",
    "agg_mean_family",
    "stats_winsorized",
    "warehouse_snapshot_diff",
    "layout_zorder_clustering",
    "source_partition_pruned_read",
    "graph_degree_stats",
    "customer_value_decay",
    "events_top_paths_3step",
    "stat_mann_kendall_trend",
    "events_anomaly_iqr",
    "orders_cohort_ltv_curve",
    "supplier_ontime_rate",
    "events_user_lifecycle_states",
    "events_autocorr_lags",
    "orders_benford_first_digit",
    "warehouse_right_to_forget",
    "warehouse_mv_rewrite",
    "agg_boolean_family",
    "regression_per_group_trend",
    "source_schema_merge_read",
    "source_csv_malformed_handling",
    "orders_duplicate_suspects",
    "stat_anova_weekday_revenue",
    "stat_ks_two_sample",
    "orders_revenue_bridge",
    "source_federated_union",
    "lineitem_return_rate_monthly",
    "customer_concentration_hhi",
    "customer_first_last_ratio",
    "orders_sla_attainment",
    "supplier_dual_sourcing_parts",
    "orders_priority_drift_chi2",
    "stat_spearman_qty_price",
    "events_winback_gaps",
    "customer_coverage_half_revenue",
    "part_realized_vs_retail_margin",
    "exec_daily_kpis",
    "stat_dispersion_index",
    "agg_median_abs_deviation",
    "warehouse_etl_capstone",
    "events_type_pmi",
    "warehouse_idempotent_backfill",
    "orders_aging_report",
    "events_weekend_lift",
    "histogram_2d_qty_price",
    "geo_haversine_topk",
    "sessions_gap_sensitivity",
    "orders_nation_shift_share",
    "agg_product_discount_factor",
    "doc_fingerprint_rolling",
    "dedup_levenshtein_verify",
    "dedup_template_groups",
    "dedup_minhash_estimate_quality",
    "array_set_ops_pairs",
    "similarity_ivf_topk",
    "dedup_connected_components",
    "dedup_exact_normalized",
    "sample_temperature_mix",
    "sample_topk_hash_per_group",
    "search_rrf_fusion",
    "embedding_norm_outliers",
    "quality_source_lang_entropy",
    "quality_source_kl_divergence",
    "dedup_embedding_exact",
    "contamination_embedding_check",
    "pipeline_source_quality_card",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_stream_left_outer_join",
    "stream_ingest_warehouse",
    "stream_topk_per_window",
    "stream_late_data_drop",
    "stream_update_mode_history",
    "stream_upsert_warehouse",
    "stream_static_enrich",
    "stream_transform_with_state",
    "stream_chained_windows",
    "stream_ivm_aggregate",
    "stream_exactly_once_sink",
    "stream_union_sources",
    "stream_temporal_dim_join",
    "multimodal_frame_sample",
    "multimodal_resize_thumbnail",
    "multimodal_shard_packing",
    "multimodal_dedup_payload",
    "multimodal_caption_pairs",
    "multimodal_video_shot_boundaries",
    "multimodal_audio_silence_segments",
    "udtf_dynamic_schema",
    "join_right_outer",
    "pivot_wide",
    "chunking_distributed",
    "join_dynamic_partition_pruned",
    "stat_corr_cov",
    "warehouse_expiry_sweep",
    "warehouse_schema_evolution",
    "warehouse_compact_small_files",
    "join_asof_nearest",
    "agg_filtered_aggregates",
    "agg_argmax_struct",
    "warehouse_vacuum_snapshots",
    "join_asof_tolerance",
    "agg_grouping_id",
    "source_formats_roundtrip",
    "ts_seasonal_decompose",
    "orders_month_pacing_curve",
    "stat_theil_sen_monthly",
    "agg_sketch_set_intersection",
    "warehouse_branch_merge",
    "stat_mannwhitney_u",
    "warehouse_quarantine_load",
    "scalar_ip_cidr_family",
    "dq_json_schema_drift",
    "stats_ab_test_proportions",
    "warehouse_clone_zero_copy",
    "warehouse_two_table_atomic_publish",
    "stats_diff_in_diff",
    "warehouse_partitioned_upsert",
    "agg_corr_matrix_single_pass",
    "graph_label_propagation",
    "features_user_hash_vector",
    "stats_ab_power_mde",
    # round-7: banded-LSH blocking chained into the label cells —
    # lock the slope of the new (label, band, bkey) candidate join
    "dedup_embedding_neardup",
    # round-7 final wave: the HEADLINE-only remainder, so every
    # registry query has a slope row (sf1 oracle checks already cover
    # these via scaleverify's SCALE_QUERIES + HEADLINE union)
    "events_hour_dow_heatmap",
    "dq_expectations_report",
    "agg_bitmap_distinct",
    "ngram_lm_counts",
    "embedding_label_centroids",
    "contamination_decontaminate_apply",
    "tokenizer_vocab_coverage",
    "text_stats",
    "quality_score",
    "pipeline_training_prep",
    "dedup_crossdoc_segments",
    "pack_training_sequences",
    "lm_commonness_score",
    "corpus_token_budget_allocation",
    "stream_tumbling_counts",
    "multimodal_feature_extract",
    "multimodal_decode_image_real",
    "multimodal_pipeline_prep",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "agg_groupby_distinct",
    "json_extract_props",
    "join_range_bucketed",
    "subq_exists_late_ship",
    "rollup_hypertable",
    "q7_nation_volume",
    "agg_hll_mergeable_rollup",
    "join_skew_stress",
    "profile_column_stats",
    "nest_order_lines",
    "histogram_equi_depth",
    "q2_min_cost_supplier",
    "q13_order_distribution",
    "q16_supplier_part_counts",
    "q19_disjunctive_revenue",
    "q21_sole_late_supplier",
]


def _warehouse_verb_decade(spark, sf_dir: str, df_legs_only: bool = False) -> dict:
    """One decade of the reference-parity verb surface (VERDICT r13
    #6): drives the S2 load path (prepare -> infer/merge -> append)
    and the R3 merge over the documents table at ``sf_dir``, timing
    each stage separately so driver-side bottlenecks are NAMED, not
    argued.

    ``df_legs_only`` (VERDICT r15 #5, consumed by scalecheck10.py)
    skips the record-oriented legs (collect + record load) and times
    only the distributed paths a 100-TB load actually takes —
    ``load(DataFrame)`` and ``merge`` — so the second decade can be
    measured without collecting half a million documents to the
    driver for a leg whose driver-bound cost is already recorded as
    reference contract.

    The reference's load contract is record-oriented (streaming-
    insert rows through the client), so the measurement honestly
    includes the driver-side stages that contract implies: collect to
    records, pure-Python prepare + schema inference over every
    record, and a driver-side createDataFrame. Those ARE the S2
    bottleneck at scale — a 100-TB deployment routes bulk loads
    through the DataFrame path (`merge` here, or `update`/`df.write`)
    and keeps the record verb for trickle inserts. merge() takes the
    change batch as a DataFrame and stays fully distributed.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from load_datawarehouse_spark.warehouse import SparkWarehouse

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if df_legs_only:
        n_rows = docs.count()
    else:
        t0 = time.perf_counter()
        records = [r.asDict() for r in docs.collect()]
        t_collect = time.perf_counter() - t0
        n_rows = len(records)

    root = tempfile.mkdtemp(prefix="wh_decade_")
    try:
        t_load = None
        if not df_legs_only:
            wh = SparkWarehouse(spark, root, "documents")
            t0 = time.perf_counter()
            wh.load(records)
            t_load = time.perf_counter() - t0

        # the round-15 bulk path: same verb, DataFrame in — clean ->
        # distributed infer (treeAggregate) -> conform -> append, no
        # driver materialization anywhere
        wh_df = SparkWarehouse(spark, root, "documents_df")
        t0 = time.perf_counter()
        wh_df.load(docs)
        t_load_df = time.perf_counter() - t0

        # CDC batch: ~1% updates, ~1% deletes, ~1% inserts, shipped
        # as a DataFrame (the distributed merge path)
        base = docs.filter(F.col("doc_id") % 100 < 3)
        changes = base.select(
            F.when(
                F.col("doc_id") % 100 == 2,
                F.col("doc_id") + F.lit(10_000_000_000),
            )
            .otherwise(F.col("doc_id"))
            .alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        ).withColumn(
            "op",
            F.when(F.col("doc_id") % 100 == 0, F.lit("U"))
            .when(F.col("doc_id") % 100 == 1, F.lit("D"))
            .otherwise(F.lit("I")),
        )
        n_changes = changes.count()
        target = wh_df if df_legs_only else wh
        t0 = time.perf_counter()
        target.merge(changes, keys=["doc_id"])
        t_merge = time.perf_counter() - t0
        n_final = target.df().count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    row = {
        "rows_loaded": n_rows,
        "load_df_sec": round(t_load_df, 3),
        "merge_sec": round(t_merge, 3),
        "n_changes": n_changes,
        "rows_after_merge": n_final,
    }
    if not df_legs_only:
        row["collect_sec"] = round(t_collect, 3)
        row["load_sec"] = round(t_load, 3)
    return row


def _time(fn, *args) -> tuple[float, int]:
    fn(*args).count()  # warmup: codegen/JIT
    best, n = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        n = fn(*args).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    # per-query epilogue: unpersist cluster-mode lineage-cut frames,
    # then drop lazy-localCheckpoint RDD references, so block storage
    # from one query cannot pressure the next one's heap
    from load_datawarehouse_spark.ops._util import release_lineage_cuts

    release_lineage_cuts()
    import gc

    gc.collect()
    return best, n


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    # sf1 working sets + accumulated checkpoint blocks need more than
    # the 8g engine default in one long measurement session
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    small = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.path.join(here, ".scaledata", "sf1.0")
    if not os.path.isdir(big):
        raise SystemExit("run `python scalegen.py 10` first")

    import __spark_entry__ as entry_mod
    from load_datawarehouse_spark.ops.llm import CANDIDATE_PAIR_COUNTS
    from load_datawarehouse_spark.ops.relational import _skew_stress_join
    from load_datawarehouse_spark.session import get_spark

    spark = get_spark(app_name="ldw-scalecheck")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # --only a,b,c -> measure a subset and merge over the existing
    # SCALECHECK.json so the artifact stays a full-set snapshot
    names = list(SCALE_QUERIES)
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = set(sys.argv[2].split(","))
        names = [n for n in names if n in only]

    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = queries[name]
        try:
            t_small, n_small = _time(fn, spark, small)
            t_big, n_big = _time(fn, spark, big)
        except Exception as exc:  # one pathological query must not lose the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr, flush=True)
            continue
        out[name] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1_sec": round(t_big, 3),
            "slope": round(t_big / t_small, 2),
            "rows": [n_small, n_big],
        }
        # Pair-producing ops (dedup families): the synthetic corpus has
        # a small vocabulary, so the TRUE near-dup pair count grows
        # ~quadratically with corpus size — the output is itself
        # hundreds of times larger at sf1. Normalizing by output rows
        # separates engine scaling from workload-intrinsic output
        # growth (in a real corpus the near-dup rate per doc is ~flat,
        # so output ~ N and the raw slope is the fair one).
        if n_small and n_big and n_big / max(n_small, 1) > 20:
            out[name]["slope_per_output_row"] = round(
                (t_big / n_big) / (t_small / n_small), 3
            )
        # pair-producing dedup ops: record the PRE-threshold candidate
        # count (the work the inverted-index/bucket join actually
        # pays for) so slope outliers whose FINAL output shrinks under
        # a DF cap are measured-accounted, not argued (VERDICT r11 #4)
        if name in CANDIDATE_PAIR_COUNTS:
            counter = CANDIDATE_PAIR_COUNTS[name]
            try:
                c_small = counter(spark, small)
                c_big = counter(spark, big)
            except Exception as exc:
                errors[f"{name}.candidates"] = f"{type(exc).__name__}: {exc}"[:300]
            else:
                out[name]["candidates"] = [c_small, c_big]
                if c_small and c_big:
                    out[name]["slope_per_candidate_pair"] = round(
                        (t_big / c_big) / (t_small / c_small), 3
                    )
                print(
                    f"#   candidates {c_small} -> {c_big}"
                    f"  slope/cand {out[name].get('slope_per_candidate_pair')}",
                    file=sys.stderr, flush=True,
                )
        print(f"# {name}: {t_small:.2f}s -> {t_big:.2f}s  slope {out[name]['slope']}",
              file=sys.stderr, flush=True)

    path = os.path.join(here, "SCALECHECK.json")
    skew_prev = None
    if only is not None and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        merged = prev.get("queries", {})
        merged.update(out)
        # prune rows for queries since removed/renamed out of
        # SCALE_QUERIES (advisor r7: stale merged rows otherwise
        # masquerade as current coverage forever)
        out = {k: v for k, v in merged.items() if k in SCALE_QUERIES}
        skew_prev = prev.get("skew_stress_sf1")
        wh_prev = prev.get("warehouse_verb_decade")
    else:
        wh_prev = None

    # warehouse-verb decade row (VERDICT r13 #6): measured on full
    # runs, kept on subset runs, and forcible via
    # `--only warehouse_verb_decade`
    if wh_prev is not None and not (only and "warehouse_verb_decade" in only):
        wh_row = wh_prev
    else:
        wh_row = {}
        _warehouse_verb_decade(spark, small)  # warmup: codegen/JIT/FS
        for label, d in (("sf0.1", small), ("sf1", big)):
            wh_row[label] = _warehouse_verb_decade(spark, d)
            print(f"# warehouse_verb_decade[{label}]: {wh_row[label]}",
                  file=sys.stderr, flush=True)
        s, b = wh_row["sf0.1"], wh_row["sf1"]
        wh_row["slopes"] = {
            k: round(b[f"{k}_sec"] / s[f"{k}_sec"], 2)
            for k in ("collect", "load", "load_df", "merge")
        }
        wh_row["note"] = (
            "S2 load with records in is record-oriented by reference "
            "contract: the decade cost is driver-side (collect + "
            "pure-Python prepare/infer + createDataFrame scale with "
            "row count on ONE machine). load_df is the round-15 bulk "
            "path — the SAME verb with a DataFrame in (distributed "
            "infer via treeAggregate, conform, append; no driver "
            "materialization), so its slope is the engine's, like R3 "
            "merge. At 100 TB, bulk loads pass a DataFrame to load() "
            "or merge/update; the record form is for trickle inserts."
        )

    if skew_prev is not None:
        skew = skew_prev  # subset run keeps the full run's measurement
    else:
        skew = {}
        for label, salted in (("salted", True), ("unsalted", False)):
            t, n = _time(_skew_stress_join, spark, big, salted)
            skew[label] = {"sec": round(t, 3), "rows": n}
            print(f"# skew_stress[{label}] sf1: {t:.2f}s", file=sys.stderr, flush=True)

    slopes = [v["slope"] for v in out.values()]
    note = (
        "10x data (scalegen.py replication of sf0.1 with key-space scaling, "
        "copy-keyed pseudorandom word permutations on documents, and "
        "copy-unique orthogonal transforms on embeddings — round 12: both "
        "keep dup/near-dup RATES flat across scale decades). "
        "slope = t(sf1)/t(sf0.1). Raw slope above ~6 appears only on the "
        "shingle/term inverted-index AUDIT ops, and their `candidates` "
        "column shows why: with a FIXED synthetic vocabulary the shingle-DF "
        "distribution saturates, so the candidate mass under the absolute "
        "MAX_*_DF cap grows ~quadratically with the corpus (1.13M -> 68.6M "
        "slots at 10x) while TRUE near-dup output stays ~flat (256 -> 2192 "
        "jaccard pairs) and per-candidate cost FALLS "
        "(slope_per_candidate_pair ~0.2). A real Heaps-law corpus keeps "
        "DFs ~flat and these ops ~linear; on saturated corpora the "
        "production paths are the LSH/bucket ops (minhash_lsh slope 1.49, "
        "simhash 1.48) and neardup_clusters. "
        "skew_stress_sf1: selective hot-key salting vs the unsalted "
        "shuffle on a zipfian key at sf1. Round 12: pair-producing "
        "dedup ops carry `candidates` (pre-threshold candidate-pair "
        "counts at both scales, from ops.llm.CANDIDATE_PAIR_COUNTS — "
        "each counter reuses the op's own candidate-stage helper) and "
        "`slope_per_candidate_pair`, so outliers with DF-cap-shrunk "
        "FINAL output are measured-accounted."
    )
    result = {
        "note": note,
        "metric": "scale_slope_sf0.1_to_sf1",
        "data_factor": 10,
        # `out` is empty on a fresh checkout running only the
        # non-query decade row (`--only warehouse_verb_decade` with no
        # SCALECHECK.json to merge over) — guard the summary stats so
        # the expensive measurement still lands on disk (ADVICE r14)
        "median_slope": (
            round(sorted(slopes)[len(slopes) // 2], 2) if slopes else None
        ),
        "max_slope": round(max(slopes), 2) if slopes else None,
        "queries": out,
        "skew_stress_sf1": skew,
        "warehouse_verb_decade": wh_row,
    }
    if errors:
        result["errors"] = errors
    with open(os.path.join(here, "SCALECHECK.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
