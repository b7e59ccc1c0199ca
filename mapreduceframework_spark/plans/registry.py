"""Query/operator registry — the single source of truth.

Every operator the engine claims is registered here as a ``QuerySpec``:
a name, a Spark callable ``(spark, sf_dir) -> DataFrame``, and (when the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` (driver contract), the pytest parity harness, and
``bench.py`` all read this registry, so one registration covers the
correctness gate, local tests, and the benchmark.

Contract inherited from the driver: the compare sorts columns by name and
hashes values order-insensitively, so (a) every computed column is aliased
identically on both sides, (b) float aggregates are rounded on both sides
to dodge summation-order ULP drift, (c) integer sums are cast to BIGINT on
the DuckDB side (DuckDB widens SUM(BIGINT) to HUGEINT).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The caller may hand us a session with a non-UTC timezone;
            # the DuckDB oracle compares timestamps UTC-naive. Pin it.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle,
            tags=tags,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


# The driver's per-round correctness run checks the FIRST 50 entries of
# all_queries() in iteration order. Round-9 window (VERDICT r8 item 1 —
# the composition is tools/window_planner.py's proposal verbatim),
# 28 + 12 + 10 = 50:
# - 28 never-driver-checked rows, all new this round: the exact-BPE
#   tokenizer trio (text_bpe_tokenize — merge-table subword token
#   accounting; text_bpe_vocab_counts — the O(vocab) scale-path plan;
#   pack_bpe_chunks — packing budgeted in exact BPE tokens),
#   dedup_semantic_clusters — SemDeDup-shape semantic dedup,
#   sketch_topk_misra_gries — mergeable heavy-hitter summaries,
#   streaming_foreachbatch_upsert — exactly-once foreachBatch sink,
#   dedup_substring_phase_pairs — alignment-free substring
#   duplicate detection, stats_mann_whitney_u — histogram-form
#   rank-sum test, timeseries_autocorrelation — exact per-day ACF,
#   sketch_kmv_setops — KMV union/intersection algebra,
#   sample_epoch_shuffle — reproducible per-epoch shuffle order,
#   sketch_ams_f2 — AMS tug-of-war F2 estimator, graph_hits —
#   exact-integer unnormalized HITS hubs/authorities,
#   feature_hashing_trick — zero-shuffle hashed featurization,
#   stats_theil_sen — median-of-slopes robust trend,
#   events_attribution_time_decay — multi-touch decay attribution,
#   lakehouse_zone_map_prune — data-skipping layout audit,
#   pack_binpack_harmonic — whole-doc capacity-class bin packing,
#   events_diff_in_diff — quasi-experimental DiD contrast,
#   graph_kcore — bounded k-core peel, events_pattern_match_regex —
#   MATCH_RECOGNIZE workalike, stats_regression_multi — one-pass
#   Cramer-solved multiple OLS, timeseries_cross_correlation —
#   lead-lag CCF, source_schema_evolution_merge — mergeSchema read
#   over pre/post-evolution parquet batches, source_orc_roundtrip —
#   the third native columnar format, multimodal_audio_energy —
#   windowed energy/ZCR over really-decoded PCM,
#   agg_distinct_bitmap — exact bitmap-OR distinct counting, and
#   text_keywords_rake — document-local RAKE keyword extraction;
# - 12 auto-sentinels: queries whose decorated definition (normalized
#   AST, planner's git diff vs the last-green commit) changed since
#   their last green driver row — the round-9 Welch/reco arithmetic
#   fixes plus rewrites from rounds 5-8 whose refresh never landed;
# - 10 stalest greens: the nine remaining r03 rows (5 rounds stale,
#   the r8 verdict's named cohort) then the single r04 slot left. The
#   r04 remainder (39 rows, 5 rounds stale at r10) must lead round
#   10's refresh block.
# All 50 re-verified locally at sf0.01 via check_window (both compare
# paths) + drive_contract at rotation time; every new/rewritten query
# additionally at sf0.1 (plus full-registry sf0.1 sweeps, BASELINE.md).
DRIVER_WINDOW: tuple[str, ...] = (
    # --- never driver-checked: first evidence (11) ---
    "text_bpe_tokenize",
    "pack_bpe_chunks",
    "dedup_semantic_clusters",
    "sketch_topk_misra_gries",
    "streaming_foreachbatch_upsert",
    "dedup_substring_phase_pairs",
    "text_bpe_vocab_counts",
    "stats_mann_whitney_u",
    "timeseries_autocorrelation",
    "sketch_kmv_setops",
    "sample_epoch_shuffle",
    "sketch_ams_f2",
    "graph_hits",
    "feature_hashing_trick",
    "stats_theil_sen",
    "events_attribution_time_decay",
    "lakehouse_zone_map_prune",
    "pack_binpack_harmonic",
    "events_diff_in_diff",
    "graph_kcore",
    "events_pattern_match_regex",
    "stats_regression_multi",
    "timeseries_cross_correlation",
    "source_schema_evolution_merge",
    "source_orc_roundtrip",
    "multimodal_audio_energy",
    "agg_distinct_bitmap",
    "text_keywords_rake",
    # --- auto-sentinels: definition changed since last green (12) ---
    "ann_cosine_bruteforce",
    "ann_cosine_ivf",
    "events_peak_concurrency",
    "events_sessionize_gaps",
    "events_sliding_windows",
    "reco_user_similarity",
    "regression_by_event_type",
    "split_train_val_test",
    "stats_welch_ttest",
    "streaming_sliding_avgs",
    "window_moving_avg",
    "window_range_frame",
    # --- stalest refresh: the nine r03 rows (5 rounds stale) ---
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "udf_pandas_grouped_agg",
    "udtf_bigram_counts",
    "udtf_native_token_runs",
    "window_running_sum",
    "window_topk_per_group",
    # --- then the r04 cohort, oldest-first (1 of 40 fits; the rest
    #     lead round 10) ---
    "agg_approx_count_distinct",
)

# Queries with a green driver row in CORRECTNESS_r02.json or
# CORRECTNESS_r03.json — rotated behind the round-4 window so every slot
# verifies something new (or, for the sentinel, newly changed).
_R02_GREEN: frozenset[str] = frozenset({
    "events_sessionize_gaps", "events_retention_cohorts", "timeseries_ohlc",
    "profile_numeric_histogram", "scd2_order_history", "events_anomaly_zscore",
    "char_counts", "word_counts", "histogram_mod100", "sorted_histogram",
    "distinct_keys_mod100", "projection", "filter_predicate",
    "flatmap_explode_words", "agg_algebraic", "agg_full_group",
    "agg_count_distinct", "sort_partition_local", "sort_global_ranked",
    "topk_orders", "set_union", "set_intersect", "set_except",
    "scalar_string_funcs", "scalar_date_funcs", "scalar_math_funcs",
    "scalar_array_funcs", "scalar_json_funcs", "conditional_case_agg",
    "agg_statistical", "unpivot_price_components", "set_intersect_all",
    "set_except_all", "cube_grouping_id", "timeseries_gap_fill",
    "join_null_safe", "agg_null_semantics", "agg_collect_sorted",
    "agg_argmax_struct", "text_token_stats", "text_quality_scores",
    "text_lang_id", "text_fingerprints", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_clusters",
    "dedup_simhash", "dedup_embedding_cosine", "ann_cosine_bruteforce",
    # r03 greens
    "mr_char_counts", "mr_histogram_mod100", "mr_filter_evens",
    "join_inner", "join_left_agg", "join_full_outer", "join_semi",
    "join_anti", "join_broadcast", "join_theta", "join_cross",
    "join_asof", "join_asof_forward_gap", "join_range_binned",
    "join_salted_skew", "tpch_q1_pricing", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping", "tpch_q5_local_volume", "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit", "tpch_q18_large_orders",
    "tpch_q21_waiting_supplier", "tpch_q22_idle_rich_customers",
    "window_topk_per_group", "window_running_sum", "window_lag_lead",
    "window_range_frame", "rollup_revenue", "pivot_status_by_priority",
    "streaming_tumbling_counts", "streaming_session_counts",
    "streaming_user_counts_stateful", "udf_pandas_scalar",
    "udf_pandas_grouped_agg", "udtf_bigram_counts",
    "udtf_native_token_runs", "sketch_countmin_heavy",
    "sketch_kmv_distinct", "graph_pagerank_trade", "cdc_merge_orders",
    "layout_zorder_clustering", "ann_cosine_lsh", "ann_cosine_ivf",
    "embedding_quantize_int8", "kmeans_quantized_clusters",
    "multimodal_decode_features", "text_bm25_topk",
    "dedup_edit_distance_verify",
})


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the full registry, ordered
    so the driver's 50-entry correctness window lands on
    :data:`DRIVER_WINDOW` first, then the remaining not-yet-verified
    queries, then the queries already green in round 2."""
    # Imports are side-effectful (decorator registration); keep the list
    # explicit so a missing module is an error, not silent shrinkage.
    from mapreduceframework_spark.plans import (  # noqa: F401
        analytics_queries,
        ann_queries,
        core_queries,
        dedup_queries,
        extension_queries,
        graph_queries,
        join_queries,
        lakehouse_queries,
        mapreduce_queries,
        multimodal_queries,
        sampling_queries,
        sink_queries,
        sketch_queries,
        streaming_queries,
        text_queries,
        tpch_queries,
        udf_queries,
        window_queries,
    )

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    rest = [n for n in REGISTRY if n not in DRIVER_WINDOW]
    rest.sort(key=lambda n: n in _R02_GREEN)  # stable: unverified first
    return {n: REGISTRY[n] for n in [*DRIVER_WINDOW, *rest]}
