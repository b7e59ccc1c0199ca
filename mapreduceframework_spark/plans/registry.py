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
# all_queries() in iteration order. Round-7 window: FIRST driver rows
# for the 19 round-6 queries that have only local parity evidence (the
# r6 VERDICT's top item — several are float-contract rows of exactly
# the kind the sf0.1 sweep showed can be locally green and fragile
# cross-engine), first rows for the 31 queries new this round (three
# write-path/maintenance sinks, ordered funnel, KS drift test,
# readability, minhash containment, peak concurrency, nearest asof,
# LSH recall report, temperature mixture, Gopher rule filter, Poisson
# bootstrap CI, Gram matrix, stream-stream full outer, image
# perceptual-hash dedup, product-quantization ANN, incremental MV
# maintenance, ordered-set aggregates, weighted SSSP, audio
# fingerprint dedup, struct scalar family, corpus-boilerplate
# top-K n-grams, the multimodal curation capstone, LOO target
# encoding, contrastive negative sampling, the CSV/JSON source
# round-trip, MAD anomaly detection, longest activity streaks, the
# Gini label-balance audit, scene-cut detection), and the STALEST
# rotated-out greens (latest driver row r03) to refresh (join_cross /
# join_left_agg / join_theta / udtf_bigram_counts / mr_filter_evens /
# window_running_sum, and this round join_inner / join_semi /
# join_anti / join_broadcast / mr_histogram_mod100 /
# window_topk_per_group / udtf_native_token_runs / tpch_q1 / tpch_q2 /
# tpch_q3 / tpch_q5 / tpch_q6 / tpch_q9 / tpch_q18 / tpch_q21 /
# tpch_q22 / join_full_outer / mr_char_counts /
# udf_pandas_grouped_agg, ceded their refresh slots to
# first-evidence rows; each family keeps other refreshed rows —
# sentinel sampling via tools/check_window.py --sentinels bounds the
# staleness exposure of everything rotated out; every row rotated out
# THIS round was additionally re-verified directly via check_window at
# rotation time).
DRIVER_WINDOW: tuple[str, ...] = (
    # --- round-6 queries: first driver rows (19) ---
    "agg_percent_of_total",
    "division_priority_complete",
    "events_markov_transitions",
    "feature_winsorize",
    "graph_bfs_distances",
    "join_bloom_pruned",
    "join_interval_overlap",
    "join_spatial_grid",
    "regression_by_event_type",
    "sketch_hll_rolling_users",
    "skyline_pareto_frontier",
    "stats_chi_square_independence",
    "streaming_click_purchase_left_join",
    "text_bigram_lm_score",
    "timeseries_ewma",
    "timeseries_forward_fill",
    "timeseries_interpolate",
    "union_by_name_evolved",
    "window_rolling_distinct_users",
    # --- NEW this round: first driver rows (31) ---
    "sink_partitioned_roundtrip",
    "sink_bucketed_join",
    "sink_compact_small_files",
    "events_funnel_stages",
    "stats_ks_two_sample",
    "text_readability_scores",
    "dedup_minhash_containment",
    "events_peak_concurrency",
    "join_asof_nearest",
    "ann_lsh_recall_report",
    "sample_temperature_mixture",
    "quality_gopher_rules",
    "stats_bootstrap_poisson_ci",
    "embedding_gram_matrix",
    "streaming_click_purchase_full_join",
    "multimodal_phash_dedup",
    "ann_cosine_pq",
    "lakehouse_incremental_agg",
    "agg_mode_exact",
    "graph_sssp_weighted",
    "multimodal_audio_fingerprint",
    "scalar_struct_funcs",
    "text_boilerplate_ngrams",
    "pipeline_multimodal_curate",
    "feature_target_encode_loo",
    "sample_negative_pairs",
    "source_csv_json_roundtrip",
    "events_anomaly_mad",
    "events_streak_longest",
    "quality_label_balance",
    "multimodal_scene_cuts",
    # timeseries_seasonal_profile and join_attribution_first_touch are
    # this round's overflow: every one of the 50 slots is already a
    # first-evidence row, so they wait for the round-8 window (both are
    # double-verified locally at sf0.01 AND sf0.1 with both compare
    # paths).
    # (no refresh or sentinel slots this round: all 50 slots produce
    # first-time driver evidence; the fanout-threading sentinel
    # (hierarchy_rollup_recursive) and every row rotated out were
    # directly re-verified
    # via check_window at rotation time, and --sentinels sampling
    # bounds residual staleness)
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
