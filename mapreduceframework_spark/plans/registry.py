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
# all_queries() in iteration order. Round-13 window (VERDICT r12 items
# 1-2 adapted to the measured sentinel fallout): the r12 money-sum
# conversion changed 26 decorated definitions but only 4 took r12
# window slots, so tools/window_planner.py auto-flags the remaining 21
# as code-change sentinels (changed since last green — the policy that
# has outranked staleness refresh since the r8 rewrite incident). Two
# more rows changed THIS round and join them: tpch_q1_pricing (the
# int_round_mean average conversion + bigint_sum_sql narrowing — the
# r13 ADVICE items) and events_diff_in_diff (VERDICT r12 item 6: the
# early-adopter treatment definition that gives the contrast live
# control cells). 23 sentinels + 27 of the 32 remaining r07-stale rows
# (oldest-first per the planner; includes the four r12-displaced rows
# join_spatial_grid, join_asof_nearest, graph_sssp_weighted and — as a
# sentinel — join_bloom_pruned) = 50. The VERDICT r12 bar of "zero
# rows older than r08 after r13" is arithmetically unreachable under
# the sentinel-first policy (23 + 32 = 55 > 50); the 5 r07 rows that
# do not fit (timeseries_ewma, timeseries_forward_fill,
# timeseries_interpolate, union_by_name_evolved,
# window_rolling_distinct_users) were each re-verified locally this
# session at sf0.01 AND sf0.1 through both compare paths (BASELINE.md
# records the runs) and LEAD the round-14 window. Registry freeze held:
# 274 rows, zero adds.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- code-change sentinels (23): the 21 remaining money-sum
    #     conversion rows (r12 change, auto-flagged by the planner's
    #     function-granular fingerprint; each carries an exact-integer
    #     mirror and was 3-SF re-verified at conversion time) plus this
    #     round's two rewrites, all 3-SF re-verified again this
    #     session ---
    "agg_algebraic",
    "agg_null_semantics",
    "agg_salted_two_stage",
    "join_bloom_pruned",
    "join_range_bands",
    "join_range_binned",
    "join_salted_skew",
    "join_skew_two_path",
    "profile_numeric_histogram",
    "rollup_revenue",
    "tpch_q10_returned_revenue",
    "tpch_q11_important_parts",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive",
    "tpch_q22_idle_rich_customers",
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "tpch_q7_nation_volume",
    "tpch_q9_product_profit",
    "tpch_q1_pricing",
    "events_diff_in_diff",
    # --- stalest refresh: 27 of the 32 remaining r07 rows (6 rounds
    #     stale), oldest-first alphabetical per the planner ---
    "graph_sssp_weighted",
    "join_asof_nearest",
    "join_spatial_grid",
    "lakehouse_incremental_agg",
    "multimodal_audio_fingerprint",
    "multimodal_phash_dedup",
    "multimodal_scene_cuts",
    "pipeline_multimodal_curate",
    "quality_gopher_rules",
    "quality_label_balance",
    "sample_negative_pairs",
    "sample_temperature_mixture",
    "scalar_struct_funcs",
    "sink_bucketed_join",
    "sink_compact_small_files",
    "sink_partitioned_roundtrip",
    "sketch_hll_rolling_users",
    "skyline_pareto_frontier",
    "source_csv_json_roundtrip",
    "stats_bootstrap_poisson_ci",
    "stats_chi_square_independence",
    "stats_ks_two_sample",
    "streaming_click_purchase_full_join",
    "streaming_click_purchase_left_join",
    "text_bigram_lm_score",
    "text_boilerplate_ngrams",
    "text_readability_scores",
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
