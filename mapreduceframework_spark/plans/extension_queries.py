"""Misc extension queries that round out core coverage (SURVEY.md
section 2.2): map/HOF scalar families, salted/decimal/approx aggregates,
posexplode, and the forecast-revenue variant of TPC-H Q6.

The LLM-pipeline families that used to live here moved to their own
modules in round 7 (pure move, zero renames): plans/text_queries.py,
plans/dedup_queries.py, plans/ann_queries.py, plans/multimodal_queries.py,
plans/sampling_queries.py, with shared corpus helpers in plans/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.exact import (
    bigint_sum_sql,
    int_round_div,
    int_round_div_sql,
    snap_units,
    snap_units_sql,
)
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table
from mapreduceframework_spark.plans.corpus import DOCS_CTE, _docs


# --------------------------------------------------------------------------
# Further text / agg coverage
# --------------------------------------------------------------------------


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT {int_round_div_sql(
            'SUM(' + snap_units_sql('l_extendedprice', 100)
            + ' * ' + snap_units_sql('l_discount', 100) + ')', 100)}
                   / 100.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
    """,
    tags=("tpch", "agg", "filter"),
    bench=True,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan-side filters + single
    global aggregate. Every predicate is pushed into the parquet reader
    (PushedFilters on l_shipdate/l_discount/l_quantity), so at 100 TB
    row groups outside the date range never leave storage. Revenue is
    the exact e4 integer sum cents*d2 finished with the integer-domain
    int_round_div (the round-12 money-sum discipline).

    The window is Q6's canonical ONE-YEAR slice placed inside this
    corpus's shipdate span (1995-01..2001-11): the original 2021..2023
    range postdated every shipdate, so the aggregate was SUM over an
    empty set and the row's value contract pinned only NULL — the same
    degenerate-predicate class as the zone-map find, caught by the
    round-12 fsum mirror (tests/test_round12_thirdopinions16.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                int_round_div(
                    F.sum(
                        (
                            snap_units("l_extendedprice", 100)
                            * snap_units("l_discount", 100)
                        ).cast("decimal(38,0)")
                    ),
                    100,
                )
                / 100.0
            ).alias("revenue")
        )
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
               TRUE AS sketch_within_15pct
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting — the 100 TB substitute for exact
    COUNT(DISTINCT) (HyperLogLog++, mergeable, O(1) memory per group,
    no second shuffle). The sketch's estimate is approximate, so the
    oracle-checked columns are the exact count plus a boolean asserting
    the HLL estimate (rsd=0.05) landed within 15% of it — the sketch
    runs for real, and a broken sketch flips the boolean."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_nd"),
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx_nd"),
    )
    within = (
        F.abs(F.col("approx_nd") - F.col("exact_nd"))
        <= 0.15 * F.col("exact_nd")
    ).alias("sketch_within_15pct")
    return agg.select("l_returnflag", "exact_nd", within)


@query(
    "agg_salted_two_stage",
    oracle=f"""
        SELECT o_orderpriority,
               {bigint_sum_sql(snap_units_sql('o_totalprice', 100))}
                   / 100 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "skew", "extension"),
)
def agg_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: salt the group key (deterministic
    pmod(o_orderkey, 16)), aggregate per (key, salt), then merge salts.
    With 5 priority values over ~10^8s of rows, an unsalted groupBy
    funnels each hot key through one reducer; salting fans each key over
    16 partitions and the second stage merges 16 tiny rows per key.
    Algebraic aggregates compose exactly (sum of sums, sum of counts),
    so the oracle is the plain GROUP BY."""
    orders = load_table(spark, sf_dir, "orders")
    partial = (
        orders.withColumn("salt", F.pmod(F.col("o_orderkey"), F.lit(16)))
        .groupBy("o_orderpriority", "salt")
        .agg(
            F.sum(snap_units("o_totalprice", 100)).alias("rev_part"),
            F.count("*").alias("cnt_part"),
        )
    )
    return partial.groupBy("o_orderpriority").agg(
        (F.sum("rev_part").cast("double") / 100).alias("revenue"),
        F.sum("cnt_part").cast("long").alias("n_orders"),
    )


@query(
    "agg_decimal_exact",
    oracle="""
        SELECT o_orderstatus,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) * 100
                         AS BIGINT) AS DOUBLE) / 100 AS total_price,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))
                             * CAST(0.07 AS DECIMAL(3, 2))) * 10000
                         AS BIGINT) AS DOUBLE) / 10000 AS tax
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "decimal"),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic: money sums in DECIMAL(18,2) are
    associative and overflow-checked, so the result is identical in any
    summation order — no rounding tolerance needed, unlike double sums
    (the reference has no numeric types at all; this is the engine's
    answer for financial aggregation at scale).

    The display conversion narrows each group sum through an exact
    int64 of its smallest units (cents / 1e-4 tax units) before ONE
    int64->double conversion and ONE power-of-ten double division,
    identically on both sides (round-14 queue item a): a direct
    decimal->double cast let Spark's BigDecimal conversion and
    DuckDB's int128-scaled conversion differ by 1 ulp past 2^53
    (~SF 4e3 for the cent sum). Exact while the unit sums fit int64
    (tax units wrap near SF 1.6e4 ~ 16 PB)."""
    orders = load_table(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.groupBy("o_orderstatus").agg(
        ((F.sum(price_dec) * 100).cast("long").cast("double") / 100)
        .alias("total_price"),
        (
            (
                F.sum(price_dec * F.lit("0.07").cast("decimal(3,2)"))
                * 10000
            ).cast("long").cast("double")
            / 10000
        ).alias("tax"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
        SELECT o_orderkey,
               m['status'][1] AS status_from_map,
               CAST(cardinality(m) AS INT) AS n_keys,
               array_to_string(map_keys(m), ',') AS keys_joined
        FROM (SELECT o_orderkey,
                     map(['status', 'priority'],
                         [o_orderstatus, o_orderpriority]) AS m
              FROM orders)
    """,
    tags=("scalar", "map"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map per row, read back an element, the
    key set, and the cardinality. Both engines preserve construction
    order in map_keys. (The reference has no type system at all —
    SURVEY.md section 1.1; MapType is Spark-native capability.)"""
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return orders.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_from_map"),
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
    )


@query(
    "flatmap_posexplode",
    oracle=f"""
        SELECT doc_id, t.u.pos AS pos, t.u.w AS word
        FROM (SELECT doc_id,
                     unnest([{{'pos': i - 1, 'w': words[i]}}
                             for i in range(1, len(words) + 1)]) AS u
              FROM ({DOCS_CTE})) t
    """,
    tags=("flatmap", "extension"),
)
def flatmap_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode — 1-to-many with provenance (the position a
    token had in its document), the building block for n-gram and
    alignment pipelines."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(F.col("words")).alias("pos", "word")
    )


@query(
    "scalar_array_setops",
    oracle="""
        WITH d AS (SELECT doc_id,
                          list_distinct(regexp_split_to_array(trim(text),
                                                              '\\s+')) AS w
                   FROM documents WHERE length(trim(text)) > 0)
        SELECT doc_id,
               len(w)::BIGINT AS n_distinct,
               len(list_filter(w, x -> list_contains(
                   ['the','a','of','and','to','in','is','it'], x)))::BIGINT
                   AS n_stop,
               len(list_filter(w, x -> NOT list_contains(
                   ['the','a','of','and','to','in','is','it'], x)))::BIGINT
                   AS n_content
        FROM d
    """,
    tags=("scalar", "array", "extension"),
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (array_distinct / array_intersect /
    array_except) against a stopword list — sizes only, since set-op
    result ORDER is engine-defined and the driver hashes values. All
    JVM-side expression work."""
    stops = F.array(
        *[F.lit(w) for w in
          ["the", "a", "of", "and", "to", "in", "is", "it"]]
    )
    d = _docs(spark, sf_dir).select(
        "doc_id", F.array_distinct("words").alias("w")
    )
    return d.select(
        "doc_id",
        F.size("w").cast("long").alias("n_distinct"),
        F.size(F.array_intersect("w", stops)).cast("long").alias("n_stop"),
        F.size(F.array_except("w", stops)).cast("long").alias("n_content"),
    )


@query(
    "scalar_map_hof_funcs",
    oracle="""
        SELECT o_orderkey,
               COALESCE(array_to_string(list_sort(list_transform(
                   list_filter([
                       {'k': 'key',  'v': o_orderkey},
                       {'k': 'cust', 'v': o_custkey},
                       {'k': 'mod',  'v': o_orderkey % 7}
                   ], e -> e.v % 2 = 1),
                   e -> e.k || '=' || CAST(e.v * 3 AS VARCHAR))), ','), '')
                   AS odd_tripled
        FROM orders
    """,
    tags=("scalar", "map", "hof"),
)
def scalar_map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — the lambda surface over MapType
    that scalar_map_funcs (element_at / keys / size) doesn't touch:
    ``map_filter`` keeps entries with odd values, ``transform_values``
    triples them, ``map_entries`` + sort canonicalizes to a string for
    the value hash. The oracle computes the same pipeline over an
    entry-struct list (DuckDB has list lambdas but not map lambdas) —
    same filter, transform, sort, join, entry for entry."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("key"), F.col("o_orderkey"),
        F.lit("cust"), F.col("o_custkey"),
        F.lit("mod"), F.col("o_orderkey") % 7,
    )
    kept = F.map_filter(m, lambda k, v: v % 2 == 1)
    tripled = F.transform_values(kept, lambda k, v: v * 3)
    canon = F.array_join(
        F.sort_array(
            F.transform(
                F.map_entries(tripled),
                lambda e: F.concat_ws(
                    "=", e["key"], e["value"].cast("string")
                ),
            )
        ),
        ",",
    )
    return orders.select("o_orderkey", canon.alias("odd_tripled"))


@query(
    "scalar_struct_funcs",
    oracle=f"""
        SELECT o_orderkey,
               s['c'] AS cents_field,
               s < {{'st': 'O', 'c': 5000000}} AS below_limit,
               pair[1]['v'] AS first_v,
               pair[1]['k'] AS first_k
        FROM (SELECT o_orderkey,
                     {{'st': o_orderstatus,
                      'c': {snap_units_sql('o_totalprice', 100)}}} AS s,
                     list_sort([
                         {{'k': {snap_units_sql('o_totalprice', 100)},
                          'v': 'price'}},
                         {{'k': o_orderkey % 100000, 'v': 'key'}}]) AS pair
              FROM orders)
    """,
    tags=("scalar", "struct"),
)
def scalar_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: build a struct per row, read a field back,
    compare structs (lexicographic by field order — the ordering
    argmax/skyline/dHash-band queries rely on), and sort an array of
    structs (field-wise lexicographic, tie falling through to the next
    field). Both engines define identical struct ordering, which this
    row pins as a contract. Zero-shuffle scan."""
    orders = load_table(spark, sf_dir, "orders")
    cents = snap_units("o_totalprice", 100)
    s = F.struct(F.col("o_orderstatus").alias("st"), cents.alias("c"))
    lim = F.struct(
        F.lit("O").alias("st"), F.lit(5000000).cast("long").alias("c")
    )
    pair = F.array_sort(
        F.array(
            F.struct(cents.alias("k"), F.lit("price").alias("v")),
            F.struct(
                (F.col("o_orderkey") % 100000).cast("long").alias("k"),
                F.lit("key").alias("v"),
            ),
        )
    )
    return orders.select(
        "o_orderkey",
        s.getField("c").alias("cents_field"),
        (s < lim).alias("below_limit"),
        pair[0].getField("v").alias("first_v"),
        pair[0].getField("k").alias("first_k"),
    )
