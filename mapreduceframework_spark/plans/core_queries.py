"""Reference-surface queries (SURVEY.md section 2.1/2.2 core rows).

Each query is the Spark-idiomatic expression of an operator the reference
either implements (flatMap O3, group-by-key shuffle O7, full-group reduce
O9, distinct O5, partition sort O4 — reference JobContext.cpp:22-175) or
lets clients express in user code (projection, filter, algebraic
aggregates — reference MapReduceClient.h:55-64). The char-frequency and
mod-100-histogram queries reproduce the repo's two golden client programs
(reference SampleClient.cpp:32-66, test1-1_thread_1_process.cpp:59-77).

Scale notes are attached per query; the common ones:
- aggregations here are algebraic -> Catalyst emits partial (map-side)
  HashAggregate before the shuffle, so shuffle volume is O(groups), not
  O(rows);
- projections/filters reach the parquet scan (PushedFilters/ReadSchema,
  asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceframework_spark.operators.bucketscan import earlier_bucket_agg
from mapreduceframework_spark.plans.exact import (
    bigint_sum_sql,
    int_round_mean,
    int_round_mean_sql,
    snap_units,
    snap_units_sql,
)
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table
from mapreduceframework_spark.sources.registry import ensure_min_partitions

# --------------------------------------------------------------------------
# Reference golden workloads (Q1/Q2/Q3 of SURVEY.md section 2.1)
# --------------------------------------------------------------------------


@query(
    "char_counts",
    oracle="""
        SELECT ch, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
        GROUP BY ch
    """,
    tags=("reference", "flatmap", "agg"),
    bench=True,
)
def char_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character frequency count — the reference's SampleClient demo
    (reference SampleClient.cpp:34-65): map emits (char, n) per document,
    reduce sums. Spark: explode -> groupBy -> count; the map-side combine
    the reference client hand-rolls (SampleClient.cpp:35-47) is Catalyst's
    partial aggregate, automatic and JVM-side."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return (
        docs.select(F.explode(F.split("text", "")).alias("ch"))
        .groupBy("ch")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "word_counts",
    oracle="""
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
    """,
    tags=("reference", "flatmap", "agg"),
    bench=True,
)
def word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count — the canonical MapReduce job the reference's API exists
    to run (reference MapReduceClient.h:55-64)."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "histogram_mod100",
    oracle="""
        SELECT o_orderkey % 100 AS key, COUNT(*) AS cnt
        FROM orders GROUP BY 1
    """,
    tags=("reference", "agg"),
)
def histogram_mod100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modulo-100 histogram — the reference's golden test client: map
    emits (k % 100, 1), reduce emits group size (reference
    test1-1_thread_1_process.cpp:63-76)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select((F.col("o_orderkey") % 100).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "sorted_histogram",
    oracle="""
        SELECT o_orderkey % 100 AS key, COUNT(*) AS cnt
        FROM orders GROUP BY 1 ORDER BY key
    """,
    tags=("reference", "agg", "sort"),
)
def sorted_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram + client-side final sort (reference
    test1-1_thread_1_process.cpp:135-143 — the framework's output is an
    unordered bag; clients sort). Spark: orderBy = range-partitioned
    total sort, no single-node bottleneck."""
    return histogram_mod100(spark, sf_dir).orderBy("key")


@query(
    "distinct_keys_mod100",
    oracle="SELECT DISTINCT o_orderkey % 100 AS key FROM orders",
    tags=("reference", "distinct"),
)
def distinct_keys_mod100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-key set — the reference's comparator-keyed
    std::set<K2*> built during shuffle (reference JobContext.h:78,
    JobContext.cpp:347-353). Spark: hash-based distinct with partial
    dedup before the shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select((F.col("o_orderkey") % 100).alias("key")).distinct()


# --------------------------------------------------------------------------
# Projection / filter / flatMap (client-expressible rows of section 2.2)
# --------------------------------------------------------------------------


@query(
    "projection",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
    tags=("projection",),
)
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection; reaches the scan as ReadSchema (column pruning)
    so a 100 TB table is read 3-columns-wide."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@query(
    "filter_predicate",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1998-01-01'
    """,
    tags=("filter",),
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter -> emit-zero-times map in the reference's model (reference
    MapReduceClient.h:57-58). Predicates push into the parquet reader
    (PushedFilters), skipping row groups via min/max stats at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "flatmap_explode_words",
    oracle="""
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    """,
    tags=("flatmap",),
)
def flatmap_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-to-many transform — the core `map` operator O3 (reference
    MapReduceFramework.cpp:22-32, emit2 callable 0..n times)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------


@query(
    "agg_algebraic",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)            AS sum_qty,
               {int_round_mean_sql(
                   'SUM(' + snap_units_sql('l_extendedprice', 100) + ')', 1)}
                   / 100.0 AS avg_price,
               ROUND(MIN(l_discount), 2)            AS min_disc,
               ROUND(MAX(l_tax), 2)                 AS max_tax,
               COUNT(*)                             AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def agg_algebraic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/avg/min/max/count — the reference does these in client reduce
    code (reference SampleClient.cpp:52-65); Spark's HashAggregate does
    partial+final automatically, shuffling O(groups) bytes.

    avg_price finishes in the exact decimal domain (exact.py
    int_round_mean, round 13 — the double-domain ROUND(SUM::DOUBLE/n)
    was the >2^53 1-ulp class). sum_qty stays a double SUM knowingly:
    l_quantity is integral-valued, so the double sum is EXACT until the
    corpus-wide group total passes 2^53 (~SF 6e6, far past the 100 TB
    design point); the ROUND(_, 2) then acts on an exact integer."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (
            int_round_mean(
                F.sum(snap_units("l_extendedprice", 100)), 1, F.count("*")
            )
            / 100.0
        ).alias("avg_price"),
        F.round(F.min("l_discount"), 2).alias("min_disc"),
        F.round(F.max("l_tax"), 2).alias("max_tax"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_full_group",
    oracle="""
        SELECT l_returnflag,
               string_agg(CAST(l_quantity AS BIGINT), ','
                          ORDER BY CAST(l_quantity AS BIGINT)) AS qty_list
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "full-group"),
)
def agg_full_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-group semantics — the defining capability of the reference's
    reduce: one call sees ALL values of exactly one key (reference
    MapReduceClient.h:61-64, JobContext.cpp:97-116). Spark: collect_list
    inside agg. Scale note: group payload must fit one task — this is for
    bounded groups; unbounded full-group logic belongs in
    core.run_job's sorted-run mapInPandas reduce, which batches many
    keys per Python call while keeping each key's values together."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.col("l_quantity").cast("long"))), ","
        ).alias("qty_list")
    )


@query(
    "agg_count_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent in the reference; its key-dedup set
    JobContext.h:78 is the closest). Expands to a two-stage aggregate;
    for 100 TB dashboards prefer approx_count_distinct (HLL) — exposed
    as functions.approx_distinct but not oracle-comparable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k
# --------------------------------------------------------------------------


@query(
    "sort_partition_local",
    oracle="SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem",
    tags=("sort",),
)
def sort_partition_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort — the reference's per-thread std::sort before
    shuffle (reference JobContext.cpp:57-73). No cross-partition exchange;
    rows are unchanged (oracle compares as a bag)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_shipdate").sortWithinPartitions(
        "l_shipdate"
    )


@query(
    "sort_global_ranked",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    """,
    tags=("sort", "window"),
)
def sort_global_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total order, made hash-observable via row_number (the
    driver compare is order-insensitive, so the rank column carries the
    ordering) — WITHOUT a global single-task window. Rows range-bucket
    by the leading sort key (floor(o_totalprice / 1000): the TPC-H
    price domain is bounded by order size, so ~550 buckets at every
    scale factor), row_number runs inside each bucket-partitioned
    window, and an O(buckets) theta-join offset (count of rows in
    higher-priced buckets) broadcast-lifts local ranks to the global
    sequence. Bucket order is consistent with (price DESC, key ASC), so
    offset + local rank IS the global row_number, exactly — the same
    bucketed two-phase prefix-scan discipline as stats_cusum_drift and
    the islands scan, applied to the last global window the engine had
    (GLOBAL_WINDOW_OK in tests/test_plans.py is empty now)."""
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select("o_orderkey", "o_totalprice").withColumn(
        "pb", F.floor(F.col("o_totalprice") / F.lit(1000.0))
    )
    w_loc = Window.partitionBy("pb").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    counts = v.groupBy("pb").agg(F.count("*").alias("c"))
    # Rows ranked before bucket pb = total rows in higher-price buckets
    # ('earlier' in rank order = larger bucket, hence descending).
    offsets = earlier_bucket_agg(
        counts, [], "pb", "c", "sum", "off", descending=True
    )
    return (
        v.withColumn("lrn", F.row_number().over(w_loc))
        .join(F.broadcast(offsets), "pb")
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("off") + F.col("lrn")).cast("long").alias("rn"),
        )
    )


@query(
    "topk_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("limit", "topk"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy + limit compiles to TakeOrderedAndProject —
    each partition keeps k rows, driver merges k*partitions; no total
    sort, no single-task window. This is the 100 TB-safe top-k."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).select(
        "o_orderkey", "o_totalprice"
    ).limit(10)


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "set_union",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        UNION SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct). The reference's closest form is concatenating
    InputVecs before startMapReduceJob (SURVEY.md section 2.2)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        INTERSECT SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): distinct rows present in both inputs; one shuffle on the full row."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        EXCEPT SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): distinct rows of the left absent from the right."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics


# --------------------------------------------------------------------------
# Scalar function families (client-map territory in the reference,
# reference SampleClient.cpp:37-39; JVM-codegen'd built-ins here)
# --------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                          AS uname,
               substr(p_type, 1, 5)                   AS t5,
               CAST(length(p_name) AS BIGINT)         AS nlen,
               concat(p_brand, '#', p_type)           AS brand_type,
               replace(p_name, ' ', '_')              AS snake
        FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family (case, trim, substring, pad, concat, replace) as codegen expressions over customer names."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_type", 1, 5).alias("t5"),
        F.length("p_name").cast("long").alias("nlen"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT)   AS y,
               CAST(month(o_orderdate) AS BIGINT)  AS m,
               CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                                                   AS days_since
        FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family (trunc, extract, add/diff, format) over order dates, UTC-pinned for oracle parity."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        # string, not DateType: pandas renders Spark DATE as datetime.date
        # and DuckDB DATE as datetime64 — identical values, different
        # stringification => value-hash mismatch at the driver.
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(abs(l_extendedprice - 1000.0), 2) AS dist,
               CAST(floor(l_quantity) AS BIGINT)       AS qfloor,
               CAST(ceil(l_discount * 100) AS BIGINT)  AS dpct,
               ROUND(sqrt(l_extendedprice), 4)         AS root,
               ROUND(ln(l_extendedprice + 1), 4)       AS logp,
               l_orderkey % 7                          AS mod7
        FROM lineitem
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family (abs/ceil/floor/round/pow/sqrt/log and modulo) with rounding aligned to the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("dist"),
        F.floor("l_quantity").cast("long").alias("qfloor"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("dpct"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("root"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("logp"),
        (F.col("l_orderkey") % 7).alias("mod7"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(emb) AS BIGINT)      AS dim,
               ROUND(emb[1], 4) + 0.0        AS e1,
               ROUND(list_sum(emb), 4) + 0.0 AS esum,
               ROUND(list_max(emb), 4) + 0.0 AS emax
        FROM (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
              FROM embeddings)
    """,
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed columns — absent in the reference (opaque C++ payloads
    at best); first-class here. aggregate/element_at stay JVM-side.

    Every rounded float gets `+ 0.0`: a tiny negative rounds to
    NEGATIVE zero, the engines don't agree on its sign bit, and "-0.0"
    vs "0.0" diverges under the driver's stringify-sort-hash compare
    even though the values are numerically equal (surfaced by the
    sf0.1 sweep). IEEE -0.0 + 0.0 = +0.0 normalizes on both sides."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        (F.round(F.element_at("embedding", 1), 4) + 0.0).alias("e1"),
        (
            F.round(
                F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x), 4
            )
            + 0.0
        ).alias("esum"),
        (F.round(F.array_max("embedding"), 4) + 0.0).alias("emax"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar family: parse the events props column, extract typed fields, and re-serialize."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@query(
    "conditional_case_agg",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_finished,
               CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_big,
               ROUND(AVG(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
                   AS avg_open_price
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("scalar", "conditional", "agg"),
)
def conditional_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN inside aggregates — conditional logic stays in
    whole-stage codegen, no UDF."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
        .cast("long")
        .alias("n_big"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
        ).alias("avg_open_price"),
    )


@query(
    "agg_statistical",
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_extendedprice), 4) AS price_stddev,
               ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS price_median,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "statistical"),
)
def agg_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance, correlation,
    covariance, and EXACT interpolated percentiles (median, p90 —
    DuckDB quantile_cont ≡ Spark percentile). The moments are one-pass
    partial-aggregatable (map-side combine as usual); exact percentile
    is the one aggregate here that must materialize the group's values
    before ranking — the scale path for when exact isn't required is
    approx_percentile (KLL-sketch-style mergeable summaries), same as
    agg_approx_count_distinct's HLL story."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("price_median"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("price_p90"),
    )


@query(
    "unpivot_price_components",
    oracle=f"""
        SELECT component,
               {bigint_sum_sql(snap_units_sql('amount', 100))}
                   / 100 AS total
        FROM (
            SELECT 'extendedprice' AS component, l_extendedprice AS amount
            FROM lineitem
            UNION ALL
            SELECT 'discount', l_discount FROM lineitem
            UNION ALL
            SELECT 'tax', l_tax FROM lineitem)
        GROUP BY component
    """,
    tags=("reshape", "agg"),
)
def unpivot_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide price columns to long (component, amount)
    rows — the inverse of pivot_status_by_priority. Spark's unpivot is
    a zero-shuffle row expansion; the aggregate after it shuffles
    O(components), not O(rows).

    The 3 constant component groups sum the whole corpus, so the
    display sum narrows through BIGINT on the DuckDB side (round-14
    queue item a — bigint_sum_sql): both engines then perform the same
    single int64->double conversion at any magnitude fitting int64
    (cent sums wrap near SF 1.6e6 ~ 1.6 PB)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    long = li.unpivot(
        ids=["okey"],
        values=["extendedprice", "discount", "tax"],
        variableColumnName="component",
        valueColumnName="amount",
    )
    return long.groupBy("component").agg(
        (
            F.sum(snap_units(F.col("amount"), 100)).cast("double") / 100
        ).alias("total")
    )


@query(
    "set_intersect_all",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        INTERSECT ALL SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each nation key survives
    min(multiplicity in customer, multiplicity in supplier) times.
    Distinct from set_intersect the way the SQL standard demands."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.intersectAll(s)


@query(
    "set_except_all",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        EXCEPT ALL SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference of multiplicities (customer rows
    minus one per matching supplier row)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.exceptAll(s)


@query(
    "cube_grouping_id",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup", "agg"),
)
def cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() markers — the standard way to tell a
    subtotal row's NULL from a data NULL. Each output row carries
    which dimensions were rolled up."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_prio"),
        F.count("*").alias("n"),
    )


@query(
    "timeseries_gap_fill",
    oracle="""
        WITH c AS (SELECT event_type,
                          time_bucket(INTERVAL '5 minutes', ts) AS bucket,
                          CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM events GROUP BY 1, 2),
        b AS (SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1
              FROM c GROUP BY 1),
        g AS (SELECT event_type,
                     unnest(generate_series(b0, b1, INTERVAL '5 minutes'))
                         AS bucket
              FROM b)
        SELECT g.event_type, g.bucket, COALESCE(c.cnt, 0) AS cnt
        FROM g LEFT JOIN c USING (event_type, bucket)
    """,
    tags=("timeseries", "window-time", "extension"),
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling / resampling: every 5-minute bucket in each event
    type's observed range appears, empty ones as zero — the dense grid
    downstream forecasting and windowed models need. sequence() +
    explode generates each type's grid from two scalars (O(types)
    rows in, O(buckets) out — never a driver loop); the left join back
    to the sparse counts is a broadcast-able dimension join."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / 300).cast("long") * 300
    )
    counts = (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("b0", "b1", F.expr("INTERVAL 5 MINUTES"))
        ).alias("bucket"),
    )
    return grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
    )


@query(
    "join_null_safe",
    oracle="""
        WITH a AS (SELECT DISTINCT NULLIF(c_mktsegment, 'BUILDING') AS seg
                   FROM customer),
        b AS (SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM customer GROUP BY 1)
        SELECT a.seg, b.n
        FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
    tags=("join", "null-semantics"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    segment row joins to the NULL group — a plain equi-join would drop
    it silently. NULLIF manufactures the NULLs deterministically so the
    oracle sees the same data. Null-safe equality still hash-partitions
    (NULL is a hashable key value here), so the join stays a shuffle
    hash join, not a nested loop."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.expr("NULLIF(c_mktsegment, 'BUILDING')")
    a = c.select(seg.alias("seg")).distinct()
    b = c.groupBy(seg.alias("seg")).agg(F.count("*").alias("n"))
    return a.join(b, a["seg"].eqNullSafe(b["seg"])).select(a["seg"], b["n"])


@query(
    "agg_null_semantics",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_all,
               CAST(COUNT(v) AS BIGINT) AS n_nonnull,
               ROUND(AVG(v), 4) AS avg_v,
               {bigint_sum_sql(snap_units_sql('v', 100))} / 100
                   AS sum_v
        FROM (SELECT c_mktsegment,
                     CASE WHEN c_acctbal < 0 THEN NULL
                          ELSE c_acctbal END AS v
              FROM customer)
        GROUP BY c_mktsegment
    """,
    tags=("agg", "null-semantics"),
)
def agg_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI null-skipping aggregates: COUNT(*) counts rows, COUNT(col)
    / AVG / SUM skip NULLs (negative balances nulled out here). The
    denominator difference between n_all and n_nonnull is the point."""
    c = load_table(spark, sf_dir, "customer")
    v = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return (
        c.select("c_mktsegment", v.alias("v"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_all"),
            F.count("v").alias("n_nonnull"),
            F.round(F.avg("v"), 4).alias("avg_v"),
            (
                F.sum(snap_units(F.col("v"), 100)).cast("double") / 100
            ).alias("sum_v"),
        )
    )


@query(
    "agg_collect_sorted",
    oracle="""
        SELECT o_custkey,
               string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
                   AS priorities
        FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "full-group"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-group value collection (the reference's IntermediateVec-per
    -key semantics, O9) surfaced deterministically: collect_list is
    unordered, so the engine canonicalizes with array_sort before
    array_join — the only way collected groups can be value-compared
    across engines. Group payload must fit a task, the same bound the
    reference's per-key vectors had (reference JobContext.h:80)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("o_orderpriority")), ","
        ).alias("priorities")
    )


@query(
    "agg_argmax_struct",
    oracle="""
        SELECT c_custkey,
               MAX(struct_pack(p := ROUND(o_totalprice, 2),
                               k := o_orderkey)).p AS best_price,
               MAX(struct_pack(p := ROUND(o_totalprice, 2),
                               k := o_orderkey)).k AS best_orderkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    tags=("agg", "struct"),
)
def agg_argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max per group via struct ordering: each customer's priciest
    order, with ties broken by the orderkey INSIDE the struct — the
    deterministic alternative to max_by (whose tie choice is
    unspecified). Struct comparison is lexicographic in both engines,
    so MAX(struct(price, key)) picks the same row bitwise. One
    aggregation shuffle; the struct rides the partial aggregate, so
    only O(groups) structs cross the wire."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    best = F.max(
        F.struct(
            F.round("o_totalprice", 2).alias("p"),
            F.col("o_orderkey").alias("k"),
        )
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            best.getField("p").alias("best_price"),
            best.getField("k").alias("best_orderkey"),
        )
    )


@query(
    "scalar_hash_funcs",
    oracle="""
        SELECT c_custkey,
               md5(c_name) AS name_md5,
               sha256(c_name) AS name_sha256,
               md5(c_name || ':' || CAST(c_custkey AS VARCHAR))
                   AS keyed_pseudonym
        FROM customer
    """,
    tags=("scalar", "hash", "pii"),
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash scalar family: md5 and sha2-256 digests plus
    a keyed pseudonymization (hash of value || ':' || key) — the
    deterministic PII-tokenization pattern a curation pipeline uses
    where redaction (text_scrub_redact) is too destructive: the same
    input maps to the same opaque token across tables, enabling joins
    on pseudonymized identity. All JVM-side codegen expressions; both
    engines emit lowercase hex, compared value-exact."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.md5(
            F.concat_ws(":", "c_name", F.col("c_custkey").cast("string"))
        ).alias("keyed_pseudonym"),
    )


@query(
    "agg_bitwise",
    oracle="""
        SELECT o_orderpriority,
               bit_and(o_orderkey) AS key_and,
               bit_or(o_orderkey) AS key_or,
               bit_xor(o_orderkey) AS key_xor,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) — used for
    permission-mask folding and set-membership digests. All three are
    algebraic (map-side partial combine), integer-exact in any
    evaluation order, so the oracle match is bit-for-bit by
    construction."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
        F.count("*").alias("n"),
    )


@query(
    "agg_percent_of_total",
    oracle="""
        WITH cents AS (
            SELECT o_orderpriority,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
        ),
        per AS (SELECT o_orderpriority,
                       CAST(SUM(c) AS BIGINT) AS cents,
                       CAST(COUNT(*) AS BIGINT) AS n_orders
                FROM cents GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_cents FROM cents)
        SELECT o_orderpriority,
               n_orders,
               cents / 100.0 AS revenue,
               CAST(ROUND(cents * 1000000.0 / total_cents) AS BIGINT)
                   / 1000000.0 AS share_of_total
        FROM per, tot
    """,
    tags=("agg", "two-level"),
)
def agg_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total / ratio-to-report: each order priority's share
    of total revenue — the two-level aggregate behind every
    contribution chart. The grand total is a ONE-ROW broadcast joined
    back onto the per-group aggregates (never a second scan through an
    unpartitioned window, which is how BI tools usually write it and
    what the registry's window sweep forbids).

    Exactness: prices carry 2 decimals, so both levels sum BIGINT
    cents (associativity-proof — a double SUM differs across engines
    in the last ULP, enough to flip a ROUND(..., 6) share), and the
    share is rounded TO AN INTEGER in 1e-6 units then divided back:
    ROUND(double, 6) itself disagrees between the engines on boundary
    doubles (plans/exact.py), ROUND-to-integer does not."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderpriority",
        snap_units("o_totalprice", 100).alias("c"),
    )
    per = cents.groupBy("o_orderpriority").agg(
        F.sum("c").alias("cents"), F.count("*").alias("n_orders")
    )
    tot = cents.agg(F.sum("c").alias("total_cents"))
    return per.join(F.broadcast(tot)).select(
        "o_orderpriority",
        "n_orders",
        (F.col("cents") / 100.0).alias("revenue"),
        (
            F.round(F.col("cents") * 1000000.0 / F.col("total_cents"))
            .cast("long")
            / 1000000.0
        ).alias("share_of_total"),
    )


@query(
    "union_by_name_evolved",
    oracle="""
        SELECT doc_id, lang, source, n_chars
        FROM (
            SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
            UNION ALL BY NAME
            SELECT doc_id, lang, source, n_chars
            FROM documents WHERE doc_id % 2 = 1
        )
    """,
    tags=("setop", "schema-evolution"),
)
def union_by_name_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: merge a pre-migration corpus snapshot
    (no source/n_chars columns) with a post-migration one —
    ``unionByName(allowMissingColumns=True)`` aligns by NAME and fills
    the absent columns with NULL, where positional UNION would silently
    misalign or refuse. The everyday shape of appending new-schema
    parquet to an evolving lakehouse table; DuckDB's UNION ALL BY NAME
    is the oracle twin.

    Scale shape: a union is a no-shuffle plan concatenation — both
    scans stay partition-parallel and the NULL fill is a projection."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return old.unionByName(new, allowMissingColumns=True).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "agg_mode_exact",
    oracle=f"""
        WITH c AS (
            SELECT o_orderpriority AS priority, o_orderstatus AS s,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM orders GROUP BY priority, s),
        m AS (
            SELECT priority, s AS mode_status, cnt AS mode_count FROM (
                SELECT priority, s, cnt,
                       ROW_NUMBER() OVER (PARTITION BY priority
                                          ORDER BY cnt DESC, s) AS rn
                FROM c) WHERE rn = 1),
        v AS (
            SELECT o_orderpriority AS priority,
                   {snap_units_sql('o_totalprice', 100)} AS cents
            FROM orders),
        med AS (
            SELECT priority, cents AS median_cents,
                   n AS n_orders FROM (
                SELECT priority, cents,
                       ROW_NUMBER() OVER (PARTITION BY priority
                                          ORDER BY cents) AS rn,
                       COUNT(*) OVER (PARTITION BY priority) AS n
                FROM v) WHERE rn = (n + 1) // 2)
        SELECT m.priority, m.mode_status, m.mode_count,
               med.median_cents, CAST(med.n_orders AS BIGINT) AS n_orders
        FROM m JOIN med ON m.priority = med.priority
    """,
    tags=("agg", "statistical"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates: per-priority MODE of order status (most
    frequent value, ties broken to the lexicographically smallest — the
    determinism max_by/mode() engines don't promise) and the exact
    LOWER MEDIAN of order value (percentile_disc(0.5) semantics: the
    (n+1)/2-th order statistic, an actual data value — no
    interpolation, so no float contract at all; cents stay BIGINT).

    Scale: mode is a two-level aggregate — corpus shuffles once to
    O(groups x distinct-values) counts, the argmax window runs on that
    model-sized table. The exact median takes the SAME two-level shape
    (the priority key has constant cardinality, so a rank window over
    raw order rows would funnel the fact table through 5 reducer
    sorts): partial-aggregate to (priority, cents, count) first, then
    select the (n+1)/2-th order statistic from the cumulative count
    over DISTINCT cents — the smallest value whose cumulative count
    reaches the target rank, which is exactly the row the per-row
    ROW_NUMBER selects. At 100 TB the sketch path
    (feature_quantile_sketch) is the approximate variant, this row is
    the exact semantics it is measured against."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("s"),
    ).agg(F.count("*").alias("cnt"))
    w_mode = Window.partitionBy("priority").orderBy(
        F.col("cnt").desc(), F.col("s")
    )
    m = (
        c.withColumn("rn", F.row_number().over(w_mode))
        .filter(F.col("rn") == 1)
        .select(
            "priority",
            F.col("s").alias("mode_status"),
            F.col("cnt").alias("mode_count"),
        )
    )
    v = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        snap_units("o_totalprice", 100).alias("cents"),
    ).agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("priority").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy("priority")
    med = (
        v.select(
            "priority",
            "cents",
            F.sum("c").over(w_cum).alias("cw"),
            F.sum("c").over(w_all).alias("n"),
        )
        .filter(F.col("cw") >= F.expr("(n + 1) DIV 2"))
        .groupBy("priority")
        .agg(
            F.min("cents").alias("median_cents"),
            F.min("n").alias("n_orders"),
        )
    )
    return m.join(med, "priority").select(
        "priority", "mode_status", "mode_count", "median_cents", "n_orders"
    )


@query(
    "agg_weighted_median",
    oracle=f"""
        WITH v AS (
            SELECT l_returnflag,
                   {snap_units_sql('l_extendedprice', 100)} AS cents,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem),
        cum AS (
            SELECT l_returnflag, cents, w,
                   SUM(w) OVER (PARTITION BY l_returnflag
                                ORDER BY cents
                                ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(w) OVER (PARTITION BY l_returnflag) AS tw
            FROM v)
        SELECT l_returnflag,
               CAST(MIN(tw) AS BIGINT) AS total_weight,
               CAST(MIN(cents) AS BIGINT) AS wmedian_cents
        FROM cum
        WHERE 2 * cw >= tw
        GROUP BY l_returnflag
    """,
    tags=("agg", "statistical"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median — the robust aggregate where each value
    counts with a weight (here: price weighted by quantity, the
    'median price actually paid per unit' a pricing analysis wants,
    which the unweighted median distorts): the smallest value whose
    cumulative weight reaches half the total. No interpolation, no
    float contract — weights and values are exact BIGINTs, and the
    selection rule (first cents with 2*cumweight >= total) is the same
    closed predicate on both engines, so tie-handling is structural
    rather than order-dependent (equal cents rows share the predicate
    outcome; MIN over the qualifying set is unambiguous).

    Scale: the cumulative window partitions by l_returnflag — a
    CONSTANT-cardinality key (3 values), so feeding it raw lineitem
    rows would funnel the whole fact table through 3 reducer sorts at
    100 TB. Instead the scan partial-aggregates to (flag, cents,
    sum(w)) FIRST — map-side combine, one O(groups x distinct-cents)
    shuffle — and the window runs over the distinct-value table, which
    is orders of magnitude smaller and bounded by the value domain,
    not the corpus. Per-row and per-distinct-value cumulative weights
    select the same median: a cents value qualifies (2*cw >= tw) iff
    its LAST duplicate row qualifies, and MIN over qualifiers is
    shared. The sketch path stays the documented approximation at
    extreme value cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    v = (
        li.select(
            "l_returnflag",
            snap_units("l_extendedprice", 100).alias("cents"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.sum("w").alias("w"))
    )
    w_cum = Window.partitionBy("l_returnflag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = v.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("tw").alias("total_weight"),
            F.min("cents").alias("wmedian_cents"),
        )
    )


@query(
    "agg_distinct_bitmap",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "distinct", "extension"),
)
def agg_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation — the
    bitmap-index technique (roaring bitmaps, ClickHouse groupBitmap):
    each key sets bit (key mod 64) of word (key div 64), words BIT_OR
    together, the distinct count is the popcount sum. Why it matters
    at 100 TB: a plain COUNT(DISTINCT) shuffles every (group, key)
    pair once; the bitmap form bit_or-combines MAP-SIDE, so the
    exchange carries at most O(groups x domain/64) words no matter
    how many duplicate rows exist — the dense-integer-domain
    complement to HLL (approx, any domain —
    agg_approx_count_distinct) and KMV. The oracle is the plain
    COUNT(DISTINCT) itself, so the bitmap algebra (shift, OR,
    popcount — including bit 63 riding the sign bit of a BIGINT
    word) is proven equal to true distinct semantics, not just
    internally consistent.

    Scale note: for SPARSE key domains the fixed-width word table
    degrades to one word per key; the production answer is a
    compressed (roaring) bitmap UDAF at the same plan position."""
    o = load_table(spark, sf_dir, "orders")
    words = (
        o.select(
            "o_orderpriority",
            F.floor(F.col("o_custkey") / 64).cast("long").alias("w_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                " CAST(o_custkey % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("o_orderpriority", "w_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    return words.groupBy("o_orderpriority").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_customers")
    )
