"""Window functions and multi-dimensional grouping (SURVEY.md section 2.2
— absent in the reference; the closest substrate is full-group reduce,
reference MapReduceClient.h:61-64, which CAN see a whole partition's
values but has no frame/ordering semantics).

All windows here partition by a real key, so state per task is one
group's rows — the 100 TB-safe shape. The only unpartitioned window in
the repo is sort_global_ranked (documented there)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceframework_spark.plans.exact import (
    bigint_sum_sql,
    snap_units,
    snap_units_sql,
)
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table, register_views


@query(
    "window_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
    bench=True,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical per-group top-k: one
    hash shuffle on the group key, rank within partition, filter."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "rn",
        )
    )


@query(
    "window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_spend
        FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order time."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
        SELECT user_id, event_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER w)  AS gap_prev_us,
               epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS gap_next_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "events"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event stream: inter-event gaps in
    microseconds (NULL at stream edges). Microsecond arithmetic, not
    unix_timestamp: second-flooring each side first disagrees with the
    oracle's exact interval by up to 1s."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    return ev.select(
        "user_id",
        "event_id",
        (ts_us - F.unix_micros(F.lag("ts").over(w))).alias("gap_prev_us"),
        (F.unix_micros(F.lead("ts").over(w)) - ts_us).alias("gap_next_us"),
    )


@query(
    "window_moving_avg",
    oracle="""
        WITH c AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                          CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                              AS cents
                   FROM lineitem)
        SELECT l_suppkey, l_orderkey, l_linenumber,
               ROUND(SUM(cents) OVER w * 1.0
                     / (COUNT(*) OVER w * 100), 4) AS ma4
        FROM c
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, cents
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded frame (4-row moving average) per supplier over ship time —
    frame state is O(4), safe at any scale.

    Two determinism hazards fixed after the sf0.1 sweep flaked here:
    (1) ROUND(AVG(double) OVER frame) — the average now runs over
    exact BIGINT cents (prices carry 2 decimals) with one double
    division, immune to summation order; (2) the frame ORDER itself —
    (l_shipdate, l_orderkey, l_linenumber) is NOT unique in this data
    (118k duplicate (orderkey, linenumber) pairs at sf0.1), so a
    ROWS frame over it is underdetermined and DuckDB's parallel
    window execution legitimately permuted tied rows run to run.
    `cents` as the final sort key makes the order total up to fully
    identical rows, which are interchangeable in any frame. The
    general lesson is pinned in tests: a ROWS frame needs a total
    order; a non-unique ORDER BY is a latent nondeterminism bug in
    ANY engine."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "cents", snap_units("l_extendedprice", 100)
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "cents")
        .rowsBetween(-3, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("cents").over(w) / (F.count("*").over(w) * 100), 4
        ).alias("ma4"),
    )


@query(
    "window_rank_dense_percent",
    oracle="""
        SELECT o_orderpriority, o_orderkey,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
               ROUND(CUME_DIST() OVER w, 6)    AS cdist,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window", "rank"),
)
def window_rank_dense_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family over one partitioned window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --------------------------------------------------------------------------
# Multi-dimensional grouping
# --------------------------------------------------------------------------


@query(
    "rollup_revenue",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {bigint_sum_sql(snap_units_sql('l_extendedprice', 100))}
                   / 100 AS revenue,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("groupingsets",),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (flag,status) -> (flag) -> () hierarchy in one pass —
    Spark expands to a single Expand+Aggregate, still O(groups) shuffle.

    The grand-total cell sums the WHOLE corpus (cent sum passes 2^53
    near SF 4,000), so the oracle narrows HUGEINT->BIGINT before its
    single double cast (exact.py bigint_sum_sql, round 13) to match
    Spark's long->double conversion bit-for-bit at any magnitude."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (
            F.sum(snap_units("l_extendedprice", 100)).cast("double") / 100
        ).alias("revenue"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@query(
    "cube_counts",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("groupingsets",),
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping combinations in
    one aggregation pass — Spark expands the cube map-side, so the
    shuffle carries each input row once per grouping set, partial
    -combined as usual."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "grouping_sets_explicit",
    oracle="""
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("groupingsets",),
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (registered views)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) FILTER (o_orderstatus = 'F') AS f_cnt,
               COUNT(*) FILTER (o_orderstatus = 'O') AS o_cnt,
               COUNT(*) FILTER (o_orderstatus = 'P') AS p_cnt
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let pivot() discover
    values at scale — that's an extra distinct scan)."""
    o = load_table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("f_cnt"),
        F.coalesce("O", F.lit(0)).alias("o_cnt"),
        F.coalesce("P", F.lit(0)).alias("p_cnt"),
    )


@query(
    "window_range_frame",
    bench=True,
    oracle="""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                          CAST(ROUND(value * 10000) AS BIGINT) AS v_e4
                   FROM events)
        SELECT event_id, user_id,
               CAST(SUM(v_e4) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN 300000000 PRECEDING
                         AND CURRENT ROW) AS BIGINT) / 10000.0
                   AS val_5min,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN 300000000 PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS n_5min
        FROM e
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-count-based): per-user rolling
    5-minute sum/count. Unlike ROWS frames, peers at the same order
    value share one frame, so ties need no tiebreak for determinism.

    Both engines frame over INTEGER MICROSECONDS
    (rangeBetween(-300e6, 0) on unix_micros): the earlier form ordered
    Spark by ts cast to epoch SECONDS against the oracle's
    INTERVAL-precision RANGE, and at sf0.1 a sub-second-apart pair
    straddled the truncated boundary — one engine's frame held 2 rows,
    the other's 1. The rolling sum is an exact BIGINT over 1e-4-unit
    values (frame membership differences and float rounding are the
    two ways a windowed sum can silently diverge; this kills both)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, 0)
    )
    return ev.withColumn("v_e4", snap_units("value", 10_000)).select(
        "event_id",
        "user_id",
        (F.sum("v_e4").over(w) / 10000.0).alias("val_5min"),
        F.count("*").over(w).alias("n_5min"),
    )


@query(
    "window_value_functions",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(first_value(o_totalprice) OVER w, 2) AS first_price,
               ROUND(last_value(o_totalprice) OVER w, 2) AS last_price,
               ROUND(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "analytic"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an unbounded frame: each order row
    carries its customer's first, latest, and second order price.
    Ordering includes o_orderkey so same-day orders are deterministic;
    the frame must be explicitly unbounded-following or last_value
    degenerates to the current row."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias(
            "second_price"
        ),
    )


@query(
    "window_ntile_cume",
    oracle="""
        SELECT o_orderkey,
               ntile(4) OVER w AS quartile,
               cume_dist() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "ranking"),
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing + cumulative distribution per priority class.
    The o_orderkey tiebreak makes both deterministic; cume_dist is an
    exact ratio of two ints, so raw doubles match across engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
    )
