"""TPC-H-shaped analytical queries, part 2 (Q7/Q8/Q9/Q14/Q16/Q17/Q18/Q19
and a Q22-style shape, adapted to the driver testdata's columns — this
star schema has no partsupp table and no commit/receipt dates, so the
shapes keep each query's *plan-defining* feature and substitute
available columns).

The reference (ElsaMarziano/MapReduceFramework) has no query language at
all — every row here is Spark-native capability layered on the
map/shuffle/reduce substrate the reference implements (reference
JobContext.cpp:97-116,133-172). What these add over part 1
(join_queries.py):

- Q7/Q8/Q9: multi-dimension broadcast stars with year() rollups and
  CASE-ratio aggregates (market-share pattern);
- Q14: conditional-aggregate ratio over a single join;
- Q16: count-distinct over a filtered bridge with a NOT IN anti-subquery;
- Q17: correlated scalar aggregate subquery (per-group threshold),
  decorrelated by Catalyst into an aggregate + join;
- Q18: HAVING-subquery semi-join back onto the fact table;
- Q19: disjunctive multi-branch predicate — the pushdown stress test;
- Q22-style: scalar subquery + NOT EXISTS anti-join + group rollup.

Cross-engine float discipline (registry.py docstring): ratios divide
*already-rounded* sums so both engines divide bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.exact import (
    int_round_div,
    int_round_div_sql,
    rev_e4,
    rev_e4_sql,
    snap_units,
    snap_units_sql,
)
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table, register_views


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)}
                   / 100.0 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
          AND n1.n_nationkey <> n2.n_nationkey
        GROUP BY supp_nation, cust_nation, o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between nation pairs by year.
    Both nation filters push below the joins; every dimension
    broadcasts, so the only fact shuffle is lineitem-orders."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    n1 = n.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("nk1"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("nk2"))
        .filter(F.col("nk1") != F.col("nk2"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (
                int_round_div(
                    F.sum(rev_e4().cast("decimal(38,0)")), 100
                )
                / 100.0
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
        WITH vol AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   {int_round_div_sql('SUM(CASE WHEN n1.n_nationkey = 2 THEN ' + rev_e4_sql() + ' ELSE 0 END)', 100)}
                       / 100.0 AS nation_vol,
                   {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)}
                       / 100.0 AS total_vol
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY o_year)
        SELECT o_year, nation_vol, total_vol,
               nation_vol / total_vol AS mkt_share
        FROM vol
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2 suppliers' share of revenue from ASIA
    customers, per year — the CASE-inside-SUM ratio pattern. The share
    divides two already-rounded sums so the doubles are bit-identical
    across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("nk1")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2")
    )
    vol = rev_e4().cast("decimal(38,0)")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("nk1"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("nk2"))
        .join(F.broadcast(r), F.col("rk2") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                int_round_div(
                    F.sum(
                        F.when(F.col("nk1") == 2, vol).otherwise(
                            F.lit(0).cast("decimal(38,0)")
                        )
                    ),
                    100,
                )
                / 100.0
            ).alias("nation_vol"),
            (int_round_div(F.sum(vol), 100) / 100.0).alias("total_vol"),
        )
    )
    return agg.select(
        "o_year",
        "nation_vol",
        "total_vol",
        (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share"),
    )


@query(
    "tpch_q9_product_profit",
    bench=True,
    oracle=f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {int_round_div_sql('SUM((' + rev_e4_sql() + ' - ' + snap_units_sql('p_retailprice', 100) + ' * ' + snap_units_sql('l_quantity', 1) + ' * 10))', 100)}
                   / 100.0 AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: pseudo-profit (no partsupp table, so unit cost is
    modeled as 10% of retail price) on 'red' parts, by supplier nation
    and order year. The LIKE filter prunes the part dimension before it
    broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # Exact e4 units: cents*(100-d2) - retail_cents*qty*10 (the 0.1
    # factor is retail_cents*10 in e4 units; quantities are integer).
    profit = (
        rev_e4()
        - snap_units("p_retailprice", 100)
        * snap_units("l_quantity", 1)
        * 10
    ).cast("decimal(38,0)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (int_round_div(F.sum(profit), 100) / 100.0).alias("profit")
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
        WITH s AS (
            SELECT {int_round_div_sql("SUM(CASE WHEN p_type = 'PROMO' THEN " + rev_e4_sql() + " ELSE 0 END)", 100)}
                       / 100.0 AS promo,
                   {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)}
                       / 100.0 AS total
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-02-01')
        SELECT promo, total, 100.0 * promo / total AS promo_pct FROM s
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from PROMO parts — the
    canonical conditional-aggregate ratio. Single broadcast join; the
    shipdate range is pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-02-01")))
    )
    p = load_table(spark, sf_dir, "part")
    vol = rev_e4().cast("decimal(38,0)")
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                int_round_div(
                    F.sum(
                        F.when(F.col("p_type") == "PROMO", vol).otherwise(
                            F.lit(0).cast("decimal(38,0)")
                        )
                    ),
                    100,
                )
                / 100.0
            ).alias("promo"),
            (int_round_div(F.sum(vol), 100) / 100.0).alias("total"),
        )
    )
    return s.select(
        "promo",
        "total",
        (100.0 * F.col("promo") / F.col("total")).alias("promo_pct"),
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "agg", "anti"),
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part group, with a
    NOT IN exclusion list (negative-balance suppliers stand in for the
    complaints predicate; lineitem stands in for partsupp as the
    part-supplier bridge). The NOT IN becomes a broadcast anti join;
    count-distinct expands to a two-phase aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100)
                                       AS BIGINT) AS DECIMAL(38,0)))
                         AS BIGINT) AS DOUBLE) / 100 / 7.0 AS avg_yearly
        FROM lineitem l
        WHERE l.l_quantity <
              (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-half-average-quantity line items —
    a correlated scalar aggregate subquery. Catalyst decorrelates it
    into (per-part AVG) join (lineitem) on l_partkey; expressed through
    the SQL surface to exercise exactly that rewrite. Quantities are
    integer-valued doubles, so the per-part AVG is exact in both
    engines and the comparison is deterministic.

    The single output cell sums a corpus-wide slice (unbounded as SF
    grows), so both engines narrow the exact decimal sum to BIGINT
    before the one double cast (exact.py bigint_sum_sql rationale,
    round 13) — Spark decimal->double and DuckDB's decimal/HUGEINT
    ->double conversions may differ by 1 ulp past 2^53."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100)
                                       AS BIGINT) AS DECIMAL(38,0)))
                         AS BIGINT) AS DOUBLE) / 100 / 7.0 AS avg_yearly
        FROM lineitem l
        WHERE l.l_quantity <
              (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
        """
    )


@query(
    "tpch_q18_large_orders",
    bench=True,
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               ROUND(o_totalprice, 2) AS total,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("tpch", "join", "subquery", "agg"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250 — the
    HAVING-subquery-IN pattern, executed as an aggregate-then-semi-join
    back onto the same fact table, then re-aggregated with the order
    and customer payload attached."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total"),
            "sum_qty",
        )
    )


@query(
    "tpch_q19_disjunctive",
    oracle=f"""
        SELECT {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)}
                   / 100.0 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "join", "filter"),
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three-branch disjunctive predicate across both join
    sides. Catalyst extracts the common single-side conjuncts
    (p_brand IN (...), p_size >= 1, l_quantity bounds) below the join,
    so each branch still prunes the scans before the disjunction is
    evaluated on joined rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(
        (
            int_round_div(F.sum(rev_e4().cast("decimal(38,0)")), 100)
            / 100.0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "tpch_q22_idle_rich_customers",
    oracle="""
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
    """,
    tags=("tpch", "subquery", "anti", "agg"),
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, rolled up by nation — an uncorrelated scalar subquery
    (single-row broadcast) plus a correlated NOT EXISTS (broadcast anti
    join), via the SQL surface. The AVG threshold compares against
    individual stored doubles, far from any ULP boundary."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_nationkey,
               COUNT(*) AS n_cust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        """
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders o
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
    """,
    tags=("tpch", "join", "window", "agg"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier of a
    multi-supplier finished order. The oracle keeps the classic
    EXISTS + NOT EXISTS double-correlation; the Spark plan rewrites
    both subqueries into one per-order window pass — n_suppliers and
    n_late_suppliers as count-distinct windows over the already-joined
    rows — because at 100 TB two extra lineitem self-joins are the
    difference between one shuffle and three. Same semantics: a late
    line qualifies iff its order has another supplier (EXISTS) and no
    OTHER late supplier (NOT EXISTS <=> the only late supplier is l1's
    own, i.e. n_late_suppliers == 1)."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = joined.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ),
    )
    return (
        flagged.filter(
            F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "lateral_last_ship",
    oracle="""
        SELECT o.o_orderkey, o.o_orderpriority, l.last_ship, l.n_lines
        FROM orders o,
             LATERAL (SELECT MAX(l_shipdate) AS last_ship,
                             CAST(COUNT(*) AS BIGINT) AS n_lines
                      FROM lineitem
                      WHERE l_orderkey = o.o_orderkey) l
        WHERE o.o_totalprice > 400000
    """,
    tags=("subquery", "lateral", "join"),
)
def lateral_last_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per qualifying order, an aggregate
    over just its line items. Catalyst decorrelates the lateral into
    aggregate-then-join on l_orderkey — the per-row subquery a naive
    engine would loop becomes one shuffle. (Orders with zero lines
    would surface as NULL/0 via the lateral's outer semantics; this
    dataset has none.) Via the SQL surface."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_orderpriority, l.last_ship, l.n_lines
        FROM orders o,
             LATERAL (SELECT MAX(l_shipdate) AS last_ship,
                             COUNT(*) AS n_lines
                      FROM lineitem
                      WHERE l_orderkey = o.o_orderkey) l
        WHERE o.o_totalprice > 400000
        """
    )


@query(
    "tpch_q13_custdist",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (SELECT c_custkey,
                     CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT JOIN orders
                   ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count — the
    double-aggregation shape whose correctness hinges on the LEFT join
    keeping zero-order customers (the filter lives in the JOIN
    CONDITION, not WHERE, or those customers vanish). The urgent
    -priority exclusion stands in for the comment NOT LIKE filter.
    Second aggregate is O(distinct counts) — tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey,
                   {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)} / 100.0
                       AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — a
    derived revenue view consumed twice (once for rows, once for the
    scalar MAX), the equality on already-rounded sums keeps the
    cross-engine comparison exact. Catalyst turns the scalar subquery
    into a single-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    rev = li.groupBy("l_suppkey").agg(
        (
            int_round_div(F.sum(rev_e4().cast("decimal(38,0)")), 100)
            / 100.0
        ).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("m"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "tpch_q2_min_cost_supplier",
    bench=True,
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey),
        eur AS (
            SELECT s_suppkey, s_name, s_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
        ce AS (
            SELECT * FROM cost JOIN eur ON l_suppkey = s_suppkey)
        SELECT p_partkey, p_name, s_name, s_acctbal,
               unit_cost AS min_cost
        FROM ce JOIN part ON l_partkey = p_partkey
        WHERE p_size < 10
          AND unit_cost = (SELECT MIN(c2.unit_cost) FROM ce c2
                           WHERE c2.l_partkey = ce.l_partkey)
    """,
    tags=("tpch", "subquery", "join", "agg"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the EUROPE supplier offering
    the minimum unit cost. The schema has no partsupp, so supply cost is
    derived from shipped lines as MIN(l_extendedprice / l_quantity) per
    (part, supplier) — a single division of stored doubles, so both
    engines compute bit-identical costs and the correlated-MIN equality
    is exact. The oracle keeps Q2's correlated scalar subquery; the
    Spark plan decorrelates it by hand into min-per-part + equi-join
    (one extra shuffle of O(parts) rows instead of a per-row subquery).
    Supplier/nation/region and part all broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    ce = cost.join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
    min_per_part = ce.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        ce.join(
            min_per_part,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "min_cost")
    )


@query(
    "tpch_q4_priority_count",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey
                        AND l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
    """,
    tags=("tpch", "subquery", "semi", "agg"),
)
def tpch_q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority histogram of one quarter's orders that
    had at least one late line. The schema has no commit/receipt dates,
    so "late" is l_shipdate > o_orderdate + 30 days — which makes the
    EXISTS correlated on BOTH the key and a non-equi date condition.
    Spark-side it is a left-semi join with a compound condition: the
    equi part (l_orderkey = o_orderkey) still hash-partitions the
    shuffle, and the date inequality rides along as a residual filter,
    so the semi join stays a single key-partitioned shuffle (the
    order-date filter prunes the probe side to one quarter first)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
        WITH val AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS pv_cents
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            WHERE s_nationkey = 7
            GROUP BY l_partkey)
        SELECT l_partkey, CAST(pv_cents AS DOUBLE) / 100 AS part_value
        FROM val
        WHERE CAST(pv_cents AS DOUBLE) / 100
              > (SELECT CAST(CAST(SUM(pv_cents) AS BIGINT) AS DOUBLE)
                        / 100 * 0.001
                 FROM val)
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from NATION_7's
    suppliers exceeds 0.1% of that nation's total — the
    aggregate-vs-global-scalar-subquery pattern (no partsupp, so
    shipped extendedprice stands in for availqty * supplycost). Both
    the per-part values and the grand total are rounded to cents
    before the threshold multiply, so cross-engine summation-order
    drift cannot flip the comparison; the oracle additionally narrows
    the nation-total HUGEINT sum to BIGINT before its double cast
    (exact.py bigint_sum_sql rationale, round 13) so both engines make
    the same single int64->double conversion at any magnitude. The
    scalar total is a single-row broadcast; the value view is computed
    once per side."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(snap_units("l_extendedprice", 100))
            .cast("long")
            .alias("pv_cents")
        )
    )
    threshold = val.agg(
        (F.sum("pv_cents").cast("double") / 100 * 0.001).alias("thresh")
    )
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("pv_cents").cast("double") / 100 > F.col("thresh"))
        .select(
            "l_partkey",
            (F.col("pv_cents").cast("double") / 100).alias("part_value"),
        )
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
        SELECT l_returnflag AS ship_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: line counts by urgency class per ship mode (the
    schema has no l_shipmode; l_returnflag is the categorical
    stand-in). The defining feature is the paired CASE-inside-SUM over
    a fact-fact join with a pushed-down date range — integer conditional
    counts, so the sums are exact in any order."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q20_excess_shippers",
    oracle="""
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'red%'
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(l_quantity) > 100)
    """,
    tags=("tpch", "subquery", "semi", "agg"),
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers who shipped more than 100
    units of some 'red' part — the nested-IN-with-grouped-HAVING
    pattern (availqty > half-of-shipped becomes shipped > threshold
    without partsupp). The inner pipeline prunes part by the LIKE
    before broadcasting it into lineitem, aggregates on the composite
    (supplier, part) key, then collapses to a distinct supplier list
    consumed as a broadcast semi join — quantities are integer-valued
    doubles, so the HAVING sum is exact in any order."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    s = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
