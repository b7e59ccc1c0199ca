"""Join queries (SURVEY.md section 2.2 join rows — all absent in the
reference; its substrate expression is the reduce-side repartition join,
reference JobContext.cpp:97-116,133-172).

Plan-shape notes (asserted in tests/test_plans.py):
- dimension joins broadcast (region/nation/supplier/part always; customer
  under AQE's threshold) — zero shuffle on the fact side;
- fact-fact joins (orders-lineitem) sort-merge on the join key with AQE
  skew splitting;
- the theta join is a broadcast nested-loop — only viable because one
  side is tiny, which is the only shape a theta join is ever viable at
  100 TB anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceframework_spark.operators.joins import (
    asof_join,
    binned_range_join,
    range_join,
)
from mapreduceframework_spark.plans.exact import (
    bigint_sum_sql,
    int_round_div,
    int_round_div_sql,
    int_round_mean,
    int_round_mean_sql,
    rev_e4,
    rev_e4_sql,
    snap_units,
    snap_units_sql,
)
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table
from mapreduceframework_spark.sources.registry import inline_rows_df


@query(
    "join_inner",
    oracle="""
        SELECT o_orderkey, c_name, ROUND(o_totalprice, 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain inner equi-join orders-to-customer; the baseline shuffle join every other join variant is compared against."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", F.round("o_totalprice", 2).alias("total")
    )


@query(
    "join_left_agg",
    oracle="""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    tags=("join", "agg"),
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
        WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                    FROM customer GROUP BY 1),
             sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                    FROM supplier GROUP BY 1)
        SELECT COALESCE(cn.nk, sn.nk) AS nk,
               COALESCE(n_cust, 0) AS n_cust,
               COALESCE(n_supp, 0) AS n_supp
        FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join preserving unmatched rows of both sides with NULL padding."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            "nk",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS — left semi join; right side reduced to its join key before
    the shuffle (no payload movement)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — left anti join (customers with no orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast",
    oracle="""
        SELECT l_orderkey, l_linenumber, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size > 40
    """,
    tags=("join", "broadcast"),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the part dimension: the fact side never
    shuffles — at 100 TB this is the difference between a map-side join
    and moving the whole table."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand"
    )


@query(
    "join_theta",
    oracle="""
        SELECT s_suppkey, COUNT(*) AS n_richer
        FROM supplier JOIN customer ON c_acctbal > s_acctbal
        GROUP BY s_suppkey
    """,
    tags=("join", "theta"),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join — broadcast nested loop over the tiny
    supplier side; for each supplier, count richer customers."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(s), c.c_acctbal > s.s_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer"))
    )


@query(
    "join_cross",
    oracle="""
        SELECT r1.r_name AS a, r2.r_name AS b
        FROM region r1 CROSS JOIN region r2
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit bounded CROSS JOIN (region x nation) — the only sanctioned cartesian, both sides dimension-sized."""
    r1 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("a"))
    r2 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("b"))
    return r1.crossJoin(r2)


@query(
    "join_range_bands",
    oracle=f"""
        SELECT band, COUNT(*) AS n,
               {bigint_sum_sql(snap_units_sql('l_extendedprice', 100))}
                   / 100 AS revenue
        FROM lineitem
        JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 25.0),
                     ('high', 25.0, 40.0), ('top', 40.0, 51.0))
             AS bands(band, lo, hi)
          ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band
    """,
    tags=("join", "range"),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join of the fact table to a band dimension via the
    range_join operator (broadcast nested-loop; fact side unshuffled)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = inline_rows_df(
        spark,
        [("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 40.0),
         ("top", 40.0, 51.0)],
        "band string, lo double, hi double",
    )
    joined = range_join(li, bands, F.col("l_quantity"), F.col("lo"), F.col("hi"))
    return joined.groupBy("band").agg(
        F.count("*").alias("n"),
        # Exact cents like the rest of the money-sum family — the
        # round-12 self-review caught this one row still float-summing
        # against its already-exact oracle (masked at small SF).
        (
            F.sum(snap_units("l_extendedprice", 100)).cast("double") / 100
        ).alias("revenue"),
    )


@query(
    "join_asof",
    oracle="""
        SELECT e.event_id, o.o_orderdate AS asof_date
        FROM events e
        ASOF JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event for the same
    user, via the cogrouped merge_asof operator (operators/joins.py).
    Oracle: DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join(
        ev,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        out_schema="event_id long, user_id long, ts timestamp, o_orderdate timestamp",
        right_cols=[],
    )
    return out.select("event_id", F.col("o_orderdate").alias("asof_date"))


# --------------------------------------------------------------------------
# TPC-H-shaped headline queries (multi-join pipelines; bench set)
# --------------------------------------------------------------------------


@query(
    "tpch_q1_pricing",
    oracle=f"""
        WITH c AS (
            SELECT l_returnflag, l_linestatus,
                   {snap_units_sql('l_quantity', 1)} AS q,
                   {snap_units_sql('l_extendedprice', 100)} AS cents,
                   {snap_units_sql('l_discount', 100)} AS d2,
                   {snap_units_sql('l_tax', 100)} AS t2
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-09-02')
        SELECT l_returnflag, l_linestatus,
               {bigint_sum_sql('q')} AS sum_qty,
               {bigint_sum_sql('cents')} / 100 AS sum_base_price,
               {int_round_div_sql('SUM(cents * (100 - d2))', 100)}
                   / 100.0 AS sum_disc_price,
               {int_round_div_sql(
                   'SUM(cents * (100 - d2) * (100 + t2))', 10000)}
                   / 100.0 AS sum_charge,
               {int_round_mean_sql('SUM(q)', 10000)} / 10000.0 AS avg_qty,
               {int_round_mean_sql('SUM(cents)', 100)}
                   / 10000.0 AS avg_price,
               {int_round_mean_sql('SUM(d2)', 100)} / 10000.0 AS avg_disc,
               COUNT(*) AS count_order
        FROM c GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg"),
    bench=True,
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — scan-heavy aggregate; the whole plan is
    one codegen stage + one O(groups) shuffle.

    Round-12 exactness hardening (the Q8 half-cent-boundary find,
    plans/exact.py): quantities/prices/discounts/taxes carry at most 2
    decimals, so every sum here is an exact integer in 1/1e2/1e4/1e6
    units — ROUND(SUM(double), 2) over quarter-corpus-sized groups had
    float error comparable to the rounding grain (~0.05 at 1e8
    magnitude), i.e. the green rows depended on both engines' float
    sums landing the same side of a cent boundary. Round 13 (ADVICE)
    finished the job: the averages now divide by COUNT(*) in the exact
    decimal domain too (exact.py int_round_mean — the double-domain
    ROUND(SUM::DOUBLE * mult / n) finisher was the >2^53 1-ulp class
    int_round_div's own docstring documents), and the display sums
    narrow HUGEINT->BIGINT oracle-side before the single double cast
    (exact.py bigint_sum_sql)."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    q = snap_units("l_quantity", 1)
    cents = snap_units("l_extendedprice", 100)
    d2 = snap_units("l_discount", 100)
    t2 = snap_units("l_tax", 100)
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(q).cast("double").alias("sum_qty"),
            (F.sum(cents).cast("double") / 100).alias("sum_base_price"),
            (
                int_round_div(
                    F.sum((cents * (100 - d2)).cast(d38)), 100
                )
                / 100.0
            ).alias("sum_disc_price"),
            (
                int_round_div(
                    F.sum(
                        (cents * (100 - d2) * (100 + t2)).cast(d38)
                    ),
                    10000,
                )
                / 100.0
            ).alias("sum_charge"),
            (int_round_mean(F.sum(q), 10000, n) / 10000.0).alias("avg_qty"),
            (
                int_round_mean(F.sum(cents), 100, n) / 10000.0
            ).alias("avg_price"),
            (int_round_mean(F.sum(d2), 100, n) / 10000.0).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping",
    oracle=f"""
        SELECT o_orderkey,
               {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)}
                   / 100.0 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
    bench=True,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: filtered dim broadcast into a fact
    join, aggregate, top-10 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(
            (
                int_round_div(
                    F.sum(rev_e4().cast("decimal(38,0)")), 100
                )
                / 100.0
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_volume",
    oracle=f"""
        SELECT n_name,
               {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)}
                   / 100.0 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    tags=("tpch", "join"),
    bench=True,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: five-way join; every dimension broadcasts, lineitem and
    orders sort-merge on the order key — one fact shuffle total."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
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
    "tpch_q10_returned_revenue",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM({rev_e4_sql('l.l_extendedprice', 'l.l_discount')}) AS DOUBLE)
                   / 10000.0 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue from returned
    items. The l_returnflag filter is pushed to the lineitem scan; the
    fact-side join shuffles on orderkey; the top-20 is
    TakeOrderedAndProject (per-partition heaps), never a total sort.

    Per-GROUP sums here are bounded at any SF (a customer has ~10
    orders regardless of corpus size; e4 revenue sum ~1e11 << 2^53),
    so the decimal->double / HUGEINT->double casts are exact on both
    engines without the bigint_sum_sql narrowing — the r13 audit's
    bounded case, unlike the constant-group corpus-wide sums."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            # Exact: the e4 integer sum IS the 4-decimal value.
            (
                F.sum(rev_e4().cast("decimal(38,0)")).cast("double")
                / 10000.0
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "subquery_scalar_above_avg",
    oracle="""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    """,
    tags=("subquery", "filter"),
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate, through the engine's SQL surface
    (register_views + spark.sql — the reference has no query language;
    this is pure Spark-native capability). Catalyst rewrites it to a
    single-row broadcast join against the aggregate; the part table is
    scanned twice but the aggregate side reduces map-side."""
    from mapreduceframework_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
        """
    )


@query(
    "subquery_exists_late_ship",
    oracle="""
        SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o.o_orderpriority
    """,
    tags=("subquery", "join", "semi"),
)
def subquery_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS, via SQL. Catalyst decorrelates
    it into a left-semi hash join on l_orderkey — the same plan the
    DataFrame `join(how='left_semi')` produces, proving both surfaces
    land on one physical strategy."""
    from mapreduceframework_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o.o_orderpriority
        """
    )


@query(
    "join_salted_skew",
    oracle=f"""
        SELECT s.s_name,
               {bigint_sum_sql(snap_units_sql('l.l_extendedprice', 100))}
                   / 100 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
    """,
    tags=("join", "skew", "agg"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manual skew-join recipe, end to end: the fact side gets a
    deterministic salt (pmod(l_orderkey, 8)), the dimension side is
    exploded x8 with every salt value, and the join key becomes
    (suppkey, salt) — a hot supplier's rows now spread over 8 reducers
    instead of one. Results are identical to the plain join (the salt
    is a partitioning artifact, dropped before the aggregate), which is
    exactly what the oracle checks. On clusters AQE's skew-join split
    does this adaptively; the manual form works when AQE can't see the
    skew (e.g. pre-shuffle bucketing or non-AQE engines)."""
    n_salts = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_orderkey"), F.lit(n_salts))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
    )
    return (
        li.join(sup, (F.col("l_suppkey") == F.col("s_suppkey")) & (li["salt"] == sup["salt"]))
        .groupBy("s_name")
        .agg(
            (
                F.sum(snap_units("l_extendedprice", 100)).cast("double")
                / 100
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "join_skew_two_path",
    oracle="""
        WITH cnt AS (
            SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey
        ),
        hot AS (
            SELECT l_suppkey FROM cnt ORDER BY c DESC, l_suppkey LIMIT 10
        )
        SELECT s_name,
               CAST(s_suppkey IN (SELECT l_suppkey FROM hot) AS INT)
                   AS is_hot,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS revenue
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s_name, is_hot
    """,
    tags=("join", "skew", "agg"),
)
def join_skew_two_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER classic skew-join recipe (complement of
    join_salted_skew's salting): split the fact table into hot-key and
    cold-key row sets and give each its own physical join. Hot keys —
    the top-10 suppliers by row count, a rank-based cutoff with a
    deterministic (count DESC, key ASC) tie-break so the set is
    scale-stable — are routed through a BROADCAST join (their rows
    never shuffle, so the one reducer that would drown under a hot key
    never exists); the cold majority goes through a plain shuffle
    sort-merge join (hinted, because at 100 TB the dimension a cold
    path joins is NOT generally broadcastable — the hint keeps the
    demo honest at test scale where supplier would auto-broadcast).
    The union is semantically the plain join, which is what the oracle
    checks — including the routing itself via the is_hot flag.

    The hot-key list is a model-sized driver read (10 ints, the
    join_bloom_pruned precedent); production engines derive it from
    shuffle statistics (AQE's OptimizeSkewedJoin splits oversized
    partitions the same way, salting-in-effect), but the explicit
    two-path plan works on any engine and lets the hot side skip the
    exchange entirely rather than merely splitting it.

    Hot-key DISCOVERY convention: this demo finds the hot keys with a
    full groupBy-count pass over the fact table — exact, but one extra
    scan+shuffle that a 100 TB run would replace with a cheap sample
    (``df.sample(0.001)`` count, hot keys are by definition the ones a
    sample cannot miss) or the previous run's shuffle statistics; only
    the discovery pass changes, the two-path routing below is
    unchanged."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    hot_rows = (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "l_suppkey")
        .limit(10)
        .collect()
    )
    hot_keys = [r["l_suppkey"] for r in hot_rows]
    hot_join = (
        li.filter(F.col("l_suppkey").isin(hot_keys))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    cold_join = (
        li.filter(~F.col("l_suppkey").isin(hot_keys))
        .join(sup.hint("merge"), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        hot_join.unionByName(cold_join)
        .groupBy(
            "s_name",
            F.col("s_suppkey").isin(hot_keys).cast("int").alias("is_hot"),
        )
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(snap_units("l_extendedprice", 100)).cast("double")
                / 100
            ).alias("revenue"),
        )
    )


@query(
    "join_range_binned",
    bench=True,
    oracle=f"""
        SELECT i AS band_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               {bigint_sum_sql(snap_units_sql('l_extendedprice', 100))}
                   / 100 AS revenue
        FROM range(0, 204) t(i)
        JOIN lineitem
          ON l_quantity >= i * 0.25 AND l_quantity < i * 0.25 + 0.75
        GROUP BY i
    """,
    tags=("join", "range"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via interval binning (operators/joins.py
    binned_range_join): 204 OVERLAPPING quantity intervals
    [i*0.25, i*0.25+0.75) — each fact row matches up to three — joined
    to lineitem as a bin-key EQUI join plus residual filter instead of
    a nested loop. The oracle states the plain non-equi semantics; the
    plan-shape test pins that no NestedLoop join appears. All interval
    endpoints and the 0.5 bin width are exact binary fractions, so bin
    assignment and the residual compare are bit-identical across
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    intervals = spark.range(0, 204).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 0.25).alias("lo"),
        (F.col("id") * 0.25 + 0.75).alias("hi"),
    )
    joined = binned_range_join(
        li, intervals, value="l_quantity", lo="lo", hi="hi", bin_width=0.5
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n"),
        (
            F.sum(snap_units("l_extendedprice", 100)).cast("double") / 100
        ).alias("revenue"),
    )


@query(
    "join_asof_forward_gap",
    oracle="""
        SELECT a.o_orderkey,
               CAST(date_diff('day', a.o_orderdate, b.o_orderdate)
                    AS BIGINT) AS days_to_next
        FROM orders a
        ASOF JOIN orders b
          ON a.o_custkey = b.o_custkey
             AND a.o_orderdate < b.o_orderdate
    """,
    tags=("join", "asof"),
)
def join_asof_forward_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join, strict: for each order, days until the SAME
    customer's next strictly-later order — the repeat-purchase-gap
    metric, and the direction/strictness half of the as-of family
    (join_asof covers backward/inclusive). Same cogrouped merge_asof
    engine: one co-partitioned shuffle per side. Only the next DATE is
    emitted (not the next order id): two same-day next orders would
    make the id nondeterministic, the date never is. Oracle: DuckDB
    native ASOF JOIN on the strict < bound."""
    o = load_table(spark, sf_dir, "orders")
    left = o.select("o_orderkey", "o_custkey", "o_orderdate")
    right = o.select(
        F.col("o_custkey").alias("r_custkey"),
        F.col("o_orderdate").alias("next_date"),
    )
    out = asof_join(
        left,
        right,
        left_key="o_custkey",
        right_key="r_custkey",
        left_ts="o_orderdate",
        right_ts="next_date",
        out_schema=(
            "o_orderkey long, o_custkey long, o_orderdate timestamp, "
            "next_date timestamp"
        ),
        right_cols=[],
        direction="forward",
        allow_exact_matches=False,
    )
    return out.select(
        "o_orderkey",
        F.datediff("next_date", "o_orderdate")
        .cast("long")
        .alias("days_to_next"),
    )


@query(
    "join_bloom_pruned",
    oracle=f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems,
               {int_round_div_sql('SUM(' + rev_e4_sql() + ')', 100)}
                   / 100.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1995-02-01'
        GROUP BY 1
    """,
    tags=("join", "sketch", "runtime-filter"),
    bench=True,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction (the manual form of Spark's runtime
    bloom-filter join pruning): build a Bloom filter (m=4096, k=3,
    operators/sketches.py) over the SELECTIVE side's join keys — urgent
    Jan-1995 orders — and apply it as a row-local filter on the fact
    side BEFORE the join. No false negatives, so the final equi-join
    restores exactness, and the oracle is simply the plain join: the
    Bloom pass is semantically transparent, which is the whole point.

    Scale shape: the bit set is model-sized (<= m bits, like the
    k-means centroid collect) folded into ONE literal boolean array, so
    the probe is 3 multiplies + 3 word lookups + bit tests per fact row inside the
    scan stage — fact rows that miss the filter never reach the join's
    exchange. At 100 TB this is the difference between shuffling the
    full fact table and shuffling the few percent that can match (build-side cardinality is chosen to keep the m=4096 bitmap sparse at every SF; a production build sizes m from the observed key count). (Spark's
    own runtime filter does this automatically when statistics allow;
    writing it as a plan makes the pattern available to any source and
    any SF, and testable.)"""
    from mapreduceframework_spark.operators import sketches as S

    orders = load_table(spark, sf_dir, "orders")
    build = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-02-01")
    ).select("o_orderkey", "o_orderdate")
    # Model-sized driver read: <= 4096 distinct bit positions.
    bit_rows = (
        build.select(
            F.explode(S.bloom_bits(F.col("o_orderkey"))).alias("bit")
        )
        .distinct()
        .collect()
    )
    # Pack the bit set into 64-bit words (the real Bloom layout): the
    # literal is m/64 longs, not m booleans - an order of magnitude
    # less codegen for the probe expression.
    words = [0] * (S.BLOOM_BITS // 64)
    for r in bit_rows:
        words[r["bit"] // 64] |= 1 << (r["bit"] % 64)
    bm = F.lit([w - (1 << 64) if w >= (1 << 63) else w for w in words])

    li = load_table(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey")
    probe_ok = None
    for a, b in zip(S.BLOOM_A, S.BLOOM_B):
        bit = (F.lit(a) * key + F.lit(b)) % S.P % S.BLOOM_BITS
        word = F.element_at(bm, (bit / 64).cast("int") + 1)
        hit = F.getbit(word, bit % 64) == 1
        probe_ok = hit if probe_ok is None else (probe_ok & hit)
    pruned = li.filter(probe_ok).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    joined = pruned.join(
        F.broadcast(build), pruned.l_orderkey == build.o_orderkey
    )
    return joined.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.count("*").alias("n_lineitems"),
        (
            int_round_div(F.sum(rev_e4().cast("decimal(38,0)")), 100)
            / 100.0
        ).alias("revenue"),
    )


_NOT_IN_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM (SELECT o_orderpriority,
                 NULLIF(o_custkey % 100, 0) AS bucket
          FROM orders)
    WHERE bucket NOT IN (SELECT c_custkey % 100 FROM customer
                         WHERE c_acctbal < 0 AND c_custkey % 100 <> 0)
    GROUP BY o_orderpriority
"""


@query(
    "join_not_in_null_aware",
    oracle=_NOT_IN_SQL,
    tags=("join", "anti", "null-semantics", "subquery"),
)
def join_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN — the null-aware anti join, which is NOT the same
    operator as NOT EXISTS / left-anti: under three-valued logic a
    NULL probe key can never satisfy ``NOT IN`` (NULL <> x is
    UNKNOWN), so the NULLIF-manufactured NULL buckets vanish from the
    result, where a naive left-anti join would keep them; and one NULL
    in the subquery would empty the entire result (pinned by a plan
    test, not left to comments). Expressed through the SQL surface so
    Catalyst plans its single-column null-aware anti join
    (RewritePredicateSubquery -> BroadcastHashJoin with
    isNullAwareAntiJoin) instead of the BroadcastNestedLoopJoin the
    general NOT IN form needs.

    Scale shape: the exclusion list is an aggregate-sized broadcast
    (distinct customer buckets, <= 100 values); the probe side streams
    map-side with zero shuffle before the final small group-by."""
    from mapreduceframework_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)


@query(
    "division_priority_complete",
    oracle="""
        WITH per AS (SELECT o_custkey,
                            CAST(COUNT(*) AS BIGINT) AS n_orders
                     FROM orders GROUP BY o_custkey),
             pr AS (SELECT DISTINCT o_orderpriority AS p FROM orders)
        SELECT per.o_custkey AS custkey, per.n_orders
        FROM per
        WHERE NOT EXISTS (
            SELECT 1 FROM pr
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = per.o_custkey
                  AND o.o_orderpriority = pr.p))
    """,
    tags=("join", "subquery", "division", "agg"),
)
def division_priority_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: customers whose orders span EVERY order
    priority that exists in the data — "suppliers who stock all
    parts" / "users who completed all steps", Codd's ÷ operator. The
    oracle states it as the classical double-NOT-EXISTS; the engine
    uses the scalable algebraic rewrite: per-customer COUNT(DISTINCT
    priority) equi-joined to the global distinct count (a one-row
    broadcast). Same relation, two paradigms — which is the point of
    the cross-check.

    Scale shape: one hash aggregate over orders (partial-combined
    map-side), a 1-row broadcast for the divisor cardinality, and no
    correlated per-row probing anywhere — the double NOT EXISTS form
    the oracle uses would be quadratic if executed naively; the
    division-by-counting rewrite is how it survives 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    tot = o.select(
        F.countDistinct("o_orderpriority").alias("tot")
    )
    per = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("nprio"),
        F.count("*").alias("n_orders"),
    )
    return (
        per.join(F.broadcast(tot), per["nprio"] == tot["tot"])
        .select(F.col("o_custkey").alias("custkey"), "n_orders")
    )


_SP_P = 1_000_003  # coordinate space: integer points on a P x P plane
_SP_R = 20_000  # radius; cell size = R so 3x3 neighborhoods cover it
_SP_R2 = _SP_R * _SP_R


@query(
    "join_spatial_grid",
    oracle=f"""
        WITH cp AS (SELECT c_custkey,
                           (c_custkey * 2654435761) % {_SP_P} AS px,
                           (c_custkey * 2246822519) % {_SP_P} AS py
                    FROM customer),
             sp AS (SELECT s_suppkey,
                           (s_suppkey * 3266489917) % {_SP_P} AS px,
                           (s_suppkey * 668265263) % {_SP_P} AS py
                    FROM supplier)
        SELECT c_custkey, s_suppkey,
               (cp.px - sp.px) * (cp.px - sp.px)
             + (cp.py - sp.py) * (cp.py - sp.py) AS dist2
        FROM cp, sp
        WHERE (cp.px - sp.px) * (cp.px - sp.px)
            + (cp.py - sp.py) * (cp.py - sp.py) <= {_SP_R2}
    """,
    tags=("join", "spatial", "extension"),
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join on a grid index — the geospatial
    within-distance join (store x customer catchment, sensor x asset)
    in its scalable form. Points are deterministic integer coordinates
    derived from the keys (multiplicative hashing onto a P x P plane),
    so the geometry is pure BIGINT: squared Euclidean distance,
    exact comparisons, zero trig and zero float anywhere.

    The oracle is the quadratic distance theta join. The engine
    overlays a grid with CELL SIZE = RADIUS: each supplier point
    explodes to its 3x3 cell neighborhood (constant fan-out on the
    SMALLER side), customers map to their single cell, and candidates
    meet in a plain equi hash join on the cell id before the exact
    dist2 <= R^2 check — candidate volume is O(points per
    neighborhood), never |customers| x |suppliers|. The same plan is
    a geohash/S2-cell join at planetary scale; AQE splits hot cells
    (cities) the way it splits any skewed key."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 2654435761) % _SP_P).alias("px"),
        ((F.col("c_custkey") * 2246822519) % _SP_P).alias("py"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 3266489917) % _SP_P).alias("px"),
        ((F.col("s_suppkey") * 668265263) % _SP_P).alias("py"),
    )
    cgrid = c.withColumn(
        "cell",
        F.expr(f"px DIV {_SP_R}") * 100_000 + F.expr(f"py DIV {_SP_R}"),
    )
    sgrid = (
        s.withColumn("dx", F.explode(F.expr("array(-1, 0, 1)")))
        .withColumn("dy", F.explode(F.expr("array(-1, 0, 1)")))
        .select(
            "s_suppkey",
            F.col("px").alias("sx"),
            F.col("py").alias("sy"),
            (
                (F.expr(f"px DIV {_SP_R}") + F.col("dx")) * 100_000
                + (F.expr(f"py DIV {_SP_R}") + F.col("dy"))
            ).alias("cell"),
        )
    )
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    return (
        cgrid.join(sgrid, "cell")
        .filter(d2 <= F.lit(_SP_R2))
        .select("c_custkey", "s_suppkey", d2.alias("dist2"))
        .distinct()
    )


@query(
    "join_asof_nearest",
    oracle="""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, epoch_us(ts) AS t
              FROM events WHERE event_type = 'click'),
        bwd AS (SELECT p.event_id, MAX(c.t) AS bt
                FROM p JOIN c ON c.user_id = p.user_id AND c.t <= p.t
                GROUP BY p.event_id),
        fwd AS (SELECT p.event_id, MIN(c.t) AS ft
                FROM p JOIN c ON c.user_id = p.user_id AND c.t >= p.t
                GROUP BY p.event_id),
        pick AS (
            SELECT p.event_id, p.user_id, p.t,
                   CASE WHEN bt IS NOT NULL
                             AND (ft IS NULL OR (p.t - bt) <= (ft - p.t))
                        THEN bt ELSE ft END AS ct
            FROM p LEFT JOIN bwd USING (event_id)
                   LEFT JOIN fwd USING (event_id))
        SELECT event_id, user_id, t AS purchase_us, ct AS click_us,
               ABS(t - ct) AS gap_us
        FROM pick WHERE ct IS NOT NULL
    """,
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join, completing the direction matrix
    (backward `join_asof`, forward `join_asof_forward_gap`, nearest
    here): each purchase matched to the temporally closest click by the
    same user, whichever side of it — attribution when the touchpoint
    may log after the conversion. Equidistant ties go BACKWARD, pinned
    to pandas merge_asof semantics and mirrored in the oracle's
    `(t - bt) <= (ft - t)`.

    Same scale story as the rest of the matrix: one co-partitioned
    hash shuffle per side on user_id, then each key's slices meet in
    one Arrow batch where merge_asof runs vectorized — no range join,
    no window over all events. Timestamps ride as exact microsecond
    BIGINTs end to end."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.unix_micros("ts").alias("ct")
    )
    out = asof_join(
        p,
        c,
        left_key="user_id",
        right_key="c_user",
        left_ts="t",
        right_ts="ct",
        out_schema="event_id long, user_id long, t long, ct long",
        right_cols=[],
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("t").alias("purchase_us"),
        F.col("ct").alias("click_us"),
        F.abs(F.col("t") - F.col("ct")).alias("gap_us"),
    )


@query(
    "join_attribution_first_touch",
    oracle="""
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts,
                          value FROM events WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
              FROM events WHERE event_type = 'click'),
        cand AS (
            SELECT p.purchase_id, p.user_id, c.click_id, c.click_ts,
                   CAST(ROUND(p.value * 10000) AS BIGINT) AS value_e4
            FROM p JOIN c
              ON p.user_id = c.user_id
                 AND c.click_ts <= p.ts
                 AND c.click_ts >= p.ts - INTERVAL 7 DAY)
        SELECT purchase_id, user_id, click_id AS first_click_id,
               STRFTIME(click_ts, '%Y-%m-%d %H:%M:%S') AS first_click_ts,
               value_e4
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY purchase_id
                  ORDER BY click_ts, click_id) AS rk
              FROM cand)
        WHERE rk = 1
    """,
    tags=("join", "asof", "extension"),
)
def join_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch marketing attribution: each purchase credits the
    EARLIEST click by the same user within the preceding 7 days — the
    complement of the as-of family's last-before-timestamp semantics
    (join_asof takes the latest match; first-touch takes the earliest
    inside a bounded lookback, which as-of cannot express). Ties on
    the click timestamp break on click_id, so attribution is
    deterministic.

    Scale: user-keyed equi-join with a time-range residual (the
    join_range_bands discipline — never a theta join), then a
    purchase-partitioned rank window on the candidate set, which is
    bounded by clicks-per-user-week, not the corpus. Timestamps are
    emitted as strings per the date-rendering contract; revenue in
    exact 1e-4 units."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 10000).cast("long").alias("value_e4"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    cand = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("p_ts"))
        & (F.col("click_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("click_id").alias("first_click_id"),
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "first_click_ts"
            ),
            "value_e4",
        )
    )
