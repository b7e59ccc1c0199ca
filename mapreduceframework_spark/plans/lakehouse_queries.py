"""Lakehouse/table-maintenance queries: CDC merge, Z-order layout.

The reference rebuilds its whole output per job (in-memory OutputVec,
reference JobContext.cpp:374-380); a 100 TB store instead maintains
snapshots incrementally (MERGE) and lays files out for data skipping
(Z-order). Both are engine-level DataFrame programs here — no table
format required — and both are deterministic integer/string programs, so
the oracles check them value-exact.

Scale notes (100 TB):
- cdc_merge_orders: one full-outer shuffle join snapshot x changes; real
  change batches are broadcast-small, making the merge map-only. Bucket
  both sides by key for a zero-shuffle merge every batch.
- layout_zorder_clustering: the z-value is a row-local integer
  expression (whole-stage codegen); the physical layout step it feeds
  (`repartitionByRange(z)` + sortWithinPartitions before write) gives
  parquet row-group min/max stats that are selective on BOTH dimensions
  — the summary emitted here is exactly the per-bucket rectangle bound
  a reader's skipping logic would consult.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.operators.cdc import merge_changes
from mapreduceframework_spark.plans.exact import snap_units, snap_units_sql
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table

ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

@query(
    "cdc_merge_orders",
    oracle=f"""
        WITH ch AS (
            SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority, 'U' AS op
            FROM orders
            WHERE o_orderkey % 13 <> 0 AND o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority, 'D' AS op
            FROM orders WHERE o_orderkey % 13 = 0
            UNION ALL
            SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders),
                   o_custkey, 'N' AS o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority, 'I' AS op
            FROM orders WHERE o_orderkey % 10 = 0
        )
        SELECT
            {", ".join(
                f"CASE WHEN c.op IN ('I','U') THEN c.{col} ELSE b.{col} END"
                f" AS {col}" for col in ORDER_COLS
            )}
        FROM orders b
        FULL OUTER JOIN ch c ON c.o_orderkey = b.o_orderkey
        WHERE c.op IS NULL OR c.op <> 'D'
    """,
    tags=("lakehouse", "cdc", "extension"),
    bench=True,
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on plain parquet: apply a deterministic change batch
    (updates for keys %7, deletes for keys %13, inserts with offset
    keys for keys %10) to the orders snapshot via
    operators/cdc.py::merge_changes — one full-outer join, 'I'/'U'
    rows win column-wise, 'D' rows drop. The oracle repeats the merge
    as its literal SQL expansion, so every surviving/updated/inserted
    row is value-checked.

    Insert keys are offset by MAX(o_orderkey) + 1 — guaranteed
    collision-free at ANY scale factor (a fixed constant collides once
    the snapshot outgrows it; and keys start at 0, hence the +1). The
    max is an O(1) scalar aggregate pulled to the driver —
    sequence-allocation model state, like a table format's next-rowid,
    not a data collect."""
    base = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    return merge_changes(base, _change_batch(base), key="o_orderkey")


def _change_batch(base: DataFrame) -> DataFrame:
    """The deterministic change batch shared by cdc_merge_orders and
    cdc_snapshot_diff: updates for keys %7, deletes for %13, inserts
    with MAX(o_orderkey)+1-offset keys for %10."""
    k = F.col("o_orderkey")
    # MAX is None on an empty snapshot — any offset works then (there is
    # nothing to collide with); 0 keeps the arithmetic total.
    max_key = base.agg(F.max("o_orderkey")).collect()[0][0]
    offset = (max_key if max_key is not None else 0) + 1
    upd = (
        base.filter((k % 13 != 0) & (k % 7 == 0))
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("op", F.lit("U"))
    )
    dele = base.filter(k % 13 == 0).withColumn("op", F.lit("D"))
    ins = (
        base.filter(k % 10 == 0)
        .withColumn("o_orderkey", k + F.lit(offset))
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("op", F.lit("I"))
    )
    return upd.unionByName(dele).unionByName(ins)


@query(
    "cdc_snapshot_diff",
    oracle="""
        WITH mx AS (SELECT MAX(o_orderkey) + 1 AS off FROM orders)
        SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderstatus,
               'D' AS op
        FROM orders WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey, 'X' AS o_orderstatus, 'U' AS op
        FROM orders WHERE o_orderkey % 13 <> 0 AND o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + off, 'N' AS o_orderstatus, 'I' AS op
        FROM orders, mx WHERE o_orderkey % 10 = 0
    """,
    tags=("lakehouse", "cdc", "extension"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC DERIVATION — the inverse of the merge: diff two full
    snapshots into I/U/D change rows (operators/cdc.py snapshot_diff,
    one full-outer join, struct-inequality update detection). This is
    how CDC bootstraps when upstream only ships periodic dumps. Here
    the 'new' snapshot is merge_changes(base, batch) over the SAME
    deterministic batch as cdc_merge_orders, so the derived diff must
    recover that batch exactly — update rows with the new status,
    delete rows with NULL payload, insert rows above the old key
    space. The oracle spells the expected batch directly from the
    %-patterns; round-trip identity is what the value hash checks."""
    from mapreduceframework_spark.operators.cdc import snapshot_diff

    base = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    new = merge_changes(base, _change_batch(base), key="o_orderkey")
    return snapshot_diff(base, new, key="o_orderkey").select(
        "o_orderkey", "o_orderstatus", "op"
    )


@query(
    "lakehouse_incremental_join",
    bench=True,
    oracle=f"""
        SELECT c_mktsegment AS segment,
               STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM({snap_units_sql('o_totalprice', 100)})
                    AS BIGINT) AS sum_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey % 10 = 0
           OR (o_orderkey % 10 <> 0 AND o_orderkey % 13 <> 0)
        GROUP BY segment, day
    """,
    tags=("lakehouse", "incremental", "join", "extension"),
)
def lakehouse_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta-join rule
    d(A |><| B) = dA |><| B (B static; with both sides changing it is
    dA |><| B_new  U  A_old |><| dB), composed with the same +1/-1
    multiplicity merge as lakehouse_incremental_agg: the maintained
    (segment, day) rollup over orders |><| customer is advanced by
    joining ONLY the change batch (inserts %10 weighted +1,
    retractions %13 of the old snapshot weighted -1) against the
    dimension, aggregating the delta, and merging O(groups) rows into
    the old view with one full-outer join.

    Scale: the fact delta is change-sized and the dimension join is a
    broadcast, so maintenance does |delta| work instead of re-joining
    the 100 TB fact table; the full recompute the oracle runs —
    re-join + re-aggregate of (base \\ retractions) U inserts — is
    exactly what this avoids. Sums stay in exact BIGINT cents so the
    merge is associative without float drift."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    k = F.col("o_orderkey")
    cents = snap_units("o_totalprice", 100)
    gcols = [
        F.col("c_mktsegment").alias("segment"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
    ]
    base = orders.filter(k % 10 != 0)
    mv_old = (
        base.join(F.broadcast(cust), base.o_custkey == cust.c_custkey)
        .groupBy(*gcols)
        .agg(F.count("*").alias("n_orders"), F.sum(cents).alias("sum_cents"))
    )
    inserts = orders.filter(k % 10 == 0).select(
        "o_custkey", "o_orderdate", F.lit(1).alias("w"), cents.alias("cents")
    )
    retractions = base.filter(k % 13 == 0).select(
        "o_custkey", "o_orderdate", F.lit(-1).alias("w"), cents.alias("cents")
    )
    changes = inserts.unionByName(retractions)
    delta = (
        changes.join(F.broadcast(cust), changes.o_custkey == cust.c_custkey)
        .groupBy(*gcols)
        .agg(
            F.sum("w").alias("d_n"),
            F.sum(F.col("w") * F.col("cents")).alias("d_sum"),
        )
    )
    merged = mv_old.join(delta, ["segment", "day"], "full_outer").select(
        "segment",
        "day",
        (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
            "n_orders"
        ),
        (
            F.coalesce("sum_cents", F.lit(0)) + F.coalesce("d_sum", F.lit(0))
        ).alias("sum_cents"),
    )
    return merged.filter(F.col("n_orders") > 0)


RECON_BUCKETS = 256


def _mutated_orders(base: DataFrame) -> DataFrame:
    """The reconcile target: orders with a SPARSE deterministic drift —
    status updates for keys %997, deletes for %1499 (minus the update
    keys), inserts with MAX+1-offset keys for %1001. Sparse on purpose:
    the point of cdc_merkle_reconcile is that the drill-down scan
    touches only the few buckets the drift lands in."""
    k = F.col("o_orderkey")
    max_key = base.agg(F.max("o_orderkey")).collect()[0][0]
    offset = (max_key if max_key is not None else 0) + 1
    keep = base.filter((k % 997 != 0) & (k % 1499 != 0))
    upd = base.filter(k % 997 == 0).withColumn("o_orderstatus", F.lit("X"))
    ins = (
        base.filter(k % 1001 == 0)
        .withColumn("o_orderkey", k + F.lit(offset))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    return keep.unionByName(upd).unionByName(ins)


def _bucket_digests(df: DataFrame) -> DataFrame:
    """Phase-1 summary: (bucket, row count, XOR of per-row xxhash64).
    bit_xor is order- and partition-insensitive, so the digest needs
    one map-side-combinable shuffle of O(buckets) rows."""
    return (
        df.withColumn("h", F.xxhash64(*ORDER_COLS))
        .groupBy((F.col("o_orderkey") % RECON_BUCKETS).alias("bucket"))
        .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("xh"))
    )


@query(
    "cdc_merkle_reconcile",
    oracle="""
        WITH mx AS (SELECT MAX(o_orderkey) + 1 AS off FROM orders)
        SELECT o_orderkey % 256 AS bucket, o_orderkey, 'U' AS op
        FROM orders WHERE o_orderkey % 997 = 0
        UNION ALL
        SELECT o_orderkey % 256, o_orderkey, 'D'
        FROM orders WHERE o_orderkey % 1499 = 0 AND o_orderkey % 997 <> 0
        UNION ALL
        SELECT (o_orderkey + off) % 256, o_orderkey + off, 'I'
        FROM orders, mx WHERE o_orderkey % 1001 = 0
    """,
    tags=("lakehouse", "cdc", "reconcile", "extension"),
)
def cdc_merkle_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style cross-table reconciliation — find every row that
    differs between two 100 TB snapshots WITHOUT comparing 100 TB of
    rows. Phase 1 reduces each table to O(buckets) digests (per
    o_orderkey%256 bucket: row count + XOR of per-row xxhash64 — the
    leaf level of a merkle tree, one map-side-combinable shuffle each),
    compares the two digest sets, and pulls the mismatched bucket ids
    to the driver (model-sized: <= 256 ints, the join_bloom_pruned
    precedent). Phase 2 re-scans ONLY those buckets — the isin
    predicate is pushed into both parquet scans, i.e. partition
    pruning when bucket is the layout key — and full-outer joins them
    by key to classify each difference as U (both sides, payload
    hash differs), D (source only) or I (target only).

    The target here is a deterministic sparse drift of orders
    (_mutated_orders), so the oracle can state the expected difference
    rows directly from the %-patterns; a 64-bit XOR digest has a
    ~2^-64 cancellation risk that production systems cover with
    128-bit hashes, and bucket count is sized so drift stays a strict
    subset of buckets (a real merkle tree recurses levels instead of
    fixing 256). tests/test_extensions.py asserts the
    drill-down really is partial: mismatched buckets == the changed
    keys' buckets, strictly fewer than RECON_BUCKETS, and an
    unchanged-table reconcile yields zero mismatched buckets."""
    source = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    target = _mutated_orders(source)
    src_d = _bucket_digests(source).alias("s")
    tgt_d = _bucket_digests(target).alias("t")
    digest_cmp = src_d.join(
        tgt_d, F.col("s.bucket") == F.col("t.bucket"), "full_outer"
    ).filter(
        ~F.col("s.n").eqNullSafe(F.col("t.n"))
        | ~F.col("s.xh").eqNullSafe(F.col("t.xh"))
    )
    mismatched = sorted(
        r[0]
        for r in digest_cmp.select(
            F.coalesce("s.bucket", "t.bucket").alias("bucket")
        ).collect()
    )
    k = F.col("o_orderkey")
    s2 = (
        source.filter((k % RECON_BUCKETS).isin(mismatched))
        .select(k.alias("s_key"), F.xxhash64(*ORDER_COLS).alias("s_h"))
    )
    t2 = (
        target.filter((k % RECON_BUCKETS).isin(mismatched))
        .select(k.alias("t_key"), F.xxhash64(*ORDER_COLS).alias("t_h"))
    )
    diff = s2.join(t2, s2.s_key == t2.t_key, "full_outer").select(
        F.coalesce("s_key", "t_key").alias("o_orderkey"),
        F.when(F.col("t_key").isNull(), "D")
        .when(F.col("s_key").isNull(), "I")
        .when(F.col("s_h") != F.col("t_h"), "U")
        .alias("op"),
    )
    return diff.filter(F.col("op").isNotNull()).select(
        (F.col("o_orderkey") % RECON_BUCKETS).alias("bucket"),
        "o_orderkey",
        "op",
    )


Z_BITS = 8  # bits per dimension -> 16-bit z-value
Z_BUCKETS = 32


def _z_expr(x: str, y: str) -> str:
    """Bit-interleave expression (shared Spark/DuckDB syntax):
    bit i of x -> z bit 2i, bit i of y -> z bit 2i+1."""
    # Every term is fully parenthesized: << binds LOOSER than + (C
    # precedence, both engines), so `a << 0 + b << 1` would nest.
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "layout_zorder_clustering",
    oracle=f"""
        WITH z AS (
            SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx,
                   {_z_expr("(l_partkey % 256)", "(l_suppkey % 256)")} AS zv
            FROM lineitem
        )
        SELECT CAST(zv // {65536 // Z_BUCKETS} AS BIGINT) AS zbucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(px) AS min_part, MAX(px) AS max_part,
               MIN(sx) AS min_supp, MAX(sx) AS max_supp
        FROM z GROUP BY 1
    """,
    tags=("lakehouse", "layout", "extension"),
)
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey) low
    bytes, summarized as the min/max rectangle each of the 32 z-ranges
    covers — small on BOTH dimensions, which is what makes row-group
    stats selective for either predicate after a
    `repartitionByRange(zv)` + sortWithinPartitions write. The z-value
    is pure bit arithmetic (one codegen'd projection); the identical
    expression string renders in both engines."""
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey % 256 AS px",
        "l_suppkey % 256 AS sx",
        f"{_z_expr('(l_partkey % 256)', '(l_suppkey % 256)')} AS zv",
    )
    return li.selectExpr(
        f"CAST(zv div {65536 // Z_BUCKETS} AS BIGINT) AS zbucket",
        "px",
        "sx",
    ).groupBy("zbucket").agg(
        F.count("*").alias("n_rows"),
        F.min("px").alias("min_part"),
        F.max("px").alias("max_part"),
        F.min("sx").alias("min_supp"),
        F.max("sx").alias("max_supp"),
    )


@query(
    "lakehouse_incremental_agg",
    bench=True,
    oracle=f"""
        SELECT o_orderpriority AS priority,
               STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM({snap_units_sql('o_totalprice', 100)})
                    AS BIGINT) AS sum_cents
        FROM orders
        WHERE o_orderkey % 10 = 0
           OR (o_orderkey % 10 <> 0 AND o_orderkey % 13 <> 0)
        GROUP BY priority, day
    """,
    tags=("lakehouse", "incremental", "extension"),
)
def lakehouse_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance — the +1/-1
    multiplicity algorithm for algebraic aggregates (the counting
    technique differential dataflow / DBSP formalize): a daily
    (priority, day) -> (count, revenue) view materialized over the
    base snapshot is advanced to the next snapshot by aggregating ONLY
    the change batch (inserts weighted +1, retractions -1) and merging
    the O(groups)-sized delta into the old view with one full-outer
    join; groups whose count reaches zero vanish.

    The partition: keys %10 == 0 are the new arrivals (inserts), keys
    %13 == 0 of the old snapshot are retracted — so the maintained
    view must equal a fresh aggregate over (base \\ retractions) ∪
    inserts, which is exactly what the oracle recomputes. Sums stay in
    exact BIGINT cents so the merge is associative without float
    drift.

    Scale: this is THE pattern that keeps a 100 TB rollup fresh —
    recompute touches only |delta| rows and the merge shuffles
    O(groups), not O(corpus); the full recompute the oracle runs is
    the thing production avoids."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    cents = snap_units("o_totalprice", 100)
    gcols = [
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
    ]
    base = orders.filter(k % 10 != 0)
    mv_old = base.groupBy(*gcols).agg(
        F.count("*").alias("n_orders"), F.sum(cents).alias("sum_cents")
    )
    inserts = orders.filter(k % 10 == 0).select(
        *gcols, F.lit(1).alias("w"), cents.alias("cents")
    )
    retractions = base.filter(k % 13 == 0).select(
        *gcols, F.lit(-1).alias("w"), cents.alias("cents")
    )
    delta = (
        inserts.unionByName(retractions)
        .groupBy("priority", "day")
        .agg(
            F.sum("w").alias("d_n"),
            F.sum(F.col("w") * F.col("cents")).alias("d_sum"),
        )
    )
    merged = mv_old.join(delta, ["priority", "day"], "full_outer").select(
        "priority",
        "day",
        (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
            "n_orders"
        ),
        (
            F.coalesce("sum_cents", F.lit(0)) + F.coalesce("d_sum", F.lit(0))
        ).alias("sum_cents"),
    )
    return merged.filter(F.col("n_orders") > 0)


# --------------------------------------------------------------------------
# Zone-map (data-skipping) pruning audit: natural vs clustered layout
# --------------------------------------------------------------------------

ZONE_ORDERKEYS = 1024  # orderkeys per natural zone (file-ish granule)
ZONE_DAYS = 28  # shipdate days per clustered zone
# The predicate window must sit INSIDE the corpus's shipdate span
# (1995-01..2001-11 at every SF) or the audit degenerates: the original
# 1994 window predated every shipdate, so both layouts pruned
# everything and rows_scanned/rows_matched were identically zero — the
# read-amplification contrast the row exists to demonstrate never
# engaged (caught by the round-12 pure-Python mirror, the same class
# of below-the-assert blind spot as the r11 Mann-Whitney tie find).
ZONE_PRED_LO = "1996-03-01"
ZONE_PRED_HI = "1996-08-31"


def _zone_audit_sql(zone_expr: str, layout: str) -> str:
    """Per-layout zone-map audit CTE chain: assign each lineitem row a
    zone, collect the zone's shipdate min/max (the zone map), then
    measure what a scanner using that map must read for the predicate."""
    return f"""
        SELECT '{layout}' AS layout,
               CAST(COUNT(*) AS BIGINT) AS zones_total,
               CAST(SUM(CASE WHEN zmin <= DATE '{ZONE_PRED_HI}'
                              AND zmax >= DATE '{ZONE_PRED_LO}'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS zones_scanned,
               CAST(SUM(CASE WHEN zmin <= DATE '{ZONE_PRED_HI}'
                              AND zmax >= DATE '{ZONE_PRED_LO}'
                             THEN n ELSE 0 END) AS BIGINT)
                   AS rows_scanned,
               CAST(SUM(hits) AS BIGINT) AS rows_matched
        FROM (SELECT {zone_expr} AS zone,
                     MIN(l_shipdate) AS zmin, MAX(l_shipdate) AS zmax,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN l_shipdate BETWEEN
                                        DATE '{ZONE_PRED_LO}'
                                        AND DATE '{ZONE_PRED_HI}'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS hits
              FROM lineitem GROUP BY 1)
    """


@query(
    "lakehouse_zone_map_prune",
    oracle=f"""
        {_zone_audit_sql(f"l_orderkey // {ZONE_ORDERKEYS}", "natural")}
        UNION ALL
        {_zone_audit_sql(
            f"date_diff('day', DATE '1992-01-01', l_shipdate)"
            f" // {ZONE_DAYS}",
            "clustered",
        )}
    """,
    tags=("lakehouse", "extension"),
)
def lakehouse_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping audit — the min-max file statistics
    every lakehouse format (parquet row groups, Delta/Iceberg file
    stats) uses to prune scans, measured under two physical layouts
    for the same shipdate range predicate: 'natural' zones follow
    insertion order (orderkey ranges — shipdates spread everywhere,
    so min/max spans swallow the predicate and nothing prunes) vs
    'clustered' zones aligned with the predicate column (shipdate
    ranges — zones either miss entirely or are genuinely needed).
    rows_scanned vs rows_matched is the read amplification a 100 TB
    scan would pay under each layout — THE quantitative argument for
    layout_zorder_clustering's existence, as an oracle-checked row.

    Scale shape: one zone-keyed partial agg per layout (the zone map
    itself is O(zones), model-sized), then an O(zones) rollup; the
    predicate evaluation rides the same scan that builds the map —
    no second pass, no join, all exact integers/dates."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )

    def audit(zone: F.Column, layout: str) -> DataFrame:
        lo, hi = F.lit(ZONE_PRED_LO).cast("date"), F.lit(
            ZONE_PRED_HI
        ).cast("date")
        zones = li.groupBy(zone.alias("zone")).agg(
            F.min("l_shipdate").alias("zmin"),
            F.max("l_shipdate").alias("zmax"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_shipdate").between(lo, hi), 1).otherwise(0)
            ).alias("hits"),
        )
        scanned = (F.col("zmin") <= hi) & (F.col("zmax") >= lo)
        return zones.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("zones_total"),
            F.sum(F.when(scanned, 1).otherwise(0)).alias("zones_scanned"),
            F.sum(F.when(scanned, F.col("n")).otherwise(0)).alias(
                "rows_scanned"
            ),
            F.sum("hits").alias("rows_matched"),
        )

    natural = audit(
        F.floor(F.col("l_orderkey") / ZONE_ORDERKEYS).cast("long"), "natural"
    )
    clustered = audit(
        F.floor(
            F.datediff("l_shipdate", F.lit("1992-01-01").cast("date"))
            / ZONE_DAYS
        ).cast("long"),
        "clustered",
    )
    return natural.unionByName(clustered)
