"""The bucketed two-phase prefix decompositions, pinned against their
plain single-window forms.

The round-8 enum-key fixes replaced constant-cardinality fact-table
windows with bucketed scans (local window per (key, bucket) + O(buckets)
broadcast stitch joins). The DuckDB oracles already check end results,
but these tests pin the DECOMPOSITION IDENTITY itself: the bucketed form
must match the plain-window form row for row on the same input — with a
bucket width small enough to force many boundary stitches, so the
cross-bucket lag/offset/running-min logic is actually exercised (a day
bucket over sf0.001's short span would leave most of it idle)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceframework_spark.plans.analytics_queries import (
    _islands,
    _islands_bucketed,
)
from mapreduceframework_spark.sources import load_table

HOUR_US = 3_600_000_000


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )


def test_bucketed_islands_match_plain_windows(spark, sf_dir):
    ev = _events(spark, sf_dir)
    gap = 10 * 60 * 1_000_000
    plain = {
        tuple(r)
        for r in _islands(ev, "event_type", gap)
        .select("event_type", "seq", "s_us", "e_us")
        .collect()
    }
    for bucket_us in (HOUR_US, 86_400_000_000):
        bucketed = {
            tuple(r)
            for r in _islands_bucketed(ev, "event_type", gap, bucket_us)
            .select("event_type", "seq", "s_us", "e_us")
            .collect()
        }
        assert bucketed == plain, f"bucket_us={bucket_us}"


def test_bucketed_islands_boundary_stitching_exercised(spark, sf_dir):
    """With 1-hour buckets the data must actually span many buckets —
    otherwise the equivalence above proves nothing about the stitch."""
    ev = _events(spark, sf_dir)
    n_buckets = (
        ev.select((F.col("ts_us") / HOUR_US).cast("long").alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets > 10, f"only {n_buckets} hour buckets at this SF"


def test_peak_concurrency_bucketed_sweep_matches_plain_window(spark, sf_dir):
    """The bucketed sweep-line (per-bucket local peak + offset stitch)
    vs the plain type-partitioned running-sum sweep it decomposes."""
    from mapreduceframework_spark.plans.registry import all_queries

    REG = all_queries()
    got = {
        r["event_type"]: (r["peak_concurrency"], r["n_intervals"])
        for r in REG["events_peak_concurrency"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t")
    )
    pts = ev.select("event_type", "t", F.lit(1).alias("delta")).unionAll(
        ev.select(
            "event_type",
            (F.col("t") + F.lit(1_800_000_000)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["event_type"]: (r["peak_concurrency"], r["n_intervals"])
        for r in pts.select(
            "event_type", F.sum("delta").over(w).alias("c")
        )
        .groupBy("event_type")
        .agg(
            F.max("c").cast("long").alias("peak_concurrency"),
            (F.count("*") / 2).cast("long").alias("n_intervals"),
        )
        .collect()
    }
    assert got == want


def test_global_rank_bucketed_matches_plain_window(spark, sf_dir):
    """sort_global_ranked's price-bucketed two-phase rank vs the plain
    one-task global window it decomposes (row_number over
    (o_totalprice DESC, o_orderkey)): identical rank for every order,
    including ties broken by key inside one bucket and runs that cross
    bucket boundaries."""
    from mapreduceframework_spark.plans.registry import all_queries

    REG = all_queries()
    got = {
        r["o_orderkey"]: r["rn"]
        for r in REG["sort_global_ranked"].fn(spark, sf_dir).collect()
    }

    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    want = {
        r["o_orderkey"]: r["rn"]
        for r in orders.select(
            "o_orderkey", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got == want


def test_global_rank_bucket_spread_exercised(spark, sf_dir):
    """The price-bucket decomposition must actually spread: the orders
    table has to span enough distinct 1000-unit price buckets that the
    offset stitch is doing real work (and would at any SF — the TPC-H
    price domain is fixed by order size, not by row count)."""
    orders = load_table(spark, sf_dir, "orders")
    n_buckets = (
        orders.select(
            F.floor(F.col("o_totalprice") / F.lit(1000.0)).alias("pb")
        )
        .distinct()
        .count()
    )
    assert n_buckets > 50, f"only {n_buckets} price buckets at this SF"


def test_cusum_bucketed_scan_matches_plain_window(spark, sf_dir):
    """stats_cusum_drift's bucketed prefix scan vs the textbook plain
    window recursion it decomposes: S_i = P_i - min(0, running min P)
    computed with ONE event_type-partitioned window (fine at test
    scale, the very shape the fix removed) must give identical
    per-type (n, final, max) statistics."""
    from mapreduceframework_spark.plans.registry import all_queries

    REG = all_queries()
    got = {
        r["event_type"]: (r["n"], r["final_cusum_e4"], r["max_cusum_e4"])
        for r in REG["stats_cusum_drift"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    from mapreduceframework_spark.plans.exact import snap_units

    v = ev.select(
        "event_type",
        "ts",
        "event_id",
        (snap_units("value", 10000) - 500000).alias("y"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = v.select(
        "event_type", "ts", "event_id", F.sum("y").over(w_run).alias("pf")
    )
    srow = p.select(
        "event_type",
        "ts",
        "event_id",
        (
            F.col("pf")
            - F.least(F.lit(0).cast("long"), F.min("pf").over(w_run))
        ).cast("long").alias("s"),
    )
    want = {
        r["event_type"]: (r["n"], r["final_cusum_e4"], r["max_cusum_e4"])
        for r in srow.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max(F.struct("ts", F.col("event_id").alias("id"), F.col("s")))
            .getField("s")
            .alias("final_cusum_e4"),
            F.max("s").alias("max_cusum_e4"),
        )
        .collect()
    }
    assert got == want
