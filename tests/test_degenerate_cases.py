"""Degenerate-input unit tests for guards flagged by plan review:

- equi-width histogram with a constant column (hi == lo) must not
  divide by zero — all rows land in bin 0;
- the CDC merge's insert-key offset must be derived from the snapshot's
  own key space, so inserted keys can never collide at any scale;
- simhash_by_doc must be row-count preserving, giving sim=0 for
  empty-token documents exactly like the scalar form.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduceframework_spark.plans.analytics_queries import equi_width_bin


def test_histogram_constant_column_all_bin_zero(spark):
    df = spark.createDataFrame(
        [(42.0,)] * 5, "v double"
    ).withColumn("lo", F.lit(42.0)).withColumn("hi", F.lit(42.0))
    bins = [
        r["bin"]
        for r in df.select(equi_width_bin(F.col("v")).alias("bin")).collect()
    ]
    assert bins == [0] * 5


def test_histogram_normal_range_spans_bins(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "v double"
    ).withColumn("lo", F.lit(0.0)).withColumn("hi", F.lit(99.0))
    bins = {
        r["bin"]
        for r in df.select(equi_width_bin(F.col("v")).alias("bin")).collect()
    }
    assert min(bins) == 0 and max(bins) == 19


def test_cdc_insert_keys_never_collide(spark, sf_dir):
    from mapreduceframework_spark.plans.lakehouse_queries import (
        cdc_merge_orders,
    )
    from mapreduceframework_spark.sources import load_table

    base = load_table(spark, sf_dir, "orders")
    base_max = base.agg(F.max("o_orderkey")).collect()[0][0]
    base_n = base.count()
    merged = cdc_merge_orders(spark, sf_dir)
    # Inserted rows carry status 'N' and a key strictly above the
    # snapshot's max — offset = MAX(o_orderkey) guarantees it.
    inserted = merged.filter(F.col("o_orderstatus") == "N")
    n_ins = inserted.count()
    assert n_ins > 0
    assert inserted.filter(F.col("o_orderkey") <= base_max).count() == 0
    # Merge arithmetic: base - deletes + inserts.
    n_del = base.filter(F.col("o_orderkey") % 13 == 0).count()
    assert merged.count() == base_n - n_del + n_ins


def test_simhash_by_doc_keeps_empty_docs(spark):
    from mapreduceframework_spark.operators.dedup import simhash_by_doc

    df = spark.createDataFrame(
        [(1, [7, 11, 13]), (2, []), (3, None)],
        "doc_id long, wh32 array<long>",
    )
    out = {r["doc_id"]: r["sim"] for r in simhash_by_doc(df).collect()}
    assert set(out) == {1, 2, 3}, "empty/null docs must not drop out"
    assert out[2] == 0 and out[3] == 0


def test_snapshot_diff_merge_round_trip(spark):
    """merge_changes(old, snapshot_diff(old, new)) must reproduce new —
    the identity that makes the diff a valid CDC bootstrap."""
    from mapreduceframework_spark.operators.cdc import (
        merge_changes,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 updated, 3 deleted, 4 null->value update, 5 new
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    diff = snapshot_diff(old, new, key="k")
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 3: "D", 4: "U", 5: "I"}  # 1 not emitted
    rebuilt = merge_changes(old, diff, key="k")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_welch_ttest_excludes_degenerate_pairs_like_oracle(spark, tmp_path):
    """The Welch guard (review finding): singleton event types (sample
    variance undefined at n=1) and pairs whose pooled variance is zero
    must be EXCLUDED — Spark's NULL-on-divide-by-zero and DuckDB's NaN
    would otherwise disagree. Crafted parquet: 'solo' has one row,
    'flat'/'flat2' are zero-variance, 'varied'/'varied2' are normal.
    Both engines must return the same pair set with finite stats."""
    import duckdb
    import math
    import pandas as pd

    from mapreduceframework_spark.plans.registry import all_queries

    rows = []

    def add(t, values):
        for v in values:
            rows.append(
                (
                    len(rows),
                    pd.Timestamp("2024-01-01") + pd.Timedelta(len(rows), "s"),
                    len(rows) % 3,
                    t,
                    v,
                    "{}",
                )
            )

    add("solo", [5.0])
    add("flat", [2.0, 2.0, 2.0])
    add("flat2", [7.0, 7.0])
    add("varied", [1.0, 3.0, 8.0])
    add("varied2", [2.5, 9.75])
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)

    spec = all_queries()["stats_welch_ttest"]
    got = spec.fn(spark, str(tmp_path)).toPandas()
    pairs = set(zip(got["type_a"], got["type_b"]))

    # No 'solo' pair survives; the flat x flat2 pair (zero pooled
    # variance) is excluded; everything else is present.
    assert pairs == {
        ("flat", "varied"),
        ("flat", "varied2"),
        ("flat2", "varied"),
        ("flat2", "varied2"),
        ("varied", "varied2"),
    }
    assert got["t_stat"].notna().all() and got["df_welch"].notna().all()
    assert all(math.isfinite(v) for v in got["t_stat"])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    ora = con.execute(spec.oracle).fetchdf()
    assert set(zip(ora["type_a"], ora["type_b"])) == pairs
    merged = got.merge(ora, on=["type_a", "type_b"], suffixes=("", "_o"))
    assert (merged["t_stat"] == merged["t_stat_o"]).all()
    assert (merged["df_welch"] == merged["df_welch_o"]).all()
