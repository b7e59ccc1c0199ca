"""Session-state robustness: the driver may hand the engine a session
configured differently than ours — the registry wrapper must repin what
correctness depends on, and AQE must handle skew without manual help.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduceframework_spark.plans.registry import all_queries


def test_queries_repin_utc_under_foreign_timezone(spark, sf_dir, oracle_con):
    """The DuckDB oracle compares timestamps UTC-naive; a caller-set
    session timezone must not leak into results (plans/registry.py
    wrapper repins spark.sql.session.timeZone per query call)."""
    from tests.conftest import assert_parity

    spec = all_queries()["timeseries_ohlc"]
    assert spec.oracle is not None
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spec.fn(spark, sf_dir)
        # The wrapper must have repinned UTC before building the plan...
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # ...and the result must still match the UTC-naive oracle.
        assert_parity(df, oracle_con, spec.oracle)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling, demonstrated end to end: a join where
    99% of rows share ONE key must execute with the skewed partition
    split (skew=true in the final adaptive plan), given thresholds
    scaled to local data volume. This is the adaptive counterpart of
    the manual salting recipe (join_salted_skew) — the engine's answer
    to hot keys at 100 TB when AQE can see them."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # force a sort-merge join so there is a shuffle to skew-split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        joined = left.join(right, "k")
        # Execute THIS DataFrame's own query execution (count() would
        # plan a separate aggregate query and leave joined's plan
        # un-finalized).
        assert len(joined.collect()) > 0
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
