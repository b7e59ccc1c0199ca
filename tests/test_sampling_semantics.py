"""Cross-engine determinism contracts for the sampling family.

The deterministic samplers replace RNG state with salted md5 unit
hashes so keep-sets survive re-runs and engine swaps; the weighted
reservoir (sample_weighted_reservoir) additionally runs the draw
through ln(). That is a transcendental — NOT guaranteed identically
rounded across libms — but its input domain is a 10,000-value grid, so
the contract is provable by enumeration rather than hoped for."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.registry import all_queries


def test_reservoir_ln_key_agrees_on_entire_domain(spark):
    """CAST(ROUND(ln(k/10001)*1e6) AS BIGINT) must agree between the
    JVM and DuckDB for ALL 10,000 possible unit-hash values — this is
    the complete input space of sample_weighted_reservoir's key, so
    agreement here makes the query engine-deterministic for any data.
    (Empirically the nearest value sits ~7e-5 from a rounding boundary
    while 1-ulp ln disagreements move it ~1e-10 — five orders of
    margin; this test exists so a libm change that eats that margin
    fails loudly.) The Spark side MUST divide by an explicit DOUBLE:
    a 10001.0 literal parses as DECIMAL and the decimal quotient
    rounds 1/10001 to 0.0001 exactly, moving ln by 1e-4."""
    sdf = (
        spark.range(1, 10001)
        .selectExpr(
            "id AS k",
            "CAST(ROUND(ln(id / CAST(10001 AS DOUBLE)) * 1000000) AS BIGINT)"
            " AS ln_e6",
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ddf = duckdb.connect().execute(
        "SELECT k, CAST(ROUND(ln(k / 10001.0) * 1000000) AS BIGINT) AS ln_e6 "
        "FROM range(1, 10001) t(k) ORDER BY k"
    ).fetchdf()
    mism = (sdf["ln_e6"].values != ddf["ln_e6"].values).sum()
    assert mism == 0, f"{mism}/10000 grid points round differently"


def test_reservoir_is_weighted_sampling_without_replacement(spark, sf_dir):
    """Structural E-S properties on real data: per source exactly
    min(k, docs-in-source) rows, no doc repeats, ranks are 1..k, and
    every ln key is negative (u < 1)."""
    REG = all_queries()
    rows = REG["sample_weighted_reservoir"].fn(spark, sf_dir).collect()
    assert rows, "reservoir returned nothing"
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
        assert r["ln_key_e6"] < 0
        assert r["weight"] > 0
    doc_ids = [r["doc_id"] for r in rows]
    assert len(doc_ids) == len(set(doc_ids)), "sampled a doc twice"
    from mapreduceframework_spark.sources import load_table

    src_counts = {
        r["source"]: r["cnt"]
        for r in load_table(spark, sf_dir, "documents")
        .filter("n_chars > 0")
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    from mapreduceframework_spark.plans.sampling_queries import RESERVOIR_K

    for src, picked in per_src.items():
        assert len(picked) == min(RESERVOIR_K, src_counts[src]), src
        assert sorted(r["rk"] for r in picked) == list(
            range(1, len(picked) + 1)
        )


def test_entropy_ln_count_quantization_agrees_on_domain(spark):
    """quality_char_entropy quantizes ln(c) to 1e-6-unit BIGINTs BEFORE
    multiplying by the integer count c — assert Spark and DuckDB agree
    on ln_e6(c) for every count c in [1, 200000] (doc lengths in the
    synthetic corpus top out at 577; the bound leaves ~350x headroom).
    Rounding the PRODUCT c*ln(c)*1e6 instead would collide with a
    half-integer inside 1 ulp at c = 101527 — this test plus the
    quantize-then-multiply order is what makes the entropy exact-int."""
    sdf = (
        spark.range(1, 200001)
        .selectExpr(
            "id AS c",
            "CAST(ROUND(ln(CAST(id AS DOUBLE)) * 1000000) AS BIGINT)"
            " AS ln_e6",
        )
        .toPandas()
        .sort_values("c")
        .reset_index(drop=True)
    )
    ddf = duckdb.connect().execute(
        "SELECT c, CAST(ROUND(ln(c::DOUBLE) * 1000000) AS BIGINT) AS ln_e6 "
        "FROM range(1, 200001) t(c) ORDER BY c"
    ).fetchdf()
    mism = (sdf["ln_e6"].values != ddf["ln_e6"].values).sum()
    assert mism == 0, f"{mism}/200000 count points round differently"


def test_dsir_bucket_counts_inside_proven_ln_domain(spark, sf_dir):
    """sample_importance_dsir's exactness rests on ln_e6 agreement over
    [1, 200000] (proven exhaustively above); its ln inputs are bucket
    counts + 1, so the observed counts at the test scale must stay
    inside that domain — at sf0.1 the hottest of the 8192 buckets
    holds ~9.5k features, 20x of headroom (a larger corpus re-proves a
    wider domain the same way)."""
    from pyspark.sql import functions as F

    from mapreduceframework_spark.operators import text as X
    from mapreduceframework_spark.plans.sampling_queries import DSIR_BUCKETS
    from mapreduceframework_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(F.split(F.trim("text"), r"[ \t\n\r\f]+").alias("ws"))
    n = F.size("ws")
    uni = toks.select(F.explode("ws").alias("w"))
    big = toks.filter(n >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, n - 1).alias("w1"),
                F.slice("ws", 2, n - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")).alias("w"))
    hot = (
        uni.unionByName(big)
        .groupBy(X.token_bucket(F.col("w"), DSIR_BUCKETS).alias("hb"))
        .agg(F.count("*").alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    assert hot + 1 <= 200_000
