"""Round-13 exactness pins: the two new exact.py helpers.

``int_round_mean`` closes the last double-domain finisher class the
r13 ADVICE flagged (group means finishing as ROUND(SUM::DOUBLE*mult/n))
and ``bigint_sum_sql`` closes the display-sum HUGEINT->double
narrowing. Both are pinned here the way r12 pinned int_round_div
(tests/test_round12_semantics2.py): hand-picked adversarial magnitudes
on BOTH engines plus hypothesis fuzz against a pure-Python replay.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.exact import (
    bigint_sum_sql,
    int_round_mean,
    int_round_mean_sql,
)


def _py_mean(s: int, mult: int, n: int) -> int:
    """The contract: ROUND-half-up(s * mult / n) on non-negative s."""
    return (2 * mult * s + n) // (2 * n)


# Hand-picked adversarial (s, n, mult): exact .5 boundaries (the case a
# 1-ulp double flip moves), boundaries with n past the 5e5 decimal
# -rounding hazard int_round_mean's docstring derives, sums past 2^53
# (where the old double-domain finisher loses integer resolution), and
# the q1-shaped magnitudes at 100 TB scale.
CASES = [
    (5, 10, 1),                      # 0.5 -> 1 (half-up)
    (15, 10, 1),                     # 1.5 -> 2 (not banker's)
    (1, 2, 1),                       # 0.5 at the smallest scale
    (1_000_001, 2_000_002, 1),       # exactly 0.5 with n > 5e5
    (3_000_002, 2_000_001, 1),       # near 1.5 with n > 5e5
    (2**53 + 1, 1, 1),               # s itself not double-representable
    (2**53 + 1, 3, 1),
    (10**18 + 7, 3, 1),              # near BIGINT, odd divisor
    (6 * 10**17, 24_000_000_000, 100),   # 100 TB q1 cents / rows shape
    (2 * 10**16, 150_000, 10000),    # sf0.1 q1 group shape, e4 mult
    (0, 7, 100),                     # zero sum
]


def test_int_round_mean_adversarial_both_engines(spark):
    rows = [(i, s, n, mult) for i, (s, n, mult) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, s long, n long, m long")
    got = {
        r["i"]: r["r"]
        for r in df.select(
            "i",
            F.when(F.col("m") == 1,
                   int_round_mean(F.col("s"), 1, F.col("n")))
            .when(F.col("m") == 100,
                  int_round_mean(F.col("s"), 100, F.col("n")))
            .otherwise(int_round_mean(F.col("s"), 10000, F.col("n")))
            .alias("r"),
        ).collect()
    }
    for i, (s, n, mult) in enumerate(CASES):
        want = _py_mean(s, mult, n)
        duck = duckdb.sql(
            f"SELECT {int_round_mean_sql(str(s), mult, str(n))} AS r"
        ).fetchone()[0]
        assert got[i] == duck == want, (i, s, n, mult, got[i], duck, want)


@settings(max_examples=200, deadline=None)
@given(
    s=st.integers(min_value=0, max_value=10**20),
    n=st.integers(min_value=1, max_value=10**12),
    mult=st.sampled_from([1, 100, 10000]),
)
def test_int_round_mean_sql_fuzz_matches_python(s, n, mult):
    # DuckDB side alone is cheap enough to fuzz per-example; the Spark
    # side is pinned on the hand-picked cases above (per-example Spark
    # jobs would take minutes).
    assume(_py_mean(s, mult, n) < 2**63 - 1)  # the documented domain:
    # the MEAN fits BIGINT (a mean is per-row scale; only a fuzz corner
    # with n=1, mult=1e4 and an astronomical s escapes it)
    duck = duckdb.sql(
        f"SELECT {int_round_mean_sql(str(s), mult, str(n))} AS r"
    ).fetchone()[0]
    assert duck == _py_mean(s, mult, n)


def test_int_round_mean_spark_fuzz_matches_python(spark):
    # One Spark job over a deterministic pseudo-random grid (no RNG
    # state: affine steps over the adversarial ranges).
    rows = []
    for i in range(300):
        s = (i * 37_003_816_337_219 + 11) % (2**61)
        n = (i * 48_271 + 1) % (10**9) + 1
        mult = [1, 100, 10000][i % 3]
        if _py_mean(s, mult, n) >= 2**63 - 1:  # documented domain
            continue
        rows.append((i, s, n, mult, _py_mean(s, mult, n)))
    df = spark.createDataFrame(
        rows, "i long, s long, n long, m long, want long"
    )
    out = (
        df.withColumn(
            "got",
            F.when(F.col("m") == 1,
                   int_round_mean(F.col("s"), 1, F.col("n")))
            .when(F.col("m") == 100,
                  int_round_mean(F.col("s"), 100, F.col("n")))
            .otherwise(int_round_mean(F.col("s"), 10000, F.col("n"))),
        )
        .filter(F.col("got") != F.col("want"))
        .count()
    )
    assert out == 0


def test_bigint_sum_narrowing_matches_spark_past_2_53(spark):
    """The narrowing's whole point: a >2^53 integer sum must reach the
    double domain through ONE int64->double conversion on both engines.
    2^53 + 1 is the canonical non-representable value — DuckDB's
    HUGEINT sum narrowed to BIGINT first must agree bit-for-bit with
    Spark's long sum cast to double (both round to 2^53)."""
    vals = [2**53 - 1, 1, 1]  # sums to 2^53 + 1
    duck = duckdb.sql(
        f"SELECT {bigint_sum_sql('v')} AS r FROM "
        f"(SELECT unnest({vals}::BIGINT[]) AS v)"
    ).fetchone()[0]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.agg(F.sum("v").cast("double").alias("r")).collect()[0]["r"]
    assert got == duck == float(2**53)  # both round 2^53+1 -> 2^53


def test_bigint_sum_sql_shape():
    assert bigint_sum_sql("x") == (
        "CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE)"
    )
