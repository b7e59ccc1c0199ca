"""Round-12 semantics, part 2 — the exact-money finisher pinned at
adversarial magnitudes on BOTH engines.

plans/exact.py int_round_div / int_round_div_sql exist because
ROUND(SUM(double), 2) failed at a measured half-cent boundary (Q8) and
because casting a decimal(38,0) sum to double before dividing is lossy
past 2^53 (the round-12 self-review find). This module proves the
integer-domain finisher itself:

1. Spark's truncating decimal `div`-style floor and DuckDB's flooring
   HUGEINT `//` produce IDENTICAL half-up-away-from-zero results for
   adversarial sums: exact .5 boundaries, ±(2^53 ± 1) neighborhoods
   where doubles cannot represent adjacent integers, the 100 TB e4
   revenue magnitude class (~2e20), and the BIGINT-quotient boundary
   that is the finisher's documented domain edge;
2. both agree with the independent Python integer formula;
3. hypothesis fuzz over wide-ranging signed integers keeps the
   agreement honest between hand-picked cases;
4. rev_e4 equals Decimal arithmetic on randomized 2-decimal
   price/discount pairs (the per-row term is genuinely exact).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.exact import (
    int_round_div,
    int_round_div_sql,
    rev_e4,
    rev_e4_sql,
)


def _py_half_up(s: int, div: int) -> int:
    q = (abs(s) + div // 2) // div
    return -q if s < 0 else q


ADVERSARIAL = [
    0,
    49,
    50,  # exact half: away from zero
    -50,
    99,
    149,
    150,
    -150,
    2**53 - 1,
    2**53,
    2**53 + 1,
    2**53 + 49,
    2**53 + 50,
    -(2**53 + 50),
    10**16 + 50,  # the q1 sum_charge magnitude class
    10**16 - 50,
    10**18 + 50,
    2 * 10**20 + 50,  # the 100 TB e4 revenue magnitude class
    -(2 * 10**20 + 50),
    (2**63 - 1) * 100 + 49,  # largest sum whose quotient fits BIGINT
    -((2**63 - 1) * 100 + 49),
]


def test_finisher_agrees_on_adversarial_sums(spark):
    rows = [(i, str(v)) for i, v in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "i long, s string").select(
        "i", F.col("s").cast("decimal(38,0)").alias("s")
    )
    for div in (100, 10000):
        got = {
            r["i"]: r["q"]
            for r in df.select(
                "i", int_round_div(F.col("s"), div).alias("q")
            ).collect()
        }
        want = {
            i: _py_half_up(v, div) for i, v in enumerate(ADVERSARIAL)
        }
        assert got == want, f"spark div={div}"

        con = duckdb.connect()
        for i, v in enumerate(ADVERSARIAL):
            (q,) = con.execute(
                f"SELECT {int_round_div_sql(f'CAST({v} AS HUGEINT)', div)}"
            ).fetchone()
            assert q == want[i], f"duckdb div={div} v={v}"
        con.close()


# |quotient| must fit BIGINT (the finisher's documented domain), so
# the fuzz range keeps |s|/div < 2^63 for both divisors.
@settings(max_examples=300, deadline=None)
@given(
    s=st.integers(min_value=-(4 * 10**20), max_value=4 * 10**20),
    div=st.sampled_from([100, 10000]),
)
def test_finisher_duckdb_matches_python_fuzz(s, div):
    con = duckdb.connect()
    (q,) = con.execute(
        f"SELECT {int_round_div_sql(f'CAST({s} AS HUGEINT)', div)}"
    ).fetchone()
    con.close()
    assert q == _py_half_up(s, div)


def test_finisher_spark_matches_python_fuzz(spark):
    import random

    rng = random.Random(12012)
    vals = [rng.randint(-(4 * 10**20), 4 * 10**20) for _ in range(300)] + [
        rng.randint(-(10**6), 10**6) for _ in range(200)
    ]
    rows = [(i, str(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, s string").select(
        "i", F.col("s").cast("decimal(38,0)").alias("s")
    )
    got = {
        r["i"]: (r["a"], r["b"])
        for r in df.select(
            "i",
            int_round_div(F.col("s"), 100).alias("a"),
            int_round_div(F.col("s"), 10000).alias("b"),
        ).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == (_py_half_up(v, 100), _py_half_up(v, 10000)), v


@settings(max_examples=300, deadline=None)
@given(
    price=st.integers(min_value=0, max_value=10**7),  # cents
    disc=st.integers(min_value=0, max_value=99),  # pct
)
def test_rev_e4_sql_equals_decimal_arithmetic(price, disc):
    p = Decimal(price) / 100
    d = Decimal(disc) / 100
    exact_e4 = int((p * (1 - d) * 10000).to_integral_value(ROUND_HALF_UP))
    con = duckdb.connect()
    (got,) = con.execute(
        "SELECT " + rev_e4_sql() + " FROM (SELECT "
        f"CAST({float(p)!r} AS DOUBLE) AS l_extendedprice, "
        f"CAST({float(d)!r} AS DOUBLE) AS l_discount)"
    ).fetchone()
    con.close()
    assert got == exact_e4


def test_rev_e4_spark_matches_decimal_arithmetic(spark):
    import random

    rng = random.Random(8812)
    rows = []
    for i in range(400):
        price = rng.randint(0, 10**7)
        disc = rng.randint(0, 99)
        rows.append((i, price / 100.0, disc / 100.0, price, disc))
    df = spark.createDataFrame(
        [(i, p, d) for i, p, d, _, _ in rows],
        "i long, l_extendedprice double, l_discount double",
    )
    got = {
        r["i"]: r["e4"]
        for r in df.select("i", rev_e4().alias("e4")).collect()
    }
    for i, _, _, price, disc in rows:
        assert got[i] == price * (100 - disc), (price, disc)
