"""The cross-engine exact-units contract, in one place.

Two facts drive every float-bearing oracle in the registry:

1. ``ROUND(double, k)`` for k > 0 is NOT cross-engine stable even on
   an identical input double: Spark rounds the shortest decimal
   representation via BigDecimal HALF_UP while DuckDB computes
   ``round(x * 10^k) / 10^k`` with std::round — demonstrated to
   disagree on 7th-decimal boundary values (0.2526845 -> 0.252685
   vs 0.252684). The driver's compare is an exact stringified bag
   hash, so one last-decimal flip is a hard failure.
2. ``ROUND(double)`` to an INTEGER is stable: the .5 tie is exactly
   representable at integer scale, both engines round half away from
   zero, and the decimal-string and binary views of the boundary
   agree.

Hence the contract used throughout: snap each row's double to integer
units with one row-local ROUND-to-integer (identical per row on both
engines), aggregate the integers (associativity-proof, immune to
partition/summation order), and at most ONE double division at the
end — dividing identical integers yields bit-identical doubles.

``snap_units`` is the Spark side; ``snap_units_sql`` renders the
matching DuckDB expression. They must stay textual mirrors — the
snap IS the oracle contract, so there is exactly one definition of it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def snap_units(col: Column | str, scale: int) -> Column:
    """Row-local exact snap: ROUND(col * scale) as BIGINT.

    ``scale`` is the units-per-1.0 factor (100 for cent-exact prices,
    10_000 for the events value family).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def snap_units_sql(expr: str, scale: int) -> str:
    """DuckDB mirror of :func:`snap_units` for oracle SQL strings."""
    return f"CAST(ROUND(({expr}) * {scale}) AS BIGINT)"


# --------------------------------------------------------------------------
# TPC-H revenue discipline (round 12)
# --------------------------------------------------------------------------
# ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) over raw doubles is
# the one family-wide survivor of fact (1) above: prices and discounts
# both carry exactly 2 decimals, so the per-row revenue term is an
# EXACT 1e-4-unit integer — cents * (100 - discount_pct) — and the sum
# can be associativity-proof like every other money aggregate in the
# repo. The hazard is not hypothetical: at sf0.01 the Q8 ASIA/1999
# total is exactly 102470172.5450 — a half-cent boundary — and both
# engines' float sums (error ~1e-1 at 1e8 magnitude over 6e4 terms)
# landed a hair BELOW it while the exact sum rounds above; the green
# driver rows were correlated luck, not a contract
# (tests/test_round12_thirdopinions19.py caught it). These helpers are
# the family-wide fix; the finisher uses fact (2): ONE ROUND-to-integer
# over the identical exact-integer-derived double on both engines.


def rev_e4(
    price: Column | str = "l_extendedprice",
    disc: Column | str = "l_discount",
) -> Column:
    """Exact 1e-4-unit revenue term: cents(price) * (100 - pct(disc)).
    Per-row magnitude <= ~1e9; sum in decimal(38,0) at scale."""
    return snap_units(price, 100) * (F.lit(100) - snap_units(disc, 100))


def rev_e4_sql(
    price: str = "l_extendedprice", disc: str = "l_discount"
) -> str:
    """DuckDB mirror of :func:`rev_e4` (kept adjacent)."""
    return (
        f"({snap_units_sql(price, 100)}"
        f" * (100 - {snap_units_sql(disc, 100)}))"
    )


def int_round_div(s: Column, div: int) -> Column:
    """Half-up-away-from-zero division of an exact integer sum by
    ``div``, computed ENTIRELY in the integer/decimal domain:
    sign(s) * ((|s| + div/2) div_trunc div).

    Why not ROUND(s::DOUBLE / div): a decimal(38,0) sum passes 2^53
    (tpch_q1's e-6-unit sum_charge is ~1.2e16 at sf0.1 already), where
    Spark's correctly-rounded BigDecimal->double and DuckDB's
    two-rounding HUGEINT->double conversions can differ by 1 ulp —
    the same cent-boundary class rev_e4 exists to kill (round-12
    self-review finding). With |s| both operands are non-negative, so
    Spark's truncating `div` and DuckDB's flooring `//` agree exactly
    at any magnitude. ``div`` must be even and positive. Domain: the
    QUOTIENT must fit BIGINT (|s|/div < 2^63) — at 100 TB TPC-H the
    largest e4 revenue sum is ~2e20, quotient ~2e18, inside the bound;
    the boundary itself is pinned in tests/test_round12_semantics2.py."""
    mag = F.abs(s) + F.lit(div // 2).cast("decimal(38,0)")
    # Decimal division keeps >= 6 fractional digits, and the true
    # quotient here has at most len(str(div)) of them — so the decimal
    # quotient is EXACT and floor == truncation on the non-negative
    # magnitude.
    trunc = F.floor(mag / F.lit(div)).cast("long")
    return F.when(s < 0, -trunc).otherwise(trunc)


def int_round_div_sql(s: str, div: int) -> str:
    """DuckDB mirror of :func:`int_round_div` (kept adjacent):
    HUGEINT `//` on the non-negative magnitude, sign re-applied."""
    mag = f"(abs({s}) + {div // 2})"
    return (
        f"(CASE WHEN ({s}) < 0 THEN -CAST(({mag}) // {div} AS BIGINT) "
        f"ELSE CAST(({mag}) // {div} AS BIGINT) END)"
    )


def int_round_mean(s: Column, mult: int, n: Column) -> Column:
    """Half-up mean finisher with a COLUMN divisor, entirely in the
    exact decimal domain: ROUND(s * mult / n) for s >= 0, n >= 1 as
    the integer (2*mult*s + n) // (2*n).

    Round-13 closure of the last double-domain finisher class (ADVICE
    r13): group means previously finished as ROUND(CAST(SUM AS DOUBLE)
    * mult / n) — the >2^53 int-to-double 1-ulp cross-engine class that
    :func:`int_round_div` was rewritten to kill, resurfacing through
    the division's double domain (q1's cent sum passes 2^53 near
    SF 4,000; a 1-ulp flip at a .5 boundary moves the rounded mean).

    ``int_round_div`` can't express this: its divisor is a literal,
    but a mean divides by COUNT(*). The half-up identity
    ROUND(a/b) = (2a + b) // (2b) (a, b >= 0) removes the .5 constant
    instead of adding it, so no parity constraint on the divisor.

    Exactness of the Spark side: decimal division rounds to scale 6,
    so ``floor(num / den)`` alone would be wrong within 5e-7 of an
    integer (reachable once n > 5e5 — sf0.1's largest q1 group is
    already 1.5e5 rows). Instead subtract the remainder first:
    ``(num - pmod(num, den)) / den`` is an exact multiple, its decimal
    quotient is an integer with 6 zero fraction digits — exact at any
    magnitude that fits decimal(38,.). Domain: s*2*mult < 1e38 (at
    100 TB TPC-H the e2 cent sum is ~6e17, * 2e4 = 1.2e22) and the
    mean itself fits BIGINT (it's a per-row-scale value; trivially).

    Non-negative inputs only — every mean this finishes sums a
    non-negative measure (quantities, cents, discount pcts)."""
    d38 = "decimal(38,0)"
    num = (s.cast(d38) * F.lit(2 * mult).cast(d38)) + n.cast(d38)
    den = n.cast(d38) * F.lit(2).cast(d38)
    return ((num - F.pmod(num, den)) / den).cast("long")


def int_round_mean_sql(s: str, mult: int, n: str = "COUNT(*)") -> str:
    """DuckDB mirror of :func:`int_round_mean` (kept adjacent):
    HUGEINT arithmetic throughout, flooring ``//`` — floor == the
    identity's truncation on the non-negative operands. Both operands
    are cast to HUGEINT explicitly so no INTERMEDIATE product/double
    can overflow a narrower inferred literal type (a bare INT32 ``n``
    overflows ``2 * n`` at 2^30 — caught by the r13 fuzz pin)."""
    return (
        f"CAST((2 * {mult} * CAST({s} AS HUGEINT) + {n})"
        f" // (2 * CAST({n} AS HUGEINT)) AS BIGINT)"
    )


def bigint_sum_sql(expr: str) -> str:
    """``CAST(CAST(SUM(expr) AS BIGINT) AS DOUBLE)`` — the display-sum
    narrowing (ADVICE r13): DuckDB widens SUM(BIGINT) to HUGEINT, and
    its HUGEINT->double conversion composes two roundings while
    Spark's long->double is one hardware CVTSI2SD — past 2^53 the two
    may differ by 1 ulp, breaking the exact bag-hash compare. Forcing
    the sum through BIGINT first makes BOTH engines perform the same
    single correctly-rounded int64->double conversion, exact-identical
    at any magnitude that fits int64 (e2 cent sums wrap near
    SF 1.6e6 ~ 1.6 PB — beyond the 100 TB design point)."""
    return f"CAST(CAST(SUM({expr}) AS BIGINT) AS DOUBLE)"
