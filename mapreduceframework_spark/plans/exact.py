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
