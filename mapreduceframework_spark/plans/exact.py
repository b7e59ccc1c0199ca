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
