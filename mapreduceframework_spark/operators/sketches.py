"""Probabilistic sketch operators: count-min, Bloom filter, KMV.

The reference's unique-key set (reference JobContext.h:78,
JobContext.cpp:347-353) is the exact-memory ancestor of this family: at
100 TB you cannot hold exact per-key state for heavy-hitter counting,
membership, or cardinality, so the standard sketches replace it. Spark
ships HLL (`approx_count_distinct`, covered by agg_approx_count_distinct)
but has no count-min / Bloom / KMV surface — these build them from plain
DataFrame ops, so the sketches themselves are just small aggregates that
merge associatively (the property that makes them cluster-friendly:
partial sketches per partition, one cheap final merge).

Cross-engine determinism: every hash is the same explicit integer
formula in Spark Columns and in the DuckDB oracle rendering (the
module-level pairs below are kept adjacent so they cannot drift). The
16-bit :func:`dedup.word_hash` base is weak by design — collisions and
false positives are *part of the checked behavior*: both engines must
agree on them bit-for-bit.

Scale notes (100 TB):
- The CMS table is d*w rows regardless of input size; building it is one
  partial-aggregated shuffle of (row, col) cells — map-side combine
  collapses each partition to <= d*w rows before the exchange.
- The Bloom bit set is <= m rows; probing is a broadcast join of the bit
  set against the probe stream (never the reverse).
- KMV keeps the k smallest distinct hash values per group: a groupBy +
  window head — O(k) state per group, the same bound a streaming
  implementation would hold in `applyInPandasWithState`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduceframework_spark.operators.dedup import P, word_hash

# Per-row hash coefficients (a*h + b) % P — fixed so sketches are
# reproducible across engines, partitionings, and rounds. Max
# intermediate: 3023 * 65535 + 1103 < 2e8 << 2^63.
CMS_A = (907, 1129, 1439, 1733)
CMS_B = (17, 89, 233, 409)
CMS_WIDTH = 256

BLOOM_A = (2003, 2339, 2713)
BLOOM_B = (571, 761, 919)
BLOOM_BITS = 4096

# AMS (Alon-Matias-Szegedy) F2 sketch: one ±1 four-universal-ish sign
# stream per row; five rows so the median estimator has an odd count.
AMS_A = (5471, 6197, 7919, 8597, 9241)
AMS_B = (101, 313, 617, 829, 947)


def ams_signs(wh: Column) -> Column:
    """Array of the AMS ±1 signs of a word hash, one per sketch row:
    sign_r = 1 - 2*((a_r*wh + b_r) % P % 2). Max intermediate
    9241*65535 + 947 < 7e8 << 2^63."""
    return F.array(
        *[
            (
                F.lit(1) - F.lit(2) * ((F.lit(a) * wh + F.lit(b)) % P % 2)
            ).cast("long")
            for a, b in zip(AMS_A, AMS_B)
        ]
    )


def ams_sign_sql(wh: str, a: int, b: int) -> str:
    """DuckDB rendering of one AMS sign (kept adjacent to ams_signs)."""
    return f"1 - 2*(({a} * ({wh}) + {b}) % {P} % 2)"


def cms_cols(wh: Column) -> Column:
    """Array of ``depth`` column indices for a word-hash value — one
    per CMS row."""
    return F.array(
        *[(F.lit(a) * wh + F.lit(b)) % P % CMS_WIDTH
          for a, b in zip(CMS_A, CMS_B)]
    )


def cms_cols_sql(wh: str) -> str:
    """DuckDB rendering of :func:`cms_cols` (kept adjacent)."""
    cells = ", ".join(
        f"({a} * {wh} + {b}) % {P} % {CMS_WIDTH}"
        for a, b in zip(CMS_A, CMS_B)
    )
    return f"[{cells}]"


def bloom_bits(wh: Column) -> Column:
    """Array of ``k`` bit positions for a word-hash value."""
    return F.array(
        *[(F.lit(a) * wh + F.lit(b)) % P % BLOOM_BITS
          for a, b in zip(BLOOM_A, BLOOM_B)]
    )


def bloom_bits_sql(wh: str) -> str:
    """DuckDB rendering of :func:`bloom_bits` (kept adjacent)."""
    bits = ", ".join(
        f"({a} * {wh} + {b}) % {P} % {BLOOM_BITS}"
        for a, b in zip(BLOOM_A, BLOOM_B)
    )
    return f"[{bits}]"


def kmv_hash(wh: Column) -> Column:
    """Spread the 16-bit word hash across [0, P) for KMV ordering."""
    return (F.lit(48_271) * wh + F.lit(11)) % P


def kmv_hash_sql(wh: str) -> str:
    """DuckDB rendering of :func:`kmv_hash` (kept adjacent). ``wh`` is
    parenthesized: word_hash_sql ends in an unbracketed ``% 65536``,
    and * binds at the same precedence as %."""
    return f"(48271 * ({wh}) + 11) % {P}"


def word_hash_col(w: Column) -> Column:
    """Alias of :func:`dedup.word_hash` re-exported for sketch callers."""
    return word_hash(w)
