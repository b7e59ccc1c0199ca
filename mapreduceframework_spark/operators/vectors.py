"""Embedding similarity operators (ANN / near-dup over array<float>).

Brute-force cosine top-k is the correctness baseline; sign-LSH
(random-hyperplane) bucketing is the scale path — candidates come from a
bucket-equality shuffle join, so the work is O(sum of bucket^2) instead
of O(n^2), and each bucket's pairs are independent tasks across
executors.

Determinism rules (the DuckDB oracle must agree on the value-hash):

- All arithmetic is float64. The parquet column is float32; widening is
  exact in both engines.
- The dot product is a *sequential left fold* (``F.aggregate`` in Spark,
  ``list_reduce`` in DuckDB) — same multiplication and addition order ->
  bit-identical IEEE results, so no rounding tolerance games. Engine
  built-ins like DuckDB's ``list_cosine_similarity`` are avoided: their
  summation order is unspecified.
- The "random" hyperplanes are a fixed deterministic +/-1 pattern
  (``(i*PLANE_MULT + j*PLANE_STEP) % PLANE_MOD < PLANE_HALF``) computed
  identically in both engines — no RNG, reproducible across rounds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic pseudo-random +/-1 hyperplane pattern parameters.
PLANE_MULT = 37
PLANE_STEP = 59
PLANE_MOD = 97
PLANE_HALF = 48
N_PLANES = 8
# Multi-table LSH (OR-construction): L tables of K planes each. One
# K-plane bucket alone has P(collide) = (1 - theta/pi)^K — for 500
# moderately-similar vectors and K=8 that measured out to recall ZERO
# against brute force. L=4 tables of K=4 planes: per-table collide
# ~(0.8)^4~0.4 at cos 0.6, any-table ~1-(1-0.4)^4 ~ 0.87, while each
# table still prunes ~15/16 of the corpus.
L_TABLES = 4
PLANES_PER_TABLE = 4


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    """DuckDB rendering of :func:`dot` — same fold order."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"[{a}[i] * {b}[i] for i in range(1, len({a}) + 1)]), "
        f"(acc, x) -> acc + x)"
    )


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(sqrt(dot(a,a))*sqrt(dot(b,b))) — composed exactly
    as written so the oracle's expression tree matches op for op."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_sql(a: str, b: str) -> str:
    return f"{dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}))"


def plane_sign(dim_index: Column, plane: int) -> Column:
    """+/-1 coefficient of hyperplane ``plane`` at dimension
    ``dim_index`` (1-based)."""
    parity = (dim_index * PLANE_MULT + F.lit(plane * PLANE_STEP)) % PLANE_MOD
    return F.when(parity < PLANE_HALF, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(v: Column) -> Column:
    """Sign-LSH bucket id: bit j = 1 iff dot(v, plane_j) > 0, for
    N_PLANES fixed hyperplanes -> integer in [0, 2^N_PLANES). Vectors
    with high cosine land in the same bucket with probability
    (1 - theta/pi)^N_PLANES — the standard SRP-LSH estimator."""
    def sign_of(j: int):
        # Closure factory, NOT a default-arg lambda: PySpark binds a
        # 2-parameter lambda as (element, index) — the plane number
        # would silently become the array index (wrong buckets).
        return lambda i: plane_sign(i, j)

    out = F.lit(0)
    for j in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(1), F.size(v)), sign_of(j)),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def _proj_sign_bit(v: Column, plane: int, bit: int) -> Column:
    proj = F.aggregate(
        F.zip_with(
            v,
            F.transform(
                F.sequence(F.lit(1), F.size(v)),
                (lambda pl: (lambda i: plane_sign(i, pl)))(plane),
            ),
            lambda x, s: x * s,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))


def lsh_table_keys(v: Column) -> Column:
    """Multi-table sign-LSH: array of (tbl, bucket) structs, one per
    hash table; planes are globally indexed table*K + p so tables are
    independent. Candidates = pairs sharing a bucket in ANY table
    (OR-construction) — the standard recall/cost dial for SRP-LSH."""
    out = []
    for t in range(L_TABLES):
        bucket = F.lit(0)
        for p in range(PLANES_PER_TABLE):
            bucket = bucket + _proj_sign_bit(v, t * PLANES_PER_TABLE + p, p)
        out.append(
            F.struct(F.lit(t).alias("tbl"), bucket.alias("bucket"))
        )
    return F.array(*out)


def _proj_sql(v: str, plane: int) -> str:
    products = (
        f"[{v}[i] * (CASE WHEN (i*{PLANE_MULT} + {plane * PLANE_STEP})"
        f" % {PLANE_MOD} < {PLANE_HALF}"
        f" THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)"
        f" for i in range(1, len({v}) + 1)]"
    )
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, {products}), "
        f"(acc, x) -> acc + x)"
    )


def lsh_table_keys_sql(v: str) -> str:
    tables = []
    for t in range(L_TABLES):
        bits = " + ".join(
            f"CASE WHEN {_proj_sql(v, t * PLANES_PER_TABLE + p)} > 0"
            f" THEN {1 << p} ELSE 0 END"
            for p in range(PLANES_PER_TABLE)
        )
        tables.append(f"{{'tbl': {t}, 'bucket': ({bits})}}")
    return "[" + ", ".join(tables) + "]"


def lsh_bucket_sql(v: str) -> str:
    terms = []
    for j in range(N_PLANES):
        products = (
            f"[{v}[i] * (CASE WHEN (i*{PLANE_MULT} + {j * PLANE_STEP})"
            f" % {PLANE_MOD} < {PLANE_HALF}"
            f" THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)"
            f" for i in range(1, len({v}) + 1)]"
        )
        proj = (
            f"list_reduce(list_prepend(0.0::DOUBLE, {products}), "
            f"(acc, x) -> acc + x)"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"
