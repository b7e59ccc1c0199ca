"""Query/operator registry — the single source of truth.

Every operator the engine claims is registered here as a ``QuerySpec``:
a name, a Spark callable ``(spark, sf_dir) -> DataFrame``, and (when the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` (driver contract), the pytest parity harness, and
``bench.py`` all read this registry, so one registration covers the
correctness gate, local tests, and the benchmark.

Contract inherited from the driver: the compare sorts columns by name and
hashes values order-insensitively, so (a) every computed column is aliased
identically on both sides, (b) float aggregates are rounded on both sides
to dodge summation-order ULP drift, (c) integer sums are cast to BIGINT on
the DuckDB side (DuckDB widens SUM(BIGINT) to HUGEINT).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The caller may hand us a session with a non-UTC timezone;
            # the DuckDB oracle compares timestamps UTC-naive. Pin it.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle,
            tags=tags,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the full registry."""
    # Imports are side-effectful (decorator registration); keep the list
    # explicit so a missing module is an error, not silent shrinkage.
    from mapreduceframework_spark.plans import (  # noqa: F401
        analytics_queries,
        core_queries,
        extension_queries,
        graph_queries,
        join_queries,
        lakehouse_queries,
        mapreduce_queries,
        sketch_queries,
        streaming_queries,
        tpch_queries,
        udf_queries,
        window_queries,
    )

    return REGISTRY
