"""Generic source/sink surface beyond the driver's parquet tables.

The reference's only source is the caller's in-memory ``InputVec`` and
its only sink the shared ``OutputVec`` (reference MapReduceFramework.h:
18-20, JobContext.cpp:374-380). The engine generalizes both: columnar
files in, columnar files out, always with explicit schemas — the
reference's "user-declared, fixed per job, never inferred" data model
(SURVEY.md section 1.1) carried over, and at 100 TB schema inference is
a full extra pass over the data anyway.

Sinks default to parquet + snappy; ``partition_by`` maps to hive-style
directory partitioning, which is what makes downstream partition
pruning possible at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a pinned schema (never inferSchema — that is an
    extra full pass over the data). Malformed rows fail loudly
    (FAILFAST) rather than silently nulling — the engine's analogue of
    the reference's hard error path, minus the exit(1)."""
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode="FAILFAST", **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options: str
) -> DataFrame:
    """JSON-lines scan with a pinned schema; unlisted fields are pruned
    at parse time (column pruning reaches the parser)."""
    return spark.read.schema(schema).options(mode="FAILFAST", **options).json(path)


def from_rows(
    spark: SparkSession, rows: list, schema: T.StructType | str
) -> DataFrame:
    """In-memory source — the reference's InputVec, schema-explicit."""
    return spark.createDataFrame(rows, schema)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """File sink. parquet (default) keeps column stats for pushdown;
    ``partition_by`` creates hive-style partitions for pruning. The
    reference's OutputVec is an unordered bag (SURVEY.md section 4.3
    item 7) — so is a directory of part files."""
    w = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 256,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction — the §8 mitigation for scan-side file
    explosion (streaming sinks and over-parallel writers leave
    thousands of KB-sized files; at 100 TB the file-listing and
    per-file open costs then dominate the scan). Rewrites the dataset
    into ~``target_mb``-sized files: partition count is derived from
    the actual input byte size, floor 1, so the rewrite is one
    shuffle-free coalesce when shrinking (or a repartition when the
    input is a single giant file). Returns the partition count used.
    """
    import math

    src = spark.read.format(fmt).load(in_path)
    # Input size from a driver-side file listing (no data movement).
    total_bytes = _input_bytes(in_path)
    n = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    cur = src.rdd.getNumPartitions()
    out = src.coalesce(n) if n <= cur else src.repartition(n)
    out.write.format(fmt).mode("overwrite").save(out_path)
    return n


def _input_bytes(path: str) -> int:
    """Total data-file bytes under ``path`` (local paths; on a real
    cluster this is one FileSystem.listStatus pass)."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total
