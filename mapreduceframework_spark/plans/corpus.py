"""Shared corpus/table helpers for the extension-query family
(SURVEY.md section 2.2 ⊕ rows): canonical projections of the synthetic
`documents` and `embeddings` tables plus their DuckDB CTE mirrors, so
every family module (text / dedup / ann / sampling / multimodal) renders
the exact same source expression on both engines.

Split out of extension_queries.py in round 7 (pure move, zero renames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.operators import dedup as D
from mapreduceframework_spark.sources import load_table

# Shared DuckDB CTE: tokenized non-blank documents (mirrors _docs()).
DOCS_CTE = (
    "SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS words "
    "FROM documents WHERE length(trim(text)) > 0"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-blank documents with a tokenized ``words`` column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.length(F.trim("text")) > 0).withColumn(
        "words", D.words_of(F.col("text"))
    )


def _docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenized docs, repartitioned (when needed) for expression-heavy
    pipelines.

    The repartition is GATED on observed scan parallelism (delegated to
    sources.ensure_min_partitions — one implementation of the gate):
    a single local parquet file scans as one task, so the round-robin
    exchange spreads the heavy shingle/hash expressions across all
    cores, and as a side effect materializes ``words`` so downstream
    HOF lambdas read a stored array. When the scan already has >=
    shuffle.partitions splits (always true at cluster scale — a 100 TB
    corpus is ~400k splits) the exchange is skipped: shuffling the
    whole corpus to round-robin it would be pure waste. Known
    trade-off on that path: without the exchange Catalyst inlines
    split() into downstream HOF lambdas, so tokenization re-runs per
    shingle-slice access; that per-row constant is paid in parallel
    across the already-wide scan, which beats a corpus-wide shuffle at
    scale (a shuffle writes+reads every byte once; the inlined split
    only re-scans each row's own text)."""
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    return ensure_min_partitions(
        _docs(spark, sf_dir).select("doc_id", "words"), spark
    )


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the float32 column widened to float64 (exact)."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


EMB_CTE = "SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings"
