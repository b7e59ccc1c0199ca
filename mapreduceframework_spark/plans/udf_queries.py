"""User-defined function surface (SURVEY.md section 2.2 UDF/UDAF/UDTF
rows).

The reference's entire programming model IS user code — ``map`` is a
user-defined flatMap, ``reduce`` a user-defined full-group aggregate
(reference MapReduceClient.h:55-64); the generic client API in
core/client.py is the faithful port. The queries here pin the
*vectorized* UDF surface a Spark user reaches for directly:

- scalar ``pandas_udf``: Arrow-batched columnar transfer, NumPy math —
  the 10-100x-over-row-Python path (and the only sanctioned way to run
  Python per value in this engine);
- GROUPED_AGG ``pandas_udf``: user-defined aggregate over a whole
  group's column slices;
- ``mapInPandas`` as UDTF: 1-to-many row generation from Python.

All UDFs are created INSIDE the query functions: a module-level
``@pandas_udf`` runs its decorator again when cloudpickle re-imports
the module on an executor, where no SparkSession exists.

Scale notes: all three ship whole Arrow batches across the JVM<->Python
boundary (maxRecordsPerBatch in session.py bounds executor memory); the
GROUPED_AGG shuffles once on the group key with no partial aggregation
(unavoidable for opaque user aggregates — algebraic aggs should use
built-ins instead, see core_queries)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table


@query(
    "udf_pandas_scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS disc_price
        FROM lineitem
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, NumPy elementwise) —
    the engine's sanctioned per-value Python path. Plan shows
    ArrowEvalPython, one scan, zero shuffles. Arithmetic only: element-
    wise double ops are IEEE-identical to the oracle, no rounding."""

    @F.pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "udf_pandas_grouped_agg",
    bench=True,
    oracle="""
        SELECT l_returnflag,
               round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
                   AS w_avg_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "pandas", "agg"),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate as a GROUPED_AGG pandas UDF: each group's
    column slices arrive as pandas Series (the reference's 'reduce sees
    all values of one key', columnar). Summation order differs from the
    oracle -> rounded to 4 decimals on both sides."""

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias(
            "w_avg_price"
        )
    )


@query(
    "udtf_bigram_counts",
    oracle="""
        WITH d AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS words
                   FROM documents WHERE length(trim(text)) > 0),
        bg AS (SELECT doc_id,
                      unnest([words[i] || ' ' || words[i+1]
                              for i in range(1, len(words))]) AS bigram
               FROM d)
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY bigram
    """,
    tags=("udf", "udtf", "pandas"),
)
def udtf_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating user function (emit2-any-number-of-times,
    reference MapReduceClient.h:58) as mapInPandas: Python expands each
    document into word bigrams, Spark aggregates the counts JVM-side.
    The Python stage is a pure 1-to-many generator — partial aggregation
    still happens after it, so shuffle volume is O(distinct bigrams)."""

    def bigram_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_bg = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.strip().split()
                for i in range(len(words) - 1):
                    out_doc.append(doc_id)
                    out_bg.append(words[i] + " " + words[i + 1])
            yield pd.DataFrame({"doc_id": out_doc, "bigram": out_bg})

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    bigrams = docs.select("doc_id", "text").mapInPandas(
        bigram_batches, "doc_id long, bigram string"
    )
    return bigrams.groupBy("bigram").agg(F.count("*").alias("cnt"))


@query(
    "udtf_native_token_runs",
    oracle="""
        WITH d AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS words
                   FROM documents WHERE length(trim(text)) > 0),
        w AS (SELECT doc_id,
                     unnest([{'i': i, 'w': words[i]}
                             for i in range(1, len(words) + 1)]) AS s
              FROM d),
        x AS (SELECT doc_id, s.i AS i, s.w AS w FROM w),
        m AS (SELECT doc_id, i, w,
                     CASE WHEN lag(w) OVER (PARTITION BY doc_id ORDER BY i)
                               IS DISTINCT FROM w
                          THEN 1 ELSE 0 END AS new_run
              FROM x),
        r AS (SELECT doc_id, i, w,
                     SUM(new_run) OVER (PARTITION BY doc_id ORDER BY i
                                        ROWS UNBOUNDED PRECEDING) AS rid
              FROM m)
        SELECT doc_id,
               CAST(MIN(i) AS BIGINT) AS run_start,
               MIN(w) AS token,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM r GROUP BY doc_id, rid
    """,
    tags=("udf", "udtf"),
)
def udtf_native_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE Python UDTF API (Spark 3.5+ @udtf, distinct from the
    mapInPandas-shaped udtf_bigram_counts): a class with eval() that
    yields 0..n rows per input row — the closest modern analogue of the
    reference's emit2-any-number-of-times contract
    (MapReduceClient.h:58), here run-length-encoding each document's
    token stream (one row per maximal run of a repeated token). Invoked
    through SQL LATERAL so each document row fans out positionally.

    The oracle replays the RLE as gaps-and-islands SQL. Scale note:
    native UDTFs are row-at-a-time Python — fine for low-volume
    expansion; the Arrow-batched mapInPandas twin is the high-volume
    path. The UDTF class is defined inside this function: executors
    re-import the module under cloudpickle, and module-level UDF/UDTF
    decorators break that re-import (README pitfall)."""
    from pyspark.sql.functions import udtf

    class TokenRuns:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            words = text.strip().split()
            i = 0
            while i < len(words):
                j = i
                while j < len(words) and words[j] == words[i]:
                    j += 1
                yield doc_id, i + 1, words[i], j - i
                i = j

    runs = udtf(
        TokenRuns,
        returnType="doc_id bigint, run_start bigint, token string, run_len bigint",
    )
    spark.udtf.register("mrf_token_runs", runs)
    from mapreduceframework_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.*
        FROM documents d,
             LATERAL mrf_token_runs(d.doc_id, d.text) r
        WHERE length(trim(d.text)) > 0
        """
    )


@query(
    "udf_cogrouped_reconcile",
    oracle="""
        SELECT o.o_orderkey,
               CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
               epoch_us(MAX(l.l_shipdate)) AS last_ship_us,
               CAST(COALESCE(SUM(CASE WHEN l.l_discount > 0 THEN 1
                                      ELSE 0 END), 0) AS BIGINT)
                   AS n_discounted
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey
    """,
    tags=("udf", "pandas", "cogroup"),
)
def udf_cogrouped_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map semantics (the fourth pandas-UDF family, beside
    scalar / grouped-agg / mapInPandas): both sides' group slices
    handed to one Python function per key — the vectorized analogue
    of the reference's reduce seeing all values of a key, generalized
    to two inputs. Here: per-order reconciliation of the orders
    header against its lineitems (line count, latest ship time,
    discounted-line count). Integer-only outputs, so no float
    summation-order games.

    Scale ladder learned by measurement (round 15): the NATIVE
    ``cogroup(...).applyInPandas`` API invokes Python once per key —
    65 s at sf0.1 (150k calls of ~5 rows) because per-call overhead
    dwarfs per-row work; cogrouping on a coarse 1024-bucket key
    amortized that to ~1 s but left a FIXED 1024-call dispatch floor
    (the r14 verdict item). Now the row runs through
    operators/joins.py::cogroup_apply_batched — the same tagged-union
    + hash-shuffle-once + core/keyruns.iter_key_runs walk that fixed
    the as-of joins — so one Python call handles an Arrow batch's
    worth of whole key runs and the call count tracks data volume,
    not a tuning constant. The per-key contract is unchanged (each
    key's rows arrive complete, exactly once); the reconcile logic is
    key-vectorized pandas groupby, as the batched contract requires.
    The native-API equivalence is pinned in
    tests/test_round15_batched_cogroup.py."""
    from mapreduceframework_spark.operators.joins import (
        cogroup_apply_batched,
    )

    def reconcile(
        orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        if len(lines_pdf):
            g = lines_pdf.assign(
                disc=(lines_pdf["l_discount"] > 0).astype("int64")
            ).groupby("_k")
            stats = pd.DataFrame(
                {
                    "n_lines": g.size(),
                    "last_ship_us": g["l_shipdate"].max().astype(
                        "datetime64[us]"
                    ).astype("int64"),
                    "n_discounted": g["disc"].sum(),
                }
            )
        else:
            stats = pd.DataFrame(
                columns=["n_lines", "last_ship_us", "n_discounted"]
            )
        out = orders_pdf[["_k"]].join(stats, on="_k", how="left")
        out["o_orderkey"] = out["_k"].astype("int64")
        out["n_lines"] = out["n_lines"].fillna(0).astype("int64")
        out["n_discounted"] = out["n_discounted"].fillna(0).astype("int64")
        # last_ship_us stays NaN -> NULL for orders with no lineitems
        return out[["o_orderkey", "n_lines", "last_ship_us", "n_discounted"]]

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_discount"
    )
    return cogroup_apply_batched(
        orders,
        lines,
        "o_orderkey",
        "l_orderkey",
        reconcile,
        "o_orderkey long, n_lines long, last_ship_us long, "
        "n_discounted long",
    )
