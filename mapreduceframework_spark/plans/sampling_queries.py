"""Reproducible sampling / split / mixture / curation queries
(SURVEY.md section 2.2 ⊕ rows). Everything derives from one
deterministic multiplicative-hash doc bucket (same literal formula on
both engines — never engine-native rand/hash), so splits survive
re-runs and engine swaps; the curation pipeline composes the quality /
dedup / mixture stages into one plan with a whole-pipeline oracle.

Split out of extension_queries.py in round 7 (pure move, zero renames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceframework_spark.operators import text as X
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table

from mapreduceframework_spark.plans.dedup_queries import MINHASH_PAIRS_CTES, _minhash_pairs


# --------------------------------------------------------------------------
# Reproducible sampling / dataset splits
# --------------------------------------------------------------------------

# Deterministic doc-id bucket in [0, 1000): multiplicative hash, same
# literal formula on both engines (never engine-native hash/rand — a
# training pipeline needs splits that survive re-runs and engine swaps).
# Max intermediate: doc_id * 2654435761 stays < 2^63 for doc_id < 3.4e9.
def _bucket_sql(col: str = "doc_id") -> str:
    return f"(({col} * 2654435761 + 40503) % 1000)"


_BUCKET = _bucket_sql()


def _bucket_col(col: str = "doc_id") -> F.Column:
    return (F.col(col) * F.lit(2654435761) + F.lit(40503)) % 1000


# The 80/10/10 split convention — ONE definition per engine, shared by
# split_train_val_test (doc-keyed) and split_leakage_safe (group-keyed)
# so the split thresholds cannot drift between them.
def _split_case_sql(col: str) -> str:
    return (
        f"CASE WHEN {_bucket_sql(col)} < 800 THEN 'train' "
        f"WHEN {_bucket_sql(col)} < 900 THEN 'val' "
        f"ELSE 'test' END"
    )


def _split_case_col(col: str) -> F.Column:
    b = _bucket_col(col)
    return F.when(b < 800, "train").when(b < 900, "val").otherwise("test")


@query(
    "sample_deterministic",
    oracle=f"""
        SELECT doc_id, {_BUCKET} AS bucket
        FROM documents WHERE {_BUCKET} < 100
    """,
    tags=("sampling", "extension"),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% corpus sample by hash bucket — unlike
    df.sample() this is stable across runs, partitionings, and engines,
    which is what makes eval subsets and ablations comparable. The
    predicate is a pure row-local expression: no shuffle, pushes
    through any upstream projection."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _bucket_col().alias("bucket")).filter(
        F.col("bucket") < 100
    )


@query(
    "split_train_val_test",
    oracle=f"""
        SELECT {_split_case_sql("doc_id")} AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY split
    """,
    tags=("sampling", "extension"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from the same deterministic
    bucket — the split a 100 TB corpus job computes inline (a join
    against a split table would be another shuffle; a hash is free)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", _split_case_col("doc_id"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


# --------------------------------------------------------------------------
# End-to-end curation pipeline (composition capstone)
# --------------------------------------------------------------------------

# SQL mirrors of operators/text.py quality_score / whitespace_token_count
# (same formulas the text_quality_scores / text_token_stats oracles use).
_PUNCT_SQL = (
    "(CASE WHEN length(text) = 0 THEN 0.0 ELSE (length(text) - "
    "length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))) "
    "/ length(text) END)"
)
_STOP_SQL = (
    "(CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) = 0 "
    "THEN 0.0 ELSE len(list_filter(regexp_split_to_array(trim(text), "
    "'\\s+'), w -> list_contains(['the','a','of','and','to','in','is',"
    "'it'], w))) / len(regexp_split_to_array(trim(text), '\\s+')) END)"
)
QUALITY_SQL = (
    f"round((least(length(text) / 200.0, 1.0) + (1.0 - "
    f"least({_PUNCT_SQL} * 4, 1.0)) + least({_STOP_SQL} * 5, 1.0)) "
    f"/ 3.0, 6)"
)
WS_TOKENS_SQL = (
    "(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
    "len(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT"
)


@query(
    "pipeline_curate_corpus",
    oracle=f"""
        WITH RECURSIVE {MINHASH_PAIRS_CTES},
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
                  UNION
                  SELECT doc_b AS src, doc_a AS dst FROM mh_pairs),
        nodes AS (SELECT DISTINCT src AS doc FROM edges),
        reach(doc, lab) AS (
            SELECT doc, doc FROM nodes
            UNION
            SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.doc),
        comp AS (SELECT doc AS doc_id, MIN(lab) AS cluster_id
                 FROM reach GROUP BY doc),
        noncanon AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_id),
        qual AS (SELECT * FROM (SELECT doc_id, text,
                                       {QUALITY_SQL} AS quality
                                FROM documents)
                 WHERE quality >= 0.5),
        keepers AS (SELECT MIN(doc_id) AS doc_id FROM qual
                    GROUP BY md5(text)),
        kept AS (SELECT q.doc_id, q.text, q.quality
                 FROM qual q
                 WHERE q.doc_id IN (SELECT doc_id FROM keepers)
                   AND q.doc_id NOT IN (SELECT doc_id FROM noncanon))
        SELECT CASE WHEN (doc_id * 2654435761 + 40503) % 1000 < 800
                    THEN 'train'
                    WHEN (doc_id * 2654435761 + 40503) % 1000 < 900
                    THEN 'val' ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM({WS_TOKENS_SQL}) AS BIGINT) AS n_tokens,
               ROUND(AVG(quality), 4) AS avg_quality
        FROM kept GROUP BY split
    """,
    tags=("pipeline", "dedup", "sampling", "text", "extension"),
    bench=True,
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition: one DataFrame program running the full
    corpus-curation pass a training pipeline needs — C4-style quality
    filter (>= 0.5) -> exact dedup (min doc_id per md5) -> near-dup
    removal (drop non-canonical members of MinHash connected-components
    clusters) -> deterministic train/val/test split -> per-split doc,
    token, and quality stats. Every stage is a previously-verified
    operator; this query proves they COMPOSE in one lazy plan (the
    cluster step alone materializes, being iterative). The oracle
    recomputes the entire pipeline in SQL, transitive closure included."""
    from mapreduceframework_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    qual = docs.select(
        "doc_id",
        "text",
        X.quality_score(F.col("text")).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    keepers = qual.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("keep_id")
    )
    noncanon = (
        connected_components(
            _minhash_pairs(spark, sf_dir), src="doc_a", dst="doc_b"
        )
        .filter(F.col("id") != F.col("label"))
        .select(F.col("id").alias("doc_id"))
    )
    kept = (
        qual.join(
            keepers, qual.doc_id == keepers.keep_id, "left_semi"
        )
        .join(F.broadcast(noncanon), "doc_id", "left_anti")
    )
    b = (F.col("doc_id") * F.lit(2654435761) + F.lit(40503)) % 1000
    return (
        kept.withColumn(
            "split",
            F.when(b < 800, "train").when(b < 900, "val").otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(X.whitespace_token_count(F.col("text")))
            .cast("long")
            .alias("n_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


_MIX_RATE = """CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 900
                    WHEN CAST(substr(source, 4) AS INT) < 10 THEN 500
                    WHEN CAST(substr(source, 4) AS INT) < 15 THEN 200
                    ELSE 50 END"""


@query(
    "sample_mixture_by_source",
    oracle=f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN {_BUCKET} < {_MIX_RATE}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents
        GROUP BY source
    """,
    tags=("sampling", "extension"),
)
def sample_mixture_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture sampling: each source tier keeps a different
    deterministic fraction (90% / 50% / 20% / 5%) — the up/down
    -weighting step that turns a raw crawl into a training mix. Same
    engine-stable hash bucket as sample_deterministic, so the kept set
    is reproducible across runs, partitionings, and engines, and a
    document's fate is independent of which split/sample query asks.
    Pure row-local expressions: the whole mixture policy costs one
    aggregation shuffle for the report (and ZERO extra shuffles when
    fused into a pipeline as a filter)."""
    docs = load_table(spark, sf_dir, "documents")
    sid = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(sid < 5, 900)
        .when(sid < 10, 500)
        .when(sid < 15, 200)
        .otherwise(50)
    )
    return docs.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(_bucket_col() < rate, 1).otherwise(0)
        ).alias("n_kept"),
    )


@query(
    "quality_report_tables",
    oracle="""
        SELECT 'lineitem' AS tbl,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity IS NULL OR l_extendedprice
                                  IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_required,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                                  OR l_discount < 0 OR l_discount > 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_out_of_range,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                WHERE l_orderkey NOT IN
                      (SELECT o_orderkey FROM orders)) AS n_orphans
        FROM lineitem
        UNION ALL
        SELECT 'orders',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_totalprice IS NULL
                                  OR o_orderdate IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN o_totalprice <= 0
                             THEN 1 ELSE 0 END) AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_custkey NOT IN
                      (SELECT c_custkey FROM customer))
        FROM orders
    """,
    tags=("extension", "quality", "anti"),
)
def quality_report_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality validation report — the pre-flight every ingestion
    pipeline runs before training data is trusted: per table, row
    count, NULLs in required columns, domain-range violations, and
    referential orphans (fact keys with no parent row). Conditional
    aggregates fold the null/range checks into ONE pass per table; the
    orphan checks are broadcast anti joins on the parent key sets —
    at 100 TB each check is one scan plus one key-only anti join, and
    the report is O(tables) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    # Orphan counts stay LAZY single-row frames (no driver-side action
    # inside an operator path — repo guard); each joins back in as a
    # broadcast scalar.
    li_orphans = (
        li.join(
            o.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n_orphans"))
    )
    o_orphans = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n_orphans"))
    )

    li_row = li.agg(
        F.lit("lineitem").alias("tbl"),
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | F.col("l_extendedprice").isNull(),
                1,
            ).otherwise(0)
        ).alias("n_null_required"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50)
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1),
                1,
            ).otherwise(0)
        ).alias("n_out_of_range"),
    ).crossJoin(F.broadcast(li_orphans))
    o_row = o.agg(
        F.lit("orders").alias("tbl"),
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull()
                | F.col("o_orderdate").isNull(),
                1,
            ).otherwise(0)
        ).alias("n_null_required"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("n_out_of_range"),
    ).crossJoin(F.broadcast(o_orphans))
    return li_row.unionByName(o_row)


@query(
    "sample_stratified_exact",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, source, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM ranked WHERE rn <= 40
        GROUP BY source
    """,
    tags=("extension", "sampling", "training-data"),
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT-size sampling: exactly min(40, |stratum|) docs
    per source, chosen by a deterministic hash order (md5 of doc_id,
    ties by doc_id) — the balanced-mix primitive where fractional
    sampling (sample_mixture_by_source) can't guarantee per-stratum
    counts. Engine-stable: no RNG, same selection on every engine and
    every run.

    Scale shape: one hash shuffle on the stratum key + per-partition
    rank — rank is bounded-memory because only rn <= k survives (Spark
    lowers the filter into the window's sort where possible). The
    summary (count, char total, id sum) value-checks the exact member
    set, not just sizes."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


# Per-source target size for frequency-proportional downsampling.
SOURCE_CAP = 120


@query(
    "sample_frequency_downsample",
    oracle=f"""
        WITH c AS (SELECT source, COUNT(*) AS cnt
                   FROM documents GROUP BY source),
        k AS (SELECT d.doc_id, d.source, c.cnt
              FROM documents d JOIN c USING (source)
              WHERE ((('0x' || substring(
                          md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                      % 10000) / CAST(10000 AS DOUBLE))
                    < least(CAST(1 AS DOUBLE),
                            CAST({SOURCE_CAP} AS DOUBLE) / c.cnt))
        SELECT source,
               CAST(MAX(cnt) AS BIGINT) AS n_before,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
        FROM k GROUP BY source
    """,
    tags=("sampling", "extension", "training-data"),
)
def sample_frequency_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-proportional source balancing (the CommonCrawl domain
    -rebalancing shape): count docs per source, then keep each doc with
    probability min(1, CAP/count) — over-represented sources are
    downsampled toward CAP expected docs, rare sources pass untouched.
    Selection is a deterministic md5 unit-hash of doc_id, not an RNG:
    same keep-set on every engine, every run, every retry (the property
    that makes a 100 TB pipeline re-runnable). Emits per-source
    before/after counts plus the kept-id sum (pins exact membership).

    Scale shape vs sample_stratified_exact (the window-rank variant):
    the per-source counts aggregate is O(#sources) rows, broadcast back
    onto the corpus, and the filter is row-local — fully parallel with
    no per-source partition funnel, which is what you want when one
    domain is 10% of the crawl."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("cnt"))
    unit = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10000
    ) / F.lit(10000).cast("double")
    keep_prob = F.least(F.lit(1.0), F.lit(SOURCE_CAP) / F.col("cnt"))
    kept = d.join(F.broadcast(counts), "source").filter(unit < keep_prob)
    return kept.groupBy("source").agg(
        F.max("cnt").alias("n_before"),
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("kept_id_sum"),
    )


TEMP_TARGET = 250  # expected docs kept by the temperature mixture


@query(
    "sample_temperature_mixture",
    oracle=f"""
        WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt,
                          CAST(ROUND(sqrt(COUNT(*)) * 1000000) AS BIGINT)
                              AS w_e6
                   FROM documents GROUP BY lang),
        w AS (SELECT CAST(SUM(w_e6) AS BIGINT) AS tot_e6 FROM c),
        k AS (SELECT d.doc_id, d.lang, c.cnt, c.w_e6
              FROM documents d JOIN c USING (lang), w
              WHERE ((('0x' || substring(
                          md5('t' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                          ::BIGINT % 10000) / CAST(10000 AS DOUBLE))
                    < least(CAST(1 AS DOUBLE),
                            CAST({TEMP_TARGET} * c.w_e6 AS DOUBLE)
                                / CAST(w.tot_e6 * c.cnt AS DOUBLE)))
        SELECT lang,
               CAST(MAX(cnt) AS BIGINT) AS n_before,
               CAST(MAX(w_e6) AS BIGINT) AS w_e6,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
        FROM k GROUP BY lang
    """,
    tags=("sampling", "extension", "training-data"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (alpha = 0.5): keep each
    document with probability proportional to count^(alpha-1), i.e.
    language share ~ sqrt(count) — the standard multilingual-LM recipe
    (mBERT/XLM-R exponent-smoothed sampling) that lifts low-resource
    languages without flattening the mixture entirely. Here: en (218
    docs at sf0.01) is downsampled hardest, fr/de/es/zh least.

    Cross-engine float contract: sqrt is IEEE-correctly-rounded in both
    engines, but SUMMING the raw sqrt weights would be summation-order
    dependent — so each weight snaps to exact 1e-6-unit BIGINTs first
    and the normalizer is an exact integer SUM; the keep probability is
    then ONE double division of identical exact integers. Selection is
    the deterministic salted md5 unit-hash (no RNG; 't' salt
    decorrelates from sample_frequency_downsample's keep-set).

    Scale shape: identical to frequency downsampling — O(#langs)
    weight table broadcast onto the corpus, row-local filter, no
    per-lang partition funnel."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(
        F.count("*").alias("cnt"),
        F.round(F.sqrt(F.count("*")) * 1_000_000)
        .cast("long")
        .alias("w_e6"),
    )
    tot = c.agg(F.sum("w_e6").alias("tot_e6"))
    unit = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("t"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    ) / F.lit(10000).cast("double")
    keep_prob = F.least(
        F.lit(1.0),
        (F.lit(TEMP_TARGET) * F.col("w_e6")).cast("double")
        / (F.col("tot_e6") * F.col("cnt")).cast("double"),
    )
    kept = (
        d.join(F.broadcast(c), "lang")
        .crossJoin(F.broadcast(tot))
        .filter(unit < keep_prob)
    )
    return kept.groupBy("lang").agg(
        F.max("cnt").alias("n_before"),
        F.max("w_e6").alias("w_e6"),
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("kept_id_sum"),
    )


@query(
    "sample_negative_pairs",
    oracle="""
        WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        neg AS (
            SELECT d.doc_id,
                   (d.doc_id * 2654435761 + j.j * 40503) % t.n AS neg_id,
                   j.j AS slot
            FROM documents d CROSS JOIN tot t, range(1, 5) j(j))
        SELECT doc_id, slot, neg_id
        FROM neg WHERE neg_id <> doc_id
    """,
    tags=("sampling", "extension"),
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: every
    anchor document draws 4 pseudo-random negatives from the corpus id
    space via the same multiplicative-hash family the split/sample
    queries use (never engine RNG — pairs survive re-runs, engine
    swaps, and resumable jobs, which is what makes contrastive corpora
    reproducible). Self-collisions drop, so anchors contribute 3-4
    pairs each.

    Scale: the draw is a pure row-local expression over a broadcast
    O(1) corpus count — no join against the corpus at all (negatives
    are materialized as ids; the downstream gather is the usual
    doc_id-keyed equi-join). Contrast with sampling a shuffled copy of
    the corpus, which would cost a full shuffle per epoch."""
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(F.count("*").alias("n"))
    neg = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("slot"),
            F.col("n"),
        )
        .select(
            "doc_id",
            "slot",
            (
                (F.col("doc_id") * 2654435761 + F.col("slot") * 40503)
                % F.col("n")
            ).alias("neg_id"),
        )
    )
    return neg.filter(F.col("neg_id") != F.col("doc_id")).select(
        "doc_id", "slot", "neg_id"
    )


RESERVOIR_K = 3  # docs kept per source by the weighted reservoir


@query(
    "sample_weighted_reservoir",
    oracle=f"""
        WITH c AS (SELECT doc_id, source, n_chars,
                          (('0x' || substring(
                                md5('r' || CAST(doc_id AS VARCHAR)), 1, 8))
                               ::BIGINT % 10000 + 1) AS k
                   FROM documents WHERE n_chars > 0),
        s AS (SELECT doc_id, source, n_chars,
                     CAST(ROUND(ln(k / 10001.0) * 1000000) AS BIGINT)
                         AS ln_key_e6
              FROM c),
        r AS (SELECT doc_id, source, n_chars, ln_key_e6,
                     ROW_NUMBER() OVER (
                         PARTITION BY source
                         ORDER BY CAST(ln_key_e6 AS DOUBLE) / n_chars DESC,
                                  doc_id) AS rk
              FROM s)
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
               ln_key_e6, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= {RESERVOIR_K}
    """,
    tags=("sampling", "extension", "training-data"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per source, by the
    Efraimidis–Spirakis (2006) reservoir: each item draws u in (0,1)
    and the k largest keys u^(1/w) win — here w = n_chars, so long
    documents are proportionally likelier but never certain. Ordering
    by u^(1/w) is ordering by ln(u)/w, which is what both engines
    compare.

    Cross-engine float contract, proven exhaustively: u is the salted
    md5 unit-hash over a 10,000-value grid ((h % 10000 + 1)/10001 — the
    'r' salt decorrelates from the other sampling keep-sets, and the +1
    keeps ln away from 0), so ln has exactly 10,000 possible inputs;
    tests/test_sampling_semantics.py asserts Spark and DuckDB agree on
    CAST(ROUND(ln(u)*1e6) AS BIGINT) for ALL of them (they do — ln
    differences of 1 ulp sit ~1e5x below the nearest rounding
    boundary; the division that follows is exact-int-to-double, IEEE
    -identical). The divisor must be an explicit DOUBLE cast: a
    10001.0 literal parses as DECIMAL on Spark and the decimal
    quotient ROUNDS (1/10001 -> 0.0001 exactly — off by 1e-8, which
    moved ln by 1e-4).

    Scale shape: the rank window partitions by source, but rk <= k
    lowers to WindowGroupLimit (asserted in tests/test_plans.py), so
    every map task pre-trims to k rows per source before the shuffle —
    the exchange carries O(k x tasks) rows per source and the final
    per-source sort is reservoir-sized, not corpus-sized. That is the
    distributed reservoir-merge property that makes E-S the standard
    cluster algorithm for weighted sampling."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    k = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("r"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000
        + 1
    )
    ln_key = F.round(
        F.log(k / F.lit(10001).cast("double")) * 1_000_000
    ).cast("long")
    s = d.select("doc_id", "source", "n_chars", ln_key.alias("ln_key_e6"))
    w = Window.partitionBy("source").orderBy(
        F.desc(F.col("ln_key_e6").cast("double") / F.col("n_chars")),
        F.asc("doc_id"),
    )
    return (
        s.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select(
            "source",
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            "ln_key_e6",
            F.col("rk").cast("long").alias("rk"),
        )
    )


DSIR_BUCKETS = 8192
DSIR_TOPK = 100


@query(
    "sample_importance_dsir",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id, lang,
                   string_split_regex(trim(text), '[ \t\n\r\f]+') AS ws
            FROM documents WHERE length(trim(text)) > 0
        ),
        feats AS (
            SELECT doc_id, lang,
                   {X.token_bucket_sql('w', 8192)} AS hb
            FROM (
                SELECT doc_id, lang, unnest(ws) AS w FROM toks
                UNION ALL
                SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS w
                FROM toks, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
                WHERE len(ws) >= 2
            )
        ),
        cr AS (SELECT hb, CAST(COUNT(*) AS BIGINT) AS c_raw
               FROM feats GROUP BY hb),
        ct AS (SELECT hb, CAST(COUNT(*) AS BIGINT) AS c_tgt
               FROM feats WHERE lang = 'en' GROUP BY hb),
        model AS (
            SELECT cr.hb,
                   CAST(ROUND(ln((COALESCE(ct.c_tgt, 0) + 1)::DOUBLE)
                              * 1000000) AS BIGINT)
                 - CAST(ROUND(ln((cr.c_raw + 1)::DOUBLE)
                              * 1000000) AS BIGINT) AS w_e6
            FROM cr LEFT JOIN ct USING (hb)
        ),
        scored AS (
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_feats,
                   CAST(SUM(m.w_e6) AS BIGINT) AS sum_w_e6
            FROM feats f JOIN model m USING (hb)
            GROUP BY f.doc_id
        )
        SELECT doc_id, n_feats, sum_w_e6,
               sum_w_e6 / CAST(n_feats * 1000000 AS DOUBLE) AS llr_per_feat
        FROM scored
        ORDER BY llr_per_feat DESC, doc_id
        LIMIT {DSIR_TOPK}
    """,
    tags=("sampling", "extension", "training-data"),
    bench=True,
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): score every raw document by how target-like its hashed
    n-gram features are — the log likelihood ratio between a target
    feature distribution (here the lang='en' slice stands in for the
    curated target corpus) and the raw-corpus distribution — and keep
    the top-K. Features are word unigrams + bigrams pushed through the
    hashing trick (DSIR_BUCKETS=8192 md5 buckets, token_bucket — the SAME
    portable formula as the quality classifier), which is what bounds
    the model at O(buckets) rows INDEPENDENT of corpus vocabulary: the
    bucket-count model broadcasts, so scoring is a map-side join +
    one doc_id aggregation no matter how many tokens the corpus has.

    Contract details: add-1 smoothing keeps every bucket finite;
    ln quantizes to 1e-6-unit BIGINTs BEFORE the subtraction (the
    enumerable-domain discipline — tests/test_sampling_semantics.py
    proves Spark==DuckDB ln_e6 on [1, 200000] and asserts the observed
    bucket counts stay inside that proven domain), so each bucket
    weight and every per-doc sum is exact integer math; the ONLY
    double is one exact-int division per doc (sum_e6 / (n*1e6), IEEE
    -identical operands both engines). The score is the per-feature
    MEAN log-ratio — length normalization that also removes the
    corpus-total normalizer constants, whose ln sits outside the
    proven domain. Selection is deterministic top-K with a doc_id
    tie-break (rank-based, scale-stable — never a score threshold);
    the paper's Gumbel-noise resampling variant maps onto the
    sample_weighted_reservoir machinery with weight = exp(score).

    Scale shape: explode-to-features is row-local; two O(buckets)
    count shuffles train the model; scoring re-shuffles only the
    (doc_id) aggregation; top-K lowers to TakeOrderedAndProject
    (per-partition heaps, never a global sort)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    # NOT gated (r16 A/B, 4 warm reps interleaved): the model count
    # groupBys redistribute right after the feature explode, so a gated
    # round-robin only added an exchange — warm medians 1.43 s ungated
    # vs 1.59 s gated at sf0.1.
    toks = docs.select(
        "doc_id", "lang", F.split(F.trim("text"), r"[ \t\n\r\f]+").alias("ws")
    )
    n = F.size("ws")
    uni = toks.select("doc_id", "lang", F.explode("ws").alias("w"))
    big = (
        toks.filter(n >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, n - 1).alias("w1"),
                    F.slice("ws", 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            "lang",
            F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")).alias("w"),
        )
    )
    feats = uni.unionByName(big).select(
        "doc_id",
        "lang",
        X.token_bucket(F.col("w"), DSIR_BUCKETS).alias("hb"),
    )
    cr = feats.groupBy("hb").agg(F.count("*").alias("c_raw"))
    ct = (
        feats.filter(F.col("lang") == "en")
        .groupBy("hb")
        .agg(F.count("*").alias("c_tgt"))
    )

    def ln_e6(col):
        return F.round(F.log(col.cast("double")) * 1_000_000).cast("long")

    model = cr.join(ct, "hb", "left").select(
        "hb",
        (
            ln_e6(F.coalesce("c_tgt", F.lit(0)) + 1)
            - ln_e6(F.col("c_raw") + 1)
        ).alias("w_e6"),
    )
    scored = (
        feats.join(F.broadcast(model), "hb")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("w_e6").alias("sum_w_e6"))
    )
    return (
        scored.select(
            "doc_id",
            "n_feats",
            "sum_w_e6",
            (F.col("sum_w_e6") / (F.col("n_feats") * F.lit(1_000_000))).alias(
                "llr_per_feat"
            ),
        )
        .orderBy(F.desc("llr_per_feat"), "doc_id")
        .limit(DSIR_TOPK)
    )


@query(
    "split_leakage_safe",
    oracle=f"""
        WITH RECURSIVE {MINHASH_PAIRS_CTES},
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
                  UNION
                  SELECT doc_b AS src, doc_a AS dst FROM mh_pairs),
        nodes AS (SELECT DISTINCT src AS doc FROM edges),
        reach(doc, lab) AS (
            SELECT doc, doc FROM nodes
            UNION
            SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.doc),
        comp AS (SELECT doc AS doc_id, MIN(lab) AS cluster_id
                 FROM reach GROUP BY doc),
        grp AS (SELECT d.doc_id,
                       COALESCE(c.cluster_id, d.doc_id) AS group_id
                FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
        SELECT doc_id, group_id,
               {_split_case_sql("group_id")} AS split
        FROM grp
    """,
    tags=("sampling", "dedup", "extension", "training-data"),
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents land
    in the SAME split, so eval can never score a near-copy of a
    training doc (the contamination mechanism Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", §6
    measure). Assignment unit = the MinHash near-dup CLUSTER
    (connected components over the same candidate graph dedup_clusters
    verifies), not the document: every doc hashes its GROUP id
    (cluster label, or its own id when unclustered) through the
    registry's deterministic affine split bucket.

    Scale shape: the CC fixpoint is the already-audited O(diameter)
    min-label propagation over banded candidates; the only addition is
    one left join of the corpus against the O(duplicate docs) label
    table (key-partitioned, AQE-broadcastable at typical dup rates)
    and a row-local hash — no new windows, no global sort. The oracle
    recomputes the clusters via an independent recursive transitive
    closure, so the split respects components is checked end-to-end,
    not assumed."""
    from mapreduceframework_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = _minhash_pairs(spark, sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("id").alias("c_doc_id"), F.col("label").alias("cluster_id")
    )
    grp = docs.join(
        comp, docs.doc_id == F.col("c_doc_id"), "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("group_id"),
    )
    return grp.select(
        "doc_id",
        "group_id",
        _split_case_col("group_id").alias("split"),
    )


SHUFFLE_EPOCHS = 3
SHUFFLE_SHARDS = 16


@query(
    "sample_epoch_shuffle",
    oracle=f"""
        WITH e AS (SELECT unnest(range(0, {SHUFFLE_EPOCHS})) AS epoch),
        k AS (SELECT e.epoch, d.doc_id,
                     (d.doc_id * 2654435761 + e.epoch * 1000003
                      + 40503) % 1000000007 AS kh
              FROM documents d CROSS JOIN e)
        SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
               CAST(kh % {SHUFFLE_SHARDS} AS BIGINT) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY epoch, kh % {SHUFFLE_SHARDS}
                   ORDER BY kh, doc_id) AS BIGINT) AS pos
        FROM k
    """,
    tags=("sampling", "extension", "training-data"),
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-EPOCH global shuffle order — the data-loader
    contract behind "shuffle each epoch, but make every run (and every
    resume) see the identical order". df.sample/shuffle state can't
    give that across engines or restarts; a salted affine hash can:
    epoch e's key for a doc is (doc_id * 2654435761 + e * 1000003 +
    40503) mod P (the registry's _bucket_col constants, epoch-salted),
    shard = key mod {SHUFFLE_SHARDS}, position = rank of (key, doc_id)
    within the (epoch, shard). The emitted (epoch, doc_id, shard, pos)
    manifest IS the shuffle: a reader streams shard files in pos order
    and gets a fresh permutation per epoch with zero RNG state.

    Scale shape: the fan-out is a row-local explode (never a join);
    one rank window per (epoch, shard) — shard count is a knob sized
    to the cluster exactly like pack_token_chunks' shards, so the sort
    is per-shard, not global. At trillion-doc scale reduce doc_id mod
    P BEFORE the multiply (modular arithmetic commutes; the straight
    product overflows int64 past ~3e9 ids — same convention note as
    _bucket_col)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    e = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))
        ).alias("epoch"),
    )
    kh = (
        F.col("doc_id") * F.lit(2654435761)
        + F.col("epoch") * F.lit(1000003)
        + F.lit(40503)
    ) % F.lit(1000000007)
    s = e.select(
        F.col("epoch").cast("long").alias("epoch"), "doc_id", kh.alias("kh")
    ).withColumn("shard", (F.col("kh") % SHUFFLE_SHARDS).cast("long"))
    w = Window.partitionBy("epoch", "shard").orderBy("kh", "doc_id")
    return s.select(
        "epoch",
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
