"""Probabilistic sketch queries (SURVEY.md §2.2 ⊕ — sketch family).

The reference's unique-key set (reference JobContext.h:78) holds exact
per-key state; these queries are its constant-memory replacements for
100 TB streams: count-min for heavy-hitter counts, Bloom for membership,
KMV for cardinality. Spark only ships HLL, so the other three are built
from plain DataFrame ops (operators/sketches.py).

Everything here is deliberately *deterministic*: the sketches use fixed
explicit hash formulas rendered identically in Spark and DuckDB, so
collisions, overcounts, and false positives — the defining behaviors of
approximate structures — are themselves value-hash-checked across
engines, not waved through with tolerances.

Scale notes (100 TB):
- sketch state is O(d*w) / O(m) / O(k per group) — independent of input
  size; building each is one partial-aggregated shuffle (map-side
  combine collapses partitions to sketch-size before the exchange).
- probes broadcast the sketch (a few KB) against the probe stream —
  never a shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceframework_spark.operators import bucketscan as B
from mapreduceframework_spark.operators import dedup as D
from mapreduceframework_spark.operators import sketches as S
from mapreduceframework_spark.plans.corpus import DOCS_CTE, _docs
from mapreduceframework_spark.plans.exact import snap_units, snap_units_sql
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table
from mapreduceframework_spark.sources.registry import inline_rows_df

KMV_K = 16
HEAVY_MIN = 100  # true-count threshold for the CMS probe set


def _cells_union_sql(src: str, a_b: tuple, mod: int, val: str) -> str:
    """UNION ALL rendering of per-row hash cells (mirrors posexplode
    order: row_id = index into the coefficient tuples)."""
    parts = [
        f"SELECT {i} AS row_id, ({a} * wh + {b}) % {D.P} % {mod} AS col_id,"
        f" {val} FROM {src}"
        for i, (a, b) in enumerate(zip(*a_b))
    ]
    return " UNION ALL ".join(parts)


@query(
    "sketch_countmin_heavy",
    oracle=f"""
        WITH d AS ({DOCS_CTE}),
        w AS (SELECT unnest(words) AS word FROM d),
        wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS true_cnt
               FROM w GROUP BY word),
        wch AS (SELECT word, true_cnt, {D.word_hash_sql("word")} AS wh
                FROM wc),
        cells AS ({_cells_union_sql("wch", (S.CMS_A, S.CMS_B),
                                    S.CMS_WIDTH, "true_cnt")}),
        sketch AS (SELECT row_id, col_id,
                          CAST(SUM(true_cnt) AS BIGINT) AS cell
                   FROM cells GROUP BY row_id, col_id),
        heavy AS (SELECT * FROM wch WHERE true_cnt >= {HEAVY_MIN}),
        hcells AS ({_cells_union_sql("heavy", (S.CMS_A, S.CMS_B),
                                     S.CMS_WIDTH, "word, true_cnt")})
        SELECT h.word, h.true_cnt, MIN(s.cell) AS est_cnt,
               MIN(s.cell) - h.true_cnt AS overcount
        FROM hcells h JOIN sketch s USING (row_id, col_id)
        GROUP BY h.word, h.true_cnt
    """,
    tags=("sketch", "extension"),
)
def sketch_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 256) over document word
    frequencies, then a heavy-hitter probe: for every word with true
    count >= HEAVY_MIN, the CMS estimate (min over rows of the hashed
    cell) and its overcount. CMS guarantees est >= true; the overcount
    column makes collision inflation visible and cross-engine-checked.
    The sketch build is one shuffle to d*w=1024 cells with map-side
    combine — at 100 TB the exchange moves <= 1024 rows per partition
    no matter the corpus size."""
    w = _docs(spark, sf_dir).select(F.explode("words").alias("word"))
    wc = (
        w.groupBy("word")
        .agg(F.count("*").alias("true_cnt"))
        .withColumn("wh", D.word_hash(F.col("word")))
    )
    cells = wc.select(
        F.posexplode(S.cms_cols(F.col("wh"))).alias("row_id", "col_id"),
        "true_cnt",
    )
    sketch = cells.groupBy("row_id", "col_id").agg(
        F.sum("true_cnt").alias("cell")
    )
    heavy = wc.filter(F.col("true_cnt") >= HEAVY_MIN)
    hcells = heavy.select(
        "word",
        "true_cnt",
        F.posexplode(S.cms_cols(F.col("wh"))).alias("row_id", "col_id"),
    )
    return (
        hcells.join(F.broadcast(sketch), ["row_id", "col_id"])
        .groupBy("word", "true_cnt")
        .agg(F.min("cell").alias("est_cnt"))
        .select(
            "word",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
        )
    )


@query(
    "sketch_bloom_probe",
    oracle=f"""
        WITH d AS ({DOCS_CTE}),
        build AS (SELECT DISTINCT unnest(words) AS word FROM d),
        bh AS (SELECT word, {D.word_hash_sql("word")} AS wh FROM build),
        bbits AS (SELECT DISTINCT col_id AS bit FROM
                  ({_cells_union_sql("bh", (S.BLOOM_A, S.BLOOM_B),
                                     S.BLOOM_BITS, "1 AS one")})),
        probe AS (SELECT DISTINCT unnest(
                      regexp_split_to_array(trim(p_name), '\\s+')) AS word
                  FROM part),
        ph AS (SELECT word, {D.word_hash_sql("word")} AS wh FROM probe),
        pcells AS ({_cells_union_sql("ph", (S.BLOOM_A, S.BLOOM_B),
                                     S.BLOOM_BITS, "word")}),
        hits AS (SELECT p.word,
                        CAST(BOOL_AND(b.bit IS NOT NULL) AS BOOLEAN)
                            AS in_bloom
                 FROM pcells p LEFT JOIN bbits b ON b.bit = p.col_id
                 GROUP BY p.word)
        SELECT h.word, h.in_bloom,
               (bh2.word IS NOT NULL) AS is_member,
               (h.in_bloom AND bh2.word IS NULL) AS false_positive
        FROM hits h LEFT JOIN build bh2 ON bh2.word = h.word
    """,
    tags=("sketch", "extension"),
)
def sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (m=4096 bits, k=3) built over the document
    vocabulary, probed with part-name tokens — a disjoint vocabulary,
    so false positives are possible and (with fixed hashes) exactly
    reproducible. Output per probe token: bloom verdict, true
    membership, and the false-positive flag. The bit set is <= m rows
    broadcast to the probe side; at 100 TB the probe is a map-only pass
    (this is the manual form of the runtime bloom-join pruning enabled
    in cluster_conf)."""
    build = (
        _docs(spark, sf_dir)
        .select(F.explode("words").alias("word"))
        .distinct()
    )
    bbits = (
        build.select(
            F.explode(S.bloom_bits(D.word_hash(F.col("word")))).alias("bit")
        )
        .distinct()
    )
    probe = (
        load_table(spark, sf_dir, "part")
        .select(
            F.explode(D.words_of(F.col("p_name"))).alias("word")
        )
        .distinct()
    )
    pcells = probe.select(
        "word",
        F.explode(S.bloom_bits(D.word_hash(F.col("word")))).alias("col_id"),
    )
    hits = (
        pcells.join(
            F.broadcast(bbits), pcells.col_id == bbits.bit, "left"
        )
        .groupBy("word")
        .agg(F.min(F.col("bit").isNotNull()).alias("in_bloom"))
    )
    member = build.withColumnRenamed("word", "mword")
    return (
        hits.join(
            F.broadcast(member), hits.word == member.mword, "left"
        )
        .select(
            "word",
            "in_bloom",
            F.col("mword").isNotNull().alias("is_member"),
            (F.col("in_bloom") & F.col("mword").isNull()).alias(
                "false_positive"
            ),
        )
    )


@query(
    "sketch_kmv_distinct",
    oracle=f"""
        WITH d AS (SELECT source,
                          regexp_split_to_array(trim(text), '\\s+') AS words
                   FROM documents WHERE length(trim(text)) > 0),
        sw AS (SELECT DISTINCT source, unnest(words) AS word FROM d),
        sh AS (SELECT DISTINCT source,
                      {S.kmv_hash_sql(D.word_hash_sql("word"))} AS h
               FROM sw),
        ranked AS (SELECT source, h,
                          ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY h) AS rn
                   FROM sh),
        nh AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_hashes
               FROM sh GROUP BY source),
        kth AS (SELECT source, h AS h_k FROM ranked WHERE rn = {KMV_K}),
        exact AS (SELECT source, CAST(COUNT(DISTINCT word) AS BIGINT)
                             AS exact_words
                  FROM sw GROUP BY source)
        SELECT e.source, e.exact_words,
               CAST(COALESCE(CAST({(KMV_K - 1) * D.P} AS BIGINT) // k.h_k,
                             n.n_hashes) AS BIGINT) AS est_distinct
        FROM exact e
        JOIN nh n ON n.source = e.source
        LEFT JOIN kth k ON k.source = e.source
    """,
    tags=("sketch", "extension"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values, k=16) distinct-count estimate per document
    source vs the exact count. est = (k-1)*P // h_k where h_k is the
    k-th smallest distinct hash; groups with fewer than k hashes fall
    back to their exact hash count (both engines agree). Integer
    division keeps the estimate bit-exact. KMV state is O(k) per group
    and merges by keeping the k smallest of a union — the property that
    lets 1000 executors sketch partitions independently."""
    # sw is O(sources x vocabulary) — tiny — and feeds FOUR consumers
    # (sketch build, both exact-join sides, sizes); materialize it once
    # instead of re-expanding the corpus scan under each (static plan
    # measured 16 exchanges without the checkpoints, 8 with).
    sw = (
        _docs(spark, sf_dir)
        .select("source", F.explode("words").alias("word"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sh = sw.select(
        "source", S.kmv_hash(D.word_hash(F.col("word"))).alias("h")
    ).distinct()
    ranked = sh.withColumn(
        "rn", F.row_number().over(Window.partitionBy("source").orderBy("h"))
    )
    nh = sh.groupBy("source").agg(F.count("*").alias("n_hashes"))
    kth = ranked.filter(F.col("rn") == KMV_K).select(
        "source", F.col("h").alias("h_k")
    )
    exact = sw.groupBy("source").agg(
        F.countDistinct("word").alias("exact_words")
    )
    return (
        exact.join(nh, "source")
        .join(kth, "source", "left")
        .select(
            "source",
            "exact_words",
            F.coalesce(
                # BIGINT `div`, never float `/` + cast: double rounding
                # near an integer boundary would drift off the oracle's
                # exact floor division.
                F.expr(f"CAST({(KMV_K - 1) * D.P} AS BIGINT) div h_k"),
                F.col("n_hashes"),
            ).alias("est_distinct"),
        )
    )


# Mergeable Misra-Gries / SpaceSaving summary parameters. CAP = 8 is
# deliberately SMALLER than the corpus vocabulary (~31 words) so the
# subtraction/error path is genuinely exercised — with CAP >= |vocab|
# the sketch degenerates to exact counts and the contract checks
# nothing.
MG_SHARDS = 8
MG_CAP = 8
MG_TOPK = 10


@query(
    "sketch_topk_misra_gries",
    oracle=f"""
        WITH d AS ({DOCS_CTE}),
        tok AS (SELECT doc_id % {MG_SHARDS} AS shard, unnest(words) AS w
                FROM d),
        c AS (SELECT shard, w, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY shard, w),
        r AS (SELECT shard, w, c,
                     ROW_NUMBER() OVER (PARTITION BY shard
                                        ORDER BY c DESC, w) AS rn
              FROM c),
        thr AS (SELECT shard,
                       COALESCE(MAX(CASE WHEN rn = {MG_CAP + 1} THEN c END),
                                0) AS t
                FROM r GROUP BY shard),
        summ AS (SELECT c.shard, c.w, c.c - thr.t AS est_p
                 FROM c JOIN thr USING (shard) WHERE c.c > thr.t),
        delta AS (SELECT CAST(SUM(t) AS BIGINT) AS err_bound FROM thr),
        g AS (SELECT w, CAST(SUM(est_p) AS BIGINT) AS est
              FROM summ GROUP BY w),
        topk AS (SELECT w, est FROM g ORDER BY est DESC, w LIMIT {MG_TOPK}),
        tru AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS true_cnt
                FROM tok WHERE w IN (SELECT w FROM topk) GROUP BY w)
        SELECT topk.w AS word, est, true_cnt,
               (SELECT err_bound FROM delta) AS err_bound
        FROM topk JOIN tru ON topk.w = tru.w
    """,
    tags=("sketch", "extension", "training-data"),
)
def sketch_topk_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k heavy hitters via MERGEABLE Misra-Gries /
    SpaceSaving summaries (Agarwal et al., "Mergeable Summaries", PODS
    '12): each shard builds the canonical ORDER-FREE MG summary of
    capacity m — exact shard counts minus the (m+1)-th largest count,
    keep the positive remainders (at most m survive) — and summaries
    merge by summing remainders. Sequential SpaceSaving is
    order-dependent and therefore not cross-engine checkable; this
    construction yields the SAME summary for any arrival order, so the
    whole sketch (estimates, the error bound, the top-k cut) is
    value-hash-checked, collisions and undercounts included.

    Guarantee (pinned in tests/test_extensions.py): with Delta = sum
    of per-shard subtracted thresholds, every word satisfies
    true - Delta <= est <= true, and any word with true > Delta is
    guaranteed present in some summary. The output carries est,
    true_cnt (computed only for the k winners via a broadcast
    semi-join — a validation column, droppable at scale), and Delta
    as err_bound.

    Scale shape: summary state is O(m) per shard; the shard count here
    is a fixed literal (8) so DuckDB can enumerate it — in
    production it is simply the partition count and the merge runs
    treewise in the same partial-agg shuffle. One keyed shuffle for
    shard counts, an 8-key window over the AGGREGATED count table (not
    raw rows), a broadcast threshold join, one word-keyed merge
    shuffle, TakeOrdered for the cut: never a corpus-wide sort. Delta
    is a model-sized driver scalar (8 longs summed — the
    lakehouse max-key precedent), attached as a literal."""
    tok = _docs(spark, sf_dir).select(
        (F.col("doc_id") % MG_SHARDS).alias("shard"),
        F.explode("words").alias("w"),
    )
    c = tok.groupBy("shard", "w").agg(F.count("*").alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("shard").orderBy(F.desc("c"), "w")
    )
    # The per-shard thresholds are MODEL state (MG_SHARDS longs): one
    # collect job computes them, then they re-enter the returned plan
    # as a folded literal map — the kmeans centroid-digest precedent.
    # Joining the 8-row threshold table instead would re-expand the
    # whole count subtree under the static plan (measured: 13
    # exchanges vs 7 this way).
    thr_rows = (
        c.withColumn("rn", rn)
        .groupBy("shard")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rn") == MG_CAP + 1, F.col("c"))),
                F.lit(0).cast("long"),
            ).alias("t")
        )
        .collect()
    )
    t_of = {int(r["shard"]): int(r["t"]) for r in thr_rows}
    err_bound = sum(t_of.values())
    t_map = F.create_map(
        *[
            x
            for shard, t in t_of.items()
            for x in (F.lit(shard).cast("long"), F.lit(t).cast("long"))
        ]
    )
    t_col = F.coalesce(t_map[F.col("shard")], F.lit(0).cast("long"))
    summ = c.filter(F.col("c") > t_col).select(
        "w", (F.col("c") - t_col).alias("est_p")
    )
    g = summ.groupBy("w").agg(F.sum("est_p").cast("long").alias("est"))
    topk = g.orderBy(F.desc("est"), "w").limit(MG_TOPK)
    tru = (
        tok.join(F.broadcast(topk.select("w")), "w", "left_semi")
        .groupBy("w")
        .agg(F.count("*").alias("true_cnt"))
    )
    return topk.join(tru, "w").select(
        F.col("w").alias("word"),
        "est",
        "true_cnt",
        F.lit(err_bound).cast("long").alias("err_bound"),
    )


@query(
    "sketch_kmv_setops",
    oracle=f"""
        WITH d AS (SELECT source,
                          regexp_split_to_array(trim(text), '\\s+') AS words
                   FROM documents WHERE length(trim(text)) > 0),
        sw AS (SELECT DISTINCT source, unnest(words) AS word FROM d),
        sh AS (SELECT DISTINCT source,
                      {S.kmv_hash_sql(D.word_hash_sql("word"))} AS h
               FROM sw),
        sk AS (SELECT source, list_sort(list(h)) AS full_set
               FROM sh GROUP BY source),
        skk AS (SELECT source, full_set[1:{KMV_K}] AS sk,
                       len(full_set) AS nh
                FROM sk),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   a.sk AS ska, b.sk AS skb, a.nh AS nha, b.nh AS nhb,
                   list_sort(list_distinct(list_concat(a.sk, b.sk)))
                       AS u_all
            FROM skk a JOIN skk b ON a.source < b.source),
        est AS (
            SELECT source_a, source_b,
                   CASE WHEN len(u_all) < {KMV_K} THEN len(u_all)
                        ELSE CAST({(KMV_K - 1) * D.P} AS BIGINT)
                             // u_all[{KMV_K}] END AS est_union,
                   CASE WHEN len(u_all) < {KMV_K}
                        THEN len(list_intersect(ska, skb))
                        ELSE len(list_intersect(
                                 list_intersect(u_all[1:{KMV_K}], ska),
                                 skb))
                             * (CAST({(KMV_K - 1) * D.P} AS BIGINT)
                                // u_all[{KMV_K}]) // {KMV_K} END
                       AS est_inter
            FROM pairs),
        ew AS (SELECT a.source AS source_a, b.source AS source_b,
                      CAST(COUNT(*) AS BIGINT) AS exact_inter
               FROM sw a JOIN sw b
               ON a.word = b.word AND a.source < b.source
               GROUP BY 1, 2),
        sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nw
               FROM sw GROUP BY source)
        SELECT e.source_a, e.source_b,
               CAST(e.est_union AS BIGINT) AS est_union,
               x.nw + y.nw - COALESCE(ew.exact_inter, 0) AS exact_union,
               CAST(e.est_inter AS BIGINT) AS est_inter,
               COALESCE(ew.exact_inter, 0) AS exact_inter
        FROM est e
        JOIN sz x ON x.source = e.source_a
        JOIN sz y ON y.source = e.source_b
        LEFT JOIN ew ON ew.source_a = e.source_a
                    AND ew.source_b = e.source_b
    """,
    tags=("sketch", "extension"),
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA over per-source word sets — the reason
    KMV earns its place in a distributed engine: sketches of disjoint
    corpus slices merge into sketches of unions without touching the
    data again. For every source pair: the union sketch is the k
    smallest of the two sketches' merged hash sets (exactly the
    sketch a treewise merge would produce), est_union the standard
    (k-1)*P // h_k estimator, and est_inter the Jaccard-style rho
    estimator — matches = |union_k ∩ sk_A ∩ sk_B|, est_inter =
    matches * est_union // k (Beyer et al. SIGMOD'07), all in exact
    integer arithmetic. Pairs whose merged sketch holds fewer than k
    hashes are EXACT by construction (both sketches were complete
    sets) and both engines take the same CASE branch. Estimates sit
    beside the exact union/intersection sizes so the error is
    value-checked, not waved through.

    Scale shape: sketches are O(k) per source (the model-sized table
    — 20 sources x 16 hashes); the pair stage is a self-join of that
    tiny table, and the only corpus-sized work is the distinct
    (source, word) projection and the exact-answer join that exists
    purely as the oracle's measuring stick."""
    # sw is O(sources x vocabulary) — tiny — and feeds FOUR consumers
    # (sketch build, both exact-join sides, sizes); materialize it once
    # instead of re-expanding the corpus scan under each (static plan
    # measured 16 exchanges without the checkpoints, 8 with).
    sw = (
        _docs(spark, sf_dir)
        .select("source", F.explode("words").alias("word"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sh = sw.select(
        "source", S.kmv_hash(D.word_hash(F.col("word"))).alias("h")
    ).distinct()
    skk = (
        sh.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("source").orderBy("h")),
        )
        .filter(F.col("rn") <= KMV_K)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
        # 20 rows; checkpointed so the pair self-join's two sides read
        # the built sketches instead of re-running hash+rank+collect.
        .localCheckpoint(eager=False)
    )
    pairs = (
        skk.alias("a")
        .join(skk.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.sk").alias("ska"),
            F.col("b.sk").alias("skb"),
            F.array_sort(
                F.array_union(F.col("a.sk"), F.col("b.sk"))
            ).alias("u_all"),
        )
    )
    matches = F.size(
        F.array_intersect(
            F.array_intersect(F.slice("u_all", 1, KMV_K), F.col("ska")),
            F.col("skb"),
        )
    )
    small = F.size("u_all") < KMV_K
    # Exact BIGINT `div` on both engines (the reco_user_similarity /
    # kmv_distinct discipline) — never floor(double/double), whose
    # rounding could disagree with the oracle's integer `//` at a
    # quotient boundary.
    est = (
        pairs.select(
            "source_a",
            "source_b",
            "ska",
            "skb",
            "u_all",
            F.element_at("u_all", KMV_K).cast("long").alias("kth"),
            matches.cast("long").alias("matches"),
        )
        .withColumn(
            "full_est",
            F.expr(f"CAST({(KMV_K - 1) * D.P} AS BIGINT) div kth"),
        )
        .select(
            "source_a",
            "source_b",
            F.when(small, F.size("u_all").cast("long"))
            .otherwise(F.col("full_est"))
            .alias("est_union"),
            F.when(
                small,
                F.size(F.array_intersect("ska", "skb")).cast("long"),
            )
            .otherwise(F.expr(f"(matches * full_est) div {KMV_K}"))
            .alias("est_inter"),
        )
    )
    ew = (
        sw.alias("x")
        .join(
            sw.alias("y"),
            (F.col("x.word") == F.col("y.word"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
        .agg(F.count("*").alias("exact_inter"))
    )
    sz = sw.groupBy("source").agg(F.count("*").alias("nw"))
    return (
        est.join(
            sz.select(F.col("source").alias("source_a"), F.col("nw").alias("nwa")),
            "source_a",
        )
        .join(
            sz.select(F.col("source").alias("source_b"), F.col("nw").alias("nwb")),
            "source_b",
        )
        .join(ew, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_union",
            (
                F.col("nwa")
                + F.col("nwb")
                - F.coalesce("exact_inter", F.lit(0))
            ).alias("exact_union"),
            "est_inter",
            F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
        )
    )


# --------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) second-frequency-moment sketch
# --------------------------------------------------------------------------

def _ams_cells_sql() -> str:
    """UNION ALL rendering of the per-occurrence AMS sign stream, one
    branch per sketch row (mirrors the posexplode index order)."""
    parts = [
        f"SELECT {i} AS row_id, {S.ams_sign_sql('wh', a, b)} AS sign"
        " FROM whs"
        for i, (a, b) in enumerate(zip(S.AMS_A, S.AMS_B))
    ]
    return " UNION ALL ".join(parts)


@query(
    "sketch_ams_f2",
    oracle=f"""
        WITH d AS ({DOCS_CTE}),
        w AS (SELECT unnest(words) AS word FROM d),
        whs AS (SELECT {D.word_hash_sql("word")} AS wh FROM w),
        cells AS ({_ams_cells_sql()}),
        z AS (SELECT row_id, CAST(SUM(sign) AS BIGINT) AS z_val
              FROM cells GROUP BY row_id),
        est AS (SELECT row_id, z_val, z_val * z_val AS est_f2 FROM z),
        med AS (SELECT list_sort(list(est_f2))[3] AS med_est FROM est),
        truth AS (SELECT CAST(SUM(c * c) AS BIGINT) AS true_f2
                  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c
                        FROM w GROUP BY word))
        SELECT row_id, z_val, est_f2, med_est, true_f2,
               CAST(FLOOR((med_est - true_f2) * 1000000.0 / true_f2)
                    AS BIGINT) AS err_ppm
        FROM est, med, truth
    """,
    tags=("sketch", "extension"),
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment (F2) sketch over the document word
    stream: five ±1 sign rows, Z_r = Σ_occurrences sign_r(word),
    per-row estimate Z_r², final estimate the median of the five —
    the classic tug-of-war sketch (Alon-Matias-Szegedy STOC'96). F2
    = Σ_w count(w)² is the self-join size / repetition energy of the
    stream; the exact value sits beside the estimates and the signed
    median error in ppm so the estimator's variance is itself
    value-checked across engines (same signs → same collisions →
    identical Z, bit for bit).

    Why it earns a distributed slot: unlike count-min (which needs a
    per-cell keyed shuffle), the AMS state is FIVE counters total —
    each partition folds its occurrences into five partial sums
    map-side and the exchange moves 5 longs per partition, making it
    the cheapest possible global statistic at 100 TB (the same
    all-to-one partial-agg shape as a global COUNT). The exact-F2
    branch (one word-keyed shuffle) exists purely as the oracle's
    measuring stick. err_ppm uses FLOOR over double division — the
    engine-identical signed-division convention (BIGINT inputs are
    < 2^53 so the double is exact)."""
    occ = _docs(spark, sf_dir).select(F.explode("words").alias("word"))
    signs = S.ams_signs(D.word_hash(F.col("word")))
    z = (
        occ.select(F.posexplode(signs).alias("row_id", "sign"))
        .groupBy("row_id")
        .agg(F.sum("sign").alias("z_val"))
    )
    est = z.withColumn("est_f2", F.col("z_val") * F.col("z_val"))
    med = est.agg(
        F.sort_array(F.collect_list("est_f2")).getItem(2).alias("med_est")
    )
    truth = (
        occ.groupBy("word")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("true_f2"))
    )
    return (
        est.join(F.broadcast(med))
        .join(F.broadcast(truth))
        .select(
            "row_id",
            "z_val",
            "est_f2",
            "med_est",
            "true_f2",
            F.floor(
                (F.col("med_est") - F.col("true_f2"))
                * F.lit(1000000.0)
                / F.col("true_f2")
            )
            .cast("long")
            .alias("err_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Mergeable quantile sketch (deterministic one-level KLL compaction)
# --------------------------------------------------------------------------

KLLQ_SHARDS = 16   # B: independent per-shard summaries, merged by union
KLLQ_STRIDE = 25   # C: keep every C-th within-shard rank, weight C
KLLQ_PCTS = (50, 90, 99)
# Rank-error guarantee, proven in the docstring: the estimate's true
# rank lies within tau +/- 2*B*(C-1).
KLLQ_SLACK = 2 * KLLQ_SHARDS * (KLLQ_STRIDE - 1)
KLLQ_VB = 500_000  # e4-units per value bucket for the two-phase rank


@query(
    "sketch_quantile_kll",
    oracle=f"""
        WITH ev AS (SELECT event_id AS eid,
                           {{snap}} AS v
                    FROM events
                    WHERE value IS NOT NULL),
        sr AS (SELECT v, eid,
                      ROW_NUMBER() OVER (PARTITION BY eid % {KLLQ_SHARDS}
                                         ORDER BY v, eid) AS rn
               FROM ev),
        kept AS (SELECT v, eid FROM sr WHERE rn % {KLLQ_STRIDE} = 0),
        kr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS r
               FROM kept),
        fr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS r
               FROM ev),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
        kc AS (SELECT CAST(COUNT(*) AS BIGINT) AS kept_cnt FROM kept),
        t AS (SELECT q_pct, n, kept_cnt,
                     CAST((q_pct * n + 99) // 100 AS BIGINT) AS tau
              FROM (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)),
                           (CAST(99 AS BIGINT))) q(q_pct), nn, kc),
        t2 AS (SELECT q_pct, n, tau,
                      LEAST(CAST((tau + {KLLQ_STRIDE - 1})
                                 // {KLLQ_STRIDE} AS BIGINT),
                            kept_cnt) AS k_eff,
                      GREATEST(CAST(1 AS BIGINT),
                               tau - {KLLQ_SLACK}) AS lo_r,
                      LEAST(n, tau + {KLLQ_SLACK}) AS hi_r
               FROM t),
        est AS (SELECT q_pct, v AS est_e4
                FROM kr JOIN t2 ON kr.r = t2.k_eff),
        lo AS (SELECT q_pct, v AS lo_e4
               FROM fr JOIN t2 ON fr.r = t2.lo_r),
        hi AS (SELECT q_pct, v AS hi_e4
               FROM fr JOIN t2 ON fr.r = t2.hi_r)
        SELECT t2.q_pct, n, tau,
               CAST({KLLQ_SLACK} AS BIGINT) AS rank_slack,
               est_e4, lo_e4, hi_e4,
               (est_e4 >= lo_e4 AND est_e4 <= hi_e4) AS within_bound
        FROM t2 JOIN est USING (q_pct) JOIN lo USING (q_pct)
                JOIN hi USING (q_pct)
    """.replace("{snap}", snap_units_sql("value", 10_000)),
    tags=("sketch", "extension", "training-data"),
    bench=True,
)
def sketch_quantile_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch: deterministic one-level KLL/MRL
    compaction (Karnin-Lang-Liberty FOCS'16 with the random coin
    replaced by rank selection; equivalently a one-round
    Manku-Rajagopalan-Lindsay collapse). Each of B = 16 shards
    (eid % B — any partitioning works) summarizes its values by
    keeping every C = 25th element of its sorted order with weight C;
    summaries MERGE BY PLAIN UNION — no re-compaction, no order
    dependence — and a global quantile q is answered by the
    ceil(ceil(q*n)/C)-th smallest kept element (clamped to the last
    kept element when the shard floors make the summary run short).
    Randomized KLL cannot be cross-engine value-checked; this
    deterministic construction yields the identical summary in any
    engine, so the estimates AND the error guarantee are hash-checked
    like the Misra-Gries row, not waved through with tolerances.

    Guarantee carried in the output (within_bound, pinned all-true in
    tests/test_round10_semantics.py): with slack = 2*B*(C-1), the
    estimate lies between the EXACT order statistics at ranks
    tau - slack and tau + slack. Proof sketch: for a kept element at
    merged-summary rank k, each shard contributes C * (its kept
    elements <= v) counted rows, undercounting true <=v rows by at
    most C-1 per shard, so true_rank(est) >= C*k >= tau (un-clamped)
    and >= n - B*(C-1) >= tau - slack (clamped); conversely rows
    strictly below est number < C*k <= tau + C plus at most C-1
    un-kept stragglers per shard, < tau + 2*B*(C-1) total. The lo/hi
    exact order statistics are validation columns (the MG true_cnt
    precedent) — droppable at scale.

    Scale shape: summary size n/C with ONE keyed shuffle to build
    (the (shard, value-bucket) two-phase prefix scan — bucket-local
    row_number + O(buckets) broadcast offsets via earlier_bucket_agg,
    never a 16-reducer funnel); the summary is localCheckpointed
    (model-sized) before fan-out, targets are driver scalars (two
    O(1)-row count jobs — the lakehouse max-key precedent). At 100 TB
    you recurse the same compaction over the n/C summary (KLL's
    levels) instead of ranking it flat; one level keeps this row's
    oracle exact. n, tau, and ranks are exact BIGINTs; v is the
    events-family e4 snap, so every output column is integer or
    boolean — nothing float crosses engines.

    Reference parity: the reference's framework has no quantile
    operator (its unique-key state is exact, reference JobContext.h:78);
    this row is part of the sketch-family extension surface
    (SURVEY.md §2.2 ⊕)."""
    # NULL guard (mirrored in the oracle's WHERE): every rank below
    # orders by v, and Spark windows sort ASC NULLS FIRST while DuckDB
    # sorts NULLS LAST — one NULL value would silently diverge the
    # engines (the degenerate-denominator convention: exclude with the
    # identical exact predicate on both sides, never rely on engine
    # NULL-ordering agreement).
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_id").alias("eid"),
            snap_units("value", 10_000).alias("v"),
        )
    )
    base = ev.select(
        "eid",
        "v",
        (F.col("eid") % KLLQ_SHARDS).alias("shard"),
        F.expr(f"v DIV {KLLQ_VB}").alias("vb"),
    )
    # Per-shard rank = (shard, value-bucket)-local row_number + the sum
    # of earlier buckets' counts (vb is monotone in v, so bucket order
    # then in-bucket (v, eid) order IS the shard's (v, eid) order).
    loc = base.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("shard", "vb").orderBy("v", "eid")
        ),
    )
    # Model-sized (<= shards x buckets rows) and consumed by two plan
    # branches (the shard offsets and the full-table bucket counts) —
    # localCheckpoint so the static plan doesn't re-expand the
    # events aggregation per consumer (the kmeans/MG literal pattern).
    # LAZY checkpoints (r16 optimization): the kept_cnt count below is
    # the first action and materializes bt (via the off broadcast
    # build) and kept in ONE job instead of two eager barriers + the
    # count — and n is summed from the checkpointed bucket counts
    # (exactly COUNT(*) of ev, every non-null row lands in one bucket)
    # instead of a SECOND full events scan.
    bt = (
        base.groupBy("shard", "vb")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    off = B.earlier_bucket_agg(bt, ["shard"], "vb", "cnt", "sum", "off")
    kept = (
        loc.join(F.broadcast(off), ["shard", "vb"])
        .filter((F.col("off") + F.col("rn")) % KLLQ_STRIDE == 0)
        .select("v", "eid", "vb")
        .localCheckpoint(eager=False)  # summary-sized: n/C rows
    )
    # Model-sized driver scalars, mirrored exactly by the oracle's
    # integer arithmetic: Python floor-div on positive BIGINTs ==
    # DuckDB // == Spark DIV.
    kept_cnt = kept.count()
    # coalesce: SUM over zero rows is NULL; the replaced ev.count()
    # returned 0 on an empty events table (unreachable at generated
    # SFs, but the substitution should be total — ADVICE r16).
    n = bt.agg(F.coalesce(F.sum("cnt"), F.lit(0))).first()[0]
    targets = []
    for q in KLLQ_PCTS:
        tau = (q * n + 99) // 100
        k_eff = min((tau + KLLQ_STRIDE - 1) // KLLQ_STRIDE, kept_cnt)
        lo_r = max(1, tau - KLLQ_SLACK)
        hi_r = min(n, tau + KLLQ_SLACK)
        targets.append((q, tau, k_eff, lo_r, hi_r))

    def _ranked(df: DataFrame, bucket_counts: DataFrame) -> DataFrame:
        """Global (v, eid) rank of ``df`` via the value-bucket
        two-phase prefix scan (sort_global_ranked's shape).
        ``bucket_counts`` is the per-vb count table — passed in so the
        full-table ranking reuses the per-(shard, vb) aggregate the
        summary build already pays for instead of re-scanning."""
        rloc = df.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vb").orderBy("v", "eid")),
        )
        roff = B.earlier_bucket_agg(
            bucket_counts, [], "vb", "cnt", "sum", "roff"
        )
        return rloc.join(F.broadcast(roff), "vb").select(
            "v", (F.col("roff") + F.col("rn")).alias("r")
        )

    tdf = inline_rows_df(
        spark,
        [(q, k) for q, _tau, k, _lo, _hi in targets],
        "q_pct long, k_eff long",
    )
    kbt = kept.groupBy("vb").agg(F.count("*").cast("long").alias("cnt"))
    est = _ranked(kept, kbt).join(
        F.broadcast(tdf), F.col("r") == F.col("k_eff")
    ).select("q_pct", F.col("v").alias("est_e4"))
    probe = inline_rows_df(
        spark,
        [(q, "lo", lo) for q, _tau, _k, lo, _hi in targets]
        + [(q, "hi", hi) for q, _tau, _k, _lo, hi in targets],
        "q_pct long, side string, pr long",
    )
    fbt = bt.groupBy("vb").agg(F.sum("cnt").cast("long").alias("cnt"))
    bounds = (
        _ranked(base, fbt)
        .join(F.broadcast(probe), F.col("r") == F.col("pr"))
        .groupBy("q_pct")
        .agg(
            F.max(F.when(F.col("side") == "lo", F.col("v"))).alias("lo_e4"),
            F.max(F.when(F.col("side") == "hi", F.col("v"))).alias("hi_e4"),
        )
    )
    meta = inline_rows_df(
        spark,
        [(q, n, tau) for q, tau, _k, _lo, _hi in targets],
        "q_pct long, n long, tau long",
    )
    return (
        est.join(bounds, "q_pct")
        .join(F.broadcast(meta), "q_pct")
        .select(
            "q_pct",
            "n",
            "tau",
            F.lit(KLLQ_SLACK).cast("long").alias("rank_slack"),
            "est_e4",
            "lo_e4",
            "hi_e4",
            (
                (F.col("est_e4") >= F.col("lo_e4"))
                & (F.col("est_e4") <= F.col("hi_e4"))
            ).alias("within_bound"),
        )
    )


# --------------------------------------------------------------------------
# Two-level KLL: the recursion the one-level docstring promises
# (plans/sketch_queries.py "At 100 TB you recurse the same compaction
# over the n/C summary") exercised as a registered, bound-checked row.
# --------------------------------------------------------------------------

KLL2_B1 = 16  # level-1 shards
KLL2_C1 = 5   # level-1 stride (keep every C1-th, weight C1)
KLL2_B2 = 8   # level-2 shards over the level-1 summary
KLL2_C2 = 5   # level-2 stride (kept weight C1*C2)
KLL2_W = KLL2_C1 * KLL2_C2  # weight of a level-2 kept element
# Composed rank-error guarantee, proven in the docstring:
#   slack2 = C1*C2 + C1 + C1*B2*(C2-1) + B1*(C1-1)
KLL2_SLACK = (
    KLL2_C1 * KLL2_C2
    + KLL2_C1
    + KLL2_C1 * KLL2_B2 * (KLL2_C2 - 1)
    + KLL2_B1 * (KLL2_C1 - 1)
)


@query(
    "sketch_quantile_kll_twolevel",
    oracle=f"""
        WITH ev AS (SELECT event_id AS eid,
                           {{snap}} AS v
                    FROM events
                    WHERE value IS NOT NULL),
        s1 AS (SELECT v, eid,
                      ROW_NUMBER() OVER (PARTITION BY eid % {KLL2_B1}
                                         ORDER BY v, eid) AS rn
               FROM ev),
        k1 AS (SELECT v, eid FROM s1 WHERE rn % {KLL2_C1} = 0),
        s2 AS (SELECT v, eid,
                      ROW_NUMBER() OVER (PARTITION BY eid % {KLL2_B2}
                                         ORDER BY v, eid) AS rn
               FROM k1),
        k2 AS (SELECT v, eid FROM s2 WHERE rn % {KLL2_C2} = 0),
        kr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS r
               FROM k2),
        fr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS r
               FROM ev),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
        kc AS (SELECT CAST(COUNT(*) AS BIGINT) AS kept_cnt FROM k2),
        t AS (SELECT q_pct, n, kept_cnt,
                     CAST((q_pct * n + 99) // 100 AS BIGINT) AS tau
              FROM (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)),
                           (CAST(99 AS BIGINT))) q(q_pct), nn, kc),
        t2 AS (SELECT q_pct, n, tau,
                      LEAST(CAST((tau + {KLL2_W - 1})
                                 // {KLL2_W} AS BIGINT),
                            kept_cnt) AS k_eff,
                      GREATEST(CAST(1 AS BIGINT),
                               tau - {KLL2_SLACK}) AS lo_r,
                      LEAST(n, tau + {KLL2_SLACK}) AS hi_r
               FROM t),
        est AS (SELECT q_pct, v AS est_e4
                FROM kr JOIN t2 ON kr.r = t2.k_eff),
        lo AS (SELECT q_pct, v AS lo_e4
               FROM fr JOIN t2 ON fr.r = t2.lo_r),
        hi AS (SELECT q_pct, v AS hi_e4
               FROM fr JOIN t2 ON fr.r = t2.hi_r)
        SELECT t2.q_pct, n, tau,
               CAST({KLL2_SLACK} AS BIGINT) AS rank_slack,
               est_e4, lo_e4, hi_e4,
               (est_e4 >= lo_e4 AND est_e4 <= hi_e4) AS within_bound
        FROM t2 JOIN est USING (q_pct) JOIN lo USING (q_pct)
                JOIN hi USING (q_pct)
    """.replace("{snap}", snap_units_sql("value", 10_000)),
    tags=("sketch", "extension", "training-data"),
    bench=True,
)
def sketch_quantile_kll_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL deterministic KLL: the multi-level recursion that is
    KLL's actual space story (Karnin-Lang-Liberty FOCS'16 §2 — each
    level compacts the previous level's summary again), exercised as a
    registered row rather than asserted in prose. Level 1 shards the
    data B1 = 16 ways (eid % B1), keeps every C1 = 5th element of each
    shard's (v, eid) order with weight C1; level 2 re-shards the n/C1
    summary B2 = 8 ways and keeps every C2 = 5th kept element, weight
    W = C1*C2 = 25. Summaries at every level MERGE BY PLAIN UNION; a
    global quantile q is answered by the ceil(tau/W)-th smallest
    level-2 kept element (tau = ceil(q*n/100), clamped to the last
    kept element when shard floors run the summary short).

    Composed guarantee carried in the output (within_bound, pinned
    all-true in tests/test_round11_semantics.py at sf0.001/0.01/0.1):
    with slack2 = C1*C2 + C1 + C1*B2*(C2-1) + B1*(C1-1) = {KLL2_SLACK},
    the estimate lies between the EXACT order statistics at ranks
    tau - slack2 and tau + slack2. Proof: for e in the merged level-1
    summary K1 at K1-rank r1, (a) true_rank(e) >= C1*r1 (each of the
    r1 kept-elements <= e testifies to C1 data rows <= e in its
    shard), and (b) data rows strictly below e number <= C1*r1 +
    B1*(C1-1) (a shard with C1 more rows strictly below e than its
    kept-count testifies would contain another kept element < e).
    Applying the same two facts to level 2 over K1: e at K2-rank k2
    has r1 >= C2*k2 and r1 <= C2*k2 + B2*(C2-1) + 1. Composing with
    k2 = ceil(tau/W): true_rank(est) >= W*k2 >= tau, and strictly-below
    <= C1*(C2*k2 + B2*(C2-1) + 1) + B1*(C1-1) <= tau + slack2 - 1.
    Clamped case: W*kept2_cnt >= n - C1*B2*(C2-1) - B1*(C1-1)
    >= tau - slack2 (per-shard floors lose < C-1 per shard per level).
    lo/hi are validation columns (the one-level row's convention) —
    droppable at scale.

    Scale shape: level-1 build is the identical one-keyed-shuffle
    two-phase prefix scan as `sketch_quantile_kll`; every later level
    runs over a summary that is C1x (then C1*C2x) smaller — at 100 TB
    the level-2+ tables are model-sized, so recursion depth costs
    almost nothing while total summary memory stays O(n / prod(C_l)).
    Both levels' summaries are localCheckpointed before fan-out
    (model-sized; the kmeans/MG plan-bloat pattern). All outputs are
    exact BIGINTs/boolean on the events e4 snap — nothing float
    crosses engines.

    Reference parity: sketch-family extension surface (SURVEY.md §2.2
    ⊕); the reference framework (JobContext.h:78) has no quantile
    operator."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_id").alias("eid"),
            snap_units("value", 10_000).alias("v"),
        )
    )
    base = ev.select(
        "eid", "v", F.expr(f"v DIV {KLLQ_VB}").alias("vb")
    )

    def _compact(
        df: DataFrame, shards: int, stride: int
    ) -> tuple[DataFrame, DataFrame]:
        """One KLL compaction level: per-shard (eid % shards) rank by
        (v, eid) via the (shard, value-bucket) two-phase prefix scan,
        keep every stride-th rank. Identical construction at every
        level — the summary it returns is a valid input to itself.
        Also returns the level's per-(shard, vb) count table so callers
        can derive full-input bucket counts from the aggregate this
        build already pays for instead of re-scanning the input (the
        one-level row's documented reuse pattern)."""
        sh = df.withColumn("shard", F.col("eid") % shards)
        loc = sh.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("shard", "vb").orderBy("v", "eid")
            ),
        )
        # LAZY checkpoints (r16): the kept2 count below is the first
        # action and materializes both levels' bt and kept tables in
        # ONE cascaded job instead of four eager barriers.
        bt = (
            sh.groupBy("shard", "vb")
            .agg(F.count("*").cast("long").alias("cnt"))
            .localCheckpoint(eager=False)
        )
        off = B.earlier_bucket_agg(bt, ["shard"], "vb", "cnt", "sum", "off")
        kept = (
            loc.join(F.broadcast(off), ["shard", "vb"])
            .filter((F.col("off") + F.col("rn")) % stride == 0)
            .select("v", "eid", "vb")
            # summary-sized (n/stride of this level's input); consumed
            # by the next level AND (for level 2) two ranking branches.
            .localCheckpoint(eager=False)
        )
        return kept, bt

    kept1, bt1 = _compact(base, KLL2_B1, KLL2_C1)
    kept2, _bt2 = _compact(kept1, KLL2_B2, KLL2_C2)
    # Per-(vb) counts of the FULL table for the lo/hi exact ranking —
    # summed over shards from the level-1 build's checkpointed
    # aggregate, never a second events scan.
    fbt = bt1.groupBy("vb").agg(F.sum("cnt").cast("long").alias("cnt"))

    # Model-sized driver scalars, mirrored exactly by the oracle's
    # integer arithmetic (positive BIGINTs: Python // == DuckDB // ==
    # Spark DIV). kept2.count() is the first action — it materializes
    # the whole lazy-checkpoint chain; n is then summed from the
    # checkpointed level-1 bucket counts (exactly COUNT(*) of ev)
    # instead of a second full events scan (r16).
    kept_cnt = kept2.count()
    # coalesce: total on an empty events table (see the one-level row).
    n = bt1.agg(F.coalesce(F.sum("cnt"), F.lit(0))).first()[0]
    targets = []
    for q in KLLQ_PCTS:
        tau = (q * n + 99) // 100
        k_eff = min((tau + KLL2_W - 1) // KLL2_W, kept_cnt)
        lo_r = max(1, tau - KLL2_SLACK)
        hi_r = min(n, tau + KLL2_SLACK)
        targets.append((q, tau, k_eff, lo_r, hi_r))

    def _ranked(df: DataFrame, bucket_counts: DataFrame) -> DataFrame:
        """Global (v, eid) rank via the value-bucket two-phase prefix
        scan (sort_global_ranked's shape; same helper shape as the
        one-level row)."""
        rloc = df.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vb").orderBy("v", "eid")),
        )
        roff = B.earlier_bucket_agg(
            bucket_counts, [], "vb", "cnt", "sum", "roff"
        )
        return rloc.join(F.broadcast(roff), "vb").select(
            "v", (F.col("roff") + F.col("rn")).alias("r")
        )

    tdf = inline_rows_df(
        spark,
        [(q, k) for q, _tau, k, _lo, _hi in targets],
        "q_pct long, k_eff long",
    )
    kbt = kept2.groupBy("vb").agg(F.count("*").cast("long").alias("cnt"))
    est = _ranked(kept2, kbt).join(
        F.broadcast(tdf), F.col("r") == F.col("k_eff")
    ).select("q_pct", F.col("v").alias("est_e4"))
    probe = inline_rows_df(
        spark,
        [(q, "lo", lo) for q, _tau, _k, lo, _hi in targets]
        + [(q, "hi", hi) for q, _tau, _k, _lo, hi in targets],
        "q_pct long, side string, pr long",
    )
    bounds = (
        _ranked(base, fbt)
        .join(F.broadcast(probe), F.col("r") == F.col("pr"))
        .groupBy("q_pct")
        .agg(
            F.max(F.when(F.col("side") == "lo", F.col("v"))).alias("lo_e4"),
            F.max(F.when(F.col("side") == "hi", F.col("v"))).alias("hi_e4"),
        )
    )
    meta = inline_rows_df(
        spark,
        [(q, n, tau) for q, tau, _k, _lo, _hi in targets],
        "q_pct long, n long, tau long",
    )
    return (
        est.join(bounds, "q_pct")
        .join(F.broadcast(meta), "q_pct")
        .select(
            "q_pct",
            "n",
            "tau",
            F.lit(KLL2_SLACK).cast("long").alias("rank_slack"),
            "est_e4",
            "lo_e4",
            "hi_e4",
            (
                (F.col("est_e4") >= F.col("lo_e4"))
                & (F.col("est_e4") <= F.col("hi_e4"))
            ).alias("within_bound"),
        )
    )


# --------------------------------------------------------------------------
# KLL merge invariance: the mergeability guarantee under REPARTITIONING
# (the VERDICT-r11 optional item: the one-level row claims "any
# partitioning works" — this row value-checks that claim).
# --------------------------------------------------------------------------

KLLM_REHASH = 2_654_435_761  # Knuth multiplicative rehash (public)
KLLM_P = 1_000_003


_KLLM_SHARD_A_SQL = f"eid % {KLLQ_SHARDS}"
_KLLM_SHARD_B_SQL = f"((eid * {KLLM_REHASH}) % {KLLM_P}) % {KLLQ_SHARDS}"


@query(
    "sketch_kll_merge_invariance",
    oracle=f"""
        WITH ev AS (SELECT event_id AS eid,
                           {{snap}} AS v
                    FROM events
                    WHERE value IS NOT NULL),
        sra AS (SELECT v, eid,
                       ROW_NUMBER() OVER (PARTITION BY {_KLLM_SHARD_A_SQL}
                                          ORDER BY v, eid) AS rn
                FROM ev),
        ka AS (SELECT v, eid FROM sra WHERE rn % {KLLQ_STRIDE} = 0),
        srb AS (SELECT v, eid,
                       ROW_NUMBER() OVER (PARTITION BY {_KLLM_SHARD_B_SQL}
                                          ORDER BY v, eid) AS rn
                FROM ev),
        kb AS (SELECT v, eid FROM srb WHERE rn % {KLLQ_STRIDE} = 0),
        kra AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS r
                FROM ka),
        krb AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS r
                FROM kb),
        fr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS r
               FROM ev),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
        kca AS (SELECT CAST(COUNT(*) AS BIGINT) AS kept_a FROM ka),
        kcb AS (SELECT CAST(COUNT(*) AS BIGINT) AS kept_b FROM kb),
        t AS (SELECT q_pct, n, kept_a, kept_b,
                     CAST((q_pct * n + 99) // 100 AS BIGINT) AS tau
              FROM (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)),
                           (CAST(99 AS BIGINT))) q(q_pct), nn, kca, kcb),
        t2 AS (SELECT q_pct, n, tau,
                      LEAST(CAST((tau + {KLLQ_STRIDE - 1})
                                 // {KLLQ_STRIDE} AS BIGINT),
                            kept_a) AS k_eff_a,
                      LEAST(CAST((tau + {KLLQ_STRIDE - 1})
                                 // {KLLQ_STRIDE} AS BIGINT),
                            kept_b) AS k_eff_b,
                      GREATEST(CAST(1 AS BIGINT),
                               tau - {KLLQ_SLACK}) AS lo_r,
                      LEAST(n, tau + {KLLQ_SLACK}) AS hi_r
               FROM t),
        esta AS (SELECT q_pct, v AS est_a_e4
                 FROM kra JOIN t2 ON kra.r = t2.k_eff_a),
        estb AS (SELECT q_pct, v AS est_b_e4
                 FROM krb JOIN t2 ON krb.r = t2.k_eff_b),
        lo AS (SELECT q_pct, v AS lo_e4
               FROM fr JOIN t2 ON fr.r = t2.lo_r),
        hi AS (SELECT q_pct, v AS hi_e4
               FROM fr JOIN t2 ON fr.r = t2.hi_r)
        SELECT t2.q_pct, n, tau,
               CAST({KLLQ_SLACK} AS BIGINT) AS rank_slack,
               est_a_e4, est_b_e4, lo_e4, hi_e4,
               (est_a_e4 >= lo_e4 AND est_a_e4 <= hi_e4) AS within_a,
               (est_b_e4 >= lo_e4 AND est_b_e4 <= hi_e4) AS within_b
        FROM t2 JOIN esta USING (q_pct) JOIN estb USING (q_pct)
                JOIN lo USING (q_pct) JOIN hi USING (q_pct)
    """.replace("{snap}", snap_units_sql("value", 10_000)),
    tags=("sketch", "extension", "training-data"),
)
def sketch_kll_merge_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY under repartitioning, value-checked: the
    one-level KLL summary (B = 16 shards, stride C = 25, identical
    construction to `sketch_quantile_kll`) is built TWICE over the
    same events — once sharded eid % B (the original layout) and once
    sharded by a multiplicative rehash ((eid * 2654435761) % 1000003)
    % B, i.e. the data redistributed the way a repartition() or an
    executor-count change would redistribute it. The two summaries
    DIFFER (different rows survive each sharding's stride), but the
    rank-error guarantee must not: both estimates of every percentile
    lie within the SAME exact bounds tau ± 2*B*(C-1), carried as
    within_a / within_b booleans the oracle pins alongside the exact
    estimate values.

    This is the property that makes a quantile sketch usable on a
    cluster at all: partial summaries computed under WHATEVER
    partitioning the scheduler produced merge by plain union into a
    bounded-error global answer — the proof (one-level row's
    docstring) counts per shard and never references which rows landed
    where, and this row is that proof exercised as data. A sketch
    whose quality silently depended on the original layout would break
    on every AQE re-plan, skew split, or cluster resize.

    Scale shape: ONE fact scan feeds both builds (shard columns are
    row-local projections of the same base), each build is the
    (shard, value-bucket) two-phase prefix scan of the one-level row,
    and the exact lo/hi bound ranking — the validation-only branch —
    is computed once and shared by both sides. Everything after the
    two n/C-sized summaries is model-sized."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_id").alias("eid"),
            snap_units("value", 10_000).alias("v"),
        )
    )
    base = ev.select(
        "eid",
        "v",
        (F.col("eid") % KLLQ_SHARDS).alias("sa"),
        (
            (F.col("eid") * KLLM_REHASH) % KLLM_P % KLLQ_SHARDS
        ).alias("sb"),
        F.expr(f"v DIV {KLLQ_VB}").alias("vb"),
        # Lazy since r16: localCheckpoint wraps the plan in a
        # lineage-truncating LogicalRDD for eager AND lazy alike (the
        # earlier 44-vs-22-exchange measurement conflated this with a
        # no-checkpoint variant; the r16 SHUFFLE_BUDGET run confirms
        # the lazy static plan stays truncated), so the eager job
        # barrier bought nothing — the first count below materializes
        # base for all five consumer branches.
    ).localCheckpoint(eager=False)

    def build_summary(shard_col: str) -> tuple[DataFrame, DataFrame]:
        """(kept-summary, per-(shard, vb) count table) under the given
        sharding — the sketch_quantile_kll build with the shard column
        as a parameter (kept separate from that row's body so the
        registered query's definition stays untouched). The count
        table is returned so the bounds ranking can derive full-table
        vb counts from it instead of re-aggregating the n-row base
        (the one-level row's review-finding discipline)."""
        loc = base.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(shard_col, "vb").orderBy("v", "eid")
            ),
        )
        bt = (
            base.groupBy(shard_col, "vb")
            .agg(F.count("*").cast("long").alias("cnt"))
            .localCheckpoint(eager=False)
        )
        off = B.earlier_bucket_agg(bt, [shard_col], "vb", "cnt", "sum", "off")
        kept = (
            loc.join(F.broadcast(off), [shard_col, "vb"])
            .filter((F.col("off") + F.col("rn")) % KLLQ_STRIDE == 0)
            .select("v", "eid", "vb")
            .localCheckpoint(eager=False)  # summary-sized: n/C rows
        )
        return kept, bt

    kept_a, bt_a = build_summary("sa")
    kept_b, _bt_b = build_summary("sb")
    # Count the checkpointed base, not ev — counting ev would re-scan
    # the source parquet through un-checkpointed lineage.
    n = base.count()
    cnt_a = kept_a.count()
    cnt_b = kept_b.count()
    targets = []
    for q in KLLQ_PCTS:
        tau = (q * n + 99) // 100
        k_raw = (tau + KLLQ_STRIDE - 1) // KLLQ_STRIDE
        targets.append(
            (
                q,
                tau,
                min(k_raw, cnt_a),
                min(k_raw, cnt_b),
                max(1, tau - KLLQ_SLACK),
                min(n, tau + KLLQ_SLACK),
            )
        )

    def ranked(df: DataFrame, bucket_counts: DataFrame) -> DataFrame:
        """Global (v, eid) rank via the value-bucket two-phase scan."""
        rloc = df.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vb").orderBy("v", "eid")),
        )
        roff = B.earlier_bucket_agg(
            bucket_counts, [], "vb", "cnt", "sum", "roff"
        )
        return rloc.join(F.broadcast(roff), "vb").select(
            "v", (F.col("roff") + F.col("rn")).alias("r")
        )

    def estimate(kept: DataFrame, k_col: int, out: str) -> DataFrame:
        tdf = inline_rows_df(
            spark, [(t[0], t[k_col]) for t in targets], "q_pct long, k_eff long"
        )
        kbt = kept.groupBy("vb").agg(F.count("*").cast("long").alias("cnt"))
        return (
            ranked(kept, kbt)
            .join(F.broadcast(tdf), F.col("r") == F.col("k_eff"))
            .select("q_pct", F.col("v").alias(out))
        )

    est_a = estimate(kept_a, 2, "est_a_e4")
    est_b = estimate(kept_b, 3, "est_b_e4")
    probe = inline_rows_df(
        spark,
        [(q, "lo", lo) for q, _t, _a, _b, lo, _hi in targets]
        + [(q, "hi", hi) for q, _t, _a, _b, _lo, hi in targets],
        "q_pct long, side string, pr long",
    )
    # Full-table vb counts SUMMED from the checkpointed model-sized
    # (shard, vb) aggregate — one tiny exchange, never a second
    # aggregation over the n-row base (the twolevel row's precedent).
    fbt = bt_a.groupBy("vb").agg(F.sum("cnt").cast("long").alias("cnt"))
    bounds = (
        ranked(base, fbt)
        .join(F.broadcast(probe), F.col("r") == F.col("pr"))
        .groupBy("q_pct")
        .agg(
            F.max(F.when(F.col("side") == "lo", F.col("v"))).alias("lo_e4"),
            F.max(F.when(F.col("side") == "hi", F.col("v"))).alias("hi_e4"),
        )
    )
    meta = inline_rows_df(
        spark,
        [(q, n, tau) for q, tau, _a, _b, _lo, _hi in targets],
        "q_pct long, n long, tau long",
    )
    return (
        est_a.join(est_b, "q_pct")
        .join(bounds, "q_pct")
        .join(F.broadcast(meta), "q_pct")
        .select(
            "q_pct",
            "n",
            "tau",
            F.lit(KLLQ_SLACK).cast("long").alias("rank_slack"),
            "est_a_e4",
            "est_b_e4",
            "lo_e4",
            "hi_e4",
            (
                (F.col("est_a_e4") >= F.col("lo_e4"))
                & (F.col("est_a_e4") <= F.col("hi_e4"))
            ).alias("within_a"),
            (
                (F.col("est_b_e4") >= F.col("lo_e4"))
                & (F.col("est_b_e4") <= F.col("hi_e4"))
            ).alias("within_b"),
        )
    )
