"""Behavioral tests for the extension operators — ground-truth checks
that the oracle-parity harness can't express (parity proves Spark ==
DuckDB; these prove the algorithms do what they claim)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceframework_spark.operators import dedup as D
from mapreduceframework_spark.operators import multimodal as M
from mapreduceframework_spark.operators import text as X
from mapreduceframework_spark.operators import vectors as V


def _doc_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "words", D.words_of(F.col("text"))
    )


BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy cat again and again today"
FAR = "completely different words appear in this unrelated document body"


def test_exact_dedup_groups_duplicates(spark):
    df = _doc_df(spark, [(1, BASE), (2, BASE), (3, FAR)])
    out = D.exact_dedup(df.withColumn("digest", F.md5("text")), ["digest"], "doc_id")
    rows = {r["keeper"]: r["n_copies"] for r in out.collect()}
    assert rows == {1: 2, 3: 1}


def test_ngram_jaccard_orders_near_before_far(spark):
    df = _doc_df(spark, [(1, BASE), (2, NEAR), (3, FAR)])
    sh = df.select("doc_id", D.string_shingles(F.col("words")).alias("s"))
    a, b, c = [
        r["s"] for r in sh.orderBy("doc_id").collect()
    ]
    jac = lambda x, y: len(set(x) & set(y)) / len(set(x) | set(y))
    assert jac(a, b) > 0.5  # one word differs -> most shingles shared
    assert jac(a, c) == 0.0


def test_minhash_lsh_recalls_planted_near_dup(spark):
    """A >0.5-Jaccard pair must collide in >=1 LSH band (b=4, r=2 makes
    this overwhelmingly likely at jac~0.77) and survive verification."""
    df = _doc_df(spark, [(1, BASE), (2, NEAR), (3, FAR)])
    sh = df.select("doc_id", D.hashed_shingles(F.col("words")).alias("hs"))
    sig = sh.select("doc_id", D.minhash_signature(F.col("hs")).alias("sig"))
    bands = sig.select(
        "doc_id", F.explode(D.lsh_band_keys(F.col("sig"))).alias("bk")
    )
    pairs = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.bk") == F.col("y.bk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .collect()
    )
    assert (1, 2) in [tuple(r) for r in pairs]
    assert all(3 not in tuple(r) for r in pairs)


def test_simhash_hamming_close_for_near_dup(spark):
    df = _doc_df(spark, [(1, BASE), (2, NEAR), (3, FAR)])
    sims = {
        r["doc_id"]: r["sim"]
        for r in df.select(
            "doc_id", D.simhash(F.col("words")).alias("sim")
        ).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sims[1], sims[2]) < ham(sims[1], sims[3])


def test_simhash_nibble_bands_pigeonhole(spark):
    """Any pair within Hamming<=3 of a 32-bit simhash shares >=1 of the
    four 8-bit bands — the candidate join cannot miss such a pair."""
    sim_a = 0b1010_1100_0011_0101_1010_1100_0011_0101
    sim_b = sim_a ^ 0b1000_0000_0001_0000_0000_0000_0000_0001  # distance 3
    df = spark.createDataFrame([(sim_a,), (sim_b,)], "sim long")
    bands = df.select(F.explode(D.simhash_nibble_bands(F.col("sim"))).alias("bk"))
    keys = [tuple(r["bk"]) for r in bands.collect()]
    # 8 band entries (4 per doc); a shared (band, key) entry appears twice
    assert len(keys) - len(set(keys)) >= 1


def test_lang_id_marker_argmax(spark):
    df = spark.createDataFrame(
        [
            (1, "the house of the king and a dog"),
            (2, "el rey de la casa y que mas"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", X.lang_id(F.col("text")).alias("lang")).collect()
    }
    assert out == {1: "en", 2: "es", 3: "und"}


def test_rolling_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")], "doc_id long, text string"
    )
    fps = [
        r["fp"]
        for r in df.select(X.rolling_fingerprint(F.col("text")).alias("fp")).collect()
    ]
    assert fps[0] != fps[1]


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>, c array<double>",
    )
    row = df.select(
        V.cosine(F.col("a"), F.col("b")).alias("same"),
        V.cosine(F.col("a"), F.col("c")).alias("orth"),
    ).collect()[0]
    assert row["same"] == pytest.approx(1.0)
    assert row["orth"] == pytest.approx(0.0)


def test_lsh_bucket_groups_identical_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.5] * 8), (2, [0.5] * 8), (3, [-0.5] * 8)],
        "vec_id long, v array<double>",
    )
    buckets = {
        r["vec_id"]: r["b"]
        for r in df.select("vec_id", V.lsh_bucket(F.col("v")).alias("b")).collect()
    }
    assert buckets[1] == buckets[2]
    assert buckets[1] != buckets[3]  # opposite vectors flip every plane


def test_multimodal_codec_seam_raises():
    with pytest.raises(NotImplementedError):
        M.decode_payload(b"\x00", "jpeg")


def test_multimodal_oracle_ascii_assumption(spark, sf_dir):
    """The multimodal oracle equates byte length with char length —
    valid only while the corpus is ASCII. Guard that assumption."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_non_ascii = docs.filter(
        F.length(F.col("text")) != F.octet_length(F.col("text"))
    ).count()
    assert n_non_ascii == 0


def test_decode_features_values(spark):
    df = spark.createDataFrame(
        [(7, "abc", 3)], "doc_id long, text string, n_chars long"
    )
    out = M.decode_features(M.attach_payload(df)).collect()[0]
    assert out["byte_len"] == 3
    assert out["first_byte"] == ord("a")
    assert out["checksum"] == (ord("a") + ord("b") + ord("c")) % 256
    assert out["thumb_w"] == 4  # 3 % 64 + 1


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Measure (not just assume) the LSH recall: same-bucket candidates
    must recover a meaningful fraction of the true top-5 — and every
    pair LSH returns must also appear in the brute-force ranking with
    the identical cosine (it's a subset by construction)."""
    from mapreduceframework_spark.plans.registry import all_queries

    qs = all_queries()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in qs["ann_cosine_bruteforce"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in qs["ann_cosine_lsh"].fn(spark, sf_dir).collect()
    }
    overlap = set(exact) & set(approx)
    recall = len(overlap) / len(exact)
    assert 0.0 < recall <= 1.0
    for pair in overlap:
        assert exact[pair] == approx[pair]  # same fold -> identical cosine


def test_operators_tolerate_empty_input(spark):
    """Every array-expression operator must yield empty/zero results on
    an empty table, not throw (ANSI mode is ON — slice/element_at on
    bad indices would error if the guards were wrong)."""
    empty = spark.createDataFrame([], "doc_id long, text string").withColumn(
        "words", D.words_of(F.col("text"))
    )
    assert (
        empty.select(
            D.string_shingles(F.col("words")),
            D.hashed_shingles(F.col("words")),
            D.simhash(F.col("words")),
            X.rolling_fingerprint(F.col("text")),
            X.lang_id(F.col("text")),
            X.quality_score(F.col("text")),
        ).count()
        == 0
    )


def test_shingle_guards_on_short_docs(spark):
    """Documents shorter than the shingle width produce empty shingle
    sets (slice with negative length would raise under ANSI otherwise)."""
    df = spark.createDataFrame(
        [(1, "one"), (2, "one two"), (3, "one two three")],
        "doc_id long, text string",
    ).withColumn("words", D.words_of(F.col("text")))
    rows = {
        r["doc_id"]: (r["s"], r["h"])
        for r in df.select(
            "doc_id",
            D.string_shingles(F.col("words")).alias("s"),
            D.hashed_shingles(F.col("words")).alias("h"),
        ).collect()
    }
    assert rows[1] == ([], []) and rows[2] == ([], [])
    assert rows[3][0] == ["one two three"] and len(rows[3][1]) == 1


def test_connected_components_topologies(spark):
    """Chain, triangle, and isolated pair must each collapse to their
    min-id label — the chain exercises multi-round propagation."""
    from mapreduceframework_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4-5, triangle 10-11-12 (+chord), pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "src long, dst long",
    )
    labels = {
        r["id"]: r["label"]
        for r in connected_components(edges).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_triangle_count_counts_all_nodes(spark, sf_dir):
    """n_nodes must count BOTH endpoints of the canonicalized edge list.
    The sf0.001 trade graph has 25 nations; counting distinct src alone
    over src<dst edges returned 24 (the greatest nation name never
    appears as src) — the regression this test pins."""
    from mapreduceframework_spark.plans.registry import all_queries

    row = all_queries()["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert row["n_nodes"] == 25


def test_connected_components_diameter_guard(spark):
    """A component whose diameter exceeds max_iter must raise, never
    silently return partial clusters."""
    from mapreduceframework_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(chain, max_iter=2)


def test_frame_sample_shapes(spark):
    """Frame math: 36 bytes -> frames 0,1,2; stride 2 keeps 0 and 2;
    the tail frame is short. Empty docs emit no frames at all."""
    from mapreduceframework_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "a" * 36, 36), (2, "", 0)],
        "doc_id long, text string, n_chars long",
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): (r["frame_bytes"], r["frame_checksum"])
        for r in M.sample_frames(M.attach_payload(df)).collect()
    }
    assert set(rows) == {(1, 0), (1, 2)}
    assert rows[(1, 0)] == (16, (97 * 16) % 256)
    assert rows[(1, 2)] == (4, (97 * 4) % 256)


def test_ann_ivf_is_subset_of_bruteforce_space(spark, sf_dir):
    """Every IVF hit must carry the same cosine the brute-force twin
    assigns that pair — IVF changes the candidate set, never the
    scoring."""
    from mapreduceframework_spark.plans.registry import all_queries

    qs = all_queries()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in qs["ann_cosine_bruteforce"].fn(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in qs["ann_cosine_ivf"].fn(spark, sf_dir).collect()
    }
    overlap = set(exact) & set(ivf)
    assert len(overlap) / len(exact) > 0.3  # probing 3/10 lists
    for pair in overlap:
        assert exact[pair] == ivf[pair]


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """Sketch quantiles (the scale path when exact percentile's
    per-group materialization is too big): approx_percentile at
    accuracy 10000 must land within 1% relative of the exact
    interpolated percentile on this data."""
    from mapreduceframework_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)"
        ).alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("exact"),
    ).first()
    for a, e in zip(row["approx"], row["exact"]):
        assert abs(a - e) / e < 0.01, (a, e)


def test_observation_metrics_single_pass(spark, sf_dir):
    """df.observe(): pipeline counters (rows in / rows kept / revenue)
    collected DURING the one real action — the production observability
    hook; a separate .count() per metric would re-run the pipeline
    (2x scans at 100 TB), and an accumulator double-counts on task
    retry while observed metrics are exactly-once per query."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from mapreduceframework_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("quality")
    kept = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(
                F.when(F.col("l_quantity") > 25, 1).otherwise(0)
            ).alias("rows_kept"),
        )
        .filter(F.col("l_quantity") > 25)
    )
    n_kept = kept.count()
    m = obs.get
    assert m["rows_in"] == li.count()
    assert m["rows_kept"] == n_kept


def test_pagerank_int_matches_hand_computation(spark):
    """One exact-integer iteration on a 3-node cycle-with-chord must
    reproduce the hand-derived BIGINT recurrence; a second run must be
    bit-identical (associativity-proof integer sums)."""
    from mapreduceframework_spark.operators.graph import pagerank_int

    # 1->2, 1->3, 2->3, 3->1 : out-degrees d(1)=2, d(2)=1, d(3)=1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    scale = 10**6
    # r0 = scale//3 = 333333 each. Contributions: node1 gets r0(3)//1;
    # node2 gets r0(1)//2; node3 gets r0(1)//2 + r0(2)//1.
    r0 = scale // 3
    base = 3 * scale // (20 * 3)
    expect = {
        1: base + 17 * (r0 // 1) // 20,
        2: base + 17 * (r0 // 2) // 20,
        3: base + 17 * (r0 // 2 + r0 // 1) // 20,
    }
    got = {
        r["id"]: r["rank"]
        for r in pagerank_int(edges, iterations=1, scale=scale).collect()
    }
    assert got == expect
    rerun = {
        r["id"]: r["rank"]
        for r in pagerank_int(edges, iterations=1, scale=scale).collect()
    }
    assert rerun == got


def test_pagerank_int_sink_node_drops_mass(spark):
    """A sink (no out-edges) still receives rank but leaks its own —
    total mass after one round is strictly below scale, and every node
    keeps at least the teleport floor."""
    from mapreduceframework_spark.operators.graph import pagerank_int

    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    scale = 10**6
    ranks = {
        r["id"]: r["rank"]
        for r in pagerank_int(edges, iterations=1, scale=scale).collect()
    }
    floor = 3 * scale // (20 * 3)
    assert set(ranks) == {1, 2, 3}
    assert ranks[1] == floor and ranks[3] == floor
    assert ranks[2] > floor
    assert sum(ranks.values()) < scale


def test_merge_changes_semantics(spark):
    """MERGE matrix on a 4-key base: untouched passthrough, U replaces,
    D drops, I adds, and an 'I' on an existing key degenerates to
    upsert instead of duplicating the key."""
    from mapreduceframework_spark.operators.cdc import merge_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (5, "e", "I"), (4, "D2", "I")],
        "k long, v string, op string",
    )
    got = {
        r["k"]: r["v"] for r in merge_changes(base, changes, "k").collect()
    }
    assert got == {1: "a", 2: "B", 4: "D2", 5: "e"}


def test_zorder_interleave_known_values(spark):
    """Bit interleave must place x bits at even and y bits at odd
    positions: z(x=1,y=0)=1, z(0,1)=2, z(3,3)=15, z(255,0)=0x5555."""
    from mapreduceframework_spark.plans.lakehouse_queries import _z_expr

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (255, 0)], "x long, y long"
    )
    vals = [
        r["z"]
        for r in df.selectExpr(f"{_z_expr('x', 'y')} AS z")
        .orderBy("x", "y")
        .collect()
    ]
    # rows ordered by (x,y): (0,1), (1,0), (3,3), (255,0)
    assert vals == [2, 1, 15, 0x5555]


# --------------------------------------------------------------------------
# Round-6 additions: substring dedup, hashed classifier, freq downsample
# --------------------------------------------------------------------------


def _write_documents(spark, tmp_path, rows):
    """Materialize a hand-built documents table at load_table's path."""
    df = spark.createDataFrame(
        [
            (i, text, "en", src, len(text))
            for i, text, src in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_substring_chunk_dedup_first_occurrence_wins(spark, tmp_path):
    from mapreduceframework_spark.plans.registry import all_queries

    A = " ".join(f"a{i}" for i in range(8))
    B = " ".join(f"b{i}" for i in range(8))
    C = " ".join(f"c{i}" for i in range(8))
    D8 = " ".join(f"d{i}" for i in range(8))
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, f"{A} {B}", "s"),     # both chunks first occurrences
            (2, f"{A} {C}", "s"),     # A is a dupe of doc 1's chunk
            (3, f"{D8} {D8}", "s"),   # intra-doc repeat: second copy dies
        ],
    )
    out = {
        r["doc_id"]: r
        for r in all_queries()["dedup_substring_chunks"].fn(spark, sf).collect()
    }
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 1)
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (2, 1)
    import hashlib

    assert out[2]["kept_digest"] == hashlib.md5(C.encode()).hexdigest()
    assert out[3]["kept_digest"] == hashlib.md5(D8.encode()).hexdigest()


def test_substring_chunk_dedup_partial_tail_chunk(spark, tmp_path):
    from mapreduceframework_spark.plans.registry import all_queries

    sf = _write_documents(spark, tmp_path, [(1, "one two three", "s")])
    (row,) = all_queries()["dedup_substring_chunks"].fn(spark, sf).collect()
    import hashlib

    assert (row["n_chunks"], row["n_kept"]) == (1, 1)
    assert row["kept_digest"] == hashlib.md5(b"one two three").hexdigest()


def test_quality_classifier_matches_hand_computation(spark, tmp_path):
    from mapreduceframework_spark.plans.registry import all_queries
    import hashlib

    text = "alpha beta gamma alpha"
    sf = _write_documents(spark, tmp_path, [(7, text, "s")])
    (row,) = all_queries()["text_quality_classifier"].fn(spark, sf).collect()

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 32

    expected_total = sum(
        X.CLASSIFIER_WEIGHTS[bucket(t)] for t in text.split()
    )
    assert row["n_tokens"] == 4
    # dyadic weights: the sum is float-exact, so == (not approx) is right
    assert row["score"] == expected_total / 4
    assert row["keep"] == (expected_total >= 0.0)


def test_frequency_downsample_caps_heavy_keeps_light(spark, tmp_path):
    from mapreduceframework_spark.plans.registry import all_queries
    import hashlib

    rows = [(i, f"doc number {i}", "big") for i in range(400)]
    rows += [(1000 + i, f"rare doc {i}", "small") for i in range(5)]
    sf = _write_documents(spark, tmp_path, rows)
    out = {
        r["source"]: r
        for r in all_queries()["sample_frequency_downsample"]
        .fn(spark, sf)
        .collect()
    }
    # light source under the cap: every doc survives
    assert (out["small"]["n_before"], out["small"]["n_kept"]) == (5, 5)

    # heavy source: exact deterministic keep-set, recomputed by hand
    def unit(doc_id: int) -> float:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return (int(h[:8], 16) % 10000) / 10000.0

    expected = [i for i in range(400) if unit(i) < min(1.0, 120.0 / 400)]
    assert out["big"]["n_kept"] == len(expected)
    assert out["big"]["kept_id_sum"] == sum(expected)


def test_bloom_pruning_is_selective_and_transparent(spark, sf_dir):
    """The Bloom pre-filter must actually prune (way fewer fact rows
    than the full table reach the join) — parity already proves it
    never changes the answer."""
    from mapreduceframework_spark.operators import sketches as S
    from mapreduceframework_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    build = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-04-01")
    )
    bits = {
        r["bit"]
        for r in build.select(
            F.explode(S.bloom_bits(F.col("o_orderkey"))).alias("bit")
        )
        .distinct()
        .collect()
    }
    bitmap = [i in bits for i in range(S.BLOOM_BITS)]
    li = load_table(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey")
    ok = None
    for a, b in zip(S.BLOOM_A, S.BLOOM_B):
        hit = F.element_at(
            F.lit(bitmap), (((F.lit(a) * key + F.lit(b)) % S.P % S.BLOOM_BITS) + 1).cast("int")
        )
        ok = hit if ok is None else (ok & hit)
    total = li.count()
    pruned = li.filter(ok).count()
    matched = li.join(build, li.l_orderkey == build.o_orderkey).count()
    assert pruned >= matched          # no false negatives
    assert pruned < 0.2 * total       # the filter actually prunes


def test_ewma_hand_computed_and_single_event_edge(spark, tmp_path):
    from datetime import datetime

    from mapreduceframework_spark.plans.registry import all_queries

    rows = [
        # user 1: values 4, 8, 2 in time order -> s = 4, 6, 4
        (1, datetime(2024, 1, 1, 0, 0), 1, "e", 4.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 5), 1, "e", 8.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 9), 1, "e", 2.0, "{}"),
        # user 2: one event -> ewma is the value itself (empty fold)
        (4, datetime(2024, 1, 1, 1, 0), 2, "e", 7.5, "{}"),
        # user 3: tie on ts broken by event_id: 1.0 then 3.0 -> 2.0
        (5, datetime(2024, 1, 1, 2, 0), 3, "e", 1.0, "{}"),
        (6, datetime(2024, 1, 1, 2, 0), 3, "e", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    # the events loader footer-probes the ts unit; write INT64 micros
    # (INT96, Spark's legacy default, is not a corpus encoding)
    old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "events.parquet")
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old)
    out = {
        r["user_id"]: r
        for r in all_queries()["timeseries_ewma"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1]["ewma"] == 4.0 and out[1]["n_events"] == 3
    assert out[2]["ewma"] == 7.5 and out[2]["n_events"] == 1
    assert out[3]["ewma"] == 2.0 and out[3]["n_events"] == 2


# --------------------------------------------------------------------------
# Round-7 operators: dHash, Poisson bootstrap weights, incremental MV
# --------------------------------------------------------------------------


def test_dhash_brightness_invariance_and_wrap(spark):
    """A constant brightness shift with NO mod-256 wrap leaves the
    difference hash bit-identical; a shift that wraps some pixels may
    flip bits — that wrap sensitivity is exactly what plants the
    near-duplicates multimodal_phash_dedup detects."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def dhash_of(pix, w, h):
        payload = IC.encode_ppm(w, h, bytes(pix))
        df = spark.createDataFrame(
            [(0, bytearray(payload), {"codec": "image/ppm"})],
            "doc_id long, payload binary, meta map<string,string>",
        )
        row = M.dhash_images(df).collect()[0]
        return row["lo"], row["hi"]

    w, h = 9, 8
    base = [(i * 37) % 200 for i in range(w * h * 3)]  # headroom: max 199
    shifted = [(p + 50) % 256 for p in base]  # 199+50 < 256: no wrap
    assert dhash_of(base, w, h) == dhash_of(shifted, w, h)

    wrapping = [(p + 100) % 256 for p in base]  # 199+100 wraps
    assert dhash_of(base, w, h) != dhash_of(wrapping, w, h)


def test_dhash_halves_never_touch_sign_bit(spark):
    """Both halves are unsigned 32-bit values in BIGINTs."""
    from mapreduceframework_spark.operators import imagecodec as IC

    pix = bytes((i * 7 + 13) % 256 for i in range(9 * 8 * 3))
    payload = IC.encode_ppm(9, 8, pix)
    df = spark.createDataFrame(
        [(0, bytearray(payload), {"codec": "image/ppm"})],
        "doc_id long, payload binary, meta map<string,string>",
    )
    row = M.dhash_images(df).collect()[0]
    assert 0 <= row["lo"] < 2**32 and 0 <= row["hi"] < 2**32


def test_poisson_bootstrap_weights_mean_one():
    """The integer-threshold inverse CDF draws Poisson(1)-shaped
    weights: over the full uniform range the mean weight is ~1 and the
    zero-weight fraction is ~e^-1 — the property that makes the
    single-pass bootstrap unbiased."""
    from mapreduceframework_spark.plans.analytics_queries import _POIS_T

    def w(m):
        for k, t in enumerate(_POIS_T):
            if m < t:
                return k
        return 6

    N = 1_000_000
    step = 37  # coprime sample of the uniform range
    draws = [w((i * step) % N) for i in range(N // step)]
    mean = sum(draws) / len(draws)
    assert abs(mean - 1.0) < 0.01
    p0 = draws.count(0) / len(draws)
    assert abs(p0 - 0.367879) < 0.005


def test_incremental_mv_equals_full_recompute(spark, sf_dir):
    """The +1/-1 delta merge must land on exactly the view a full
    recompute over the next snapshot produces — including the
    disappearance of groups whose count reaches zero."""
    from mapreduceframework_spark.plans.lakehouse_queries import (
        lakehouse_incremental_agg,
    )
    from mapreduceframework_spark.sources import load_table

    got = {
        (r["priority"], r["day"]): (r["n_orders"], r["sum_cents"])
        for r in lakehouse_incremental_agg(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    want_df = (
        orders.filter((k % 10 == 0) | ((k % 10 != 0) & (k % 13 != 0)))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
    )
    want = {
        (r["priority"], r["day"]): (r["n"], r["s"]) for r in want_df.collect()
    }
    assert got == want
    assert all(n > 0 for n, _ in got.values())


def test_pq_codebook_seed_fallback_and_self_distance(spark, sf_dir):
    """PQ sanity on the real corpus: (a) every (subspace, code) pair in
    use reconstructs to an 8-wide codeword; (b) a query vector's
    nearest ADC neighbor is never farther than the corpus median — the
    compressed distances preserve coarse geometry."""
    from mapreduceframework_spark.plans.ann_queries import ann_cosine_pq

    out = ann_cosine_pq(spark, sf_dir).collect()
    assert len(out) == 8 * 3  # 8 queries x top-3
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3]
        dists = [r["adist"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert dists == sorted(dists)  # rank order == distance order
        assert all(r["neighbor_id"] != q for r in rows)


def test_sssp_hand_computed_micro_graph(spark):
    """Bellman-Ford relaxation on a 4-node weighted path with a
    shortcut: seed A; A->B w=5, B->C w=1, A->C w=9, C->D w=1. After 4
    rounds: A=0, B=5, C=6 (via B, not the 9-cost shortcut), D=7."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [("A", "B", 5), ("B", "C", 1), ("A", "C", 9), ("C", "D", 1)],
        "src string, dst string, w long",
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    d = nodes.select(
        "id", F.when(F.col("id") == "A", F.lit(0).cast("long")).alias("d")
    )
    for _ in range(4):
        frontier = (
            e.join(
                d.filter(F.col("d").isNotNull()).select(
                    F.col("id").alias("src"), "d"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
        )
        d = d.join(frontier, "id", "left").select(
            "id",
            F.least(F.coalesce("d", "nd"), F.coalesce("nd", "d")).alias("d"),
        )
    got = {r["id"]: r["d"] for r in d.collect()}
    assert got == {"A": 0, "B": 5, "C": 6, "D": 7}


def test_negative_pairs_reproducible_and_self_free(spark, sf_dir):
    """Same draw on two invocations; no anchor ever samples itself;
    every anchor keeps 3 or 4 slots."""
    from mapreduceframework_spark.plans.sampling_queries import (
        sample_negative_pairs,
    )

    a = sorted(map(tuple, sample_negative_pairs(spark, sf_dir).collect()))
    b = sorted(map(tuple, sample_negative_pairs(spark, sf_dir).collect()))
    assert a == b
    assert all(doc != neg for doc, _, neg in a)
    from collections import Counter

    per_anchor = Counter(doc for doc, _, _ in a)
    assert set(per_anchor.values()) <= {3, 4}


def test_target_encoding_excludes_own_row(spark):
    """LOO mean for a 3-row category must be the mean of the OTHER two
    rows; singleton categories yield NULL."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 99.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v = df.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        cents.alias("cents"),
    )
    g = v.groupBy("priority").agg(
        F.sum("cents").alias("s"), F.count("*").alias("n")
    )
    out = v.join(g, "priority").select(
        "o_orderkey",
        F.when(
            F.col("n") > 1,
            (F.col("s") - F.col("cents")) / (100.0 * (F.col("n") - 1)),
        ).alias("enc"),
    )
    got = {r["o_orderkey"]: r["enc"] for r in out.collect()}
    assert got[1] == 25.0 and got[2] == 20.0 and got[3] == 15.0
    assert got[4] is None


def test_incremental_mv_zero_count_group_vanishes(spark):
    """A group whose members are all retracted must disappear from the
    maintained view, not linger with count 0."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("g1", 100), ("g2", 50)], "grp string, cents long"
    )
    mv_old = base.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    delta = spark.createDataFrame(
        [("g2", -1, 50)], "grp string, w int, cents long"
    ).groupBy("grp").agg(
        F.sum("w").alias("d_n"),
        F.sum(F.col("w") * F.col("cents")).alias("d_s"),
    )
    merged = (
        mv_old.join(delta, "grp", "full_outer")
        .select(
            "grp",
            (F.coalesce("n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                "n"
            ),
            (F.coalesce("s", F.lit(0)) + F.coalesce("d_s", F.lit(0))).alias(
                "s"
            ),
        )
        .filter(F.col("n") > 0)
    )
    got = {r["grp"]: (r["n"], r["s"]) for r in merged.collect()}
    assert got == {"g1": (1, 100)}


def test_first_touch_attribution_earliest_wins(spark):
    """Two clicks inside the lookback: the EARLIER one gets the credit;
    a click after the purchase or older than 7 days never matches."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        # (event_id, ts, user_id, type)
        (1, "2024-01-01 10:00:00", 7, "click"),   # earliest in window
        (2, "2024-01-03 10:00:00", 7, "click"),
        (3, "2024-01-05 10:00:00", 7, "purchase"),
        (4, "2024-01-06 10:00:00", 7, "click"),   # after purchase
        (5, "2023-12-20 10:00:00", 7, "click"),   # out of lookback
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    cand = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("p_ts"))
        & (F.col("click_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    got = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("purchase_id", "click_id")
        .collect()
    )
    assert [(r["purchase_id"], r["click_id"]) for r in got] == [(3, 1)]


def test_seasonal_profile_dow_convention(spark, sf_dir):
    """Both engines must emit Sunday=0..Saturday=6 — pin the convention
    with a known date (2024-01-07 was a Sunday)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2024-01-07 12:00:00",), ("2024-01-08 12:00:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    got = [
        r[0]
        for r in df.select((F.dayofweek("ts") - 1).alias("dow"))
        .orderBy("dow")
        .collect()
    ]
    assert got == [0, 1]  # Sunday=0, Monday=1

    import duckdb

    want = duckdb.sql(
        "SELECT EXTRACT(dow FROM TIMESTAMP '2024-01-07 12:00:00'), "
        "EXTRACT(dow FROM TIMESTAMP '2024-01-08 12:00:00')"
    ).fetchall()[0]
    assert list(want) == [0, 1]


def test_association_rules_lift_hand_computed(spark):
    """2 orders, both containing parts (1, 2); part 3 in one order:
    lift(1,2) = (2/2) / ((2/2)*(2/2)) = 1.0; conf(1->2) = 1.0."""
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2)],
        "l_orderkey long, l_partkey long",
    )
    b = li.distinct()
    n_orders = b.select("l_orderkey").distinct().count()
    items = {r["l_partkey"]: r["n"] for r in
             b.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()}
    a, bb = b.alias("a"), b.alias("bb")
    pairs = {
        (r["pa"], r["pb"]): r["n"]
        for r in a.join(
            bb,
            (F.col("a.l_orderkey") == F.col("bb.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("bb.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("bb.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_ab = pairs[(1, 2)]
    lift = n_ab * n_orders / (items[1] * items[2])
    conf = n_ab / items[1]
    assert n_ab == 2 and lift == 1.0 and conf == 1.0


def test_weighted_median_hand_computed(spark):
    """Values 10(w=1), 20(w=2), 30(w=1): total 4, half 2 — cumulative
    weight reaches 2 at value 20. Unweighted median logic would also
    give 20 here, so add a heavy tail: 10(w=5), 20(w=1), 30(w=1):
    half of 7 is 3.5 -> crossed at 10."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def wmedian(rows):
        df = spark.createDataFrame(rows, "g string, cents long, w long")
        w_cum = Window.partitionBy("g").orderBy("cents").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.partitionBy("g")
        cum = df.select(
            "g", "cents",
            F.sum("w").over(w_cum).alias("cw"),
            F.sum("w").over(w_all).alias("tw"),
        )
        out = (
            cum.filter(2 * F.col("cw") >= F.col("tw"))
            .groupBy("g")
            .agg(F.min("cents").alias("m"))
            .collect()
        )
        return {r["g"]: r["m"] for r in out}

    assert wmedian([("a", 10, 1), ("a", 20, 2), ("a", 30, 1)]) == {"a": 20}
    assert wmedian([("b", 10, 5), ("b", 20, 1), ("b", 30, 1)]) == {"b": 10}


def test_cusum_prefix_sum_equals_recursion(spark):
    """The prefix-sum representation must equal the literal recursion
    S_i = max(0, S_{i-1} + y_i) on a sequence that resets to zero in
    the middle (the case where a plain running max of prefix sums
    would be wrong)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ys = [3, -10, 4, 2, -1, 5]  # resets after the -10
    s = smax = 0
    for y in ys:
        s = max(0, s + y)
        smax = max(smax, s)
    assert (s, smax) == (10, 10)

    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "i long, y long"
    )
    w = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # NB: the running-min window must order by the ORIGINAL sequence
    df2 = df.select("i", F.sum("y").over(w).alias("pf"))
    w2 = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    srows = df2.select(
        "i",
        (
            F.col("pf")
            - F.least(F.lit(0).cast("long"), F.min("pf").over(w2))
        ).alias("s"),
    ).orderBy("i").collect()
    ss = [r["s"] for r in srows]
    assert ss[-1] == 10 and max(ss) == 10


# Round-8 continuation operators: merkle reconcile, delta-join IVM,
# two-path skew join.


def test_merkle_reconcile_drilldown_is_partial(spark, sf_dir):
    """The whole point of the merkle phase split: the drift lands in a
    strict subset of buckets, the digest compare finds EXACTLY that
    subset (no false positives — each flagged bucket really contains a
    changed key), and two identical tables produce zero mismatches."""
    from pyspark.sql import functions as F

    from mapreduceframework_spark.plans.lakehouse_queries import (
        ORDER_COLS,
        RECON_BUCKETS,
        _bucket_digests,
        _mutated_orders,
    )
    from mapreduceframework_spark.sources import load_table

    source = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    target = _mutated_orders(source)
    s, t = _bucket_digests(source).alias("s"), _bucket_digests(target).alias("t")
    mismatched = {
        r["bucket"]
        for r in s.join(t, F.col("s.bucket") == F.col("t.bucket"), "full_outer")
        .filter(
            ~F.col("s.n").eqNullSafe(F.col("t.n"))
            | ~F.col("s.xh").eqNullSafe(F.col("t.xh"))
        )
        .select(F.coalesce("s.bucket", "t.bucket").alias("bucket"))
        .collect()
    }
    # Expected buckets straight from the drift %-patterns.
    k = F.col("o_orderkey")
    max_key = source.agg(F.max("o_orderkey")).collect()[0][0]
    changed = (
        source.filter((k % 997 == 0) | (k % 1499 == 0))
        .select((k % RECON_BUCKETS).alias("b"))
        .unionByName(
            source.filter(k % 1001 == 0).select(
                ((k + max_key + 1) % RECON_BUCKETS).alias("b")
            )
        )
    )
    expected = {r["b"] for r in changed.distinct().collect()}
    assert mismatched == expected
    assert 0 < len(mismatched) < RECON_BUCKETS
    # Clean compare: a table reconciled against itself has no
    # mismatched buckets at all (phase 2 would scan nothing).
    s2, t2 = _bucket_digests(source).alias("s"), _bucket_digests(source).alias("t")
    clean = (
        s2.join(t2, F.col("s.bucket") == F.col("t.bucket"), "full_outer")
        .filter(
            ~F.col("s.n").eqNullSafe(F.col("t.n"))
            | ~F.col("s.xh").eqNullSafe(F.col("t.xh"))
        )
        .count()
    )
    assert clean == 0


def test_incremental_join_equals_full_recompute(spark, sf_dir):
    """Delta-join maintenance must land on exactly the view a full
    re-join + re-aggregate over the next snapshot produces."""
    from pyspark.sql import functions as F

    from mapreduceframework_spark.plans.lakehouse_queries import (
        lakehouse_incremental_join,
    )
    from mapreduceframework_spark.plans.exact import snap_units
    from mapreduceframework_spark.sources import load_table

    got = {
        (r["segment"], r["day"]): (r["n_orders"], r["sum_cents"])
        for r in lakehouse_incremental_join(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("o_orderkey")
    nxt = orders.filter((k % 10 == 0) | ((k % 10 != 0) & (k % 13 != 0)))
    full = (
        nxt.join(cust, nxt.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(snap_units("o_totalprice", 100)).alias("sum_cents"),
        )
    )
    want = {
        (r["segment"], r["day"]): (r["n_orders"], r["sum_cents"])
        for r in full.collect()
    }
    assert got == want


def test_dsir_scores_target_like_docs_higher(spark, tmp_path):
    """DSIR direction check on a corpus where the answer is computable
    by eye: en docs use one vocabulary, de docs a disjoint one. Every
    en feature has c_tgt == c_raw (weight ln(c+1)-ln(c+1) = 0); every
    de feature has c_tgt = 0 (weight -ln(c_raw+1) < 0) — so every
    target-vocabulary doc must strictly outscore every non-target
    doc."""
    from mapreduceframework_spark.plans.registry import all_queries

    rows = [(i, "alpha alif aleph alpha alif", "en") for i in range(10)]
    rows += [(i, "beta bet beth beta bet", "de") for i in range(10, 20)]
    df = spark.createDataFrame(
        [(i, t, lang, "s", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r["llr_per_feat"]
        for r in all_queries()["sample_importance_dsir"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert len(out) == 20
    en_scores = [out[i] for i in range(10)]
    de_scores = [out[i] for i in range(10, 20)]
    assert min(en_scores) > max(de_scores)
    assert all(s == 0.0 for s in en_scores)  # ct == cr exactly


def test_misra_gries_bounds_hold_corpus_wide(spark, sf_dir):
    """The mergeable-summary guarantee the sketch row's docstring
    states: for every reported word, true - Delta <= est <= true, with
    est > 0; and the threshold actually bites at this capacity (the
    corpus vocabulary exceeds MG_CAP, so Delta > 0 — if this ever
    fails, the sketch silently degenerated to exact counting and the
    row stops testing anything)."""
    from mapreduceframework_spark.plans.registry import REGISTRY
    from mapreduceframework_spark.plans import sketch_queries as SQ

    rows = (
        REGISTRY["sketch_topk_misra_gries"].fn(spark, sf_dir).collect()
    )
    assert 0 < len(rows) <= SQ.MG_TOPK
    deltas = {r["err_bound"] for r in rows}
    assert len(deltas) == 1  # one global error bound
    delta = deltas.pop()
    assert delta > 0, "capacity no longer bites — raise vocab or cut MG_CAP"
    for r in rows:
        assert 0 < r["est"] <= r["true_cnt"], r
        assert r["true_cnt"] - r["est"] <= delta, r


def test_misra_gries_summary_is_order_free(spark):
    """The order-free MG construction on a hand corpus: capacity-2
    summaries over one shard of 'a'x5 'b'x3 'c'x2 'd'x1 must subtract
    the 3rd-largest count (2) from every survivor regardless of token
    arrival order — est(a)=3, est(b)=1, c and d vanish, Delta=2."""
    from mapreduceframework_spark.plans import sketch_queries as SQ
    import mapreduceframework_spark.plans.sketch_queries  # noqa: F401

    words = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    for variant, order in (
        ("sorted", sorted(words)),
        ("reversed", sorted(words, reverse=True)),
        ("interleaved", words[::2] + words[1::2]),
    ):
        df = spark.createDataFrame(
            [(0, w) for w in order], "shard long, w string"
        )
        c = df.groupBy("shard", "w").agg(F.count("*").alias("c"))
        rows = sorted(
            (r["w"], r["c"]) for r in c.collect()
        )
        # counts are order-insensitive by construction; apply the same
        # subtract-(m+1)th rule the query uses, m=2
        counts = sorted((n for _, n in rows), reverse=True)
        t = counts[2] if len(counts) > 2 else 0
        summary = {w: n - t for w, n in rows if n > t}
        assert summary == {"a": 3, "b": 1}, variant
        assert t == 2, variant


def test_mann_whitney_matches_reference_formulas(spark, sf_dir):
    """Ground-truth check (the Welch-cross-check discipline): recompute
    U and the tie-corrected z per pair from raw collected values with
    an independent rank-based implementation — the classic midrank
    formula, NOT the histogram/cumulative form the query uses."""
    from collections import Counter

    from mapreduceframework_spark.plans.registry import REGISTRY
    import mapreduceframework_spark.plans.analytics_queries  # noqa: F401

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type", "CAST(ROUND(value * 100) AS BIGINT) AS v"
        )
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["v"])

    got = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["stats_mann_whitney_u"].fn(spark, sf_dir).collect()
    }
    types = sorted(by_type)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            a, b = by_type[ta], by_type[tb]
            na, nb, n = len(a), len(b), len(a) + len(b)
            # Midrank U via sorted merge: U_A = R_A - na(na+1)/2,
            # doubled to stay integral.
            combined = sorted(Counter(a + b).items())
            counts_a = Counter(a)
            rank2 = 0  # 2 * (rank of previous values' end)
            r2a = 0  # 2 * rank sum of sample A
            for v, c in combined:
                # midrank*2 of this tie group = 2*start + (c - 1) + 2
                mid2 = 2 * (rank2 // 2) + c + 1
                r2a += counts_a.get(v, 0) * mid2
                rank2 += 2 * c
            # R_A-based U counts pairs where A EXCEEDS B; the query's
            # u2a counts pairs where A is BELOW B (its cumulative is
            # over A-values less than each B value), so mirror via
            # U + U' = n_a * n_b (doubled here).
            u2a = 2 * na * nb - (r2a - na * (na + 1))
            tie3 = sum(c**3 - c for _, c in combined)
            key = (ta, tb)
            if tie3 >= n**3 - n:
                assert key not in got
                continue
            assert got[key]["u2a"] == u2a, key
            import math

            sigma = math.sqrt(
                (na * nb / 12.0)
                * ((n + 1) - tie3 / (float(n) * (n - 1)))
            )
            z = (u2a - float(na) * nb) / (2.0 * sigma)
            assert abs(got[key]["z_e6"] - round(z * 1e6)) <= 1, key


def test_autocorrelation_matches_textbook_formula(spark, sf_dir):
    """Ground-truth check: recompute every (type, day, lag) ACF with
    the plain float textbook formula (mean-centered products over the
    full-sample variance) from raw collected values — the n^2-scaled
    integer form the query uses must land within 1e-6 of it (rounding
    units), and the emitted row set must be exactly the non-degenerate
    (n > lag, nonconstant) series."""
    from mapreduceframework_spark.plans.registry import REGISTRY
    import mapreduceframework_spark.plans.analytics_queries  # noqa: F401

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type",
            "date_format(ts, 'yyyy-MM-dd') AS day",
            "CAST(ROUND(value * 100) AS BIGINT) AS v",
            "ts",
            "event_id",
        )
        .collect()
    )
    series: dict[tuple, list] = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault((r["event_type"], r["day"]), []).append(r["v"])

    got = {
        (r["event_type"], r["day"], r["lag"]): (r["n"], r["acf_e6"])
        for r in REGISTRY["timeseries_autocorrelation"]
        .fn(spark, sf_dir)
        .collect()
    }
    expected_keys = set()
    for (t, d), xs in series.items():
        n = len(xs)
        m = sum(xs) / n
        den = sum((x - m) ** 2 for x in xs)
        for k in (1, 2, 3):
            if n <= k or den == 0:
                continue
            expected_keys.add((t, d, k))
            num = sum(
                (xs[i] - m) * (xs[i + k] - m) for i in range(n - k)
            )
            r = num / den
            nn, acf_e6 = got[(t, d, k)]
            assert nn == n
            assert abs(acf_e6 - round(r * 1e6)) <= 1, (t, d, k)
    assert set(got) == expected_keys
