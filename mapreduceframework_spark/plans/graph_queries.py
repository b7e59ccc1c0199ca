"""Graph analytics queries (SURVEY.md §2.2 ⊕ rows — north-star family).

The reference has no graph surface; its substrate (shuffle-on-key +
full-group reduce, reference JobContext.cpp:80-172) is exactly the
MapReduce dataflow the classic graph algorithms were published on, so
this family is the canonical "what a reference user would build next".
Built here Spark-first: every iteration is a join + partial-aggregated
groupBy that Catalyst pipelines; no driver-side data loops.

The test graph is the TPC-H nation trade graph: a directed edge
(customer nation -> supplier nation) for every distinct trading pair in
orders x lineitem. ~25 nodes and dense cycles at every SF — the graph
SHAPE is fixed while the edge-derivation scan scales with the fact
tables, so the expensive part of the query is exactly the part that
grows to 100 TB.

Cross-engine determinism: PageRank runs in integer micro-units
(operators/graph.py::pagerank_int) — BIGINT sums are associativity-proof
so Spark's partitioned aggregation and DuckDB's serial CTE produce
bit-identical ranks; no float tolerance anywhere in this family.

Scale notes (100 TB):
- Edge derivation is the dominant cost: a star join over the fact table
  then DISTINCT on the pair — one shuffle, map-side partial dedup.
- PageRank iterations shuffle O(edges) each; ranks are O(nodes). On a
  web-scale graph, partition edges by src once (reused every round) and
  checkpoint ranks every ~5 rounds to truncate lineage.
- Triangle counting joins the oriented edge list to itself twice —
  O(sum of deg^2) intermediate. The standard scale trick (orient edges
  low-degree -> high-degree, Suri & Vassilvitskii WWW'11) keeps the
  wedge set near-linear on power-law graphs; noted at the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.operators.graph import pagerank_int
from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table

# Directed trading edges: customer nation name -> supplier nation name,
# one row per distinct pair (self-loops kept — a nation trading with
# itself is a real cycle and both engines agree on it).
TRADE_EDGES_CTE = """
    trade_e AS (
        SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )
"""

PR_SCALE = 10**12
PR_ITERS = 3


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("src"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("dst"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
        .select("src", "dst")
        .distinct()
    )


def _pagerank_oracle_sql() -> str:
    """Unroll PR_ITERS integer-PageRank rounds as DuckDB CTEs.

    The recurrence is the same exact-integer one as pagerank_int:
    r0 = scale // n; s_{t+1}(v) = sum over in-edges of r_t(u) // d(u);
    r_{t+1} = 3*scale // (20*n) + 17*s // 20. All-BIGINT, all-positive,
    so DuckDB floor-division == Spark `div` truncation and the group
    sums are exact — the hash must match bit-for-bit.
    """
    ctes = [
        TRADE_EDGES_CTE,
        "nodes AS (SELECT src AS id FROM trade_e"
        " UNION SELECT dst FROM trade_e)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d"
        " FROM trade_e GROUP BY src)",
        f"r0 AS (SELECT id, CAST({PR_SCALE} AS BIGINT) // n AS rank"
        " FROM nodes CROSS JOIN nn)",
    ]
    for t in range(1, PR_ITERS + 1):
        ctes.append(
            f"s{t} AS (SELECT e.dst AS id, SUM(r.rank // o.d) AS s"
            f" FROM trade_e e JOIN r{t - 1} r ON r.id = e.src"
            " JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{t} AS (SELECT nd.id,"
            f" CAST(CAST({3 * PR_SCALE} AS BIGINT) // (20 * n)"
            f" + COALESCE((17 * s{t}.s) // 20, 0) AS BIGINT) AS rank"
            f" FROM nodes nd CROSS JOIN nn"
            f" LEFT JOIN s{t} ON s{t}.id = nd.id)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, rank FROM r{PR_ITERS}"
    )


@query(
    "graph_pagerank_trade",
    oracle=_pagerank_oracle_sql(),
    tags=("graph", "extension"),
    bench=True,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph, 3 fixed iterations in
    BIGINT micro-units (damping 17/20, teleport 3/20 — exact rationals,
    operators/graph.py::pagerank_int). The oracle unrolls the identical
    integer recurrence as CTEs, so the distributed join-per-round
    fixpoint is checked bit-for-bit against a serial evaluation."""
    return pagerank_int(
        _trade_edges(spark, sf_dir), iterations=PR_ITERS, scale=PR_SCALE
    )


@query(
    "graph_triangle_count",
    oracle=f"""
        WITH {TRADE_EDGES_CTE},
        und AS (SELECT src, dst FROM trade_e WHERE src < dst
                UNION
                SELECT dst AS src, src AS dst FROM trade_e
                WHERE dst < src),
        tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
                FROM und e1
                JOIN und e2 ON e2.src = e1.dst AND e2.dst > e1.dst
                JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT src FROM und UNION SELECT dst FROM und))
                   AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
               triangles
        FROM tri
    """,
    tags=("graph", "extension"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count of the undirected trade graph via the
    oriented-wedge join: edges canonicalized to src < dst, wedges
    e1(a,b) x e2(b,c) with b < c, closed by e3(a,c). Each triangle is
    counted exactly once. n_nodes counts distinct endpoints over BOTH
    columns of the canonicalized edge list — counting src alone misses
    any node that only ever appears as the greater endpoint. At
    power-law scale, orient by degree instead of by id (Suri &
    Vassilvitskii WWW'11) so hub wedge lists stay near-linear; the join
    skeleton is unchanged."""
    e = _trade_edges(spark, sf_dir)
    und = (
        e.filter(F.col("src") < F.col("dst"))
        .union(
            e.filter(F.col("dst") < F.col("src")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.src") == F.col("e1.dst"))
            & (F.col("e2.dst") > F.col("e1.dst")),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count("*").alias("triangles"))
    )
    n_nodes = (
        und.select("src")
        .union(und.select("dst"))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    n_edges = und.agg(F.count("*").alias("n_edges"))
    return (
        F.broadcast(n_nodes)
        .crossJoin(F.broadcast(n_edges))
        .crossJoin(tri)
        .select("n_nodes", "n_edges", "triangles")
    )


@query(
    "graph_degree_stats",
    oracle=f"""
        WITH {TRADE_EDGES_CTE},
        outs AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS out_deg
                 FROM trade_e GROUP BY src),
        ins AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS in_deg
                FROM trade_e GROUP BY dst),
        recip AS (SELECT a.src AS id,
                         CAST(COUNT(*) AS BIGINT) AS reciprocal_deg
                  FROM trade_e a JOIN trade_e b
                  ON b.src = a.dst AND b.dst = a.src AND a.src <> a.dst
                  GROUP BY a.src)
        SELECT COALESCE(o.id, i.id) AS id,
               COALESCE(o.out_deg, 0) AS out_deg,
               COALESCE(i.in_deg, 0) AS in_deg,
               COALESCE(r.reciprocal_deg, 0) AS reciprocal_deg
        FROM outs o
        FULL OUTER JOIN ins i ON i.id = o.id
        LEFT JOIN recip r ON r.id = COALESCE(o.id, i.id)
    """,
    tags=("graph", "extension"),
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree profile of the directed trade graph: out-degree,
    in-degree, and reciprocal degree (partners that trade back,
    self-loops excluded) — the standard first look at any graph, and
    the input to degree-based edge orientation for the triangle pass.
    One groupBy per direction plus a self-join on the reversed pair;
    all partial-aggregated, no driver-side state."""
    e = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    outs = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    ins = e.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_deg")
    )
    a, b = e.alias("a"), e.alias("b")
    recip = (
        a.join(
            b,
            (F.col("b.src") == F.col("a.dst"))
            & (F.col("b.dst") == F.col("a.src"))
            & (F.col("a.src") != F.col("a.dst")),
        )
        .groupBy(F.col("a.src").alias("id"))
        .agg(F.count("*").alias("reciprocal_deg"))
    )
    return (
        outs.join(ins, "id", "full_outer")
        .join(recip, "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("reciprocal_deg", F.lit(0)).alias("reciprocal_deg"),
        )
    )


def pointer_doubling_rounds(max_key: int, fanout: int = 8) -> int:
    """Rounds of pointer doubling needed so every node's pointer
    reaches its root: ceil(log2(max chain depth)), with the depth
    bound computed by EXACT integer division — ``floor(log(k, 8))``
    via float log misclassifies exact powers of the fanout
    (log(4096, 8) -> 3.9999...)."""
    depth_bound, k = 0, int(max_key)
    while k >= fanout:
        k //= fanout
        depth_bound += 1
    rounds = 0
    while (1 << rounds) < depth_bound:
        rounds += 1
    return rounds


def resolve_forest_roots(
    nodes: DataFrame, rounds: int, fanout: int = 8
) -> DataFrame:
    """Pointer doubling over the implicit forest parent(k) = k DIV
    ``fanout``: given a `node` column, return (node, anc, d) with anc
    the ROOT (key < fanout) and d the exact depth, provided 2^rounds
    covers the
    deepest chain (pointer_doubling_rounds). Roots self-loop with
    d = 0, so finished pointers are fixpoints and extra rounds are
    harmless no-ops. Each round: one LEFT equi-join + projection,
    localCheckpoint truncating lineage.

    The join is LEFT, not inner: on a SPARSE node set a pointer can
    reference an ancestor that has no row, and an inner join would
    silently DROP that node (row-count divergence — the same footgun
    class as the simhash empty-token fix). A missing ancestor instead
    terminates the walk: the pointer stays where it is. The rollup
    query's key space (p_partkey) is dense, so every chain there ends
    at a real < 8 root."""
    f = nodes.select(
        "node",
        F.when(F.col("node") >= fanout, F.expr(f"node DIV {int(fanout)}"))
        .otherwise(F.col("node"))
        .alias("anc"),
        F.when(F.col("node") >= fanout, F.lit(1))
        .otherwise(F.lit(0))
        .alias("d"),
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        g = f.select(
            F.col("node").alias("g_node"),
            F.col("anc").alias("g_anc"),
            F.col("d").alias("g_d"),
        )
        f = (
            f.join(g, f["anc"] == g["g_node"], "left")
            .select(
                "node",
                F.coalesce("g_anc", "anc").alias("anc"),
                (F.col("d") + F.coalesce("g_d", F.lit(0))).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    return f


@query(
    "hierarchy_rollup_recursive",
    oracle="""
        WITH RECURSIVE up AS (
            SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth,
                   p_retailprice AS price
            FROM part
            UNION ALL
            SELECT node, cur // 8, depth + 1, price
            FROM up WHERE cur >= 8
        )
        SELECT cur AS root,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               CAST(SUM(CAST(ROUND(price * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS total_retail
        FROM up WHERE cur < 8
        GROUP BY cur
    """,
    tags=("graph", "recursive", "hierarchy", "iterative"),
    bench=True,
)
def hierarchy_rollup_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal + rollup — the WITH RECURSIVE /
    BOM-explosion shape (org charts, category trees, bill-of-materials)
    that no single relational operator covers. The part table is given
    a deterministic forest: parent(k) = k DIV 8, roots are keys < 8
    (~5 levels at sf0.1); each part must find its ROOT ancestor and
    depth, then the rollup reports per-root subtree size, height, and
    retail value.

    The oracle walks the chain one level per recursion step — O(depth)
    self-joins. The engine instead uses POINTER DOUBLING (path
    halving): each round joins the (node -> known-ancestor, hops) map
    to itself so every pointer jumps 2^r levels, reaching all roots in
    ceil(log2(depth)) rounds — 3 joins instead of ~17 for a
    100k-deep chain, the textbook trick for deep hierarchies on
    MapReduce-style engines. Each round is one hash join + projection
    (localCheckpoint truncates lineage, same discipline as
    operators/graph.py); roots self-loop with 0 hops so finished
    pointers are fixpoints. The round count comes from the max key —
    one model-sized scalar collect, not data — via an exact integer
    loop (float log8 would misclassify exact powers of 8).

    Scale shape: per round, one equi-join keyed on the current
    ancestor (shuffle O(nodes)) — no driver-side data, no O(depth)
    sequential dependency; the final rollup is a partial-combined
    groupBy on O(roots) keys."""
    from mapreduceframework_spark.plans.exact import snap_units

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        snap_units("p_retailprice", 100).alias("cents"),
    )
    # max depth: exact integer log8 of the max key (one scalar collect)
    max_key = part.agg(F.max("node")).first()[0]
    f = resolve_forest_roots(part.select("node"),
                             pointer_doubling_rounds(max_key))
    return (
        f.join(part, "node")
        .groupBy(F.col("anc").alias("root"))
        .agg(
            F.count("*").alias("n_parts"),
            F.max("d").cast("long").alias("max_depth"),
            (F.sum("cents") / 100.0).alias("total_retail"),
        )
    )


BFS_ROUNDS = 4


def _bfs_oracle_sql() -> str:
    """Unroll BFS_ROUNDS bounded-BFS rounds as DuckDB CTEs.

    The recurrence matches the engine loop exactly: d0 = 0 at the
    seed (lexicographically smallest node name — deterministic), NULL
    elsewhere; d_{t+1}(v) = LEAST(d_t(v), 1 + min over in-edges (u,v)
    of d_t(u)). Fixed rounds rather than run-to-convergence so parity
    is exact whether or not the frontier has stabilized; all-BIGINT."""
    ctes = [
        TRADE_EDGES_CTE,
        "nodes AS (SELECT src AS id FROM trade_e"
        " UNION SELECT dst FROM trade_e)",
        "seed AS (SELECT MIN(id) AS sid FROM nodes)",
        "d0 AS (SELECT id, CASE WHEN id = sid THEN CAST(0 AS BIGINT)"
        " END AS d FROM nodes CROSS JOIN seed)",
    ]
    for t in range(1, BFS_ROUNDS + 1):
        ctes.append(
            f"f{t} AS (SELECT e.dst AS id, MIN(p.d) + 1 AS nd"
            f" FROM trade_e e JOIN d{t - 1} p"
            " ON p.id = e.src AND p.d IS NOT NULL"
            " GROUP BY e.dst)"
        )
        ctes.append(
            f"d{t} AS (SELECT n.id,"
            f" LEAST(COALESCE(p.d, f{t}.nd), COALESCE(f{t}.nd, p.d)) AS d"
            f" FROM nodes n"
            f" LEFT JOIN d{t - 1} p ON p.id = n.id"
            f" LEFT JOIN f{t} ON f{t}.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, d AS dist FROM d{BFS_ROUNDS}"
    )


@query(
    "graph_bfs_distances",
    oracle=_bfs_oracle_sql(),
    tags=("graph", "iterative", "extension"),
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first search: hop distance from a deterministic
    seed (lexicographically smallest nation) to every node of the
    directed trade graph, frontier expanded a FIXED number of rounds —
    the single-source-shortest-path layer of graph engines, in its
    MapReduce formulation (one min-aggregate join per round). Nodes
    beyond BFS_ROUNDS hops stay NULL; fixing the round count (instead
    of running to convergence) keeps the oracle an exact unroll of the
    identical integer recurrence, converged or not.

    Scale shape: each round is one equi-join of the current distance
    table against the edge list plus a min-aggregate — all partial
    -combined, all integer, localCheckpoint truncating lineage (the
    same iterative-join discipline as pagerank_int and
    resolve_forest_roots). At web scale the frontier join is keyed on
    edge src (partition edges by src once, reuse every round), and
    the round count is the graph's effective diameter."""
    e = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed = nodes.agg(F.min("id").alias("sid"))
    d = (
        nodes.join(F.broadcast(seed))
        .select(
            "id",
            F.when(F.col("id") == F.col("sid"), F.lit(0).cast("long")).alias(
                "d"
            ),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(BFS_ROUNDS):
        frontier = (
            e.join(
                d.filter(F.col("d").isNotNull()).select(
                    F.col("id").alias("src"), "d"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg((F.min("d") + 1).alias("nd"))
        )
        d = (
            d.join(frontier, "id", "left")
            .select(
                "id",
                F.least(
                    F.coalesce("d", "nd"), F.coalesce("nd", "d")
                ).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    return d.select("id", F.col("d").alias("dist"))


# --------------------------------------------------------------------------
# Weighted single-source shortest paths (bounded Bellman-Ford)
# --------------------------------------------------------------------------

SSSP_ROUNDS = 4

TRADE_WEDGES_CTE = """
    trade_w AS (
        SELECT cn.n_name AS src, sn.n_name AS dst,
               CAST(1 + COUNT(*) % 7 AS BIGINT) AS w
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        GROUP BY src, dst
    )
"""


def _trade_wedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted trade edges: per nation pair, cost 1 + (#trades % 7) —
    a deterministic data-derived BIGINT weight (mirrors
    TRADE_WEDGES_CTE; change both together)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("src"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("dst"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
        .groupBy("src", "dst")
        .agg((1 + F.count("*") % 7).cast("long").alias("w"))
    )


def _sssp_oracle_sql() -> str:
    """Unroll SSSP_ROUNDS Bellman-Ford rounds as DuckDB CTEs — the
    same exact-integer recurrence as the engine loop: d0 = 0 at the
    seed, NULL elsewhere; d_{t+1}(v) = LEAST(d_t(v), min over in-edges
    (u, v, w) of d_t(u) + w). All-BIGINT, all-positive."""
    ctes = [
        TRADE_WEDGES_CTE,
        "nodes AS (SELECT src AS id FROM trade_w"
        " UNION SELECT dst FROM trade_w)",
        "seed AS (SELECT MIN(id) AS sid FROM nodes)",
        "d0 AS (SELECT id, CASE WHEN id = sid THEN CAST(0 AS BIGINT)"
        " END AS d FROM nodes CROSS JOIN seed)",
    ]
    for t in range(1, SSSP_ROUNDS + 1):
        ctes.append(
            f"f{t} AS (SELECT e.dst AS id, MIN(p.d + e.w) AS nd"
            f" FROM trade_w e JOIN d{t - 1} p"
            " ON p.id = e.src AND p.d IS NOT NULL"
            " GROUP BY e.dst)"
        )
        ctes.append(
            f"d{t} AS (SELECT n.id,"
            f" LEAST(COALESCE(p.d, f{t}.nd), COALESCE(f{t}.nd, p.d)) AS d"
            f" FROM nodes n"
            f" LEFT JOIN d{t - 1} p ON p.id = n.id"
            f" LEFT JOIN f{t} ON f{t}.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, d AS dist FROM d{SSSP_ROUNDS}"
    )


@query(
    "graph_sssp_weighted",
    oracle=_sssp_oracle_sql(),
    tags=("graph", "iterative", "extension"),
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford: cheapest weighted path cost from a
    deterministic seed (lexicographically smallest nation) to every
    node of the directed trade graph, edge costs derived from the data
    (1 + #trades % 7). The relaxation d_{t+1}(v) = min(d_t(v),
    min_(u,v,w)(d_t(u) + w) runs a FIXED number of rounds — the exact
    unroll the oracle repeats, converged or not; unreached nodes stay
    NULL. This is the weighted generalization of graph_bfs_distances
    (BFS is Bellman-Ford with w ≡ 1) — together with pagerank / label
    propagation / pointer doubling it completes the iterative-join
    family a graph engine runs on the MapReduce substrate.

    Scale shape: identical to BFS — one edge-keyed equi-join + one
    min-aggregate per round, all exact BIGINT, localCheckpoint
    truncating lineage; edges partition by src once and every round
    reuses that layout. Round count = effective diameter; frontier
    stabilizes early on dense graphs like this one."""
    e = _trade_wedges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed = nodes.agg(F.min("id").alias("sid"))
    d = (
        nodes.join(F.broadcast(seed))
        .select(
            "id",
            F.when(F.col("id") == F.col("sid"), F.lit(0).cast("long")).alias(
                "d"
            ),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(SSSP_ROUNDS):
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
        d = (
            d.join(frontier, "id", "left")
            .select(
                "id",
                F.least(
                    F.coalesce("d", "nd"), F.coalesce("nd", "d")
                ).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    return d.select("id", F.col("d").alias("dist"))


# --------------------------------------------------------------------------
# HITS hubs & authorities (fixed rounds, unnormalized exact integers)
# --------------------------------------------------------------------------

HITS_ROUNDS = 2


def _hits_oracle_sql() -> str:
    """Unroll HITS_ROUNDS of the unnormalized HITS recurrence as CTEs:
    a_t(v) = Σ_{u→v} h_{t-1}(u), h_t(u) = Σ_{u→v} a_t(v), h_0 ≡ 1.
    Round 1's authority pass is therefore plain indegree."""
    ctes = [
        "nodes AS (SELECT src AS id FROM trade_e"
        " UNION SELECT dst FROM trade_e)",
        "a1 AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS a"
        " FROM trade_e GROUP BY dst)",
        "h1 AS (SELECT e.src AS id, CAST(SUM(a1.a) AS BIGINT) AS h"
        " FROM trade_e e JOIN a1 ON a1.id = e.dst GROUP BY e.src)",
    ]
    for t in range(2, HITS_ROUNDS + 1):
        ctes.append(
            f"a{t} AS (SELECT e.dst AS id, CAST(SUM(h{t-1}.h) AS BIGINT)"
            f" AS a FROM trade_e e JOIN h{t-1} ON h{t-1}.id = e.src"
            " GROUP BY e.dst)"
        )
        ctes.append(
            f"h{t} AS (SELECT e.src AS id, CAST(SUM(a{t}.a) AS BIGINT)"
            f" AS h FROM trade_e e JOIN a{t} ON a{t}.id = e.dst"
            " GROUP BY e.src)"
        )
    t = HITS_ROUNDS
    return f"""
        WITH {TRADE_EDGES_CTE},
        {", ".join(ctes)}
        SELECT n.id AS nation,
               COALESCE(h{t}.h, 0) AS hub_score,
               COALESCE(a{t}.a, 0) AS auth_score
        FROM nodes n
        LEFT JOIN h{t} ON h{t}.id = n.id
        LEFT JOIN a{t} ON a{t}.id = n.id
    """


@query(
    "graph_hits",
    oracle=_hits_oracle_sql(),
    tags=("graph", "iterative", "extension"),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg's hubs-and-authorities) over the directed trade
    graph, HITS_ROUNDS mutual-reinforcement rounds UNNORMALIZED so the
    whole fixpoint stays in exact BIGINT: with h_0 ≡ 1, every score is
    a path count (a_t = #paths of length 2t-1 ending at v under the
    alternating out/in walk), so skipping the usual L2 normalization
    trades convergence for bit-exact cross-engine checkability — the
    RANKING after any fixed round count is the same as the normalized
    iterate's. Nodes with no qualifying edges surface with score 0
    (the left join), not dropped.

    Scale shape: each half-round is one equi-join of the score table
    (O(nodes), model-sized here; node-partitioned at web scale)
    against the edge list plus a sum-aggregate — identical discipline
    to pagerank_int (partial-agged, integer, localCheckpoint per
    round, edges materialized once and reused every round keyed on
    the join side's column). Scores grow ≤ ×max_degree per
    half-round: 25 nations × 2 rounds tops out ~25⁴ ≈ 4e5 ≪ 2^63;
    at any SF the node set is the fixed 25 nations."""
    e = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    h = nodes.select("id", F.lit(1).cast("long").alias("h"))
    a = None
    for _ in range(HITS_ROUNDS):
        a = (
            e.join(h.select(F.col("id").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("a"))
            .localCheckpoint(eager=False)
        )
        h = (
            e.join(a.select(F.col("id").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("h"))
            .localCheckpoint(eager=False)
        )
    return (
        nodes.join(h, "id", "left")
        .join(a, "id", "left")
        .select(
            F.col("id").alias("nation"),
            F.coalesce("h", F.lit(0)).alias("hub_score"),
            F.coalesce("a", F.lit(0)).alias("auth_score"),
        )
    )


# --------------------------------------------------------------------------
# k-core decomposition (bounded peel rounds over a thresholded graph)
# --------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 3
KCORE_TOP_EDGES = 80  # rank-based sparsification: top pairs by volume

KCORE_UND_CTE = f"""
    pairs AS (
        SELECT cn.n_name AS src, sn.n_name AS dst,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE cn.n_name <> sn.n_name
        GROUP BY 1, 2
        ORDER BY cnt DESC, src, dst LIMIT {KCORE_TOP_EDGES}),
    und AS (SELECT src, dst FROM pairs
            UNION
            SELECT dst AS src, src AS dst FROM pairs)
"""


def _kcore_oracle_sql() -> str:
    """Unroll KCORE_ROUNDS of the peel: deg_r = degree restricted to
    the previous alive set (both endpoints), alive_r = deg_r >= K."""
    ctes = ["a0 AS (SELECT DISTINCT src AS id FROM und)"]
    prev = "a0"
    for r in range(1, KCORE_ROUNDS + 1):
        ctes.append(
            f"d{r} AS (SELECT e.src AS id, CAST(COUNT(*) AS BIGINT)"
            f" AS deg FROM und e JOIN {prev} x ON x.id = e.src"
            f" JOIN {prev} y ON y.id = e.dst GROUP BY e.src)"
        )
        ctes.append(
            f"a{r} AS (SELECT id FROM d{r} WHERE deg >= {KCORE_K})"
        )
        prev = f"a{r}"
    r = KCORE_ROUNDS
    return f"""
        WITH {KCORE_UND_CTE},
        {", ".join(ctes)}
        SELECT n.id AS nation,
               CASE WHEN a.id IS NULL THEN 0 ELSE 1 END AS in_core,
               COALESCE(d.deg, 0) AS deg_last
        FROM a0 n
        LEFT JOIN a{r} a ON a.id = n.id
        LEFT JOIN d{r} d ON d.id = n.id
    """


@query(
    "graph_kcore",
    oracle=_kcore_oracle_sql(),
    tags=("graph", "iterative", "extension"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peel (Seidman 1983; the Batagelj-Zaversnik
    decomposition's distributed form): over the volume-thresholded
    undirected trade graph (top-KCORE_TOP_EDGES pairs by lineitem count — a
    RANK-based cut so the graph's sparsity is scale-stable, then
    symmetrized, self-loops dropped), repeatedly delete nodes with
    degree < k. Fixed peel rounds keep the oracle an exact unroll;
    in_core after round R plus the last-round degree make partial
    convergence itself the checked value. k-core is the standard
    graph-cleanup primitive (spam/bot subgraph trimming, dense-
    community seeding) a trade/interaction graph pipeline runs
    before PageRank-class analytics.

    Scale shape: each round re-derives degrees with two alive-set
    semi-join-shaped equi-joins (edges partition by endpoint — the
    same keyed-iteration discipline as graph_bfs_distances) and one
    partial-agged count; alive sets are node-sized, edges
    materialize once (localCheckpoint) and never re-shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("dst")
    )
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "src", "dst")
        .limit(KCORE_TOP_EDGES)
    )
    und = (
        pairs.select("src", "dst")
        .union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = und.select(F.col("src").alias("id")).distinct().localCheckpoint(
        eager=False
    )
    alive = nodes
    deg = None
    for _ in range(KCORE_ROUNDS):
        deg = (
            und.join(alive.select(F.col("id").alias("src")), "src")
            .join(alive.select(F.col("id").alias("dst")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=False)
        )
        alive = deg.filter(F.col("deg") >= KCORE_K).select("id")
    return (
        nodes.join(alive.withColumn("ic", F.lit(1)), "id", "left")
        .join(deg, "id", "left")
        .select(
            F.col("id").alias("nation"),
            F.coalesce("ic", F.lit(0)).alias("in_core"),
            F.coalesce("deg", F.lit(0)).alias("deg_last"),
        )
    )
