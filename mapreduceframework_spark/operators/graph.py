"""Connected components over an edge DataFrame — the cluster step of
near-duplicate detection (pairs tell you *that* two docs match; training
-data dedup needs the transitive closure: one canonical doc per cluster).

The reference framework has no graph surface at all; this is north-star
capability (BASELINE.json) built as a driver-side loop of DataFrame
joins: classic min-label propagation. Each iteration is one shuffle
join + one partial-aggregated groupBy, fully distributed; the only
driver-side values are the convergence scalar and the loop counter.

Scale notes (100 TB):
- Convergence is O(graph diameter) iterations. Near-dup clusters are
  dense and tiny (diameter 1-3 in practice), so 3-5 rounds close a web
  -scale corpus; for adversarially long chains switch to the
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) which closes in
  O(log^2 n) — same join-per-round skeleton, different edge rewrite.
- ``localCheckpoint`` truncates the lineage each round so plan size
  stays O(1) instead of O(iterations); lazy (eager=False) since r16 —
  the per-round convergence agg is the materializing action, so the
  eager variant's extra job barrier per round bought nothing. On a
  real cluster use ``spark.sparkContext.setCheckpointDir`` +
  ``checkpoint()`` for fault-tolerant truncation instead.
- The convergence test reads ONE scalar per round (sum of labels,
  strictly decreasing until fixpoint) — no ``collect()`` of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id of its component.

    Returns (id, label) — one row per vertex that appears in any edge.
    Raises if the propagation hasn't converged after ``max_iter``
    rounds (diameter larger than max_iter — switch algorithms rather
    than silently returning partial clusters).
    """
    # Materialize the undirected edge set ONCE — it is joined every
    # round, and without truncation each iteration would re-run the
    # whole upstream pair-generation pipeline (measured 4-5x slower on
    # the MinHash near-dup graph). LAZY checkpoints everywhere (r16
    # optimization): eager=True is a synchronous extra job PER ROUND —
    # the convergence agg right below already materializes the same
    # plan, so marking the RDD for checkpoint and letting that one
    # action populate it halves the driver-side job count (measured
    # ~2x on dedup_clusters' driver-loop wall, results identical; the
    # DataFrame is wrapped in a lineage-truncating LogicalRDD either
    # way, so plan size stays O(1) in iterations).
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    # This first action materializes e and the label seed as a side
    # effect of computing the convergence scalar — one job, not three.
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        # min label among each vertex's neighbours (undirected edges ->
        # every vertex occurs as dst, so the inner join covers all ids)
        neigh = (
            e.join(labels, e.src == labels.id)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neigh, labels.id == F.col("nid"))
            .select(
                "id", F.least("label", F.col("nlabel")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
        # One action per round: the agg both checkpoints the new labels
        # and reads the convergence scalar.
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds "
        "(component diameter exceeds max_iter; use large-star/small-star)"
    )


def pagerank_int(
    edges: DataFrame, iterations: int = 3, scale: int = 10**12
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``edges`` (src, dst) in
    integer micro-units — bit-reproducible across engines and runs.

    Every quantity is a BIGINT multiple of 1/``scale``: the initial rank
    is ``scale div N``, each out-edge carries ``rank div outdeg``, and the
    damped update is ``(3*scale) div (20*N) + (17*sum) div 20`` (0.15 and
    0.85 as exact rationals). Integer division makes the float-free
    recurrence associativity-proof: group sums of BIGINTs are exact, so
    the result is identical no matter the partitioning or engine — the
    same determinism trick as the int8-quantized k-means
    (operators/vectors.py). Sink mass is dropped, not redistributed
    (both sides agree; total rank decays, relative order is standard).

    Scale notes (100 TB): each iteration is one shuffle join
    (edges x ranks on src, edge-partitioned) + one partial-aggregated
    groupBy(dst) — the classic MapReduce PageRank dataflow with map-side
    combine for free. ``iterations`` is fixed (no convergence collect);
    the rank table is O(nodes), re-derived lazily per iteration so the
    composed plan stays a DAG Catalyst can pipeline. For web-scale
    graphs, checkpoint ranks every ~5 rounds to truncate lineage.

    The edge set is materialized ONCE (localCheckpoint) — it is read
    2 + 2*iterations times (nodes, outdeg, every round's contrib), and
    without truncation each reference re-runs the caller's whole edge
    -derivation pipeline (measured 2.5x slower on the trade graph,
    whose edges come from a 5-way star join over the fact table).
    """
    # Lazy (r16): there is no driver-side read before the final action,
    # so the eager variants were pure job barriers — the final exec
    # materializes e and nodes once and every later stage reads the
    # persisted blocks; the lineage truncation is identical.
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nn = nodes.agg(F.count("*").alias("n"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("d"))
    r = nodes.join(F.broadcast(nn)).selectExpr(
        "id", f"CAST({scale} AS BIGINT) div n AS rank"
    )
    for _ in range(iterations):
        contrib = (
            e.join(r.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .selectExpr("dst AS id", "rank div d AS c")
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        r = (
            nodes.join(F.broadcast(nn))
            .join(sums, "id", "left")
            .selectExpr(
                "id",
                f"CAST({3 * scale} AS BIGINT) div (20 * n)"
                " + coalesce((17 * s) div 20, CAST(0 AS BIGINT)) AS rank",
            )
        )
    return r
