"""Round-11 third opinions, part 3 — the two graph rows in this
round's refresh cohort, reconstructed in pure Python from the raw
parquet tables (including the 5-way star join that derives the trade
edge list, so the edge derivation itself is cross-checked too):

- graph_pagerank_trade: the 3-round integer-rational PageRank
  recurrence evaluated serially with plain Python dicts and //;
- graph_triangle_count: exact set-based triangle enumeration over the
  canonicalized undirected edge set.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import pytest

from mapreduceframework_spark.plans.graph_queries import PR_ITERS, PR_SCALE
from tests.mirrors import trade_edge_counts
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.graph_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _trade_edges_py(sf_dir: str) -> set[tuple[str, str]]:
    """DISTINCT (customer-nation -> supplier-nation) edges — the
    shared 5-way-join mirror's key set (tests/mirrors.py)."""
    return set(trade_edge_counts(sf_dir))


@pytest.mark.parametrize("sf_dir", SFS)
def test_graph_pagerank_trade_matches_python_fixpoint(spark, sf_dir):
    edges = _trade_edges_py(sf_dir)
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    outdeg: dict[str, int] = defaultdict(int)
    in_edges: dict[str, list[str]] = defaultdict(list)
    for a, b in edges:
        outdeg[a] += 1
        in_edges[b].append(a)
    rank = {v: PR_SCALE // n for v in nodes}
    for _ in range(PR_ITERS):
        rank = {
            v: (3 * PR_SCALE) // (20 * n)
            + (17 * sum(rank[u] // outdeg[u] for u in in_edges[v])) // 20
            for v in nodes
        }

    out = REGISTRY["graph_pagerank_trade"].fn(spark, sf_dir).collect()
    got = {r["id"]: r["rank"] for r in out}
    assert got == rank
    # Teleport-only floor: every node keeps at least the damped
    # teleport mass — the recurrence's own invariant.
    assert all(v >= (3 * PR_SCALE) // (20 * n) for v in got.values())


@pytest.mark.parametrize("sf_dir", SFS)
def test_graph_triangle_count_matches_python_enumeration(spark, sf_dir):
    edges = _trade_edges_py(sf_dir)
    und = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    triangles = sum(
        1
        for v in adj
        for x, y in combinations(sorted(adj[v]), 2)
        if v < x and y in adj[x]
    )
    n_nodes = len({x for e in und for x in e})

    row = REGISTRY["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert row["n_nodes"] == n_nodes
    assert row["n_edges"] == len(und)
    assert row["triangles"] == triangles
    assert triangles > 0, "no triangles — the check proved nothing"
