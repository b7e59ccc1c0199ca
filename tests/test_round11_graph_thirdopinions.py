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

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.graph_queries import PR_ITERS, PR_SCALE
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.graph_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _trade_edges_py(sf_dir: str) -> set[tuple[str, str]]:
    """DISTINCT (customer-nation -> supplier-nation) edges via the same
    5-way join the query derives them from, evaluated with dicts."""
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    s = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    n = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nation = dict(
        zip(n["n_nationkey"].to_pylist(), n["n_name"].to_pylist())
    )
    cust_nation = {
        int(k): nation[nk]
        for k, nk in zip(
            c["c_custkey"].to_pylist(), c["c_nationkey"].to_pylist()
        )
    }
    supp_nation = {
        int(k): nation[nk]
        for k, nk in zip(
            s["s_suppkey"].to_pylist(), s["s_nationkey"].to_pylist()
        )
    }
    order_cust = {
        int(ok): int(ck)
        for ok, ck in zip(
            o["o_orderkey"].to_pylist(), o["o_custkey"].to_pylist()
        )
    }
    edges: set[tuple[str, str]] = set()
    for ok, sk in zip(
        li["l_orderkey"].to_pylist(), li["l_suppkey"].to_pylist()
    ):
        ck = order_cust.get(int(ok))
        if ck is None:
            continue
        edges.add((cust_nation[ck], supp_nation[int(sk)]))
    return edges


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
