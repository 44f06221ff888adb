"""PageRank invariants (operators/graph.py) beyond oracle parity."""

from __future__ import annotations

from spark_streaming_kafka_offset_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR


def test_pagerank_mass_conserved_and_positive(spark):
    """On a symmetric graph (no dangling nodes) every iteration conserves
    rank mass exactly: Σr = 0.15 + 0.85·Σr = 1.  And every node keeps a
    strictly positive rank (the teleport term guarantees it)."""
    rows = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    total = sum(r["rank_permille"] for r in rows) / 1000.0
    assert abs(total - 1.0) < 1e-6
    assert all(r["rank_permille"] > 0 for r in rows)
    assert {r["node_type"] for r in rows} == {"customer", "supplier"}


def test_shortest_paths_matches_textbook_bfs(spark, duck):
    """Both engine formulations (Spark frontier BFS, oracle min-merge DP)
    must equal a third, independent textbook BFS run in plain Python on
    the same edge list."""
    from collections import deque

    got = {
        (r["node"], r["dist"])
        for r in QUERIES["graph_shortest_paths"](spark, SF_DIR).collect()
    }
    edges = duck.execute(
        f"""
        WITH raw AS (
          SELECT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
          FROM '{SF_DIR}/lineitem.parquet' l
          JOIN '{SF_DIR}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ) SELECT c, s FROM raw
        """
    ).fetchall()
    landmarks = [
        r[0]
        for r in duck.execute(
            f"""SELECT s_suppkey * 2 + 1 FROM '{SF_DIR}/supplier.parquet'
                ORDER BY s_suppkey LIMIT 3"""
        ).fetchall()
    ]
    adj: dict[int, set[int]] = {}
    for c, s in edges:
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    dist = {n: 0 for n in landmarks}
    q = deque(landmarks)
    while q:
        u = q.popleft()
        if dist[u] >= 4:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    assert got == set(dist.items())
