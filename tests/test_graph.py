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
