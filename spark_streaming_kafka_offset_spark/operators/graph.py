"""Iterative graph analytics on relational data (SURVEY.md §2.17).

PageRank over the customer↔supplier trade graph — the canonical
driver-coordinated iterative algorithm (the same loop shape GraphX/
GraphFrames use: rank join edges → re-aggregate → repeat).  Sibling of
`dedup_clusters`' pointer-jumping connected components; where that loop
runs O(log d) rounds to a fixpoint, this one runs a FIXED iteration
count, which is what makes an exact SQL oracle possible: the DuckDB twin
unrolls the same five iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import load_table

_DAMPING = 0.85
_ITERS = 5


def _oracle_pagerank() -> str:
    """Unroll the five PageRank iterations as chained CTEs — built by the
    same codegen on both sides so iteration count and arithmetic agree by
    construction."""
    steps = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        steps.append(
            f"""r{i} AS (
        SELECT en.dst AS node,
               0.15 / (SELECT cnt FROM nn) +
               0.85 * SUM(en.wn * {prev}.r) AS r
        FROM en JOIN {prev} ON en.src = {prev}.node
        GROUP BY en.dst
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH raw_edges AS (
        SELECT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node,
               COUNT(*) AS w
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), edges AS (
        SELECT c_node AS src, s_node AS dst, w FROM raw_edges
        UNION ALL
        SELECT s_node AS src, c_node AS dst, w FROM raw_edges
    ), out_w AS (
        SELECT src, SUM(w) AS sw FROM edges GROUP BY src
    ), en AS (
        SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.sw AS wn
        FROM edges e JOIN out_w o ON e.src = o.src
    ), nn AS (
        SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS cnt FROM edges
    ), r0 AS (
        SELECT src AS node, 1.0 / (SELECT cnt FROM nn) AS r
        FROM (SELECT DISTINCT src FROM edges)
    ), {", ".join(steps)}
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           ROUND(r{_ITERS}.r * 1000, 6) AS rank_permille
    FROM r{_ITERS}
    ORDER BY node
    """


@register("graph_pagerank", oracle=_oracle_pagerank())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (d=0.85, 5 iterations) on the undirected
    bipartite customer↔supplier graph, edge weight = number of lineitems
    traded.  Symmetrizing the edges removes dangling nodes (every node
    with an edge has out-edges), so no dangling-mass redistribution term
    is needed and the recurrence is exactly
    ``r' = 0.15/N + 0.85 · Σ_in w_norm · r``.

    Scale notes: the edge list (with pre-normalized weights) is computed
    ONCE, repartitioned by src and cached — each iteration is then one
    shuffle-free-probe join against co-partitioned ranks plus one
    aggregation keyed on dst; ranks stay (node, r) — narrow.  Weights
    are integer lineitem counts so w/Σw is deterministic across
    engines; ranks are reported per-mille at 6 decimals, far above the
    ~1e-12 cross-engine float drift five iterations can accumulate.
    In production the loop adds ``localCheckpoint()`` every 2-3
    iterations to truncate lineage; at 5 fixed iterations Catalyst
    handles the composed plan directly."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.count("*").alias("w"))
    )
    edges = raw.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
    ).unionAll(
        raw.select(
            F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "w"
        )
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("sw"))
    en = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("w").cast("double") / F.col("sw")).alias("wn"))
        .repartition("src")
        .cache()
    )
    n_nodes = en.select("src").distinct().count()
    ranks = en.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("r")
    )
    for _ in range(_ITERS):
        ranks = (
            en.join(ranks, en.src == ranks.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(
                (F.lit(0.15 / n_nodes)
                 + F.lit(_DAMPING) * F.sum(F.col("wn") * F.col("r"))).alias("r")
            )
            .withColumnRenamed("node2", "node")
        )
    return ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.round(F.col("r") * 1000, 6).alias("rank_permille"),
    ).orderBy("node")
