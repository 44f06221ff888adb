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
from pyspark.sql.window import Window

from ..common import epoch_seconds
from ..plans.registry import register
from ..session import load_table

_DAMPING = 0.85
_ITERS = 5


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared edge-build prologue for the trade-graph family
    (`graph_pagerank` / `graph_kcore` / `graph_degree_stats` /
    `graph_shortest_paths`): the distinct customer↔supplier edge list
    ``(c_node, s_node, w)`` with multiplicity weight ``w`` = lineitems
    traded.  One scan-minimal join (both inputs projected to their two
    join/key columns, so ReadSchema carries nothing else) + one
    partial-aggregable groupBy.  Ops that don't need the weight drop it;
    the plan is identical to the inlined form each op carried before,
    this just stops the four ops drifting apart (guide §2.4 applied
    inside each op — NOT a cross-query cache; every invocation computes
    from the parquet inputs)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.count("*").alias("w"))
    )


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

    Scale notes (r9 hub-skew fix — VERDICT r8 #2; r15 edge-build cut):
    the edge build is staged in three shuffle-minimal steps.  (1) The
    distinct weighted edge list ``raw`` (one scan-minimal join + one
    partial-aggregable groupBy — the only corpus pass) is staged.
    (2) Per-node out-weight: customer ids are even and supplier ids
    odd, so the (node, w) union is key-DISJOINT and ONE narrow
    groupBy(node) over it yields every node's Σw — this table doubles
    as the node universe, so ``n_nodes``/rank-init need NO distinct
    pass over the 2|E| edge rows (the r9-r14 shape aggregated the
    symmetrized edge list and then shuffle-joined it back on src: one
    more 2|E|-row exchange, a join that re-keyed the edge list by src
    — the exact hub-concentrating layout the r8 fix removed — plus a
    1.17M-row distinct for n_nodes).  (3) ``en`` attaches both
    endpoints' Σw via two BROADCAST joins of the node table and emits
    both directions of each edge with one ``inline`` — the staged en
    job contains no Exchange at all, so the even (c_node, s_node)
    partitioning of the producing aggregation is preserved
    STRUCTURALLY, not by join-strategy luck.  Each iteration then (a)
    BROADCASTS the narrow (node, r) rank vector into a hash join
    probed by the evenly-partitioned edges — no shuffle touches the
    edge list, no partition is hub-shaped — and (b) re-aggregates with
    ONE groupBy(dst): SUM is algebraic, so HashAggregate's map-side
    partial combines a hub's in-flow per task before the exchange and
    the reduce side receives ≤ #map-tasks rows per hub (the r9-r13
    shape additionally salted this rollup — removed r14).  Ranks are
    staged (lineage truncated) every 2 iterations — the r8 staging A/B
    showed iterative-loop inputs are exactly the case where staging
    wins (SURVEY §8).  At 100-TB graph sizes (>100M nodes) the node
    table and the rank vector outgrow a broadcast: swap both for a
    shuffle join with AQE skew-join splitting; (b) is unchanged.
    Weights are integer lineitem counts so w/Σw is deterministic
    across engines; ranks are reported per-mille at 6 decimals, far
    above the ~1e-12 cross-engine float drift five iterations can
    accumulate."""
    from ..common import stage

    raw = stage(_trade_edges(spark, sf_dir))
    sw = stage(
        raw.select(F.col("c_node").alias("node"), "w")
        .unionAll(raw.select(F.col("s_node").alias("node"), "w"))
        .groupBy("node")
        .agg(F.sum("w").alias("sw"))
    )
    n_nodes = sw.count()
    en = stage(
        raw.join(
            F.broadcast(
                sw.select(F.col("node").alias("c_node"), F.col("sw").alias("sw_c"))
            ),
            "c_node",
        )
        .join(
            F.broadcast(
                sw.select(F.col("node").alias("s_node"), F.col("sw").alias("sw_s"))
            ),
            "s_node",
        )
        .select(
            F.inline(
                F.array(
                    F.struct(
                        F.col("c_node").alias("src"),
                        F.col("s_node").alias("dst"),
                        (F.col("w").cast("double") / F.col("sw_c")).alias("wn"),
                    ),
                    F.struct(
                        F.col("s_node").alias("src"),
                        F.col("c_node").alias("dst"),
                        (F.col("w").cast("double") / F.col("sw_s")).alias("wn"),
                    ),
                )
            )
        )
    )
    ranks = sw.select("node", F.lit(1.0 / n_nodes).alias("r"))
    for i in range(_ITERS):
        # One-level aggregate (r14): the r9 shape interposed a salted
        # (dst, salt) partial before the dst rollup, but SUM is
        # algebraic — HashAggregate's map-side partial already combines
        # a hub's in-flow per task before the exchange, so the reduce
        # side of groupBy(dst) receives ≤ #map-tasks rows per hub, salt
        # or no salt.  The salt level only added a second Exchange per
        # iteration (r14 plan artifacts: 24 → 22 shuffle Exchanges,
        # 44 → 40 HashAggregates on the 2-iteration dump).  The
        # r8 hub skew the salt was guarding lived in the JOIN shuffle,
        # which the rank broadcast already removed.
        ranks = (
            en.join(F.broadcast(ranks), en.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (F.lit(0.15 / n_nodes)
                 + F.lit(_DAMPING) * F.sum(F.col("wn") * F.col("r"))).alias("r")
            )
        )
        if i % 2 == 1 and i < _ITERS - 1:
            ranks = stage(ranks)
    return ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.round(F.col("r") * 1000, 6).alias("rank_permille"),
    ).orderBy("node")


@register(
    "graph_degree_stats",
    oracle="""
    WITH raw_edges AS (
        SELECT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), nodes AS (
        SELECT c_node AS node, s_node AS nbr FROM raw_edges
        UNION ALL
        SELECT s_node AS node, c_node AS nbr FROM raw_edges
    ), deg AS (
        SELECT node, COUNT(*) AS degree FROM nodes GROUP BY node
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg
    GROUP BY 1, 2
    ORDER BY node_type, degree
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer↔supplier trade graph (distinct
    trading partners per node, histogrammed by side) — the first thing to
    compute before ANY graph algorithm at scale: it tells you whether
    PageRank/components will meet a power-law hub that needs special
    handling (cf. `table_skew_stats` for the relational analogue).

    Scale notes: distinct-edge collapse is one partial+final agg on the
    fact join; degrees are a second agg on the edge list; the histogram
    is degree-cardinality-sized.  No iteration, no window — everything
    partial-aggregable."""
    raw = _trade_edges(spark, sf_dir)
    nodes = raw.select(F.col("c_node").alias("node")).unionAll(
        raw.select(F.col("s_node").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy(
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("node_type"),
            F.col("degree").cast("long").alias("degree"),
        )
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .orderBy("node_type", "degree")
    )


@register(
    "graph_triangle_count",
    # Exact triangle counting by degree orientation (the MapReduce-era
    # standard: Suri & Vassilvitskii "Counting Triangles and the Curse
    # of the Last Reducer", WWW'11): orient every undirected edge from
    # the (degree, id)-smaller endpoint to the larger, count directed
    # paths a→b→c closed by a→c.  Each triangle is counted EXACTLY once,
    # and every node's oriented out-degree is O(√|E|), so the wedge join
    # is bounded even on power-law graphs.
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), oriented AS (
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS s,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS t
      FROM pairs p
      JOIN deg du ON p.u = du.node
      JOIN deg dv ON p.v = dv.node
    ), tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM oriented e1
      JOIN oriented e2 ON e1.t = e2.s
      JOIN oriented e3 ON e3.s = e1.s AND e3.t = e2.t
    ), wedge AS (
      SELECT SUM(d * (d - 1) / 2) AS n_wedges FROM deg
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           CAST(wedge.n_wedges AS BIGINT) AS n_wedges,
           ROUND(3.0 * tri.n_triangles / wedge.n_wedges, 6)
             AS clustering_coeff
    FROM tri, wedge
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the part
    co-purchase graph (parts linked when they appear in the same order)
    — the community-structure / recommender diagnostic, and the
    canonical "join that blows up unless you orient it" graph kernel.

    Degree orientation (every edge points from its (degree, id)-smaller
    endpoint to the larger; Suri & Vassilvitskii, WWW'11) counts each
    triangle exactly once and bounds oriented out-degree at O(√|E|).
    Counting then uses ADJACENCY-ARRAY INTERSECTION, not a wedge join:
    per oriented edge (s, t), triangles-closed = |out(s) ∩ out(t)| on
    sorted neighbor arrays — work ∝ Σ_edges (outdeg(s)+outdeg(t))
    instead of the wedge join's Σ outdeg² (measured 18.1 s → wedge
    explosion vs array intersect at sf0.1's 1.2 M-edge / 148 M-wedge
    graph).  The ORACLE deliberately keeps the independent wedge-closure
    formulation, so the hash match cross-validates two algorithms.

    Scale notes: co-occurrence pairs are generated per order (bounded
    by per-order line count, ≤7 on TPC-H-shaped data) then distinct-
    collapsed; adjacency arrays are ≤ O(√|E|) entries by the
    orientation bound (~2² KB rows even on power-law graphs), built by
    one collect_list agg and joined back to edges on each endpoint.
    The final scalar row is rollup-sized."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.alias("a")
    b = l.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    from ..common import stage

    pairs = stage(pairs)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = stage(
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    adj = oriented.groupBy("s").agg(
        F.array_sort(F.collect_list("t")).alias("nbrs")
    )
    adj_s = adj.select(F.col("s"), F.col("nbrs").alias("nbrs_s"))
    adj_t = adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nbrs_t"))
    tri = (
        oriented.join(adj_s, "s")
        .join(adj_t, "t", "left")  # sink nodes have no out-list
        .select(
            F.size(
                F.array_intersect(
                    "nbrs_s", F.coalesce("nbrs_t", F.array().cast("array<bigint>"))
                )
            ).alias("closed")
        )
        .agg(F.sum("closed").cast("long").alias("n_triangles"))
    )
    n_wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
    )
    counts = pairs.agg(F.count("*").alias("n_edges")).join(
        deg.agg(F.count("*").alias("n_nodes"))
    )
    return (
        counts.join(F.broadcast(tri))
        .join(F.broadcast(n_wedges))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering_coeff"),
        )
    )


_BFS_LEVELS = 4
_BFS_SOURCES = 3


def _oracle_bfs() -> str:
    """Unroll the BFS levels as chained min-merge CTEs — codegen'd with
    the same ``_BFS_LEVELS`` the Spark loop uses, so depth agrees by
    construction (same discipline as ``_oracle_pagerank``)."""
    steps = []
    prev = "d0"
    for k in range(1, _BFS_LEVELS + 1):
        steps.append(
            f"""d{k} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS node, {prev}.dist + 1 AS dist
            FROM edges e JOIN {prev} ON e.src = {prev}.node
        ) GROUP BY node
    )"""
        )
        prev = f"d{k}"
    return f"""
    WITH raw_edges AS (
        SELECT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), edges AS (
        SELECT c_node AS src, s_node AS dst FROM raw_edges
        UNION ALL
        SELECT s_node AS src, c_node AS dst FROM raw_edges
    ), d0 AS (
        SELECT s_suppkey * 2 + 1 AS node, 0 AS dist FROM supplier
        ORDER BY s_suppkey LIMIT {_BFS_SOURCES}
    ), {", ".join(steps)}
    SELECT CAST(node AS BIGINT) AS node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(dist AS BIGINT) AS dist
    FROM d{_BFS_LEVELS}
    ORDER BY node
    """


@register("graph_shortest_paths", oracle=_oracle_bfs())
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS shortest paths (hop distance) from a landmark set
    — the reachability/propagation primitive behind landmark-distance
    embeddings, blast-radius analysis ("every account within 3 hops of a
    flagged one") and supply-chain exposure scoring.  Landmarks are the
    ``_BFS_SOURCES`` smallest-key suppliers; the graph is the same
    symmetrized customer↔supplier trade graph `graph_pagerank` walks.

    The Spark loop is FRONTIER-expanded textbook BFS: each level joins
    only the newly-reached nodes against the edge list, anti-joins out
    already-settled nodes, and appends the remainder at distance k.
    Expanding the frontier (not the whole settled set) is what makes the
    per-round cost proportional to the level's boundary, not to the
    accumulated result — the distinction that matters on a 100-TB graph
    where level sizes peak early then shrink.  The ORACLE is the
    independent dynamic-programming formulation (min-merge over full
    level relaxations), so the hash match cross-validates two different
    BFS derivations.

    Scale notes: the distinct edge list is built once, repartitioned on
    ``src`` and staged (lineage truncation — the iterative-algorithm
    discipline of `graph_pagerank`/`dedup_clusters`); every level is
    one hash join on that partitioning plus one anti join keyed the
    same way.  Settled distances stay (node, dist) — narrow.  Depth is
    fixed at {_BFS_LEVELS} levels; nodes unreachable within that radius
    are absent on both engines by construction."""
    from ..common import stage

    raw = _trade_edges(spark, sf_dir).drop("w")
    edges = stage(
        raw.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
        .unionAll(
            raw.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
        )
        .repartition("src")
    )
    landmarks = (
        load_table(spark, sf_dir, "supplier")
        .orderBy("s_suppkey")
        .limit(_BFS_SOURCES)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"), F.lit(0).alias("dist"))
    )
    settled = landmarks
    frontier = landmarks
    for k in range(1, _BFS_LEVELS + 1):
        reached = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = stage(
            reached.join(settled.select("node"), "node", "left_anti").select(
                "node", F.lit(k).alias("dist")
            )
        )
        settled = settled.unionAll(new)
        frontier = new
    return settled.select(
        F.col("node").cast("long").alias("node"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("dist").cast("long").alias("dist"),
    ).orderBy("node")


_KCORE_K = 50  #: above p90 customer degree (45 at sf0.01): round 1 peels most
#: customers, round 2 then peels EVERY supplier — a real two-round cascade
#: (k=8/40 converged after one round; measured)
_KCORE_ROUNDS = 3


def _oracle_kcore() -> str:
    """Unrolled peeling rounds — codegen-twin discipline (pagerank/BFS/
    kmeans): round count and the degree threshold are shared constants."""
    steps = []
    prev = "g0"
    out_rows = []
    for r in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""d{r} AS (
        SELECT src AS node, COUNT(*) AS d FROM {prev} GROUP BY src
    ), rm{r} AS (
        SELECT node FROM d{r} WHERE d < {_KCORE_K}
    ), g{r} AS (
        SELECT e.src, e.dst FROM {prev} e
        WHERE e.src NOT IN (SELECT node FROM rm{r})
          AND e.dst NOT IN (SELECT node FROM rm{r})
    )"""
        )
        out_rows.append(
            f"SELECT {r} AS round, (SELECT COUNT(*) FROM d{r}) AS n_before,"
            f" (SELECT COUNT(*) FROM rm{r}) AS n_removed"
        )
        prev = f"g{r}"
    return f"""
    WITH raw_edges AS (
        SELECT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), g0 AS (
        SELECT c_node AS src, s_node AS dst FROM raw_edges
        UNION ALL
        SELECT s_node, c_node FROM raw_edges
    ), {", ".join(steps)}
    SELECT CAST(round AS BIGINT) AS round,
           CAST(n_before AS BIGINT) AS n_before,
           CAST(n_removed AS BIGINT) AS n_removed
    FROM ({" UNION ALL ".join(out_rows)})
    ORDER BY round
    """


@register("graph_kcore", oracle=_oracle_kcore())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (3 fixed rounds, k=50) on the
    symmetrized trade graph — the degeneracy pruning that strips hangers-
    on before community detection / triangle counting pays for them
    (every node left has ≥ k surviving partners).  Reports the peel
    trajectory (nodes before, nodes removed per round) — the curve an
    analyst reads to pick k.  Completes the iterative-graph family:
    rank (`graph_pagerank`), reach (`graph_shortest_paths`), components
    (`dedup_clusters`), cohesion here.

    Scale notes: each round is one degree aggregate over the current
    edge set plus two anti-joins (c_node, s_node) against the
    removed-node frame — all keyed shuffles, no windows; the edge set
    only shrinks; `stage()` truncates lineage per round (iterative
    discipline).  The loop works on the DIRECTED half-size edge list
    (r15): the symmetrized union the r6-r14 shape materialized doubled
    every checkpoint, every degree shuffle and every anti-join probe —
    but deg(node) over the symmetric set is just the count of raw rows
    touching the node on either side (customer ids even, supplier ids
    odd ⇒ the (node) union below is key-disjoint), and peeling removes
    a raw row when EITHER endpoint is removed, exactly the two
    anti-joins.  The oracle unrolls the symmetric form; parity proves
    the halved loop equivalent."""
    from ..common import stage

    raw = stage(_trade_edges(spark, sf_dir).drop("w"))
    per_round = []
    for r in range(1, _KCORE_ROUNDS + 1):
        # stage() the DEGREE table, not the removal list (r14): the r6
        # shape staged rm and then recomputed the full degree aggregate
        # a second time for the n_before count — one redundant
        # shuffle+agg pass over the round's edge set, every round.
        # Staged degrees serve the removal filter, both peel anti-joins
        # and both trajectory counts from one computation.
        deg = stage(
            raw.select(F.col("c_node").alias("node"))
            .unionAll(raw.select(F.col("s_node").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        # Trajectory counts stay LAZY (r15, VERDICT r14 #8): the r14
        # shape ran a per-round .first() — a driver round-trip per
        # round whose only job was two tiny aggs over the checkpointed
        # degrees.  Deferring them as 1-row frames and collecting the
        # union ONCE cuts the per-invocation job count 9 → 6 (3 deg
        # stages + 2 peel stages + 1 final collect); each deferred agg
        # reads its round's checkpoint, so nothing is recomputed.
        per_round.append(
            deg.agg(
                F.lit(r).cast("long").alias("round"),
                F.count("*").cast("long").alias("n_before"),
                F.coalesce(
                    F.sum((F.col("d") < _KCORE_K).cast("long")), F.lit(0)
                )
                .cast("long")
                .alias("n_removed"),
            )
        )
        if r < _KCORE_ROUNDS:
            # The final round's peeled edge set has no consumer — the
            # trajectory ends at its counts — so don't pay the two
            # anti-joins + staging pass for it (r14; one full edge-set
            # pass saved per invocation).
            rm = deg.where(F.col("d") < _KCORE_K).select(
                F.col("node").alias("rnode")
            )
            raw = stage(
                raw.join(rm, raw.c_node == rm.rnode, "left_anti")
                .join(
                    rm.select(F.col("rnode").alias("dnode")),
                    F.col("s_node") == F.col("dnode"),
                    "left_anti",
                )
            )
    out = per_round[0]
    for nxt in per_round[1:]:
        out = out.unionAll(nxt)
    return out


@register(
    "graph_common_neighbors",
    # Link prediction on the user/10-minute-activity-slot bipartite
    # graph: Jaccard similarity of two users' active-slot sets,
    # candidates generated ONLY through shared slots (an equi-join on
    # the slot — a pair with zero common slots never materializes).
    # Slot granularity matters for non-vacuity: at day granularity
    # EVERY user pair in the fixtures overlaps >= 3 and the min-support
    # filter prunes nothing (audited); 10-minute slots give a mean
    # overlap of ~1, so support >= 3 keeps a discriminative minority.
    # All-integer: |A∩B| from the pair count, |A|,|B| from per-user
    # slot degrees; jaccard is ONE IEEE division of identical integers.
    oracle="""
    WITH active0 AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 600000000 AS BIGINT) AS slot
        FROM events
    ), capped AS (
        SELECT user_id, slot,
               ROW_NUMBER() OVER (
                   PARTITION BY slot
                   ORDER BY (user_id * 1103515245 + slot * 12345)
                            % 2147483648, user_id) AS rn
        FROM active0
    ), active AS (
        SELECT user_id, slot FROM capped WHERE rn <= 50
    ), deg AS (
        SELECT user_id, COUNT(*) AS slots FROM active GROUP BY user_id
    ), pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               COUNT(*) AS common_slots
        FROM active a JOIN active b
          ON a.slot = b.slot AND a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
    )
    SELECT p.user_a, p.user_b,
           CAST(p.common_slots AS BIGINT) AS common_slots,
           CAST(da.slots AS BIGINT) AS slots_a,
           CAST(db.slots AS BIGINT) AS slots_b,
           ROUND(CAST(p.common_slots AS DOUBLE)
                 / CAST(da.slots + db.slots - p.common_slots AS DOUBLE), 6)
               AS jaccard
    FROM pairs p
    JOIN deg da ON p.user_a = da.user_id
    JOIN deg db ON p.user_b = db.user_id
    WHERE p.common_slots >= 3
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / Jaccard link prediction over the user co-activity
    graph (shared 10-minute activity slots): users repeatedly active in
    the same narrow windows are likely the same household/bot cluster —
    the classic similarity edge for entity linking and recommendation
    candidate generation.

    Scale notes: the candidate pairs come from an equi-join on the slot
    key, so the work is sum-over-slots of (active users that slot choose
    2).  That sum is quadratic in per-slot DENSITY, so hyper-active
    slots (> 50 users) are dropped before pairing — the measured 35x
    wall blowup at the 10x-denser sf1 stress fixture collapses to
    bounded per-slot work, and an everyone-co-occurs slot carries no
    similarity signal anyway (PMI -> 0).  Degrees are computed on the
    CAPPED activity so the Jaccard denominator matches the candidate
    universe.  The degree join is a user-dim-sized broadcast; the
    min-support filter (>= 3 shared slots) prices the output down
    before it."""
    e = load_table(spark, sf_dir, "events")
    # One exchange for distinct + cap window (r15): hash-repartitioning
    # on ``slot`` FIRST satisfies the clustering required by BOTH the
    # (user_id, slot) distinct (equal pairs share a slot => co-located;
    # Catalyst adds no second exchange) and the per-slot window — the
    # prior shape paid exchange(user_id, slot) for the distinct and
    # exchange(slot) again for the window.  Explicit partition count
    # for the documented AQE-coalesce reason (shingle_sets).  Measured:
    # 2 -> 1 Exchanges, identical 99,201 active rows at sf0.1.
    active0 = (
        e.select("user_id", epoch_seconds("ts").alias("sec"))
        .select("user_id", F.expr("sec div 600").alias("slot"))
        .repartition(spark.sparkContext.defaultParallelism, "slot")
        .distinct()
    )
    # Hot-slot cap: keep at most 50 hash-ranked users per slot BEFORE
    # pairing.  The pair fanout is sum-over-slots of C(active, 2) —
    # quadratic in per-slot DENSITY — and the r6 sf1 stress sweep
    # measured the uncapped op at 35x wall for 10x data (the synthetic
    # 10x corpus is 10x denser per slot, the worst case).  SAMPLING the
    # slot (multiplicative-hash rank, slot-salted so different slots
    # keep different users) bounds per-slot work at C(50,2) while dense
    # slots still contribute signal — the first cut (dropping dense
    # slots outright) measured 9s at sf1 but returned 0 rows: a cliff,
    # not a valve.  Under the driver fixtures (<= ~3 active/slot at
    # sf0.01) the cap never bites; the oracle mirrors it verbatim so
    # parity covers the capped definition.
    wslot = Window.partitionBy("slot").orderBy(
        (F.col("user_id") * 1103515245 + F.col("slot") * 12345) % 2147483648,
        "user_id",
    )
    # stage(): the capped activity set feeds FOUR consumers (both sides
    # of the slot self-join plus the degree table behind both broadcast
    # lookups); without it Catalyst inlines the events scan + distinct +
    # per-slot window into every consumer — the formatted plan carried
    # 8 events scans and 4 windows for one logical pass.  Staged, the
    # scan/distinct/cap runs once; at 100 TB that is 1 corpus pass
    # instead of 4 (the docs_chrf/dedup_minhash diamond posture).
    from ..common import stage

    active = stage(
        active0.withColumn("rn", F.row_number().over(wslot))
        .where(F.col("rn") <= 50)
        .select("user_id", "slot")
    )
    deg = active.groupBy("user_id").agg(F.count("*").alias("slots"))
    a = active.select(F.col("user_id").alias("user_a"), "slot")
    b = active.select(F.col("user_id").alias("user_b"), F.col("slot").alias("slot_b"))
    pairs = (
        a.join(b, (a.slot == b.slot_b) & (a.user_a < b.user_b))
        .groupBy("user_a", "user_b")
        .agg(F.count("*").alias("common_slots"))
        .where(F.col("common_slots") >= 3)
    )
    da = deg.select(F.col("user_id").alias("ua"), F.col("slots").alias("slots_a"))
    db = deg.select(F.col("user_id").alias("ub"), F.col("slots").alias("slots_b"))
    return (
        pairs.join(F.broadcast(da), pairs.user_a == da.ua)
        .join(F.broadcast(db), pairs.user_b == db.ub)
        .select(
            "user_a",
            "user_b",
            F.col("common_slots").cast("long").alias("common_slots"),
            F.col("slots_a").cast("long").alias("slots_a"),
            F.col("slots_b").cast("long").alias("slots_b"),
            F.round(
                F.col("common_slots").cast("double")
                / (
                    F.col("slots_a") + F.col("slots_b") - F.col("common_slots")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


#: Adamic–Adar hub-discount fixed point (nano-units): w(slot) =
#: round(1e9 / ln(occupancy)) — integral, so pair scores are exact
#: integer sums regardless of how many shared slots contribute.
_AA_SCALE = 1_000_000_000


@register(
    "graph_adamic_adar",
    # Adamic–Adar link prediction on the same capped user/activity-slot
    # bipartite graph as graph_common_neighbors: each shared slot
    # contributes 1/ln(occupancy) — busy slots are discounted toward 0,
    # 2-user slots weigh most — with the per-slot weight a nano-unit
    # BIGINT so every pair score is an exact integer sum.
    oracle=f"""
    WITH active0 AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 600000000 AS BIGINT) AS slot
        FROM events
    ), capped AS (
        SELECT user_id, slot,
               ROW_NUMBER() OVER (
                   PARTITION BY slot
                   ORDER BY (user_id * 1103515245 + slot * 12345)
                            % 2147483648, user_id) AS rn
        FROM active0
    ), active AS (
        SELECT user_id, slot FROM capped WHERE rn <= 50
    ), occ AS (
        SELECT slot, CAST(COUNT(*) AS BIGINT) AS occ
        FROM active GROUP BY slot
    ), w AS (
        SELECT slot, occ,
               CAST(ROUND({_AA_SCALE} / ln(CAST(occ AS DOUBLE)))
                    AS BIGINT) AS w_nano
        FROM occ WHERE occ >= 2
    ), aw AS (
        SELECT a.user_id, a.slot, w.w_nano
        FROM active a JOIN w ON a.slot = w.slot
    ), pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               CAST(COUNT(*) AS BIGINT) AS common_slots,
               CAST(SUM(a.w_nano) AS BIGINT) AS aa_nano
        FROM aw a JOIN aw b
          ON a.slot = b.slot AND a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
    )
    SELECT user_a, user_b, common_slots, aa_nano,
           CAST(aa_nano // 1000 AS DOUBLE) / 1000000.0 AS adamic_adar
    FROM pairs WHERE common_slots >= 3
    ORDER BY user_a, user_b
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the user co-activity bipartite
    graph — `graph_common_neighbors`' candidate universe (shared
    capped 10-minute slots, identical hot-slot valve) but with each
    shared slot DISCOUNTED by 1/ln(occupancy): a slot two users share
    alone is near-conclusive evidence of linkage, an everyone-was-
    active slot is near-noise, and AA is the canonical weighting in
    between (it dominates raw common-neighbor counts on every link-
    prediction benchmark since the original 2003 paper).  The per-slot
    weight is ONE ln + division floored to a nano-unit BIGINT at the
    SLOT rollup level, so each pair's score is an exact integer sum —
    immune to partition-order float drift no matter how many slots
    contribute.

    Scale notes: occupancy and weights are a slot-rollup aggregate;
    the weight attach is a slot-keyed co-partitioned join (both sides
    already hash on slot — no extra shuffle class); the pair join is
    the capped slot equi-join (per-slot work ≤ C(50,2), the measured
    r6 valve); min-support ≥ 3 prices the output before the final
    projection.  occ=1 slots are dropped at the rollup (they cannot
    be shared; also keeps ln(occ) > 0)."""
    e = load_table(spark, sf_dir, "events")
    # One exchange for distinct + cap window (r15): hash-repartitioning
    # on ``slot`` FIRST satisfies the clustering required by BOTH the
    # (user_id, slot) distinct (equal pairs share a slot => co-located;
    # Catalyst adds no second exchange) and the per-slot window — the
    # prior shape paid exchange(user_id, slot) for the distinct and
    # exchange(slot) again for the window.  Explicit partition count
    # for the documented AQE-coalesce reason (shingle_sets).  Measured:
    # 2 -> 1 Exchanges, identical 99,201 active rows at sf0.1.
    active0 = (
        e.select("user_id", epoch_seconds("ts").alias("sec"))
        .select("user_id", F.expr("sec div 600").alias("slot"))
        .repartition(spark.sparkContext.defaultParallelism, "slot")
        .distinct()
    )
    wslot = Window.partitionBy("slot").orderBy(
        (F.col("user_id") * 1103515245 + F.col("slot") * 12345) % 2147483648,
        "user_id",
    )
    active = (
        active0.withColumn("rn", F.row_number().over(wslot))
        .where(F.col("rn") <= 50)
        .select("user_id", "slot")
    )
    w = (
        active.groupBy("slot")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= 2)
        .select(
            "slot",
            F.round(_AA_SCALE / F.log(F.col("occ").cast("double")))
            .cast("long")
            .alias("w_nano"),
        )
    )
    aw = active.join(w, "slot")
    a = aw.select(F.col("user_id").alias("user_a"), "slot", "w_nano")
    b = aw.select(F.col("user_id").alias("user_b"), F.col("slot").alias("slot_b"))
    return (
        a.join(b, (a.slot == b.slot_b) & (a.user_a < b.user_b))
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_slots"),
            F.sum("w_nano").cast("long").alias("aa_nano"),
        )
        .where(F.col("common_slots") >= 3)
        .select(
            "user_a",
            "user_b",
            "common_slots",
            "aa_nano",
            # Truncate to micro-units BEFORE the float division: nano
            # sums ending in ...500 hit an exact 6-decimal half, and
            # ROUND half-handling differs across engines (caught by the
            # sf0.1 parity run).  div-then-divide is half-free.
            (
                F.expr("CAST(aa_nano div 1000 AS DOUBLE)") / 1_000_000.0
            ).alias("adamic_adar"),
        )
        .orderBy("user_a", "user_b")
    )


_LP_ITERS = 3


def _oracle_label_propagation() -> str:
    """Unroll the three label-propagation rounds as chained CTEs — the
    `graph_pagerank` codegen-twin recipe.  Each round's argmax runs on
    integer incident weights with ties to the LOWEST label, so every
    step is integer-deterministic on both engines.  Iteration CTEs are
    MATERIALIZED (the multi-reference inlining hazard, SURVEY §8)."""
    steps = []
    prev = "l0"
    for i in range(1, _LP_ITERS + 1):
        steps.append(
            f"""a{i} AS MATERIALIZED (
        SELECT e.dst AS node, p.lbl, SUM(e.w) AS tw
        FROM edges e JOIN {prev} p ON e.src = p.node
        GROUP BY 1, 2
    ), l{i} AS MATERIALIZED (
        SELECT node, lbl
        FROM (SELECT node, lbl,
                     row_number() OVER (PARTITION BY node
                                        ORDER BY tw DESC, lbl) AS rn
              FROM a{i})
        WHERE rn = 1
    )"""
        )
        prev = f"l{i}"
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
    ), l0 AS (
        SELECT DISTINCT src AS node, src AS lbl FROM edges
    ), {", ".join(steps)}
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers,
           CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suppliers,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM l{_LP_ITERS}
    GROUP BY lbl
    ORDER BY community
    """


@register("graph_label_propagation", oracle=_oracle_label_propagation())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by label propagation (Raghavan et al. 2007,
    public) over the customer↔supplier trade graph — the third member
    of the iterative-graph family (`graph_pagerank` ranks,
    `graph_kcore` peels, this one CLUSTERS): every node starts as its
    own label; each of 3 synchronous rounds re-labels a node with the
    label holding the MAX total incident edge weight among its
    neighbors (ties to the lowest label — fully integer-deterministic,
    which is what lets the unrolled DuckDB twin match bit-for-bit where
    float-voting LPA variants could not).  Output is the community
    rollup: size, customer/supplier mix, min member node.

    Scale notes: the edge list is built once (one fact-dim join +
    aggregate) and reused each round; a round is ONE shuffle — join
    labels to edges on src (both keyed), partial+final agg on (dst,
    lbl), argmax window partitioned by node (keyed, never global).
    Labels are a narrow (node, lbl) frame; the synchronous fixed
    iteration count bounds the lineage like pagerank's loop (no
    fixpoint detection — production LPA stops on a label-change
    counter, one extra agg per round)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    from ..common import stage

    edges = stage(
        raw.select(
            F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
        ).unionAll(
            raw.select(
                F.col("s_node").alias("src"),
                F.col("c_node").alias("dst"),
                "w",
            )
        )
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    wv = Window.partitionBy("node").orderBy(F.col("tw").desc(), "lbl")
    for it in range(_LP_ITERS):
        scored = (
            edges.join(
                labels.select(F.col("node").alias("src"), "lbl"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.sum("w").alias("tw"))
        )
        labels = (
            scored.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
        )
        if it == 1:
            labels = stage(labels)
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_customers"),
            F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_suppliers"),
            F.min("node").cast("long").alias("min_node"),
        )
        .select(
            F.col("community").cast("long").alias("community"),
            "n_nodes",
            "n_customers",
            "n_suppliers",
            "min_node",
        )
        .orderBy("community")
    )


@register(
    "graph_clustering_coefficient",
    # LOCAL clustering coefficient distribution (Watts–Strogatz 1998,
    # public) over the part co-purchase graph — the per-node companion
    # of graph_triangle_count's GLOBAL coefficient: c_i = 2·tri_i /
    # (d_i(d_i−1)) as an exact integer ppm (one integer division), the
    # decile histogram of c over nodes with d ≥ 2, and the WS average.
    # The oracle enumerates triangles by the independent wedge-closure
    # join (the triangle_count cross-validation pattern) while the
    # engine uses adjacency-array intersection.
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), oriented AS (
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS s,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS t
      FROM pairs p
      JOIN deg du ON p.u = du.node
      JOIN deg dv ON p.v = dv.node
    ), tri_nodes AS (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM oriented e1
      JOIN oriented e2 ON e1.t = e2.s
      JOIN oriented e3 ON e3.s = e1.s AND e3.t = e2.t
    ), per_node AS (
      SELECT node, COUNT(*) AS tri FROM (
        SELECT a AS node FROM tri_nodes
        UNION ALL SELECT b FROM tri_nodes
        UNION ALL SELECT c FROM tri_nodes
      ) GROUP BY node
    ), cc AS (
      SELECT g.node,
             2000000 * COALESCE(p.tri, 0) // (g.d * (g.d - 1)) AS cc_ppm
      FROM deg g LEFT JOIN per_node p ON p.node = g.node
      WHERE g.d >= 2
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes_total,
             CAST(SUM(cc_ppm) // COUNT(*) AS BIGINT) AS avg_cc_ppm
      FROM cc
    )
    SELECT CAST(LEAST(cc_ppm // 100000, 9) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) * 1000000 // MAX(t.n_nodes_total) AS BIGINT)
             AS share_ppm,
           MAX(t.avg_cc_ppm) AS avg_cc_ppm,
           MAX(t.n_nodes_total) AS n_nodes_total
    FROM cc CROSS JOIN tot t
    GROUP BY 1 ORDER BY decile
    """,
)
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str, scale_stripes: int | None = None
) -> DataFrame:
    """Local clustering coefficient distribution of the part
    co-purchase graph — per node, what fraction of my neighbors'
    possible pairs actually co-occur? (Watts–Strogatz; the 'are my
    friends friends with each other' diagnostic that separates
    clustered/community graphs from degree-matched random ones.)
    Reported as the decile histogram over nodes of degree ≥ 2 plus the
    WS average — the per-node companion to `graph_triangle_count`'s
    single global coefficient.

    Exactness: tri_i and d_i are exact integers; c_i rides as ONE
    integer division (2e6·tri) div (d(d−1)); decile, shares and the WS
    average are integer div — no float anywhere.  The oracle
    re-derives per-node triangle counts through the independent
    wedge-closure join while this plan uses degree-oriented
    adjacency-array intersection (Suri–Vassilvitskii; out-degree
    bounded O(√|E|)), so the hash match cross-validates the two
    triangle algorithms AT NODE GRAIN, not just in total.

    Scale notes: same staged pair/orientation frames as
    graph_triangle_count; per-edge intersections EXPLODE to one row
    per triangle (work is output-sized — the only way to attribute
    triangles to all three corners), then one unpivot + node agg; the
    decile rollup is 10 rows.

    ``scale_stripes`` (r12/r13): ``None`` (the default) AUTO-SELECTS K
    from the EXACT raw array-shipping volume — the intersection join
    ships od(s)+od(t) adjacency entries per oriented edge, which sums
    per node to Σ od(v)·d(v) raw entries (one node-sized join + 1-row
    agg over frames the plan already builds), ×8 B ×2 measured
    disk-overhead factor, and K = ceil(est /
    SSKOS_STRIPE_DISK_BUDGET_GB, default 26 GiB — the r12-measured
    safe /tmp peak on this host).  Every small-SF run stays
    unstriped (est ≪ budget ⇒ K = 1) while the sf10 second decade
    self-engages K = 8 with NO caller parameter — closing the
    ergonomics gap where a naive user at an intermediate scale hit the
    /tmp wall (VERDICT r12 #4).  NOTE (ADVICE r13): the auto path is
    EAGER — computing the estimate runs one small Spark job (the
    node-sized degree join + 1-row agg) before the plan is returned,
    so the default call is no longer a pure plan builder; callers
    composing many invocations should pass an explicit
    ``scale_stripes`` to stay lazy.  Explicit ``scale_stripes=K``
    forces the choice (0/1 = one-pass) and skips the estimation job.

    ``scale_stripes=K`` (the bounded-local-disk path itself): the
    intersection join ships BOTH endpoint adjacency arrays on every
    oriented edge — Σ_edges (out_d(s) + out_d(t)) entries, the classic
    m^1.5-class volume that measured >60 GB of shuffle spill at sf10
    and exceeded this host's /tmp (BASELINE.md r12).  With K stripes
    the edge list is processed in K sequential passes on
    ``pmod(s, K)``, each shipping 1/K of the array volume (peak disk
    divides by K; total work unchanged), and the per-stripe PARTIAL
    per-node triangle counts (≤|nodes| rows each) are unioned and
    re-aggregated — sums of disjoint-edge attributions, so the result
    is IDENTICAL by construction and pinned by an equality pytest.
    On a 1000-executor cluster the unstriped path is the right one
    (the same volume is ~MBs per executor); striping is the
    small-local-disk escape hatch, same answer."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.alias("a")
    b = l.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    from ..common import stage

    pairs = stage(pairs)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = stage(
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    adj = oriented.groupBy("s").agg(
        F.array_sort(F.collect_list("t")).alias("nbrs")
    )
    adj = stage(adj)
    if scale_stripes is None:
        # Auto-select K (VERDICT r12 #4) from the EXACT raw
        # array-shipping volume: each oriented edge (s,t) ships
        # od(s)+od(t) adjacency entries into the intersection join, and
        # summing per node gives Σ_v od(v)·(od(v)+in_d(v)) = Σ od(v)·d(v)
        # (od+in = total degree) — one join of two node-sized frames
        # (the staged adjacency and the degree rollup) + a 1-row agg.
        # Raw entries are 8 B, but the MEASURED on-disk peak runs ≈2×
        # the raw-entry bytes (calibrated against the r12 K=8 sf10 run:
        # 13.25 GB raw entries per stripe → ~26 GB observed /tmp peak —
        # tuple/array-header overhead plus map output and reducer sort
        # spill coexisting), so est = 2·8·Σ od·d.  Budget default
        # 26 GiB = the r12-measured safe peak on this host: at sf10
        # (raw 106 GB, measured here — exactly 10× the sf1 10.6 GB, the
        # estimate is linear across decades) K resolves to 8, the
        # measured working point; sf1 and below stay unstriped.
        # An earlier 2·Σ od² form undercounted the t-side ~2.2×
        # (in-degrees concentrate on high-od nodes) and picked K=4
        # where the measured wall needed 8.
        import math
        import os

        row = (
            adj.select(F.col("s").alias("node"),
                       F.size("nbrs").cast("long").alias("od"))
            .join(deg, "node")
            .agg(F.sum(F.col("od") * F.col("d")).alias("ship"))
            .collect()[0]
        )
        est_bytes = 2 * 8 * int(row["ship"] or 0)
        budget_gb = float(os.environ.get("SSKOS_STRIPE_DISK_BUDGET_GB", "26"))
        scale_stripes = max(1, math.ceil(est_bytes / (budget_gb * (1 << 30))))
        # introspection hooks for the auto-selection pytest / sf10 probe
        graph_clustering_coefficient.last_auto_stripes = scale_stripes
        graph_clustering_coefficient.last_auto_est_bytes = est_bytes
    adj_s = adj.select(F.col("s"), F.col("nbrs").alias("nbrs_s"))
    adj_t = adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nbrs_t"))

    def _tri_counts(edge_frame):
        tri_nodes = (
            edge_frame.join(adj_s, "s")
            .join(adj_t, "t", "left")
            .select(
                "s",
                "t",
                F.explode(
                    F.array_intersect(
                        "nbrs_s",
                        F.coalesce(
                            "nbrs_t", F.array().cast("array<bigint>")
                        ),
                    )
                ).alias("w"),
            )
        )
        return (
            tri_nodes.select(F.col("s").alias("node"))
            .unionAll(tri_nodes.select(F.col("t").alias("node")))
            .unionAll(tri_nodes.select(F.col("w").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("tri"))
        )

    if scale_stripes > 1:
        # sequential stripes on pmod(s, K): each pass ships 1/K of the
        # adjacency-array join volume (peak local disk divides by K);
        # the staged per-stripe partial counts are disjoint-edge
        # attributions, so summing them reproduces the one-pass answer
        # exactly.
        partials = []
        for k in range(scale_stripes):
            partials.append(
                stage(
                    _tri_counts(
                        oriented.where(
                            F.pmod(F.col("s"), F.lit(scale_stripes)) == k
                        )
                    )
                )
            )
            # the whole point of striping is PEAK disk: a finished
            # stripe's shuffle files are garbage once its partial is
            # checkpointed, but Spark's ContextCleaner only deletes
            # them after a JVM GC (periodicGC defaults to 30 min) —
            # force one so stripe k's spill is gone before k+1 writes.
            # _jvm is a classic-session py4j bridge; under Spark
            # Connect it is absent, so degrade to relying on
            # spark.cleaner.periodicGC.interval rather than crashing
            # (ADVICE r12 #4).
            jvm = getattr(spark, "_jvm", None)
            if jvm is not None:
                jvm.System.gc()
        acc = partials[0]
        for part in partials[1:]:
            acc = acc.unionAll(part)
        per_node = acc.groupBy("node").agg(F.sum("tri").alias("tri"))
    else:
        per_node = _tri_counts(oriented)
    cc = (
        deg.where(F.col("d") >= 2)
        .join(per_node, "node", "left")
        .select(
            F.expr(
                "2000000 * COALESCE(tri, 0) div (d * (d - 1))"
            ).alias("cc_ppm")
        )
    )
    from ..common import stage as _stage

    cc = _stage(cc)
    tot = cc.agg(
        F.count("*").cast("long").alias("n_nodes_total"),
        F.expr("SUM(cc_ppm) div COUNT(*)").cast("long").alias("avg_cc_ppm"),
    )
    return (
        cc.select(
            F.least(F.expr("cc_ppm div 100000"), F.lit(9))
            .cast("long")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_nodes",
            F.expr("n_nodes * 1000000 div n_nodes_total")
            .cast("long")
            .alias("share_ppm"),
            "avg_cc_ppm",
            "n_nodes_total",
        )
        .orderBy("decile")
    )


@register(
    "graph_assortativity",
    # Degree assortativity (Newman 2002, public) of the part co-purchase
    # graph — do high-degree parts co-occur with other high-degree parts?
    # r = (4·M·S1 − S2²) / (2·M·S3 − S2²) with S1 = Σ_e d_u d_v,
    # S2 = Σ_e (d_u + d_v), S3 = Σ_e (d_u² + d_v²) — ALL exact integers
    # (HUGEINT/DECIMAL(38,0): d_u·d_v per edge times |E| edges passes
    # int64 near sf1 — the r10 hazard class); r is one deterministic
    # double composition of the four exact sums, ROUND(6).  The k_nn
    # curve (avg neighbour degree per log2 degree class) rides as exact
    # integer ppm divisions on the endpoint frame.
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), ed AS (
      SELECT du.d AS du, dv.d AS dv
      FROM pairs p
      JOIN deg du ON p.u = du.node
      JOIN deg dv ON p.v = dv.node
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CAST(du AS HUGEINT) * dv) AS s1,
             SUM(CAST(du AS HUGEINT) + dv) AS s2,
             SUM(CAST(du AS HUGEINT) * du + CAST(dv AS HUGEINT) * dv)
               AS s3
      FROM ed
    ), gstat AS (
      SELECT m,
             CASE WHEN 2 * CAST(m AS HUGEINT) * s3 - s2 * s2 <> 0
                  THEN ROUND((4 * CAST(m AS DOUBLE) * CAST(s1 AS DOUBLE)
                         - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                        / (2 * CAST(m AS DOUBLE) * CAST(s3 AS DOUBLE)
                           - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)), 6)
                  ELSE NULL END
               AS r_assort
      FROM sums
    ), endpoints AS (
      SELECT du AS d_self, dv AS d_nbr FROM ed
      UNION ALL
      SELECT dv, du FROM ed
    )
    SELECT CAST(length(bin(d_self)) - 1 AS BIGINT) AS degree_class,
           CAST(COUNT(*) AS BIGINT) AS n_endpoints,
           CAST(SUM(CAST(d_nbr AS HUGEINT)) * 1000000 // COUNT(*)
                AS BIGINT) AS avg_nbr_degree_ppm,
           MAX(g.m) AS m_edges,
           MAX(g.r_assort) AS r_assort
    FROM endpoints CROSS JOIN gstat g
    GROUP BY 1 ORDER BY degree_class
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph — Newman's
    (2002) Pearson correlation of endpoint degrees over edges, the
    one-number answer to 'do hubs link to hubs?' (social graphs are
    assortative r>0; technological/biological graphs disassortative
    r<0; the fixture's co-purchase graph is degree-neutral like a
    random graph, r ≈ 0.0016 at sf0.01 — an honest structural null).
    Reported with the k_nn(class) curve — average neighbour degree per
    log2 degree class — whose slope is the classic visual companion of
    the scalar r (flat = neutral, rising = assortative).  A
    degree-regular graph (single clique) zeroes the exact denominator
    2·M·S3 − S2² — r_assort is NULL there, per the degenerate-input
    convention of the r11 siblings (pytest-pinned on a planted clique).

    Exactness: S1/S2/S3 ride as HUGEINT/DECIMAL(38,0) sums of exact
    integer degree products (d_u·d_v ≈ 1e12 per edge at hub scale ×
    1e10 edges passes int64 — the r10 hazard class); r is ONE
    deterministic double composition of the four exact sums (left-
    associated identically in both engines), ROUND(6); degree classes
    come from length(bin(d)) − 1 = floor(log2 d) — exact integer on
    both engines, zero libm; the k_nn average is one integer ppm
    division.

    Scale notes: the pair/degree frames are the graph_triangle_count
    posture (co-purchase pairs staged once, degree join is two keyed
    shuffles); the endpoint frame is 2|E| narrow rows feeding ONE
    bounded rollup (≤64 log2 classes); scalar sums broadcast-cross
    onto it.  No windows, no driver loops."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.alias("a")
    b = l.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    from ..common import stage

    pairs = stage(pairs)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    ed = (
        pairs.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select("du", "dv")
    )
    ed = stage(ed)
    sums = ed.agg(
        F.count("*").cast("long").alias("m"),
        F.expr("SUM(CAST(du AS DECIMAL(38,0)) * dv)").alias("s1"),
        F.expr("SUM(CAST(du AS DECIMAL(38,0)) + dv)").alias("s2"),
        F.expr(
            "SUM(CAST(du AS DECIMAL(38,0)) * du"
            " + CAST(dv AS DECIMAL(38,0)) * dv)"
        ).alias("s3"),
    )
    glob = sums.select(
        "m",
        # Degenerate-input guard (ADVICE r11): a degree-REGULAR graph
        # (e.g. one clique) zeroes the EXACT integer denominator
        # 2·M·S3 − S2², so r is undefined — emit NULL per the sibling
        # convention (agg_mcnemar / agg_gamma_gk), never NaN.  The test
        # runs on the exact DECIMAL(38,0) sums, not the doubles, so a
        # tiny-but-nonzero denominator can't round to a false zero.
        F.when(
            F.expr("2 * CAST(m AS DECIMAL(38,0)) * s3 - s2 * s2")
            != F.lit(0),
            F.round(
                (
                    4
                    * F.col("m").cast("double")
                    * F.col("s1").cast("double")
                    - F.col("s2").cast("double") * F.col("s2").cast("double")
                )
                / (
                    2
                    * F.col("m").cast("double")
                    * F.col("s3").cast("double")
                    - F.col("s2").cast("double") * F.col("s2").cast("double")
                ),
                6,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("r_assort"),
    )
    endpoints = ed.select(
        F.col("du").alias("d_self"), F.col("dv").alias("d_nbr")
    ).unionAll(
        ed.select(F.col("dv").alias("d_self"), F.col("du").alias("d_nbr"))
    )
    return (
        endpoints.select(
            F.expr("CAST(length(bin(d_self)) - 1 AS BIGINT)").alias(
                "degree_class"
            ),
            "d_nbr",
        )
        .groupBy("degree_class")
        .agg(
            F.count("*").cast("long").alias("n_endpoints"),
            F.expr(
                "CAST(SUM(CAST(d_nbr AS DECIMAL(38,0))) * 1000000"
                " div COUNT(1) AS BIGINT)"
            ).alias("avg_nbr_degree_ppm"),
        )
        .crossJoin(F.broadcast(glob))
        .select(
            "degree_class",
            "n_endpoints",
            "avg_nbr_degree_ppm",
            F.col("m").alias("m_edges"),
            "r_assort",
        )
        .orderBy("degree_class")
    )


@register(
    "graph_modularity",
    # Newman–Girvan modularity (2004, public) of the NATION partition
    # over the customer↔supplier trade graph: Q = Σ_c [e_c/m −
    # (D_c/2m)²] = Σ_c (4m·e_c − D_c²) / (4m²) — does trade stay inside
    # nations more than a degree-matched random graph would?  Every
    # term (m, per-nation degree totals D_c, intra edges e_c) is an
    # exact HUGEINT/DECIMAL(38,0) integer; Q and the per-nation
    # contributions are single deterministic double divisions of exact
    # integers, ROUND(6).
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), lab AS (
      SELECT c.c_nationkey AS cn, s.s_nationkey AS sn
      FROM edges e
      JOIN customer c ON e.ck = c.c_custkey
      JOIN supplier s ON e.sk = s.s_suppkey
    ), m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM lab),
    deg AS (
      SELECT nation, CAST(SUM(d) AS HUGEINT) AS d_tot FROM (
        SELECT cn AS nation, COUNT(*) AS d FROM lab GROUP BY 1
        UNION ALL
        SELECT sn, COUNT(*) FROM lab GROUP BY sn
      ) GROUP BY 1
    ), intra AS (
      SELECT cn AS nation, CAST(COUNT(*) AS HUGEINT) AS e_in
      FROM lab WHERE cn = sn GROUP BY 1
    ), per AS (
      SELECT d.nation, d.d_tot, COALESCE(i.e_in, 0) AS e_in
      FROM deg d LEFT JOIN intra i ON d.nation = i.nation
    ), tot AS (
      SELECT SUM(4 * (SELECT m FROM m) * e_in - d_tot * d_tot) AS num
      FROM per
    )
    SELECT CAST(p.nation AS BIGINT) AS nation,
           CAST(p.d_tot AS BIGINT) AS d_total,
           CAST(p.e_in AS BIGINT) AS e_intra,
           ROUND(CAST(4 * m.m * p.e_in - p.d_tot * p.d_tot AS DOUBLE)
                 / CAST(4 * m.m * m.m AS DOUBLE), 6) AS contribution,
           CAST(m.m AS BIGINT) AS m_edges,
           ROUND(CAST(t.num AS DOUBLE)
                 / CAST(4 * m.m * m.m AS DOUBLE), 6) AS q_modularity
    FROM per p CROSS JOIN m CROSS JOIN tot t
    ORDER BY nation
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman–Girvan modularity of the nation partition over the
    customer↔supplier trade graph — the quantitative answer to 'do
    nations form trade communities?': Q > 0 means intra-nation edges
    exceed the degree-matched random expectation, Q < 0 means trade
    actively avoids the home nation, Q ≈ 0 means nations don't
    structure trade at all.  The fixture assigns nations independently
    of trade, so Q ≈ −0.003 at sf0.01 (an honest structural null —
    and the statistic the label-propagation communities would be
    scored by in production); the planted pytests pin the exact poles:
    a perfectly nation-aligned graph recovers the hand-computed
    1 − Σ(D_c/2m)², a strictly cross-nation bipartite graph the
    negative −Σ(D_c/2m)².

    Exactness: m, per-nation degree totals D_c (each edge adds 1 to
    its customer's nation and 1 to its supplier's — no per-node frame
    needed) and intra-edge counts e_c are exact
    HUGEINT/DECIMAL(38,0) integers (4m·e_c ≈ 4e20 at sf1 passes
    int64 — the r10 hazard class); per-nation contributions and Q are
    single deterministic double divisions, ROUND(6); the global Q
    sums INTEGERS before the one division (never a float sum).

    Scale notes: distinct-edge agg (one shuffle on (cust, supp)), two
    broadcast dim joins for the nation labels, then THREE bounded
    rollups (≤|nations| rows each) + 1-row scalar crosses.  No
    windows, no iteration."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    lab = (
        edges.join(F.broadcast(c), edges.ck == c.c_custkey)
        .join(F.broadcast(s), edges.sk == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("cn"), F.col("s_nationkey").alias("sn")
        )
    )
    from ..common import stage

    lab = stage(lab)
    m = lab.agg(F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("m"))
    deg = (
        lab.select(F.col("cn").alias("nation"))
        .unionAll(lab.select(F.col("sn").alias("nation")))
        .groupBy("nation")
        .agg(F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("d_tot"))
    )
    intra = (
        lab.where(F.col("cn") == F.col("sn"))
        .groupBy(F.col("cn").alias("nation"))
        .agg(F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("e_in"))
    )
    per = deg.join(intra, "nation", "left").select(
        "nation",
        "d_tot",
        F.coalesce("e_in", F.lit(0).cast("decimal(38,0)")).alias("e_in"),
    )
    per_m = per.crossJoin(F.broadcast(m))
    tot = per_m.agg(
        F.sum(
            F.expr("4 * m * e_in - d_tot * d_tot")
        ).alias("num")
    )
    return (
        per_m.crossJoin(F.broadcast(tot))
        .select(
            F.col("nation").cast("long").alias("nation"),
            F.col("d_tot").cast("long").alias("d_total"),
            F.col("e_in").cast("long").alias("e_intra"),
            F.round(
                F.expr(
                    "CAST(4 * m * e_in - d_tot * d_tot AS DOUBLE)"
                )
                / F.expr("CAST(4 * m * m AS DOUBLE)"),
                6,
            ).alias("contribution"),
            F.col("m").cast("long").alias("m_edges"),
            F.round(
                F.col("num").cast("double")
                / F.expr("CAST(4 * m * m AS DOUBLE)"),
                6,
            ).alias("q_modularity"),
        )
        .orderBy("nation")
    )


@register(
    "graph_rich_club",
    # Rich-club coefficient (Zhou–Mondragón 2004, public) of the part
    # co-purchase graph: for each log2 degree threshold k, are the
    # hubs (d > k) more densely interconnected than a random graph
    # could be?  φ(k) = 2·E_k / (N_k(N_k−1)) with E_k = edges whose
    # ENDPOINT-MINIMUM degree exceeds k and N_k = nodes above k — both
    # computed as SUFFIX SUMS over bounded log2-class histograms, so
    # the whole curve costs two ≤64-row rollups after the degree join.
    # Exact integers end to end; φ rides as one integer ppm division;
    # N_k < 2 yields NULL (no pairs to close) on both engines.
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), node_cls AS (
      SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS cls,
             CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg GROUP BY 1
    ), edge_cls AS (
      SELECT CAST(length(bin(LEAST(du.d, dv.d))) - 1 AS BIGINT) AS cls,
             CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM pairs p
      JOIN deg du ON p.u = du.node
      JOIN deg dv ON p.v = dv.node
      GROUP BY 1
    ), grid AS (
      SELECT cls FROM node_cls
      UNION SELECT cls FROM edge_cls
    ), suffix AS (
      SELECT g.cls,
             CAST(COALESCE((SELECT SUM(n.n_nodes) FROM node_cls n
                            WHERE n.cls >= g.cls), 0) AS BIGINT)
               AS n_rich,
             CAST(COALESCE((SELECT SUM(e.n_edges) FROM edge_cls e
                            WHERE e.cls >= g.cls), 0) AS BIGINT)
               AS e_rich
      FROM grid g
    )
    SELECT cls AS degree_class, n_rich, e_rich,
           CASE WHEN n_rich >= 2
                THEN CAST(2000000 * e_rich // (n_rich * (n_rich - 1))
                     AS BIGINT)
                ELSE NULL END AS phi_ppm
    FROM suffix ORDER BY degree_class
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient curve of the part co-purchase graph — do
    hub parts co-purchase preferentially with OTHER hubs?  φ(k) is the
    realized edge density among nodes of degree class ≥ k; a rising
    curve (φ → 1 at the top classes) is the 'rich club' signature of
    interlocked hubs, the texture `graph_assortativity`'s single r
    cannot resolve (a graph can be globally degree-neutral yet carry a
    tight hub club).  Computed at log2 degree thresholds so the whole
    curve is ≤64 rows at any corpus size.

    A node of class ≥ k has degree ≥ 2^k; an edge belongs to the class-k
    club iff the SMALLER endpoint degree reaches it, so club edge
    counts are the suffix sums of the min-endpoint-class histogram and
    club node counts the suffix sums of the degree-class histogram —
    two bounded rollups, no per-threshold passes.

    Exactness: degrees, class histograms and suffix sums are exact
    integers (length(bin(d))−1 = floor(log2 d), zero libm); φ is ONE
    integer ppm division; a club with fewer than two members yields
    NULL on both engines (no pairs to close is not a zero density).
    Law pytests: a clique's every class has φ = 1e6 exactly; a star's
    nontrivial clubs are singletons (NULL) while class 0 recovers the
    star's exact global density.

    Scale notes: the co-purchase pair/degree frames are the
    graph_assortativity posture (staged once, two keyed joins); both
    histograms are ≤64-row rollups and the suffix windows run on
    them.  Nothing after the degree join scales with the corpus."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.alias("a")
    b = l.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    from ..common import stage

    pairs = stage(pairs)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    node_cls = deg.groupBy(
        F.expr("CAST(length(bin(d)) - 1 AS BIGINT)").alias("cls")
    ).agg(F.count("*").cast("long").alias("n_nodes"))
    edge_cls = (
        pairs.join(
            deg.select(F.col("node").alias("u"), F.col("d").alias("du")),
            "u",
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("d").alias("dv")),
            "v",
        )
        .groupBy(
            F.expr(
                "CAST(length(bin(LEAST(du, dv))) - 1 AS BIGINT)"
            ).alias("cls")
        )
        .agg(F.count("*").cast("long").alias("n_edges"))
    )
    grid = node_cls.select("cls").unionAll(edge_cls.select("cls")).distinct()
    w_suf = (
        Window.orderBy(F.col("cls").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        grid.join(node_cls, "cls", "left")
        .join(edge_cls, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
        )
    )
    suffix = merged.select(
        "cls",
        F.sum("n_nodes").over(w_suf).cast("long").alias("n_rich"),
        F.sum("n_edges").over(w_suf).cast("long").alias("e_rich"),
    )
    return suffix.select(
        F.col("cls").alias("degree_class"),
        "n_rich",
        "e_rich",
        F.when(
            F.col("n_rich") >= 2,
            F.expr(
                "CAST(2000000 * e_rich div (n_rich * (n_rich - 1))"
                " AS BIGINT)"
            ),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("phi_ppm"),
    ).orderBy("degree_class")
