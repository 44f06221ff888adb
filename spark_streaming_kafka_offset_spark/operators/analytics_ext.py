"""Composite analytics, second batch — TPC-H Q4/Q7/Q13/Q17/Q19/Q22 shapes
plus cohort retention, adapted to the fixture schemas (FIXTURES.md: no
partsupp, no l_commitdate/l_receiptdate/l_shipmode, no c_phone — predicates
substitute columns that exist while keeping each query's *shape*: the join
topology, the aggregate-as-filter / EXISTS / disjunctive-pushdown pattern
that makes the plan interesting at 100 TB).

Money sums use exact DECIMAL arithmetic (common.py) so oracle hashes are
stable; thresholds derived from doubles are either exact by construction
(sums of integral doubles) or rearranged into integer/decimal comparisons
so no float quotient ever decides row membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..common import dec2, epoch_seconds, one, round_dec
from ..plans.registry import register
from ..session import load_table


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (order priority checking): EXISTS over the fact table →
    LEFT SEMI join.  The official predicate (commitdate < receiptdate) has
    no fixture columns, so the existence test is `some line was returned`.

    Scale notes: the semi join shuffles both sides on the order key once —
    the probe side is pre-filtered by the pushed date window, and a semi
    join never duplicates order rows (no post-join dedup needed, unlike a
    plain join + distinct).  The final priority agg is 5 groups —
    partial+final with near-zero wire traffic."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q7_volume_flows",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_12' AND nc.n_name = 'NATION_11')
        OR (ns.n_name = 'NATION_11' AND nc.n_name = 'NATION_12'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ns.n_name, nc.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """,
)
def q7_volume_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape (volume shipping): bidirectional nation-pair flows — the
    deepest dim chain in the suite (fact → orders → customer → nation on
    one leg, fact → supplier → nation on the other) with a cross-leg
    disjunction that can only be applied after both legs resolve.

    Scale notes: supplier/customer/nation are dims → all broadcast (the
    fact never shuffles for them); the single fact shuffle is the
    lineitem⋈orders key.  The nation-pair disjunction prunes via the two
    broadcast hash joins' build sides; grouping is (2 pairs × years) —
    tiny.  YEAR() is wall-clock field extraction, NTZ-safe."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")))
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_12"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(F.sum(dec2("l_extendedprice") * (one() - dec2("l_discount", 4))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer distribution): LEFT OUTER join with an extra
    join-side predicate (the official NOT LIKE on o_comment has no fixture
    column, so a priority filter plays the role), then a two-level
    aggregate: orders per customer, customers per order-count.  The
    COUNT(column) vs COUNT(*) distinction is load-bearing: unmatched
    customers must count 0, not 1.

    Scale notes: the outer join shuffles on custkey; the first aggregate
    reuses that partitioning (no extra exchange); the second aggregate's
    key space is tiny (distinct counts).  The join-side predicate lands in
    the orders scan, NOT as a post-join filter — a post-join filter would
    wrongly drop unmatched customers."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q17_small_quantity",
    oracle="""
    WITH brand_lines AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#3'
    ), thresh AS (
      SELECT l_partkey, AVG(l_quantity) * 0.3 AS t
      FROM brand_lines GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(b.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_extprice,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM brand_lines b JOIN thresh t ON b.l_partkey = t.l_partkey
    WHERE b.l_quantity < t.t
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (small-quantity-order revenue): per-part average quantity
    as a correlated threshold — the aggregate-feeds-filter-on-same-table
    pattern.  Restricting the threshold aggregate to the brand's lines
    first is semantics-preserving (the threshold is per-part, and the
    brand predicate is a part attribute) and shrinks the agg input ~25×.

    Float-parity note: l_quantity is integral-valued, so SUM/COUNT — and
    hence AVG — are exact in both engines regardless of partition order;
    `avg * 0.3` is then the same double on both sides, and the `<`
    comparison cannot flip.  The output sum is exact DECIMAL.  The final
    sum avoids the official /7.0 float quotient (engine-dependent last-ulp
    rounding) by reporting the exact sum and count instead."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = brand_lines.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.3).alias("t")
    )
    return (
        brand_lines.join(thresh, "l_partkey")
        .where(F.col("l_quantity") < F.col("t"))
        .agg(
            F.round(F.sum(dec2("l_extendedprice")), 2)
            .cast("double")
            .alias("total_extprice"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_pred",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (discounted revenue): an OR-of-ANDs predicate spanning
    both join sides — the classic test that the optimizer derives the
    single-side residuals.  Catalyst pushes
    `p_brand IN (…)`+size bounds to the part scan and the quantity range
    union to the lineitem scan, then re-applies the exact disjunction
    after the join; the join itself stays a broadcast hash join on
    partkey (part is dim-sized), never a cartesian."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(dec2("l_extendedprice") * (one() - dec2("l_discount", 4))), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(14,2)) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (global sales opportunity): above-average balances with
    no *recent* orders — scalar aggregate subquery + NOT EXISTS anti join,
    grouped by segment (standing in for the official phone-prefix country
    code).  "Idle" is no-orders-since-2000 rather than no-orders-ever:
    the fixture generator gives every customer at least one order, so the
    official predicate would be vacuously empty (0 rows proves nothing);
    the date-filtered anti join keeps the identical plan shape with a
    non-trivial result.

    Float-parity note: `c_acctbal > AVG(c_acctbal)` would let a float
    quotient decide membership (partition-order last-ulp drift), so the
    inequality is rearranged to `acctbal * n > sum` with both sides exact
    DECIMAL — no division anywhere.

    Scale notes: the 1-row (sum, count) aggregate broadcasts into the
    filter (a broadcast nested-loop over 1 row, output-sized); the anti
    join shuffles on custkey — orders needs only its key column, pruned
    at the scan."""
    c = load_table(spark, sf_dir, "customer")
    pos = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.sum(dec2("c_acctbal", 14)).alias("s"), F.count("*").alias("n"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(pos))
        .where(dec2("c_acctbal", 14) * F.col("n") > F.col("s"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(dec2("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


@register(
    "cohort_retention",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS d FROM events
    ), f AS (
      SELECT user_id, MIN(d) AS first_d FROM d GROUP BY user_id
    )
    SELECT CAST(date_trunc('week', f.first_d) AS DATE) AS cohort_week,
           CAST(date_diff('day', f.first_d, d.d) // 7 AS BIGINT) AS week_no,
           CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
    FROM d JOIN f ON d.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over events: users grouped by first-seen
    week (the cohort), counted distinct in each subsequent activity week.
    The product-analytics staple next to `events_funnel` / `sessionize_batch`.

    Shape: one aggregate builds the per-user first date, a self-join tags
    every activity day with its cohort, and a distinct-count collapses to
    (cohort_week × week_no).  All three steps shuffle on user_id — one
    partitioning reused end-to-end; the final matrix is weeks² rows.
    Week arithmetic is date-level (NTZ-safe, timezone-free): both engines
    truncate to Monday and floor-divide day deltas, which are never
    negative (d ≥ first_d by construction)."""
    d = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    f = d.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        d.join(f, "user_id")
        .groupBy(
            F.date_trunc("week", F.col("first_d")).cast("date").alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("first_d")) / 7).alias("week_no"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY COUNT(*) DESC, lang) AS rn
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang AS modal_lang, n AS n_docs
    FROM c WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value per group (most frequent lang per source) — the MODE()
    aggregate expressed as count → rank → keep-first, with a
    deterministic lexical tie-break (a bare MODE() is engine-dependent on
    ties, which is exactly why it is spelled out).

    Scale notes: the count aggregate collapses to (source × lang) rows —
    partial+final, so the shuffle is combination-sized, not row-sized —
    and the rank window runs on that tiny frame.  This is the standard
    scalable mode: never a per-group collect."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
    return (
        counts.select(
            "source", "lang", "n", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("modal_lang"), F.col("n").alias("n_docs"))
    )


@register(
    "interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) // 1000000
               - LAG(epoch_us(ts) // 1000000)
                 OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM g GROUP BY event_type
    """,
)
def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time profile per event type: gaps between successive
    events of the same (user, type) in whole seconds — the
    frequency/burstiness diagnostic behind rate limiting and session-gap
    tuning (sessionize_batch's 30-minute threshold comes from exactly
    this query's distribution).

    All integer arithmetic: gaps are differences of floored epoch
    seconds (``epoch_seconds`` — wall-clock field math, NTZ-safe), so
    COUNT/SUM/MIN/MAX are exact in both engines.  One shuffle on
    (user_id — the window key); the final agg is event-type-sized."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    es = epoch_seconds("ts")
    g = e.select(
        "event_type", (es - F.lag(es).over(w)).alias("gap_s")
    )
    return g.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.sum("gap_s").alias("sum_gap_s"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(CASE WHEN ns.n_name = 'NATION_3'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
             AS nation_revenue,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY CAST(YEAR(o.o_orderdate) AS INT)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): one supplier nation's share of a
    region's revenue by year.  The share itself is a float quotient, so
    the query returns the two exact decimal sums (numerator and
    denominator) and leaves the division to the caller — the oracle then
    compares exact values only.

    Scale notes: six tables, one fact — every non-fact join broadcasts
    (customer→nation→region prunes the customer side; supplier→nation
    tags the revenue side); the conditional sum folds the share
    numerator into the same partial+final aggregate as the denominator,
    so the fact is read and shuffled exactly once."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_in_region = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(
            n.select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name")),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "n_name")
    )
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(zero)), 2)
            .cast("double")
            .alias("nation_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT ns.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                  - CAST(l.l_quantity AS DECIMAL(12,2))
                    * CAST(p.p_retailprice AS DECIMAL(12,2))
                    * CAST(0.8 AS DECIMAL(2,1))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY ns.n_name, CAST(YEAR(o.o_orderdate) AS INT)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): profit per supplier nation per
    year over a part-name pattern.  The official cost term is
    ps_supplycost (no partsupp fixture), so cost is modeled as 80% of
    the part's retail price — the join topology and the
    revenue-minus-cost aggregate are unchanged.

    Scale notes: part (name-filtered) and supplier→nation broadcast;
    orders arrives via the fact's one shuffle on l_orderkey.  The LIKE
    pattern stays in the part scan.  All money terms exact decimal —
    the subtraction stays in decimal space so the oracle hash is
    stable."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    sn = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("sn_key"), F.col("n_name")
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = dec2("l_extendedprice") * (one() - dec2("l_discount", 4)) - dec2(
        "l_quantity"
    ) * dec2("p_retailprice") * F.lit(0.8).cast("decimal(2,1)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@register(
    "q11_top_nations",
    oracle="""
    WITH by_nation AS (
      SELECT n.n_name, SUM(CAST(s.s_acctbal AS DECIMAL(14,2))) AS bal
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ), total AS (SELECT SUM(bal) AS t FROM by_nation)
    SELECT n_name,
           CAST(ROUND(bal, 2) AS DOUBLE) AS nation_bal
    FROM by_nation, total
    WHERE bal * 20 > t
    """,
)
def q11_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): groups whose share exceeds a global
    fraction — aggregate, then HAVING against a scalar subquery.  The
    official ps_supplycost·ps_availqty value has no partsupp fixture, so
    supplier account balances play the value role; the
    threshold-against-global-aggregate pattern is unchanged.  The 1/20
    fraction is applied as `bal * 20 > total` — exact decimal both
    sides, no float division.

    Scale notes: the per-nation aggregate is nations-sized; the global
    total is a 1-row frame broadcast into the filter.  At 100 TB the
    heavy step is the first aggregate — partial+final on the join key,
    with the dim broadcast."""
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    by_nation = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(dec2("s_acctbal", 14)).alias("bal"))
    )
    total = by_nation.agg(F.sum("bal").alias("t"))
    return (
        by_nation.join(F.broadcast(total))
        .where(F.col("bal") * 20 > F.col("t"))
        .select("n_name", F.round(F.col("bal"), 2).cast("double").alias("nation_bal"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_rev
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier): a revenue view reused twice — once for
    the per-supplier aggregate, once for its global MAX — and an
    equality filter that keeps ALL tied maxima (the official semantics;
    a LIMIT 1 would silently drop ties).  The comparison is on the
    exact decimal revenue, rounded only for output.

    Scale notes: the revenue aggregate is supplier-sized; its MAX is a
    1-row broadcast; the supplier dim joins broadcast.  Spark computes
    the view once per reference (twice) — both passes are
    partial+final over the date-pruned scan; a production run would
    cache/stage the view, the same trade staged_minhash documents."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec2("l_extendedprice") * (one() - dec2("l_discount", 4))).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_rev"),
        )
    )


@register(
    "q12_priority_split",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'N'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping-mode priority split): per-category counts of
    high- vs low-priority order lines — the two CASE sums ride in one
    aggregate.  The official l_shipmode has no fixture column, so
    l_linestatus provides the grouping and the returnflag/date window
    the line filter; the join-then-conditional-count pattern is
    unchanged.

    Scale notes: both scans pruned (flag + date window pushed), one
    shuffle on the order key, both CASE sums in the same partial+final
    agg — two rows out."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_linestatus")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (part/supplier relationship): distinct supplier counts
    per part attribute, excluding a blacklisted supplier set.  The
    official partsupp link has no fixture — lineitem's
    (l_partkey, l_suppkey) IS the observed part-supplier relation — and
    negative account balances play the "complaints" blacklist.

    Scale notes: the blacklist is dim-sized → broadcast ANTI join (a
    NOT IN over a nullable column would be a null-trap; s_suppkey is a
    key, and the anti join sidesteps the semantics entirely); part is
    filter-pruned then broadcast; COUNT(DISTINCT) shuffles once on the
    group keys with the distinct folded into the aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_volume_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ), pt AS (
      SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
    FROM pq
    JOIN pt ON pq.l_partkey = pt.l_partkey
    JOIN supplier s ON pq.l_suppkey = s.s_suppkey
    WHERE pq.sq * 2 > pt.tq
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (excess/dominant inventory): suppliers who shipped more
    than half of a part's total quantity in the window — the
    share-of-aggregate threshold pattern (official: availqty > 50% of
    shipped; no partsupp fixture, so dominance over the shipped total
    plays the role).  `sq·2 > tq` keeps the half-share test in exact
    decimal space.

    Scale notes: the two aggregates share the l_partkey grouping — the
    second is a rollup of the first (combination-sized input); the join
    back is co-partitioned on l_partkey so AQE plans it shuffle-free
    from the agg output; the supplier dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(dec2("l_quantity")).alias("sq"))
    pt = pq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        pq.join(pt, "l_partkey")
        .where(F.col("sq") * 2 > F.col("tq"))
        .join(s, pq.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_dominant_parts"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): the sole-blame
    pattern — a returned line on a finished multi-supplier order where
    NO other supplier also returned.  EXISTS + NOT EXISTS against the
    same fact, correlated on the order key with a supplier inequality —
    the hardest subquery shape in the suite (official predicate uses
    receiptdate>commitdate; returnflag plays the "late" role).

    Scale notes: both existence tests compile to LEFT SEMI / LEFT ANTI
    joins equi-keyed on l_orderkey with the suppkey inequality as the
    join residual — all three fact passes shuffle on the SAME key, so
    the partitioning is computed once and reused; the supplier dim
    broadcasts and top-20 fuses to TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sk")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        l1.join(o, l1.k == o.o_orderkey, "left_semi")
        .join(l2, (F.col("k") == F.col("k2")) & (F.col("sk") != F.col("sk2")), "left_semi")
        .join(l3, (F.col("k") == F.col("k3")) & (F.col("sk") != F.col("sk3")), "left_anti")
        .join(s, F.col("sk") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "ts_similarity_topk",
    oracle="""
    WITH hc AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, date_trunc('hour', ts)
    ), tot AS (
      SELECT user_id, CAST(SUM(n) AS BIGINT) AS total,
             len(CAST(SUM(n) AS VARCHAR)) AS bucket
      FROM hc GROUP BY user_id
    ), q AS (
      SELECT user_id AS qa, total AS ta, bucket FROM tot WHERE user_id % 20 = 0
    ), cand AS (
      SELECT q.qa, t.user_id AS cb, q.ta, t.total AS tb
      FROM q JOIN tot t ON q.bucket = t.bucket AND q.qa <> t.user_id
    ), common AS (
      SELECT c.qa, c.cb, c.ta, c.tb,
             SUM(LEAST(a.n, b.n)) AS s
      FROM cand c
      JOIN hc a ON a.user_id = c.qa
      JOIN hc b ON b.user_id = c.cb AND b.h = a.h
      GROUP BY c.qa, c.cb, c.ta, c.tb
    ), dist AS (
      SELECT qa, cb, CAST(ta + tb - 2 * s AS BIGINT) AS l1,
             ROW_NUMBER() OVER (PARTITION BY qa
                                ORDER BY ta + tb - 2 * s, cb) AS rn
      FROM common
    )
    SELECT qa AS query_user, cb AS similar_user, l1 FROM dist WHERE rn <= 3
    """,
)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the EDBT'19 streaming-similarity
    theme, discretized): for each query user, the 3 users with the most
    similar hourly activity series by exact L1 distance.

    The trick that keeps it exact AND join-shaped: with per-hour counts
    and missing hours ≡ 0,  ``L1(a,b) = total_a + total_b − 2·Σ_common
    min(n_a, n_b)`` — only hours BOTH users were active contribute to
    the sum, so an inner equi-join on the hour within candidate pairs
    suffices (no dense-vector materialization, no full outer join).
    All integer arithmetic end to end.

    Scale notes: candidates are blocked by total-activity magnitude
    (decimal digit count — exact, unlike float log2 which can flip at
    power boundaries), so the pair space is bucket-local, the hour join
    is output-sized, and the final top-k is a rank window per query
    user.  At 100 TB the block key would add a coarse time-range
    component; the shape is unchanged."""
    e = load_table(spark, sf_dir, "events")
    hc = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("n"))
    tot = hc.groupBy("user_id").agg(F.sum("n").alias("total")).select(
        "user_id",
        "total",
        F.length(F.col("total").cast("string")).alias("bucket"),
    )
    q = tot.where(F.col("user_id") % 20 == 0).select(
        F.col("user_id").alias("qa"), F.col("total").alias("ta"), "bucket"
    )
    cand = q.join(
        tot.select(F.col("user_id").alias("cb"), F.col("total").alias("tb"), "bucket"),
        on=["bucket"],
    ).where(F.col("qa") != F.col("cb"))
    a = hc.select(F.col("user_id").alias("qa"), F.col("h").alias("ha"), F.col("n").alias("na"))
    b = hc.select(F.col("user_id").alias("cb2"), F.col("h").alias("hb"), F.col("n").alias("nb"))
    common = (
        cand.join(a, "qa")
        .join(b, (F.col("cb") == F.col("cb2")) & (F.col("ha") == F.col("hb")))
        .groupBy("qa", "cb", "ta", "tb")
        .agg(F.sum(F.least("na", "nb")).alias("s"))
    )
    from pyspark.sql.window import Window as W

    dist = common.select(
        "qa",
        "cb",
        (F.col("ta") + F.col("tb") - 2 * F.col("s")).cast("long").alias("l1"),
    )
    w = W.partitionBy("qa").orderBy("l1", "cb")
    return (
        dist.select("qa", "cb", "l1", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .select(
            F.col("qa").alias("query_user"),
            F.col("cb").alias("similar_user"),
            "l1",
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), pse AS (
      SELECT ps.l_partkey, ps.cost, eu.s_name, eu.s_acctbal, eu.n_name
      FROM ps
      JOIN eu ON ps.l_suppkey = eu.s_suppkey
      JOIN part p ON ps.l_partkey = p.p_partkey
      WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
    ), mc AS (
      SELECT l_partkey, MIN(cost) AS min_cost FROM pse GROUP BY l_partkey
    )
    SELECT CAST(ROUND(pse.s_acctbal, 2) AS DOUBLE) AS s_acctbal,
           pse.s_name, pse.n_name,
           pse.l_partkey AS p_partkey,
           CAST(pse.cost AS DOUBLE) AS cost
    FROM pse JOIN mc
      ON pse.l_partkey = mc.l_partkey AND pse.cost = mc.min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier) — the last uncovered TPC-H
    pattern, partsupp-free: lineitem IS the observed part-supplier
    relation (as q16/q21 already use it), and a part's supply cost from
    a supplier is the cheapest line price ever observed for the pair —
    MIN over exact DECIMAL, no division, no float.  The shape is intact:
    a correlated per-part minimum over a region-restricted supply
    relation, ties KEPT by equality join-back (Q15's tied-maxima
    discipline), supplier detail output ordered by account balance.

    Scale notes: the (part, supplier) aggregate is the only fact-sized
    shuffle; the per-part min table is at most |filtered parts| rows,
    so it BROADCASTS into the equality join-back — without the hint
    Catalyst planned an SMJ with two extra exchanges on (partkey, cost)
    (plan-audited).  Region/nation/part dims broadcast; the part filter
    lands before the min so the heavy aggregate's output is pruned
    part-first.  Like q15, the supply view is computed once per
    reference (twice) — a production run would stage it.
    TakeOrderedAndProject caps the result; the (s_acctbal, n_name,
    s_name, p_partkey) sort is a total order — (partkey, suppkey) is
    unique in the supply relation, so the LIMIT cut is deterministic in
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec2("l_extendedprice")).alias("cost")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    pse = (
        ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .join(F.broadcast(p.select("p_partkey")), ps.l_partkey == F.col("p_partkey"))
        .select("l_partkey", "cost", "s_name", "s_acctbal", "n_name")
    )
    mc = pse.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        pse.join(
            F.broadcast(mc.withColumnRenamed("l_partkey", "mc_partkey")),
            (pse.l_partkey == F.col("mc_partkey")) & (pse.cost == F.col("min_cost")),
        )
        .select(
            F.round(F.col("s_acctbal"), 2).cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences — the next-event-prediction / user-journey table behind
    funnels and session-flow diagrams (row-normalizing n gives the
    transition matrix; the exact counts are returned so no float ever
    decides the hash).

    Scale notes: one LEAD window on the user_id partitioning (single
    fact shuffle), then a partial+final agg that collapses to the
    |types|² transition matrix before the second (tiny) exchange.  The
    (ts, event_id) sort key is a total order per user, so sequence
    construction is engine-deterministic even with same-timestamp
    events."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    return seq.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))


@register(
    "orders_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, last_order, frequency, monetary,
             NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(monetary), 2) AS DOUBLE) AS segment_value
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def orders_rfm_segments(
    spark: SparkSession, sf_dir: str, *, scale_boundaries: bool = False
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) — the classic
    customer-value quartile grid: per-customer aggregates scored into
    quartiles on each axis, reported as segment sizes + exact segment
    value.

    Two physical strategies behind one API (VERDICT r4 #3):

    * ``scale_boundaries=False`` (default; the oracle twin): NTILE(4)
      windows with a (metric, o_custkey) TOTAL order — NTILE
      tie-handling is order-dependent, so without the key tiebreak the
      same data can legally produce different quartile boundaries per
      engine (measured; the oracle uses the identical order).  Monetary
      stays exact DECIMAL until the final ROUND.  The three global
      windows each funnel the customer frame through ONE partition —
      fine at fixture scale, the known wall at 100 TB.
    * ``scale_boundaries=True`` (the 100 TB path): quartile EDGES come
      from one `percentile_approx` pass (a 1-row, 9-number frame,
      broadcast back), and scoring is a CASE bucket lookup — no Window,
      no global Sort, no single-partition funnel of the customer frame;
      the only shuffles are the o_custkey aggregate and the tiny final
      segment agg.  Trade: boundary ties bucket by VALUE (NTILE splits
      tie runs by row order to force equal bins), so heavily-tied axes
      (integer frequency) can deviate from equal quarters — the honest
      behavior of every approx-quantile segmentation.
      tests/test_plans.py asserts the no-Window/no-Sort plan shape;
      the driver pair stays on the exact twin."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(dec2("o_totalprice", 14)).alias("monetary"),
    )
    if scale_boundaries:
        pcts = [0.25, 0.5, 0.75]
        bounds = rfm.agg(
            F.percentile_approx(F.unix_date(F.col("last_order").cast("date")), pcts, 10000).alias("rq"),
            F.percentile_approx("frequency", pcts, 10000).alias("fq"),
            F.percentile_approx(F.col("monetary").cast("double"), pcts, 10000).alias("mq"),
        )

        def bucket(metric, q):  # DESC quartiles: top quarter → score 1
            return (
                F.when(metric > q[2], 1)
                .when(metric > q[1], 2)
                .when(metric > q[0], 3)
                .otherwise(4)
            )

        scored = rfm.join(F.broadcast(bounds)).select(
            "monetary",
            bucket(F.unix_date(F.col("last_order").cast("date")), F.col("rq")).alias("r_score"),
            bucket(F.col("frequency"), F.col("fq")).alias("f_score"),
            bucket(F.col("monetary").cast("double"), F.col("mq")).alias("m_score"),
        )
    else:
        scored = rfm.select(
            "o_custkey",
            "monetary",
            F.ntile(4)
            .over(Window.orderBy(F.col("last_order").desc(), "o_custkey"))
            .alias("r_score"),
            F.ntile(4)
            .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
            .alias("f_score"),
            F.ntile(4)
            .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
            .alias("m_score"),
        )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("monetary"), 2).cast("double").alias("segment_value"),
    )


@register(
    "events_funnel_windowed",
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    qual_c AS (
      SELECT DISTINCT c.user_id, c.ts FROM c
      WHERE EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
                    AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR)
    ),
    chain_v AS (
      SELECT DISTINCT v.user_id FROM v
      WHERE EXISTS (SELECT 1 FROM qual_c q WHERE q.user_id = v.user_id
                    AND q.ts >= v.ts AND q.ts < v.ts + INTERVAL 1 HOUR)
    ),
    step2_v AS (
      SELECT DISTINCT v.user_id FROM v
      WHERE EXISTS (SELECT 1 FROM c WHERE c.user_id = v.user_id
                    AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 1 HOUR)
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM v) AS BIGINT) AS viewed,
           CAST((SELECT COUNT(*) FROM step2_v) AS BIGINT) AS clicked_1h,
           CAST((SELECT COUNT(*) FROM chain_v) AS BIGINT) AS purchased_chain_1h
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel (ClickHouse ``windowFunnel`` semantics, computed
    EXACTLY): a user converts iff SOME view→click→purchase chain exists
    with each step inside 1 h of the previous — not merely the first
    occurrences in order (`events_funnel`'s unbounded variant).
    Greedy first-qualifying-step evaluation is WRONG here: a later
    click can open a purchase window the earliest click misses, so
    chain existence needs the pair space — expressed as two chained
    LEFT SEMI joins evaluated back-to-front (purchase-qualified clicks
    first, then views with a qualified click in window).

    Scale notes: every join is an EQUI-join on user_id with the time
    window as a residual — per-user event groups bound the pair work,
    the same blocking discipline as the similarity ops; semi joins
    never duplicate rows, so no distinct is needed until the final
    user count.  Three funnel-stage counts fold into single aggregates
    over user-distinct frames."""
    e = load_table(spark, sf_dir, "events")

    def stage(t: str, a: str) -> DataFrame:
        return e.where(F.col("event_type") == t).select(
            F.col("user_id").alias(f"{a}_u"), F.col("ts").alias(f"{a}_ts")
        )

    v, c, p = stage("view", "v"), stage("click", "c"), stage("purchase", "p")
    hour = F.expr("INTERVAL 1 HOUR")
    qual_c = c.join(
        p,
        (F.col("p_u") == F.col("c_u"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + hour),
        "left_semi",
    )
    chain_v = v.join(
        qual_c,
        (F.col("c_u") == F.col("v_u"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") < F.col("v_ts") + hour),
        "left_semi",
    )
    step2_v = v.join(
        c,
        (F.col("c_u") == F.col("v_u"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") < F.col("v_ts") + hour),
        "left_semi",
    )
    return (
        v.agg(F.countDistinct("v_u").alias("viewed"))
        .join(F.broadcast(step2_v.agg(F.countDistinct("v_u").alias("clicked_1h"))))
        .join(
            F.broadcast(
                chain_v.agg(F.countDistinct("v_u").alias("purchased_chain_1h"))
            )
        )
    )


@register(
    "orders_abc_pareto",
    # Class boundaries tested with exact integer-scaled DECIMAL
    # comparisons (cum·5 ≤ total·4 for 80%, cum·20 ≤ total·19 for 95%) —
    # no cross-engine decimal-division scale rules anywhere near the
    # cutoff.
    oracle="""
    WITH rev AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS r
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT o_custkey, r,
               SUM(r) OVER (ORDER BY r DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(r) OVER () AS total
        FROM rev
    ), classed AS (
        SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                    WHEN cum * 20 <= total * 19 THEN 'B'
                    ELSE 'C' END AS abc_class, r, total
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(r), 2) AS DOUBLE) AS class_revenue,
           ROUND(CAST(SUM(r) AS DOUBLE) / CAST(ANY_VALUE(total) AS DOUBLE), 6)
             AS revenue_share
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of customers by revenue: rank by
    lifetime spend, cut at 80% / 95% cumulative share — the inventory-
    management staple (and the data-curation shape behind "which 20% of
    sources carry 80% of tokens").

    Scale notes: the windowed cumsum runs on the customer-level
    AGGREGATE (|customers| ≪ |orders| — the orders-sized shuffle is the
    groupBy, the global sort touches only the rollup, same posture as
    `orders_rfm_segments`'s documented boundary variant); money stays
    DECIMAL end-to-end and the 80/95 cuts are integer-scaled decimal
    inequalities, exact in both engines."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum(dec2("o_totalprice", 14)).alias("r"))
    w = Window.orderBy(F.col("r").desc(), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.select(
        "o_custkey", "r",
        F.sum("r").over(w).alias("cum"),
        F.sum("r").over(Window.partitionBy()).alias("total"),
    )
    classed = ranked.select(
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "r",
        "total",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("r"), 2).cast("double").alias("class_revenue"),
            F.round(
                F.sum("r").cast("double") / F.any_value("total").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


#: Truncated-EWMA coefficients α·(1−α)^k, α=0.3, K=20 — materialized as
#: repr() literals so BOTH engines parse the identical double constants
#: and the left-associated sum evaluates in the identical IEEE order.
_EWMA_COEFFS = tuple(repr(0.3 * 0.7**k) for k in range(20))


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"{c} * COALESCE(lag(value, {k}) OVER w, 0.0)"
        for k, c in enumerate(_EWMA_COEFFS)
    )
    return f"""
    SELECT event_id, user_id,
           ROUND({terms}, 6) AS ewma_value
    FROM events
    WHERE user_id < 30
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """


@register("events_ewma", oracle=_ewma_oracle())
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average of event value per
    user (α=0.3, horizon K=20, zero-padded before series start) — the
    streaming-metrics smoothing primitive, expressed as a bounded lag
    kernel instead of the unbounded recurrence y' = αx + (1−α)y.

    Why truncated: the exact recurrence needs either sequential state or
    a pow((1−α), −j) rescaling that overflows beyond ~700 rows; the
    K-term kernel is algebraically identical up to a (1−α)^K ≈ 8·10⁻⁴
    tail and keeps the whole computation inside ONE window frame — no
    UDF, no driver loop.  Both engines build the kernel from the same
    coefficient literals via the same codegen, so the float sum agrees
    bit-for-bit, far inside the 6-decimal rounding.

    Scale notes: single hash-partitioned window (user_id), 20 lags
    resolved in one frame pass over each partition — one shuffle total;
    per-user state is the 20-row frame, constant memory."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    acc = None
    for k, c in enumerate(_EWMA_COEFFS):
        term = F.lit(float(c)) * F.coalesce(
            F.lag("value", k).over(w), F.lit(0.0)
        )
        acc = term if acc is None else acc + term
    return e.select(
        "event_id", "user_id", F.round(acc, 6).alias("ewma_value")
    ).orderBy("user_id", "event_id")


@register(
    "events_anomaly_mad",
    # Median/MAD land on exact .5-step (median) / .25-step (MAD) binary
    # fractions of integer cents — both engines interpolate even-count
    # medians identically, so every comparison below is exact.
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS xc
      FROM events
    ), m AS (
      SELECT event_type, median(xc) AS med FROM c GROUP BY 1
    ), d AS (
      SELECT c.event_type, c.xc, m.med, ABS(c.xc - m.med) AS adev
      FROM c JOIN m USING (event_type)
    ), s AS (
      SELECT event_type, median(adev) AS mad FROM d GROUP BY 1
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(ANY_VALUE(d.med) / 100, 3) AS DOUBLE) AS median_value,
           CAST(ROUND(ANY_VALUE(s.mad) / 100, 3) AS DOUBLE) AS mad_value,
           CAST(SUM(CASE WHEN d.adev > 3 * s.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM d JOIN s USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type via median absolute deviation
    — the heavy-tail-safe twin of `events_outliers` (3-sigma breaks down
    when the outliers themselves inflate sigma; MAD's 50% breakdown
    point does not).

    Exactness: values become integer cents up front; an even-count
    median interpolates to a .5 step and the MAD to a .25 step — all
    exactly representable doubles, computed identically by both
    engines (probed: interpolating percentile-0.5 on both) — so the
    ``adev > 3·MAD`` comparison never sits on a float boundary.

    Scale notes: exact per-group median is the deliberate fixture
    semantic (bounded by per-type cardinality); the documented 100 TB
    path swaps both medians for ``approx_percentile`` (t-digest-style
    mergeable sketch, partial+final agg) — the outlier PREDICATE and
    the broadcast-back join shape are unchanged.  Two passes over
    events (stats + test), both scan-bound; only type-sized rows
    shuffle."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("xc")
    )
    med = e.groupBy("event_type").agg(F.median("xc").alias("med"))
    d = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("xc") - F.col("med"))
    )
    mad = d.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("med") / 100, 3).alias("median_value"),
            F.round(F.any_value("mad") / 100, 3).alias("mad_value"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_seasonality",
    # Day-of-week from pure date arithmetic — Spark's dayofweek
    # (Sunday=1) and DuckDB's dow (Sunday=0) disagree, so BOTH sides
    # compute (days_since_epoch + 4) % 7 (1970-01-01 was a Thursday;
    # Sunday=0) and no engine calendar function is trusted.
    oracle="""
    WITH o AS (
      SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01' + 4) % 7 AS dow,
             CAST(o_totalprice AS DECIMAL(14,2)) AS p
      FROM orders
    ), agg AS (
      SELECT dow, COUNT(*) AS n_orders, SUM(p) AS rev FROM o GROUP BY 1
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
           ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6)
             AS revenue_share
    FROM agg
    ORDER BY dow
    """,
)
def orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of order volume and revenue — the
    weekly-cycle decomposition behind capacity planning and
    batch-window scheduling (and, pipeline-side, behind "is this
    source's crawl cadence biased toward weekdays").

    Scale notes: one partial+final agg collapses orders to at most 7
    rows; the share window runs on that 7-row rollup (trivially
    single-partition by size, not by accident).  Day-of-week is
    integer date arithmetic — no calendar UDF, fully codegen'd, and
    engine-agnostic (Spark/DuckDB week-start conventions differ, so
    neither is used)."""
    o = load_table(spark, sf_dir, "orders")
    agg = (
        o.select(
            ((F.datediff("o_orderdate", F.lit("1970-01-01")) + 4) % 7).alias("dow"),
            dec2("o_totalprice", 14).alias("p"),
        )
        .groupBy("dow")
        .agg(F.count("*").alias("n_orders"), F.sum("p").alias("rev"))
    )
    return agg.select(
        F.col("dow").cast("long").alias("dow"),
        F.col("n_orders").cast("long").alias("n_orders"),
        round_dec(F.col("rev"), 2).alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum(F.col("rev")).over(Window.partitionBy()).cast("double"),
            6,
        ).alias("revenue_share"),
    ).orderBy("dow")


@register(
    "events_changepoint",
    # Split scoring and all three reported means use the integer
    # HALF-UP trick (decimal38/HUGEINT `div`, cf. resample_interp): the
    # argmax ranks on a shared deterministic double, every OUTPUT
    # number is integer-rounded — nothing sits on a float boundary.
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS HUGEINT) AS s,
             CAST(COUNT(*) AS HUGEINT) AS n
      FROM events GROUP BY 1, 2
    ), pre AS (
      SELECT event_type, hour,
             SUM(s) OVER w AS cs, SUM(n) OVER w AS cn,
             SUM(s) OVER wt AS ts_, SUM(n) OVER wt AS tn
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wt AS (PARTITION BY event_type)
    ), scored AS (
      SELECT event_type, hour, cs, cn, ts_, tn,
             ABS(cs * (tn - cn) - (ts_ - cs) * cn) AS num,
             cn * (tn - cn) AS den
      FROM pre WHERE cn < tn
    ), best AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC,
                        hour) AS rk
      FROM scored
    )
    SELECT event_type, hour AS split_hour,
           CAST(cn AS BIGINT) AS n_before, CAST(tn - cn AS BIGINT) AS n_after,
           CAST(((ABS(cs) * 2000000 + 100 * cn) // (200 * cn))
                AS DOUBLE) / 1000000.0 AS mean_before,
           CAST(((ABS(ts_ - cs) * 2000000 + 100 * (tn - cn))
                 // (200 * (tn - cn))) AS DOUBLE) / 1000000.0 AS mean_after,
           CAST(((num * 2000000 + 100 * den) // (200 * den))
                AS DOUBLE) / 1000000.0 AS mean_delta
    FROM best WHERE rk = 1
    ORDER BY event_type
    """,
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection per event type: the hour boundary
    that maximizes |mean(value) before − mean(value) after| — the
    binary-segmentation split step every drift monitor runs on metric
    streams (where did the level shift?).

    Formulated without recursion (CUSUM's sequential state does not
    distribute): one hourly rollup, prefix sums by window, and the
    split score ``|S_t·(N−n_t) − (S−S_t)·n_t| / (n_t·(N−n_t))`` — the
    cross-multiplied form of the mean difference, exact HUGEINT/decimal
    integers until one shared double division ranks the argmax (ties →
    earliest hour).

    Scale notes: the only fact-table pass is the hourly rollup; prefix
    windows and ranking run per type over |hours| rows.  All output
    numbers are integer-HALF-UP-rounded (cf. `resample_interp`'s
    boundary lesson)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("s"),
        F.count("*").cast("decimal(38,0)").alias("n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    pre = hourly.select(
        "event_type",
        "hour",
        F.sum("s").over(w).alias("cs"),
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(wt).alias("ts_"),
        F.sum("n").over(wt).alias("tn"),
    )
    scored = pre.where(F.col("cn") < F.col("tn")).select(
        "event_type",
        "hour",
        "cs",
        "cn",
        "ts_",
        "tn",
        F.abs(
            F.col("cs") * (F.col("tn") - F.col("cn"))
            - (F.col("ts_") - F.col("cs")) * F.col("cn")
        ).alias("num"),
        (F.col("cn") * (F.col("tn") - F.col("cn"))).alias("den"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            (F.col("num").cast("double") / F.col("den").cast("double")).desc(),
            "hour",
        )
    )
    best = scored.withColumn("rk", rk).where(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.col("hour").alias("split_hour"),
        F.col("cn").cast("long").alias("n_before"),
        (F.col("tn") - F.col("cn")).cast("long").alias("n_after"),
        (
            F.expr("(abs(cs) * 2000000 + 100 * cn) div (200 * cn)").cast(
                "double"
            )
            / 1000000.0
        ).alias("mean_before"),
        (
            F.expr(
                "(abs(ts_ - cs) * 2000000 + 100 * (tn - cn))"
                " div (200 * (tn - cn))"
            ).cast("double")
            / 1000000.0
        ).alias("mean_after"),
        (
            F.expr("(num * 2000000 + 100 * den) div (200 * den)").cast(
                "double"
            )
            / 1000000.0
        ).alias("mean_delta"),
    ).orderBy("event_type")


@register(
    "orders_basket_affinity",
    # confidence and lift are integer-HALF-UP rounded (num/den `div`
    # trick, cf. resample_interp): conf = c_both/c_ante, lift =
    # c_both·N/(c_ante·c_cons) — counts are exact, so the ratios never
    # touch a float until one shared display division.
    oracle="""
    WITH baskets AS (
      SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2
    ), n_orders AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets
    ), item AS (
      SELECT l_partkey, COUNT(*) AS c FROM baskets GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS c_both
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ), rules AS (
      SELECT u AS antecedent, v AS consequent, c_both FROM pair
      UNION ALL
      SELECT v, u, c_both FROM pair
    )
    SELECT r.antecedent, r.consequent,
           CAST(r.c_both AS BIGINT) AS n_both,
           CAST(ia.c AS BIGINT) AS n_ante,
           CAST(((r.c_both * 2000000 + ia.c) // (2 * ia.c)) AS DOUBLE)
             / 1000000.0 AS confidence,
           CAST(((CAST(r.c_both AS HUGEINT) * n.n * 2000000
                  + CAST(ia.c AS HUGEINT) * ic.c)
                 // (2 * CAST(ia.c AS HUGEINT) * ic.c)) AS DOUBLE)
             / 1000000.0 AS lift
    FROM rules r
    JOIN item ia ON r.antecedent = ia.l_partkey
    JOIN item ic ON r.consequent = ic.l_partkey
    CROSS JOIN n_orders n
    ORDER BY antecedent, consequent
    """,
)
def orders_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: directional
    (antecedent → consequent) part pairs with support ≥ 2 orders,
    scored by confidence and lift — the co-purchase recommender staple
    (and, pipeline-side, the "which sources co-occur in retrieved
    contexts" affinity shape), built on the same co-occurrence pair
    machinery as `graph_triangle_count`.

    Scale notes: pair generation is per-basket (bounded by basket size,
    ≤7 lines on TPC-H-shaped orders) then count-aggregated — one
    shuffle on the pair key; the support-≥2 HAVING prunes before the
    scoring joins; item counts join on each rule endpoint (part-sized
    dimension, shuffle or auto-broadcast); the 1-row basket total is an
    explicit tiny broadcast.  Counts stay exact integers; confidence
    and lift are integer-rounded to 6 decimals before the one shared
    display division."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = baskets.select(
        F.countDistinct("l_orderkey").alias("n")
    )
    item = baskets.groupBy(F.col("l_partkey")).agg(F.count("*").alias("c"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count("*").alias("c_both"))
        .where(F.col("c_both") >= 2)
    )
    rules = pair.select(
        F.col("u").alias("antecedent"),
        F.col("v").alias("consequent"),
        "c_both",
    ).unionAll(
        pair.select(
            F.col("v").alias("antecedent"),
            F.col("u").alias("consequent"),
            "c_both",
        )
    )
    ia = item.select(
        F.col("l_partkey").alias("antecedent"), F.col("c").alias("c_ante")
    )
    ic = item.select(
        F.col("l_partkey").alias("consequent"), F.col("c").alias("c_cons")
    )
    return (
        rules.join(ia, "antecedent")
        .join(ic, "consequent")
        .join(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("c_both").cast("long").alias("n_both"),
            F.col("c_ante").cast("long").alias("n_ante"),
            (
                F.expr(
                    "(c_both * 2000000 + c_ante) div (2 * c_ante)"
                ).cast("double")
                / 1000000.0
            ).alias("confidence"),
            # lift numerator is count×count×2·10⁶ — BIGINT overflows
            # at production basket totals (N ~ 10¹⁰), so the rounding
            # arithmetic runs in DECIMAL(38,0)/HUGEINT on both sides.
            (
                F.expr(
                    "(cast(c_both as decimal(38,0)) * n * 2000000"
                    " + cast(c_ante as decimal(38,0)) * c_cons)"
                    " div (2 * cast(c_ante as decimal(38,0)) * c_cons)"
                ).cast("double")
                / 1000000.0
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    ), counted AS (
      SELECT path, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rk
      FROM paths GROUP BY path
    )
    SELECT CAST(rk AS BIGINT) AS rank, path, CAST(n AS BIGINT) AS n
    FROM counted WHERE rk <= 20
    ORDER BY rank
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 behavioral paths (consecutive event-type triples
    per user, globally ranked) — the sequence-mining extension of
    `events_markov_transitions`' length-2 matrix: which three-step
    journeys dominate (view>click>purchase vs error loops).

    Scale notes: ONE window shuffle (user_id) produces both leads in a
    single frame pass; path counting is a partial+final agg on the
    path-vocabulary key (|types|³ ≤ 125 distinct paths — tiny); the
    final rank runs on that vocabulary-sized rollup.  Ties break on the
    path string for cross-engine determinism."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = seq.where(
        F.col("e2").isNotNull() & F.col("e3").isNotNull()
    ).select(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n"))
    rk = F.row_number().over(
        Window.orderBy(F.col("n").desc(), "path")
    )
    return (
        counted.withColumn("rank", rk.cast("long"))
        .where(F.col("rank") <= 20)
        .select("rank", "path", F.col("n").cast("long").alias("n"))
        .orderBy("rank")
    )


@register(
    "orders_backlog_sweep",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS opened,
             MAX(CAST(l.l_shipdate AS DATE)) AS closed
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ), deltas AS (
      SELECT opened AS day, 1 AS d FROM iv
      UNION ALL
      SELECT closed + 1, -1 FROM iv
    ), daily AS (
      SELECT day,
             SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_opened,
             SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS n_closed,
             SUM(SUM(d)) OVER (ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS backlog
      FROM deltas GROUP BY day
    )
    SELECT day, CAST(n_opened AS BIGINT) AS n_opened,
           CAST(n_closed AS BIGINT) AS n_closed,
           CAST(backlog AS BIGINT) AS backlog
    FROM daily ORDER BY day
    """,
)
def orders_backlog_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by INTERVAL SWEEP: each order is
    open from o_orderdate through its last lineitem shipdate; the
    backlog curve comes from +1/−1 boundary events and one cumulative
    sum — the sweep-line pattern that answers "how many intervals
    overlap each day" WITHOUT a day×interval range join (the naive
    formulation is O(days·orders) and a shuffle monster at 100 TB;
    this is one fact-table agg + a day-level window).

    Scale notes: the only fact-sized work is max(l_shipdate) per order
    (partial+final agg on the join key); boundary events are
    2 rows/order collapsing to |days| rows before the single ordered
    cumsum, which runs on the day-level rollup (calendar-sized —
    thousands of rows even at 100 TB; the sweep is inherently
    sequential in day order, and that tiny frame is exactly where a
    global window is correct, cf. `orders_abc_pareto`)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    iv = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("opened"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("closed"))
    )
    deltas = iv.select(
        F.col("opened").alias("day"), F.lit(1).alias("d")
    ).unionAll(
        iv.select(F.date_add("closed", 1).alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias(
            "n_opened"
        ),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("long").alias(
            "n_closed"
        ),
        F.sum("d").alias("net"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum("net").over(w).cast("long").alias("backlog"),
    ).orderBy("day")


@register(
    "events_rolling_active",
    # The ORACLE computes rolling actives DIRECTLY (day grid × distinct
    # membership — O(days·users), fine at fixture scale); the engine
    # uses the interval-merge sweep.  A hash match cross-validates the
    # two algorithms, like graph_triangle_count.
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))::DATE
               AS day
      FROM ud
    )
    SELECT g.day,
           CAST(COALESCE((SELECT COUNT(*) FROM ud u WHERE u.day = g.day), 0)
                AS BIGINT) AS dau,
           CAST((SELECT COUNT(DISTINCT u.user_id) FROM ud u
                 WHERE u.day BETWEEN g.day - 6 AND g.day) AS BIGINT) AS wau7
    FROM grid g
    ORDER BY g.day
    """,
)
def events_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day active users (WAU) per day — computed WITHOUT
    a count-distinct-over-window (which at 100 TB means re-scanning 7
    days of users per output day).  Instead, the interval-merge sweep:
    each user's active days become coverage intervals [day, day+6],
    overlapping intervals merge per user (a gap > 6 days starts a new
    one), and a +1/−1 boundary sweep with one cumulative sum yields
    WAU for every calendar day.  Each user contributes O(#sessions)
    boundary rows, not O(#days) membership rows.

    Scale notes: user-day dedup is the only fact-sized agg; interval
    merge is one window per user (lag + cumulative flag — standard
    gaps-and-islands); the sweep cumsum runs on the calendar-sized
    rollup.  The oracle deliberately computes the same numbers the
    O(days·users) direct way — two algorithms, one hash."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    wlag = Window.partitionBy("user_id").orderBy("day")
    grp = ud.withColumn(
        "new_iv",
        F.when(
            F.datediff("day", F.lag("day").over(wlag)) > 6, 1
        ).otherwise(0),
    ).withColumn(
        "iv_id",
        F.sum("new_iv").over(
            wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = grp.groupBy("user_id", "iv_id").agg(
        F.min("day").alias("s"), F.date_add(F.max("day"), 6).alias("e")
    )
    deltas = iv.select(F.col("s").alias("day"), F.lit(1).alias("d")).unionAll(
        iv.select(F.date_add("e", 1).alias("day"), F.lit(-1).alias("d"))
    )
    sweep = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    bounds = ud.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day")
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    wsweep = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(sweep, "day", "left")
        .join(dau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.sum(F.coalesce("net", F.lit(0)))
            .over(wsweep)
            .cast("long")
            .alias("wau7"),
        )
        .orderBy("day")
    )


@register(
    "events_pattern_match",
    oracle=r"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events
      GROUP BY user_id
    ), m AS (
      SELECT user_id,
             length(seq) AS seq_len,
             regexp_extract_all(seq, 'v+c+p') AS hits
      FROM seqs
    )
    SELECT user_id,
           CAST(seq_len AS BIGINT) AS seq_len,
           CAST(len(hits) AS BIGINT) AS n_matches,
           CAST(list_max(list_transform(hits, x -> length(x))) AS BIGINT)
             AS max_match_len
    FROM m
    WHERE len(hits) > 0
    ORDER BY user_id
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection: per user, order
    the event stream and find maximal runs matching ``PATTERN (V+ C+ P)``
    — one-or-more views, then one-or-more clicks, then a purchase, with
    the standard AFTER MATCH SKIP PAST LAST ROW semantics.  Spark has no
    MATCH_RECOGNIZE; the engine re-expresses it as greedy non-overlapping
    regex matching over the per-key symbol string — the same compilation
    Flink CEP / Trino's pattern machine performs, with each event type
    mapped to one symbol character.  Greedy leftmost-nonoverlapping
    matching is identical semantics in Java regex and RE2-style engines
    for this pattern class, which is what makes the DuckDB twin exact.

    Scale notes: ONE groupBy(user) builds the symbol string (collect_list
    of (ts, event_id, symbol) structs, array_sort, concat — all JVM
    built-ins, no window, no UDF); per-user sequences are session-sized
    (bounded by per-key activity, not corpus size), so the regex scan is
    linear in each group's own events.  Everything after the single
    keyed shuffle is narrow.  AFTER-SKIP-PAST-LAST semantics mean no
    backtracking blowup: the scan is O(len) per key."""
    e = load_table(spark, sf_dir, "events")
    seqs = (
        e.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("sym")
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("ev")), lambda s: s["sym"]
                ),
                "",
            ).alias("seq")
        )
    )
    m = seqs.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.regexp_extract_all("seq", F.lit(r"v+c+p"), 0).alias("hits"),
    )
    return (
        m.where(F.size("hits") > 0)
        .select(
            "user_id",
            F.col("seq_len").cast("long").alias("seq_len"),
            F.size("hits").cast("long").alias("n_matches"),
            F.array_max(F.transform("hits", lambda x: F.length(x)))
            .cast("long")
            .alias("max_match_len"),
        )
        .orderBy("user_id")
    )


@register(
    "events_activity_streaks",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), flagged AS (
      SELECT user_id, day,
             CASE WHEN day - LAG(day) OVER
                    (PARTITION BY user_id ORDER BY day) = 1
                  THEN 0 ELSE 1 END AS new_streak
      FROM ud
    ), islands AS (
      SELECT user_id, day,
             SUM(new_streak) OVER (PARTITION BY user_id ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS streak_id
      FROM flagged
    ), streaks AS (
      SELECT user_id, streak_id,
             MIN(day) AS streak_start,
             CAST(COUNT(*) AS BIGINT) AS streak_len
      FROM islands GROUP BY user_id, streak_id
    )
    SELECT user_id,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           MIN(CASE WHEN streak_len = (SELECT MAX(s2.streak_len)
                 FROM streaks s2 WHERE s2.user_id = streaks.user_id)
               THEN streak_start END) AS longest_start
    FROM streaks
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user (gaps-and-islands) —
    the engagement metric product teams actually track (current/longest
    streak, Duolingo-style), and the canonical gaps-and-islands
    exercise: `events_rolling_active` uses the same island merge
    internally for interval coverage; this op surfaces the islands
    themselves.  Ties on longest streak resolve to the EARLIEST start
    (deterministic both engines).

    Scale notes: the user-day dedup is the only fact-sized aggregate;
    the lag + running-sum island assignment runs per user on the
    deduped day frame (one user_id-keyed shuffle shared by both
    windows); streak and user rollups are progressively smaller.  No
    cross-user window, no global sort before the output ORDER BY."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    flagged = ud.withColumn(
        "new_streak",
        F.when(
            F.datediff("day", F.lag("day").over(w)) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "streak_id",
        F.sum("new_streak").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    streaks = islands.groupBy("user_id", "streak_id").agg(
        F.min("day").alias("streak_start"),
        F.count("*").cast("long").alias("streak_len"),
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").cast("long").alias("n_active_days"),
            F.count("*").cast("long").alias("n_streaks"),
            F.max("streak_len").cast("long").alias("longest_streak"),
            F.min_by(
                F.struct("streak_start"), F.struct(-F.col("streak_len"), F.col("streak_start"))
            )["streak_start"].alias("longest_start"),
        )
        .orderBy("user_id")
    )


@register(
    "cohort_ltv",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             (EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1) AS month_id,
             CAST(o_totalprice AS DECIMAL(14,2)) AS price
      FROM orders
    ), firstm AS (
      SELECT o_custkey, MIN(month_id) AS cohort_m FROM om GROUP BY o_custkey
    ), csize AS (
      SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM firstm GROUP BY cohort_m
    ), rev AS (
      SELECT f.cohort_m, om.month_id - f.cohort_m AS age_months,
             SUM(om.price) AS rev
      FROM om JOIN firstm f ON om.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ), cum AS (
      SELECT cohort_m, age_months,
             SUM(rev) OVER (PARTITION BY cohort_m ORDER BY age_months
               ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM rev
    )
    SELECT make_date(CAST(c.cohort_m // 12 AS INT),
                     CAST(c.cohort_m % 12 + 1 AS INT), 1) AS cohort_month,
           CAST(c.age_months AS BIGINT) AS age_months,
           s.n_customers,
           CAST((2 * CAST(c.cum_rev * 100 AS BIGINT) + s.n_customers)
                // (2 * s.n_customers) AS DOUBLE) / 100.0
             AS ltv_per_customer
    FROM cum c JOIN csize s USING (cohort_m)
    ORDER BY cohort_month, age_months
    """,
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative revenue per customer by
    acquisition-month cohort and months-since-acquisition — the LTV
    companion to `cohort_retention` (that one counts who comes back;
    this one integrates what they spend).  Month arithmetic is integer
    month_id = year·12 + month − 1 on both engines (calendar FIELDS of
    a date are engine-unambiguous; month DIFFERENCES are not, cf.
    orders_seasonality's dow lesson), and revenue is exact DECIMAL
    through the cumulative window, divided and rounded only at the
    surface (`davg2` discipline).

    Scale notes: one orders scan builds (cust, month, price); the first-
    order reduction and the (cohort, age) rollup are partial+final
    aggs; the cumulative window runs per cohort on the |cohorts|×|ages|
    rollup, never on facts; cohort sizes broadcast-join back."""
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "month_id"
        ),
        dec2("o_totalprice", 14).alias("price"),
    )
    firstm = om.groupBy("o_custkey").agg(F.min("month_id").alias("cohort_m"))
    csize = firstm.groupBy("cohort_m").agg(
        F.count("*").cast("long").alias("n_customers")
    )
    rev = (
        om.join(firstm, "o_custkey")
        .groupBy(
            "cohort_m", (F.col("month_id") - F.col("cohort_m")).alias("age_months")
        )
        .agg(F.sum("price").alias("rev"))
    )
    w = Window.partitionBy("cohort_m").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.withColumn("cum_rev", F.sum("rev").over(w))
    return (
        cum.join(F.broadcast(csize), "cohort_m")
        .select(
            F.make_date(
                F.expr("cohort_m div 12"), F.col("cohort_m") % 12 + 1, F.lit(1)
            ).alias("cohort_month"),
            F.col("age_months").cast("long").alias("age_months"),
            "n_customers",
            # Integer-cents HALF-UP: small cohorts make the decimal/count
            # quotient land EXACTLY on .xx5 boundaries, where Spark's
            # round(double) and DuckDB's diverge (observed here: ±0.01
            # both directions at n=2 and n=6).  floor((2a+b)/(2b)) cents
            # is engine-exact (events_changepoint's lesson).
            (
                F.expr(
                    "(2 * cast(cum_rev * 100 as bigint) + n_customers)"
                    " div (2 * n_customers)"
                ).cast("double")
                / 100.0
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_month", "age_months")
    )


@register(
    "events_ab_lift",
    # Float discipline (agg_corr_exact's recipe): all counts integer;
    # the z-score's CAST → √ → ÷ tail is ONE shared expression shape
    # over exact integers on both engines, rounded at 4 decimals.
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END
               AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), v AS (
      SELECT CAST(SUM(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 'control' THEN converted ELSE 0 END)
               AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN variant = 'treatment' THEN converted ELSE 0
               END) AS BIGINT) AS c_b
      FROM assign
    )
    SELECT n_a, c_a, n_b, c_b,
           CAST((c_a * 1000) // n_a AS BIGINT) AS conv_a_permille,
           CAST((c_b * 1000) // n_b AS BIGINT) AS conv_b_permille,
           CAST(CASE WHEN c_a = 0 THEN 0
                ELSE ((c_b * n_a - c_a * n_b) * 1000) // (c_a * n_b) END
             AS BIGINT) AS lift_permille,
           CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
                ELSE ROUND(
             (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
             / sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
                    * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 4) END AS z_score
    FROM v
    """,
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash-bucket assignment
    (user_id parity — production uses a salted hash, same shape),
    per-variant conversion (user made a high-value purchase, value ≥
    150 — every fixture user purchases *something*, so plain
    any-purchase is degenerate p=1 and the pooled z divides by zero;
    observed, hence the threshold AND the all/none guard on both
    sides), relative lift, and the two-proportion pooled z-score — the
    decision row an experimentation platform emits.  Lift is exact
    integer per-mille arithmetic; only the z-score touches doubles,
    through one shared CAST→√→÷ expression tree over exact integer
    counts (`agg_corr_exact`'s float discipline).

    Scale notes: ONE fact pass reduces to per-user (variant, converted)
    — partial+final agg on user_id; the experiment readout is a second
    agg to a single row.  No window, no join; at 100 TB this is two
    hash aggregates and a scalar."""
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).withColumn(
        "variant",
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment"),
    )
    v = assign.agg(
        F.sum(F.when(F.col("variant") == "control", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "control", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("variant") == "treatment", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(
            F.when(F.col("variant") == "treatment", F.col("converted")).otherwise(0)
        )
        .cast("long")
        .alias("c_b"),
    )
    p_pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        F.col("c_b").cast("double") / F.col("n_b")
        - F.col("c_a").cast("double") / F.col("n_a")
    ) / F.sqrt(
        p_pool * (1 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return v.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.expr("(c_a * 1000) div n_a").cast("long").alias("conv_a_permille"),
        F.expr("(c_b * 1000) div n_b").cast("long").alias("conv_b_permille"),
        F.when(F.col("c_a") == 0, F.lit(0))
        .otherwise(F.expr("((c_b * n_a - c_a * n_b) * 1000) div (c_a * n_b)"))
        .cast("long")
        .alias("lift_permille"),
        F.when(
            (F.col("c_a") + F.col("c_b") == 0)
            | (F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")),
            F.lit(0.0),
        )
        .otherwise(F.round(z, 4))
        .alias("z_score"),
    )


@register(
    "events_attribution",
    # Tie discipline: the union carries (epoch, side, event_id) as the
    # window order — a TOTAL order (event_id unique), so "the touch
    # before this purchase" is deterministic on both engines even when
    # several events share a second; same-second touches sort BEFORE
    # the purchase (side 0 < 1) — the declared semantics.
    oracle="""
    WITH u AS (
      SELECT user_id, event_type, value,
             (epoch_us(ts) // 1000000) AS ep,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
             event_id
      FROM events
    ), attrib AS (
      SELECT user_id, event_type, value, side,
             last_value(CASE WHEN side = 0 THEN event_type END IGNORE NULLS)
               OVER w AS last_touch,
             first_value(CASE WHEN side = 0 THEN event_type END IGNORE NULLS)
               OVER w AS first_touch
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ep, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), p AS (
      SELECT COALESCE(last_touch, 'none') AS last_touch,
             COALESCE(first_touch, 'none') AS first_touch,
             CAST(value AS DECIMAL(14,2)) AS rev
      FROM attrib WHERE side = 1
    )
    SELECT model, channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM (
      SELECT 'last_touch' AS model, last_touch AS channel, rev FROM p
      UNION ALL
      SELECT 'first_touch', first_touch, rev FROM p
    )
    GROUP BY model, channel
    ORDER BY model, channel
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: credit each purchase's revenue to a channel
    under FIRST-TOUCH (the user's first-ever non-purchase event type)
    and LAST-TOUCH (the most recent one before the purchase) models —
    the two baseline models every attribution system ships, reported
    side by side for model comparison.  Purchases with no prior touch
    credit 'none'.

    Built on the SAME single-shuffle union trick as `join_asof`: touches
    and purchases union into one frame ordered (epoch, side, event_id)
    per user; one window pass computes both the running last and the
    running first non-purchase type with IGNORE NULLS frames — no self-
    join, no per-purchase probe.

    Scale notes: one user_id-keyed shuffle carries the whole
    computation; the attribution rollup is (model × channel)-sized.
    Revenue sums are exact DECIMAL (`dec2`), cast to double only at the
    surface."""
    e = load_table(spark, sf_dir, "events")
    u = e.select(
        "user_id",
        "event_type",
        "value",
        epoch_seconds("ts").alias("ep"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("side"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("side") == 0, F.col("event_type"))
    attrib = u.select(
        "side",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
    ).where(F.col("side") == 1)
    p = attrib.select(
        F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
        dec2("value", 14).alias("rev"),
    )
    stacked = p.select(
        F.lit("last_touch").alias("model"),
        F.col("last_touch").alias("channel"),
        "rev",
    ).unionAll(
        p.select(
            F.lit("first_touch").alias("model"),
            F.col("first_touch").alias("channel"),
            "rev",
        )
    )
    return (
        stacked.groupBy("model", "channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("model", "channel")
    )


@register(
    "audience_overlap_exact",
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), pair_inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ), sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1
    )
    SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_inter,
           CAST((p.n_inter * 1000) // (sa.n + sb.n - p.n_inter) AS BIGINT)
             AS jaccard_permille
    FROM pair_inter p
    JOIN sizes sa ON p.type_a = sa.event_type
    JOIN sizes sb ON p.type_b = sb.event_type
    ORDER BY type_a, type_b
    """,
)
def audience_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience overlap per event-type pair — the ground truth
    `rollup_hll_intersect` estimates: |A∩B|, both audience sizes, and
    integer per-mille Jaccard.  Where the HLL version answers the
    question without co-shuffling the user sets, this one pays the
    user-keyed shuffle to be exact — the two ops together are the
    estimate-plus-truth pairing the sketch's error bound is measured
    against (`dedup_lsh_recall`'s eval-first posture applied to set
    sketches).

    Scale notes: the (type, user) distinct collapse is the only
    fact-sized agg; the pair intersection is a self-join keyed on
    user_id — each user contributes C(types-with-user, 2) ≤ C(|types|,
    2) pair rows, so the join output is bounded by |users|·|types|²/2,
    NOT |events|²; per-pair counts collapse map-side.  At a 100 TB
    event log you run the HLL op daily and this exact one as the
    periodic calibration."""
    du = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    pair_inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sizes = du.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pair_inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_inter",
            F.expr("(n_inter * 1000) div (n_a + n_b - n_inter)")
            .cast("long")
            .alias("jaccard_permille"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "orders_duplicate_payments",
    # The fixture's synthetic amounts are near-unique per customer
    # (measured: ZERO natural same-amount-within-30d pairs), so replayed
    # transactions are injected deterministically: every o_orderkey ≡ 0
    # (mod 97) gains a twin at key+10M, 7 days later, same amount —
    # detection proven, not assumed.
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_totalprice,
             o_orderdate + INTERVAL 7 DAY
      FROM orders WHERE o_orderkey % 97 = 0
    ), cand AS (
      SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
             a.o_custkey, a.o_totalprice,
             date_diff('day', a.o_orderdate, b.o_orderdate) AS gap_days
      FROM base a JOIN base b
        ON a.o_custkey = b.o_custkey
       AND a.o_totalprice = b.o_totalprice
       AND a.o_orderkey < b.o_orderkey
      WHERE abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 30
    )
    SELECT o_custkey,
           CAST(o_totalprice AS DOUBLE) AS amount,
           key_a, key_b,
           CAST(gap_days AS BIGINT) AS gap_days
    FROM cand
    ORDER BY o_custkey, key_a, key_b
    """,
)
def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection: order pairs from the same customer
    with the IDENTICAL amount within 30 days — the double-charge /
    replayed-transaction audit every payments system runs (and a
    dedup-family member over relational facts rather than text:
    equality blocking on (customer, amount), verification on the time
    window).

    Scale notes: the self-join keys on (custkey, totalprice) — an
    EQUI-join whose blocking is exactly the fraud signature, so
    candidate pairs are per-(customer, amount) group sized, never a
    time-range cross product; the ±30-day check is a residual filter
    on the matched pairs.  Skew note: a hot (cust, amount) pair would
    salt like `join_skew_salted`; amounts at 2-decimal granularity
    make big groups rare."""
    raw = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    o = raw.unionAll(
        raw.where(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            (F.col("o_orderdate") + F.expr("INTERVAL '7' DAY")).alias(
                "o_orderdate"
            ),
        )
    )
    a = o.select(
        F.col("o_orderkey").alias("key_a"),
        "o_custkey",
        "o_totalprice",
        F.col("o_orderdate").alias("date_a"),
    )
    b = o.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_custkey").alias("cust_b"),
        F.col("o_totalprice").alias("price_b"),
        F.col("o_orderdate").alias("date_b"),
    )
    return (
        a.join(
            b,
            (F.col("o_custkey") == F.col("cust_b"))
            & (F.col("o_totalprice") == F.col("price_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .where(
            F.abs(F.datediff("date_b", "date_a")) <= 30
        )
        .select(
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("amount"),
            "key_a",
            "key_b",
            F.datediff("date_b", "date_a").cast("long").alias("gap_days"),
        )
        .orderBy("o_custkey", "key_a", "key_b")
    )


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS custkey, c_custkey // 10 AS ancestor, 1 AS depth
      FROM customer WHERE c_custkey // 10 > 0
      UNION ALL
      SELECT ch.custkey, ch.ancestor // 10, ch.depth + 1
      FROM chain ch WHERE ch.ancestor // 10 > 0
    )
    SELECT CAST(custkey AS BIGINT) AS custkey,
           CAST(ancestor AS BIGINT) AS ancestor,
           CAST(depth AS BIGINT) AS depth
    FROM chain
    ORDER BY custkey, depth
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE — transitive ancestor closure over a derived
    referral hierarchy (parent = custkey div 10, a decimal-trie tree),
    run through Spark's OWN ``WITH RECURSIVE`` (new in Spark 4.0 —
    before it, this shape needed the driver-coordinated loops
    `dedup_clusters`/`graph_shortest_paths` use).  Each customer yields
    its full ancestor chain with depth; both engines execute the
    IDENTICAL recursive SQL, so this is the rare op whose Spark text and
    oracle text are one string — the capability parity check itself.

    Scale notes: Spark plans the recursion as an iterative union-loop
    (one join per level against the previous frontier, same physical
    shape as the hand-rolled BFS); depth is bounded by key magnitude
    (log₁₀) so the loop terminates in ~4 rounds here.  For unbounded
    real hierarchies the driver-loop form with `stage()` lineage
    truncation remains the 100 TB posture; this op pins the SQL-surface
    capability."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS custkey, c_custkey div 10 AS ancestor,
                 1 AS depth
          FROM customer WHERE c_custkey div 10 > 0
          UNION ALL
          SELECT ch.custkey, ch.ancestor div 10, ch.depth + 1
          FROM chain ch WHERE ch.ancestor div 10 > 0
        )
        SELECT CAST(custkey AS BIGINT) AS custkey,
               CAST(ancestor AS BIGINT) AS ancestor,
               CAST(depth AS BIGINT) AS depth
        FROM chain
        ORDER BY custkey, depth
        """
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract_string(props, '$.missing') AS INTEGER)
             AS missing_int,
           (json_extract_string(props, '$.k') IS NULL) AS k_is_null
    FROM events
    WHERE event_id % 50 = 0
    ORDER BY event_id
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT scalar surface (Spark 4): ``parse_json`` once into a
    VARIANT value, then typed ``variant_get`` extractions — the
    semi-structured column type Snowflake/Databricks users expect,
    superseding per-access ``get_json_object`` re-parsing (`fn_json`
    keeps the classic surface).  Missing paths return NULL under typed
    extraction; the oracle mirrors with DuckDB's JSON extraction — the
    hash match pins that VARIANT's typed-access semantics equal
    classic JSON semantics on this data.

    Scale notes: parse ONCE per row, extract many — at 100 TB the
    VARIANT binary encoding also shreds into columnar storage
    (Parquet variant shredding), making path access scan-prunable;
    everything here is scan-side codegen, zero shuffles."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 50 == 0)
    return (
        e.select(
            "event_id",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias(
                "k_int"
            ),
            F.expr("variant_get(parse_json(props), '$.k', 'string')").alias(
                "k_str"
            ),
            F.expr(
                "variant_get(parse_json(props), '$.missing', 'int')"
            ).alias("missing_int"),
            F.expr("variant_get(parse_json(props), '$.k', 'int')")
            .isNull()
            .alias("k_is_null"),
        )
        .orderBy("event_id")
    )


@register(
    "events_dau_mau_stickiness",
    # Cross-algorithm oracle (events_rolling_active's discipline): the
    # engine computes MAU by interval-merge sweep; the oracle computes
    # the SAME numbers the O(days·users) direct way.
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grid AS (
      SELECT UNNEST(generate_series((SELECT MIN(day) FROM ud),
                                    (SELECT MAX(day) FROM ud),
                                    INTERVAL 1 DAY))::DATE AS day
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ), mau AS (
      SELECT g.day,
             CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau30
      FROM grid g JOIN ud u
        ON u.day BETWEEN g.day - 29 AND g.day
      GROUP BY g.day
    )
    SELECT g.day,
           COALESCE(d.dau, 0) AS dau,
           m.mau30,
           CAST((COALESCE(d.dau, 0) * 1000) // m.mau30 AS BIGINT)
             AS stickiness_permille
    FROM grid g
    LEFT JOIN dau d ON g.day = d.day
    JOIN mau m ON g.day = m.day
    ORDER BY g.day
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar day with an EXACT 30-day rolling
    MAU — the engagement ratio every growth dashboard headlines —
    computed WITHOUT count-distinct-over-window: each user's active
    days become [day, day+29] coverage intervals, per-user overlapping
    intervals merge (gap > 29 days starts a new one), and a +1/−1
    boundary sweep with one cumulative sum yields MAU for every day —
    `events_rolling_active`'s interval-merge generalized from 7 to 30
    days, with the ratio reported in integer per-mille.  Days whose
    trailing 30-day window holds NO active user are dropped (mau30 > 0
    filter) — the oracle's inner ``JOIN mau`` produces no row for such
    a day, so the engine must agree rather than emit a mau30=0 row with
    a NULL division (ADVICE r5: unreachable on the driver fixture, but
    a >29-day activity gap would have flipped the hash;
    tests/test_analytics_r5.py pins the gapped-frame behavior).

    Scale notes: user-day dedup is the only fact-sized agg; each user
    contributes O(#activity-islands) boundary rows, not O(#days); the
    sweep cumsum runs on the calendar-sized rollup.  The oracle
    deliberately recomputes MAU the direct O(days·users) way — two
    algorithms, one hash."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    wlag = Window.partitionBy("user_id").orderBy("day")
    grp = ud.withColumn(
        "new_iv",
        F.when(F.datediff("day", F.lag("day").over(wlag)) > 29, 1).otherwise(0),
    ).withColumn(
        "iv_id",
        F.sum("new_iv").over(
            wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = grp.groupBy("user_id", "iv_id").agg(
        F.min("day").alias("s"), F.date_add(F.max("day"), 29).alias("e")
    )
    deltas = iv.select(F.col("s").alias("day"), F.lit(1).alias("d")).unionAll(
        iv.select(F.date_add("e", 1).alias("day"), F.lit(-1).alias("d"))
    )
    sweep = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    bounds = ud.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    grid = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day")
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    wsweep = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(sweep, "day", "left")
        .join(dau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.sum(F.coalesce("net", F.lit(0)))
            .over(wsweep)
            .cast("long")
            .alias("mau30"),
        )
        .where(F.col("mau30") > 0)
        .select(
            "day",
            "dau",
            "mau30",
            F.expr("(dau * 1000) div mau30").cast("long").alias(
                "stickiness_permille"
            ),
        )
        .orderBy("day")
    )


@register(
    "lineitem_vwap_monthly",
    oracle="""
    WITH m AS (
      SELECT (EXTRACT(year FROM l_shipdate) * 12
              + EXTRACT(month FROM l_shipdate) - 1) AS month_id,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,4))
               AS pq,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
               AS q
      FROM lineitem GROUP BY 1
    )
    SELECT make_date(CAST(month_id // 12 AS INT),
                     CAST(month_id % 12 + 1 AS INT), 1) AS ship_month,
           CAST(q AS DOUBLE) AS total_qty,
           CAST((2 * CAST(pq * 100 AS HUGEINT)
                 + CAST(q * 100 AS HUGEINT))
                // (2 * CAST(q * 100 AS HUGEINT)) AS DOUBLE) / 100.0
             AS vwap
    FROM m ORDER BY ship_month
    """,
)
def lineitem_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per ship month — the VWAP shape
    every market/pricing pipeline computes: Σ(price·qty)/Σ(qty) with
    BOTH sums exact DECIMAL (price×qty products widen to DECIMAL(38,4)
    — order-independent integer arithmetic at any partitioning), and
    the division done as integer-cents HALF-UP (`cohort_ltv`'s .xx5
    lesson; the ratio of two exact decimals reliably lands on rounding
    boundaries).  `agg_hash` averages a column; this weights one exact
    decimal by another — the step from AVG to VWAP is exactly where
    float aggregation breaks cross-engine.

    Scale notes: one partial+final hash aggregate; month arithmetic is
    integer month_id on both sides (no engine calendar); output is
    months-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("month_id")
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(12,2)")
        )
        .cast("decimal(38,4)")
        .alias("pq"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("q"),
    )
    return m.select(
        F.make_date(
            F.expr("month_id div 12"), F.col("month_id") % 12 + 1, F.lit(1)
        ).alias("ship_month"),
        F.col("q").cast("double").alias("total_qty"),
        (
            F.expr(
                "(2 * cast(pq * 100 as decimal(38,0))"
                " + cast(q * 100 as decimal(38,0)))"
                " div (2 * cast(q * 100 as decimal(38,0)))"
            ).cast("double")
            / 100.0
        ).alias("vwap"),
    ).orderBy("ship_month")


@register(
    "events_conversion_lag",
    # First-view → first-subsequent-purchase lag per user, histogrammed
    # into hour buckets with cumulative conversion mass.  Lag hours =
    # (epoch_p − epoch_v) // 3600 on exact epoch seconds (the
    # common.epoch_seconds twin of DuckDB's epoch_us // 1e6), so the
    # bucket edges are integer-identical on both engines.
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY 1
    ), lags AS (
      SELECT v.user_id,
             (epoch_us(p.first_purchase) // 1000000
              - epoch_us(v.first_view) // 1000000) // 3600 AS lag_hours
      FROM v JOIN p ON p.user_id = v.user_id
    ), hist AS (
      SELECT lag_hours, COUNT(*) AS n_users FROM lags GROUP BY 1
    )
    SELECT CAST(lag_hours AS BIGINT) AS lag_hours,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_users * 1000000 // SUM(n_users) OVER () AS BIGINT)
             AS share_ppm,
           CAST(SUM(n_users) OVER (ORDER BY lag_hours
                                   ROWS UNBOUNDED PRECEDING) * 1000000
                // SUM(n_users) OVER () AS BIGINT) AS cum_ppm
    FROM hist
    ORDER BY lag_hours
    """,
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion-lag distribution: per user, the hours
    between the FIRST view and the first purchase AT OR AFTER it,
    histogrammed with per-bucket share and cumulative conversion mass —
    the attribution-window sizing readout (how long must a campaign
    wait before calling a view unconverted?) that complements
    `events_attribution`'s credit split and `events_funnel`'s stage
    counts.

    Scale notes: two user-keyed min-aggregates (the purchase side joins
    the view frame first so the ts >= first_view filter prunes at scan
    grain) sharing the user_id partitioning, one user-grain join, ONE
    aggregate to the hour-bucket histogram (bounded by the fixture's
    time span, never user count); share/cum windows run on that rollup
    (reviewed SINGLE)."""
    from ..common import epoch_seconds

    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lags = (
        v.join(p, "user_id")
        .select(
            (
                epoch_seconds("first_purchase") - epoch_seconds("first_view")
            ).alias("lag_secs")
        )
        .select(F.expr("lag_secs div 3600").alias("lag_hours"))
    )
    hist = lags.groupBy("lag_hours").agg(F.count(F.lit(1)).alias("n_users"))
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("lag_hours").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        F.col("lag_hours").cast("long").alias("lag_hours"),
        F.col("n_users").cast("long").alias("n_users"),
        F.expr("n_users * 1000000 div SUM(n_users) OVER ()")
        .cast("long")
        .alias("share_ppm"),
        (
            F.sum("n_users").over(w_cum) * 1000000
        ).cast("long").alias("_cum_raw"),
        F.sum("n_users").over(w_all).alias("_tot"),
    ).select(
        "lag_hours",
        "n_users",
        "share_ppm",
        F.expr("_cum_raw div _tot").cast("long").alias("cum_ppm"),
    ).orderBy("lag_hours")


@register(
    "events_bounce_rate",
    # Daily bounce rate over 30-minute-gap sessions (the
    # `sessionize_batch` rule verbatim): a bounce is a single-event
    # session, attributed to the day the session STARTED.
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ), sessions AS (
        SELECT user_id, session_no,
               CAST(MIN(ts) AS DATE) AS d,
               COUNT(*) AS n_events
        FROM numbered GROUP BY 1, 2
    )
    SELECT d AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS bounce_ppm
    FROM sessions
    GROUP BY d
    ORDER BY day
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate — the share of sessions that contain exactly
    one event, per day of session start: the engagement-quality metric
    every web-analytics report leads with, built on the SAME 30-minute
    inactivity sessionization as `sessionize_batch` (one gap rule
    everywhere — two definitions of "session" in one warehouse is how
    dashboards diverge).

    Scale notes: both windows and the session aggregate share the
    user_id hash partitioning (one shuffle), then ONE aggregate to the
    calendar-day rollup — the `sessionize_batch` plan plus a bounded
    day rollup; the ppm division is integer on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL '30' MINUTE")), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = flagged.select(
        "user_id", "ts", F.sum("new_sess").over(w_cum).alias("session_no")
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.to_date(F.min("ts")).alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        sessions.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions_raw"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
                "n_bounces_raw"
            ),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .select(
            "day",
            F.col("n_sessions_raw").cast("long").alias("n_sessions"),
            F.col("n_bounces_raw").cast("long").alias("n_bounces"),
            "n_events",
            F.expr("n_bounces_raw * 1000000 div n_sessions_raw")
            .cast("long")
            .alias("bounce_ppm"),
        )
        .orderBy("day")
    )


@register(
    "orders_repeat_purchase_curve",
    # Orders-per-customer histogram + the repeat survival curve: share
    # of customers with >= k orders and share of ORDERS owned by them —
    # integer suffix-sums over the bounded k histogram.
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY 1
    ), hist AS (
        SELECT k, COUNT(*) AS n_customers, SUM(k) AS n_orders
        FROM per_cust GROUP BY 1
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(SUM(n_customers) OVER (ORDER BY k DESC
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS customers_ge_k,
           CAST(SUM(n_customers) OVER (ORDER BY k DESC
                                       ROWS UNBOUNDED PRECEDING) * 1000000
                // SUM(n_customers) OVER () AS BIGINT) AS cust_ge_k_ppm,
           CAST(SUM(n_orders) OVER (ORDER BY k DESC
                                    ROWS UNBOUNDED PRECEDING) * 1000000
                // SUM(n_orders) OVER () AS BIGINT) AS orders_ge_k_ppm
    FROM hist
    ORDER BY k
    """,
)
def orders_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase curve — the retention economics readout behind
    `cohort_ltv` and `orders_rfm_segments`: the orders-per-customer
    histogram plus, for every k, the share of customers who placed at
    least k orders and the share of total ORDERS those customers own
    (how concentrated revenue-generating behavior is in repeaters —
    the '80/20' curve computed exactly, the frequency marginal of
    `orders_abc_pareto`'s value curve).

    Scale notes: ONE corpus aggregate to the customer grain, ONE to the
    k histogram (bounded by max orders/customer, never customer
    count); the survival suffix-sums are ordered windows on that
    bounded histogram (reviewed SINGLE); ppm divisions are integer on
    both engines."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("k"))
    hist = per_cust.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("k").alias("n_orders"),
    )
    w_desc = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return hist.select(
        F.col("k").cast("long").alias("k"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.sum("n_customers").over(w_desc).cast("long").alias("customers_ge_k"),
        F.expr(
            "SUM(n_customers) OVER (ORDER BY k DESC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000"
            " div SUM(n_customers) OVER ()"
        )
        .cast("long")
        .alias("cust_ge_k_ppm"),
        F.expr(
            "SUM(n_orders) OVER (ORDER BY k DESC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000"
            " div SUM(n_orders) OVER ()"
        )
        .cast("long")
        .alias("orders_ge_k_ppm"),
    ).orderBy("k")
