"""§2.4 Aggregations (SURVEY.md).

Reference parity [K]: the reference's only aggregation is a per-batch
``reduceByKey`` (hand-rolled combiner).  Here every aggregate is a Catalyst
``HashAggregate`` partial/final pair — map-side combine for free, shuffle
only the group keys.  No citation into /root/reference possible (mirror
empty, SURVEY.md §0).

Scale notes: all group-by keys below are low-cardinality (flags, segments,
priorities) → the shuffle moves only #groups × #partitions rows after
partial aggregation.  At 100 TB the same plans hold; skewed keys are handled
by AQE skew-join/partition splitting (enabled in the session factory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..common import davg2, dec2, dsum2, one, round_dec
from ..plans.registry import register
from ..session import load_table


@register(
    "agg_hash",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
        AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
        AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity), 2) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice), 2)
        AS avg_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary.

    Plan: parquet scan with pushed ``l_shipdate`` filter → partial
    HashAggregate → shuffle on 2 low-cardinality keys → final HashAggregate.
    One shuffle total; whole-stage codegen end-to-end.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    charge = disc_price * (one() + dec2("l_tax", 4))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum2("l_quantity", "sum_qty"),
            dsum2("l_extendedprice", "sum_base_price"),
            round_dec(F.sum(disc_price), 2).alias("sum_disc_price"),
            round_dec(F.sum(charge), 2).alias("sum_charge"),
            davg2("l_quantity", "avg_qty"),
            davg2("l_extendedprice", "avg_price"),
            davg2("l_discount", "avg_disc", ndigits=4, precision=4),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase distinct aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register("agg_approx_distinct")  # rows-only: HLL++ estimate ≠ oracle hash
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB path for distinct counting.

    Single shuffle of fixed-size sketches (vs full key shuffle for exact
    distinct); rsd=0.02.  Rows-only check by design (SURVEY.md §2.4).
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — multi-granularity totals in one pass (Expand + aggregate)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(dsum2("l_quantity", "sum_qty"), F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 3) AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal), 3) AS var_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates; rounded on both sides to absorb FP noise."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.stddev_samp("c_acctbal"), 3).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 3).alias("var_bal"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``).  Exact percentile buffers the group — fine for
    bounded groups; at 100 TB use ``percentile_approx`` (see
    ``agg_approx_distinct`` for the sketch-based pattern)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90_price"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
             AS priorities,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation — ``array_sort(collect_set(..))`` for determinism.

    Serialized via ``array_join``: harness rule (CORRECTNESS_r01), no
    ArrayType in returned schemas — pandas can't factorize list cells.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count("*").alias("n"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^k grouping combinations in one pass.  Same Expand +
    single hash-aggregate plan as ROLLUP (agg_grouping_sets): the input
    is replicated 2^k times map-side and shuffled ONCE; no per-grouping
    re-scan of the fact table."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            dsum2("l_extendedprice", "sum_price", precision=14),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n_rows",
        )
    )


@register(
    "agg_histogram",
    # Bucket index is pure integer arithmetic on cents (no width_bucket:
    # engine availability and edge conventions differ); bounds are exact
    # multiples of the step, share is one ROUND(..,6)-stable division.
    oracle="""
    WITH b AS (
      SELECT LEAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000, 11)
               AS bucket,
             CAST(o_totalprice AS DECIMAL(14,2)) AS p
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(bucket * 50000 AS DOUBLE) AS lo,
           CAST(CASE WHEN bucket = 11 THEN 600000 ELSE (bucket + 1) * 50000
                END AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(p), 2) AS DOUBLE) AS bucket_revenue,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share
    FROM b
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (12 × $50k buckets, last
    bucket open-ended) — the profiling/monitoring staple behind price
    banding, reservoir sizing, and "did this batch's distribution
    drift" checks.

    Bucketing is ``LEAST(cents div step_cents, nb−1)`` — integer
    arithmetic instead of ``width_bucket`` (whose under/overflow bucket
    conventions differ between engines).

    Scale notes: one partial+final hash aggregate collapses the fact
    table to ≤ 12 rows; the share window runs on that 12-row rollup.
    The same shape serves any column at any scale — bucket count, not
    row count, bounds the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.expr("cast(round(o_totalprice * 100) as bigint) div 5000000"),
        F.lit(11),
    )
    agg = (
        o.select(bucket.alias("bucket"), dec2("o_totalprice", 14).alias("p"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.sum("p").alias("rev"))
    )
    from pyspark.sql.window import Window as W

    return agg.select(
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("bucket") * 50000).cast("double").alias("lo"),
        F.when(F.col("bucket") == 11, F.lit(600000))
        .otherwise((F.col("bucket") + 1) * 50000)
        .cast("double")
        .alias("hi"),
        F.col("n").cast("long").alias("n"),
        round_dec(F.col("rev"), 2).alias("bucket_revenue"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy()).cast("double"),
            6,
        ).alias("share"),
    ).orderBy("bucket")


@register(
    "agg_corr_exact",
    # r = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²)) with every
    # moment an exact integer (cents × centi-units, DECIMAL(38,0) /
    # HUGEINT); the float tail is CAST→√→×→÷ — each IEEE-exact on
    # identical inputs — then ROUND(..,6).  Native corr() is NOT used:
    # its one-pass update order is engine-specific float arithmetic.
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS HUGEINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS HUGEINT) AS y
      FROM lineitem
    ), m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM c GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             AS corr_qty_price
    FROM m
    ORDER BY l_returnflag
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag,
    computed from exact integer moment sums — the feature-screening /
    drift-detection primitive, made oracle-provable by keeping all five
    moments in integer space and sharing one deterministic float tail
    (neither engine's native one-pass ``corr`` is float-order-stable
    across partitionings).

    Scale notes: one partial+final hash aggregate (the five moments are
    all decomposable sums) — the same single-shuffle shape as
    ``agg_stats``; DECIMAL(38,0) holds n·Σxy up to ~10³⁸ (≈ 10¹² rows ×
    10¹³ per-row product with room to spare at TPC-H value ranges)."""
    l = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("decimal(38,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    m = (
        l.select(F.col("l_returnflag"), x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("decimal(38,0)").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(num / (dx * dy), 6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "agg_moments_exact",
    # The four raw moment SUMS are exact integers (centi-units,
    # DECIMAL(38,0)/HUGEINT — Σx⁴ ≈ 10²⁷ at 10¹² rows for qty ≤ 50,
    # well inside 38 digits); the skew/kurtosis formulas then run in
    # DOUBLE with the identical expression tree on both engines (the
    # raw→central expansion multiplies three 38-digit decimals, which
    # overflows exact arithmetic — determinism comes from shared IEEE
    # op order on identical inputs, same policy as agg_corr_exact's
    # float tail).
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS HUGEINT) AS x
      FROM lineitem
    ), m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS s1, SUM(x * x) AS s2,
             SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4
      FROM c GROUP BY 1
    ), d AS (
      SELECT l_returnflag, CAST(n AS DOUBLE) AS n,
             CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
             CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4
      FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / POWER(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6)
             AS excess_kurtosis
    FROM d
    ORDER BY l_returnflag
    """,
)
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of quantity per return
    flag, from exact integer raw-moment sums — the distribution-shape
    drift signals (is this batch heavier-tailed than yesterday's?),
    completing the moment family: mean/variance (`agg_stats`,
    `rollup_stats`), correlation (`agg_corr_exact`), now 3rd/4th
    moments.  Native `skewness`/`kurtosis` aggregates are one-pass
    float updates whose result depends on partition order — unusable
    for cross-engine proof, so neither side uses them.

    Scale notes: ONE partial+final hash aggregate (all four moment sums
    are decomposable); the raw→central conversion is group-count-sized
    arithmetic.  Mergeable by construction — the same sums serve any
    rollup level, cf. `rollup_stats`."""
    l = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("decimal(38,0)")
    m = (
        l.select("l_returnflag", x.alias("x"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("s1"),
            F.sum(F.col("x") * F.col("x")).alias("s2"),
            F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
            F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias(
                "s4"
            ),
        )
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    m1 = s1 / n
    var = s2 / n - m1 * m1
    skew = (s3 / n - 3 * m1 * (s2 / n) + 2 * m1 * m1 * m1) / F.pow(var, 1.5)
    kurt = (
        s4 / n - 4 * m1 * (s3 / n) + 6 * m1 * m1 * (s2 / n) - 3 * m1 * m1 * m1 * m1
    ) / (var * var) - 3
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


@register(
    "agg_histogram_2d",
    # 2D heatmap grid: $50k price bands x 2-point discount bands, both
    # integer `div` bucket ids, counts + exact DECIMAL revenue per
    # cell.  The grid is bounded by the value domains (~12 x 6 cells),
    # not the data.
    oracle="""
    SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) // 5000000
               AS price_band,
           CAST(ROUND(l_discount * 100, 0) AS BIGINT) // 2 AS disc_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY price_band, disc_band
    ORDER BY price_band, disc_band
    """,
)
def agg_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D histogram (price band x discount band) of lineitems — the
    heatmap behind pricing analysis, as one hash aggregate over integer
    bucket ids (the 1D sibling is ``agg_histogram``).

    Scale notes: bucket ids are computed scan-side via integer `div`
    (never a float floor), so this is ONE partial+final hash aggregate
    whose group count is bounded by the value domains (~70 cells) —
    near-zero shuffle regardless of corpus size."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.expr(
                "CAST(ROUND(l_extendedprice * 100, 0) AS LONG) div 5000000"
            ).alias("price_band"),
            F.expr("CAST(ROUND(l_discount * 100, 0) AS LONG) div 2").alias(
                "disc_band"
            ),
            dec2("l_extendedprice", 14).alias("price_dec"),
        )
        .groupBy("price_band", "disc_band")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            round_dec(F.sum("price_dec"), 2).alias("revenue"),
        )
        .orderBy("price_band", "disc_band")
    )


@register(
    "agg_share_of_total_nested",
    # Two-level share-of-total: nation revenue as ppm of its region and
    # of the grand total, both from integer cents on the nation-sized
    # rollup (region window partitioned, global window an allowlisted
    # single-partition exchange of <=25 rows).
    oracle="""
    WITH nat AS (
        SELECT r.r_name, n.n_name,
               SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cents * 1000000 // SUM(cents) OVER (PARTITION BY r_name)
                AS BIGINT) AS share_of_region_ppm,
           CAST(cents * 1000000 // SUM(cents) OVER () AS BIGINT)
               AS share_of_total_ppm
    FROM nat
    ORDER BY r_name, n_name
    """,
)
def agg_share_of_total_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested share-of-total: each nation's revenue as a share of its
    region AND of the world — the two-level contribution view every
    BI drill-down renders, with both shares as floored ppm integers.

    Scale notes: the fact table aggregates ONCE to the nation-sized
    rollup (dims broadcast); both share windows run on that <=25-row
    frame.  Shares are integer `div` of exact cent sums — deterministic
    and overflow-safe (cents*1e6 <= ~1e19 needs the wide form at sf10+,
    so the multiplication is DECIMAL(38,0) on both sides)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    return nat.select(
        "r_name",
        "n_name",
        F.col("cents").cast("long").alias("revenue_cents"),
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div "
            "SUM(cents) OVER (PARTITION BY r_name) AS LONG)"
        ).alias("share_of_region_ppm"),
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div "
            "SUM(cents) OVER () AS LONG)"
        ).alias("share_of_total_ppm"),
    ).orderBy("r_name", "n_name")
