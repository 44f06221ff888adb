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
