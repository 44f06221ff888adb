"""§2.2 Projection / filter / predicates (SURVEY.md).

The reference's per-record ``map``/``filter`` ETL [K], re-expressed as
Catalyst projections and predicates: these run inside whole-stage codegen
and — unlike the reference's opaque lambdas — are visible to the optimizer,
so filters push down into the parquet scan and unused columns are pruned
(verified via ``explain()`` in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..common import dec2, one, round_dec
from ..plans.registry import register
from ..session import load_table


@register(
    "project_expr",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
             AS revenue,
           ROUND(l_quantity * 2.5 + 1, 2) AS adj_qty
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection; arithmetic + aliasing, no shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        round_dec(dec2("l_extendedprice") * (one() - dec2("l_discount", 4)), 2).alias("revenue"),
        F.round(F.col("l_quantity") * 2.5 + 1, 2).alias("adj_qty"),
    )


@register(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice BETWEEN 10000 AND 50000)
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND NOT (o_custkey % 7 = 0)
      AND o_orderpriority LIKE '%H%'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates: AND/OR/NOT, BETWEEN, IN, LIKE."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (
            (F.col("o_orderstatus") == "F")
            | F.col("o_totalprice").between(10000, 50000)
        )
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~(F.col("o_custkey") % 7 == 0)
        & F.col("o_orderpriority").like("%H%")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_null",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS status_or_null,
           CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 'was_P' ELSE 'other' END AS tag
    FROM orders
    WHERE NULLIF(o_orderstatus, 'P') IS NULL
       OR (NULLIF(o_orderstatus, 'P') IS NOT NULL AND o_orderkey % 100 = 0)
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued null logic (fixtures are null-free, so nulls are
    manufactured with NULLIF and then filtered with IS [NOT] NULL)."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.when(status_or_null.isNull(), "was_P").otherwise("other").alias("tag"),
    ).where(
        status_or_null.isNull()
        | (status_or_null.isNotNull() & (F.col("o_orderkey") % 100 == 0))
    )


@register(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row duplicate elimination — hash aggregate on all columns."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()
