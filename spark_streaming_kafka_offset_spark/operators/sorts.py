"""§2.6 Sorts / limits / top-k (SURVEY.md).

The driver's value-hash is order-insensitive, so sortedness itself is made
verifiable by materializing the rank as a column (``sort_multi``) and by the
selected row *set* (``limit_topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table


@register(
    "sort_multi",
    oracle="""
    SELECT s_nationkey, s_acctbal, s_name,
           ROW_NUMBER() OVER (ORDER BY s_nationkey ASC NULLS LAST,
                              s_acctbal DESC, s_suppkey) AS sort_pos
    FROM supplier
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with nulls placement, verified via a global rank col.

    The unpartitioned window collapses to one task — deliberate here (the
    point is a *total* order; any engine must serialize it).  At scale the
    same total order comes from ``df.orderBy`` (range-partitioned sort) and
    ``zipWithIndex``-style ranks are avoided.
    """
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(
        F.col("s_nationkey").asc_nulls_last(),
        F.col("s_acctbal").desc(),
        F.col("s_suppkey"),
    )
    return s.select(
        "s_nationkey",
        "s_acctbal",
        "s_name",
        F.row_number().over(w).alias("sort_pos"),
    )


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark fuses orderBy().limit(k) into
    TakeOrderedAndProject: each partition keeps a k-heap, the driver merges
    k·p rows; no global sort.  Unique tie-break keeps the row set stable.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )
