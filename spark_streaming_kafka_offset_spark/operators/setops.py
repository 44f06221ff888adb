"""§2.7 Set operations (SURVEY.md).

Semantics: ``UNION`` / ``INTERSECT`` / ``EXCEPT`` are DISTINCT set ops in
SQL; Spark's ``union()`` is bag (UNION ALL) — the oracle SQL makes the
chosen semantics explicit in each pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import load_table


def _custkeys_in_year(o: DataFrame, year: int) -> DataFrame:
    return o.where(F.year("o_orderdate") == year).select("o_custkey")


@register(
    "set_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    UNION
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set (distinct) union of 1995/1996 buyers."""
    o = load_table(spark, sf_dir, "orders")
    return _custkeys_in_year(o, 1995).union(_custkeys_in_year(o, 1996)).distinct()


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (UNION ALL) — duplicates preserved."""
    o = load_table(spark, sf_dir, "orders")
    return _custkeys_in_year(o, 1995).union(_custkeys_in_year(o, 1996))


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who bought in both years (distinct intersection)."""
    o = load_table(spark, sf_dir, "orders")
    return _custkeys_in_year(o, 1995).intersect(_custkeys_in_year(o, 1996))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1995 buyers who did not buy in 1996 (distinct difference).

    ``subtract`` is EXCEPT DISTINCT; ``exceptAll().distinct()`` would be
    wrong — a key with more 1995 than 1996 occurrences would survive.
    """
    o = load_table(spark, sf_dir, "orders")
    return _custkeys_in_year(o, 1995).subtract(_custkeys_in_year(o, 1996))


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): each customer appears
    min(n_1995, n_1996) times — the multiplicity-preserving variant
    `set_intersect` collapses; completes the ALL family with
    `set_union_all`.

    Scale notes: Catalyst lowers this to one hash aggregation per side
    (key → count) + a join — the same single-shuffle-per-side shape as
    INTERSECT; multiplicities never materialize as row copies until
    output."""
    o = load_table(spark, sf_dir, "orders")
    return _custkeys_in_year(o, 1995).intersectAll(_custkeys_in_year(o, 1996))


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): each customer appears
    max(0, n_1995 − n_1996) times — order-frequency arithmetic that the
    DISTINCT variant erases (cf. `set_except`'s docstring warning that
    `exceptAll().distinct()` ≠ `subtract`; this op is the other side of
    that distinction, deliberately exposed).

    Scale notes: same count-join lowering as `set_intersect_all` — one
    partial+final agg per side, one join on the key."""
    o = load_table(spark, sf_dir, "orders")
    return _custkeys_in_year(o, 1995).exceptAll(_custkeys_in_year(o, 1996))
