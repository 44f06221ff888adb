"""§2 extension: reshape operators — PIVOT (long→wide) and UNPIVOT
(wide→long), the standard OLAP cross-tab pair.

Scale notes (100 TB):

* PIVOT here is compiled manually to conditional aggregation
  (``count(CASE WHEN type=v)`` per value) rather than
  ``DataFrame.pivot``.  Measured on this repo: ``.pivot()`` with an
  explicit value list still plans TWO exchanges (a pre-aggregate on
  ``(group, pivot)`` then ``pivotfirst`` on ``group``), while the
  conditional-aggregate form is ONE exchange with map-side partials —
  at 100 TB that is half the shuffle volume, and the fact table is the
  big side.  (``.pivot()`` without a value list is worse still: a
  distinct-collect discovery job scans the fact table an extra time.)
* UNPIVOT uses the real ``DataFrame.unpivot`` — an Expand node, map-side
  only, no shuffle; its cost is output volume, which scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import load_table

#: The pivot domain (FIXTURES.md: events.event_type) — fixed so the plan
#: needs no discovery pass, and so the wide schema is stable for the oracle.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _wide_counts(e: DataFrame) -> DataFrame:
    """Single-shuffle cross-tab: one conditional count per event type."""
    return e.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in EVENT_TYPES
        ]
    )


@register(
    "pivot_wide",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2)))
                      FILTER (WHERE event_type = 'purchase'), 2) AS DOUBLE)
               AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type cross-tab: one count column per event type plus
    a pivoted money sum — the single-shuffle conditional-aggregate
    formulation (see module docstring for why not ``.pivot()``)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in EVENT_TYPES
        ],
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(12,2)"),
                )
            ),
            2,
        )
        .cast("double")
        .alias("purchase_value"),
    )


@register(
    "unpivot_long",
    oracle="""
    WITH wide AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view
        FROM events GROUP BY user_id
    )
    SELECT user_id, event_type, n FROM (
        SELECT user_id, 'click' AS event_type, click AS n FROM wide
        UNION ALL SELECT user_id, 'error', error FROM wide
        UNION ALL SELECT user_id, 'purchase', purchase FROM wide
        UNION ALL SELECT user_id, 'signup', signup FROM wide
        UNION ALL SELECT user_id, 'view', view FROM wide
    ) WHERE n > 0
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the cross-tab back to (user_id, event_type, n) via
    ``DataFrame.unpivot`` (Expand node — map-side, adds no shuffle beyond
    the cross-tab's single aggregate exchange).  Round-trip property:
    ``unpivot(pivot(e))`` equals ``groupBy(user_id, event_type).count()``
    — the oracle rebuilds the wide table and melts it with UNION ALL."""
    e = load_table(spark, sf_dir, "events")
    return _wide_counts(e).unpivot(
        ids=["user_id"],
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    ).where(F.col("n") > 0)
