"""§2.5 Window functions (SURVEY.md).

Determinism rule for the oracle hash: every ORDER BY inside a window spec
ends with a unique tie-break key (orderkey / event_id) — otherwise
rank/lag assignment is engine-dependent.

Scale: window functions shuffle once on partitionBy keys and sort within
partitions.  A window with NO partitionBy collapses to a single task — only
``sort_multi`` (§2.6) uses that deliberately, documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..common import round_dec, dec2, epoch_seconds
from ..plans.registry import register
from ..session import load_table


@register(
    "win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over (customer, price desc) with unique tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           ROUND(value - LAG(value, 1, 0.0) OVER w, 2) AS delta_prev,
           LEAD(event_type, 1, 'none') OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with defaults — per-user event deltas in time order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") - F.lag("value", 1, 0.0).over(w), 2).alias(
            "delta_prev"
        ),
        F.lead("event_type", 1, "none").over(w).alias("next_type"),
    )


@register(
    "win_frame_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def win_frame_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with explicit ROWS frame (exact decimal, see common.py)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        round_dec(F.sum(dec2("o_totalprice")).over(w), 2).alias("running_spend"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2)))
             OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS value_7d
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding sum per user — RANGE frame over epoch seconds.

    Both engines order by floor(epoch seconds) (Spark ``epoch_seconds(ts)``
    ≡ DuckDB ``epoch_us(ts) // 1000000``) so the frame boundary is identical;
    RANGE includes all peer rows of equal key, so the sum is tie-safe.
    ``epoch_seconds`` is wall-clock field arithmetic, so it accepts the
    TIMESTAMP_NTZ the regenerated fixtures now carry (``cast('long')`` does
    not).
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_seconds("ts"))
        .rangeBetween(-7 * 86400, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        round_dec(F.sum(dec2("value")).over(w), 2).alias("value_7d"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via row_number filter.

    Catalyst 3.5+/4.x applies the WindowGroupLimit optimization: the rn<=k
    predicate is pushed into the window sort so each partition keeps only k
    rows before the final window — the scalable form of per-group top-k.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "win_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
           NTH_VALUE(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_key,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: percent_rank / cume_dist /
    first_value / nth_value / ntile(4) per customer.  The rational outputs
    ((rank-1)/(n-1), rank/n) are IEEE divisions of identical integers in
    both engines — bit-identical, so deliberately NOT rounded (rounding
    could only introduce divergence).  nth_value needs the full-partition
    frame (default frame stops at CURRENT ROW and yields NULL until row
    2 — classic trap, mirrored explicitly in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_key"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST((2 * SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER w
                 + COUNT(*) OVER w)
                // (2 * COUNT(*) OVER w) AS BIGINT) AS ma4_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-order moving average per customer — the bounded-ROWS-frame
    companion to win_frame_running (unbounded) and win_range_frame
    (RANGE): all three physical frame kinds are now covered.

    The average is computed entirely in integer cents with explicit
    half-up rounding: ``(2s + n) div (2n)`` for positive s.  A
    ``round(sum/count, 2)`` double formulation looks equivalent but is
    NOT: frames of 2 or 4 two-decimal values land the quotient exactly
    on half-cent boundaries where Spark and DuckDB round differently
    (measured: 38452.395 → .40 vs .39).  Integer division has no such
    boundary.  One shuffle on o_custkey shared by both window
    functions."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    framed = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(cents).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    # `div` is true integer division (no float quotient to mis-round)
    return framed.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr("(2 * s + n) div (2 * n)").cast("long").alias("ma4_cents"),
    )


@register(
    "win_running_distinct",
    # Running distinct count as windows: the first occurrence of each
    # (user, type) gets flag 1 (row_number over the per-type order),
    # the user-ordered cumsum of flags IS the running distinct count;
    # only discovery rows (flag = 1) are emitted — the per-user
    # type-discovery timeline.
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS event_seq
        FROM events
    ), cum AS (
        SELECT user_id, ts, event_id, event_type, first_seen, event_seq,
               SUM(first_seen) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
                   AS distinct_so_far
        FROM flagged
    )
    SELECT user_id, ts, event_type,
           CAST(distinct_so_far AS BIGINT) AS nth_distinct,
           CAST(event_seq AS BIGINT) AS events_until_discovery
    FROM cum WHERE first_seen = 1
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-distinct-count timeline: for each user, the moments a
    NEW event type first appears, with the running distinct-type count
    at that moment and how many events it took to get there — the
    feature-adoption / exploration-depth readout, and the standard
    answer to "cumulative COUNT(DISTINCT) OVER" which no SQL engine
    supports directly: a first-seen flag (per-key row_number = 1)
    cumulatively summed IS the running distinct count.

    Scale notes: both row_numbers and the cumsum are user-partitioned
    windows sharing ONE hash shuffle on user_id (Spark chains them in
    a single sort within the partition); output is |users| x |types|
    rows max — discovery events only, never the full event stream.
    No global window anywhere."""
    e = load_table(spark, sf_dir, "events")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.row_number().over(w_type) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
        F.row_number().over(w_user).alias("event_seq"),
    )
    cum = flagged.withColumn(
        "distinct_so_far", F.sum("first_seen").over(w_user)
    )
    return cum.where(F.col("first_seen") == 1).select(
        "user_id",
        "ts",
        "event_type",
        F.col("distinct_so_far").cast("long").alias("nth_distinct"),
        F.col("event_seq").cast("long").alias("events_until_discovery"),
    )


@register(
    "win_median_sliding",
    # Exact 7-day sliding median of daily revenue on the calendar
    # rollup: the window's ≤7 values are collected, sorted, and the
    # lower median selected by integer index — no approximate
    # percentile, no float; edges use the shorter window (the standard
    # centered-window convention), so every day has a defined median.
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS rev
        FROM events GROUP BY 1
    )
    SELECT day, rev,
           CAST(list_sort(list(rev) OVER (
                    ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                ))[(len(list(rev) OVER (
                    ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                )) + 1) // 2] AS BIGINT) AS median7_cents,
           CAST(len(list(rev) OVER (
                    ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                )) AS BIGINT) AS window_n
    FROM d ORDER BY day
    """,
)
def win_median_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding-window median — the robust trend line a moving
    AVERAGE cannot give (one outlier day drags a mean for a week; the
    median shrugs): per day, the lower median of daily revenue over
    the centered 7-day window, computed EXACTLY by collecting the
    window's ≤7 values, sorting, and integer-index selection — the
    window-collect idiom that is exact precisely because the frame is
    small and bounded (for wide frames the engine's t-digest rollup
    `rollup_tdigest` is the scale path; this op is the exact
    complement).  Edge days use their shorter window (standard
    centered convention), reported via ``window_n``.

    Scale notes: ONE hash aggregate to the calendar-day rollup; the
    collect/sort window runs on that ≤|days|-row frame (reviewed
    SINGLE — never corpus-grain; a per-user variant would partition
    by user and stay parallel)."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("rev")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    vals = F.array_sort(F.collect_list("rev").over(w7))
    return d.select(
        "day",
        "rev",
        F.element_at(vals, ((F.size(vals) + 1) / 2).cast("int"))
        .cast("long")
        .alias("median7_cents"),
        F.size(vals).cast("long").alias("window_n"),
    ).orderBy("day")
