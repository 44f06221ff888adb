"""Ordered / sweep-line analytics (r7 batch) — §2.19.

The operator class whose semantics depend on a total order — interval
sweep-lines (peak concurrency), Pareto frontiers (skyline), hysteresis
state machines (burst labeling), inter-event gap mixes, per-entity
entropy rollups, and period-over-period deltas — each expressed so the
ordered state is BOUNDED (a per-key or rollup-sized window), never a
global sort of corpus rows.  Exactness discipline as in
``operators/statistics.py``.

Reference parity [K]: no citation into /root/reference possible (mirror
empty, SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..common import epoch_seconds
from ..plans.registry import register
from ..session import load_table


@register(
    "events_peak_concurrency",
    # Sweep-line over ±1 deltas of the 30-minute activity intervals,
    # partitioned by the interval's START day: running sum ordered by
    # (second, delta) — delta ASC processes ends before starts at equal
    # times (end-exclusive intervals) — then MAX per day.
    oracle="""
    WITH deltas AS (
        SELECT CAST(ts AS DATE) AS day, epoch_us(ts) // 1000000 AS sec,
               1 AS delta
        FROM events
        UNION ALL
        SELECT CAST(ts AS DATE) AS day,
               epoch_us(ts) // 1000000 + 1800 AS sec, -1 AS delta
        FROM events
    ), running AS (
        SELECT day,
               SUM(delta) OVER (PARTITION BY day ORDER BY sec, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc
        FROM deltas
    )
    SELECT day,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(COUNT(*) // 2 AS BIGINT) AS n_intervals
    FROM running GROUP BY day
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per day: each event opens a 30-minute
    presence interval [ts, ts+30min); the classic sweep-line (+1 at
    start, −1 at end, running sum, max) gives the day's peak
    concurrency — the capacity-planning number a rate-limit or
    autoscaler consumes.  End-exclusive semantics: at equal seconds the
    −1 sorts first (delta ASC), so back-to-back intervals never
    double-count.

    Scale notes: the sweep is PARTITIONED by the interval's start day
    (both endpoints carry the start day; a midnight-crossing interval
    counts toward its start day only — documented truncation, bounded
    at 30 min), so the ordered running-sum state is one day of deltas
    per task, never a global sort.  Equal-(sec,delta) groups are
    same-sign, so the prefix maximum is order-insensitive within the
    group — the window is deterministic without a third tiebreaker."""
    e = load_table(spark, sf_dir, "events")
    sec = epoch_seconds("ts")
    starts = e.select(
        F.col("ts").cast("date").alias("day"),
        sec.alias("sec"),
        F.lit(1).alias("delta"),
    )
    ends = e.select(
        F.col("ts").cast("date").alias("day"),
        (sec + 1800).alias("sec"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends)
    w = (
        Window.partitionBy("day")
        .orderBy("sec", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = deltas.select("day", F.sum("delta").over(w).alias("conc"))
    return running.groupBy("day").agg(
        F.max("conc").cast("long").alias("peak_concurrency"),
        F.expr("CAST(count(*) div 2 AS BIGINT)").alias("n_intervals"),
    )


@register(
    "orders_skyline_2d",
    # Pareto frontier without a pair join: dominated-by-strictly-richer
    # via a RANGE frame (1 FOLLOWING .. UNBOUNDED on revenue cents =
    # strictly greater revenue), dominated-within-tie via the equal-
    # revenue partition max; skyline = neither.
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(MAX(o_orderdate) AS DATE)) AS BIGINT)
                   AS last_day
        FROM orders GROUP BY o_custkey
    ), flagged AS (
        SELECT o_custkey, rev_cents, last_day,
               MAX(last_day) OVER (ORDER BY rev_cents
                                   RANGE BETWEEN 1 FOLLOWING
                                   AND UNBOUNDED FOLLOWING) AS best_richer,
               MAX(last_day) OVER (PARTITION BY rev_cents) AS best_tie
        FROM cust
    )
    SELECT o_custkey, rev_cents, last_day
    FROM flagged
    WHERE COALESCE(best_richer >= last_day, FALSE) = FALSE
      AND best_tie <= last_day
    """,
)
def orders_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of customers maximizing BOTH total
    revenue and recency (last order day): a customer is dominated if
    another has ≥ on both axes and > on at least one.  The frontier is
    computed WITHOUT the quadratic pair join: a RANGE window frame
    (1 FOLLOWING → unbounded, over integer revenue cents) yields the
    best recency among STRICTLY richer customers, and an equal-revenue
    partition max handles the tie axis.

    Scale notes: corpus → customer rollup in one agg; the revenue-
    ordered window is the same single-total-order class as
    ``agg_gini_lorenz`` (range-partitioned two-pass rank is the giant-
    dim variant — the frame only needs suffix maxima, which
    range-partition cleanly).  Output is the frontier — typically
    O(log n) of the dim — so downstream consumers never see the
    rollup."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
        F.datediff(
            F.max("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("last_day"),
    )
    w_richer = Window.orderBy("rev_cents").rangeBetween(
        1, Window.unboundedFollowing
    )
    w_tie = Window.partitionBy("rev_cents")
    flagged = cust.select(
        "o_custkey",
        "rev_cents",
        "last_day",
        F.max("last_day").over(w_richer).alias("best_richer"),
        F.max("last_day").over(w_tie).alias("best_tie"),
    )
    return flagged.where(
        (
            F.coalesce(
                F.col("best_richer") >= F.col("last_day"), F.lit(False)
            )
            == F.lit(False)
        )
        & (F.col("best_tie") <= F.col("last_day"))
    ).select("o_custkey", "rev_cents", "last_day")


@register(
    "events_burst_hysteresis",
    # Hysteresis state machine as a window expression: decided points
    # (rate > 1.3x mean -> 1, < 0.8x mean -> 0, else NULL) carried
    # forward by last_value IGNORE NULLS — exactly state_t = f(x_t,
    # state_{t-1}) without recursion.  Thresholds compared in integers:
    # c * H * 10 vs total * 13 (or * 8).
    oracle="""
    WITH hourly AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS h, COUNT(*) AS c
        FROM events GROUP BY event_type, h
    ), bounds AS (
        SELECT event_type, h, c,
               SUM(c) OVER (PARTITION BY event_type) AS total_c,
               MAX(h) OVER () - MIN(h) OVER () + 1 AS n_hours
        FROM hourly
    ), decided AS (
        SELECT event_type, h, c,
               CASE WHEN c * n_hours * 10 > total_c * 13 THEN 1
                    WHEN c * n_hours * 10 < total_c * 8 THEN 0
                    ELSE NULL END AS decision
        FROM bounds
    ), states AS (
        SELECT event_type, h, c, decision,
               COALESCE(LAST_VALUE(decision IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                   AS state
        FROM decided
    ), edges AS (
        SELECT event_type, h, c, state,
               CASE WHEN state = 1 AND COALESCE(LAG(state) OVER (
                    PARTITION BY event_type ORDER BY h), 0) = 0
                    THEN 1 ELSE 0 END AS edge
        FROM states
    )
    SELECT event_type, CAST(h AS BIGINT) AS hour_idx,
           CAST(c AS BIGINT) AS n_events,
           CAST(state AS INT) AS burst_state,
           CAST(SUM(edge) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS burst_seq
    FROM edges
    """,
)
def events_burst_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst labeling of the hourly per-type event rate with HYSTERESIS
    (Schmitt trigger): enter burst above 1.3× the type's mean hourly
    rate, exit below 0.8× — the two-threshold discipline that stops
    alert flapping.  The recursive state machine state_t = f(x_t,
    state_{t−1}) becomes a pure window expression: decided hours map to
    1/0, undecided to NULL, and last_value(IGNORE NULLS) carries the
    state forward; burst_seq numbers rising edges via a lagged-state
    cumsum.  All threshold comparisons are integer cross-products
    (c·H·10 vs total·13).

    Scale notes: one hash agg to the (type × hour) rollup; every window
    is partitioned by type over that rollup (≤ |types| × |hours| rows).
    The mean-rate denominator H spans min→max hour GLOBALLY (two
    1-value windows on the rollup), so silent hours still count toward
    the rate."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", epoch_seconds("ts").alias("es"))
        .groupBy("event_type", F.expr("es div 3600").alias("h"))
        .agg(F.count("*").alias("c"))
    )
    w_type = Window.partitionBy("event_type")
    w_all = Window.partitionBy()
    bounds = hourly.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(w_type).alias("total_c"),
        (F.max("h").over(w_all) - F.min("h").over(w_all) + 1).alias(
            "n_hours"
        ),
    )
    decided = bounds.select(
        "event_type",
        "h",
        "c",
        F.when(
            F.col("c") * F.col("n_hours") * 10 > F.col("total_c") * 13,
            F.lit(1),
        )
        .when(
            F.col("c") * F.col("n_hours") * 10 < F.col("total_c") * 8,
            F.lit(0),
        )
        .alias("decision"),
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lag = Window.partitionBy("event_type").orderBy("h")
    states = decided.select(
        "event_type",
        "h",
        "c",
        F.coalesce(
            F.last("decision", ignorenulls=True).over(w_carry), F.lit(0)
        ).alias("state"),
    )
    edges = states.select(
        "event_type",
        "h",
        "c",
        "state",
        F.when(
            (F.col("state") == 1)
            & (F.coalesce(F.lag("state").over(w_lag), F.lit(0)) == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("edge"),
    )
    return edges.select(
        "event_type",
        F.col("h").cast("long").alias("hour_idx"),
        F.col("c").cast("long").alias("n_events"),
        F.col("state").cast("int").alias("burst_state"),
        F.sum("edge").over(w_carry).cast("long").alias("burst_seq"),
    )


@register(
    "customer_interpurchase_mix",
    # Inter-order gaps per customer (lag over (date, orderkey) —
    # deterministic under same-day ties), bucketed into the classic
    # RFM cadence bands, shares in exact ppm per segment.
    oracle="""
    WITH gaps AS (
        SELECT c.c_mktsegment AS seg,
               date_diff('day',
                         CAST(LAG(o.o_orderdate) OVER (
                             PARTITION BY o.o_custkey
                             ORDER BY o.o_orderdate, o.o_orderkey) AS DATE),
                         CAST(o.o_orderdate AS DATE)) AS gap_days
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), bucketed AS (
        SELECT seg,
               CASE WHEN gap_days <= 7 THEN '0-7'
                    WHEN gap_days <= 30 THEN '8-30'
                    WHEN gap_days <= 90 THEN '31-90'
                    ELSE '91+' END AS gap_bucket
        FROM gaps WHERE gap_days IS NOT NULL
    )
    SELECT seg, gap_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COUNT(*) * 1000000 //
                SUM(COUNT(*)) OVER (PARTITION BY seg) AS BIGINT) AS share_ppm
    FROM bucketed GROUP BY seg, gap_bucket
    """,
)
def customer_interpurchase_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence mix per market segment: the day gaps
    between a customer's consecutive orders (lag per customer, ordered
    by (date, orderkey) so same-day repeat orders are deterministic and
    count as 0-day gaps), bucketed into the weekly/monthly/quarterly
    bands an RFM or replenishment model consumes, with exact ppm shares
    per segment.

    Scale notes: the lag window is partitioned by customer (the natural
    key distribution — no skew beyond the max-orders-per-customer
    bound); the bucket aggregate is |segments|×4 rows and the share
    window runs on that rollup."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate")).over(w).cast("date"),
            ).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    bucketed = gaps.select(
        "seg",
        F.when(F.col("gap_days") <= 7, "0-7")
        .when(F.col("gap_days") <= 30, "8-30")
        .when(F.col("gap_days") <= 90, "31-90")
        .otherwise("91+")
        .alias("gap_bucket"),
    )
    w_seg = Window.partitionBy("seg")
    return (
        bucketed.groupBy("seg", "gap_bucket")
        .agg(F.count("*").alias("n_gaps"))
        .select(
            "seg",
            "gap_bucket",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.expr(
                "CAST(n_gaps * 1000000 div "
                "sum(n_gaps) OVER (PARTITION BY seg) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


@register(
    "events_user_day_entropy",
    # Per-(user, day) event-type entropy in integer milli-nats (ROUND
    # of the one bounded float expression per row), then an exact
    # integer rollup by events-per-day band.
    oracle="""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, day, event_type
    ), ent AS (
        SELECT user_id, day, SUM(c) AS n,
               CAST(ROUND(1000.0 * (ln(CAST(SUM(c) AS DOUBLE))
                    - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c))) AS BIGINT)
                   AS h_mnats
        FROM ud GROUP BY user_id, day
    ), banded AS (
        SELECT CASE WHEN n = 1 THEN '1' WHEN n <= 3 THEN '2-3'
                    WHEN n <= 7 THEN '4-7' ELSE '8+' END AS events_band,
               h_mnats
        FROM ent
    )
    SELECT events_band,
           CAST(COUNT(*) AS BIGINT) AS n_user_days,
           CAST(SUM(h_mnats) AS BIGINT) AS total_mnats,
           CAST(SUM(h_mnats) // COUNT(*) AS BIGINT) AS avg_mnats
    FROM banded GROUP BY events_band
    """,
)
def events_user_day_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity profile: Shannon entropy of each user-day's
    event-type mix (bots repeat one action — entropy ≈ 0 at high
    volume; engaged humans mix), quantized to integer MILLI-NATS per
    user-day (ONE rounded float expression over that row's integer
    counts — the ``text_lm_perplexity`` integer-quantization recipe),
    then rolled up by events-per-day band with exact integer sums and
    integer-division averages.

    Scale notes: two stacked hash aggregates — (user, day, type) then
    (user, day) — both keyed on the user prefix so the second reuses
    the first's partitioning; the band rollup is 4 rows.  No float ever
    crosses an aggregation boundary: entropy is quantized to BIGINT
    before any sum."""
    e = load_table(spark, sf_dir, "events")
    ud = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    ent = ud.groupBy("user_id", "day").agg(
        F.sum("c").alias("n"),
        F.round(
            1000.0
            * (
                F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
                / F.sum("c")
            )
        )
        .cast("bigint")
        .alias("h_mnats"),
    )
    banded = ent.select(
        F.when(F.col("n") == 1, "1")
        .when(F.col("n") <= 3, "2-3")
        .when(F.col("n") <= 7, "4-7")
        .otherwise("8+")
        .alias("events_band"),
        "h_mnats",
    )
    return banded.groupBy("events_band").agg(
        F.count("*").cast("long").alias("n_user_days"),
        F.sum("h_mnats").cast("long").alias("total_mnats"),
        F.expr("CAST(sum(h_mnats) div count(*) AS BIGINT)").alias(
            "avg_mnats"
        ),
    )


@register(
    "win_percent_change",
    # Month-over-month revenue per nation: lag over the (nation, month)
    # rollup; deltas and ppm changes in exact integers (both engines
    # truncate integer division toward zero — negative deltas agree).
    oracle="""
    WITH monthly AS (
        SELECT n.n_name AS nation,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY nation, month
    )
    SELECT nation, month, rev_cents,
           LAG(rev_cents) OVER (PARTITION BY nation ORDER BY month)
               AS prev_rev_cents,
           rev_cents - LAG(rev_cents) OVER (PARTITION BY nation
                                            ORDER BY month)
               AS mom_delta_cents,
           CAST((rev_cents - LAG(rev_cents) OVER (PARTITION BY nation
                                                  ORDER BY month)) * 1000000
                // LAG(rev_cents) OVER (PARTITION BY nation ORDER BY month)
                AS BIGINT) AS mom_ppm
    FROM monthly
    """,
)
def win_percent_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per nation — the
    period-over-period window family: monthly revenue cents per nation,
    previous ACTIVE month via lag (a nation with a silent month compares
    against its last trading month — documented gap semantics), delta
    and ppm change as exact integers.  Both engines truncate integer
    division toward zero, so negative deltas agree exactly.

    Scale notes: corpus → (nation × month) rollup in one agg (the two
    dim joins are broadcasts); the lag window is partitioned by nation
    over ≤ |months| rows each.  First month per nation yields NULLs —
    kept, because a downstream alerting join needs the row to know the
    series started."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = Window.partitionBy("nation").orderBy("month")
    return monthly.select(
        "nation",
        "month",
        "rev_cents",
        F.lag("rev_cents").over(w).alias("prev_rev_cents"),
        (F.col("rev_cents") - F.lag("rev_cents").over(w)).alias(
            "mom_delta_cents"
        ),
        F.expr(
            "CAST((rev_cents - lag(rev_cents) OVER (PARTITION BY nation "
            "ORDER BY month)) * 1000000 div lag(rev_cents) OVER "
            "(PARTITION BY nation ORDER BY month) AS BIGINT)"
        ).alias("mom_ppm"),
    )


@register(
    "lineitem_discount_lift",
    # Discount-tier lift vs the zero-discount baseline per brand:
    # ratios as exact integer cross-products in ppm (qty_d·n₀·1e6 //
    # (qty₀·n_d)), DECIMAL(38,0) products past the BIGINT cliff.
    oracle="""
    WITH t AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(l.l_discount * 10000) AS BIGINT) AS disc_bp,
               COUNT(*) AS n_lines,
               SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS qty,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                   AS rev_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY brand, disc_bp
    ), base AS (
        SELECT brand, n_lines AS n0, qty AS qty0, rev_cents AS rev0
        FROM t WHERE disc_bp = 0
    )
    SELECT t.brand, t.disc_bp,
           CAST(t.n_lines AS BIGINT) AS n_lines,
           CAST(CAST(t.qty AS HUGEINT) * b.n0 * 1000000
                // (CAST(b.qty0 AS HUGEINT) * t.n_lines) AS BIGINT)
               AS qty_per_line_lift_ppm,
           CAST(CAST(t.rev_cents AS HUGEINT) * b.n0 * 1000000
                // (CAST(b.rev0 AS HUGEINT) * t.n_lines) AS BIGINT)
               AS rev_per_line_lift_ppm
    FROM t JOIN base b ON t.brand = b.brand
    WHERE t.disc_bp > 0
    """,
)
def lineitem_discount_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount response: for every discount tier, the lift
    of per-line quantity and per-line revenue against the SAME brand's
    zero-discount baseline — the observational price-response table a
    pricing model starts from.  Lift ratios are exact integer
    cross-products in ppm (qty_d·n₀·10⁶ ÷ (qty₀·n_d)) with
    DECIMAL(38,0)/HUGEINT intermediates (the cross-product crosses
    BIGINT near sf10 — the revenue-bridge overflow discipline).

    Scale notes: one fact pass with a broadcast part join into a
    (brand × tier) rollup (≤ 25×11 rows); the baseline join is
    rollup-to-rollup on brand.  No float ratio anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    t = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_discount") * 10000)
            .cast("bigint")
            .alias("disc_bp"),
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.round("l_quantity").cast("bigint")).alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "rev_cents"
            ),
        )
    )
    base = t.where(F.col("disc_bp") == 0).select(
        F.col("brand").alias("b_brand"),
        F.col("n_lines").alias("n0"),
        F.col("qty").alias("qty0"),
        F.col("rev_cents").alias("rev0"),
    )
    return (
        t.where(F.col("disc_bp") > 0)
        .join(base, t.brand == F.col("b_brand"))
        .select(
            "brand",
            "disc_bp",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.expr(
                "CAST(CAST(qty AS DECIMAL(38,0)) * n0 * 1000000 div "
                "(CAST(qty0 AS DECIMAL(38,0)) * n_lines) AS BIGINT)"
            ).alias("qty_per_line_lift_ppm"),
            F.expr(
                "CAST(CAST(rev_cents AS DECIMAL(38,0)) * n0 * 1000000 div "
                "(CAST(rev0 AS DECIMAL(38,0)) * n_lines) AS BIGINT)"
            ).alias("rev_per_line_lift_ppm"),
        )
    )
