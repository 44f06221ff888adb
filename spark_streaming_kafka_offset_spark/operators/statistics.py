"""Exact statistical analytics (r6 batch) — §2.18.

Five shapes a warehouse user reaches for weekly — independence testing,
distribution entropy, robust (trimmed/winsorized) means, autocorrelation,
and year-over-year revenue decomposition — each with a DuckDB oracle twin
and the engine-wide exactness discipline: every value that decides a row
or lands in the output is either pure integer arithmetic or ONE IEEE
division of identical integers (optionally rounded), never an
order-dependent float accumulation.

Reference parity [K]: no citation into /root/reference possible (mirror
empty, SURVEY.md §0); these are the analytics a Spark-first engine adds
beyond the reference's per-batch reduceByKey surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..common import epoch_seconds
from ..plans.registry import register
from ..session import load_table


@register(
    "agg_chisq_independence",
    # Per-cell chi-square contributions: (N*O - r*c)^2 / (N*r*c), with
    # the squared deviation carried as HUGEINT/DECIMAL(38,0): dev can
    # reach ~N^2/|cells|, so dev^2 crosses BIGINT at ~sf1 (8e21 at
    # N=1.5e6) — under the session's ANSI mode that is a runtime error,
    # not a wrong answer, but the wide-integer form removes the cliff.
    # Both engines then cast the IDENTICAL integer to double (rounding
    # identically past 2^53) and perform ONE IEEE division; ROUND(.,6)
    # is deterministic.  No cross-cell float sum anywhere: the 25-cell
    # total is driver-trivial.
    oracle="""
    WITH cells AS (
        SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS obs
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    ), tot AS (
        SELECT c_mktsegment, o_orderpriority, obs,
               SUM(obs) OVER (PARTITION BY c_mktsegment) AS row_total,
               SUM(obs) OVER (PARTITION BY o_orderpriority) AS col_total,
               SUM(obs) OVER () AS grand_total
        FROM cells
    )
    SELECT c_mktsegment, o_orderpriority,
           CAST(obs AS BIGINT) AS obs,
           CAST(row_total AS BIGINT) AS row_total,
           CAST(col_total AS BIGINT) AS col_total,
           ROUND(
             CAST((grand_total*obs - row_total*col_total)::HUGEINT
                  * (grand_total*obs - row_total*col_total) AS DOUBLE)
             / CAST(grand_total::HUGEINT*row_total*col_total AS DOUBLE), 6
           ) AS chisq_contrib
    FROM tot
    """,
)
def agg_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment
    and order priority: the 5x5 contingency table with per-cell
    (O-E)^2/E contributions in the integer-rearranged form
    (N*O - r*c)^2 / (N*r*c), which never materializes the fractional
    expected count.

    Scale notes: the only corpus-sized work is the fact-dim join and ONE
    hash aggregate down to |segments| x |priorities| cells; the
    marginal-total windows run on that 25-row rollup (the global-total
    window is an allowlisted single-partition exchange of 25 rows).  The
    final statistic is a sum of 25 printed values — driver-trivial, and
    deliberately NOT emitted as a float sum (order-dependent)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("obs"))
    )
    w_row = Window.partitionBy("c_mktsegment")
    w_col = Window.partitionBy("o_orderpriority")
    w_all = Window.partitionBy()
    tot = cells.select(
        "c_mktsegment",
        "o_orderpriority",
        "obs",
        F.sum("obs").over(w_row).alias("row_total"),
        F.sum("obs").over(w_col).alias("col_total"),
        F.sum("obs").over(w_all).alias("grand_total"),
    )
    dev = (
        F.col("grand_total") * F.col("obs") - F.col("row_total") * F.col("col_total")
    ).cast("decimal(38,0)")
    den = (
        F.col("grand_total").cast("decimal(38,0)")
        * F.col("row_total")
        * F.col("col_total")
    )
    return tot.select(
        "c_mktsegment",
        "o_orderpriority",
        F.col("obs").cast("long").alias("obs"),
        F.col("row_total").cast("long").alias("row_total"),
        F.col("col_total").cast("long").alias("col_total"),
        F.round((dev * dev).cast("double") / den.cast("double"), 6).alias(
            "chisq_contrib"
        ),
    )


@register(
    "agg_entropy_categorical",
    # Same log discipline as text_entropy (proven r5): H over integer
    # counts via ln(n) - sum(c*ln c)/n, ROUND 4 absorbing last-ulp libm
    # drift.  The per-day sum spans <=5 event types — the float
    # accumulation is bounded-cardinality, not corpus-sized.
    oracle="""
    WITH counts AS (
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
        FROM events GROUP BY day, event_type
    )
    SELECT day,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(ln(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 4) AS entropy_nats
    FROM counts
    GROUP BY day
    """,
)
def agg_entropy_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Shannon entropy of the event-type mix — the categorical
    companion to ``text_entropy`` (token distributions): a collapsed
    event mix (entropy -> 0) is the classic instrumentation-outage
    signal, a jump toward ln(|types|) flags bot traffic.

    Scale notes: two hash aggregates, both keyed on the day (the second
    reuses the first's partitioning — one shuffle total); the per-day
    type map never exceeds |event_types| rows.  H computed from integer
    counts only, same engine-agnostic form as text_entropy."""
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy("day").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / F.sum("c"),
            4,
        ).alias("entropy_nats"),
    )


@register(
    "agg_trimmed_winsorized",
    # Robust means in pure integer cents: k = n//10 rows trimmed per
    # tail; the trimmed mean is half-up integer division (2s+n)//(2n)
    # (win_moving_avg's boundary-proof recipe); the winsorized mean
    # re-adds k copies of each boundary value.  Total order
    # (price, orderkey) makes every rank — and therefore every output —
    # deterministic in both engines.
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    ), marked AS (
        SELECT o_orderpriority, cents, rn, n, n // 10 AS k FROM ranked
    ), agg AS (
        SELECT o_orderpriority,
               ANY_VALUE(n) AS n, ANY_VALUE(k) AS k,
               SUM(CASE WHEN rn > k AND rn <= n - k THEN cents END) AS mid_sum,
               SUM(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END) AS mid_n,
               MAX(CASE WHEN rn = k + 1 THEN cents END) AS lo_cents,
               MAX(CASE WHEN rn = n - k THEN cents END) AS hi_cents
        FROM marked GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           CAST((2*mid_sum + mid_n) // (2*mid_n) AS BIGINT)
               AS trimmed_mean_cents,
           CAST((2*(mid_sum + k*lo_cents + k*hi_cents) + n) // (2*n) AS BIGINT)
               AS winsor_mean_cents
    FROM agg
    ORDER BY o_orderpriority
    """,
)
def agg_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed and winsorized mean order value per priority — the
    robust location estimates that survive the price outliers a plain
    AVG drowns in.

    Scale notes: one shuffle on the priority key; the rank window is
    partitioned (never a global sort).  At 100 TB the same plan holds
    per group — for a single giant group use the two-pass
    range-partitioned rank (``common.global_row_number``) exactly as
    ``table_skew_stats(scale_twopass=True)`` does.  All output values
    are integer cents via half-up division — no float mean anywhere."""
    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.row_number()
        .over(wp.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count("*").over(wp).alias("n"),
    ).withColumn("k", F.expr("n div 10"))
    mid = (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))
    agg = ranked.groupBy("o_orderpriority").agg(
        F.any_value("n").alias("n"),
        F.any_value("k").alias("k"),
        F.sum(F.when(mid, F.col("cents"))).alias("mid_sum"),
        F.sum(F.when(mid, 1).otherwise(0)).alias("mid_n"),
        F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("cents"))).alias(
            "lo_cents"
        ),
        F.max(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("cents"))).alias(
            "hi_cents"
        ),
    )
    # `div` (integral division), NEVER floor(a/b): the latter routes two
    # exact longs through ONE double quotient, which can round up across
    # an integer boundary and mis-floor — div stays in integer space.
    return agg.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.expr("(2*mid_sum + mid_n) div (2*mid_n)").alias("trimmed_mean_cents"),
        F.expr(
            "(2*(mid_sum + k*lo_cents + k*hi_cents) + n) div (2*n)"
        ).alias("winsor_mean_cents"),
    ).orderBy("o_orderpriority")


@register(
    "events_acf",
    # Exact integer ACF: with S = sum(x), n = #days, multiplying the
    # deviations through by n turns (x_t - S/n) into the integer
    # (n*x_t - S), so numerator and denominator are exact BIGINT sums
    # and the correlation is ONE IEEE division of identical integers.
    oracle="""
    WITH days AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
               COUNT(*) AS x
        FROM events GROUP BY di
    ), tot AS (
        SELECT di, x, SUM(x) OVER () AS s, COUNT(*) OVER () AS n FROM days
    ), lags AS (
        SELECT CAST(k AS BIGINT) AS lag FROM UNNEST([1,2,3,4,5,6,7]) AS t(k)
    ), num AS (
        SELECT l.lag,
               SUM((t1.n*t1.x - t1.s) * (t2.n*t2.x - t2.s)) AS num_int,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM lags l
        JOIN tot t1 ON TRUE
        JOIN tot t2 ON t2.di = t1.di - l.lag
        GROUP BY l.lag
    ), den AS (
        SELECT SUM((n*x - s)*(n*x - s)) AS den_int FROM tot
    )
    SELECT num.lag, num.n_terms,
           ROUND(CAST(num.num_int AS DOUBLE) / CAST(den.den_int AS DOUBLE), 6)
               AS acf
    FROM num, den
    ORDER BY num.lag
    """,
)
def events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event count at lags 1..7 — the
    weekly-seasonality detector (a spike at lag 7 = weekday pattern)
    that feeds capacity planning and anomaly baselines.

    Scale notes: the corpus collapses to ONE calendar-sized frame
    (|days| rows) in a single hash aggregate; everything after — the
    global-moment window, the 7-lag self-join — runs on that rollup
    (allowlisted single-partition exchange, bounded by the calendar).
    The lag join is an integer equi-join on the day index, never a
    range scan.  Numerator/denominator are exact integer sums, so both
    engines print bit-identical correlations at 6 decimals."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("di")
        )
        .groupBy("di")
        .agg(F.count("*").alias("x"))
    )
    w_all = Window.partitionBy()
    tot = days.select(
        "di",
        "x",
        F.sum("x").over(w_all).alias("s"),
        F.count("*").over(w_all).alias("n"),
    )
    dev = lambda: (F.col("n") * F.col("x") - F.col("s"))  # noqa: E731
    den = tot.select(F.sum(dev() * dev()).alias("den_int"))
    t1 = tot.select(
        "di", (F.col("n") * F.col("x") - F.col("s")).alias("d1")
    ).withColumn("lag", F.explode(F.array(*[F.lit(k) for k in range(1, 8)])))
    t2 = tot.select(
        F.col("di").alias("di2"),
        (F.col("n") * F.col("x") - F.col("s")).alias("d2"),
    )
    num = (
        t1.join(t2, t1.di - t1.lag == t2.di2)
        .groupBy("lag")
        .agg(
            F.sum(F.col("d1") * F.col("d2")).alias("num_int"),
            F.count("*").cast("long").alias("n_terms"),
        )
    )
    return (
        num.join(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_terms",
            F.round(
                F.col("num_int").cast("double") / F.col("den_int").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "revenue_bridge_yoy",
    # Price/volume decomposition with floor division of exact integers:
    # price_effect = rev2 - q2*rev1//q1, volume_effect =
    # (q2-q1)*rev1//q1; the q*rev products are HUGEINT/DECIMAL(38,0)
    # (q*rev ~ 1e17 at sf1 — past 2^53, so 64-bit-float products are
    # NOT exact; hence the wide-integer discipline), and x // y == div
    # for the positive operands here.  residual_cents absorbs the two
    # floor remainders, so the identity delta = price + volume +
    # residual holds exactly.
    oracle="""
    WITH fact AS (
        SELECT p.p_brand,
               CAST(strftime(o.o_orderdate, '%Y') AS INTEGER) AS yr,
               CAST(ROUND(l.l_quantity, 0) AS BIGINT) AS q,
               CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ), pivoted AS (
        SELECT p_brand,
               SUM(CASE WHEN yr = 1996 THEN q ELSE 0 END) AS q1,
               SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS rev1,
               SUM(CASE WHEN yr = 1997 THEN q ELSE 0 END) AS q2,
               SUM(CASE WHEN yr = 1997 THEN cents ELSE 0 END) AS rev2
        FROM fact GROUP BY p_brand
    ), effects AS (
        SELECT p_brand, q1, rev1, q2, rev2,
               rev2 - rev1 AS delta_cents,
               CAST(rev2 - q2::HUGEINT * rev1 // q1 AS BIGINT)
                   AS price_effect_cents,
               CAST((q2 - q1)::HUGEINT * rev1 // q1 AS BIGINT)
                   AS volume_effect_cents
        FROM pivoted WHERE q1 > 0 AND q2 > 0
    )
    SELECT p_brand,
           CAST(q1 AS BIGINT) AS q1, CAST(rev1 AS BIGINT) AS rev1,
           CAST(q2 AS BIGINT) AS q2, CAST(rev2 AS BIGINT) AS rev2,
           CAST(delta_cents AS BIGINT) AS delta_cents,
           price_effect_cents, volume_effect_cents,
           CAST(delta_cents - price_effect_cents - volume_effect_cents
                AS BIGINT) AS residual_cents
    FROM effects
    ORDER BY p_brand
    """,
)
def revenue_bridge_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge per brand (1996 -> 1997): splits the
    revenue delta into a price effect (q2*(p2-p1)) and a volume effect
    ((q2-q1)*p1) without ever materializing the fractional unit price —
    the FP&A waterfall chart as one query.

    Scale notes: ONE pass over the fact table (both years in a single
    scan, pushed date range), conditional aggregation pivots the years
    inside a single hash aggregate — no self-join of two year-filtered
    scans, no second shuffle.  The part dim join is broadcast-able; the
    orders join shuffles on the order key once.  Effect arithmetic runs
    on brand-level totals in DECIMAL(38,0) — exact past the 2^53 float
    cliff that sf1-scale cent*quantity products already cross."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part")
    fact = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.year("o_orderdate").alias("yr"),
            F.round("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    )
    piv = fact.groupBy("p_brand").agg(
        F.sum(F.when(F.col("yr") == 1996, F.col("q")).otherwise(0)).alias("q1"),
        F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0)).alias("rev1"),
        F.sum(F.when(F.col("yr") == 1997, F.col("q")).otherwise(0)).alias("q2"),
        F.sum(F.when(F.col("yr") == 1997, F.col("cents")).otherwise(0)).alias("rev2"),
    )
    eff = piv.where((F.col("q1") > 0) & (F.col("q2") > 0)).select(
        "p_brand",
        "q1",
        "rev1",
        "q2",
        "rev2",
        (F.col("rev2") - F.col("rev1")).alias("delta_cents"),
        (
            F.col("rev2")
            - F.expr(
                "CAST(CAST(q2 AS DECIMAL(38,0)) * CAST(rev1 AS DECIMAL(38,0)) "
                "div q1 AS BIGINT)"
            )
        ).alias("price_effect_cents"),
        F.expr(
            "CAST(CAST(q2 - q1 AS DECIMAL(38,0)) * CAST(rev1 AS DECIMAL(38,0)) "
            "div q1 AS BIGINT)"
        ).alias("volume_effect_cents"),
    )
    return eff.select(
        "*",
        (
            F.col("delta_cents")
            - F.col("price_effect_cents")
            - F.col("volume_effect_cents")
        ).alias("residual_cents"),
    ).orderBy("p_brand")


def _holt_coeffs(alpha: float = 0.5, beta: float = 0.3, k: int = 20):
    """Impulse-response coefficients of Holt's linear method, truncated
    at K lags: s_T = (l_T, b_T) = sum_k M^k (alpha, alpha*beta) x_{T-k}
    with M = [[1-a, 1-a], [-a*b, 1-a*b]].  Returned as e12-scaled
    INTEGER literals so both engines sum exact BIGINTs — a 20-term
    float dot product is order-dependent across engines; an integer one
    is not.  The K-truncation (dropping the initial-condition tail,
    |eigen(M)| < 1) is part of the operator's definition, identical on
    both sides by construction."""
    lu, lv = [], []
    u, v = alpha, alpha * beta
    for _ in range(k):
        lu.append(round(u * 1_000_000_000_000))
        lv.append(round(v * 1_000_000_000_000))
        u, v = (1 - alpha) * u + (1 - alpha) * v, -alpha * beta * u + (1 - alpha * beta) * v
    return lu, lv


_HOLT_LU, _HOLT_LV = _holt_coeffs()


def _holt_oracle() -> str:
    coeff_rows = ", ".join(
        f"({k}, {lu}, {lv})" for k, (lu, lv) in enumerate(zip(_HOLT_LU, _HOLT_LV))
    )
    return f"""
    WITH days AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY di
    ), anchored AS (
        SELECT di, x, MAX(di) OVER () AS maxdi FROM days
    ), coeffs(k, lu_e12, lv_e12) AS (
        VALUES {coeff_rows}
    ), state AS (
        SELECT SUM(c.lu_e12 * a.x) AS l_e12, SUM(c.lv_e12 * a.x) AS b_e12
        FROM anchored a JOIN coeffs c ON a.maxdi - a.di = c.k
    ), horizons AS (
        SELECT CAST(h AS BIGINT) AS horizon FROM UNNEST([1,2,3,4,5,6,7]) AS t(h)
    )
    SELECT h.horizon,
           ROUND(CAST(s.l_e12 AS DOUBLE) / 1e12, 6) AS level_now,
           ROUND(CAST(s.b_e12 AS DOUBLE) / 1e12, 6) AS trend_now,
           ROUND(CAST(s.l_e12 + h.horizon * s.b_e12 AS DOUBLE) / 1e12, 6)
               AS forecast
    FROM horizons h, state s
    ORDER BY h.horizon
    """


@register("events_holt_forecast", oracle=_holt_oracle())
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing forecast of the daily event
    count, horizons 1..7: level + trend state as a truncated linear
    filter of the last 20 daily counts (coefficients precomputed from
    the (alpha=0.5, beta=0.3) recursion's impulse response), forecast =
    level + h*trend.

    Scale notes: the corpus collapses to the calendar-sized daily
    rollup in ONE hash aggregate; the filter is a 20-row coefficient
    join + sum on that rollup (allowlisted single-partition exchanges
    only on calendar-sized frames).  All dot products are e12-scaled
    BIGINT sums — exact in any accumulation order — with ONE final
    division per output; a float coefficient sum would be
    order-dependent across engines."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("di")
        )
        .groupBy("di")
        .agg(F.count("*").alias("x"))
    )
    anchored = days.withColumn("maxdi", F.max("di").over(Window.partitionBy()))
    coeffs = spark.createDataFrame(
        [(k, lu, lv) for k, (lu, lv) in enumerate(zip(_HOLT_LU, _HOLT_LV))],
        "k long, lu_e12 long, lv_e12 long",
    )
    state = (
        anchored.join(F.broadcast(coeffs), anchored.maxdi - anchored.di == coeffs.k)
        .agg(
            F.sum(F.col("lu_e12") * F.col("x")).alias("l_e12"),
            F.sum(F.col("lv_e12") * F.col("x")).alias("b_e12"),
        )
    )
    horizons = spark.range(1, 8).select(F.col("id").alias("horizon"))
    return (
        horizons.join(F.broadcast(state))
        .select(
            "horizon",
            F.round(F.col("l_e12").cast("double") / 1e12, 6).alias("level_now"),
            F.round(F.col("b_e12").cast("double") / 1e12, 6).alias("trend_now"),
            F.round(
                (F.col("l_e12") + F.col("horizon") * F.col("b_e12")).cast("double")
                / 1e12,
                6,
            ).alias("forecast"),
        )
        .orderBy("horizon")
    )


@register(
    "agg_theilsen_trend",
    # Theil-Sen estimator: median of all pairwise slopes of (day,
    # daily-revenue-cents).  Slopes are IEEE divisions of identical
    # integers; the median (exact interpolated, = Spark `percentile`)
    # selects/averages over the identical multiset — deterministic.
    # The pair generation is an inequality self-join ON THE CALENDAR
    # ROLLUP (~30 rows -> ~435 pairs), never on the corpus.
    oracle="""
    WITH days AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS di,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-03-01'
        GROUP BY di
    ), pairs AS (
        SELECT CAST(b.cents - a.cents AS DOUBLE)
               / CAST(b.di - a.di AS DOUBLE) AS slope
        FROM days a JOIN days b ON b.di > a.di
    )
    SELECT CAST((SELECT COUNT(*) FROM days) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 6) AS sen_slope
    FROM pairs
    """,
)
def agg_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily order revenue (Jan-Feb 1997):
    the median of all pairwise slopes — up to ~29% of outlier days
    cannot move it, unlike the OLS fit `q6_forecast_revenue` applies.

    Scale notes: the O(n^2) pair generation is the textbook objection,
    and the answer is that n is the CALENDAR, not the corpus: the fact
    table collapses to <=59 daily rows in one hash aggregate and the
    ~1.7k pairs live on that rollup (allowlisted bounded-domain BNL,
    same class as the HLL pair grid).  Day revenues are exact integer
    cents; each slope is one IEEE division; the median is the exact
    interpolated percentile both engines implement identically."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-03-01")
    )
    days = (
        o.select(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("di"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("di")
        .agg(F.sum("c").alias("cents"))
    )
    a = days.select(F.col("di").alias("di_a"), F.col("cents").alias("c_a"))
    b = days.select(F.col("di").alias("di_b"), F.col("cents").alias("c_b"))
    pairs = a.join(F.broadcast(b), F.col("di_b") > F.col("di_a")).select(
        (
            (F.col("c_b") - F.col("c_a")).cast("double")
            / (F.col("di_b") - F.col("di_a")).cast("double")
        ).alias("slope")
    )
    n_days = days.agg(F.count("*").cast("long").alias("n_days"))
    return (
        pairs.agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.percentile("slope", 0.5), 6).alias("sen_slope"),
        )
        .join(F.broadcast(n_days))
        .select("n_days", "n_pairs", "sen_slope")
    )


@register(
    "orders_hazard_table",
    # Discrete-time hazard: tenure in integer months (year*12 + month
    # arithmetic — no float date math), d_m = customers whose lifetime
    # is exactly m, n_m = suffix sum (at risk), hazard = d/n as ONE
    # integer division per row.  No cumulative survival product — a
    # float product/exp-ln chain would be engine-divergent; the hazard
    # table IS the estimator's sufficient statistic.
    oracle="""
    WITH life AS (
        SELECT o_custkey,
               CAST(MAX(year(o_orderdate)*12 + month(o_orderdate))
                    - MIN(year(o_orderdate)*12 + month(o_orderdate))
                    AS BIGINT) AS lifetime_m
        FROM orders GROUP BY o_custkey
    ), counts AS (
        SELECT lifetime_m, CAST(COUNT(*) AS BIGINT) AS d
        FROM life GROUP BY lifetime_m
    ), hazard AS (
        SELECT lifetime_m AS tenure_m, d,
               SUM(d) OVER (ORDER BY lifetime_m DESC
                            ROWS UNBOUNDED PRECEDING) AS n_at_risk
        FROM counts
    )
    SELECT tenure_m, d, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           ROUND(CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 6) AS hazard
    FROM hazard
    ORDER BY tenure_m
    """,
)
def orders_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard by customer tenure month: of the
    customers who survived to month m, what fraction churned exactly
    there (last order m months after their first).  The life-table
    view of retention that cohort_retention's calendar matrix cannot
    give directly.

    Scale notes: the corpus collapses to one row per customer (hash
    agg on the natural o_custkey partitioning), then to the
    <=|months| lifetime rollup; the suffix-sum window runs on that
    rollup (allowlisted single-partition exchange, months-bounded).
    Integer month arithmetic and one division per output row — no
    cumulative float survival product (deliberately: that chain is
    accumulation-order-dependent across engines)."""
    o = load_table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    life = o.groupBy("o_custkey").agg(
        (F.max(ym) - F.min(ym)).cast("long").alias("lifetime_m")
    )
    counts = life.groupBy("lifetime_m").agg(F.count("*").cast("long").alias("d"))
    w = (
        Window.orderBy(F.col("lifetime_m").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hazard = counts.select(
        F.col("lifetime_m").alias("tenure_m"),
        "d",
        F.sum("d").over(w).cast("long").alias("n_at_risk"),
    )
    return hazard.select(
        "tenure_m",
        "d",
        "n_at_risk",
        F.round(F.col("d").cast("double") / F.col("n_at_risk").cast("double"), 6).alias(
            "hazard"
        ),
    ).orderBy("tenure_m")


@register(
    "events_stl_decompose",
    # STL-lite additive decomposition in 7x-scaled integers: trend_x7 =
    # centered 7-day sum (only full windows emit), detrended_x7 =
    # 7*x - trend_x7 (exact BIGINT), per-weekday seasonal = ONE rounded
    # division of integer sums, residual = integer minus that rounded
    # double (deterministic once the seasonal is).
    oracle="""
    WITH days AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY di
    ), windowed AS (
        SELECT di, x,
               SUM(x) OVER w AS trend_x7,
               COUNT(*) OVER w AS w_n
        FROM days
        WINDOW w AS (ORDER BY di ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), full_days AS (
        SELECT di, x, CAST(trend_x7 AS BIGINT) AS trend_x7,
               7*x - trend_x7 AS detrended_x7, di % 7 AS dow
        FROM windowed WHERE w_n = 7
    ), seasonal AS (
        SELECT dow,
               ROUND(CAST(SUM(detrended_x7) AS DOUBLE) / COUNT(*), 4)
                   AS seasonal_x7
        FROM full_days GROUP BY dow
    )
    SELECT f.di, f.x, f.trend_x7, CAST(f.dow AS BIGINT) AS dow,
           s.seasonal_x7,
           ROUND(f.detrended_x7 - s.seasonal_x7, 4) AS resid_x7
    FROM full_days f JOIN seasonal s ON f.dow = s.dow
    ORDER BY f.di
    """,
)
def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style additive decomposition of the daily event series:
    trend (centered 7-day moving sum), weekday seasonal (mean of the
    detrended values per day-of-week), residual — the
    trend/seasonality/noise split behind anomaly baselining, here with
    every component either an exact integer (scaled by 7 to avoid the
    /7 fraction) or one rounded division.

    Scale notes: the corpus collapses to the calendar-sized daily
    rollup in one hash aggregate; the centered window, the 7-row
    seasonal rollup and the final join all run on calendar-bounded
    frames (allowlisted single-partition exchanges).  Edge days without
    a full 7-day window are excluded rather than padded — a partial
    window would make the trend a different estimator at the margins on
    the two engines."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("di")
        )
        .groupBy("di")
        .agg(F.count("*").alias("x"))
    )
    w = Window.orderBy("di").rowsBetween(-3, 3)
    full_days = (
        days.select(
            "di",
            "x",
            F.sum("x").over(w).alias("trend_x7"),
            F.count("*").over(w).alias("w_n"),
        )
        .where(F.col("w_n") == 7)
        .select(
            "di",
            "x",
            F.col("trend_x7").cast("long").alias("trend_x7"),
            (7 * F.col("x") - F.col("trend_x7")).alias("detrended_x7"),
            (F.col("di") % 7).alias("dow"),
        )
    )
    seasonal = full_days.groupBy("dow").agg(
        F.round(
            F.sum("detrended_x7").cast("double") / F.count("*"), 4
        ).alias("seasonal_x7")
    )
    return (
        full_days.join(F.broadcast(seasonal), "dow")
        .select(
            "di",
            "x",
            "trend_x7",
            F.col("dow").cast("long").alias("dow"),
            "seasonal_x7",
            F.round(F.col("detrended_x7") - F.col("seasonal_x7"), 4).alias(
                "resid_x7"
            ),
        )
        .orderBy("di")
    )


@register(
    "events_user_lifecycle",
    # Growth-accounting states on the user x week grid: new (first
    # active week), retained (active now and last week), resurrected
    # (active now, inactive last week, active before), churned
    # (inactive now, active last week).  'Active' = >= 2 purchases that
    # week — the raw any-event definition was vacuous (every user
    # active every week, so churned/resurrected never occurred;
    # audited at sf0.001 and sf0.01 — the purchase>=2 rate is ~72% at
    # both, leaving real gaps).  The grid is users x |weeks| — a
    # bounded calendar multiplier, generated by a broadcast cross
    # join, with lag windows per user.  All-integer state logic.
    oracle="""
    WITH active AS (
        SELECT user_id,
               CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS BIGINT)
                   AS wk
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, wk
        HAVING COUNT(*) >= 2
    ), weeks AS (
        SELECT DISTINCT wk FROM active
    ), users AS (
        SELECT DISTINCT user_id FROM active
    ), grid AS (
        SELECT u.user_id, w.wk,
               CASE WHEN a.user_id IS NOT NULL THEN 1 ELSE 0 END AS act
        FROM users u CROSS JOIN weeks w
        LEFT JOIN active a ON a.user_id = u.user_id AND a.wk = w.wk
    ), lagged AS (
        SELECT user_id, wk, act,
               LAG(act) OVER (PARTITION BY user_id ORDER BY wk) AS prev_act,
               SUM(act) OVER (PARTITION BY user_id ORDER BY wk
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prior_weeks
    FROM grid
    ), states AS (
        SELECT wk,
               CASE WHEN act = 1 AND COALESCE(prior_weeks, 0) = 0 THEN 'new'
                    WHEN act = 1 AND prev_act = 1 THEN 'retained'
                    WHEN act = 1 THEN 'resurrected'
                    WHEN act = 0 AND prev_act = 1 THEN 'churned'
                    ELSE 'inactive' END AS state
        FROM lagged
    )
    SELECT wk, state, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM states
    WHERE state <> 'inactive'
    GROUP BY wk, state
    ORDER BY wk, state
    """,
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every user is NEW in their first
    active week, RETAINED when active in consecutive weeks, RESURRECTED
    when returning after a gap, CHURNED the week after going quiet —
    the new/retained/resurrected/churned ledger product teams reconcile
    DAU/MAU against.

    Scale notes: activity collapses to the distinct user-week frame
    first (one hash aggregate); the dense grid is that frame crossed
    with the |weeks|-row calendar (a broadcast of weeks — a bounded
    calendar multiplier, NOT a corpus cross join), and the state logic
    is two lag-family windows per user partition.  Counting only
    emitted states keeps the output |weeks| x 4."""
    e = load_table(spark, sf_dir, "events")
    active = (
        e.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7 AS LONG)"
            ).alias("wk"),
        )
        .groupBy("user_id", "wk")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= 2)
        .select("user_id", "wk")
    )
    weeks = active.select("wk").distinct()
    users = active.select("user_id").distinct()
    grid = (
        users.join(F.broadcast(weeks))
        .join(
            active.withColumn("act1", F.lit(1)),
            ["user_id", "wk"],
            "left",
        )
        .select("user_id", "wk", F.coalesce("act1", F.lit(0)).alias("act"))
    )
    wlag = Window.partitionBy("user_id").orderBy("wk")
    wprior = wlag.rowsBetween(Window.unboundedPreceding, -1)
    lagged = grid.select(
        "user_id",
        "wk",
        "act",
        F.lag("act").over(wlag).alias("prev_act"),
        F.sum("act").over(wprior).alias("prior_weeks"),
    )
    states = lagged.select(
        "wk",
        F.when(
            (F.col("act") == 1) & (F.coalesce(F.col("prior_weeks"), F.lit(0)) == 0),
            "new",
        )
        .when((F.col("act") == 1) & (F.col("prev_act") == 1), "retained")
        .when(F.col("act") == 1, "resurrected")
        .when((F.col("act") == 0) & (F.col("prev_act") == 1), "churned")
        .otherwise("inactive")
        .alias("state"),
    )
    return (
        states.where(F.col("state") != "inactive")
        .groupBy("wk", "state")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("wk", "state")
    )


@register(
    "events_bot_score",
    # Rule-based bot scoring: burstiness (max events in any 10-minute
    # slot), night share (integer ppm), type entropy (ROUND 4, the
    # text_entropy log discipline).  The score is integer rule points
    # over those deterministic values, the verdict a threshold CASE —
    # nothing fuzzy decides a row.  Thresholds (burst >= 2, night >
    # 0.3, entropy < 1.58) sit INSIDE the fixture distributions so
    # every rule fires in both directions at sf0.001 and sf0.01
    # (audited: burst 7/15 & 55/150, night 2/15 & 17/150, entropy
    # straddles its 1.545-1.607 range) — a threshold outside the data
    # is a dead rule the oracle can't catch.
    oracle="""
    WITH slots AS (
        SELECT user_id, epoch_us(ts) // 600000000 AS slot, COUNT(*) AS c
        FROM events GROUP BY user_id, slot
    ), burst AS (
        SELECT user_id, CAST(MAX(c) AS BIGINT) AS max_burst FROM slots
        GROUP BY user_id
    ), base AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS night_ppm
        FROM events GROUP BY user_id
    ), types AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ), ent AS (
        SELECT user_id,
               ROUND(ln(CAST(SUM(c) AS DOUBLE))
                     - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 4)
                   AS type_entropy
        FROM types GROUP BY user_id
    ), scored AS (
        SELECT b.user_id, base.n_events, b.max_burst, base.night_ppm,
               ent.type_entropy,
               CAST((CASE WHEN b.max_burst >= 2 THEN 2 ELSE 0 END)
                    + (CASE WHEN base.night_ppm > 300000 THEN 1 ELSE 0 END)
                    + (CASE WHEN ent.type_entropy < 1.58 THEN 1 ELSE 0 END)
                    AS BIGINT) AS score
        FROM burst b
        JOIN base ON b.user_id = base.user_id
        JOIN ent ON b.user_id = ent.user_id
    )
    SELECT user_id, n_events, max_burst, night_ppm, type_entropy, score,
           CASE WHEN score >= 3 THEN 'likely_bot'
                WHEN score >= 1 THEN 'suspect'
                ELSE 'human' END AS verdict
    FROM scored
    ORDER BY user_id
    """,
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot/abuse scoring per user: burstiness (max events in
    any 10-minute slot), night-time share, and event-type entropy
    combine into integer rule points and a threshold verdict — the
    deterministic first-pass filter that runs BEFORE any learned abuse
    model sees the data.

    Scale notes: three user-keyed aggregates (slot counts reuse the
    (user, slot) partial aggregation; night share is a conditional agg
    inside the base pass) joined on the user key — all frames are
    user-dim sized, shuffled once on user_id.  Thresholds compare
    integers or the 4-decimal entropy BOTH engines computed identically
    — no raw-float boundary decides a verdict."""
    e = load_table(spark, sf_dir, "events")
    sec = epoch_seconds("ts")
    slots = (
        e.select("user_id", sec.alias("s"))
        .select("user_id", F.expr("s div 600").alias("slot"))
        .groupBy("user_id", "slot")
        .agg(F.count("*").alias("c"))
    )
    burst = slots.groupBy("user_id").agg(F.max("c").cast("long").alias("max_burst"))
    base = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr(
            "CAST(SUM(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) * 1000000 "
            "div COUNT(*) AS LONG)"
        ).alias("night_ppm"),
    )
    types = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    ent = types.groupBy("user_id").agg(
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / F.sum("c"),
            4,
        ).alias("type_entropy")
    )
    scored = (
        burst.join(base, "user_id")
        .join(ent, "user_id")
        .select(
            "user_id",
            "n_events",
            "max_burst",
            "night_ppm",
            "type_entropy",
            (
                F.when(F.col("max_burst") >= 2, 2).otherwise(0)
                + F.when(F.col("night_ppm") > 300000, 1).otherwise(0)
                + F.when(F.col("type_entropy") < 1.58, 1).otherwise(0)
            )
            .cast("long")
            .alias("score"),
        )
    )
    return scored.select(
        "*",
        F.when(F.col("score") >= 3, "likely_bot")
        .when(F.col("score") >= 1, "suspect")
        .otherwise("human")
        .alias("verdict"),
    ).orderBy("user_id")


@register(
    "agg_weighted_median",
    # Exact lower weighted median: sort by value, take the first row
    # where 2*cumulative_weight >= total_weight.  Weights are integer
    # quantities, values integer cents, the defining comparison is
    # integer — no percentile interpolation, no float boundary.
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
               l_orderkey, l_linenumber
        FROM lineitem
    ), ranked AS (
        SELECT l_returnflag, cents, q,
               SUM(q) OVER (PARTITION BY l_returnflag
                            ORDER BY cents, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(q) OVER (PARTITION BY l_returnflag) AS total
        FROM w
    )
    SELECT l_returnflag,
           CAST(ANY_VALUE(total) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2*cum >= total THEN cents END) AS BIGINT)
               AS weighted_median_cents
    FROM ranked
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per return flag — the
    robust "typical traded price" that ``agg_percentile``'s unweighted
    interpolation cannot give (a 1-unit luxury line counts the same as
    a 50-unit staple there).

    Scale notes: one shuffle on the flag key; the rank/cumsum windows
    are flag-partitioned.  Three giant groups means three fat window
    tasks at 100 TB — the documented giant-group remedy is the
    two-pass range-partitioned rank (``common.global_row_number``)
    within each flag, exactly as ``agg_trimmed_winsorized`` notes.
    The median row is picked by an integer 2*cum >= total comparison
    with a total (cents, orderkey, linenumber) order — deterministic
    in both engines, no interpolation."""
    l = load_table(spark, sf_dir, "lineitem")
    w = l.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round("l_quantity").cast("long").alias("q"),
        "l_orderkey",
        "l_linenumber",
    )
    wp = Window.partitionBy("l_returnflag")
    ranked = w.select(
        "l_returnflag",
        "cents",
        "q",
        F.sum("q")
        .over(
            wp.orderBy("cents", "l_orderkey", "l_linenumber").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
        F.sum("q").over(wp).alias("total"),
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.any_value("total").cast("long").alias("total_weight"),
            F.min(
                F.when(2 * F.col("cum") >= F.col("total"), F.col("cents"))
            )
            .cast("long")
            .alias("weighted_median_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "orders_ontime_ship_rate",
    # On-time = the order's LAST line shipped within 30 days of the
    # order date.  Month keys and day differences are integer date
    # arithmetic; the rate is integer ppm via `div`.
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey,
               CAST(strftime(o.o_orderdate, '%Y-%m') AS VARCHAR) AS order_month,
               CASE WHEN MAX(CAST(l.l_shipdate AS DATE))
                         <= CAST(o.o_orderdate AS DATE) + 30
                    THEN 1 ELSE 0 END AS ontime
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    )
    SELECT order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(ontime) AS BIGINT) AS n_ontime,
           CAST(SUM(ontime) * 1000000 // COUNT(*) AS BIGINT) AS ontime_ppm
    FROM per_order
    GROUP BY order_month
    ORDER BY order_month
    """,
)
def orders_ontime_ship_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly on-time shipping rate: the share of orders whose LAST
    lineitem shipped within 30 days of the order date — the OTIF-style
    fulfillment KPI (the fixtures carry no committed-quantity column,
    so the in-full leg is the all-lines-shipped tautology and the
    operator reports the on-time leg).

    Scale notes: the per-order MAX collapses the fact table on its
    natural orderkey partitioning (one shuffle shared with the join),
    then the month rollup is calendar-sized.  All comparisons are
    integer date arithmetic; the rate is ppm via `div`."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    per_order = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.when(
                F.max(F.col("l_shipdate").cast("date"))
                <= F.date_add(F.col("o_orderdate").cast("date"), 30),
                1,
            )
            .otherwise(0)
            .alias("ontime")
        )
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "ontime",
        )
    )
    return (
        per_order.groupBy("order_month")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("ontime").cast("long").alias("n_ontime"),
            F.expr("SUM(ontime) * 1000000 div COUNT(*)").alias("ontime_ppm"),
        )
        .orderBy("order_month")
    )


@register(
    "supplier_hhi_concentration",
    # Herfindahl-Hirschman concentration of supplier quantity share per
    # brand, in scale-independent integer arithmetic: per-supplier
    # share in ppm first (bounded 1e6 regardless of corpus size), then
    # HHI = sum(share_ppm^2) div 1e6 — never a q^2 product that crosses
    # BIGINT at large scale.
    oracle="""
    WITH per_supp AS (
        SELECT p.p_brand, l.l_suppkey,
               CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_suppkey
    ), shares AS (
        SELECT p_brand, l_suppkey,
               q * 1000000 // SUM(q) OVER (PARTITION BY p_brand) AS share_ppm
        FROM per_supp
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
           CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm
    FROM shares
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def supplier_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per brand — the Herfindahl-Hirschman
    index of quantity share (10000+ HHI-ppm ~ a monopolized brand,
    ~1/n for even splits) plus the top-supplier share: the
    supply-chain-risk readout behind single-source alerts.

    Scale notes: one fact-side hash aggregate to (brand, supplier),
    share windows partitioned by brand on that rollup; shares are
    floored ppm integers FIRST so the squared term is bounded by 1e12
    regardless of corpus size (a raw q^2 formulation crosses BIGINT at
    ~sf10 — same 2^53/overflow discipline as revenue_bridge_yoy)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    per_supp = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
    )
    shares = per_supp.select(
        "p_brand",
        "l_suppkey",
        F.expr(
            "q * 1000000 div SUM(q) OVER (PARTITION BY p_brand)"
        ).alias("share_ppm"),
    )
    return (
        shares.groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.expr("SUM(share_ppm * share_ppm) div 1000000").alias("hhi_ppm"),
            F.max("share_ppm").cast("long").alias("top_share_ppm"),
        )
        .orderBy("p_brand")
    )


@register(
    "lineitem_gmv_waterfall",
    # TPC-H Q1-grade decimal discipline applied to the finance
    # waterfall: gross -> discount -> net -> tax -> charged, every rung
    # an exact DECIMAL product/sum (ext DECIMAL(14,2) x disc/tax
    # DECIMAL(4,2) stays exact; both engines' decimal multiplication is
    # integer arithmetic), rounded to cents only at the output.
    oracle="""
    SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))), 2)
                AS DOUBLE) AS gross,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * CAST(l.l_discount AS DECIMAL(4,2))), 2)
                AS DOUBLE) AS discount_amt,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS net,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                          * CAST(l.l_tax AS DECIMAL(4,2))), 2)
                AS DOUBLE) AS tax_amt,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                          * (1 + CAST(l.l_tax AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS charged
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY order_month
    ORDER BY order_month
    """,
)
def lineitem_gmv_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue waterfall: gross book value, discount given, net
    revenue, tax collected, total charged — the finance bridge from
    list price to cash, with the exact-decimal arithmetic Q1 demands
    (a double formulation drifts in the last cent across partial-
    aggregation orders; DECIMAL products/sums are exact in both
    engines in ANY order).

    Scale notes: one fact join on the order key (shared with the
    month derivation), one hash aggregate to the calendar-month
    rollup; all five measures are partial-aggregable decimal sums in
    a single pass — no second scan per rung of the waterfall."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ext = F.col("l_extendedprice").cast("decimal(14,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            ext.alias("ext"),
            (ext * disc).alias("disc_amt"),
            (ext * (F.lit(1) - disc)).alias("net_amt"),
            (ext * (F.lit(1) - disc) * tax).alias("tax_amt"),
            (ext * (F.lit(1) - disc) * (F.lit(1) + tax)).alias("charged_amt"),
        )
        .groupBy("order_month")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(F.sum("ext"), 2).cast("double").alias("gross"),
            F.round(F.sum("disc_amt"), 2).cast("double").alias("discount_amt"),
            F.round(F.sum("net_amt"), 2).cast("double").alias("net"),
            F.round(F.sum("tax_amt"), 2).cast("double").alias("tax_amt"),
            F.round(F.sum("charged_amt"), 2).cast("double").alias("charged"),
        )
        .orderBy("order_month")
    )


@register(
    "events_new_users_daily",
    # Activation accounting without count-distinct windows: each user
    # collapses to their FIRST-PURCHASE day (min aggregate — mergeable,
    # scale-safe), activation counts are a calendar rollup, and the
    # cumulative curve is a window over that rollup.  First-ANY-event
    # was the original definition and was near-vacuous on the fixtures
    # (every user active within the first 2 days -> a 2-point curve);
    # first purchase spreads activations across ~11 days at sf0.01.
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
    ), daily AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_users
    FROM daily
    ORDER BY day
    """,
)
def events_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user ACTIVATION (first purchase) and the cumulative
    activated-user curve — the growth chart every dashboard opens
    with, computed the scale-safe way: first-purchase day is a MIN
    aggregate per user (mergeable, partial-aggregable — never a
    count-distinct window over history).

    Scale notes: one hash aggregate user->first_day (on the natural
    user partitioning), one calendar rollup, and the cumsum window
    runs on that |days|-row rollup (allowlisted single-partition
    exchange).  This is the same first-seen collapse
    `corpus_heaps_curve` applies to vocabulary growth."""
    e = load_table(spark, sf_dir, "events")
    first_seen = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("day"))
    )
    daily = first_seen.groupBy("day").agg(
        F.count("*").cast("long").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("day")


@register(
    "orders_rfm_migration",
    # Segment-migration matrix between two halves of the order history:
    # per customer per period an integer order count -> a CASE tier,
    # FULL OUTER join of the periods (absent = 'none'), matrix counts.
    # Everything integer; the tier thresholds sit inside the fixture
    # distribution (counts 1 / 2-4 / 5+ all occur in both halves).
    oracle="""
    WITH a AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-07-01' GROUP BY o_custkey
    ), b AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-07-01' GROUP BY o_custkey
    ), tiers AS (
        SELECT COALESCE(a.o_custkey, b.o_custkey) AS cust,
               CASE WHEN a.n IS NULL THEN 'none'
                    WHEN a.n >= 5 THEN 'high'
                    WHEN a.n >= 2 THEN 'mid' ELSE 'low' END AS tier_a,
               CASE WHEN b.n IS NULL THEN 'none'
                    WHEN b.n >= 5 THEN 'high'
                    WHEN b.n >= 2 THEN 'mid' ELSE 'low' END AS tier_b
        FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
    )
    SELECT tier_a, tier_b, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM tiers
    GROUP BY tier_a, tier_b
    ORDER BY tier_a, tier_b
    """,
)
def orders_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-tier migration matrix between the first and second
    half of the order history: which customers moved low->high,
    went quiet ('none'), or appeared new — the CRM transition readout
    that a point-in-time `orders_rfm_segments` cannot show.

    Scale notes: two period-filtered aggregates over the same scan
    family (Catalyst plans each with the pushed date filter), a FULL
    OUTER join on the customer key (customer-dim sized), and a 16-cell
    matrix rollup.  All tier logic is integer CASE — no percentile
    boundaries to diverge on."""
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.where(F.col("o_orderdate") < "1998-07-01")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_a"))
    )
    b = (
        o.where(F.col("o_orderdate") >= "1998-07-01")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_b"))
        .withColumnRenamed("o_custkey", "custkey_b")
    )

    def tier(col):
        return (
            F.when(F.col(col).isNull(), "none")
            .when(F.col(col) >= 5, "high")
            .when(F.col(col) >= 2, "mid")
            .otherwise("low")
        )

    tiers = a.join(b, a.o_custkey == b.custkey_b, "full").select(
        tier("n_a").alias("tier_a"), tier("n_b").alias("tier_b")
    )
    return (
        tiers.groupBy("tier_a", "tier_b")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("tier_a", "tier_b")
    )


@register(
    "orders_ship_delay_histogram",
    # Order-to-ship latency distribution in whole-week buckets: the
    # delay is integer date arithmetic, the bucket id integer `div`,
    # the share ppm integer division — the fulfillment-latency SLA
    # readout as one join + one domain-bounded aggregate.
    oracle="""
    WITH delays AS (
        SELECT CAST(CAST(l.l_shipdate AS DATE)
                    - CAST(o.o_orderdate AS DATE) AS BIGINT) // 7
                   AS delay_weeks
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT delay_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER () AS BIGINT)
               AS share_ppm
    FROM delays
    GROUP BY delay_weeks
    ORDER BY delay_weeks
    """,
)
def orders_ship_delay_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship delay distribution in whole weeks — the
    fulfillment-latency histogram behind SLA targets, sibling of
    `orders_ontime_ship_rate` (that op asks "within 30 days?"; this one
    shows the whole shape).

    Scale notes: one fact join on the order key, one hash aggregate to
    the domain-bounded week buckets; the share window runs on that
    bucket rollup (allowlisted single-partition exchange of a
    domain-bounded frame).  Delay and bucket are integer date
    arithmetic and `div` — no float ever decides a bucket."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delays = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.expr(
                "CAST(datediff(CAST(l_shipdate AS DATE), "
                "CAST(o_orderdate AS DATE)) AS LONG) div 7"
            ).alias("delay_weeks")
        )
    )
    counts = delays.groupBy("delay_weeks").agg(
        F.count("*").cast("long").alias("n_lines")
    )
    w_all = Window.partitionBy()
    return counts.select(
        "delay_weeks",
        "n_lines",
        F.expr("n_lines * 1000000").alias("_num"),
        F.sum("n_lines").over(w_all).alias("_tot"),
    ).select(
        "delay_weeks",
        "n_lines",
        F.expr("_num div _tot").alias("share_ppm"),
    ).orderBy("delay_weeks")


#: Cross-correlation lag range: ±7 days covers a weekly cycle.
_XCORR_MAX_LAG = 7
_XCORR_A = "click"
_XCORR_B = "purchase"


@register(
    "events_cross_correlation",
    # Lagged Pearson cross-correlation between the daily click and
    # purchase count series on the zero-filled spine: for each lag in
    # -7..7 the overlap window shifts, so all six sufficient sums are
    # per-lag integers; r(lag) is a fixed IEEE tree (two int64->double
    # casts, one sqrt, one division) over identical integers.
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ), spine AS (
        SELECT lo + CAST(i AS INTEGER) AS day
        FROM bounds, range(0, 10000) t(i)
        WHERE lo + CAST(i AS INTEGER) <= hi
    ), counts AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) FILTER (event_type = '{_XCORR_A}') AS a,
               COUNT(*) FILTER (event_type = '{_XCORR_B}') AS b
        FROM events GROUP BY 1
    ), series AS (
        SELECT s.day, COALESCE(c.a, 0) AS a, COALESCE(c.b, 0) AS b
        FROM spine s LEFT JOIN counts c ON s.day = c.day
    ), lags AS (
        SELECT CAST(i AS INTEGER) AS lag
        FROM range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG} + 1) t(i)
    ), pairs AS (
        SELECT l.lag, s1.a AS a, s2.b AS b
        FROM lags l
        JOIN series s1 ON TRUE
        JOIN series s2 ON s2.day = s1.day + l.lag
    ), sums AS (
        SELECT lag, COUNT(*) AS n, SUM(a) AS sa, SUM(b) AS sb,
               SUM(a * b) AS sab, SUM(a * a) AS saa, SUM(b * b) AS sbb
        FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_days,
           CAST(sab AS BIGINT) AS sum_ab,
           CAST(ROUND(1000000.0 * CAST(n * sab - sa * sb AS DOUBLE)
                 / SQRT(CAST((n * saa - sa * sa)
                             * (n * sbb - sb * sb) AS DOUBLE)))
                AS BIGINT) AS r_ppm
    FROM sums ORDER BY lag
    """,
)
def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the daily click and purchase
    series — "do clicks lead purchases, and by how many days?": for
    every lag in ±7, Pearson r over the overlapping days of the
    zero-filled daily spine, reported in ppm from per-lag exact integer
    sufficient sums (the overlap window genuinely shifts per lag, so
    n, Σa, Σb, Σab, Σa², Σb² are all lag-specific).  Sibling of
    `events_acf` (one series, self-lag) — this is the two-series
    lead/lag detector.

    Scale notes: ONE hash agg from event grain to the calendar-sized
    daily (a, b) rollup; the 15-lag pair frame is a broadcast
    self-join of that rollup shifted by an exploded lag dim (calendar
    × 15 rows at worst, never event-grain); per-lag sums are a 15-row
    aggregate.  Int64 envelope: daily counts ≤ ~10⁶ per day keep
    n·Σab < 2⁶³ through sf1000."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    counts = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.when(F.col("event_type") == _XCORR_A, 1)).alias("a0"),
        F.count(F.when(F.col("event_type") == _XCORR_B, 1)).alias("b0"),
    )
    series = spine.join(counts, "day", "left").select(
        "day",
        F.coalesce("a0", F.lit(0)).alias("a"),
        F.coalesce("b0", F.lit(0)).alias("b"),
    )
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    s1 = series.alias("s1")
    s2 = series.select(
        F.col("day").alias("day2"), F.col("b").alias("b2")
    ).alias("s2")
    pairs = (
        s1.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(s2),
            F.col("day2") == F.date_add(F.col("day"), F.col("lag")),
        )
    )
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b2").alias("sb"),
        F.sum(F.col("a") * F.col("b2")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b2") * F.col("b2")).alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast(
        "double"
    )
    den = F.sqrt(
        (
            (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
            * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
        ).cast("double")
    )
    return sums.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        F.col("sab").cast("long").alias("sum_ab"),
        F.round(F.lit(1000000.0) * num / den).cast("long").alias("r_ppm"),
    ).orderBy("lag")


@register(
    "agg_hdr_histogram",
    # HDR-style log2 latency histogram of per-user interarrival gaps:
    # bucket = floor(log2(gap_s)) computed EXACTLY as the bit length of
    # the integer gap (LENGTH of the binary representation - 1 — no
    # floating log), counts/cumulative/percentile lookups all pure
    # integer arithmetic on the <=32-row bucket rollup.
    oracle="""
    WITH gaps AS (
        SELECT epoch_us(ts) // 1000000
               - LAG(epoch_us(ts) // 1000000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_s
        FROM events
    ), g AS (
        SELECT gap_s FROM gaps WHERE gap_s >= 1
    ), b AS (
        SELECT LENGTH(PRINTF('%b', gap_s)) - 1 AS bucket, COUNT(*) AS cnt
        FROM g GROUP BY 1
    ), c AS (
        SELECT bucket, cnt,
               SUM(cnt) OVER (ORDER BY bucket) AS cum,
               SUM(cnt) OVER () AS n
        FROM b
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS lo_s,
           CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS hi_s,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(cum AS BIGINT) AS cum,
           CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN
                    (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END) OVER ()
                AS BIGINT) AS p50_hi_s,
           CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN
                    (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END) OVER ()
                AS BIGINT) AS p90_hi_s,
           CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN
                    (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END) OVER ()
                AS BIGINT) AS p99_hi_s
    FROM c ORDER BY bucket
    """,
)
def agg_hdr_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram-style latency profile of per-user interarrival
    gaps: power-of-two buckets (the HdrHistogram / Prometheus
    log-bucket scheme) with bucket = floor(log2(gap)) computed as the
    exact BIT LENGTH of the integer gap — `length(bin(x)) - 1`, no
    floating log anywhere — plus cumulative counts and the p50/p90/p99
    bucket upper bounds by integer nearest-rank lookup (smallest bucket
    whose cumulative count reaches ⌈q·n⌉, via cum·100 ≥ q·n — all
    int64).  Complements `agg_histogram` (equi-width) and
    `rollup_tdigest` (approximate): log buckets give constant relative
    error across six orders of magnitude with ≤32 cells of mergeable
    state — the production latency-histogram contract.

    Scale notes: the corpus-sized work is ONE user-keyed lag window
    (same shuffle shape as `interarrival_stats`) and ONE hash agg to
    the ≤32-row bucket rollup; cumulative/percentile windows run on
    that rollup (reviewed SINGLE allowlist row)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (
            epoch_seconds(F.col("ts"))
            - epoch_seconds(F.lag("ts").over(w))
        ).alias("gap_s")
    ).where(F.col("gap_s") >= 1)
    b = gaps.groupBy(
        (F.length(F.bin(F.col("gap_s"))) - 1).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    c = b.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )

    hi_expr = F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1")

    def p_hi(q: int):
        return F.min(
            F.when(F.col("cum") * 100 >= q * F.col("n"), hi_expr)
        ).over(w_all)

    return c.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket)")
        .cast("long")
        .alias("lo_s"),
        hi_expr.cast("long").alias("hi_s"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("cum").cast("long").alias("cum"),
        p_hi(50).cast("long").alias("p50_hi_s"),
        p_hi(90).cast("long").alias("p90_hi_s"),
        p_hi(99).cast("long").alias("p99_hi_s"),
    ).orderBy("bucket")


#: Chain-ladder development horizon: ultimates are forecast to age 8
#: months, so the factor chain is bounded (and codegen-unrolled) at any
#: corpus span.
_CL_K = 8


def _chain_ladder_oracle() -> str:
    """Oracle for orders_chain_ladder — the per-age ultimate CASE chain
    is built by the same Python loop as the Spark side, so factor
    ordering (ascending age, left-associated products) agrees by
    construction and both engines produce bit-identical IEEE doubles."""
    cases = []
    for a in range(_CL_K):
        prod = "CAST(obs AS DOUBLE)"
        for k in range(a, _CL_K):
            prod = f"({prod} * f{k})"
        cases.append(f"WHEN base_age = {a} THEN {prod}")
    ult = f"CASE {' '.join(cases)} ELSE CAST(obs AS DOUBLE) END"
    fcols = ", ".join(
        f"""CAST(SUM(CASE WHEN avail >= {k + 1} THEN c_next{k} END) AS DOUBLE)
            / CAST(SUM(CASE WHEN avail >= {k + 1} THEN c_at{k} END) AS DOUBLE)
            AS f{k}"""
        for k in range(_CL_K)
    )
    ccols = ", ".join(
        f"""MAX(CASE WHEN k = {k} THEN cum END) AS c_at{k},
            MAX(CASE WHEN k = {k + 1} THEN cum END) AS c_next{k}"""
        for k in range(_CL_K)
    )
    return f"""
    WITH ue AS (
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                    + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), u0 AS (
        SELECT o_custkey, MIN(ym) AS c0 FROM ue GROUP BY 1
    ), cut AS (
        SELECT MAX(ym) AS w FROM ue
    ), x AS (
        SELECT u0.c0 AS cohort, ue.ym - u0.c0 AS k,
               SUM(ue.cents) AS cents
        FROM ue JOIN u0 ON ue.o_custkey = u0.o_custkey
        WHERE ue.ym - u0.c0 <= {_CL_K}
        GROUP BY 1, 2
    ), grid AS (
        SELECT c.cohort, CAST(g.k AS BIGINT) AS k,
               cut.w - c.cohort AS avail
        FROM (SELECT DISTINCT cohort FROM x) c
        CROSS JOIN cut
        CROSS JOIN range(0, {_CL_K} + 1) g(k)
        WHERE g.k <= LEAST(cut.w - c.cohort, {_CL_K})
    ), tri AS (
        SELECT g.cohort, g.k, g.avail,
               SUM(COALESCE(x.cents, 0)) OVER (
                   PARTITION BY g.cohort ORDER BY g.k) AS cum
        FROM grid g LEFT JOIN x
          ON g.cohort = x.cohort AND g.k = x.k
    ), piv AS (
        SELECT cohort, MAX(avail) AS avail, {ccols}
        FROM tri GROUP BY 1
    ), f AS (
        SELECT {fcols} FROM piv
    ), basis AS (
        SELECT t.cohort,
               MAX(t.k) AS base_age,
               MAX(t.cum) AS obs
        FROM tri t GROUP BY 1
    )
    SELECT b.cohort AS cohort_month,
           CAST(b.base_age AS BIGINT) AS base_age,
           CAST(b.obs AS BIGINT) AS observed_cum_cents,
           CAST(ROUND({ult}) AS BIGINT) AS ultimate8_cents,
           CAST(ROUND(1000000.0 * CAST(b.obs AS DOUBLE) / ({ult}))
                AS BIGINT) AS completion_ppm
    FROM basis b CROSS JOIN f
    ORDER BY b.cohort
    """


@register("orders_chain_ladder", oracle=_chain_ladder_oracle())
def orders_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development forecast over customer-spend cohorts —
    the actuarial claims-triangle method applied to the product
    question "how much will this acquisition cohort have spent by
    month 8?": cohorts are first-order months, development age is
    months since first order, the cumulative triangle is
    right-censored at the data end (the fixture has 51 cohorts over a
    79-month span — a first draft over events degenerated to ONE
    cohort because every user is active from week one; non-degeneracy
    audit), and the all-cohort volume-weighted development factors
    f_k = ΣC(·,k+1)/ΣC(·,k) (computed only over cohorts whose age k+1
    is fully observed) roll each cohort's latest observed cumulative
    forward to its age-8 ultimate.  Factors are single divisions of
    exact integer sums; each ultimate is a codegen-unrolled
    left-associated product (ascending age) shared with the oracle, so
    the whole forecast is bit-deterministic.  Extends `cohort_ltv`
    (observed curves) with the censoring-aware FORECAST step.

    Scale notes: corpus-sized work is one first-order customer
    aggregate and one (cohort, age) aggregate (both keyed hash aggs);
    the triangle is ≤ |months|×9 rows, and the zero-filled grid,
    cumulative windows, factor pivot, and the 1-row factor frame
    broadcast all live on that rollup (reviewed SINGLE/NLJ rows)."""
    e = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year(F.col("o_orderdate")) * 12 + F.month(F.col("o_orderdate"))
        ).cast("long").alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    u0 = e.groupBy("o_custkey").agg(F.min("ym").alias("c0"))
    cut = e.agg(F.max("ym").alias("w"))
    x = (
        e.join(u0, "o_custkey")
        .withColumn("k", F.col("ym") - F.col("c0"))
        .where(F.col("k") <= _CL_K)
        .groupBy(F.col("c0").alias("cohort"), "k")
        .agg(F.sum("cents").alias("cents"))
    )
    grid = (
        x.select("cohort")
        .distinct()
        .join(F.broadcast(cut))
        .select(
            "cohort",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.least(F.col("w") - F.col("cohort"), F.lit(_CL_K)),
                )
            ).alias("k"),
            (F.col("w") - F.col("cohort")).alias("avail"),
        )
    )
    w_cum = Window.partitionBy("cohort").orderBy("k")
    tri = (
        grid.join(x, ["cohort", "k"], "left")
        .select(
            "cohort",
            "k",
            "avail",
            F.coalesce("cents", F.lit(0)).alias("cents"),
        )
        .withColumn(
            "cum",
            F.sum("cents").over(
                w_cum.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    piv_aggs = [F.max("avail").alias("avail")]
    for k in range(_CL_K):
        piv_aggs.append(
            F.max(F.when(F.col("k") == k, F.col("cum"))).alias(f"c_at{k}")
        )
        piv_aggs.append(
            F.max(F.when(F.col("k") == k + 1, F.col("cum"))).alias(
                f"c_next{k}"
            )
        )
    piv = tri.groupBy("cohort").agg(*piv_aggs)
    f_cols = [
        (
            F.sum(
                F.when(F.col("avail") >= k + 1, F.col(f"c_next{k}"))
            ).cast("double")
            / F.sum(
                F.when(F.col("avail") >= k + 1, F.col(f"c_at{k}"))
            ).cast("double")
        ).alias(f"f{k}")
        for k in range(_CL_K)
    ]
    f = piv.agg(*f_cols)
    basis = tri.groupBy("cohort").agg(
        F.max("k").alias("base_age"), F.max("cum").alias("obs")
    )
    ult = F.col("obs").cast("double")
    cases = F.lit(None).cast("double")
    for a in range(_CL_K - 1, -1, -1):
        prod = F.col("obs").cast("double")
        for k in range(a, _CL_K):
            prod = prod * F.col(f"f{k}")
        cases = F.when(F.col("base_age") == a, prod).otherwise(cases)
    ult_expr = F.coalesce(cases, ult)
    return (
        basis.join(F.broadcast(f))
        .select(
            F.col("cohort").alias("cohort_month"),
            F.col("base_age").cast("long").alias("base_age"),
            F.col("obs").cast("long").alias("observed_cum_cents"),
            F.round(ult_expr).cast("long").alias("ultimate8_cents"),
            F.round(
                F.lit(1000000.0) * F.col("obs").cast("double") / ult_expr
            )
            .cast("long")
            .alias("completion_ppm"),
        )
        .orderBy("cohort_month")
    )


#: Fixed-point unit-price scale for the price indices (micro-cents):
#: unit price = cents·10⁶ // qty is an exact integer, so the index
#: numerators are exact integer dot products — a per-part float
#: division feeding a float Σ would be association-order-dependent.
_PIDX_SCALE = 1_000_000


@register(
    "lineitem_price_index",
    # Monthly Laspeyres / Paasche / Fisher price indices vs the first
    # ship-month basket: per (month, part) quantity and cents from ONE
    # aggregate; unit prices as exact micro-cent integers; index
    # numerators/denominators HUGEINT dot products over the common-part
    # basket; one float division (+ sqrt for Fisher) per month.
    oracle=f"""
    WITH mp AS (
        SELECT STRFTIME(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
               l_partkey AS part,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2
    ), up AS (
        SELECT mon, part, q,
               cents * {_PIDX_SCALE} // q AS up
        FROM mp
    ), base AS (
        SELECT part, q AS q0, up AS up0 FROM up
        WHERE mon = (SELECT MIN(mon) FROM up)
    ), j AS (
        SELECT up.mon,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(CAST(up.up AS HUGEINT) * b.q0) AS HUGEINT) AS l_num,
               CAST(SUM(CAST(b.up0 AS HUGEINT) * b.q0) AS HUGEINT) AS l_den,
               CAST(SUM(CAST(up.up AS HUGEINT) * up.q) AS HUGEINT) AS p_num,
               CAST(SUM(CAST(b.up0 AS HUGEINT) * up.q) AS HUGEINT) AS p_den
        FROM up JOIN base b ON up.part = b.part
        GROUP BY 1
    )
    SELECT mon, n_parts,
           ROUND(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6)
               AS laspeyres,
           ROUND(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6)
               AS paasche,
           ROUND(sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
                      * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6)
               AS fisher
    FROM j ORDER BY mon
    """,
)
def lineitem_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly Laspeyres, Paasche, and Fisher price indices against the
    first ship-month's basket — the standard inflation readout over the
    part catalog (Laspeyres weights by BASE quantities, Paasche by
    CURRENT, Fisher is their geometric mean, correcting the two
    opposite substitution biases).  Per-part unit prices are exact
    micro-cent integers (cents·10⁶ // qty), so every index numerator
    and denominator is an exact HUGEINT dot product over the
    common-part basket and each reported index is ONE float division
    (plus a sqrt for Fisher) — a per-part float price feeding a float
    Σ would be association-order-dependent across engines.

    Scale notes: corpus-grain work is ONE map-side-combined aggregate
    to the (month, part) rollup — month × part-dimension-sized, never
    line-grain; the basket join is part-keyed on that rollup; the
    final aggregate collapses to the calendar-month frame.  The 1-row
    base-month scalar is a reviewed broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    mp = li.groupBy(
        F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("mon"),
        F.col("l_partkey").alias("part"),
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents"),
    )
    up = mp.select(
        "mon",
        "part",
        "q",
        F.expr(f"cents * {_PIDX_SCALE} div q").alias("up"),
    )
    base_mon = up.agg(F.min("mon").alias("mon0"))
    base = (
        up.join(F.broadcast(base_mon), F.col("mon") == F.col("mon0"))
        .select(
            "part", F.col("q").alias("q0"), F.col("up").alias("up0")
        )
    )
    d38 = "decimal(38,0)"
    j = (
        up.join(base, "part")
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum(F.col("up").cast(d38) * F.col("q0")).cast(d38).alias("l_num"),
            F.sum(F.col("up0").cast(d38) * F.col("q0")).cast(d38).alias("l_den"),
            F.sum(F.col("up").cast(d38) * F.col("q")).cast(d38).alias("p_num"),
            F.sum(F.col("up0").cast(d38) * F.col("q")).cast(d38).alias("p_den"),
        )
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return j.select(
        "mon",
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).orderBy("mon")


@register(
    "events_cusum_drift",
    # Batch CUSUM drift scores on daily purchase counts via the exact
    # closed form S⁺_t = a_t − min(0, min_{j≤t} a_j) with a_t =
    # cum_t − t·k (k = floor of the global daily mean) — the
    # prefix-min identity that turns the sequential max(0, ·)
    # recursion into two windows; S⁻ symmetric.  Alarm lines are the
    # empirical p90 of each score by integer nearest-rank.  Everything
    # is BIGINT; no float anywhere.
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), k AS (
        SELECT CAST(SUM(n) // COUNT(*) AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d
    ), a AS (
        SELECT day, n, n_days,
               SUM(n - k) OVER (ORDER BY day) AS a_pos,
               SUM(k - n) OVER (ORDER BY day) AS a_neg
        FROM d, k
    ), s AS (
        SELECT day, n, n_days,
               a_pos - LEAST(CAST(0 AS BIGINT),
                   MIN(a_pos) OVER (ORDER BY day)) AS s_pos,
               a_neg - LEAST(CAST(0 AS BIGINT),
                   MIN(a_neg) OVER (ORDER BY day)) AS s_neg
        FROM a
    ), h AS (
        SELECT day, n, s_pos, s_neg,
               CAST(ROW_NUMBER() OVER (ORDER BY s_pos, day) AS BIGINT)
                   AS r_pos,
               CAST(ROW_NUMBER() OVER (ORDER BY s_neg, day) AS BIGINT)
                   AS r_neg,
               n_days
        FROM s
    ), thr AS (
        SELECT CAST(MAX(CASE WHEN r_pos * 10 <= n_days * 9
                             THEN s_pos END) AS BIGINT) AS h_pos,
               CAST(MAX(CASE WHEN r_neg * 10 <= n_days * 9
                             THEN s_neg END) AS BIGINT) AS h_neg
        FROM h
    )
    SELECT day, n AS n_purchases,
           CAST(s_pos AS BIGINT) AS s_pos,
           CAST(s_neg AS BIGINT) AS s_neg,
           CAST(CASE WHEN s_pos > h_pos THEN 1 ELSE 0 END AS BIGINT)
               AS alarm_pos,
           CAST(CASE WHEN s_neg > h_neg THEN 1 ELSE 0 END AS BIGINT)
               AS alarm_neg
    FROM h, thr ORDER BY day
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CUSUM drift detection on daily purchase counts — the
    Page cumulative-sum scores S⁺/S⁻ against the global-mean target,
    computed with the exact closed form S⁺_t = a_t − min(0,
    min_{j≤t} a_j), a_t = Σ(x−k): the prefix-min identity replaces the
    sequential max(0, S+x−k) recursion with two windows, which is what
    makes a batch (and SQL-oracle) formulation possible at all — and
    is the batch twin of the micro-batch-sequential
    `stream_cusum_alarm`, closing that operator's oracle gap the way
    `stream_cms_merge` twins `agg_countmin_heavyhitters`.  Alarm
    lines are the empirical p90 of each score (integer nearest-rank:
    largest value with rank·10 ≤ 0.9·n·10) — the top-decile
    cumulative-deviation days.  Every value is BIGINT end to end.

    Scale notes: corpus-grain work is ONE hash aggregate to the
    calendar-day rollup; cumsum / prefix-min / rank / threshold
    windows all run on that ≤|days|-row frame (reviewed SINGLE)."""
    e = load_table(spark, sf_dir, "events")
    d = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    k = d.agg(
        F.expr("CAST(SUM(n) div COUNT(*) AS BIGINT)").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    a = d.join(F.broadcast(k)).select(
        "day",
        "n",
        "n_days",
        F.sum(F.col("n") - F.col("k")).over(w_cum).alias("a_pos"),
        F.sum(F.col("k") - F.col("n")).over(w_cum).alias("a_neg"),
    )
    s = a.select(
        "day",
        "n",
        "n_days",
        (
            F.col("a_pos")
            - F.least(F.lit(0).cast("long"), F.min("a_pos").over(w_cum))
        ).alias("s_pos"),
        (
            F.col("a_neg")
            - F.least(F.lit(0).cast("long"), F.min("a_neg").over(w_cum))
        ).alias("s_neg"),
    )
    h = s.select(
        "day",
        "n",
        "s_pos",
        "s_neg",
        "n_days",
        F.row_number().over(Window.orderBy("s_pos", "day")).cast("long").alias("r_pos"),
        F.row_number().over(Window.orderBy("s_neg", "day")).cast("long").alias("r_neg"),
    )
    thr = h.agg(
        F.max(
            F.when(F.col("r_pos") * 10 <= F.col("n_days") * 9, F.col("s_pos"))
        )
        .cast("long")
        .alias("h_pos"),
        F.max(
            F.when(F.col("r_neg") * 10 <= F.col("n_days") * 9, F.col("s_neg"))
        )
        .cast("long")
        .alias("h_neg"),
    )
    return (
        h.join(F.broadcast(thr))
        .select(
            "day",
            F.col("n").alias("n_purchases"),
            F.col("s_pos").cast("long").alias("s_pos"),
            F.col("s_neg").cast("long").alias("s_neg"),
            F.when(F.col("s_pos") > F.col("h_pos"), 1)
            .otherwise(0)
            .cast("long")
            .alias("alarm_pos"),
            F.when(F.col("s_neg") > F.col("h_neg"), 1)
            .otherwise(0)
            .cast("long")
            .alias("alarm_neg"),
        )
        .orderBy("day")
    )


#: R/S block sizes for the Hurst fit — powers of two spanning what a
#: month-long hourly series supports (~720 points → 90/45/22/11 blocks).
_HURST_KS = (8, 16, 32, 64)

_HURST_SCALE = 1_000_000


@register(
    "agg_hurst_exponent",
    # Hurst exponent by classic rescaled-range analysis on the hourly
    # event-count series: per (block size k, block), the range of
    # mean-adjusted partial sums is carried SCALED by k (k·Z_j =
    # k·cum_j − j·S, an integer), the std denominator as the integer
    # k·Σx²−S², so R/S = R_scaled/√D needs ONE sqrt+division per
    # block, floored to micro-units; per-k means are integer; H is the
    # micro-log OLS slope over the ≤4 (ln k, ln R/S) points.
    oracle=f"""
    WITH bounds AS (
        SELECT CAST(MIN(epoch_us(ts) // 3600000000) AS BIGINT) AS h0,
               CAST(MAX(epoch_us(ts) // 3600000000) AS BIGINT) AS h1
        FROM events
    ), spine AS (
        SELECT UNNEST(range(h0, h1 + 1)) - h0 AS h FROM bounds
    ), cnt AS (
        SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT)
               - (SELECT h0 FROM bounds) AS h,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), series AS (
        SELECT spine.h, COALESCE(cnt.x, 0) AS x
        FROM spine LEFT JOIN cnt ON spine.h = cnt.h
    ), blocks AS (
        SELECT k.k, series.h // k.k AS blk, series.h % k.k + 1 AS j,
               series.x
        FROM series, (VALUES {", ".join(f"({k})" for k in _HURST_KS)}) k(k)
        WHERE series.h < (SELECT (h1 - h0 + 1) FROM bounds) // k.k * k.k
    ), z AS (
        SELECT k, blk, j, x,
               SUM(x) OVER (PARTITION BY k, blk ORDER BY j) AS cum,
               SUM(x) OVER (PARTITION BY k, blk) AS s,
               SUM(x * x) OVER (PARTITION BY k, blk) AS ss
        FROM blocks
    ), per_block AS (
        SELECT k, blk,
               MAX(k * cum - j * s) - MIN(k * cum - j * s) AS r_scaled,
               MAX(k * ss - s * s) AS d
        FROM z GROUP BY k, blk
    ), rs AS (
        SELECT k, blk,
               CAST(ROUND(r_scaled / sqrt(CAST(d AS DOUBLE))
                          * {_HURST_SCALE}) AS BIGINT) AS rs_micro
        FROM per_block WHERE d > 0
    ), per_k AS (
        SELECT k,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(rs_micro) // COUNT(*) AS BIGINT) AS mean_rs_micro
        FROM rs GROUP BY k
    ), pts AS (
        SELECT k, n_blocks, mean_rs_micro,
               CAST(ROUND(ln(CAST(k AS DOUBLE)) * {_HURST_SCALE})
                    AS BIGINT) AS lx,
               CAST(ROUND(ln(CAST(mean_rs_micro AS DOUBLE))
                          * {_HURST_SCALE}) AS BIGINT) AS ly
        FROM per_k
    ), ols AS (
        SELECT k, n_blocks, mean_rs_micro,
               COUNT(*) OVER () AS n,
               SUM(lx) OVER () AS sx, SUM(ly) OVER () AS sy,
               SUM(lx * ly) OVER () AS sxy, SUM(lx * lx) OVER () AS sxx
        FROM pts
    )
    SELECT CAST(k AS BIGINT) AS k, n_blocks, mean_rs_micro,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS hurst
    FROM ols ORDER BY k
    """,
)
def agg_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-count series by classic
    rescaled-range (R/S) analysis — the long-range-dependence readout
    (H ≈ 0.5 memoryless, > 0.5 trending/persistent, < 0.5
    mean-reverting) behind capacity planning and anomaly baselining.
    For each block size k ∈ {8,16,32,64}: split the zero-filled hourly
    series into ⌊n/k⌋ blocks, compute each block's rescaled range with
    the mean-adjusted partial sums carried SCALED by k (k·Z_j =
    k·cum_j − j·S — exact integers; the std denominator is the
    integer k·Σx²−S²), so each block needs exactly ONE sqrt+division,
    floored to micro-units; per-k means are integer division; H is
    the OLS slope over the ≤4 (ln k, ln R̄/S̄) micro-log points (the
    `text_zipf_fit` fixed-point-OLS pattern).  Constant blocks (D=0)
    are dropped on both engines.

    Scale notes: corpus-grain work is ONE hash aggregate to the hourly
    rollup; the spine/zero-fill, 4× block-size fanout, block windows,
    and the 4-point OLS all run on that calendar-bounded frame
    (reviewed SINGLE/BNL rows — ≤4·|hours| rows end to end)."""
    e = load_table(spark, sf_dir, "events")
    hour = (epoch_seconds("ts") / 3600).cast("long")
    bounds = e.agg(
        F.min(hour).alias("h0"),
        F.max(hour).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("h1") - F.col("h0"))).alias("h"),
        (F.col("h1") - F.col("h0") + 1).alias("n_hours"),
    )
    cnt = (
        e.select(hour.alias("habs"))
        .groupBy("habs")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .join(F.broadcast(bounds))
        .select((F.col("habs") - F.col("h0")).alias("h"), "x")
    )
    series = (
        spine.join(cnt, "h", "left")
        .select("h", "n_hours", F.coalesce("x", F.lit(0)).alias("x"))
    )
    ks = spark.createDataFrame([(k,) for k in _HURST_KS], "k long")
    blocks = (
        series.join(F.broadcast(ks))
        .where(F.col("h") < F.expr("n_hours div k * k"))
        .select(
            "k",
            F.expr("h div k").alias("blk"),
            (F.col("h") % F.col("k") + 1).alias("j"),
            "x",
        )
    )
    w_cum = (
        Window.partitionBy("k", "blk")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_blk = Window.partitionBy("k", "blk")
    z = blocks.select(
        "k",
        "blk",
        "j",
        "x",
        F.sum("x").over(w_cum).alias("cum"),
        F.sum("x").over(w_blk).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w_blk).alias("ss"),
    )
    kz = F.col("k") * F.col("cum") - F.col("j") * F.col("s")
    per_block = z.groupBy("k", "blk").agg(
        (F.max(kz) - F.min(kz)).alias("r_scaled"),
        F.max(
            F.col("k") * F.col("ss") - F.col("s") * F.col("s")
        ).alias("d"),
    )
    rs = per_block.where(F.col("d") > 0).select(
        "k",
        F.round(
            F.col("r_scaled") / F.sqrt(F.col("d").cast("double"))
            * _HURST_SCALE
        )
        .cast("long")
        .alias("rs_micro"),
    )
    per_k = rs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.expr("CAST(SUM(rs_micro) div COUNT(*) AS BIGINT)").alias(
            "mean_rs_micro"
        ),
    )
    pts = per_k.select(
        "k",
        "n_blocks",
        "mean_rs_micro",
        F.round(F.log(F.col("k").cast("double")) * _HURST_SCALE)
        .cast("long")
        .alias("lx"),
        F.round(F.log(F.col("mean_rs_micro").cast("double")) * _HURST_SCALE)
        .cast("long")
        .alias("ly"),
    )
    w_all = Window.partitionBy()
    ols = pts.select(
        "k",
        "n_blocks",
        "mean_rs_micro",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("lx").over(w_all).alias("sx"),
        F.sum("ly").over(w_all).alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).over(w_all).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).over(w_all).alias("sxx"),
    )
    return ols.select(
        F.col("k").cast("long").alias("k"),
        "n_blocks",
        "mean_rs_micro",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            ).cast("double"),
            6,
        ).alias("hurst"),
    ).orderBy("k")


@register(
    "orders_abc_xyz",
    # ABC×XYZ inventory matrix: ABC = cumulative revenue share (80/95
    # cuts, integer cum·100 vs total·k on the revenue-rank window);
    # XYZ = demand-variability TERCILES of the integer-scaled squared
    # CV (cvsq_micro = (nΣq²−S²)·10⁶ // S², zero months included) —
    # the absolute 0.5/1.0 CV cuts audited VACUOUS on the sparse
    # fixture (every part Z), so the relative cut is the decisive,
    # practice-sanctioned variant for intermittent demand.
    oracle="""
    WITH months AS (
        SELECT CAST(COUNT(DISTINCT STRFTIME(CAST(l_shipdate AS DATE),
                    '%Y-%m')) AS BIGINT) AS n_months
        FROM lineitem
    ), pm AS (
        SELECT l_partkey AS part,
               STRFTIME(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2
    ), p AS (
        SELECT part,
               CAST(SUM(q) AS BIGINT) AS s,
               CAST(SUM(q * q) AS BIGINT) AS sq,
               CAST(SUM(cents) AS BIGINT) AS revenue
        FROM pm GROUP BY 1
    ), cv AS (
        SELECT part, revenue,
               (n_months * sq - s * s) * 1000000 // (s * s) AS cvsq_micro
        FROM p, months
    ), cls AS (
        SELECT part, revenue, cvsq_micro,
               ROW_NUMBER() OVER (ORDER BY cvsq_micro, part) AS vr,
               COUNT(*) OVER () AS np,
               SUM(revenue) OVER (ORDER BY revenue DESC, part) AS cum,
               SUM(revenue) OVER () AS total
        FROM cv
    ), mat AS (
        SELECT revenue, cvsq_micro,
               CASE 3 * (vr - 1) // np WHEN 0 THEN \'X\' WHEN 1 THEN \'Y\'
                    ELSE \'Z\' END AS xyz,
               CASE WHEN cum * 100 <= total * 80 THEN \'A\'
                    WHEN cum * 100 <= total * 95 THEN \'B\'
                    ELSE \'C\' END AS abc,
               total
        FROM cls
    )
    SELECT abc, xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(revenue) AS BIGINT) AS revenue_cents,
           CAST(SUM(revenue) * 1000000 // MAX(total) AS BIGINT)
               AS share_ppm,
           CAST(MIN(cvsq_micro) AS BIGINT) AS min_cvsq_micro,
           CAST(MAX(cvsq_micro) AS BIGINT) AS max_cvsq_micro
    FROM mat GROUP BY 1, 2 ORDER BY abc, xyz
    """,
)
def orders_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC×XYZ inventory classification — the planner\'s matrix crossing
    revenue importance (ABC: cumulative-share 80/95 cuts,
    `orders_abc_pareto`\'s axis) with demand PREDICTABILITY (XYZ: the
    coefficient of variation of monthly demand, zero months included
    via the global month count).  The XYZ axis is cut into catalog-
    RELATIVE terciles of the integer-scaled squared CV (cvsq_micro =
    (nΣq²−S²)·10⁶ // S² — no float CV is ever computed): the textbook
    absolute cuts (CV ≤ 0.5 / ≤ 1.0) were audited VACUOUS on this
    fixture — TPC-H-style part demand is intermittent (each part sells
    in a handful of months), so every part\'s CV exceeds 1 and the
    whole catalog lands in Z; relative cuts are what practitioners use
    for intermittent demand, and AX ("high value, steadiest — automate
    replenishment") vs CZ ("low value, most erratic — stock to order")
    stays decisive.  ABC boundaries are exact integer compares
    (cum·100 ≤ total·k); XYZ boundaries are exact integer rank
    arithmetic (3·(rank−1) // n_parts under the (cvsq, part) total
    order).

    Scale notes: ONE (part, month) aggregate then ONE part aggregate
    (both map-combined, part-dim-sized); the revenue-share and
    CV-rank windows run on the part rollup (the documented
    `orders_abc_pareto` posture — range-partition the ranks for a
    giant catalog); the output is the ≤9-cell matrix."""
    li = load_table(spark, sf_dir, "lineitem")
    months = li.agg(
        F.countDistinct(
            F.date_format(F.to_date("l_shipdate"), "yyyy-MM")
        ).alias("n_months")
    )
    pm = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("mon"),
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")).alias(
            "cents"
        ),
    )
    p = pm.groupBy("part").agg(
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("sq"),
        F.sum("cents").alias("revenue"),
    )
    cv = p.join(F.broadcast(months)).select(
        "part",
        "revenue",
        F.expr(
            "(n_months * sq - s * s) * 1000000 div (s * s)"
        ).alias("cvsq_micro"),
    )
    w_vr = Window.orderBy("cvsq_micro", "part")
    w_cum = Window.orderBy(F.desc("revenue"), "part").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cls = cv.select(
        "revenue",
        "cvsq_micro",
        F.row_number().over(w_vr).alias("vr"),
        F.count(F.lit(1)).over(w_all).alias("np"),
        F.sum("revenue").over(w_cum).alias("cum"),
        F.sum("revenue").over(w_all).alias("total"),
    )
    mat = cls.select(
        "revenue",
        "cvsq_micro",
        F.when(F.expr("3 * (vr - 1) div np") == 0, "X")
        .when(F.expr("3 * (vr - 1) div np") == 1, "Y")
        .otherwise("Z")
        .alias("xyz"),
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        "total",
    )
    return (
        mat.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("revenue").cast("long").alias("revenue_cents"),
            # decimal(38,0) carry: SUM(cents)·10⁶ overflows int64 past
            # ~$92B of cell revenue — the sf1 sweep caught the ANSI
            # overflow (DuckDB's SUM is already int128).
            F.expr(
                "CAST(CAST(SUM(revenue) AS DECIMAL(38,0)) * 1000000"
                " div MAX(total) AS BIGINT)"
            ).alias("share_ppm"),
            F.min("cvsq_micro").cast("long").alias("min_cvsq_micro"),
            F.max("cvsq_micro").cast("long").alias("max_cvsq_micro"),
        )
        .orderBy("abc", "xyz")
    )


_WEIB_SCALE = 1_000_000


@register(
    "orders_weibull_fit",
    # Weibull fit of ship-delay durations by median-rank regression on
    # the BOUNDED duration rollup: Benard's approximation F = (cum −
    # 0.3)/(n + 0.4) carried in exact integer milli-units, the
    # (ln t, ln(−ln(1−F))) points as micro-unit BIGINTs, and the
    # shape/scale from the fixed-point OLS (text_zipf_fit pattern) —
    # the parametric-survival extension of orders_hazard_table.
    oracle=f"""
    WITH d AS (
        SELECT CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
                    AS BIGINT) AS dur
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
    ), r AS (
        SELECT dur, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY dur
    ), cumed AS (
        SELECT dur, c,
               SUM(c) OVER (ORDER BY dur) AS cum,
               SUM(c) OVER () AS n
        FROM r
    ), pts AS (
        SELECT dur, c, cum, n,
               CAST(ROUND(ln(CAST(dur AS DOUBLE)) * {_WEIB_SCALE})
                    AS BIGINT) AS x,
               CAST(ROUND(ln(-ln(1 - (CAST(cum * 10000 - 3000 AS DOUBLE)
                                      / (n * 10000 + 4000))))
                          * {_WEIB_SCALE}) AS BIGINT) AS y
        FROM cumed WHERE cum < n
    ), ols AS (
        SELECT dur, c, CAST(cum AS BIGINT) AS cum,
               CAST((cum * 10000 - 3000) * 1000000
                    // (n * 10000 + 4000) AS BIGINT) AS f_ppm,
               COUNT(*) OVER () AS np,
               SUM(CAST(x AS HUGEINT)) OVER () AS sx,
               SUM(CAST(y AS HUGEINT)) OVER () AS sy,
               SUM(CAST(x AS HUGEINT) * y) OVER () AS sxy,
               SUM(CAST(x AS HUGEINT) * x) OVER () AS sxx
        FROM pts
    )
    SELECT dur AS dur_days, c AS n_lines, cum, f_ppm,
           ROUND(CAST(np * sxy - sx * sy AS DOUBLE)
                 / CAST(np * sxx - sx * sx AS DOUBLE), 6) AS weibull_shape,
           ROUND(exp(-(CAST(sxx * sy - sx * sxy AS DOUBLE)
                       / CAST(np * sxx - sx * sx AS DOUBLE))
                     / {_WEIB_SCALE}.0
                     / (CAST(np * sxy - sx * sy AS DOUBLE)
                        / CAST(np * sxx - sx * sx AS DOUBLE))), 4)
               AS weibull_scale_days
    FROM ols ORDER BY dur_days
    """,
)
def orders_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull(k, λ) fit of order→ship delays by median-rank
    regression — the standard reliability-engineering estimator
    (probability-plot linearization: ln(−ln(1−F)) = k·ln t − k·ln λ),
    the PARAMETRIC extension of `orders_hazard_table`'s nonparametric
    life table: k < 1 infant-mortality, k ≈ 1 memoryless, k > 1
    wear-out.  The plotting positions use Benard's median-rank
    approximation F = (cum−0.3)/(n+0.4) carried in exact integer
    deci-milli units; both regression coordinates are micro-unit
    BIGINTs so the OLS sums are HUGEINT-exact (the `text_zipf_fit`
    fixed-point pattern); scale λ = exp(−a/k) is two IEEE ops at the
    end.  The top duration (F = 1) is excluded on both engines
    (ln(−ln 0) undefined — the standard plotting convention).

    Scale notes: corpus-grain work is the fact join + ONE hash
    aggregate to the duration rollup (DOMAIN-bounded by the ship-delay
    span — ~2.4k distinct day values on the fixture, fixed at any
    corpus size); cumsum/OLS windows run on that rollup (reviewed
    SINGLE)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.to_date("l_shipdate") > F.to_date("o_orderdate"))
        .select(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("long")
            .alias("dur")
        )
    )
    r = d.groupBy("dur").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cumed = r.select(
        "dur",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    f = (F.col("cum") * 10000 - 3000).cast("double") / (
        F.col("n") * 10000 + 4000
    )
    pts = cumed.where(F.col("cum") < F.col("n")).select(
        "dur",
        "c",
        "cum",
        "n",
        F.round(F.log(F.col("dur").cast("double")) * _WEIB_SCALE)
        .cast("long")
        .alias("x"),
        F.round(F.log(-F.log(1 - f)) * _WEIB_SCALE)
        .cast("long")
        .alias("y"),
    )
    d38 = "decimal(38,0)"
    ols = pts.select(
        F.col("dur").alias("dur_days"),
        F.col("c").alias("n_lines"),
        F.col("cum").cast("long").alias("cum"),
        F.expr(
            "CAST((cum * 10000 - 3000) * 1000000"
            " div (n * 10000 + 4000) AS BIGINT)"
        ).alias("f_ppm"),
        F.count(F.lit(1)).over(w_all).cast(d38).alias("np"),
        F.sum(F.col("x").cast(d38)).over(w_all).alias("sx"),
        F.sum(F.col("y").cast(d38)).over(w_all).alias("sy"),
        F.sum((F.col("x").cast(d38) * F.col("y"))).over(w_all).alias("sxy"),
        F.sum((F.col("x").cast(d38) * F.col("x"))).over(w_all).alias("sxx"),
    )
    slope = (
        F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (
        F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    icpt = (
        F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")
    ).cast("double") / (
        F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    return ols.select(
        "dur_days",
        "n_lines",
        "cum",
        "f_ppm",
        F.round(slope, 6).alias("weibull_shape"),
        F.round(
            F.exp(-(icpt / float(_WEIB_SCALE)) / slope), 4
        ).alias("weibull_scale_days"),
    ).orderBy("dur_days")


# --------------------------------------------------------------------------
# r9 batch (§2.38): inventory service levels + grouped inequality.
# --------------------------------------------------------------------------

#: Safety-stock service factor z = 1.645 carried in micro-units (90%
#: one-sided service level) and a fixed 2-week replenishment lead time —
#: both named constants so the oracle embeds identical literals.
_SS_Z_MICRO = 1_645_000
_SS_LEAD_WEEKS = 2

#: Theil band width for grouped inequality: $10,000 of customer spend
#: per band (cents) — fixed edges, RANGE-bounded rollup (fixture spend
#: tops out ~$3.5M per customer => <= ~350 bands).
_THEIL_BAND_CENTS = 1_000_000


@register(
    "orders_safety_stock",
    # Per-brand weekly demand -> safety stock & reorder point under a
    # fixed 90% service factor and 2-week lead: mu/sigma from exact
    # integer quantity sums at (brand, week) grain; SS = z*sigma*sqrt(L)
    # and ROP = L*mu + SS as terminal float readouts, ROUND 2.
    oracle=f"""
    WITH weekly AS (
        SELECT p.p_brand AS brand,
               DATE_TRUNC('week', l.l_shipdate) AS wk,
               SUM(CAST(l.l_quantity AS BIGINT)) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ), stats AS (
        SELECT brand, COUNT(*) AS n_weeks, SUM(q) AS sq,
               SUM(CAST(q AS HUGEINT) * q) AS sqq
        FROM weekly GROUP BY brand
    )
    SELECT brand,
           CAST(n_weeks AS BIGINT) AS n_weeks,
           CAST(sq AS BIGINT) AS total_units,
           ROUND(CAST(sq AS DOUBLE) / n_weeks, 2) AS mu_weekly,
           ROUND(SQRT((CAST(sqq AS DOUBLE)
                       - CAST(sq AS DOUBLE) * sq / n_weeks)
                      / (n_weeks - 1)), 2) AS sigma_weekly,
           ROUND({_SS_Z_MICRO} * 1e-6
                 * SQRT((CAST(sqq AS DOUBLE)
                         - CAST(sq AS DOUBLE) * sq / n_weeks)
                        / (n_weeks - 1))
                 * SQRT({_SS_LEAD_WEEKS}), 2) AS safety_stock,
           ROUND({_SS_LEAD_WEEKS} * CAST(sq AS DOUBLE) / n_weeks
                 + {_SS_Z_MICRO} * 1e-6
                   * SQRT((CAST(sqq AS DOUBLE)
                           - CAST(sq AS DOUBLE) * sq / n_weeks)
                          / (n_weeks - 1))
                   * SQRT({_SS_LEAD_WEEKS}), 2) AS reorder_point
    FROM stats
    WHERE n_weeks > 1
    ORDER BY brand
    """,
)
def orders_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand safety stock and reorder point — the inventory-policy
    readout downstream of `orders_abc_xyz`: weekly demand mean/std from
    exact integer quantity sums, SS = z·σ_w·√L (z = 1.645 ≙ 90%
    service, L = 2 weeks lead), ROP = L·μ_w + SS.  Demand variability
    is real at brand grain (intermittent per-part demand aggregates to
    distinct per-brand CVs — the r8 ABC×XYZ audit), so the SS column
    spreads across brands instead of scaling one number.

    Scale notes: ONE fact-dim join + hash aggregate to the
    (brand, week) rollup (25 brands × corpus-era weeks — calendar
    bounded), then a second aggregate to 25 brand rows; sqrt/divisions
    are terminal on that frame, ROUND(2)-absorbed.  Quantity sums stay
    BIGINT; sums of squares carry DECIMAL(38,0)/HUGEINT (qty² × weekly
    volume crosses BIGINT near sf100)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    weekly = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    stats = weekly.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.sum("q").alias("sq"),
        F.sum(
            F.col("q").cast("decimal(38,0)") * F.col("q").cast("decimal(38,0)")
        ).alias("sqq"),
    )
    var = (
        F.col("sqq").cast("double")
        - F.col("sq").cast("double") * F.col("sq") / F.col("n_weeks")
    ) / (F.col("n_weeks") - 1)
    sigma = F.sqrt(var)
    mu = F.col("sq").cast("double") / F.col("n_weeks")
    ss = (
        F.lit(_SS_Z_MICRO)
        * F.lit(1e-6)
        * sigma
        * F.sqrt(F.lit(_SS_LEAD_WEEKS))
    )
    return (
        stats.where(F.col("n_weeks") > 1)
        .select(
            "brand",
            F.col("n_weeks").cast("long").alias("n_weeks"),
            F.col("sq").cast("long").alias("total_units"),
            F.round(mu, 2).alias("mu_weekly"),
            F.round(sigma, 2).alias("sigma_weekly"),
            F.round(ss, 2).alias("safety_stock"),
            F.round(F.lit(_SS_LEAD_WEEKS) * mu + ss, 2).alias("reorder_point"),
        )
        .orderBy("brand")
    )


@register(
    "agg_theil_inequality",
    # Grouped Theil-T decomposition of customer spend by nation: cells =
    # (nation, $10k spend band); T_between_cells = sum w_g ln(w_g/f_g)
    # over exact integer share ratios, split into between-nation and
    # within-nation components.  ln runs ONLY on the bounded cell
    # rollup; each term is ROUND(6)-absorbed.
    oracle=f"""
    WITH spend AS (
        SELECT o.o_custkey AS cust, c.c_nationkey AS nation,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), cells AS (
        SELECT nation, y // {_THEIL_BAND_CENTS} AS band,
               COUNT(*) AS n_g, SUM(y) AS y_g
        FROM spend GROUP BY 1, 2
    ), tot AS (
        SELECT SUM(n_g) AS n, SUM(y_g) AS y FROM cells
    ), nation_t AS (
        SELECT c.nation,
               SUM(c.n_g) AS n_nat, SUM(c.y_g) AS y_nat,
               SUM((CAST(c.y_g AS DOUBLE) / t.y)
                   * LN((CAST(c.y_g AS DOUBLE) / t.y)
                        / (CAST(c.n_g AS DOUBLE) / t.n))) AS t_cells
        FROM cells c CROSS JOIN tot t
        GROUP BY c.nation
    )
    SELECT nt.nation AS nation,
           CAST(nt.n_nat AS BIGINT) AS n_customers,
           CAST(CAST(nt.y_nat AS HUGEINT) * 1000000 // t.y AS BIGINT)
               AS spend_share_ppm,
           ROUND((CAST(nt.y_nat AS DOUBLE) / t.y)
                 * LN((CAST(nt.y_nat AS DOUBLE) / t.y)
                      / (CAST(nt.n_nat AS DOUBLE) / t.n)), 6)
               AS t_between_contrib,
           ROUND(nt.t_cells
                 - (CAST(nt.y_nat AS DOUBLE) / t.y)
                   * LN((CAST(nt.y_nat AS DOUBLE) / t.y)
                        / (CAST(nt.n_nat AS DOUBLE) / t.n)), 6)
               AS t_within_contrib
    FROM nation_t nt CROSS JOIN tot t
    ORDER BY nation
    """,
)
def agg_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Theil-T inequality decomposition of customer spend —
    per nation: the between-nation contribution (does this nation's
    spend share outrun its population share?) and the within-nation
    contribution (inequality across $10k spend bands inside the
    nation).  Summing the two columns over nations gives total
    band-grain Theil; the decomposition is exact by Theil's additivity.
    Banding is the standard grouped-data form (income statistics are
    published banded): ln never touches a per-customer row.

    Scale notes: corpus → per-customer spend (ONE hash aggregate, the
    dim-grain rollup) → (nation, band) cells (second aggregate,
    RANGE-bounded: ≤ nations × ~350 bands at any SF); the global
    totals broadcast onto that cell frame, and every ln/division is a
    terminal float on cells, ROUND(6)-absorbed.  Shares carried as
    exact BIGINT/ppm where emitted (`spend_share_ppm`)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("c_nationkey").alias("nation")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
    )
    cells = spend.groupBy(
        "nation", F.expr(f"y div {_THEIL_BAND_CENTS}").alias("band")
    ).agg(F.count(F.lit(1)).alias("n_g"), F.sum("y").alias("y_g"))
    tot = cells.agg(
        F.sum("n_g").alias("n"), F.sum("y_g").alias("y")
    )
    with_tot = cells.crossJoin(F.broadcast(tot))
    w_share = F.col("y_g").cast("double") / F.col("y")
    f_share = F.col("n_g").cast("double") / F.col("n")
    nation_t = with_tot.groupBy("nation").agg(
        F.sum("n_g").alias("n_nat"),
        F.sum("y_g").alias("y_nat"),
        F.sum(w_share * F.log(w_share / f_share)).alias("t_cells"),
        F.max("n").alias("n"),
        F.max("y").alias("y"),
    )
    wn = F.col("y_nat").cast("double") / F.col("y")
    fn = F.col("n_nat").cast("double") / F.col("n")
    between = wn * F.log(wn / fn)
    return nation_t.select(
        F.col("nation").cast("long").alias("nation"),
        F.col("n_nat").cast("long").alias("n_customers"),
        F.expr("CAST(y_nat AS DECIMAL(38,0)) * 1000000 div y")
        .cast("long")
        .alias("spend_share_ppm"),
        F.round(between, 6).alias("t_between_contrib"),
        F.round(F.col("t_cells") - between, 6).alias("t_within_contrib"),
    ).orderBy("nation")


@register(
    "agg_mutual_information",
    # MI over integer cell counts: every log's argument is an exact
    # integer cast to double (the text_entropy discipline), pmi =
    # ln(c·n/(cx·cy)) written as ln(c)+ln(n)-ln(cx)-ln(cy) with the
    # SAME association on both engines; the marginal-entropy sums fold
    # the cell frame (Σ_cells c·ln(cx) == Σ_x cx·ln(cx)); ROUND(4)
    # absorbs last-ulp libm drift.
    oracle="""
    WITH cells AS (
      SELECT event_type AS x,
             LEAST(9, CAST(floor(value / 50) AS BIGINT)) AS y,
             COUNT(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), m AS (
      SELECT x, y, c,
             SUM(c) OVER (PARTITION BY x) AS cx,
             SUM(c) OVER (PARTITION BY y) AS cy,
             SUM(c) OVER () AS n
      FROM cells
    )
    SELECT x AS event_type,
           CAST(y AS BIGINT) AS value_bucket,
           CAST(c AS BIGINT) AS n_cell,
           CAST(cx AS BIGINT) AS n_type,
           CAST(cy AS BIGINT) AS n_bucket,
           ROUND(ln(CAST(c AS DOUBLE)) + ln(CAST(n AS DOUBLE))
                 - ln(CAST(cx AS DOUBLE)) - ln(CAST(cy AS DOUBLE)), 4)
             AS pmi_nats,
           ROUND(SUM(c * (ln(CAST(c AS DOUBLE)) + ln(CAST(n AS DOUBLE))
                          - ln(CAST(cx AS DOUBLE))
                          - ln(CAST(cy AS DOUBLE)))) OVER ()
                 / n, 4) AS mi_nats,
           ROUND((SUM(c * (ln(CAST(c AS DOUBLE)) + ln(CAST(n AS DOUBLE))
                           - ln(CAST(cx AS DOUBLE))
                           - ln(CAST(cy AS DOUBLE)))) OVER () / n)
                 / sqrt((ln(CAST(n AS DOUBLE))
                         - SUM(c * ln(CAST(cx AS DOUBLE))) OVER () / n)
                        * (ln(CAST(n AS DOUBLE))
                           - SUM(c * ln(CAST(cy AS DOUBLE))) OVER () / n)),
                 4) AS nmi
    FROM m
    ORDER BY event_type, value_bucket
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns — the
    feature-selection / dependence readout (complements
    `agg_chisq_independence`'s test statistic with the information-
    theoretic effect size): MI(event_type; value bucket) in nats plus
    the sqrt-normalized NMI, with the per-cell pointwise-MI table the
    dependence actually lives in (which (type, bucket) cells co-occur
    more than independence predicts).  Fixture: value is independent of
    event type by construction (probed: per-type medians/p90s coincide;
    MI ≈ 0.002 nats at $50 bins — an apparent 0.22 at 0.2-wide bins is
    pure finite-sample bias, ≈ cells/2n), so the fixture is an honest
    NULL and the pytest proves the estimator discriminates: MI == 0 on
    a constructed exactly-independent frame, MI == H(X) on a
    deterministic one, and a planted type→bucket shift moves MI off
    zero (the `agg_fdr_bh` null-fixture pattern).

    Scale notes: ONE hash aggregate from the corpus to the
    |types|×|buckets| cell rollup (≤50 rows at any corpus size); the
    margins and the MI/entropy sums are windows on that rollup
    (reviewed SINGLE).  All logs take exact integers; the marginal
    entropy folds the CELL frame (Σ_cells c·ln(cx) = Σ_x cx·ln(cx)) so
    no second aggregate is needed."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cells = e.groupBy(
        F.col("event_type").alias("x"),
        F.least(F.lit(9), F.floor(F.col("value") / 50).cast("long")).alias("y"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    w_all = Window.partitionBy()
    m = cells.select(
        "x",
        "y",
        "c",
        F.sum("c").over(wx).alias("cx"),
        F.sum("c").over(wy).alias("cy"),
        F.sum("c").over(w_all).alias("n"),
    )
    ln = lambda col: F.log(F.col(col).cast("double"))
    pmi = ln("c") + ln("n") - ln("cx") - ln("cy")
    mi = F.sum(F.col("c") * pmi).over(w_all) / F.col("n")
    hx = ln("n") - F.sum(F.col("c") * ln("cx")).over(w_all) / F.col("n")
    hy = ln("n") - F.sum(F.col("c") * ln("cy")).over(w_all) / F.col("n")
    return m.select(
        F.col("x").alias("event_type"),
        F.col("y").cast("long").alias("value_bucket"),
        F.col("c").cast("long").alias("n_cell"),
        F.col("cx").cast("long").alias("n_type"),
        F.col("cy").cast("long").alias("n_bucket"),
        F.round(pmi, 4).alias("pmi_nats"),
        F.round(mi, 4).alias("mi_nats"),
        F.round(mi / F.sqrt(hx * hy), 4).alias("nmi"),
    ).orderBy("event_type", "value_bucket")


#: Periodogram analysis window: candidate periods (days) and the max
#: day index covered by the LITERAL trig-weight dim.  Weights are e6
#: integers (micro-units): e9 weights overflow the int128 power carry
#: at sf10 daily volumes (dev ~1e7 -> power*1e6 ~9e40); e6 keeps exact
#: headroom to ~1.3e7 events/day with 1e-6 relative spectral precision,
#: and the weight scale itself is the documented knob beyond that.  The weights are
#: Python-codegen'd once into BOTH the Spark literal frame and the
#: oracle VALUES list — cos/sin never execute in either engine, so the
#: whole spectrum is integer arithmetic (no cross-libm last-ulp risk).
#: The fixture's events span one calendar month; a production run
#: regenerates the weight dim for its own window length (it stays a
#: broadcast literal at any corpus size — |periods|·|days| rows).
_PG_PERIODS = tuple(range(2, 11))
_PG_MAX_T = 30


def _pg_weights() -> list[tuple[int, int, int, int]]:
    import math

    out = []
    for p in _PG_PERIODS:
        for t in range(_PG_MAX_T + 1):
            ang = 2.0 * math.pi * t / p
            out.append(
                (p, t, round(math.cos(ang) * 1e6), round(math.sin(ang) * 1e6))
            )
    return out


def _oracle_periodogram() -> str:
    values = ",\n        ".join(
        f"({p}, {t}, {c}, {s})" for p, t, c, s in _pg_weights()
    )
    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
    ), idx AS (
      SELECT datediff('day', MIN(d) OVER (), d) AS t, c,
             COUNT(*) OVER () AS n_days, SUM(c) OVER () AS total
      FROM daily
    ), dev AS (
      SELECT t, n_days * c - total AS dev
      FROM idx WHERE t BETWEEN 0 AND {_PG_MAX_T}
    ), w(p, t, cos_e6, sin_e6) AS (
      VALUES {values}
    ), s AS (
      SELECT w.p,
             SUM(dev.dev * w.cos_e6) AS sc,
             SUM(dev.dev * w.sin_e6) AS ss
      FROM dev JOIN w ON w.t = dev.t
      GROUP BY 1
    ), pw AS (
      -- HUGEINT, not DECIMAL: DuckDB's DECIMAL // runs through DOUBLE
      -- (probed: returns a float, off-by-one at e35/e29 magnitudes);
      -- int128 // is exact and power*1e6 <= ~1.4e35 fits.
      SELECT p, sc, ss,
             CAST(sc AS HUGEINT) * sc + CAST(ss AS HUGEINT) * ss AS power
      FROM s
    )
    SELECT CAST(p AS BIGINT) AS period_days,
           CAST(sc AS BIGINT) AS s_cos_e6,
           CAST(ss AS BIGINT) AS s_sin_e6,
           CAST(power * 1000000 // SUM(power) OVER () AS BIGINT)
             AS power_share_ppm,
           CAST(row_number() OVER (ORDER BY power DESC, p) AS BIGINT)
             AS power_rank
    FROM pw
    ORDER BY period_days
    """


@register("events_periodogram", oracle=_oracle_periodogram())
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram of the daily event-count series — the
    period-detection readout (is there a weekly cycle? a 3-day batch
    rhythm?) that decides seasonal-model structure before
    `events_stl_decompose`/`events_holt_forecast` commit to one: DFT
    power at candidate periods 2..10 days over the MEAN-CENTERED daily
    counts, each period's share of total candidate power in ppm plus
    its rank.

    Exactness: centering is integer (dev_t = n_days·c_t − Σc, counts
    scaled by n_days so no division happens); the cos/sin weights are
    CODEGEN'D LITERALS in e6 integer units shared verbatim by both
    engines (`_pg_weights` — trig never executes in SQL, eliminating
    cross-libm drift); S_cos/S_sin are int64 sums; powers square into
    DECIMAL(38,0) (the `agg_share_of_total_nested` carry) and the
    share is integer ppm division.  Bit-exact at every SF.

    Fixture: daily counts genuinely vary (probed 302..364 at sf0.01)
    with no planted cycle — shares spread across periods and the
    pytest injects a 7-day cycle and asserts period 7 takes rank 1.

    Scale notes: ONE hash aggregate from the corpus to the ≤31-row
    daily rollup; everything after (index window, weight join, spectrum
    aggs, share window) runs on calendar- or period-sized frames
    (reviewed SINGLE/NLJ — the weight dim is a broadcast 279-row
    literal)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_all = Window.partitionBy()
    idx = daily.select(
        F.datediff(F.col("d"), F.min("d").over(w_all)).alias("t"),
        "c",
        F.count(F.lit(1)).over(w_all).alias("n_days"),
        F.sum("c").over(w_all).alias("total"),
    )
    dev = idx.where(F.col("t").between(0, _PG_MAX_T)).select(
        "t", (F.col("n_days") * F.col("c") - F.col("total")).alias("dev")
    )
    weights = spark.createDataFrame(
        _pg_weights(), "p long, t long, cos_e6 long, sin_e6 long"
    )
    s = (
        dev.join(F.broadcast(weights), "t")
        .groupBy("p")
        .agg(
            F.sum(F.col("dev") * F.col("cos_e6")).alias("sc"),
            F.sum(F.col("dev") * F.col("sin_e6")).alias("ss"),
        )
    )
    pw = s.select(
        "p",
        "sc",
        "ss",
        (
            F.col("sc").cast("decimal(38,0)") * F.col("sc")
            + F.col("ss").cast("decimal(38,0)") * F.col("ss")
        ).alias("power"),
    )
    return pw.select(
        F.col("p").cast("long").alias("period_days"),
        F.col("sc").cast("long").alias("s_cos_e6"),
        F.col("ss").cast("long").alias("s_sin_e6"),
        F.expr("CAST(power * 1000000 div SUM(power) OVER () AS LONG)").alias(
            "power_share_ppm"
        ),
        F.row_number()
        .over(Window.orderBy(F.col("power").desc(), "p"))
        .cast("long")
        .alias("power_rank"),
    ).orderBy("period_days")


_IPF_ITERS = 3
_IPF_CUT = "DATE '1998-01-01'"


def _oracle_raking_ipf() -> str:
    """Unroll the three row+column raking sweeps as chained CTEs (the
    pagerank codegen-twin recipe).  Weights live in e6 integer units
    and every rescale is an exact integer multiply-divide through the
    int128/DECIMAL(38,0) carry, so each sweep is bit-identical on both
    engines (no float ratio ever materializes).  Step CTEs are
    MATERIALIZED — each is referenced by its margin sum AND the next
    step (the multi-reference inlining hazard, SURVEY §8)."""
    steps = []
    prev = "w0"
    for k in range(1, _IPF_ITERS + 1):
        steps.append(
            f"""rs{k} AS MATERIALIZED (
        SELECT x, SUM(w) AS s FROM {prev} GROUP BY x
    ), r{k} AS MATERIALIZED (
        SELECT p.x, p.y,
               CAST(CAST(p.w AS HUGEINT) * tr.t * 1000000 // rs{k}.s
                    AS BIGINT) AS w
        FROM {prev} p JOIN rs{k} ON rs{k}.x = p.x
        JOIN tr ON tr.x = p.x
    ), cs{k} AS MATERIALIZED (
        SELECT y, SUM(w) AS s FROM r{k} GROUP BY y
    ), c{k} AS MATERIALIZED (
        SELECT p.x, p.y,
               CAST(CAST(p.w AS HUGEINT) * tc.t * 1000000 // cs{k}.s
                    AS BIGINT) AS w
        FROM r{k} p JOIN cs{k} ON cs{k}.y = p.y
        JOIN tc ON tc.y = p.y
    )"""
        )
        prev = f"c{k}"
    return f"""
    WITH early AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS c
        FROM orders WHERE o_orderdate < {_IPF_CUT}
        GROUP BY 1, 2
    ), tr AS (
        SELECT o_orderpriority AS x, COUNT(*) AS t
        FROM orders WHERE o_orderdate >= {_IPF_CUT}
        GROUP BY 1
    ), tc AS (
        SELECT o_orderstatus AS y, COUNT(*) AS t
        FROM orders WHERE o_orderdate >= {_IPF_CUT}
        GROUP BY 1
    ), w0 AS (
        SELECT x, y, c * 1000000 AS w FROM early
    ), {", ".join(steps)}
    SELECT f.x AS priority, f.y AS status,
           CAST(e.c AS BIGINT) AS early_count,
           CAST(tr.t AS BIGINT) AS row_target,
           CAST(tc.t AS BIGINT) AS col_target,
           CAST(f.w AS BIGINT) AS raked_e6
    FROM c{_IPF_ITERS} f
    JOIN early e ON e.x = f.x AND e.y = f.y
    JOIN tr ON tr.x = f.x
    JOIN tc ON tc.y = f.y
    ORDER BY priority, status
    """


@register("agg_raking_ipf", oracle=_oracle_raking_ipf())
def agg_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative proportional fitting (Deming–Stephan 1940,
    public) — the survey-calibration / drift-correction workhorse:
    rescale the EARLY period's (priority × status) order-count table so
    its row and column margins match the LATE period's, preserving the
    early table's interaction structure.  Three row+column sweeps; each
    sweep multiplies every cell by target/current-margin.  This is how
    a pipeline reweights last quarter's stratified sample to this
    quarter's composition without re-sampling.

    Exactness: weights are e6 integers; each rescale is ONE exact
    integer multiply-divide (w·t·1e6 // margin-sum) through the
    int128/DECIMAL(38,0) carry — no float ratio ever exists, so the
    unrolled DuckDB twin matches bit-for-bit and the truncation path
    (≤1 e6-unit per sweep) is identical on both engines.  The pytest
    proves the raking LAW: achieved margins converge to the targets
    within integer-truncation tolerance.

    Scale notes: TWO corpus aggregates (early cells, late margins) —
    the margins are grouped-rollup-sized (|priorities| + |statuses|)
    and every sweep runs entirely on the ≤|X|·|Y|-row cell frame
    (margin sums + rescale joins on a 15-row frame at any corpus
    size)."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("date")
    early = (
        o.where(F.col("o_orderdate") < cut)
        .groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    late = o.where(F.col("o_orderdate") >= cut)
    tr = late.groupBy(F.col("o_orderpriority").alias("x")).agg(
        F.count(F.lit(1)).alias("tr")
    )
    tc = late.groupBy(F.col("o_orderstatus").alias("y")).agg(
        F.count(F.lit(1)).alias("tc")
    )
    w = early.select("x", "y", (F.col("c") * 1000000).alias("w"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    for _ in range(_IPF_ITERS):
        w = (
            w.withColumn("s", F.sum("w").over(wx))
            .join(F.broadcast(tr), "x")
            .select(
                "x",
                "y",
                F.expr(
                    "CAST(CAST(w AS DECIMAL(38,0)) * tr * 1000000 div s"
                    " AS BIGINT)"
                ).alias("w"),
            )
        )
        w = (
            w.withColumn("s", F.sum("w").over(wy))
            .join(F.broadcast(tc), "y")
            .select(
                "x",
                "y",
                F.expr(
                    "CAST(CAST(w AS DECIMAL(38,0)) * tc * 1000000 div s"
                    " AS BIGINT)"
                ).alias("w"),
            )
        )
    return (
        w.join(early, ["x", "y"])
        .join(F.broadcast(tr), "x")
        .join(F.broadcast(tc), "y")
        .select(
            F.col("x").alias("priority"),
            F.col("y").alias("status"),
            F.col("c").cast("long").alias("early_count"),
            F.col("tr").cast("long").alias("row_target"),
            F.col("tc").cast("long").alias("col_target"),
            F.col("w").cast("long").alias("raked_e6"),
        )
        .orderBy("priority", "status")
    )


@register(
    "agg_negbin_overdispersion",
    # Method-of-moments negative-binomial dispersion over daily counts:
    # alpha = (var - mean)/mean^2 collapses to ONE integer-ratio
    # division — (d·Σc² − (Σc)² − d·Σc) / (Σc)² — every operand exact
    # (d²-scalings cancel), ROUND(6) terminal.
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), agg AS (
        SELECT event_type,
               COUNT(*) AS n_days,
               SUM(c) AS total,
               SUM(CAST(c AS HUGEINT) * c) AS sum_sq
        FROM daily GROUP BY 1
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(total AS BIGINT) AS total,
           CAST(total * 1000000 // n_days AS BIGINT) AS mean_e6,
           ROUND(CAST(n_days * sum_sq - CAST(total AS HUGEINT) * total
                      - n_days * CAST(total AS HUGEINT) AS DOUBLE)
                 / CAST(CAST(total AS HUGEINT) * total AS DOUBLE), 6)
             AS dispersion,
           CASE WHEN n_days * sum_sq - CAST(total AS HUGEINT) * total
                     - n_days * CAST(total AS HUGEINT) > 0
                THEN 1 ELSE 0 END AS overdispersed
    FROM agg
    ORDER BY event_type
    """,
)
def agg_negbin_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial overdispersion diagnostic (method of moments):
    per event type, is the daily-count variance larger than a Poisson
    process allows?  α = (var − mean)/mean² — the NB2 dispersion
    parameter; α ≈ 0 means Poisson is adequate, α > 0 says the count
    model (and every anomaly threshold built on it —
    `events_anomaly_mad`, `events_burst_hysteresis`) needs the
    heavier-tailed family.  The readout that decides which alert model
    a volume monitor fits.  Dispersion is over OBSERVED (type, day)
    rows — a type with zero-event days understates burstiness; join a
    calendar spine first when absence matters (resample_locf's spine
    recipe).

    Exactness: with d days, c_t counts, α collapses algebraically to
    (d·Σc² − (Σc)² − d·Σc) / (Σc)² — the d² scalings cancel — so BOTH
    the sign test (overdispersed flag, pure integers) and the ratio
    (one terminal IEEE division, ROUND(6)) are engine-exact; Σc² rides
    the int128/DECIMAL(38,0) carry (1e9-events/day corpora square past
    int64).  Fixture: uniform-random event days are near-Poisson, so α
    wobbles in a small-sample band around 0 (probed |α| ≤ ~0.1 at
    sf0.001, sign noise included); the pytest pins the integer
    identities here and plants a 3-day burst corpus, asserting every
    type fires the flag with α > 1 — an order of magnitude past the
    null band.

    Scale notes: ONE hash aggregate to the (type, day) rollup, ONE to
    the per-type moment frame — both bounded; no windows at all."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("total"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sum_sq"),
    )
    num = F.expr(
        "n_days * sum_sq - CAST(total AS DECIMAL(38,0)) * total"
        " - n_days * CAST(total AS DECIMAL(38,0))"
    )
    return agg.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("total").cast("long").alias("total"),
        F.expr("total * 1000000 div n_days").cast("long").alias("mean_e6"),
        F.round(
            num.cast("double")
            / F.expr("CAST(CAST(total AS DECIMAL(38,0)) * total AS DOUBLE)"),
            6,
        ).alias("dispersion"),
        F.when(num > 0, 1).otherwise(0).alias("overdispersed"),
    ).orderBy("event_type")


#: Gumbel method-of-moments literals (the periodogram/SPRT literal
#: rule): √6/π and the Euler–Mascheroni constant, Python-computed once
#: and shared verbatim by both engines.
_GUMBEL_SQRT6_PI = 0.779696801233676
_GUMBEL_EULER = 0.5772156649015329


@register(
    "agg_gumbel_peak_fit",
    # Gumbel fit of daily peak hourly volume per event type: block
    # maxima = the max hourly count within each day; method of
    # moments: beta = std*sqrt(6)/pi, mu = mean - gamma*beta.  Moments
    # come from exact integer sums (d-scalings explicit); the two
    # terminal float expressions are identical on both engines,
    # ROUND(4).
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               date_part('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2, 3
    ), blockmax AS (
        SELECT event_type, d, MAX(c) AS m FROM hourly GROUP BY 1, 2
    ), mom AS (
        SELECT event_type,
               COUNT(*) AS k,
               SUM(m) AS s1,
               SUM(CAST(m AS HUGEINT) * m) AS s2
        FROM blockmax GROUP BY 1
    )
    SELECT event_type,
           CAST(k AS BIGINT) AS n_blocks,
           CAST(s1 AS BIGINT) AS sum_max,
           ROUND(sqrt(CAST(k * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
                 / k * {_GUMBEL_SQRT6_PI!r}, 4) AS beta,
           ROUND(CAST(s1 AS DOUBLE) / k
                 - {_GUMBEL_EULER!r}
                   * (sqrt(CAST(k * s2 - CAST(s1 AS HUGEINT) * s1
                               AS DOUBLE))
                      / k * {_GUMBEL_SQRT6_PI!r}), 4) AS mu
    FROM mom
    ORDER BY event_type
    """,
)
def agg_gumbel_peak_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV-I) fit of daily PEAK hourly volume per event type —
    the extreme-value capacity-planning readout: block maxima (the
    busiest hour of each day) follow a Gumbel law under classical EVT,
    and the fitted (μ, β) turn directly into return levels ("the hourly
    peak exceeded once per N days is μ − β·ln(−ln(1−1/N))") — what a
    rate-limit or autoscaling ceiling should be set from, rather than
    a mean + k·σ guess (peaks are NOT normal; `stream_autoscale_signal`
    consumes exactly this kind of ceiling).

    Exactness: block maxima and both moment sums are exact integers
    (k·Σm² − (Σm)² rides the int128 carry); β = std·√6/π and
    μ = mean − γ·β use Python-computed literals for √6/π and γ (the
    periodogram/SPRT literal rule — no irrational constant is ever
    computed in SQL), with the identical float expression on both
    engines, ROUND(4).

    Scale notes: ONE hash aggregate to the (type, day, hour) rollup,
    one to the (type, day) block-max frame, one to the per-type moment
    frame — all calendar-bounded; no windows."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.to_date("ts").alias("d"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    blockmax = hourly.groupBy("event_type", "d").agg(F.max("c").alias("m"))
    mom = blockmax.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("m").alias("s1"),
        F.sum(F.expr("CAST(m AS DECIMAL(38,0)) * m")).alias("s2"),
    )
    spread = F.sqrt(
        F.expr("CAST(k * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)")
    )
    beta = spread / F.col("k") * _GUMBEL_SQRT6_PI
    return mom.select(
        "event_type",
        F.col("k").cast("long").alias("n_blocks"),
        F.col("s1").cast("long").alias("sum_max"),
        F.round(beta, 4).alias("beta"),
        F.round(
            F.col("s1").cast("double") / F.col("k") - _GUMBEL_EULER * beta, 4
        ).alias("mu"),
    ).orderBy("event_type")


#: Additive Holt–Winters smoothing constants and the 30-day analysis
#: window (the fixture's full event span; a production run regenerates
#: the filter for its own window — it stays a literal dim).
_HW_ALPHA, _HW_BETA, _HW_GAMMA = 0.3, 0.1, 0.2
_HW_T = 30
_HW_SEASON = 7
_HW_HORIZONS = 7


def _hw_filter() -> list[tuple[int, int, int]]:
    """(horizon, day-index j, coefficient·1e12) rows of the additive
    Holt–Winters forecast as a LINEAR FILTER of the last 30 daily
    counts — the `events_holt_forecast` impulse-response recipe
    extended to the seasonal recursion: with fixed (α, β, γ) every
    state is a fixed linear combination of y_0..y_29, so the whole
    triple recursion (level/trend/seasonal, classic two-week init)
    collapses to ONE e12-integer dot product per horizon.  Exact in
    any accumulation order; no float recursion ever executes in either
    engine."""
    a, b_, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    T, S = _HW_T, _HW_SEASON
    # coefficient vectors over y_0..y_{T-1}
    def vec():
        return [0.0] * T

    l = vec()
    for j in range(S):
        l[j] = 1.0 / S
    b = vec()
    for j in range(S):
        b[j + S] += 1.0 / (S * S)
        b[j] -= 1.0 / (S * S)
    s = []
    for p in range(S):
        sp = vec()
        sp[p] = 1.0
        for j in range(S):
            sp[j] -= 1.0 / S
        s.append(sp)
    for t in range(S, T):
        p = t % S
        y_t = vec()
        y_t[t] = 1.0
        l_new = [
            a * (y_t[j] - s[p][j]) + (1 - a) * (l[j] + b[j]) for j in range(T)
        ]
        b_new = [
            b_ * (l_new[j] - l[j]) + (1 - b_) * b[j] for j in range(T)
        ]
        s[p] = [
            g * (y_t[j] - l_new[j]) + (1 - g) * s[p][j] for j in range(T)
        ]
        l, b = l_new, b_new
    rows = []
    for h in range(1, _HW_HORIZONS + 1):
        slot = (T - 1 + h) % S
        for j in range(T):
            c = l[j] + h * b[j] + s[slot][j]
            rows.append((h, j, round(c * 1e12)))
    return rows


def _oracle_holt_winters() -> str:
    values = ",\n        ".join(
        f"({h}, {j}, {c})" for h, j, c in _hw_filter()
    )
    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
    ), idx AS (
      SELECT {_HW_T} - 1 - datediff('day', d, MAX(d) OVER ()) AS j, c
      FROM daily
    ), w(h, j, coef_e12) AS (
      VALUES {values}
    )
    SELECT CAST(w.h AS BIGINT) AS horizon,
           CAST(({_HW_T} - 1 + w.h) % {_HW_SEASON} AS BIGINT) AS season_slot,
           ROUND(CAST(SUM(CAST(w.coef_e12 AS HUGEINT) * idx.c) AS DOUBLE)
                 / 1e12, 2) AS forecast
    FROM w JOIN idx ON idx.j = w.j
    GROUP BY w.h
    ORDER BY horizon
    """


@register("events_holt_winters_forecast", oracle=_oracle_holt_winters())
def events_holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters (triple-exponential) forecast of the daily
    event count, horizons 1..7 with weekly seasonality — the seasonal
    member `events_holt_forecast` (level+trend) and
    `events_stl_decompose` (descriptive) both point at: the standard
    short-horizon volume forecaster when the series has a weekly
    rhythm.  α=0.3, β=0.1, γ=0.2, classic two-week initialization.

    Exactness: the whole (level, trend, 7 seasonal slots) recursion is
    LINEAR in the observations, so it is precomputed in Python as one
    impulse-response coefficient vector per horizon (`_hw_filter` — the
    `events_holt_forecast` recipe extended to the seasonal state) and
    shipped as a 210-row e12-integer literal dim to BOTH engines: each
    forecast is one exact integer dot product (int128 carry — daily
    counts up to ~1e9 stay exact), one terminal division, ROUND(2).
    No float recursion executes in either engine.

    Fixture: no weekly cycle exists (the seasonal coefficients fit
    noise — an honest flat-seasonal fit); the pytest recomputes the
    recursion directly in numpy and pins equality, and plants a 7-day
    cycle asserting the forecast tracks the phase (high-phase horizons
    forecast higher than low-phase ones).

    Scale notes: ONE hash aggregate to the ≤31-row daily rollup; the
    filter join is a broadcast 210-row literal dim against that rollup
    (reviewed SINGLE/NLJ)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_all = Window.partitionBy()
    # j indexes from the series END (ADVICE r10: the filter consumes the
    # LAST 30 daily counts — the newest observation is j = T-1; days
    # older than the window land at j < 0 and fall out of the join).
    idx = daily.select(
        (
            F.lit(_HW_T - 1)
            - F.datediff(F.max("d").over(w_all), F.col("d"))
        ).alias("j"),
        "c",
    )
    coeffs = spark.createDataFrame(
        _hw_filter(), "h long, j long, coef_e12 long"
    )
    return (
        idx.join(F.broadcast(coeffs), "j")
        .groupBy("h")
        .agg(
            F.round(
                F.sum(
                    F.expr("CAST(coef_e12 AS DECIMAL(38,0)) * c")
                ).cast("double")
                / 1e12,
                2,
            ).alias("forecast")
        )
        .select(
            F.col("h").cast("long").alias("horizon"),
            ((F.lit(_HW_T - 1) + F.col("h")) % _HW_SEASON)
            .cast("long")
            .alias("season_slot"),
            "forecast",
        )
        .orderBy("horizon")
    )


@register(
    "events_hodges_lehmann_daily",
    # Hodges–Lehmann pseudo-median of the daily counts per event type:
    # the median of all n(n+1)/2 Walsh averages (x_i + x_j)/2, i <= j.
    # Walsh sums stay 2-SCALED integers (x_i + x_j, no division), the
    # median is rank-selected on integers (lower median for even
    # counts), and only the final /2 produces a decimal — .0 or .5
    # exactly, ROUND(1)-stable on both engines.
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.event_type, a.c + b.c AS w2
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d >= a.d
    ), ranked AS (
        SELECT event_type, w2,
               row_number() OVER (PARTITION BY event_type ORDER BY w2)
                 AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS m
        FROM pairs
    ), med AS (
        SELECT event_type, w2 AS hl2, m
        FROM ranked WHERE rk = (m + 1) // 2
    ), plain AS (
        SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type ORDER BY c)
                 AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ), pmed AS (
        SELECT event_type, c AS med FROM plain WHERE rk = (n + 1) // 2
    )
    SELECT m.event_type AS event_type,
           CAST(m.m AS BIGINT) AS n_walsh,
           ROUND(CAST(m.hl2 AS DOUBLE) / 2, 1) AS hodges_lehmann,
           CAST(p.med AS BIGINT) AS plain_median
    FROM med m JOIN pmed p ON p.event_type = m.event_type
    ORDER BY event_type
    """,
)
def events_hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann pseudo-median (1963, public) of daily event
    volume per type — the robust location estimator between the median
    (50% breakdown, low efficiency) and the mean (efficient, 0%
    breakdown): the median of all pairwise Walsh averages has ~96%
    Gaussian efficiency at a 29% breakdown point, which is why R's
    wilcox.test confidence intervals are built on it.  Reported beside
    the plain median so the two robust centers can be compared.

    Exactness: Walsh sums stay 2-scaled integers (x_i + x_j, never
    divided), the median is integer rank selection (lower median), and
    the single /2 at the surface yields exactly .0 or .5 — ROUND(1) is
    decorative.  The pair grid is the `agg_theilsen_trend` posture:
    C(31, 2)+31 ≈ 500 pairs per type over the CALENDAR rollup, bounded
    at any corpus size (reviewed SINGLE).

    Scale notes: ONE corpus agg to the (type, day) rollup; the Walsh
    grid, both rank windows and the final join all run on
    calendar-bounded frames."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a = daily.select("event_type", F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("d").alias("db"),
        F.col("c").alias("cb"),
    )
    pairs = a.join(
        b, (F.col("event_type") == F.col("et_b")) & (F.col("db") >= F.col("da"))
    ).select("event_type", (F.col("ca") + F.col("cb")).alias("w2"))
    w_rank = Window.partitionBy("event_type").orderBy("w2")
    w_cnt = Window.partitionBy("event_type")
    med = (
        pairs.select(
            "event_type",
            "w2",
            F.row_number().over(w_rank).alias("rk"),
            F.count(F.lit(1)).over(w_cnt).alias("m"),
        )
        .where(F.col("rk") == F.expr("(m + 1) div 2"))
        .select("event_type", F.col("w2").alias("hl2"), "m")
    )
    wp_rank = Window.partitionBy("event_type").orderBy("c")
    pmed = (
        daily.select(
            "event_type",
            "c",
            F.row_number().over(wp_rank).alias("rk"),
            F.count(F.lit(1)).over(w_cnt).alias("n"),
        )
        .where(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("c").alias("med"))
    )
    return (
        med.join(pmed, "event_type")
        .select(
            "event_type",
            F.col("m").cast("long").alias("n_walsh"),
            F.round(F.col("hl2").cast("double") / 2, 1).alias(
                "hodges_lehmann"
            ),
            F.col("med").cast("long").alias("plain_median"),
        )
        .orderBy("event_type")
    )


@register(
    "events_runs_test",
    # Wald–Wolfowitz runs test on the sign of day-over-day volume
    # deltas: R = observed sign runs; E[R] = 2·n₊·n₋/n + 1;
    # Var[R] = (E[R]−1)(E[R]−2)/(n−1).  Counts and the run total are
    # exact integers; E and Var are rationals of integers assembled
    # with the identical float expression on both engines, ROUND(4).
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
    ), delta AS (
        SELECT d, c - LAG(c) OVER (ORDER BY d) AS dx FROM daily
    ), signs AS (
        SELECT d, CASE WHEN dx > 0 THEN 1 ELSE 0 END AS s
        FROM delta WHERE dx IS NOT NULL AND dx <> 0
    ), flips AS (
        SELECT s,
               CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                    OR LAG(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0
               END AS new_run
        FROM signs
    ), agg AS (
        SELECT SUM(new_run) AS r,
               SUM(s) AS n_up,
               SUM(1 - s) AS n_down,
               COUNT(*) AS n
        FROM flips
    )
    SELECT CAST(n AS BIGINT) AS n_moves,
           CAST(n_up AS BIGINT) AS n_up,
           CAST(n_down AS BIGINT) AS n_down,
           CAST(r AS BIGINT) AS n_runs,
           ROUND(2.0 * n_up * n_down / n + 1, 4) AS expected_runs,
           ROUND((r - (2.0 * n_up * n_down / n + 1))
                 / sqrt((2.0 * n_up * n_down / n + 1 - 1)
                        * (2.0 * n_up * n_down / n + 1 - 2)
                        / (n - 1)), 4) AS z
    FROM agg
    """,
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test (1940, public) on the SIGNS of
    day-over-day volume deltas — the randomness check behind
    `events_cusum_drift` and `events_sprt_purchase_rate`: too FEW runs
    means the series trends/sticks (autocorrelation), too MANY means it
    oscillates (over-correction); |z| < 1.96 is consistent with
    independent moves.  Zero deltas are excluded (the standard
    treatment); the fixture's uniform-random days are an honest null.

    Exactness: run/up/down counts are exact integers from two ordered
    windows over the daily rollup; E[R] = 2n₊n₋/n + 1 and its variance
    are assembled with the identical float expression on both engines,
    ROUND(4)-absorbed.  The pytest plants a strictly alternating and a
    single-trend series through the same arithmetic and asserts the z
    sign flips accordingly.

    Scale notes: ONE corpus agg to the ≤31-row daily rollup; both
    lag windows and the final 1-row aggregate run on it (reviewed
    SINGLE)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("d")
    delta = daily.select("d", (F.col("c") - F.lag("c").over(w)).alias("dx"))
    signs = delta.where(
        F.col("dx").isNotNull() & (F.col("dx") != 0)
    ).select("d", F.when(F.col("dx") > 0, 1).otherwise(0).alias("s"))
    flips = signs.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = flips.agg(
        F.sum("new_run").alias("r"),
        F.sum("s").alias("n_up"),
        F.sum(1 - F.col("s")).alias("n_down"),
        F.count(F.lit(1)).alias("n"),
    )
    er = 2.0 * F.col("n_up") * F.col("n_down") / F.col("n") + 1
    return agg.select(
        F.col("n").cast("long").alias("n_moves"),
        F.col("n_up").cast("long").alias("n_up"),
        F.col("n_down").cast("long").alias("n_down"),
        F.col("r").cast("long").alias("n_runs"),
        F.round(er, 4).alias("expected_runs"),
        F.round(
            (F.col("r") - er) / F.sqrt((er - 1) * (er - 2) / (F.col("n") - 1)),
            4,
        ).alias("z"),
    )


@register(
    "agg_kruskal_wallis",
    # Kruskal–Wallis rank test (1952, public) across event types over
    # daily counts.  Pooled mid-ranks carried as 2-SCALED integers
    # (r2 = lo + hi of each tie block = 2·RANK + ties − 1 — never a
    # fractional rank); the per-group Σ(R2²/4n) term is e12-floored
    # through exact HUGEINT arithmetic (identical integers on both
    # engines — the floor residue cancels cross-engine); H and the tie
    # correction are deterministic double compositions of those exact
    # integers, ROUND(4)-terminal.
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, c,
               2 * RANK() OVER (ORDER BY c)
                 + COUNT(*) OVER (PARTITION BY c) - 1 AS r2
        FROM daily
    ), grp AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(r2) AS BIGINT) AS rank_sum_x2
        FROM ranked GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_days) AS BIGINT) AS n,
               CAST(SUM(CAST(rank_sum_x2 AS HUGEINT) * rank_sum_x2
                        * 1000000000000 // (4 * n_days)) AS BIGINT)
                 AS s_e12,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM grp
    ), ties AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS t_term
        FROM (SELECT COUNT(*) AS t FROM daily GROUP BY c)
    )
    SELECT g.event_type, g.n_days, g.rank_sum_x2,
           t.n AS n_total, t.k - 1 AS df,
           ROUND((CAST(t.s_e12 AS DOUBLE) * 12 / 1e12 / (t.n * (t.n + 1))
                  - 3 * (t.n + 1))
                 / (1 - CAST(s.t_term AS DOUBLE)
                        / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)), 4)
             AS h_stat
    FROM grp g CROSS JOIN tot t CROSS JOIN ties s
    ORDER BY event_type
    """,
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis one-way rank ANOVA across event types on daily
    volume — the k-group extension of `agg_mannwhitney_u`: do the k
    daily-count distributions share a location, without normality
    assumptions?  H = [12/(N(N+1)) Σ R_i²/n_i − 3(N+1)] / (1 − ΣT/(N³−N))
    with mid-ranks for ties (the tie-corrected form) — χ²(k−1) under
    the null.  Fixture event types draw the same traffic, so H sits at
    the null; the planted-effect pytest shifts one group's counts and
    recovers a large H (the law the oracle cannot check).

    Exactness: mid-ranks ride as 2-scaled integers (lo+hi of the tie
    block); Σ R2²/(4n) is e12-floored HUGEINT/DECIMAL(38,0) arithmetic
    (R2²·1e12 ≈ 9e19 overflows int64 — the r10 hazard class); both
    engines floor identical integers so the quantization cancels; the
    terminal H is one deterministic double composition, ROUND(4).

    Scale notes: ONE corpus agg to the ≤155-row (type, day) rollup;
    the pooled-rank window and the two scalar frames live on that
    bounded calendar frame (reviewed SINGLE class — same posture as
    `agg_theilsen_trend`'s pair grid)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    w_rank = Window.orderBy("c")
    w_tie = Window.partitionBy("c")
    ranked = daily.select(
        "event_type",
        "c",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("r2"),
    )
    grp = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("r2").cast("long").alias("rank_sum_x2"),
    )
    tot = grp.agg(
        F.sum("n_days").cast("long").alias("n"),
        F.sum(
            F.expr(
                "CAST(rank_sum_x2 AS DECIMAL(38,0)) * rank_sum_x2"
                " * 1000000000000 div (4 * n_days)"
            )
        )
        .cast("long")
        .alias("s_e12"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ties = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            )
            .cast("long")
            .alias("t_term")
        )
    )
    h = F.round(
        (
            F.col("s_e12").cast("double") * 12 / 1e12
            / (F.col("n") * (F.col("n") + 1))
            - 3 * (F.col("n") + 1)
        )
        / (
            1
            - F.col("t_term").cast("double")
            / (
                F.col("n").cast("double") * F.col("n") * F.col("n")
                - F.col("n")
            )
        ),
        4,
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            "event_type",
            "n_days",
            "rank_sum_x2",
            F.col("n").alias("n_total"),
            (F.col("k") - 1).alias("df"),
            h.alias("h_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_mann_kendall",
    # Mann–Kendall monotone-trend test (public) per event type over the
    # daily series: S = Σ_{i<j} sign(c_j − c_i) is an exact integer on
    # the ≤C(31,2) calendar pair grid; the tie-corrected variance rides
    # as the exact integer 18·Var(S); z applies the standard ±1
    # continuity correction through one deterministic sqrt (IEEE —
    # correctly rounded, engine-identical), ROUND(4).
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d > a.d
        GROUP BY 1
    ), n AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ), ties AS (
        SELECT event_type,
               CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, COUNT(*) AS t
              FROM daily GROUP BY event_type, c)
        GROUP BY 1
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - COALESCE(t.tie_term, 0) AS BIGINT) AS var18,
           ROUND(CASE
                   WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                        / sqrt((CAST(n.n_days AS DOUBLE) * (n.n_days - 1)
                                * (2 * n.n_days + 5)
                                - COALESCE(t.tie_term, 0)) / 18)
                   WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                        / sqrt((CAST(n.n_days AS DOUBLE) * (n.n_days - 1)
                                * (2 * n.n_days + 5)
                                - COALESCE(t.tie_term, 0)) / 18)
                   ELSE 0.0
                 END, 4) AS z_mk
    FROM n JOIN s ON s.event_type = n.event_type
    LEFT JOIN ties t ON t.event_type = n.event_type
    ORDER BY n.event_type
    """,
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type — the SIGNIFICANCE member
    of the robust-trend family (`agg_theilsen_trend` estimates the
    slope; this says whether a monotone trend exists at all): S counts
    concordant-minus-discordant day pairs, Var(S) carries the standard
    tie correction, and z applies the ±1 continuity correction.  The
    fixture's one-month event volume is trendless (honest null, |z|
    small); the planted-effect pytest feeds a strictly increasing
    series and recovers z ≫ 1.96, and a decreasing one for the sign.

    Exactness: S and 18·Var(S) are exact integers off the calendar
    rollup; z is one IEEE sqrt + division on identical doubles,
    ROUND(4)-terminal.

    Scale notes: ONE corpus agg to the (type, day) rollup; the pair
    grid is C(≤31, 2) per type ON THE CALENDAR (the `agg_theilsen_trend`
    posture — bounded at any corpus size, reviewed bounded-domain
    join)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select(
        F.col("event_type").alias("et"),
        F.col("d").alias("da"),
        F.col("c").alias("ca"),
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("d").alias("db"),
        F.col("c").alias("cb"),
    )
    s = (
        a.join(b, "et")
        .where(F.col("db") > F.col("da"))
        .groupBy(F.col("et").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    ).cast("long")
    sd = F.sqrt(
        (
            F.col("n_days").cast("double")
            * (F.col("n_days") - 1)
            * (2 * F.col("n_days") + 5)
            - F.coalesce(F.col("tie_term"), F.lit(0))
        )
        / 18
    )
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            var18.alias("var18"),
            F.round(z, 4).alias("z_mk"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_friedman_test",
    # Friedman blocked rank ANOVA (1937; tie-corrected Conover form,
    # public) — blocks = calendar days, treatments = event types, response
    # = daily event count.  The (type, day) grid is DENSIFIED (missing
    # cells ride as 0) so every block is complete by construction; within-
    # block mid-ranks are 2-SCALED integers (r2 = 2·RANK + ties − 1);
    # Σ(R2_j − n(k+1))², ΣΣr2² and nk(k+1)² are exact integers on the
    # bounded k×n grid, so Q is ONE double division of two exact integers,
    # ROUND(4)-terminal — zero libm anywhere.
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), grid AS (
        SELECT t.event_type, dd.d, COALESCE(x.c, 0) AS c
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (SELECT DISTINCT d FROM daily) dd
        LEFT JOIN daily x ON x.event_type = t.event_type AND x.d = dd.d
    ), ranked AS (
        SELECT event_type, c,
               2 * RANK() OVER (PARTITION BY d ORDER BY c)
                 + COUNT(*) OVER (PARTITION BY d, c) - 1 AS r2
        FROM grid
    ), tr AS (
        SELECT event_type, CAST(SUM(r2) AS BIGINT) AS rank_sum_x2
        FROM ranked GROUP BY 1
    ), dims AS (
        SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
               CAST(COUNT(*) // COUNT(DISTINCT event_type) AS BIGINT) AS n,
               CAST(SUM(r2 * r2) AS BIGINT) AS a2_4
        FROM ranked
    ), dev AS (
        SELECT CAST(SUM((t.rank_sum_x2 - m.n * (m.k + 1))
                        * (t.rank_sum_x2 - m.n * (m.k + 1))) AS BIGINT)
                 AS dev2
        FROM tr t CROSS JOIN dims m
    )
    SELECT t.event_type, t.rank_sum_x2,
           CAST(m.n AS BIGINT) AS n_blocks, m.k - 1 AS df,
           ROUND((m.k - 1) * v.dev2
                 / CAST(m.a2_4 - m.n * m.k * (m.k + 1) * (m.k + 1)
                        AS DOUBLE), 4) AS q_stat
    FROM tr t CROSS JOIN dims m CROSS JOIN dev v
    ORDER BY t.event_type
    """,
)
def agg_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman two-way rank ANOVA — the BLOCKED member of the rank-test
    family: `agg_kruskal_wallis` pools all days into one ranking; this
    one ranks WITHIN each day (block) and asks whether the k event types
    hold consistent rank positions across days, which removes day-level
    volume shifts (weekend dips, launch spikes) from the comparison
    entirely.  Tie-corrected Conover form Q = (k−1)·Σ_j(R_j − n(k+1)/2)²
    / (A1 − nk(k+1)²/4), χ²(k−1) under the null; missing (type, day)
    cells enter as 0 so blocks are complete by construction.  The
    fixture's five types draw iid traffic, so Q sits at the null
    (≈0.79 at sf0.01); the planted-effect pytest shifts one type's
    counts consistently across blocks and recovers Q near its
    consistency ceiling n(k−1) (the law the oracle cannot check).

    Exactness: within-block mid-ranks are 2-scaled integers (lo+hi of
    the tie block — never fractional); R2_j, ΣΣr2², the squared
    deviations and nk(k+1)² are exact integers bounded by the k×n grid
    (r2 ≤ 2k ≤ 10 — no overflow at any corpus size); Q is one double
    division of two exact integers, ROUND(4)-terminal.

    Scale notes: ONE corpus agg to the ≤155-row (type, day) rollup;
    the densifying grid is |types|×|days| (bounded by calendar ×
    event-type vocabulary); ranking windows are PARTITIONED BY day
    (never single-partition); the three scalar frames are broadcast
    1-row crosses."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    types = daily.select("event_type").distinct()
    days = daily.select("d").distinct()
    grid = (
        types.crossJoin(days)
        .join(daily, ["event_type", "d"], "left")
        .select(
            "event_type", "d", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    w_rank = Window.partitionBy("d").orderBy("c")
    w_tie = Window.partitionBy("d", "c")
    ranked = grid.select(
        "event_type",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("r2"),
    )
    tr = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("rank_sum_x2")
    )
    dims = ranked.agg(
        F.countDistinct("event_type").cast("long").alias("k"),
        F.expr(
            "CAST(COUNT(1) div COUNT(DISTINCT event_type) AS BIGINT)"
        ).alias("n"),
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("a2_4"),
    )
    dev = (
        tr.crossJoin(F.broadcast(dims))
        .select(
            (
                (F.col("rank_sum_x2") - F.col("n") * (F.col("k") + 1))
                * (F.col("rank_sum_x2") - F.col("n") * (F.col("k") + 1))
            ).alias("d2")
        )
        .agg(F.sum("d2").cast("long").alias("dev2"))
    )
    q = F.round(
        (F.col("k") - 1)
        * F.col("dev2")
        / (
            F.col("a2_4")
            - F.col("n")
            * F.col("k")
            * (F.col("k") + 1)
            * (F.col("k") + 1)
        ).cast("double"),
        4,
    )
    return (
        tr.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(dev))
        .select(
            "event_type",
            "rank_sum_x2",
            F.col("n").alias("n_blocks"),
            (F.col("k") - 1).alias("df"),
            q.alias("q_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_jonckheere_terpstra",
    # Jonckheere–Terpstra ordered-alternative rank test (1954, public):
    # does quantity shift MONOTONICALLY across the 11 ordered discount
    # levels?  2J = Σ_{g<g'} (2·#{x<y} + #{x=y}) rides as an exact
    # HUGEINT/DECIMAL(38,0) via the bounded 11×50 contingency-cell
    # cross product (never a row-pair join); E[2J] = (N² − Σn_i²)/2 is
    # exact (the difference is even by construction); the tie-corrected
    # Hollander–Wolfe variance A/72 + B/(36N(N−1)(N−2)) + C/(8N(N−1))
    # composes exact DECIMAL moment sums in identically-associated
    # doubles; z is one IEEE sqrt + division, ROUND(4).
    oracle="""
    WITH cells AS (
      SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS g,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), j2 AS (
      SELECT SUM(CAST(a.cnt AS HUGEINT) * b.cnt *
                 (CASE WHEN a.v < b.v THEN 2
                       WHEN a.v = b.v THEN 1 ELSE 0 END)) AS j2
      FROM cells a JOIN cells b ON a.g < b.g
    ), grp AS (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM cells GROUP BY 1
    ), gm AS (
      SELECT CAST(SUM(n_rows) AS HUGEINT) AS n,
             SUM(CAST(n_rows AS HUGEINT) * n_rows) AS sn2,
             SUM(CAST(n_rows AS HUGEINT) * (n_rows - 1)
                 * (2 * n_rows + 5)) AS sg1,
             SUM(CAST(n_rows AS HUGEINT) * (n_rows - 1)
                 * (n_rows - 2)) AS sg2,
             SUM(CAST(n_rows AS HUGEINT) * (n_rows - 1)) AS sg3
      FROM grp
    ), vm AS (
      SELECT SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS sv1,
             SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS sv2,
             SUM(CAST(t AS HUGEINT) * (t - 1)) AS sv3
      FROM (SELECT v, CAST(SUM(cnt) AS BIGINT) AS t
            FROM cells GROUP BY v)
    ), stat AS (
      SELECT CAST(j.j2 * 1000000 // (m.n * m.n - m.sn2) AS BIGINT)
               AS jt_u_ppm,
             CAST(m.n AS BIGINT) AS n_total,
             ROUND(
               CAST(j.j2 - (m.n * m.n - m.sn2) // 2 AS DOUBLE)
               / (2 * sqrt(
                   (CAST(m.n AS DOUBLE) * (CAST(m.n AS DOUBLE) - 1)
                    * (2 * CAST(m.n AS DOUBLE) + 5)
                    - CAST(m.sg1 AS DOUBLE) - CAST(v.sv1 AS DOUBLE)) / 72
                   + CAST(m.sg2 AS DOUBLE) * CAST(v.sv2 AS DOUBLE)
                     / (36 * CAST(m.n AS DOUBLE)
                        * (CAST(m.n AS DOUBLE) - 1)
                        * (CAST(m.n AS DOUBLE) - 2))
                   + CAST(m.sg3 AS DOUBLE) * CAST(v.sv3 AS DOUBLE)
                     / (8 * CAST(m.n AS DOUBLE)
                        * (CAST(m.n AS DOUBLE) - 1)))), 4) AS z_jt
      FROM j2 j CROSS JOIN gm m CROSS JOIN vm v
    )
    SELECT g.g AS disc_pct, g.n_rows, s.jt_u_ppm, s.z_jt, s.n_total
    FROM grp g CROSS JOIN stat s
    ORDER BY disc_pct
    """,
)
def agg_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra test for an ORDERED alternative — does
    quantity shift monotonically as the discount level rises?  Where
    `agg_kruskal_wallis` asks 'do the k groups differ at all', JT asks
    the sharper ordered question and gains power when the truth is a
    dose-response trend (here: 'do bigger discounts move bigger
    quantities?').  2J pools the pairwise Mann–Whitney counts over
    ordered group pairs; jt_u_ppm = 2J/(N²−Σn_i²) ∈ [0,1e6] is the
    pooled P(X_lower < X_higher) + ½P(=) — 500000 exactly under
    exchangeability; z uses the tie-corrected Hollander–Wolfe null
    variance (ties are massive on the 50-value quantity domain — the
    untied form would be badly wrong here).  The fixture's quantity ⊥
    discount gives an honest null; the planted dose-response pytest
    recovers z ≫ 1.96 and the reversed trend its mirror.

    Exactness: every count, 2J, Σn_i² and the six tie moments ride as
    HUGEINT/DECIMAL(38,0) off the bounded 11×50 contingency table
    (Σn³ ≈ 1e32 at 100 TB — far past int64, the r10 hazard class);
    E[2J] = (N²−Σn²)/2 is an exact integer (the numerator is even by
    construction: N²−Σn² = Σ_{i≠j}n_i n_j); the variance composes the
    exact moments in identically-associated doubles; z is one IEEE
    sqrt + division, ROUND(4); jt_u_ppm is ONE integer division.

    Scale notes: ONE corpus agg to the ≤550-cell (discount, quantity)
    contingency frame (bounded at any corpus size — the
    Cochran–Armitage posture); the ordered-pair cross product is
    550×550 worst-case on broadcast frames; the moment frames are
    1-row scalars."""
    l = load_table(spark, sf_dir, "lineitem")
    cells = l.groupBy(
        F.expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").alias("g"),
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    from ..common import stage

    cells = stage(cells)
    a = cells.select(
        F.col("g").alias("ga"), F.col("v").alias("va"), F.col("cnt").alias("ca")
    )
    b = cells.select(
        F.col("g").alias("gb"), F.col("v").alias("vb"), F.col("cnt").alias("cb")
    )
    j2 = (
        a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
        .select(
            F.expr(
                "CAST(ca AS DECIMAL(38,0)) * cb *"
                " (CASE WHEN va < vb THEN 2 WHEN va = vb THEN 1"
                " ELSE 0 END)"
            ).alias("term")
        )
        .agg(F.sum("term").alias("j2"))
    )
    grp = cells.groupBy("g").agg(F.sum("cnt").cast("long").alias("n_rows"))
    gm = grp.agg(
        F.expr("CAST(SUM(n_rows) AS DECIMAL(38,0))").alias("n"),
        F.expr("SUM(CAST(n_rows AS DECIMAL(38,0)) * n_rows)").alias("sn2"),
        F.expr(
            "SUM(CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1)"
            " * (2 * n_rows + 5))"
        ).alias("sg1"),
        F.expr(
            "SUM(CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1)"
            " * (n_rows - 2))"
        ).alias("sg2"),
        F.expr("SUM(CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1))").alias(
            "sg3"
        ),
    )
    vm = (
        cells.groupBy("v")
        .agg(F.sum("cnt").cast("long").alias("t"))
        .agg(
            F.expr(
                "SUM(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5))"
            ).alias("sv1"),
            F.expr(
                "SUM(CAST(t AS DECIMAL(38,0)) * (t - 1) * (t - 2))"
            ).alias("sv2"),
            F.expr("SUM(CAST(t AS DECIMAL(38,0)) * (t - 1))").alias("sv3"),
        )
    )
    nd = F.col("n").cast("double")
    var_j = (
        (
            nd * (nd - 1) * (2 * nd + 5)
            - F.col("sg1").cast("double")
            - F.col("sv1").cast("double")
        )
        / 72
        + F.col("sg2").cast("double")
        * F.col("sv2").cast("double")
        / (36 * nd * (nd - 1) * (nd - 2))
        + F.col("sg3").cast("double")
        * F.col("sv3").cast("double")
        / (8 * nd * (nd - 1))
    )
    stat = (
        j2.crossJoin(F.broadcast(gm))
        .crossJoin(F.broadcast(vm))
        .select(
            F.expr(
                "CAST(j2 * 1000000 div (n * n - sn2) AS BIGINT)"
            ).alias("jt_u_ppm"),
            F.col("n").cast("long").alias("n_total"),
            F.round(
                F.expr(
                    "CAST(j2 - (n * n - sn2) div 2 AS DOUBLE)"
                )
                / (2 * F.sqrt(var_j)),
                4,
            ).alias("z_jt"),
        )
    )
    return (
        grp.select(F.col("g").alias("disc_pct"), "n_rows")
        .crossJoin(F.broadcast(stat))
        .select("disc_pct", "n_rows", "jt_u_ppm", "z_jt", "n_total")
        .orderBy("disc_pct")
    )


@register(
    "events_lead_lag_cmh",
    # Directional lead–lag dependence between event-type daily series
    # via the Cochran–Mantel–Haenszel test (1959, public) — the χ²
    # analog of (binary) transfer entropy, with NO logarithms: for each
    # ordered type pair (X → Y), does X's yesterday move predict Y's
    # today move CONTROLLING for Y's own yesterday move (stratified on
    # y_prev)?  All cell counts are exact integers off the bounded
    # calendar × type-vocabulary grid; per-stratum expectations and
    # variances are integer-ratio doubles (identical on both engines);
    # CMH = (Σ(a−E))²/ΣVar, ROUND(4), NULL when ΣVar = 0 (degenerate
    # margins).
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), grid AS (
        SELECT t.event_type, dd.d, COALESCE(x.c, 0) AS c
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (SELECT DISTINCT d FROM daily) dd
        LEFT JOIN daily x ON x.event_type = t.event_type AND x.d = dd.d
    ), mv AS (
        SELECT event_type, d,
               CASE WHEN c > LAG(c) OVER w THEN 1 ELSE 0 END AS up,
               LAG(c) OVER w AS prev
        FROM grid
        WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ), pairs AS (
        SELECT a.event_type AS type_x, b.event_type AS type_y, a.d,
               a.up AS x_up, b.up AS y_up
        FROM mv a JOIN mv b ON a.d = b.d
        WHERE a.prev IS NOT NULL AND b.prev IS NOT NULL
          AND a.event_type <> b.event_type
    ), tri AS (
        SELECT type_x, type_y,
               LAG(y_up) OVER w AS y_prev,
               LAG(x_up) OVER w AS x_prev,
               y_up AS y,
               LAG(d) OVER w AS d_prev, d
        FROM pairs
        WINDOW w AS (PARTITION BY type_x, type_y ORDER BY d)
    ), valid AS (
        SELECT type_x, type_y, y_prev, x_prev, y
        FROM tri
        WHERE y_prev IS NOT NULL AND d = d_prev + INTERVAL 1 DAY
    ), strata AS (
        SELECT type_x, type_y, y_prev,
               CAST(SUM(x_prev * y) AS BIGINT) AS a,
               CAST(SUM(x_prev) AS BIGINT) AS r1,
               CAST(SUM(y) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM valid GROUP BY 1, 2, 3
    ), agg AS (
        SELECT type_x, type_y,
               CAST(SUM(n) AS BIGINT) AS n_triples,
               SUM(CASE WHEN n > 1
                   THEN a - CAST(r1 AS DOUBLE) * c1 / n
                   ELSE 0 END) AS num,
               SUM(CASE WHEN n > 1
                   THEN CAST(r1 AS DOUBLE) * (n - r1) * c1 * (n - c1)
                        / (CAST(n AS DOUBLE) * n * (n - 1))
                   ELSE 0 END) AS var
        FROM strata GROUP BY 1, 2
    )
    SELECT type_x, type_y, n_triples,
           ROUND(num, 4) + 0.0 AS lead_delta,  -- +0.0 kills IEEE -0

           CASE WHEN var > 0 THEN ROUND(num * num / var, 4)
                ELSE NULL END AS cmh_stat
    FROM agg
    ORDER BY type_x, type_y
    """,
)
def events_lead_lag_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional lead–lag dependence between event types — for every
    ordered pair (X → Y): does X moving UP yesterday predict Y moving
    UP today, after controlling for Y's own yesterday move?  This is
    discrete Granger causality as a Cochran–Mantel–Haenszel test
    stratified on y_prev — the χ² analog of binary transfer entropy
    with ZERO logarithms (the cross-libm-free formulation; the
    entropy version would put ln(count ratios) on both engines).
    Asymmetry is the signal: cmh(X→Y) ≫ cmh(Y→X) says X leads.  The
    fixture's five types draw independent traffic, so every pair sits
    at the null; the planted-effect pytest shifts one series a day
    behind another and recovers the forward CMH ≫ the reverse (the
    directional law parity cannot check).

    Exactness: up-moves, strata cells and margins are exact integers
    off the densified calendar grid; per-stratum E and Var are
    integer-ratio doubles (identical inputs → identical IEEE results);
    CMH is one squared-ratio composition, ROUND(4); var = 0
    (degenerate margins, e.g. a monotone series) yields NULL on both
    engines rather than a fabricated statistic.

    Scale notes: ONE corpus agg to the (type, day) rollup; the move
    grid and the pair frame are |types|²×|days| (bounded by calendar
    × vocabulary — ≤750 rows here); windows are PARTITIONED BY type
    or type pair, never single-partition."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    types = daily.select("event_type").distinct()
    days = daily.select("d").distinct()
    grid = (
        types.crossJoin(days)
        .join(daily, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    mv = grid.select(
        "event_type",
        "d",
        F.when(F.col("c") > F.lag("c").over(w), 1).otherwise(0).alias("up"),
        F.lag("c").over(w).alias("prev"),
    )
    a = mv.alias("a")
    b = mv.alias("b")
    pairs = (
        a.join(b, F.col("a.d") == F.col("b.d"))
        .where(
            F.col("a.prev").isNotNull()
            & F.col("b.prev").isNotNull()
            & (F.col("a.event_type") != F.col("b.event_type"))
        )
        .select(
            F.col("a.event_type").alias("type_x"),
            F.col("b.event_type").alias("type_y"),
            F.col("a.d").alias("d"),
            F.col("a.up").alias("x_up"),
            F.col("b.up").alias("y_up"),
        )
    )
    wp = Window.partitionBy("type_x", "type_y").orderBy("d")
    tri = pairs.select(
        "type_x",
        "type_y",
        F.lag("y_up").over(wp).alias("y_prev"),
        F.lag("x_up").over(wp).alias("x_prev"),
        F.col("y_up").alias("y"),
        F.lag("d").over(wp).alias("d_prev"),
        "d",
    )
    valid = tri.where(
        F.col("y_prev").isNotNull()
        & (F.col("d") == F.date_add(F.col("d_prev"), 1))
    )
    strata = valid.groupBy("type_x", "type_y", "y_prev").agg(
        F.sum(F.col("x_prev") * F.col("y")).cast("long").alias("a"),
        F.sum("x_prev").cast("long").alias("r1"),
        F.sum("y").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    agg = strata.groupBy("type_x", "type_y").agg(
        F.sum("n").cast("long").alias("n_triples"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.col("a")
                - F.col("r1").cast("double") * F.col("c1") / F.col("n"),
            ).otherwise(F.lit(0.0))
        ).alias("num"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.col("r1").cast("double")
                * (F.col("n") - F.col("r1"))
                * F.col("c1")
                * (F.col("n") - F.col("c1"))
                / (
                    F.col("n").cast("double")
                    * F.col("n")
                    * (F.col("n") - 1)
                ),
            ).otherwise(F.lit(0.0))
        ).alias("var"),
    )
    return agg.select(
        "type_x",
        "type_y",
        "n_triples",
        (F.round(F.col("num"), 4) + F.lit(0.0)).alias("lead_delta"),
        F.when(
            F.col("var") > 0,
            F.round(F.col("num") * F.col("num") / F.col("var"), 4),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("cmh_stat"),
    ).orderBy("type_x", "type_y")


#: Croston smoothing constant and the e12 weight tables (α=0.2): the
#: recursion S_p = α·x_p + (1−α)·S_{p−1} with S_1 = x_1 is LINEAR, so
#: the weight of the p-th of n observations is α(1−α)^{n−p} (p ≥ 2)
#: and (1−α)^{n−1} for the first — precomputed in Python as e12
#: integer literals and shipped to BOTH engines (the Holt–Winters
#: filter recipe).  Past j = 149 the true coefficient rounds to 0, so
#: the table's natural end IS the truncation — no semantic clamp.
_CROSTON_ALPHA = 0.2
_CROSTON_JMAX = 150


def _croston_weights() -> list[tuple[int, int, int]]:
    """(lag j = n−p, recent-weight α(1−α)^j · 1e12, first-weight
    (1−α)^j · 1e12) rows."""
    a = _CROSTON_ALPHA
    return [
        (j, round(a * (1 - a) ** j * 1e12), round((1 - a) ** j * 1e12))
        for j in range(_CROSTON_JMAX)
    ]


def _oracle_croston() -> str:
    values = ",\n        ".join(
        f"({j}, {lw}, {fw})" for j, lw, fw in _croston_weights()
    )
    return f"""
    WITH demand AS (
      SELECT p.p_brand AS brand, l.l_partkey AS pk,
             CAST(l.l_shipdate AS DATE) AS d,
             CAST(SUM(ROUND(l.l_quantity)) AS BIGINT) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2, 3
    ), seq AS (
      SELECT brand, pk, x,
             ROW_NUMBER() OVER w AS p,
             COUNT(*) OVER (PARTITION BY pk) AS n,
             datediff('day', LAG(d) OVER w, d) AS gap
      FROM demand
      WINDOW w AS (PARTITION BY pk ORDER BY d)
    ), w(j, lw, fw) AS (
      VALUES {values}
    ), smooth AS (
      SELECT s.brand, s.pk,
             SUM(CASE WHEN s.p >= 2 THEN s.x * w.lw
                      ELSE s.x * w.fw END) AS s_size_e12,
             SUM(CASE WHEN s.p >= 3 THEN s.gap * w.lw
                      WHEN s.p = 2 THEN s.gap * w.fw
                      ELSE 0 END) AS s_gap_e12
      FROM seq s
      JOIN w ON w.j = s.n - s.p
      WHERE s.n >= 2
      GROUP BY 1, 2
    ), per_part AS (
      SELECT brand,
             CAST(CAST(s_size_e12 AS HUGEINT) * 1000000 // s_gap_e12
                  AS BIGINT) AS rate_e6,
             s_gap_e12, s_size_e12
      FROM smooth
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(rate_e6 AS HUGEINT)) // COUNT(*) AS BIGINT)
             AS mean_rate_e6,
           CAST(SUM(CAST(s_gap_e12 AS HUGEINT) // 10000000000)
                // COUNT(*) AS BIGINT) AS mean_interval_x100,
           CAST(SUM(CAST(s_size_e12 AS HUGEINT) // 10000000000)
                // COUNT(*) AS BIGINT) AS mean_size_x100
    FROM per_part
    GROUP BY 1 ORDER BY brand
    """


@register("orders_croston_demand", oracle=_oracle_croston())
def orders_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972, public) for INTERMITTENT demand — the
    standard forecaster when most periods have zero demand (spare
    parts, long-tail SKUs: exactly the per-part shipment pattern, ~30
    demand days scattered over ~6.5 years): smooth the nonzero demand
    SIZES and the inter-demand INTERVALS separately with α=0.2, then
    forecast rate = size/interval units per day.  Plain exponential
    smoothing on the raw (mostly-zero) series would chase zeros to a
    useless near-zero level; Croston is the fix the inventory
    literature standardized on.  Rolled up per brand: mean forecast
    rate, mean smoothed interval and size.

    Exactness: both recursions are linear, so each smoothed state is
    ONE exact integer dot product against the shared e12 weight
    literals (the `events_holt_winters_forecast` filter recipe — the
    p-th of n observations weighs α(1−α)^{n−p}, the first
    (1−α)^{n−1}); beyond lag 149 the true coefficient rounds to 0 so
    the table end IS the truncation; the rate is one HUGEINT/DECIMAL
    ppm-scaled integer division; brand means are integer div.  No
    float recursion executes in either engine.

    Scale notes: ONE hash agg to (part, day) demand grain; ROW_NUMBER/
    LAG windows PARTITIONED BY part (keyed shuffle, bounded ~30-row
    partitions at any corpus — demand days per part are scale-
    invariant); the weight dim is a broadcast 150-row literal; brand
    rollup is ≤|brands| rows."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand")
    )
    demand = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("pk"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(F.expr("CAST(SUM(ROUND(l_quantity)) AS BIGINT)").alias("x"))
    )
    w_seq = Window.partitionBy("pk").orderBy("d")
    seq = demand.select(
        "brand",
        "pk",
        "x",
        F.row_number().over(w_seq).alias("p"),
        F.count(F.lit(1))
        .over(Window.partitionBy("pk"))
        .alias("n"),
        F.datediff(F.col("d"), F.lag("d").over(w_seq)).alias("gap"),
    )
    wdim = spark.createDataFrame(
        _croston_weights(), "j long, lw long, fw long"
    )
    smooth = (
        seq.where(F.col("n") >= 2)
        .join(
            F.broadcast(wdim),
            F.col("j") == F.col("n") - F.col("p"),
        )
        .groupBy("brand", "pk")
        .agg(
            F.sum(
                F.when(F.col("p") >= 2, F.col("x") * F.col("lw")).otherwise(
                    F.col("x") * F.col("fw")
                )
            ).alias("s_size_e12"),
            F.sum(
                F.when(F.col("p") >= 3, F.col("gap") * F.col("lw"))
                .when(F.col("p") == 2, F.col("gap") * F.col("fw"))
                .otherwise(F.lit(0))
            ).alias("s_gap_e12"),
        )
    )
    per_part = smooth.select(
        "brand",
        F.expr(
            "CAST(CAST(s_size_e12 AS DECIMAL(38,0)) * 1000000"
            " div s_gap_e12 AS BIGINT)"
        ).alias("rate_e6"),
        "s_gap_e12",
        "s_size_e12",
    )
    return (
        per_part.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.expr(
                "CAST(SUM(CAST(rate_e6 AS DECIMAL(38,0))) div COUNT(1)"
                " AS BIGINT)"
            ).alias("mean_rate_e6"),
            F.expr(
                "CAST(SUM(CAST(s_gap_e12 AS DECIMAL(38,0))"
                " div 10000000000) div COUNT(1) AS BIGINT)"
            ).alias("mean_interval_x100"),
            F.expr(
                "CAST(SUM(CAST(s_size_e12 AS DECIMAL(38,0))"
                " div 10000000000) div COUNT(1) AS BIGINT)"
            ).alias("mean_size_x100"),
        )
        .orderBy("brand")
    )


@register(
    "orders_newsvendor",
    # Newsvendor / base-stock quantile (Arrow–Harris–Marschak 1951,
    # public): the profit-maximizing stock for one period is the
    # critical-ratio quantile of the demand distribution — stock* =
    # inf{q : F(q) ≥ cu/(cu+co)}.  Evaluated per brand on the DENSIFIED
    # daily demand distribution (zero-demand days included — omitting
    # them overstates every quantile) at service levels 50/80/95%,
    # carried as exact integer ratios (1/2, 4/5, 19/20): the quantile
    # pick is cum_days·den ≥ n·num on integers — zero float anywhere.
    oracle="""
    WITH demand AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
             CAST(SUM(ROUND(l.l_quantity)) AS BIGINT) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), spine AS (
      SELECT b.brand, dd.d, COALESCE(x.x, 0) AS x
      FROM (SELECT DISTINCT brand FROM demand) b
      CROSS JOIN (SELECT DISTINCT d FROM demand) dd
      LEFT JOIN demand x ON x.brand = b.brand AND x.d = dd.d
    ), cells AS (
      SELECT brand, x AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM spine GROUP BY 1, 2
    ), cum AS (
      SELECT brand, v,
             SUM(cnt) OVER (PARTITION BY brand ORDER BY v) AS cum_days,
             SUM(cnt) OVER (PARTITION BY brand) AS n_days,
             SUM(CAST(v AS HUGEINT) * cnt) OVER (PARTITION BY brand)
               AS tot
      FROM cells
    ), lv(level_pct, num, den) AS (
      VALUES (50, 1, 2), (80, 4, 5), (95, 19, 20)
    )
    SELECT c.brand, CAST(l.level_pct AS BIGINT) AS level_pct,
           CAST(MAX(c.n_days) AS BIGINT) AS n_days,
           CAST(MIN(c.v) AS BIGINT) AS stock_qty,
           CAST(MAX(c.tot) * 100 // MAX(c.n_days) AS BIGINT)
             AS mean_demand_x100
    FROM cum c CROSS JOIN lv l
    WHERE c.cum_days * l.den >= c.n_days * l.num
    GROUP BY 1, 2 ORDER BY brand, level_pct
    """,
)
def orders_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor base-stock per brand — the empirical-quantile
    companion of `orders_safety_stock`'s normal approximation: stock
    so that the chosen fraction of daily demands is met from shelf,
    stock* = inf{q : F(q) ≥ service level}, evaluated at 50/80/95%
    directly on the observed daily demand distribution (no
    distributional assumption — the right call when demand is skewed
    or multimodal, where the z·σ rule misses).  Zero-demand days ARE
    part of the distribution: the spine densifies the brand × calendar
    grid first (dropping them would overstate every quantile).

    Exactness: demand values, day counts and cumulative counts are
    exact integers; the service levels ride as integer ratios (1/2,
    4/5, 19/20) so the quantile pick cum·den ≥ n·num never touches a
    float; the mean is one integer x100 division.

    Scale notes: ONE hash agg to (brand, day) demand grain, densified
    by the bounded |brands|×|days| spine (the Friedman grid
    generator); cumulative windows PARTITIONED BY brand over the
    value-level rollup (≤ distinct demand values per brand); the
    3-row level dim broadcasts."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    demand = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(F.expr("CAST(SUM(ROUND(l_quantity)) AS BIGINT)").alias("x"))
    )
    brands = demand.select("brand").distinct()
    days = demand.select("d").distinct()
    spine = (
        brands.crossJoin(F.broadcast(days))
        .join(demand, ["brand", "d"], "left")
        .select("brand", F.coalesce("x", F.lit(0)).alias("x"))
    )
    cells = spine.groupBy("brand", F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("brand")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("brand")
    cum = cells.select(
        "brand",
        "v",
        F.sum("cnt").over(w_cum).alias("cum_days"),
        F.sum("cnt").over(w_all).alias("n_days"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * cnt"))
        .over(w_all)
        .alias("tot"),
    )
    lv = spark.createDataFrame(
        [(50, 1, 2), (80, 4, 5), (95, 19, 20)],
        "level_pct long, num long, den long",
    )
    return (
        cum.crossJoin(F.broadcast(lv))
        .where(F.col("cum_days") * F.col("den") >= F.col("n_days") * F.col("num"))
        .groupBy("brand", "level_pct")
        .agg(
            F.max("n_days").cast("long").alias("n_days"),
            F.min("v").cast("long").alias("stock_qty"),
            F.expr(
                "CAST(MAX(tot) * 100 div MAX(n_days) AS BIGINT)"
            ).alias("mean_demand_x100"),
        )
        .orderBy("brand", "level_pct")
    )


@register(
    "agg_odds_ratio_mh",
    # Mantel–Haenszel pooled odds ratio (1959, public) — the ESTIMATION
    # companion of `events_lead_lag_cmh`'s test: the common odds ratio
    # of (urgent priority → high-price order) across order-year strata,
    # beside the MARGINAL odds ratio of the pooled table.  When strata
    # confound exposure and outcome the two disagree (Simpson's
    # paradox) and OR_MH is the defensible number.  The two MH sums
    # ride as e6-FLOORED integer terms (a_i·d_i·1e6 div n_i — identical
    # integers on both engines, never a float sum); both ORs are one
    # double division, ROUND(4), NULL on zero denominators.
    oracle="""
    WITH t AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS stratum,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                       AND o_totalprice > 150000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                       AND o_totalprice <= 150000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                       AND o_totalprice > 150000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                       AND o_totalprice <= 150000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM orders GROUP BY 1
    ), mh AS (
      SELECT SUM(CAST(a AS HUGEINT) * d * 1000000 // (a + b + c + d))
               AS num_e6,
             SUM(CAST(b AS HUGEINT) * c * 1000000 // (a + b + c + d))
               AS den_e6,
             CAST(SUM(a) AS HUGEINT) AS ma, CAST(SUM(b) AS HUGEINT) AS mb,
             CAST(SUM(c) AS HUGEINT) AS mc, CAST(SUM(d) AS HUGEINT) AS md
      FROM t
    )
    SELECT t.stratum, t.a, t.b, t.c, t.d,
           CASE WHEN t.b * t.c > 0
                THEN ROUND(CAST(t.a AS DOUBLE) * t.d
                           / (CAST(t.b AS DOUBLE) * t.c), 4)
                ELSE NULL END AS or_stratum,
           CASE WHEN m.den_e6 > 0
                THEN ROUND(CAST(m.num_e6 AS DOUBLE)
                           / CAST(m.den_e6 AS DOUBLE), 4)
                ELSE NULL END AS or_mh,
           CASE WHEN m.mb * m.mc > 0
                THEN ROUND(CAST(m.ma AS DOUBLE) * CAST(m.md AS DOUBLE)
                           / (CAST(m.mb AS DOUBLE)
                              * CAST(m.mc AS DOUBLE)), 4)
                ELSE NULL END AS or_marginal
    FROM t CROSS JOIN mh m
    ORDER BY t.stratum
    """,
)
def agg_odds_ratio_mh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio of urgent priority → high-value
    order (> $150k) across order-year strata, reported beside the
    per-stratum and MARGINAL odds ratios — the Simpson's-paradox
    guardrail: when the year mix confounds priority and price, the
    pooled-table OR lies and OR_MH = Σ(a_i d_i/n_i)/Σ(b_i c_i/n_i) is
    the defensible common effect.  The fixture prices orders
    independently of priority within every year (all three ORs ≈ 1 —
    an honest no-effect reading); the planted pytest builds the
    textbook paradox — per-stratum OR exactly 1 in BOTH strata while
    the marginal OR explodes past 20 — and pins or_mh == 1.0 exactly.

    Exactness: stratum cells are exact integers; the MH numerator and
    denominator terms are e6-FLOORED integers (a·d·1e6 div n — HUGEINT/
    DECIMAL(38,0), both engines floor identical integers so the
    quantization cancels and the Σ is an INTEGER sum, never a float
    accumulation); every OR is one deterministic double division,
    ROUND(4), NULL on a zero denominator instead of a fabricated inf.

    Scale notes: ONE corpus agg to the ≤|years|-row stratum frame;
    the MH reduce and the marginal totals are 1-row scalars crossed
    back broadcast.  Nothing after the first agg scales with the
    corpus."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    high = F.col("o_totalprice") > 150000
    t = o.groupBy(F.year("o_orderdate").cast("long").alias("stratum")).agg(
        F.sum(F.when(urgent & high, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(urgent & ~high, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~urgent & high, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~urgent & ~high, 1).otherwise(0)).cast("long").alias("d"),
    )
    mh = t.agg(
        F.sum(
            F.expr(
                "CAST(a AS DECIMAL(38,0)) * d * 1000000"
                " div (a + b + c + d)"
            )
        ).alias("num_e6"),
        F.sum(
            F.expr(
                "CAST(b AS DECIMAL(38,0)) * c * 1000000"
                " div (a + b + c + d)"
            )
        ).alias("den_e6"),
        F.expr("CAST(SUM(a) AS DECIMAL(38,0))").alias("ma"),
        F.expr("CAST(SUM(b) AS DECIMAL(38,0))").alias("mb"),
        F.expr("CAST(SUM(c) AS DECIMAL(38,0))").alias("mc"),
        F.expr("CAST(SUM(d) AS DECIMAL(38,0))").alias("md"),
    )
    return (
        t.crossJoin(F.broadcast(mh))
        .select(
            "stratum",
            "a",
            "b",
            "c",
            "d",
            F.when(
                F.col("b") * F.col("c") > 0,
                F.round(
                    F.col("a").cast("double")
                    * F.col("d")
                    / (F.col("b").cast("double") * F.col("c")),
                    4,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("or_stratum"),
            F.when(
                F.col("den_e6") > 0,
                F.round(
                    F.col("num_e6").cast("double")
                    / F.col("den_e6").cast("double"),
                    4,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("or_mh"),
            F.when(
                F.col("mb") * F.col("mc") > 0,
                F.round(
                    F.col("ma").cast("double")
                    * F.col("md").cast("double")
                    / (
                        F.col("mb").cast("double")
                        * F.col("mc").cast("double")
                    ),
                    4,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("or_marginal"),
        )
        .orderBy("stratum")
    )


#: Hour-of-day circular coordinates: (cos, sin)(2πh/24) · 1e12 as
#: Python-computed integer literals shared by BOTH engines (the
#: events_periodogram trig-literal recipe — zero cross-libm exposure;
#: the 24-hour clock bounds the domain).  Antipodal pairs are exact
#: negations (verified at generation), so opposite-hour mass cancels
#: EXACTLY in the resultant.
def _hour_circle() -> list[tuple[int, int, int]]:
    import math

    return [
        (
            h,
            round(math.cos(2 * math.pi * h / 24) * 10**12),
            round(math.sin(2 * math.pi * h / 24) * 10**12),
        )
        for h in range(24)
    ]


def _oracle_rayleigh() -> str:
    values = ",\n        ".join(
        f"({h}, {c}, {s})" for h, c, s in _hour_circle()
    )
    return f"""
    WITH hourly AS (
      SELECT event_type, hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), w(h, cos_e12, sin_e12) AS (
      VALUES {values}
    ), res AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n_events,
             SUM(CAST(hourly.c AS HUGEINT) * w.cos_e12) AS c_e12,
             SUM(CAST(hourly.c AS HUGEINT) * w.sin_e12) AS s_e12
      FROM hourly JOIN w ON w.h = hourly.h
      GROUP BY 1
    )
    SELECT event_type, n_events,
           CAST(c_e12 // (n_events * 1000000) AS BIGINT) AS avg_cos_e6,
           CAST(s_e12 // (n_events * 1000000) AS BIGINT) AS avg_sin_e6,
           CAST(floor(sqrt(CAST(c_e12 AS DOUBLE) / 1e12
                           * (CAST(c_e12 AS DOUBLE) / 1e12)
                           + CAST(s_e12 AS DOUBLE) / 1e12
                             * (CAST(s_e12 AS DOUBLE) / 1e12))
                      / n_events * 1000000) AS BIGINT) AS rbar_ppm,
           ROUND((CAST(c_e12 AS DOUBLE) / 1e12
                  * (CAST(c_e12 AS DOUBLE) / 1e12)
                  + CAST(s_e12 AS DOUBLE) / 1e12
                    * (CAST(s_e12 AS DOUBLE) / 1e12)) / n_events, 4)
             AS z_rayleigh
    FROM res ORDER BY event_type
    """


@register("events_rayleigh_hour", oracle=_oracle_rayleigh())
def events_rayleigh_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test of hour-of-day uniformity per event type — the
    circular-statistics member of the seasonality family: where
    `events_periodogram` hunts arbitrary periods and
    `events_stl_decompose` describes a known one, Rayleigh asks the
    sharp first question 'does this event type have ANY daily rhythm
    at all?' via the resultant length R̄ of the hour angles; z = nR̄²
    is the classic uniformity statistic (≈ χ²(2)/2 under the null).
    The fixture spreads traffic uniformly over hours (z ≈ 1, honest
    null); the planted pytests pin the poles — a single-hour spike
    gives R̄ = 1, an exactly antipodal pair cancels to R̄ = 0 EXACTLY
    because the literal table's opposite-hour entries are exact
    negations.

    Exactness: hour mass lives on a bounded 24-cell rollup; the trig
    coordinates are shared e12 integer literals (the
    `events_periodogram` recipe — zero libm in either engine), so the
    resultant components are exact HUGEINT/DECIMAL integers; R̄ and z
    are deterministic double compositions (one IEEE sqrt), e6-floored
    / ROUND(4).

    Scale notes: ONE corpus agg to the ≤|types|×24 rollup; the
    24-row literal dim broadcasts; everything downstream is
    type-count-sized."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = spark.createDataFrame(
        _hour_circle(), "h long, cos_e12 long, sin_e12 long"
    )
    res = (
        hourly.join(F.broadcast(w), "h")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.expr("SUM(CAST(c AS DECIMAL(38,0)) * cos_e12)").alias(
                "c_e12"
            ),
            F.expr("SUM(CAST(c AS DECIMAL(38,0)) * sin_e12)").alias(
                "s_e12"
            ),
        )
    )
    cd = F.col("c_e12").cast("double") / 1e12
    sd = F.col("s_e12").cast("double") / 1e12
    return res.select(
        "event_type",
        "n_events",
        F.expr(
            "CAST(c_e12 div (n_events * 1000000) AS BIGINT)"
        ).alias("avg_cos_e6"),
        F.expr(
            "CAST(s_e12 div (n_events * 1000000) AS BIGINT)"
        ).alias("avg_sin_e6"),
        F.floor(
            F.sqrt(cd * cd + sd * sd) / F.col("n_events") * 1000000
        )
        .cast("long")
        .alias("rbar_ppm"),
        F.round((cd * cd + sd * sd) / F.col("n_events"), 4).alias(
            "z_rayleigh"
        ),
    ).orderBy("event_type")


@register(
    "agg_mcnemar",
    # McNemar's paired test (1947, public): did customers' urgency
    # propensity SHIFT between the fixture's two eras?  Each customer
    # is its own control — pair = (placed an URGENT order before
    # 1998-05-01, placed one after); only the DISCORDANT cells b, c
    # carry information, χ² = (b−c)²/(b+c), χ²(1) under marginal
    # homogeneity.  All cells are exact integers off one customer-grain
    # agg; the statistic is ONE double division, ROUND(4), NULL when
    # b + c = 0 (no discordant pairs — nothing to test).
    oracle="""
    WITH u AS (
      SELECT o_custkey,
             MAX(CASE WHEN o_orderdate < DATE '1998-05-01'
                  AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS p1,
             MAX(CASE WHEN o_orderdate >= DATE '1998-05-01'
                  AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS p2
      FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(p1 * p2) AS BIGINT) AS both_eras,
           CAST(SUM(p1 * (1 - p2)) AS BIGINT) AS only_before,
           CAST(SUM((1 - p1) * p2) AS BIGINT) AS only_after,
           CAST(SUM((1 - p1) * (1 - p2)) AS BIGINT) AS neither,
           CASE WHEN SUM(p1 * (1 - p2)) + SUM((1 - p1) * p2) > 0
                THEN ROUND(
                  CAST((SUM(p1 * (1 - p2)) - SUM((1 - p1) * p2))
                       * (SUM(p1 * (1 - p2)) - SUM((1 - p1) * p2))
                       AS DOUBLE)
                  / (SUM(p1 * (1 - p2)) + SUM((1 - p1) * p2)), 4)
                ELSE NULL END AS chi2_mcnemar
    FROM u
    """,
)
def agg_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired customer behavior — did the propensity
    to place URGENT orders shift between the fixture's first era
    (before 1998-05) and its second?  Pairing each customer with
    itself removes all between-customer variation (the same reason
    `agg_ttest_paired` beats the unpaired t-test); only the
    discordant customers — urgent before but not after (b), after but
    not before (c) — carry information, and χ² = (b−c)²/(b+c) tests
    marginal homogeneity.  The fixture assigns priorities uniformly
    across time, so the discordant cells balance (χ² small, honest
    null); the planted pytest makes urgency second-era-only and pins
    b = 0, χ² = c exactly, plus the mirror.

    Exactness: the four cells are exact integers off ONE
    customer-grain conditional agg; χ² is one deterministic double
    division, ROUND(4); b + c = 0 (no discordant pairs) yields NULL
    on both engines — nothing to test is not a zero.

    Scale notes: ONE hash agg to customer grain (map-side combining
    MAX), ONE 1-row reduce.  Nothing downstream scales with the
    corpus."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.col("o_orderdate") < F.lit("1998-05-01").cast("date")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    u = o.groupBy("o_custkey").agg(
        F.max(F.when(cut & urgent, 1).otherwise(0)).alias("p1"),
        F.max(F.when(~cut & urgent, 1).otherwise(0)).alias("p2"),
    )
    b = F.sum(F.col("p1") * (1 - F.col("p2")))
    c = F.sum((1 - F.col("p1")) * F.col("p2"))
    return u.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.col("p1") * F.col("p2")).cast("long").alias("both_eras"),
        b.cast("long").alias("only_before"),
        c.cast("long").alias("only_after"),
        F.sum((1 - F.col("p1")) * (1 - F.col("p2")))
        .cast("long")
        .alias("neither"),
        F.when(
            b + c > 0,
            F.round(((b - c) * (b - c)).cast("double") / (b + c), 4),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("chi2_mcnemar"),
    )


_LJUNG_BOX_LAGS = 7


@register(
    "agg_ljung_box",
    # Ljung–Box portmanteau test (1978, public) on the daily event
    # count per type: Q = n(n+2) Σ_{k≤7} ρ_k²/(n−k), χ²(h) under white
    # noise — the TEST that aggregates `events_acf`'s descriptive
    # curve.  Autocovariances ride as N-SCALED exact integers:
    # c_k = Σ_t (n·x_t − S)(n·x_{t+k} − S) with S = Σx (clearing the
    # mean's denominator keeps every term an integer — HUGEINT/
    # DECIMAL(38,0), n²x² ≈ 1e28 at sf10 passes int64); ρ_k = c_k/c_0
    # and Q are deterministic double compositions, ROUND(4).
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                 AS t,
               CAST(c AS BIGINT) AS x
        FROM daily
    ), mom AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS s
        FROM idx GROUP BY 1
    ), cent AS (
        SELECT i.event_type, i.t,
               m.n * i.x - m.s AS u, m.n AS n
        FROM idx i JOIN mom m ON i.event_type = m.event_type
    ), lags AS (
        SELECT a.event_type, k.k, a.n,
               SUM(CAST(a.u AS HUGEINT) * b.u) AS c_k
        FROM cent a
        JOIN (SELECT UNNEST(range(0, {_LJUNG_BOX_LAGS + 1})) AS k) k
          ON TRUE
        JOIN cent b ON b.event_type = a.event_type
          AND b.t = a.t + k.k
        GROUP BY 1, 2, 3
    ), rho AS (
        SELECT l.event_type, l.k, l.n,
               CAST(l.c_k AS DOUBLE)
                 / CAST(z.c_k AS DOUBLE) AS rho_k
        FROM lags l
        JOIN lags z ON z.event_type = l.event_type AND z.k = 0
        WHERE l.k >= 1
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST({_LJUNG_BOX_LAGS} AS BIGINT) AS h_lags,
           ROUND(SUM(rho_k * rho_k / (CAST(n AS DOUBLE) - k))
                 * CAST(MAX(n) AS DOUBLE)
                 * (CAST(MAX(n) AS DOUBLE) + 2), 4) AS q_stat
    FROM rho GROUP BY 1 ORDER BY event_type
    """,
)
def agg_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau whiteness test on the daily count series
    per event type — the hypothesis-test companion of `events_acf`:
    instead of eyeballing the correlogram, Q = n(n+2)Σρ_k²/(n−k)
    pools the first 7 lags into one χ²(7) statistic; the standard
    pre-flight check before fitting any forecaster (a series that
    fails is NOT white noise and `events_holt_winters_forecast` has
    something to model).  The fixture's daily volume is iid (Q at the
    null); the planted pytests drive Q past the 1% critical value
    with a sawtooth (strong lag-1 anticorrelation) and confirm the
    weekly-cycle fixture lights lag-7.

    Exactness: the mean is cleared by N-SCALING (u_t = n·x_t − S), so
    every autocovariance c_k = Σ u_t u_{t+k} is an exact
    HUGEINT/DECIMAL(38,0) integer on the bounded calendar rollup
    (n²x² ≈ 1e28 at sf10 — far past int64, the r10 hazard class);
    ρ_k = c_k/c_0 and Q are deterministic double compositions of
    those integers, ROUND(4).

    Scale notes: ONE corpus agg to the (type, day) rollup; the lag
    join is calendar × 8 on that bounded frame (the
    events_cross_correlation lag-dim posture); windows PARTITIONED BY
    type."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    w_t = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type",
        F.row_number().over(w_t).alias("t"),
        F.col("c").cast("long").alias("x"),
    )
    mom = idx.groupBy("event_type").agg(
        F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(x) AS DECIMAL(38,0))").alias("s"),
    )
    cent = idx.join(mom, "event_type").select(
        "event_type",
        "t",
        F.expr("n * x - s").alias("u"),
        "n",
    )
    ks = spark.range(0, _LJUNG_BOX_LAGS + 1).select(
        F.col("id").alias("k")
    )
    a = cent.alias("a")
    b = cent.select(
        F.col("event_type").alias("bet"),
        F.col("t").alias("bt"),
        F.col("u").alias("bu"),
    )
    lags = (
        a.crossJoin(F.broadcast(ks))
        .join(
            b,
            (F.col("bet") == F.col("event_type"))
            & (F.col("bt") == F.col("t") + F.col("k")),
        )
        .groupBy("event_type", "k")
        .agg(
            F.expr("SUM(CAST(u AS DECIMAL(38,0)) * bu)").alias("c_k"),
            F.max("n").alias("n"),
        )
    )
    z = lags.where(F.col("k") == 0).select(
        F.col("event_type").alias("zet"), F.col("c_k").alias("c0")
    )
    rho = (
        lags.where(F.col("k") >= 1)
        .join(z, F.col("zet") == F.col("event_type"))
        .select(
            "event_type",
            "k",
            "n",
            (F.col("c_k").cast("double") / F.col("c0").cast("double"))
            .alias("rho_k"),
        )
    )
    return (
        rho.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.lit(_LJUNG_BOX_LAGS).cast("long").alias("h_lags"),
            F.round(
                F.sum(
                    F.col("rho_k")
                    * F.col("rho_k")
                    / (F.col("n").cast("double") - F.col("k"))
                )
                * F.max("n").cast("double")
                * (F.max("n").cast("double") + 2),
                4,
            ).alias("q_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_cochran_q",
    # Cochran's Q (1950, public) — the k-treatment extension of
    # `agg_mcnemar`: did customers' urgency propensity differ across
    # THREE eras of the fixture?  Blocks = customers, binary response
    # x_ij = customer i placed an URGENT order in era j;
    # Q = (k−1)(kΣC_j² − N²)/(kN − ΣR_i²), χ²(k−1) under marginal
    # homogeneity (the k = 2 case of this formula IS McNemar's
    # (b−c)²/(b+c) — the family identity).  Every
    # term is an exact integer off one customer-grain agg; Q is ONE
    # double division, ROUND(4), NULL when the denominator is 0
    # (all-concordant blocks).
    oracle="""
    WITH u AS (
      SELECT o_custkey,
             MAX(CASE WHEN o_orderdate < DATE '1997-03-01'
                  AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS x1,
             MAX(CASE WHEN o_orderdate >= DATE '1997-03-01'
                  AND o_orderdate < DATE '1999-06-01'
                  AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS x2,
             MAX(CASE WHEN o_orderdate >= DATE '1999-06-01'
                  AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS x3
      FROM orders GROUP BY 1
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(x1) AS BIGINT) AS c1,
             CAST(SUM(x2) AS BIGINT) AS c2,
             CAST(SUM(x3) AS BIGINT) AS c3,
             CAST(SUM(x1 + x2 + x3) AS BIGINT) AS n,
             CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT)
               AS sum_r2
      FROM u
    )
    SELECT n_blocks, c1 AS urgent_era1, c2 AS urgent_era2,
           c3 AS urgent_era3,
           CASE WHEN 3 * n - sum_r2 > 0
                THEN ROUND(2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
                                  - n * n)
                           / (3 * n - sum_r2), 4)
                ELSE NULL END AS q_cochran
    FROM s
    """,
)
def agg_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three eras of customer urgency — the
    k-treatment member of the paired family (`agg_mcnemar` is its
    k = 2 special case; `agg_friedman_test` its ordinal cousin): with
    each customer as its own block, did the probability of placing an
    URGENT order change across the fixture's three eras?  Q =
    (k−1)(kΣC_j² − N²)/(kN − ΣR_i²), χ²(2) under marginal
    homogeneity.  The fixture's time-uniform priorities sit at the
    null; the planted pytest makes era 3 urgent-only and pins the
    hand-computed Q = 20 EXACTLY, the mirrored era-1 shift the same Q
    (column-permutation invariance — the law parity cannot check),
    and the all-concordant table NULL.

    Exactness: column totals C_j, N and Σ R_i² are exact integers off
    ONE customer-grain conditional agg; Q is one deterministic double
    division, ROUND(4); an all-concordant table (denominator 0)
    yields NULL on both engines.

    Scale notes: ONE hash agg to customer grain, ONE 1-row reduce —
    the agg_mcnemar posture with three conditional MAXes."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    d = F.col("o_orderdate")
    cut1 = F.lit("1997-03-01").cast("date")
    cut2 = F.lit("1999-06-01").cast("date")
    u = o.groupBy("o_custkey").agg(
        F.max(F.when((d < cut1) & urgent, 1).otherwise(0)).alias("x1"),
        F.max(
            F.when((d >= cut1) & (d < cut2) & urgent, 1).otherwise(0)
        ).alias("x2"),
        F.max(F.when((d >= cut2) & urgent, 1).otherwise(0)).alias("x3"),
    )
    r = F.col("x1") + F.col("x2") + F.col("x3")
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("x1").cast("long").alias("c1"),
        F.sum("x2").cast("long").alias("c2"),
        F.sum("x3").cast("long").alias("c3"),
        F.sum(r).cast("long").alias("n"),
        F.sum(r * r).cast("long").alias("sum_r2"),
    )
    den = 3 * F.col("n") - F.col("sum_r2")
    return s.select(
        "n_blocks",
        F.col("c1").alias("urgent_era1"),
        F.col("c2").alias("urgent_era2"),
        F.col("c3").alias("urgent_era3"),
        F.when(
            den > 0,
            F.round(
                2.0
                * (
                    3
                    * (
                        F.col("c1") * F.col("c1")
                        + F.col("c2") * F.col("c2")
                        + F.col("c3") * F.col("c3")
                    )
                    - F.col("n") * F.col("n")
                )
                / den,
                4,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("q_cochran"),
    )


@register(
    "agg_grubbs_test",
    # Grubbs' maximum-studentized-deviate test (1950, public) on the
    # daily count series per event type — the PARAMETRIC outlier test
    # beside `events_anomaly_mad`'s robust flagging: G = max|x − x̄|/s,
    # compared against the t-based critical value by the caller.  The
    # mean is cleared by N-SCALING (the agg_ljung_box recipe):
    # |n·x_i − S| is an exact integer, and s enters through ONE IEEE
    # sqrt of the exact integer composition n(nΣx² − S²)/(n−1) — so
    # G = max|nx−S| / sqrt(n(nΣx²−S²)/(n−1)), deterministic on both
    # engines, ROUND(4).  The arg-max day is tie-broken to the
    # earliest date (total order).
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), mom AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(c) AS HUGEINT) AS s,
               SUM(CAST(c AS HUGEINT) * c) AS sxx
        FROM daily GROUP BY 1
    ), dev AS (
        SELECT d.event_type, d.d, CAST(d.c AS BIGINT) AS c,
               ABS(m.n * d.c - m.s) AS adev, m.n, m.s, m.sxx,
               ROW_NUMBER() OVER (
                 PARTITION BY d.event_type
                 ORDER BY ABS(m.n * d.c - m.s) DESC, d.d) AS rk
        FROM daily d JOIN mom m ON d.event_type = m.event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           d AS outlier_day, c AS outlier_count,
           ROUND(CAST(adev AS DOUBLE)
                 / sqrt(CAST(n AS DOUBLE)
                        * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1)), 4) AS g_stat
    FROM dev WHERE rk = 1
    ORDER BY event_type
    """,
)
def agg_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' test for a single outlier in the daily count series per
    event type — the parametric member of the anomaly family
    (`events_anomaly_mad` flags robustly; Grubbs asks 'is the single
    most extreme day statistically surprising under normality', the
    classic data-janitor decision rule before dropping a day).
    Reports the arg-max day, its count and G = max|x − x̄|/s.  The
    fixture's iid daily volume keeps G in the unremarkable ~2–3 band
    (honest null for n ≈ 30); the planted pytest spikes one day 10×
    and pins both the identified day and G == the Python replica
    exactly.

    Exactness: the mean is cleared by N-scaling (|n·x_i − S| is an
    exact integer — the `agg_ljung_box` recipe); the denominator is
    ONE IEEE sqrt of a deterministic double composition of exact
    HUGEINT/DECIMAL integers (n²Σx² ≈ 1e28 at sf10 — the r10 hazard
    class); the arg-max is tie-broken to the earliest day (total
    order); G is ROUND(4)-terminal.

    Scale notes: ONE corpus agg to the (type, day) rollup; the moment
    join and arg-max window live on that calendar-bounded frame,
    PARTITIONED BY type."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    mom = daily.groupBy("event_type").agg(
        F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(c) AS DECIMAL(38,0))").alias("s"),
        F.expr("SUM(CAST(c AS DECIMAL(38,0)) * c)").alias("sxx"),
    )
    dev = daily.join(mom, "event_type").select(
        "event_type",
        "d",
        F.col("c").cast("long").alias("c"),
        F.expr("ABS(n * c - s)").alias("adev"),
        "n",
        "s",
        "sxx",
    )
    w_rk = Window.partitionBy("event_type").orderBy(
        F.col("adev").desc(), F.col("d")
    )
    nd = F.col("n").cast("double")
    g = F.round(
        F.col("adev").cast("double")
        / F.sqrt(
            nd
            * (
                nd * F.col("sxx").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
            )
            / (nd - 1)
        ),
        4,
    )
    return (
        dev.withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("d").alias("outlier_day"),
            F.col("c").alias("outlier_count"),
            g.alias("g_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_eoq",
    # Economic order quantity (Harris 1913, public) per brand — the
    # DETERMINISTIC-demand member that completes the inventory quartet
    # (`orders_safety_stock` z·σ buffers, `orders_newsvendor` quantile
    # stocking, `orders_croston_demand` intermittent forecasting):
    # EOQ = √(2·D·S/H) with D = mean annual demand (units/year as an
    # exact x100 integer off the shipdate span) and S/H swept over
    # three literal cost ratios.  ONE IEEE sqrt per cell — and the
    # pytest exploits √'s exactness law: quadrupling demand EXACTLY
    # doubles EOQ in IEEE arithmetic (sqrt(4x) ≡ 2·sqrt(x)).
    oracle="""
    WITH demand AS (
      SELECT p.p_brand AS brand,
             CAST(SUM(ROUND(l.l_quantity)) AS BIGINT) AS units,
             CAST(datediff('day', MIN(CAST(l.l_shipdate AS DATE)),
                           MAX(CAST(l.l_shipdate AS DATE))) + 1
                  AS BIGINT) AS span_days
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ), rates AS (
      SELECT brand, units, span_days,
             units * 36500 // span_days AS annual_x100
      FROM demand
    ), ratio(cost_ratio_pct, num, den) AS (
      VALUES (50, 1, 2), (200, 2, 1), (800, 8, 1)
    )
    SELECT r.brand, CAST(t.cost_ratio_pct AS BIGINT) AS cost_ratio_pct,
           r.annual_x100,
           ROUND(sqrt(2.0 * r.annual_x100 / 100 * t.num / t.den), 2)
             AS eoq_units
    FROM rates r CROSS JOIN ratio t
    ORDER BY r.brand, cost_ratio_pct
    """,
)
def orders_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand at three setup/holding cost
    ratios — Harris's 1913 square-root law, the oldest formula in
    inventory control and the deterministic-demand member of the
    quartet (`orders_safety_stock` buffers variability,
    `orders_newsvendor` prices asymmetry, `orders_croston_demand`
    handles intermittency; EOQ balances setup against holding when
    demand is steady): EOQ = √(2DS/H).  Annual demand D comes off the
    brand's own shipdate span as an exact x100 integer rate.

    Exactness: units and span are exact integers; the annualized rate
    is ONE integer division; each EOQ is one deterministic double
    composition + one IEEE sqrt, ROUND(2).  The pytest pins the
    square-root LAW itself: scaling demand 4× doubles EOQ EXACTLY
    (IEEE sqrt is correctly rounded, and √(4x) = 2√x holds exactly in
    binary floating point) — and engine == Python replica.

    Scale notes: ONE fact-dim join + hash agg to the ≤|brands|-row
    frame; the 3-row cost-ratio dim broadcasts.  Nothing downstream
    scales with the corpus."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    demand = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.expr("CAST(SUM(ROUND(l_quantity)) AS BIGINT)").alias("units"),
            (
                F.datediff(
                    F.max(F.to_date("l_shipdate")),
                    F.min(F.to_date("l_shipdate")),
                )
                + 1
            )
            .cast("long")
            .alias("span_days"),
        )
    )
    rates = demand.select(
        "brand",
        F.expr("units * 36500 div span_days").alias("annual_x100"),
    )
    ratio = spark.createDataFrame(
        [(50, 1, 2), (200, 2, 1), (800, 8, 1)],
        "cost_ratio_pct long, num long, den long",
    )
    return (
        rates.crossJoin(F.broadcast(ratio))
        .select(
            "brand",
            "cost_ratio_pct",
            "annual_x100",
            F.round(
                F.sqrt(
                    2.0
                    * F.col("annual_x100")
                    / 100
                    * F.col("num")
                    / F.col("den")
                ),
                2,
            ).alias("eoq_units"),
        )
        .orderBy("brand", "cost_ratio_pct")
    )


@register(
    "agg_gamma_gk",
    # Goodman–Kruskal gamma (1954, public) — the ESTIMATION companion
    # of `agg_jonckheere_terpstra`'s ordered test: among untied
    # (discount, quantity) pairs, the excess of concordant over
    # discordant as a fraction of decisive pairs, γ = (C−D)/(C+D) ∈
    # [−1, 1].  C and D ride as exact HUGEINT/DECIMAL(38,0) integers
    # via the bounded 11×50 contingency-cell cross product (never a
    # row-pair join); γ is ONE deterministic double division ROUND(6)
    # (stylistic — Spark `div` and DuckDB `//` BOTH truncate toward
    # zero, so a signed integer-div ppm would be parity-safe too; see
    # the docstring's ADVICE r11 correction), NULL when no decisive
    # pairs exist.
    oracle="""
    WITH cells AS (
      SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS g,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), cd AS (
      SELECT SUM(CASE WHEN a.v < b.v
                 THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS c,
             SUM(CASE WHEN a.v > b.v
                 THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS d
      FROM cells a JOIN cells b ON a.g < b.g
    )
    SELECT CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           CASE WHEN c + d > 0
                THEN ROUND((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
                           / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)), 6)
                ELSE NULL END AS gamma
    FROM cd
    """,
)
def agg_gamma_gk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman–Kruskal gamma between discount level and quantity — the
    ordinal-association ESTIMATE beside `agg_jonckheere_terpstra`'s
    significance test and `agg_kendall_tau`'s tie-penalizing cousin:
    gamma ignores ties entirely (C−D over decisive pairs only), which
    makes it the right effect size on heavily tied bounded domains —
    exactly this 11×50 grid, where tau's denominator would be
    dominated by tie mass.  The fixture's quantity ⊥ discount gives
    γ ≈ 0 (honest null); the planted pytests pin the poles EXACTLY:
    a strict dose-response gives D = 0 hence γ = 1, its mirror
    γ = −1, and identical per-group multisets γ = 0 with C == D
    counted exactly.

    Exactness: C and D are exact HUGEINT/DECIMAL(38,0) sums over the
    bounded contingency cross product (the JT posture — never a
    row-pair join); γ is one deterministic double division ROUND(6).
    Note on signed integer division (ADVICE r11 correction): Spark
    `div` AND DuckDB `//` both truncate toward ZERO (verified:
    −7 // 2 = −3 in DuckDB, −7 div 2 = −3 in Spark), so a signed
    integer-div ppm would have been parity-safe too — the double
    division here is a stylistic choice (one fewer scaled literal),
    not a cross-engine requirement.

    Scale notes: ONE corpus agg to the ≤550-cell frame; the ordered
    cross product runs on broadcast cells; output is one row."""
    l = load_table(spark, sf_dir, "lineitem")
    cells = l.groupBy(
        F.expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").alias("g"),
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    from ..common import stage

    cells = stage(cells)
    a = cells.select(
        F.col("g").alias("ga"), F.col("v").alias("va"), F.col("cnt").alias("ca")
    )
    b = cells.select(
        F.col("g").alias("gb"), F.col("v").alias("vb"), F.col("cnt").alias("cb")
    )
    cd = (
        a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
        .agg(
            F.sum(
                F.when(
                    F.col("va") < F.col("vb"),
                    F.expr("CAST(ca AS DECIMAL(38,0)) * cb"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("c"),
            F.sum(
                F.when(
                    F.col("va") > F.col("vb"),
                    F.expr("CAST(ca AS DECIMAL(38,0)) * cb"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("d"),
        )
    )
    return cd.select(
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.when(
            F.col("c") + F.col("d") > 0,
            F.round(
                (F.col("c").cast("double") - F.col("d").cast("double"))
                / (F.col("c").cast("double") + F.col("d").cast("double")),
                6,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("gamma"),
    )


@register(
    "agg_brown_forsythe",
    # Brown–Forsythe variance-homogeneity test (1974, public) — the
    # missing SPREAD member of the group-comparison family (KW/Friedman
    # compare locations; this asks whether the 11 discount levels share
    # a quantity DISPERSION): one-way ANOVA F on z_ij = |x_ij − med_j|,
    # the median-centered (robust) Levene variant.  Group medians ride
    # 2-SCALED (lo+hi middle order statistics — never fractional) so
    # z2 = |2x − med2| is an exact integer; SSB/SSW ride as e6-FLOORED
    # integer sums of per-group rationals ((nQ − T²)·1e6 div n — both
    # engines floor identical integers, the KW e12 trick), so the sums
    # NEVER accumulate floats; F is one double composition, ROUND(4).
    oracle="""
    WITH base AS (
      SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS g,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS x
      FROM lineitem
    ), cells AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base GROUP BY 1, 2
    ), cum AS (
      SELECT g, x, cnt,
             SUM(cnt) OVER (PARTITION BY g ORDER BY x) AS cumc,
             SUM(cnt) OVER (PARTITION BY g) AS n
      FROM cells
    ), med AS (
      SELECT g,
             MIN(CASE WHEN cumc >= (n + 1) // 2 THEN x END)
             + MIN(CASE WHEN cumc >= (n + 2) // 2 THEN x END) AS med2,
             MAX(n) AS n
      FROM cum GROUP BY g
    ), z AS (
      SELECT b.g, ABS(2 * b.x - m.med2) AS z2
      FROM base b JOIN med m ON b.g = m.g
    ), grp AS (
      SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(z2) AS HUGEINT) AS t,
             SUM(CAST(z2 AS HUGEINT) * z2) AS q
      FROM z GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n) AS HUGEINT) AS nn,
             CAST(SUM(t) AS HUGEINT) AS tt,
             CAST(COUNT(*) AS HUGEINT) AS k,
             SUM(t * t * 1000000 // n) AS sb_part_e6,
             SUM((n * q - t * t) * 1000000 // n) AS ssw_e6
      FROM grp
    ), f AS (
      SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n_total,
             CASE WHEN ssw_e6 > 0
                  THEN ROUND(
                    (CAST(sb_part_e6 - tt * tt * 1000000 // nn
                          AS DOUBLE) / (CAST(k AS DOUBLE) - 1))
                    / (CAST(ssw_e6 AS DOUBLE)
                       / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 4)
                  ELSE NULL END AS f_stat
      FROM tot
    )
    SELECT m.g AS disc_pct, CAST(m.n AS BIGINT) AS n_rows,
           CAST(m.med2 AS BIGINT) AS median_x2,
           f.k - 1 AS df1, f.n_total - f.k AS df2, f.f_stat
    FROM med m CROSS JOIN f
    ORDER BY disc_pct
    """,
)
def agg_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test — do the 11 discount levels share a quantity
    SPREAD?  The robust (median-centered) Levene variant: one-way
    ANOVA F on the absolute deviations from each group's own median,
    F(k−1, N−k) under homogeneity.  This is the family's missing
    dispersion member: `agg_kruskal_wallis`/`agg_friedman_test`
    compare locations and `agg_welch_ttest` already refuses to pool
    variances — this op is the test of whether pooling was ever safe.
    The fixture draws quantity iid across discounts (F at the null);
    the planted pytest gives one group a wide spread and rejects, and
    identical group multisets pin F ≈ 0 within the documented e6
    quantization band.

    Exactness: group medians are 2-SCALED order statistics off the
    bounded 11×50 cell frame (lo+hi middle ranks — never fractional);
    z2 = |2x − med2| is an exact integer; the SSB/SSW pieces are
    e6-FLOORED integer sums of per-group rationals (both engines
    floor identical integers, so the sums never accumulate floats —
    the KW rank-sum discipline); F is one deterministic double
    composition, ROUND(4), NULL on zero within-group spread.

    Scale notes: ONE corpus agg to the 550-cell frame for medians
    (windows PARTITIONED BY group), one broadcast median join back to
    the scan, ONE moment agg per group, 1-row F reduce.  n·Q ≈ 3e17
    at sf10 ⇒ HUGEINT/DECIMAL(38,0) throughout (the r10 hazard
    class)."""
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        F.expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").alias("g"),
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("x"),
    )
    cells = base.groupBy("g", "x").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_g = Window.partitionBy("g")
    cum = cells.select(
        "g",
        "x",
        F.sum("cnt").over(w_cum).alias("cumc"),
        F.sum("cnt").over(w_g).alias("n"),
    )
    med = cum.groupBy("g").agg(
        (
            F.min(
                F.when(
                    F.col("cumc") >= F.expr("(n + 1) div 2"), F.col("x")
                )
            )
            + F.min(
                F.when(
                    F.col("cumc") >= F.expr("(n + 2) div 2"), F.col("x")
                )
            )
        ).alias("med2"),
        F.max("n").alias("n"),
    )
    z = base.join(F.broadcast(med.select("g", "med2")), "g").select(
        "g", F.abs(2 * F.col("x") - F.col("med2")).alias("z2")
    )
    grp = z.groupBy("g").agg(
        F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(z2) AS DECIMAL(38,0))").alias("t"),
        F.expr("SUM(CAST(z2 AS DECIMAL(38,0)) * z2)").alias("q"),
    )
    tot = grp.agg(
        F.expr("CAST(SUM(n) AS DECIMAL(38,0))").alias("nn"),
        F.expr("CAST(SUM(t) AS DECIMAL(38,0))").alias("tt"),
        F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("k"),
        # Spark `div` yields BIGINT even on DECIMAL operands; cast each
        # per-group quotient back to DECIMAL(38,0) BEFORE the SUM so the
        # accumulator matches the oracle's HUGEINT (an int64 SUM here
        # overflows near sf500 — ADVICE r11).  Residual bound: the
        # per-term quotient itself stays under int64 until a single
        # discount group exceeds ~1.5e10 rows (≈ sf25000).
        F.expr(
            "SUM(CAST(t * t * 1000000 div n AS DECIMAL(38,0)))"
        ).alias("sb_part_e6"),
        F.expr(
            "SUM(CAST((n * q - t * t) * 1000000 div n AS DECIMAL(38,0)))"
        ).alias("ssw_e6"),
    )
    fstat = tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("nn").cast("long").alias("n_total"),
        F.when(
            F.col("ssw_e6") > 0,
            F.round(
                (
                    F.expr(
                        "CAST(sb_part_e6 - tt * tt * 1000000 div nn"
                        " AS DOUBLE)"
                    )
                    / (F.col("k").cast("double") - 1)
                )
                / (
                    F.col("ssw_e6").cast("double")
                    / (
                        F.col("nn").cast("double")
                        - F.col("k").cast("double")
                    )
                ),
                4,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("f_stat"),
    )
    return (
        med.crossJoin(F.broadcast(fstat))
        .select(
            F.col("g").alias("disc_pct"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("med2").cast("long").alias("median_x2"),
            (F.col("k") - 1).alias("df1"),
            (F.col("n_total") - F.col("k")).alias("df2"),
            "f_stat",
        )
        .orderBy("disc_pct")
    )


@register(
    "agg_cliffs_delta",
    # Cliff's delta (1993, public) — the two-GROUP ordinal effect size
    # beside `agg_gamma_gk`'s two-VARIABLE gamma and the estimation
    # companion of `agg_mannwhitney_u` (δ = 2·AUC − 1): among all
    # (low-discount, high-discount) line pairs, P(x_A > x_B) −
    # P(x_A < x_B).  GT/LT/TIE ride as exact HUGEINT/DECIMAL(38,0)
    # sums over the bounded 50×50 value-cell cross (never a row-pair
    # join); δ is ONE double division ROUND(6), NULL when either group
    # is empty.
    oracle="""
    WITH cells AS (
      SELECT CASE WHEN l_discount < 0.05 THEN 0 ELSE 1 END AS grp,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), cross_cd AS (
      SELECT SUM(CASE WHEN a.v > b.v
                 THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS gt,
             SUM(CASE WHEN a.v < b.v
                 THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS lt,
             SUM(CASE WHEN a.v = b.v
                 THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS tie
      FROM (SELECT v, cnt FROM cells WHERE grp = 0) a
      CROSS JOIN (SELECT v, cnt FROM cells WHERE grp = 1) b
    ), sizes AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN cnt ELSE 0 END) AS HUGEINT)
               AS n_a,
             CAST(SUM(CASE WHEN grp = 1 THEN cnt ELSE 0 END) AS HUGEINT)
               AS n_b
      FROM cells
    )
    SELECT CAST(s.n_a AS BIGINT) AS n_a, CAST(s.n_b AS BIGINT) AS n_b,
           CAST(COALESCE(c.gt, 0) AS BIGINT) AS n_gt,
           CAST(COALESCE(c.lt, 0) AS BIGINT) AS n_lt,
           CAST(COALESCE(c.tie, 0) AS BIGINT) AS n_tie,
           CASE WHEN s.n_a * s.n_b > 0
                THEN ROUND((CAST(c.gt AS DOUBLE) - CAST(c.lt AS DOUBLE))
                           / CAST(s.n_a * s.n_b AS DOUBLE), 6)
                ELSE NULL END AS cliffs_delta
    FROM sizes s LEFT JOIN cross_cd c ON TRUE
    """,
)
def agg_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta between low-discount (< 5%) and high-discount
    (≥ 5%) line quantities — the two-sample ordinal effect size the
    rank-test family was missing: `agg_mannwhitney_u` answers IS there
    a stochastic shift, δ = P(A > B) − P(A < B) = 2·AUC − 1 answers
    HOW BIG, robustly (no moments, tie-transparent).  The fixture's
    quantity ⊥ discount gives δ ≈ 0 (honest null); the planted pytests
    pin the poles exactly: fully separated groups → δ = ±1 with the
    dominated count 0, identical group multisets → n_gt == n_lt and
    δ = 0.

    Exactness: GT/LT/TIE are exact HUGEINT/DECIMAL(38,0) sums over the
    bounded ≤50×50 value-cell cross product (the gamma_gk posture —
    never a row-pair join; n_a·n_b ≈ 3.6e17 at sf10 already passes
    int64, hence the wide type); δ is ONE double division ROUND(6),
    NULL when a group is empty.

    Scale notes: ONE corpus agg to ≤100 cells; the dominance cross
    runs on broadcast cell frames (bounded 50×50 — reviewed NLJ);
    output is one row."""
    l = load_table(spark, sf_dir, "lineitem")
    cells = l.groupBy(
        F.when(F.col("l_discount") < 0.05, 0).otherwise(1).alias("grp"),
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    from ..common import stage

    cells = stage(cells)
    a = cells.where(F.col("grp") == 0).select(
        F.col("v").alias("va"), F.col("cnt").alias("ca")
    )
    b = cells.where(F.col("grp") == 1).select(
        F.col("v").alias("vb"), F.col("cnt").alias("cb")
    )
    prod = "CAST(ca AS DECIMAL(38,0)) * cb"
    cd = a.crossJoin(F.broadcast(b)).agg(
        F.expr(f"SUM(CASE WHEN va > vb THEN {prod} ELSE 0 END)").alias("gt"),
        F.expr(f"SUM(CASE WHEN va < vb THEN {prod} ELSE 0 END)").alias("lt"),
        F.expr(f"SUM(CASE WHEN va = vb THEN {prod} ELSE 0 END)").alias("tie"),
    )
    sizes = cells.agg(
        F.expr(
            "CAST(SUM(CASE WHEN grp = 0 THEN cnt ELSE 0 END)"
            " AS DECIMAL(38,0))"
        ).alias("n_a"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 1 THEN cnt ELSE 0 END)"
            " AS DECIMAL(38,0))"
        ).alias("n_b"),
    )
    return sizes.crossJoin(F.broadcast(cd)).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.coalesce(F.col("gt"), F.lit(0)).cast("long").alias("n_gt"),
        F.coalesce(F.col("lt"), F.lit(0)).cast("long").alias("n_lt"),
        F.coalesce(F.col("tie"), F.lit(0)).cast("long").alias("n_tie"),
        F.when(
            F.col("n_a") * F.col("n_b") > 0,
            F.round(
                (F.col("gt").cast("double") - F.col("lt").cast("double"))
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("cliffs_delta"),
    )


@register(
    "agg_mood_median",
    # Mood's median test (1950, public) — the LOCATION counterpart of
    # `agg_brown_forsythe`'s spread test on the same 11-group frame: a
    # k×2 chi-square on counts above/below the GRAND 2-scaled median
    # (ties at the median excluded, the textbook convention).  The
    # grand median is the lo+hi middle order statistic off the bounded
    # global cell frame; per-group above/below counts are exact
    # integers; chi2 rides as an e6-FLOORED integer sum of per-cell
    # rationals ((o·T − n·M)²·1e6 div (T·n·M) — both engines floor
    # identical nonnegative integers, the KW discipline), ONE double
    # division at the surface, ROUND(4).
    oracle="""
    WITH base AS (
      SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS g,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS x
      FROM lineitem
    ), cells AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY 1
    ), cum AS (
      SELECT x, SUM(cnt) OVER (ORDER BY x) AS cumc,
             SUM(cnt) OVER () AS n
      FROM cells
    ), med AS (
      SELECT MIN(CASE WHEN cumc >= (n + 1) // 2 THEN x END)
             + MIN(CASE WHEN cumc >= (n + 2) // 2 THEN x END) AS med2
      FROM cum
    ), grp AS (
      SELECT b.g,
             CAST(SUM(CASE WHEN 2 * b.x > m.med2 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS a,
             CAST(SUM(CASE WHEN 2 * b.x < m.med2 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS b
      FROM base b CROSS JOIN med m
      GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(a) AS HUGEINT) AS ta,
             CAST(SUM(b) AS HUGEINT) AS tb,
             CAST(SUM(a) + SUM(b) AS HUGEINT) AS t,
             CAST(SUM(CASE WHEN a + b > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS k_eff
      FROM grp
    ), chi AS (
      SELECT SUM(CASE WHEN g.a + g.b > 0 THEN
               (g.a * t.t - (g.a + g.b) * t.ta)
               * (g.a * t.t - (g.a + g.b) * t.ta) * 1000000
               // (t.t * (g.a + g.b) * t.ta)
               + (g.b * t.t - (g.a + g.b) * t.tb)
               * (g.b * t.t - (g.a + g.b) * t.tb) * 1000000
               // (t.t * (g.a + g.b) * t.tb)
             ELSE 0 END) AS chi_e6
      FROM grp g CROSS JOIN tot t
      WHERE t.ta > 0 AND t.tb > 0
    )
    SELECT g.g AS disc_pct, CAST(g.a AS BIGINT) AS n_above,
           CAST(g.b AS BIGINT) AS n_below,
           CAST(m.med2 AS BIGINT) AS grand_median_x2,
           t.k_eff - 1 AS df,
           CASE WHEN t.ta > 0 AND t.tb > 0
                THEN ROUND(CAST(c.chi_e6 AS DOUBLE) / 1000000, 4)
                ELSE NULL END AS chi2_stat
    FROM grp g CROSS JOIN med m CROSS JOIN tot t
    LEFT JOIN chi c ON TRUE
    ORDER BY disc_pct
    """,
)
def agg_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test — do the 11 discount levels share a quantity
    LOCATION?  The k-sample sibling completing the group-comparison
    triad on this frame: `agg_kruskal_wallis` compares mean ranks
    (power against shifts), `agg_brown_forsythe` compares spreads,
    this one compares medians with the bluntest, most outlier-proof
    statistic available — a k×2 chi-square on counts above/below the
    GRAND median, immune to anything monotone done to the values.
    Ties AT the median are excluded (the textbook convention; the
    integer 2-scaled median makes "at" exact, never a float epsilon).
    The fixture draws quantity iid across discounts (chi2 at the
    null); the planted pytest shifts one group's median and rejects;
    identical group multisets pin every group's (above, below) split
    equal and chi2 ≈ 0 within the e6 floor.

    Exactness: the grand median is 2-SCALED (lo+hi middle order
    statistics off the ≤50-row global cell frame); per-group
    above/below counts are exact integers; each group's chi2
    contribution is the e6-floored integer rational
    (o·T − n·M)²·1e6 div (T·n·M) summed EXACTLY (HUGEINT/
    DECIMAL(38,0) — both engines floor identical nonnegative
    integers), one double division at the surface, ROUND(4); NULL
    when either margin is empty; groups with every value AT the
    median contribute nothing (k_eff adjusts df).

    Scale notes: ONE corpus agg to the ≤50-cell global value frame
    (unpartitioned cum window on that bounded frame — reviewed
    SINGLE); the median broadcasts back to a second corpus agg
    collapsing to 11 group rows; the chi2 reduce is 1-row.  Exactness
    headroom: the squared deviation (o·T − n·M)²·1e6 tops out near
    N⁴·1e6 ≈ 1.3e37 at sf10 — inside DECIMAL(38,0)/HUGEINT, with
    overflow near sf20; the giant-corpus variant replaces the e6 floor
    with an ORDERED prefix-sum of per-group doubles (≤11 terms, both
    engines add left-to-right — deterministic), documented here rather
    than built because the e6-exact path covers every fixture this
    repo measures."""
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        F.expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").alias("g"),
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("x"),
    )
    cells = base.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cum = (
        Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    cum = cells.select(
        "x",
        F.sum("cnt").over(w_cum).alias("cumc"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    med = cum.agg(
        (
            F.min(F.when(F.col("cumc") >= F.expr("(n + 1) div 2"), F.col("x")))
            + F.min(
                F.when(F.col("cumc") >= F.expr("(n + 2) div 2"), F.col("x"))
            )
        ).alias("med2")
    )
    grp = (
        base.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN 2 * x > med2 THEN 1 ELSE 0 END)"
                " AS DECIMAL(38,0))"
            ).alias("a"),
            F.expr(
                "CAST(SUM(CASE WHEN 2 * x < med2 THEN 1 ELSE 0 END)"
                " AS DECIMAL(38,0))"
            ).alias("b"),
        )
    )
    from ..common import stage

    grp = stage(grp)
    tot = grp.agg(
        F.expr("CAST(SUM(a) AS DECIMAL(38,0))").alias("ta"),
        F.expr("CAST(SUM(b) AS DECIMAL(38,0))").alias("tb"),
        F.expr("CAST(SUM(a) + SUM(b) AS DECIMAL(38,0))").alias("t"),
        F.expr(
            "CAST(SUM(CASE WHEN a + b > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("k_eff"),
    )
    chi = (
        grp.crossJoin(F.broadcast(tot))
        .where((F.col("ta") > 0) & (F.col("tb") > 0))
        .agg(
            F.expr(
                "SUM(CASE WHEN a + b > 0 THEN"
                " (a * t - (a + b) * ta) * (a * t - (a + b) * ta)"
                " * 1000000 div (t * (a + b) * ta)"
                " + (b * t - (a + b) * tb) * (b * t - (a + b) * tb)"
                " * 1000000 div (t * (a + b) * tb)"
                " ELSE 0 END)"
            ).alias("chi_e6")
        )
    )
    return (
        grp.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            F.col("g").alias("disc_pct"),
            F.col("a").cast("long").alias("n_above"),
            F.col("b").cast("long").alias("n_below"),
            F.col("med2").cast("long").alias("grand_median_x2"),
            (F.col("k_eff") - 1).alias("df"),
            F.when(
                (F.col("ta") > 0) & (F.col("tb") > 0),
                F.round(F.col("chi_e6").cast("double") / 1000000, 4),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("chi2_stat"),
        )
        .orderBy("disc_pct")
    )


@register(
    "agg_ansari_bradley",
    # Ansari–Bradley scale test (1960, public) — the RANK-based spread
    # test beside `agg_brown_forsythe`'s ANOVA-on-deviations: scores
    # rank from BOTH ends inward (min of rank and its mirror), so a
    # group with the wider spread collects the small end-scores.  The
    # conditional (ties-respecting) permutation null is computed from
    # the OBSERVED score multiset, so mid-rank ties cost no exactness:
    # 2-scaled mid-rank m2 = 2·c_before + cnt + 1, 2-scaled score
    # s2 = min(m2, 2(N+1) − m2); AB·2, Σs2, Σs2² are exact
    # HUGEINT/DECIMAL(38,0) sums over the bounded value-cell frame;
    # z is ONE shared double composition of exact integers, ROUND(4),
    # NULL on zero score variance.
    oracle="""
    WITH base AS (
      SELECT CASE WHEN l_discount < 0.05 THEN 0 ELSE 1 END AS grp,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS v
      FROM lineitem
    ), cells AS (
      SELECT v,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS ca,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base GROUP BY 1
    ), scored AS (
      SELECT v, ca, cnt,
             2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS m2,
             SUM(cnt) OVER () AS n
      FROM cells
    ), s2c AS (
      SELECT ca, cnt,
             CASE WHEN m2 <= 2 * (n + 1) - m2 THEN m2
                  ELSE 2 * (n + 1) - m2 END AS s2,
             n
      FROM scored
    ), agg AS (
      SELECT CAST(SUM(CAST(ca AS HUGEINT) * s2) AS HUGEINT) AS ab2,
             CAST(SUM(CAST(cnt AS HUGEINT) * s2) AS HUGEINT) AS t1,
             CAST(SUM(CAST(cnt AS HUGEINT) * s2 * s2) AS HUGEINT) AS t2,
             CAST(SUM(ca) AS HUGEINT) AS n1,
             CAST(MAX(n) AS HUGEINT) AS n
      FROM s2c
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n - n1 AS BIGINT) AS n_b,
           CAST(ab2 AS BIGINT) AS ab_sum_x2,
           CASE WHEN n1 > 0 AND n1 < n AND n > 1
                     AND n * t2 - t1 * t1 > 0
                THEN ROUND(CAST(ab2 * n - n1 * t1 AS DOUBLE)
                           / SQRT(CAST(n1 * (n - n1) AS DOUBLE)
                                  * CAST(n * t2 - t1 * t1 AS DOUBLE)
                                  / CAST(n - 1 AS DOUBLE)), 4)
                ELSE NULL END AS z_stat
    FROM agg
    """,
)
def agg_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley test — do low-discount (< 5%) and high-discount
    (≥ 5%) lines share a quantity SPREAD?  The rank-based scale test
    completing the two-sample corner of the dispersion family:
    `agg_brown_forsythe` compares k groups via an ANOVA on absolute
    deviations (needs a location estimate); Ansari–Bradley needs NO
    location at all — values rank from both ends inward, the group
    with the wider spread collects the small end-scores, and the test
    conditions on the observed (tied) score multiset.  The fixture
    draws both groups iid (z at the null); the planted pytests pin a
    two-ends-vs-middle construction to its hand-computed minimal AB
    sum (exact integers) and reject, and identical group multisets
    give z ≈ 0.

    Exactness: 2-scaled mid-ranks m2 = 2·c_before + cnt + 1 and scores
    s2 = min(m2, 2(N+1) − m2) are exact integers off the bounded
    ≤50-row global value-cell frame; AB·2, Σs2 and Σs2² ride as
    HUGEINT/DECIMAL(38,0) sums; the permutation-null moments
    (mean n1·T1/N, variance n1·n2·(N·T2 − T1²)/(N²(N−1)) — sampling
    without replacement from the observed scores) reduce to the ONE
    shared double composition (AB2·N − n1·T1)/√(n1·n2·(N·T2 − T1²)/
    (N−1)), ROUND(4); NULL on a degenerate margin or zero score
    variance.  N·T2 ≈ N⁴: inside DECIMAL(38,0) through sf10, the
    mood_median headroom note applies.

    Scale notes: ONE corpus agg to the ≤50-cell value frame
    (unpartitioned windows on that bounded frame — reviewed SINGLE);
    everything after is a 1-row reduce."""
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        F.when(F.col("l_discount") < 0.05, 0).otherwise(1).alias("grp"),
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("v"),
    )
    cells = base.groupBy("v").agg(
        F.expr(
            "CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("ca"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    scored = cells.select(
        "ca",
        "cnt",
        (2 * (F.sum("cnt").over(w_cum) - F.col("cnt")) + F.col("cnt") + 1)
        .alias("m2"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    s2c = scored.select(
        "ca",
        "cnt",
        F.expr(
            "CASE WHEN m2 <= 2 * (n + 1) - m2 THEN m2"
            " ELSE 2 * (n + 1) - m2 END"
        ).alias("s2"),
        "n",
    )
    agg = s2c.agg(
        F.expr("CAST(SUM(CAST(ca AS DECIMAL(38,0)) * s2) AS DECIMAL(38,0))")
        .alias("ab2"),
        F.expr("CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * s2) AS DECIMAL(38,0))")
        .alias("t1"),
        F.expr(
            "CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * s2 * s2)"
            " AS DECIMAL(38,0))"
        ).alias("t2"),
        F.expr("CAST(SUM(ca) AS DECIMAL(38,0))").alias("n1"),
        F.expr("CAST(MAX(n) AS DECIMAL(38,0))").alias("n"),
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_a"),
        (F.col("n") - F.col("n1")).cast("long").alias("n_b"),
        F.col("ab2").cast("long").alias("ab_sum_x2"),
        F.when(
            (F.col("n1") > 0)
            & (F.col("n1") < F.col("n"))
            & (F.col("n") > 1)
            & (F.expr("n * t2 - t1 * t1") > 0),
            F.round(
                F.expr("CAST(ab2 * n - n1 * t1 AS DOUBLE)")
                / F.sqrt(
                    F.expr("CAST(n1 * (n - n1) AS DOUBLE)")
                    * F.expr("CAST(n * t2 - t1 * t1 AS DOUBLE)")
                    / F.expr("CAST(n - 1 AS DOUBLE)")
                ),
                4,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("z_stat"),
    )


@register(
    "agg_durbin_watson",
    # Durbin–Watson first-order serial-correlation statistic (1950,
    # public) on mean-centered daily volumes per event type — the
    # LAG-1-focused companion of `agg_ljung_box`'s portmanteau (LB asks
    # "any autocorrelation up to lag 8?", DW gives the classic 0..4
    # positioning of lag 1: 2 = white, →0 positive, →4 alternating).
    # Residuals ride N-SCALED (r = n·c − S, exact integers — the
    # ljung_box discipline), so Σ(Δr)² and Σr² are exact
    # HUGEINT/DECIMAL(38,0) sums and DW is ONE double division,
    # ROUND(4), NULL on a constant series.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), dims AS (
      SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s
      FROM daily GROUP BY 1
    ), resid AS (
      SELECT x.event_type,
             m.n * x.c - m.s AS r,
             m.n * (x.c - LAG(x.c) OVER (PARTITION BY x.event_type
                                         ORDER BY x.d)) AS dr
      FROM daily x JOIN dims m ON x.event_type = m.event_type
    ), sums AS (
      SELECT event_type,
             CAST(SUM(r * r) AS HUGEINT) AS den,
             CAST(SUM(CASE WHEN dr IS NOT NULL THEN dr * dr ELSE 0 END)
                  AS HUGEINT) AS num,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM resid GROUP BY 1
    )
    SELECT event_type, n_days,
           CASE WHEN den > 0
                THEN ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4)
                ELSE NULL END AS dw_stat
    FROM sums ORDER BY event_type
    """,
)
def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic on each event type's mean-centered daily
    volume series — the classic lag-1 serial-correlation dial
    (DW ≈ 2(1 − ρ₁)): 2 means white noise, toward 0 means momentum
    (yesterday's surplus predicts today's), toward 4 means alternation
    (overshoot-correct).  Complements the family's existing series
    diagnostics: `agg_ljung_box` tests lags 1-8 jointly,
    `events_runs_test` looks only at delta signs; DW is the single
    number regression practitioners quote for residual independence.
    The fixture's iid daily volumes sit near 2; the planted pytests
    pin the poles exactly — a ±h alternating series has
    Δr = ∓2hn each step, giving the closed-form DW = 4·(m−1)/m on its
    tie-free interior (hand-computed), and a two-level step series
    drives DW toward 0.

    Exactness: residuals ride N-SCALED (r_t = n·c_t − S — integers,
    never a float mean; the ljung_box discipline), so the numerator
    Σ(r_t − r_{t−1})² = n²·Σ(c_t − c_{t−1})² and denominator Σr_t²
    are exact HUGEINT/DECIMAL(38,0) sums; DW is ONE double division,
    ROUND(4); NULL for a constant series (den = 0).  Days are the
    OBSERVED daily rollup ordered by date (no zero-fill spine — a
    silent day is a gap, not a zero; documented difference from the
    densified friedman grid).

    Scale notes: ONE corpus agg to the (type, day) calendar rollup;
    the LAG window is type-partitioned on that bounded frame; the
    moment agg collapses to ≤|types| rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    dims = daily.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(c) AS DECIMAL(38,0))").alias("s"),
    )
    w_lag = Window.partitionBy("event_type").orderBy("d")
    resid = daily.join(F.broadcast(dims), "event_type").select(
        "event_type",
        (F.col("n") * F.col("c") - F.col("s")).alias("r"),
        (F.col("n") * (F.col("c") - F.lag("c").over(w_lag))).alias("dr"),
    )
    sums = resid.groupBy("event_type").agg(
        F.expr("CAST(SUM(r * r) AS DECIMAL(38,0))").alias("den"),
        F.expr(
            "CAST(SUM(CASE WHEN dr IS NOT NULL THEN dr * dr ELSE 0 END)"
            " AS DECIMAL(38,0))"
        ).alias("num"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return sums.select(
        "event_type",
        "n_days",
        F.when(
            F.col("den") > 0,
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 4),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("dw_stat"),
    ).orderBy("event_type")


@register(
    "agg_page_trend",
    # Page's L trend test (1963, public) — the ORDERED-alternative
    # member of the blocked-rank family: `agg_friedman_test` asks "do
    # the k treatments differ at all across blocks?"; Page's L asks
    # "do they INCREASE along a hypothesized order?" (here the
    # alphabetical event-type order, the deterministic convention both
    # engines share), exactly as `agg_jonckheere_terpstra` sharpens
    # `agg_kruskal_wallis` for unblocked groups.  Reuses friedman's
    # densified (type, day) grid and 2-SCALED mid-ranks; L·2 = Σ j·R2_j
    # is an exact HUGEINT/DECIMAL(38,0) integer; z uses the no-ties
    # Page moments (E[L] = n·k(k+1)²/4, Var[L] = n·k²(k+1)(k²−1)/144 —
    # the textbook normal approximation; mid-rank ties make it
    # conservative, documented), ONE shared double composition,
    # ROUND(4).
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), grid AS (
        SELECT t.event_type, dd.d, COALESCE(x.c, 0) AS c
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (SELECT DISTINCT d FROM daily) dd
        LEFT JOIN daily x ON x.event_type = t.event_type AND x.d = dd.d
    ), ranked AS (
        SELECT event_type, c,
               2 * RANK() OVER (PARTITION BY d ORDER BY c)
                 + COUNT(*) OVER (PARTITION BY d, c) - 1 AS r2
        FROM grid
    ), tr AS (
        SELECT event_type,
               DENSE_RANK() OVER (ORDER BY event_type) AS j,
               CAST(SUM(r2) AS BIGINT) AS rank_sum_x2
        FROM ranked GROUP BY event_type
    ), dims AS (
        SELECT CAST(COUNT(DISTINCT event_type) AS HUGEINT) AS k,
               CAST(COUNT(*) // COUNT(DISTINCT event_type) AS HUGEINT)
                 AS n
        FROM ranked
    ), lsum AS (
        SELECT CAST(SUM(CAST(j AS HUGEINT) * rank_sum_x2) AS HUGEINT)
                 AS l2
        FROM tr
    )
    SELECT t.event_type, CAST(t.j AS BIGINT) AS j_order,
           t.rank_sum_x2,
           CAST(s.l2 AS BIGINT) AS l_x2,
           CAST(m.n AS BIGINT) AS n_blocks,
           CASE WHEN m.k > 1 THEN
             ROUND(CAST(2 * s.l2 - m.n * m.k * (m.k + 1) * (m.k + 1)
                        AS DOUBLE)
                   / (4.0 * SQRT(CAST(m.n * m.k * m.k * (m.k + 1)
                                      * (m.k * m.k - 1) AS DOUBLE)
                                 / 144.0)), 4)
           ELSE NULL END AS z_stat
    FROM tr t CROSS JOIN dims m CROSS JOIN lsum s
    ORDER BY t.event_type
    """,
)
def agg_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ordered trend across the event types,
    blocked by day — the ordered-alternative sharpening of
    `agg_friedman_test` (the same relationship
    `agg_jonckheere_terpstra` bears to `agg_kruskal_wallis`, now on
    the BLOCKED grid): if the k types are hypothesized to rank in a
    fixed order (alphabetical here — a deterministic, engine-shared
    convention standing in for any domain ordering), L = Σ j·R_j
    concentrates the test's power on monotone separation that
    Friedman's omnibus Q dilutes across all alternatives.  The
    fixture's iid types sit at the null; the planted pytests pin the
    poles exactly — a latin-rotation grid (every type every rank
    equally often) gives z = 0 via identical rank sums, and a
    perfectly ordered grid drives L·2 to its hand-computed maximum
    n·k(k+1)(2k+1)/3.

    Exactness: reuses friedman's densified grid and 2-scaled mid-rank
    construction verbatim (missing cells are 0, blocks complete by
    construction); L·2 = Σ j·R2_j is an exact HUGEINT/DECIMAL(38,0)
    integer; z composes the no-ties Page moments
    (E[L] = n·k(k+1)²/4, Var[L] = n·k²(k+1)(k²−1)/144) in ONE shared
    double expression, ROUND(4) — mid-rank ties shrink the true
    variance slightly, so the normal z is conservative under heavy
    ties (documented; the law tests use tie-free grids where the
    moments are exact); a single-type corpus (k = 1) zeroes both the
    numerator and the variance, so z is NULL, the family's degenerate
    convention.

    Scale notes: identical to friedman — ONE corpus agg to the
    (type, day) rollup, densify via the bounded grid cross, ranks
    partitioned by day, k-row output (reviewed SINGLE on the bounded
    frames)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    from ..common import stage

    daily = stage(daily)
    types = daily.select("event_type").distinct()
    days = daily.select("d").distinct()
    grid = (
        types.crossJoin(days)
        .join(daily, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_rank = Window.partitionBy("d").orderBy("c")
    w_tie = Window.partitionBy("d", "c")
    ranked = grid.select(
        "event_type",
        (
            2 * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        ).alias("r2"),
    )
    w_j = Window.orderBy("event_type")
    tr = (
        ranked.groupBy("event_type")
        .agg(F.sum("r2").cast("long").alias("rank_sum_x2"))
        .select(
            "event_type",
            F.dense_rank().over(w_j).alias("j"),
            "rank_sum_x2",
        )
    )
    dims = ranked.agg(
        F.expr(
            "CAST(COUNT(DISTINCT event_type) AS DECIMAL(38,0))"
        ).alias("k"),
        F.expr(
            "CAST(COUNT(*) div COUNT(DISTINCT event_type)"
            " AS DECIMAL(38,0))"
        ).alias("n"),
    )
    lsum = tr.agg(
        F.expr(
            "CAST(SUM(CAST(j AS DECIMAL(38,0)) * rank_sum_x2)"
            " AS DECIMAL(38,0))"
        ).alias("l2")
    )
    return (
        tr.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(lsum))
        .select(
            "event_type",
            F.col("j").cast("long").alias("j_order"),
            "rank_sum_x2",
            F.col("l2").cast("long").alias("l_x2"),
            F.col("n").cast("long").alias("n_blocks"),
            # Degenerate-input guard (ADVICE r12 #3): with a single
            # event type (k = 1) both the numerator and the variance
            # term are 0, so the raw quotient is 0/0 = NaN on both
            # engines; the family convention (mood_median,
            # ansari_bradley, cliffs_delta, quade) is NULL.
            F.when(
                F.col("k") > 1,
                F.round(
                    F.expr(
                        "CAST(2 * l2 - n * k * (k + 1) * (k + 1)"
                        " AS DOUBLE)"
                    )
                    / (
                        4.0
                        * F.sqrt(
                            F.expr(
                                "CAST(n * k * k * (k + 1) * (k * k - 1)"
                                " AS DOUBLE)"
                            )
                            / 144.0
                        )
                    ),
                    4,
                ),
            ).alias("z_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_bullwhip_ratio",
    # Bullwhip ratio (Lee et al. 1997 demand-amplification measure,
    # public) per brand: CV²(weekly shipped quantity) over CV²(weekly
    # ordered quantity) — >1 means the fulfilment side amplifies
    # demand variability (batching), the fourth member of the
    # inventory quartet (croston forecasts, newsvendor stocks, EOQ
    # sizes; this one DIAGNOSES).  Weeks are epoch-day div 7 (engine-
    # neutral; DATE_TRUNC week conventions differ) and BOTH series are
    # ZERO-FILLED over the brand's combined [min, max] week span — a
    # week with no shipments is a zero-demand week, not a missing row
    # (without the spine a perfectly batched shipper's equal spikes
    # read as ZERO variance — caught by the planted law test at dev
    # time).  Both CV² terms are rationals of exact HUGEINT/
    # DECIMAL(38,0) moments over the densified series; the ratio is
    # ONE shared double composition, ROUND(4), NULL on degenerate
    # variance.
    oracle="""
    WITH ship0 AS (
      SELECT p.p_brand AS brand,
             (CAST(l.l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
             CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), ord0 AS (
      SELECT p.p_brand AS brand,
             (CAST(o.o_orderdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
             CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS q
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), spine AS (
      SELECT brand, UNNEST(generate_series(lo, hi)) AS wk
      FROM (SELECT brand, MIN(wk) AS lo, MAX(wk) AS hi
            FROM (SELECT brand, wk FROM ship0
                  UNION ALL SELECT brand, wk FROM ord0)
            GROUP BY 1)
    ), ship AS (
      SELECT s.brand, s.wk, COALESCE(x.q, 0) AS q
      FROM spine s LEFT JOIN ship0 x
        ON s.brand = x.brand AND s.wk = x.wk
    ), ord AS (
      SELECT s.brand, s.wk, COALESCE(x.q, 0) AS q
      FROM spine s LEFT JOIN ord0 x
        ON s.brand = x.brand AND s.wk = x.wk
    ), ms AS (
      SELECT brand, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(q) AS HUGEINT) AS s,
             CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS qq
      FROM ship GROUP BY 1
    ), mo AS (
      SELECT brand, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(q) AS HUGEINT) AS s,
             CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS qq
      FROM ord GROUP BY 1
    )
    SELECT ms.brand,
           CAST(ms.n AS BIGINT) AS n_weeks,
           CAST(ms.s AS BIGINT) AS units,
           CASE WHEN ms.s > 0 AND mo.s > 0 AND ms.n > 1
                     AND mo.n * mo.qq - mo.s * mo.s > 0
                THEN ROUND((CAST(ms.n * ms.qq - ms.s * ms.s AS DOUBLE)
                            / (CAST(ms.s AS DOUBLE) * CAST(ms.s AS DOUBLE)
                               * (CAST(ms.n AS DOUBLE) - 1)))
                           / (CAST(mo.n * mo.qq - mo.s * mo.s AS DOUBLE)
                              / (CAST(mo.s AS DOUBLE)
                                 * CAST(mo.s AS DOUBLE)
                                 * (CAST(mo.n AS DOUBLE) - 1))), 4)
                ELSE NULL END AS bullwhip_ratio
    FROM ms JOIN mo ON ms.brand = mo.brand
    ORDER BY ms.brand
    """,
)
def orders_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip ratio per brand — does the SHIPPING side amplify the
    variability of the ORDERING side?  The classic supply-chain
    demand-amplification diagnostic: CV²(weekly shipped units) /
    CV²(weekly ordered units); > 1 means batching/forecast-chasing
    inflates upstream variance (the bullwhip), ≈ 1 means the chain
    passes demand through.  Completes the inventory quartet:
    `orders_croston_demand` forecasts, `orders_newsvendor` and
    `orders_safety_stock` stock against variability, `orders_eoq`
    sizes batches — this one measures the variability amplification
    those policies must absorb.  Both weekly series are ZERO-FILLED
    over the brand's combined week span — a silent week is a
    zero-demand week, the opposite convention from
    `agg_durbin_watson`'s observed-days gaps, and here it is
    load-bearing: a perfectly batched shipper emits equal spikes whose
    observed-weeks-only variance is ZERO (the dev-time law test caught
    exactly that), while the honest zero-filled series shows the
    spike/quiet alternation the bullwhip measures.  The fixture ships
    each line at a per-line lag from its order date, which SPREADS
    order-week batches across ship weeks (ratio near 1, honest
    measurement); the planted pytest batches all shipping into every
    4th week and recovers a ratio ≫ 1, and an identical-series
    construction pins the ratio at exactly 1.0.

    Exactness: weekly quantity sums are exact integers at
    (brand, epoch-day-div-7) grain (engine-neutral week boundary —
    DATE_TRUNC('week') conventions differ between engines, the
    orders_seasonality lesson); the spine is a bounded integer
    sequence per brand; both n·Σq² − (Σq)² variance numerators and
    the s² scale terms ride as HUGEINT/DECIMAL(38,0); the ratio is
    ONE shared double composition, ROUND(4); NULL when either series
    is degenerate (single week, zero mean, zero order-side variance).

    Scale notes: two corpus-sized joins (line→part broadcast dim,
    line→orders keyed) each collapsing to the (brand × week) rollup in
    ONE partial+final agg; the zero-fill spine is a per-brand bounded
    sequence explode on the brand-sized bounds frame (the resample
    posture); the per-brand moment frames join on brand.  No windows."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    qty = F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)")
    ship0 = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr("datediff(l_shipdate, DATE '1970-01-01') div 7").alias(
                "wk"
            ),
        )
        .agg(F.sum(qty).alias("q"))
    )
    ord0 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr(
                "datediff(o_orderdate, DATE '1970-01-01') div 7"
            ).alias("wk"),
        )
        .agg(F.sum(qty).alias("q"))
    )
    from ..common import stage

    ship0 = stage(ship0)
    ord0 = stage(ord0)
    spine = (
        ship0.select("brand", "wk")
        .unionByName(ord0.select("brand", "wk"))
        .groupBy("brand")
        .agg(F.min("wk").alias("lo"), F.max("wk").alias("hi"))
        .select(
            "brand",
            F.explode(F.sequence("lo", "hi")).alias("wk"),
        )
    )
    ship = spine.join(ship0, ["brand", "wk"], "left").select(
        "brand", "wk", F.coalesce("q", F.lit(0)).alias("q")
    )
    ordw = spine.join(ord0, ["brand", "wk"], "left").select(
        "brand", "wk", F.coalesce("q", F.lit(0)).alias("q")
    )

    def moments(df):
        return df.groupBy("brand").agg(
            F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
            F.expr("CAST(SUM(q) AS DECIMAL(38,0))").alias("s"),
            F.expr(
                "CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0))"
            ).alias("qq"),
        )

    ms = moments(ship).select(
        "brand",
        F.col("n").alias("n_s"),
        F.col("s").alias("s_s"),
        F.col("qq").alias("q_s"),
    )
    mo = moments(ordw).select(
        "brand",
        F.col("n").alias("n_o"),
        F.col("s").alias("s_o"),
        F.col("qq").alias("q_o"),
    )
    return (
        ms.join(mo, "brand")
        .select(
            "brand",
            F.col("n_s").cast("long").alias("n_weeks"),
            F.col("s_s").cast("long").alias("units"),
            F.when(
                (F.col("s_s") > 0)
                & (F.col("s_o") > 0)
                & (F.col("n_s") > 1)
                & (F.expr("n_o * q_o - s_o * s_o") > 0),
                F.round(
                    (
                        F.expr("CAST(n_s * q_s - s_s * s_s AS DOUBLE)")
                        / (
                            F.expr("CAST(s_s AS DOUBLE)")
                            * F.expr("CAST(s_s AS DOUBLE)")
                            * (F.expr("CAST(n_s AS DOUBLE)") - 1)
                        )
                    )
                    / (
                        F.expr("CAST(n_o * q_o - s_o * s_o AS DOUBLE)")
                        / (
                            F.expr("CAST(s_o AS DOUBLE)")
                            * F.expr("CAST(s_o AS DOUBLE)")
                            * (F.expr("CAST(n_o AS DOUBLE)") - 1)
                        )
                    ),
                    4,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("bullwhip_ratio"),
        )
        .orderBy("brand")
    )



@register(
    "events_turning_points",
    # Turning-point randomness test (Kendall, public) on each event
    # type's daily volume series: T = strict local extrema among
    # interior days; under iid, E[T] = 2(n−2)/3 and
    # Var[T] = (16n − 29)/90 — the cheapest member of the series-
    # randomness family (`events_runs_test` reads delta signs,
    # `agg_durbin_watson` lag-1, `agg_ljung_box` lags 1-8; this one
    # counts direction changes).  T and the z numerator 3T − 2(n−2)
    # are exact integers; z is ONE shared double composition, ROUND(4),
    # NULL below n = 3.  Plateau days (an equal neighbor) are not
    # extrema — strict inequalities, documented.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             LAG(c) OVER (PARTITION BY event_type ORDER BY d) AS cp,
             LEAD(c) OVER (PARTITION BY event_type ORDER BY d) AS cn
      FROM daily
    ), agg AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN cp IS NOT NULL AND cn IS NOT NULL
                           AND ((c > cp AND c > cn)
                                OR (c < cp AND c < cn))
                      THEN 1 ELSE 0 END) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lagged GROUP BY 1
    )
    SELECT event_type, n AS n_days, t AS n_turning,
           CASE WHEN n >= 3
                THEN ROUND(CAST(3 * t - 2 * (n - 2) AS DOUBLE)
                           / (3.0 * SQRT(CAST(16 * n - 29 AS DOUBLE)
                                         / 90.0)), 4)
                ELSE NULL END AS z_stat
    FROM agg ORDER BY event_type
    """,
)
def events_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test per event type — is the daily volume series
    random, or does it change direction too rarely (trend/momentum) or
    too often (alternation/overcorrection)?  Counts strict interior
    local extrema T; an iid series has E[T] = 2(n−2)/3, so the z score
    positions the series on the trend↔alternation axis with zero
    model assumptions — the cheapest randomness screen in the family
    (`events_runs_test` dichotomizes deltas, `agg_durbin_watson`
    measures lag-1 magnitude; this one only reads direction changes).
    The planted pytests pin the poles exactly: a strictly monotone
    series has T = 0 (z most negative, hand-computed), a perfect
    alternation has T = n − 2 (every interior day an extremum, z
    positive, hand-computed).  On the real fixture the screen EARNS
    its keep: four types sit near the null but signup's sf0.001 daily
    series shows genuine direction-persistence (T = 9 vs
    E[T] = 18.7, z ≈ −4.3) — momentum the iid assumption misses,
    which is exactly what the test is for.

    Exactness: T and n are exact integers off the calendar rollup;
    the z numerator 3T − 2(n−2) is an exact integer and z is ONE
    shared double composition of it with the closed-form variance,
    ROUND(4); NULL below n = 3 (no interior day).  Plateau days (an
    equal neighbor) are NOT counted — strict extremum convention,
    shared by both engines (midrank-free, so no tie scaling needed).

    Scale notes: ONE corpus agg to the (type, day) rollup;
    LAG/LEAD windows are type-partitioned on the calendar-bounded
    frame ((type, day) unique by construction — window-audit-proven);
    output is ≤|types| rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "c",
        F.lag("c").over(w).alias("cp"),
        F.lead("c").over(w).alias("cn"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.expr(
            "CAST(SUM(CASE WHEN cp IS NOT NULL AND cn IS NOT NULL"
            " AND ((c > cp AND c > cn) OR (c < cp AND c < cn))"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("t"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("t").alias("n_turning"),
        F.when(
            F.col("n") >= 3,
            F.round(
                F.expr("CAST(3 * t - 2 * (n - 2) AS DOUBLE)")
                / (
                    3.0
                    * F.sqrt(
                        F.expr("CAST(16 * n - 29 AS DOUBLE)") / 90.0
                    )
                ),
                4,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("z_stat"),
    ).orderBy("event_type")


@register(
    "agg_cohens_d",
    # Cohen's d (1969, public) between low- and high-discount line
    # quantities — the PARAMETRIC effect size beside
    # `agg_cliffs_delta`'s ordinal one (same two groups, so the pair
    # cross-checks sign and magnitude class): standardized mean
    # difference over the pooled SD.  All four inner terms (mean-diff
    # numerator s1·n2 − s2·n1, the two n·Σx² − (Σx)² variance
    # numerators, and the scale products) are exact HUGEINT/
    # DECIMAL(38,0); d is ONE shared double composition, ROUND(6),
    # NULL on an empty group or zero pooled variance.
    oracle="""
    WITH base AS (
      SELECT CASE WHEN l_discount < 0.05 THEN 0 ELSE 1 END AS grp,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS x
      FROM lineitem
    ), m AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS HUGEINT)
               AS n1,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS HUGEINT)
               AS n2,
             CAST(SUM(CASE WHEN grp = 0 THEN x ELSE 0 END) AS HUGEINT)
               AS s1,
             CAST(SUM(CASE WHEN grp = 1 THEN x ELSE 0 END) AS HUGEINT)
               AS s2,
             CAST(SUM(CASE WHEN grp = 0 THEN CAST(x AS HUGEINT) * x
                      ELSE 0 END) AS HUGEINT) AS q1,
             CAST(SUM(CASE WHEN grp = 1 THEN CAST(x AS HUGEINT) * x
                      ELSE 0 END) AS HUGEINT) AS q2
      FROM base
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 2
                     AND (q1 * n1 - s1 * s1) * n2
                         + (q2 * n2 - s2 * s2) * n1 > 0
                THEN ROUND((CAST(s1 * n2 - s2 * n1 AS DOUBLE)
                            / CAST(n1 * n2 AS DOUBLE))
                           / SQRT(CAST((q1 * n1 - s1 * s1) * n2
                                       + (q2 * n2 - s2 * s2) * n1
                                       AS DOUBLE)
                                  / CAST(n1 * n2 * (n1 + n2 - 2)
                                         AS DOUBLE)), 6)
                ELSE NULL END AS cohens_d
    FROM m
    """,
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d between low-discount (< 5%) and high-discount (≥ 5%)
    line quantities — the parametric standardized-mean-difference
    effect size on the SAME two groups as `agg_cliffs_delta`, so the
    pair cross-checks: both must agree in sign, and the classic
    small/medium/large bands (|d| 0.2/0.5/0.8) should cohere with
    |δ|'s 0.15/0.33/0.47 (Romano's mapping) on any planted effect.
    The fixture's quantity ⊥ discount gives d ≈ 0 (honest null); the
    planted pytests pin identical multisets at d = 0.0 exactly and a
    +1-SD location shift at its hand-computed value.

    Exactness: group moments (n, Σx, Σx²) are exact integers; the
    mean-diff numerator s1·n2 − s2·n1 and pooled-SS numerator
    (q1·n1 − s1²)·n2 + (q2·n2 − s2²)·n1 ride as HUGEINT/DECIMAL(38,0)
    (q·n ≈ N²·x̄² crosses int64 near sf100); d is ONE shared double
    composition, ROUND(6); NULL on an empty group, n ≤ 2, or zero
    pooled variance.

    Scale notes: ONE corpus agg to a single six-sum row (map-side
    combined — the agg_welch_ttest scalar-exchange shape); everything
    after is a 1-row projection."""
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        F.when(F.col("l_discount") < 0.05, 0).otherwise(1).alias("grp"),
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("x"),
    )
    m = base.agg(
        F.expr(
            "CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)"
            " AS DECIMAL(38,0))"
        ).alias("n1"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)"
            " AS DECIMAL(38,0))"
        ).alias("n2"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 0 THEN x ELSE 0 END)"
            " AS DECIMAL(38,0))"
        ).alias("s1"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 1 THEN x ELSE 0 END)"
            " AS DECIMAL(38,0))"
        ).alias("s2"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 0 THEN CAST(x AS DECIMAL(38,0)) * x"
            " ELSE 0 END) AS DECIMAL(38,0))"
        ).alias("q1"),
        F.expr(
            "CAST(SUM(CASE WHEN grp = 1 THEN CAST(x AS DECIMAL(38,0)) * x"
            " ELSE 0 END) AS DECIMAL(38,0))"
        ).alias("q2"),
    )
    return m.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        F.when(
            (F.col("n1") > 0)
            & (F.col("n2") > 0)
            & (F.col("n1") + F.col("n2") > 2)
            & (
                F.expr(
                    "(q1 * n1 - s1 * s1) * n2 + (q2 * n2 - s2 * s2) * n1"
                )
                > 0
            ),
            F.round(
                (
                    F.expr("CAST(s1 * n2 - s2 * n1 AS DOUBLE)")
                    / F.expr("CAST(n1 * n2 AS DOUBLE)")
                )
                / F.sqrt(
                    F.expr(
                        "CAST((q1 * n1 - s1 * s1) * n2"
                        " + (q2 * n2 - s2 * s2) * n1 AS DOUBLE)"
                    )
                    / F.expr(
                        "CAST(n1 * n2 * (n1 + n2 - 2) AS DOUBLE)"
                    )
                ),
                6,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("cohens_d"),
    )


@register(
    "agg_quade_test",
    # Quade test (1979, public) — the blocked-rank family's WEIGHTED
    # member: `agg_friedman_test` gives every day-block equal vote;
    # Quade weights each block by the rank of its RANGE (bigger-spread
    # days carry more signal), which dominates Friedman's power at
    # small k.  Everything integer: within-block mid-ranks r2
    # (2-scaled, the friedman expr), block-range ranks Q2 (2-scaled
    # mid-ranks over the day frame), S4_ij = Q2·(r2 − (k+1))
    # (4-scaled products), so A·16 = ΣS4² and n·B·16 = Σ_j S4_j² are
    # exact HUGEINT/DECIMAL(38,0) and F = (n−1)·ΣS4_j² /
    # (n·ΣS4² − ΣS4_j²) is ONE double division of exact integers,
    # ROUND(4); NULL at the all-agreement pole (A == B — the textbook
    # convention treats it as a zero-denominator perfect
    # discrimination).
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), grid AS (
        SELECT t.event_type, dd.d, COALESCE(x.c, 0) AS c
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (SELECT DISTINCT d FROM daily) dd
        LEFT JOIN daily x ON x.event_type = t.event_type AND x.d = dd.d
    ), ranked AS (
        SELECT event_type, d, c,
               2 * RANK() OVER (PARTITION BY d ORDER BY c)
                 + COUNT(*) OVER (PARTITION BY d, c) - 1 AS r2
        FROM grid
    ), spread AS (
        SELECT d, MAX(c) - MIN(c) AS rng FROM grid GROUP BY d
    ), bw AS (
        SELECT d,
               2 * RANK() OVER (ORDER BY rng)
                 + COUNT(*) OVER (PARTITION BY rng) - 1 AS q2
        FROM spread
    ), dims AS (
        SELECT CAST(COUNT(DISTINCT event_type) AS HUGEINT) AS k,
               CAST(COUNT(DISTINCT d) AS HUGEINT) AS n
        FROM ranked
    ), s4 AS (
        SELECT r.event_type,
               CAST(b.q2 AS HUGEINT) * (r.r2 - (m.k + 1)) AS s4
        FROM ranked r JOIN bw b ON r.d = b.d CROSS JOIN dims m
    ), parts AS (
        SELECT event_type,
               CAST(SUM(s4) AS HUGEINT) AS s4_j,
               CAST(SUM(s4 * s4) AS HUGEINT) AS a16_j
        FROM s4 GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(a16_j) AS HUGEINT) AS a16,
               CAST(SUM(s4_j * s4_j) AS HUGEINT) AS b16n
        FROM parts
    )
    SELECT p.event_type,
           CAST(p.s4_j AS BIGINT) AS s_weighted_x4,
           CAST(m.k - 1 AS BIGINT) AS df1,
           CAST((m.k - 1) * (m.n - 1) AS BIGINT) AS df2,
           CASE WHEN m.n * t.a16 - t.b16n > 0
                THEN ROUND(CAST((m.n - 1) * t.b16n AS DOUBLE)
                           / CAST(m.n * t.a16 - t.b16n AS DOUBLE), 4)
                ELSE NULL END AS f_stat
    FROM parts p CROSS JOIN dims m CROSS JOIN tot t
    ORDER BY p.event_type
    """,
)
def agg_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade test — the blocked-rank comparison with RANGE-weighted
    blocks: `agg_friedman_test` treats a flat day (every type within a
    few events) and a wildly split day as equally informative; Quade
    ranks days by their within-day range and weights each day's
    centered type-ranks by that rank, concentrating power in the
    blocks that actually discriminate — the textbook recommendation
    over Friedman for small k.  F = (n−1)·B/(A−B) with
    S_ij = Q_i·(r_ij − (k+1)/2), F(k−1, (k−1)(n−1)) under the null.
    The fixture's iid types sit at the null; the planted pytests pin
    the rotation pole exactly (every S4_j = 0 because equal-range days
    share one mid-rank weight and the rotation zeroes each type's
    centered-rank sum → F = 0.0) and a consistent ordering rejects.

    Exactness: within-block mid-ranks r2 and block-range mid-ranks Q2
    are 2-scaled integers (the friedman construction, applied twice);
    S4 = Q2·(r2 − (k+1)) is an exact 4-scaled integer; A·16 = ΣS4²
    and n·B·16 = Σ_j(Σ_i S4)² ride as HUGEINT/DECIMAL(38,0) (S4 ≈
    2n·2k per cell ⇒ ΣS4² ≈ n³k³·16 crosses int64 near n ≈ 3e4
    blocks); the 16-scales cancel in F, which is ONE double division
    of exact integers, ROUND(4); NULL at A == B (all-agreement).

    Scale notes: the friedman posture plus one day-frame window —
    ONE corpus agg to the (type, day) rollup, bounded grid densify,
    day-partitioned rank window, calendar-sized range/weight frames,
    k-row output (reviewed SINGLE on the bounded frames)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    from ..common import stage

    daily = stage(daily)
    types = daily.select("event_type").distinct()
    days = daily.select("d").distinct()
    grid = (
        types.crossJoin(days)
        .join(daily, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce("c", F.lit(0)).alias("c"))
    )
    grid = stage(grid)
    w_rank = Window.partitionBy("d").orderBy("c")
    w_tie = Window.partitionBy("d", "c")
    ranked = grid.select(
        "event_type",
        "d",
        (
            2 * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        ).alias("r2"),
    )
    spread = grid.groupBy("d").agg((F.max("c") - F.min("c")).alias("rng"))
    w_brank = Window.orderBy("rng")
    w_btie = Window.partitionBy("rng")
    bw = spread.select(
        "d",
        (
            2 * F.rank().over(w_brank)
            + F.count(F.lit(1)).over(w_btie)
            - 1
        ).alias("q2"),
    )
    dims = ranked.agg(
        F.expr(
            "CAST(COUNT(DISTINCT event_type) AS DECIMAL(38,0))"
        ).alias("k"),
        F.expr("CAST(COUNT(DISTINCT d) AS DECIMAL(38,0))").alias("n"),
    )
    s4 = (
        ranked.join(F.broadcast(bw), "d")
        .crossJoin(F.broadcast(dims))
        .select(
            "event_type",
            F.expr(
                "CAST(q2 AS DECIMAL(38,0)) * (r2 - (k + 1))"
            ).alias("s4"),
        )
    )
    parts = s4.groupBy("event_type").agg(
        F.expr("CAST(SUM(s4) AS DECIMAL(38,0))").alias("s4_j"),
        F.expr("CAST(SUM(s4 * s4) AS DECIMAL(38,0))").alias("a16_j"),
    )
    tot = parts.agg(
        F.expr("CAST(SUM(a16_j) AS DECIMAL(38,0))").alias("a16"),
        F.expr("CAST(SUM(s4_j * s4_j) AS DECIMAL(38,0))").alias("b16n"),
    )
    return (
        parts.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("s4_j").cast("long").alias("s_weighted_x4"),
            (F.col("k") - 1).cast("long").alias("df1"),
            F.expr("CAST((k - 1) * (n - 1) AS BIGINT)").alias("df2"),
            F.when(
                F.expr("n * a16 - b16n") > 0,
                F.round(
                    F.expr("CAST((n - 1) * b16n AS DOUBLE)")
                    / F.expr("CAST(n * a16 - b16n AS DOUBLE)"),
                    4,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("f_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_adi_cv2",
    # Syntetos-Boylan demand classification (2005, public) per brand —
    # the decision layer over the inventory quartet: croston FORECASTS
    # intermittent demand, newsvendor STOCKS it, EOQ SIZES orders,
    # bullwhip DIAGNOSES amplification; this op decides WHICH method
    # applies by placing each brand in the (ADI, CV²) quadrant with
    # the published cutoffs ADI 1.32 / CV² 0.49: smooth, intermittent
    # (sparse-regular → Croston), erratic (dense-volatile), lumpy
    # (sparse-volatile — the hard class).  Weeks are epoch-day div 7
    # (engine-neutral, the bullwhip convention, CAST AS DATE first —
    # timestamp-typed dates make DuckDB date arithmetic an INTERVAL);
    # ADI = week-span / demand-weeks and CV² = (n·Σq² − (Σq)²)/(Σq)²
    # ride as exact integer rationals (quantities are integer-valued
    # doubles, CAST AS BIGINT exact), e6-floored for display; the
    # quadrant compares use the cross-multiplied INTEGER forms
    # (100·span ≥ 132·dw; 100·(n·Σq²−(Σq)²) ≥ 49·(Σq)²) so the class
    # is decided without ANY float.
    oracle="""
    WITH weekly AS (
      SELECT p.p_brand AS brand,
             date_diff('day', DATE '1970-01-01',
                       CAST(l.l_shipdate AS DATE)) // 7 AS wk,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), b AS (
      SELECT brand,
             CAST(COUNT(*) AS HUGEINT) AS dw,
             CAST(MAX(wk) - MIN(wk) + 1 AS HUGEINT) AS span,
             CAST(SUM(q) AS HUGEINT) AS s1,
             CAST(SUM(q * q) AS HUGEINT) AS s2
      FROM weekly GROUP BY brand
    )
    SELECT brand, CAST(dw AS BIGINT) AS n_demand_weeks,
           CAST(span AS BIGINT) AS n_span_weeks,
           CAST(span * 1000000 // dw AS BIGINT) AS adi_e6,
           CAST((dw * s2 - s1 * s1) * 1000000 // (s1 * s1) AS BIGINT)
             AS cv2_e6,
           CASE WHEN 100 * span >= 132 * dw THEN
                  CASE WHEN 100 * (dw * s2 - s1 * s1) >= 49 * s1 * s1
                       THEN 'lumpy' ELSE 'intermittent' END
                ELSE
                  CASE WHEN 100 * (dw * s2 - s1 * s1) >= 49 * s1 * s1
                       THEN 'erratic' ELSE 'smooth' END
           END AS demand_class
    FROM b ORDER BY brand
    """,
)
def orders_adi_cv2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan (ADI, CV²) demand classification per brand —
    which forecasting/stocking method applies: smooth (dense, stable —
    exponential smoothing works), intermittent (sparse, stable — use
    `orders_croston_demand`), erratic (dense, volatile), lumpy
    (sparse, volatile — the class where `orders_safety_stock`'s
    normal assumptions break).  ADI = span-weeks / demand-weeks,
    CV² = population variance over mean² of nonzero weekly demand,
    quadrant cutoffs 1.32 / 0.49 (the published values).

    Exactness: weekly quantities are exact BIGINTs (integer-valued
    doubles), so ADI and CV² are integer rationals — the quadrant is
    decided by cross-multiplied integer compares (100·span ≥ 132·dw;
    100·(n·Σq²−(Σq)²) ≥ 49·(Σq)²) and the e6 display values are
    single integer divisions; no float exists anywhere in the op.
    The fixture's dense near-uniform demand lands every brand in
    'smooth' honestly; the planted pytests pin one brand per
    quadrant through the exact integer poles.

    Scale notes: lineitem ⋈ broadcast part (the dim join), ONE
    map-combined agg to the (brand, week) rollup, ONE more to the
    ≤|brands|-row frame — the minimal-movement inventory-family
    shape; no window, no explode."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    weekly = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.expr(
                "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')"
                " div 7"
            ).alias("wk"),
            F.col("l_quantity").cast("long").alias("qv"),
        )
        .groupBy("brand", "wk")
        .agg(F.sum("qv").cast("long").alias("q"))
    )
    # DECIMAL(38,0) accumulators (the house int128 pattern): at sf10 a
    # brand's s1 ≈ 6e7 so s1²·1e6 ≈ 3.6e21 — past BIGINT (the ANSI
    # overflow the second-decade probe caught in-round), comfortably
    # inside DECIMAL(38,0)/HUGEINT.
    b = weekly.groupBy("brand").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("dw"),
        F.expr("CAST(MAX(wk) - MIN(wk) + 1 AS DECIMAL(38,0))").alias("span"),
        F.expr("CAST(SUM(q) AS DECIMAL(38,0))").alias("s1"),
        F.expr("CAST(SUM(q * q) AS DECIMAL(38,0))").alias("s2"),
    )
    return b.select(
        "brand",
        F.col("dw").cast("long").alias("n_demand_weeks"),
        F.col("span").cast("long").alias("n_span_weeks"),
        F.expr("span * 1000000 div dw").cast("long").alias("adi_e6"),
        F.expr("(dw * s2 - s1 * s1) * 1000000 div (s1 * s1)")
        .cast("long")
        .alias("cv2_e6"),
        F.expr(
            "CASE WHEN 100 * span >= 132 * dw THEN"
            "  CASE WHEN 100 * (dw * s2 - s1 * s1) >= 49 * s1 * s1"
            "       THEN 'lumpy' ELSE 'intermittent' END"
            " ELSE"
            "  CASE WHEN 100 * (dw * s2 - s1 * s1) >= 49 * s1 * s1"
            "       THEN 'erratic' ELSE 'smooth' END"
            " END"
        ).alias("demand_class"),
    ).orderBy("brand")
