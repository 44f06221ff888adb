"""§2.3 Joins (SURVEY.md).

Scale posture: dimension tables (nation, region, supplier, inline band
tables) are explicitly ``broadcast()`` — at 100 TB the fact side never
shuffles for those joins.  Fact⋈fact equi-joins shuffle on the join key and
rely on AQE for skew splitting.  The theta/interval joins carry an explicit
note: they plan as BroadcastNestedLoopJoin, acceptable only because one side
is guaranteed tiny; an unbounded theta join would be O(n·m) and is rejected
by design (SURVEY.md §2.10 scale rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table


@register(
    "join_inner_hash",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst picks SMJ/shuffled-hash, AQE may convert to
    broadcast at runtime when the filtered side is small."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT n.n_name, r.r_name, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema enrichment: both dims broadcast → zero fact shuffles
    before the aggregate (the 100 TB-safe plan for dims of bounded size)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (null-extended non-matches)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return o.join(n, o.s_nationkey == n.n_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@register(
    "join_full",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         big_ord  AS (SELECT o_custkey, COUNT(*) AS n_big
                      FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
    SELECT b.c_custkey, b.c_acctbal, g.o_custkey, g.n_big
    FROM big_cust b FULL JOIN big_ord g ON b.c_custkey = g.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — null extension on both sides."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big_cust = c.where(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    big_ord = (
        o.where(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    return big_cust.join(big_ord, big_cust.c_custkey == big_ord.o_custkey, "full")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi — existence filter; never duplicates left rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti — customers with no high-value order (NOT EXISTS).

    The >300000 filter keeps the result non-trivially non-empty at every sf
    (an unfiltered variant returns 0 rows — every customer has an order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _price_bands(spark: SparkSession) -> DataFrame:
    """Tiny inline dimension for non-equi joins (always broadcast)."""
    return spark.createDataFrame(
        [
            ("budget", 0.0, 910.0),
            ("mid", 910.0, 940.0),
            ("premium", 940.0, 970.0),
            ("luxury", 970.0, 1000.0),
        ],
        "band string, lo double, hi double",
    )


_BANDS_SQL = """(VALUES ('budget', 0.0, 910.0), ('mid', 910.0, 940.0),
                        ('premium', 940.0, 970.0), ('luxury', 970.0, 1000.0))
                AS b(band, lo, hi)"""


@register(
    "join_theta_range",
    oracle=f"""
    SELECT b.band, COUNT(*) AS n_parts,
           CAST(ROUND(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
    FROM part p JOIN {_BANDS_SQL}
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join against a tiny broadcast band table.

    Plans as BroadcastNestedLoopJoin — O(n·|bands|), safe because the band
    side is constant-size.  Unbounded theta joins are rejected by design.
    """
    p = load_table(spark, sf_dir, "part")
    b = F.broadcast(_price_bands(spark))
    cond = (p.p_retailprice >= b.lo) & (p.p_retailprice < b.hi)
    return (
        p.join(b, cond)
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum(F.col("p_retailprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.mseg
    FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment AS mseg FROM customer) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny sets (5 × 5)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    segs = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("mseg"))
        .distinct()
    )
    return r.crossJoin(segs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Generic as-of join: for each left row, the nearest right values at
    or before (``direction="backward"``) / at or after (``"forward"``)
    the left row's ``on`` within the same ``by`` keys (left join).

    Spark has no native ASOF JOIN; the scalable formulation is the
    union+window trick: tag both sides, union, then ``last(col, True)``
    over ``(by ORDER BY on, side)`` rows-unbounded-preceding picks the most
    recent right value at or before each left row.  One shuffle on ``by``,
    no theta join, no row explosion — O(n log n) per key group and safe at
    100 TB (vs the O(n·m) range-join alternative).  ``forward`` is the
    same window over descending ``on``.

    ``tolerance`` bounds the match gap (pandas ``merge_asof`` semantics):
    a Column/literal comparable with ``left.on - right.on`` — a number
    for numeric ``on``, ``F.expr("INTERVAL 1 HOUR")`` for timestamps.
    Matches farther than the tolerance become NULLs, evaluated AFTER the
    window (no extra shuffle).

    Column contract: ``left`` and ``right`` must not share payload names
    (rename first); right should be unique per ``(by, on)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns if c not in by and c != on]
    rcols = [c for c in right.columns if c not in by and c != on]
    matched_on = "__asof_on"
    r = right.select(
        *by, on, F.lit(0).alias("__side"),
        F.col(on).alias(matched_on),
        *rcols,
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    l = left.select(
        *by, on, F.lit(1).alias("__side"),
        F.lit(None).cast(dict(right.dtypes)[on]).alias(matched_on),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in rcols],
        *lcols,
    )
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = r.unionByName(l)
    for c in (matched_on, *rcols):
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.where(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        gap = (
            F.col(on) - F.col(matched_on)
            if direction == "backward"
            else F.col(matched_on) - F.col(on)
        )
        within = F.col(matched_on).isNotNull() & (gap <= tolerance)
        for c in rcols:
            out = out.withColumn(
                c, F.when(within, F.col(c)).otherwise(F.lit(None))
            )
    return out.drop(matched_on)


@register(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.ts, p.value, c.click_ts
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest click at or before
    it (DuckDB expresses the same natively with ASOF LEFT JOIN)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    # ns-precision ts → cross-side ties effectively impossible; the __side
    # ordering inside asof_join still resolves p.ts == c.ts deterministically
    # (click first ⇒ it counts, matching ASOF's >= semantics).
    return asof_join(purchases, clicks, on="ts", by=["user_id"]).select(
        "user_id", "ts", "value", "click_ts"
    )


@register(
    "join_asof_fwd",
    # DuckDB's ASOF direction is set by the comparison operator: `<=`
    # selects the NEAREST right row at-or-after the left ts — the exact
    # twin of direction="forward".
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.ts, p.value, c.click_ts
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts <= c.click_ts
    """,
)
def join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the user's EARLIEST click at
    or after it — the "next event" lookup (follow-up attribution), the
    mirror of join_asof's "latest prior event".  Same single-shuffle
    union-window plan; only the frame direction flips."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases, clicks, on="ts", by=["user_id"], direction="forward"
    ).select("user_id", "ts", "value", "click_ts")


_PERIODS_SQL = """(VALUES ('wk1', TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08'),
                          ('wk2', TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15'),
                          ('mid', TIMESTAMP '2024-01-10', TIMESTAMP '2024-01-20'),
                          ('wk4', TIMESTAMP '2024-01-22', TIMESTAMP '2024-01-29'))
                  AS p(period, p_start, p_end)"""


@register(
    "join_interval",
    oracle=f"""
    SELECT p.period, e.event_type, COUNT(*) AS n_events
    FROM events e JOIN {_PERIODS_SQL}
      ON e.ts >= p.p_start AND e.ts < p.p_end
    GROUP BY p.period, e.event_type
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: events falling inside (possibly overlapping)
    periods.  Broadcast NL against the tiny period table; a fact⋈fact
    interval join would instead bucket both sides by coarse time grain and
    equi-join on the bucket before the range predicate (documented pattern,
    O(n·m) avoided)."""
    e = load_table(spark, sf_dir, "events")
    periods = spark.createDataFrame(
        [
            ("wk1", "2024-01-01", "2024-01-08"),
            ("wk2", "2024-01-08", "2024-01-15"),
            ("mid", "2024-01-10", "2024-01-20"),
            ("wk4", "2024-01-22", "2024-01-29"),
        ],
        "period string, p_start string, p_end string",
    ).select(
        "period",
        F.col("p_start").cast("timestamp").alias("p_start"),
        F.col("p_end").cast("timestamp").alias("p_end"),
    )
    cond = (e.ts >= periods.p_start) & (e.ts < periods.p_end)
    return (
        e.join(F.broadcast(periods), cond)
        .groupBy("period", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "join_interval_bucketed",
    # Oracle is a DIRECT range join (DuckDB plans IEJoin) — an independent
    # formulation of the same semantics, so the bucket decomposition is
    # verified, not assumed.
    oracle="""
    WITH iv AS (
      SELECT user_id, MIN(ts) AS w_start, MIN(ts) + INTERVAL 2 HOUR AS w_end
      FROM events GROUP BY user_id
    ), e AS (SELECT ts FROM events WHERE event_type = 'error')
    SELECT iv.user_id, CAST(COUNT(*) AS BIGINT) AS n_errors
    FROM iv JOIN e ON e.ts >= iv.w_start AND e.ts < iv.w_end
    GROUP BY iv.user_id
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact interval join via time-bucket equi-join — the 100 TB
    answer to `join_interval`'s documented O(n·m) caveat.

    Semantics: per user, count ALL error events (any user) inside that
    user's first-2-hours "onboarding window".  Both sides are
    fact-derived (user-count-sized intervals, corpus-sized points), so
    neither broadcasts at scale and a theta join would be a
    nested-loop disaster.  The decomposition: each interval explodes
    into the ~3 hour buckets it covers (`sequence` over the hour
    grid), each point computes its single hour bucket, the join is an
    EQUI-join on the bucket key (shuffle-hash/SMJ, skew-safe via AQE),
    and the residual `ts ∈ [w_start, w_end)` filters bucket-mates
    outside the interval.  A point's bucket is unique, so no pair is
    produced twice — no dedup step.  Bucket grain is the tuning knob:
    ~median interval width keeps the explode factor O(1) (here 3×).

    The oracle formulates the same query as a direct range join
    (DuckDB's IEJoin) — two independent algorithms agreeing on the
    hash, the same verification design as dedup_clusters."""
    e = load_table(spark, sf_dir, "events")
    iv = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 2 HOURS"))
    )
    ivb = iv.select(
        "user_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("w_start")),
                F.date_trunc("hour", F.col("w_end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    err = e.where(F.col("event_type") == "error").select(
        F.col("ts").alias("e_ts"), F.date_trunc("hour", F.col("ts")).alias("bucket")
    )
    return (
        ivb.join(err, "bucket")
        .where((F.col("e_ts") >= F.col("w_start")) & (F.col("e_ts") < F.col("w_end")))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_errors"))
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.ts, p.value,
           CASE WHEN c.click_ts IS NOT NULL
                 AND p.ts - c.click_ts <= INTERVAL 1 HOUR
                THEN c.click_ts END AS click_ts
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour tolerance (pandas ``merge_asof``
    ``tolerance=`` semantics): each purchase matches the user's latest
    click at or before it ONLY if that click is within the hour —
    stale matches become NULLs, rows are kept.  The attribution-window
    variant of `join_asof`; exercises the helper's tolerance path with
    a hard oracle (DuckDB native ASOF + a gap mask — an independent
    formulation).

    Scale notes: identical plan to `join_asof` — the union+window trick,
    ONE shuffle on user_id; the tolerance mask is a post-window
    projection, zero extra exchanges (vs the naive range-join
    formulation, which is O(n·m) per key)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )


@register(
    "join_asof_nearest",
    # Gap comparison is timestamp subtraction on BOTH sides (µs-exact
    # INTERVAL compare — NTZ-safe wall-clock field math; no epoch
    # materialization, no float).  DuckDB's forward ASOF (<=) admits an
    # equal-ts click that the engine's strictly-after following frame
    # excludes, but the backward side also holds that click at gap 0 and
    # ties resolve backward in both engines — outputs identical.
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ), b AS (
      SELECT p.user_id, p.ts, p.value, c.click_ts AS bts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.click_ts
    ), f AS (
      SELECT p.user_id, p.ts, c.click_ts AS fts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts <= c.click_ts
    )
    SELECT b.user_id, b.ts, b.value,
           CASE WHEN fts IS NULL THEN bts
                WHEN bts IS NULL THEN fts
                WHEN b.ts - bts <= fts - b.ts THEN bts
                ELSE fts END AS click_ts,
           CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                WHEN fts IS NULL THEN 'backward'
                WHEN bts IS NULL THEN 'forward'
                WHEN b.ts - bts <= fts - b.ts THEN 'backward'
                ELSE 'forward' END AS direction
    FROM b JOIN f ON b.user_id = f.user_id AND b.ts = f.ts
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join: for each purchase, the click closest in time
    in EITHER direction (pandas ``merge_asof(direction='nearest')``),
    ties resolved toward the earlier click — completes the asof family
    (backward `join_asof`, forward `join_asof_fwd`, bounded
    `join_asof_tolerance`).

    Single-pass formulation: ONE union + ONE shuffle on user_id carries
    BOTH directions — the backward candidate from a preceding-frame
    ``last(ignorenulls)`` and the forward candidate from a
    following-frame ``first(ignorenulls)`` over the same ascending
    (ts, side) sort.  No second pass, no self-join of two asof results,
    no range join.  At 100 TB this is the same cost as ONE directional
    asof join.

    Purchases are unique per (user_id, ts) at ns precision — the
    oracle's (user_id, ts) re-join relies on that (documented, not
    load-bearing for the engine side)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("__side"),
        F.col("ts").alias("__cand"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("__side"),
        F.lit(None).cast(dict(e.dtypes)["ts"]).alias("__cand"),
        "value",
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = (
        clicks.unionByName(purchases)
        .withColumn("__b", F.last("__cand", ignorenulls=True).over(wb))
        .withColumn("__f", F.first("__cand", ignorenulls=True).over(wf))
        .where(F.col("__side") == 1)
    )
    b, f = F.col("__b"), F.col("__f")
    back_wins = (F.col("ts") - b) <= (f - F.col("ts"))
    return u.select(
        "user_id",
        "ts",
        "value",
        F.when(f.isNull(), b)
        .when(b.isNull(), f)
        .when(back_wins, b)
        .otherwise(f)
        .alias("click_ts"),
        F.when(b.isNull() & f.isNull(), F.lit(None).cast("string"))
        .when(f.isNull(), "backward")
        .when(b.isNull(), "forward")
        .when(back_wins, "backward")
        .otherwise("forward")
        .alias("direction"),
    )


@register(
    "join_geo_grid",
    # Derived integer centi-degree coordinates (the fixtures carry no
    # geo columns; the recipe is a shared constant of both engines) and
    # a pure-integer distance predicate: dlat^2 + dlon^2 <= 100^2
    # centi-degrees^2 (a 1-degree radius).  The oracle states the
    # SEMANTICS as the naive cross-filter; the engine side must produce
    # the same rows from grid-bucketed candidates only.
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               CAST((c_custkey * 7919) % 12001 - 6000 AS BIGINT) AS lat,
               CAST((c_custkey * 104729) % 36001 - 18000 AS BIGINT) AS lon
        FROM customer
    ), s AS (
        SELECT s_suppkey,
               CAST((s_suppkey * 7919 + 37 + s_suppkey % 31) % 12001 - 6000
                    AS BIGINT) AS lat,
               CAST((s_suppkey * 104729 + 53 + s_suppkey % 47) % 36001 - 18000
                    AS BIGINT) AS lon
        FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           CAST((c.lat - s.lat)*(c.lat - s.lat)
                + (c.lon - s.lon)*(c.lon - s.lon) AS BIGINT) AS dist2_e4
    FROM c JOIN s
      ON (c.lat - s.lat)*(c.lat - s.lat)
         + (c.lon - s.lon)*(c.lon - s.lon) <= 10000
    """,
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial distance join: customers within 1 degree of
    a supplier.  The scale pattern is the point: bucket both sides into
    radius-sized grid cells, replicate the SMALLER side into its 3x3
    cell neighborhood, equi-join on the cell id, then apply the exact
    distance predicate — the standard turn-a-distance-join-into-an-
    equi-join recipe (same family as ``join_interval_bucketed`` for
    time ranges).

    Scale notes: no cartesian anywhere — the only join is a hash join
    on (cell_lat, cell_lon); the 9x replication lands on the supplier
    (dim) side, never the customer (fact) side.  Cell ids come from
    integer `div` after a +18000 shift (truncation toward zero would
    make cell 0 double-width at the sign boundary — the classic
    geohash-at-the-equator bug, avoided in integer space).  Skewed
    cells (urban clustering in real data) are the documented risk:
    cap/salt hot cells via ``detect_hot_keys``; with the coprime
    multiplier recipe here the spread is uniform by construction."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 12001 - 6000).alias("lat"),
        ((F.col("c_custkey") * 104729) % 36001 - 18000).alias("lon"),
    )
    # The supplier side carries a key-dependent jitter (37 + k%31,
    # 53 + k%47) so matched distances VARY and some near pairs exceed
    # the radius — without it every match would be an exact-identity
    # collision at distance 0 and neither the predicate nor the
    # neighbor-cell logic would be exercised (vacuity audited at
    # sf0.01: dist2 spans many values, both match and near-miss exist).
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (
            (F.col("s_suppkey") * 7919 + 37 + F.col("s_suppkey") % 31) % 12001
            - 6000
        ).alias("lat"),
        (
            (F.col("s_suppkey") * 104729 + 53 + F.col("s_suppkey") % 47) % 36001
            - 18000
        ).alias("lon"),
    )
    # Cell = radius-sized square; +18000 shift keeps the div operand
    # non-negative so integer division == floor division.
    c_cells = c.select(
        "c_custkey",
        F.col("lat").alias("c_lat"),
        F.col("lon").alias("c_lon"),
        F.expr("(lat + 18000) div 100").alias("cell_lat"),
        F.expr("(lon + 18000) div 100").alias("cell_lon"),
    )
    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    s_cells = (
        s.select(
            "s_suppkey",
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
            F.expr("(lat + 18000) div 100").alias("s_cell_lat0"),
            F.expr("(lon + 18000) div 100").alias("s_cell_lon0"),
        )
        .withColumn("dx", off)
        .withColumn("dy", off)
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.col("s_cell_lat0") + F.col("dx")).alias("cell_lat"),
            (F.col("s_cell_lon0") + F.col("dy")).alias("cell_lon"),
        )
    )
    dist2 = (F.col("c_lat") - F.col("s_lat")) * (F.col("c_lat") - F.col("s_lat")) + (
        F.col("c_lon") - F.col("s_lon")
    ) * (F.col("c_lon") - F.col("s_lon"))
    return (
        c_cells.join(s_cells, ["cell_lat", "cell_lon"])
        .where(dist2 <= 10000)
        .select(
            "c_custkey",
            "s_suppkey",
            dist2.cast("long").alias("dist2_e4"),
        )
    )


@register(
    "join_lateral_topk",
    # True correlated LATERAL subquery with ORDER BY + LIMIT — the SQL
    # surface form of per-group top-k (Spark 3.2+/4 LATERAL join;
    # Catalyst rewrites it to the same windowed plan topk_per_group
    # declares directly).  Identical SQL shape runs on both engines.
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join: for every nation, its top-2 customers by account
    balance via a correlated subquery — the SQL surface users reach for
    before they learn the window-function rewrite (``topk_per_group``).

    The lateral subquery ranks explicitly (row_number + rn <= 2)
    instead of ORDER BY + LIMIT.  The LIMIT form is a measured cluster
    hazard (caught by tools/audit_windows.py, r12): Catalyst
    decorrelates it into an ORDERLESS ``row_number() OVER (PARTITION BY
    c_nationkey)`` above a global Sort — per-nation top-2 then depends
    on the pre-sorted rows surviving a hash exchange in order, which
    holds in local mode (mapId-ordered fetch) but is NOT guaranteed
    under multi-executor arrival-order shuffle reads.  The explicit
    window decorrelates into the safe shape (partition c_nationkey,
    ORDER BY inside the window spec) and drops the rangepartition
    exchange the LIMIT form needed — one shuffle instead of two.

    Scale notes: Catalyst decorrelates to a partitioned rank — NOT a
    per-outer-row re-execution; the executed plan is the same
    shuffle-on-nationkey + bounded window shape as topk_per_group.
    Total-order tiebreak (c_custkey) keeps the rank deterministic on
    both engines."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n JOIN LATERAL (
            SELECT c_name, c_acctbal FROM (
                SELECT c_name, c_acctbal,
                       row_number() OVER (
                           ORDER BY c_acctbal DESC, c_custkey) AS rn
                FROM customer
                WHERE c_nationkey = n.n_nationkey) ranked
            WHERE rn <= 2) c
        """
    )
