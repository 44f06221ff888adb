"""Ordinal / rank statistics and cooperative attribution (r8 batch) —
SURVEY §2.26.

Spearman rank correlation over bounded value domains, Kendall tau-b on
the calendar rollup, and exact Shapley-value channel attribution.  The
engine-wide exactness discipline applies: every decision value is
integer arithmetic (doubled average ranks, concordance counts,
factorial-scaled Shapley numerators) or a fixed tree of IEEE ops over
identical integers — never an order-dependent float accumulation.

Reference parity [K]: no citation into /root/reference possible (mirror
empty, SURVEY.md §0); these extend the exact-statistics family with the
rank-based tier every analytics engine carries (CORR_SPEARMAN /
KENDALL / attribution models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table

#: $10k line-amount buckets for the Spearman y-axis: the fixture's
#: l_extendedprice is a unit-price draw (~$900–$105k, a catalog DOMAIN
#: bound), so amount = quantity · extendedprice spans ≤ $5.25M and the
#: y marginal is ≤~525 rows at every scale.  A first draft correlated
#: quantity against extendedprice alone — the fixture draws them
#: independently (rho ≈ 0.005, a vacuous statistic; non-degeneracy
#: audit), so the amount pairing is the decisive fixture.
_SP_BUCKET_CENTS = 1_000_000

_D38 = "decimal(38,0)"


@register(
    "agg_spearman_corr",
    # Spearman rank correlation per returnflag between quantity and the
    # $1k price bucket, computed entirely on the bounded (flag, x, y)
    # cell rollup: tie-averaged ranks are carried DOUBLED (2·avg rank =
    # 2·cum_before + ties + 1, an integer), the five sufficient sums
    # are HUGEINT, and rho is a fixed IEEE tree over those integers.
    oracle=f"""
    WITH cells AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(l_quantity AS BIGINT)
                   * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   // {_SP_BUCKET_CENTS} AS y,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2, 3
    ), xm AS (
        SELECT flag, x, 2 * COALESCE(SUM(cx) OVER (
                   PARTITION BY flag ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cx + 1 AS drx
        FROM (SELECT flag, x, SUM(c) AS cx FROM cells GROUP BY 1, 2)
    ), ym AS (
        SELECT flag, y, 2 * COALESCE(SUM(cy) OVER (
                   PARTITION BY flag ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cy + 1 AS dry
        FROM (SELECT flag, y, SUM(c) AS cy FROM cells GROUP BY 1, 2)
    ), s AS (
        SELECT cells.flag,
               CAST(SUM(c) AS HUGEINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(CAST(c AS HUGEINT) * drx) AS HUGEINT) AS sdx,
               CAST(SUM(CAST(c AS HUGEINT) * dry) AS HUGEINT) AS sdy,
               CAST(SUM(CAST(c AS HUGEINT) * drx * drx) AS HUGEINT) AS sdxx,
               CAST(SUM(CAST(c AS HUGEINT) * dry * dry) AS HUGEINT) AS sdyy,
               CAST(SUM(CAST(c AS HUGEINT) * drx * dry) AS HUGEINT) AS sdxy
        FROM cells
        JOIN xm ON cells.flag = xm.flag AND cells.x = xm.x
        JOIN ym ON cells.flag = ym.flag AND cells.y = ym.y
        GROUP BY 1
    )
    SELECT flag AS l_returnflag,
           CAST(n AS BIGINT) AS n,
           n_cells,
           ROUND(CAST(n * sdxy - sdx * sdy AS DOUBLE)
                 / (sqrt(CAST(n * sdxx - sdx * sdx AS DOUBLE))
                    * sqrt(CAST(n * sdyy - sdy * sdy AS DOUBLE))), 6)
               AS spearman_rho
    FROM s ORDER BY l_returnflag
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line quantity and the $10k
    line-amount bucket (quantity × unit price), per returnflag —
    Pearson on tie-averaged ranks, with the ranks never materialized
    per row: both marginals have DOMAIN-bounded cardinality (quantity
    1–50, amount buckets ≤~525), so ranks are derived on the marginal
    rollups as the exact
    integer doubled average rank 2·cum_before + ties + 1 (positions
    s..s+t−1 average to s+(t−1)/2; doubling keeps it integral and the
    2s cancel in rho).  The five sufficient sums are decimal(38,0) /
    HUGEINT over the (flag, x, y) CELL rollup, and rho is ONE fixed
    IEEE expression over those integers (overflow envelope: n·Σc·drx²
    ≤ 4n³ < 10³⁸ holds past sf10000).

    Scale notes: corpus-grain work is ONE map-side-combined hash
    aggregate to ≤3×50×525 cells; the marginal cum-windows run
    partitioned by flag over ≤525-row rollups; the two rank joins are
    rollup-to-rollup (AQE broadcasts them); the final per-flag
    aggregate is 3 groups.  Binning IS the scale design — exact
    per-distinct-price Spearman would sort the full value domain."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("x"),
            F.expr(
                "(CAST(l_quantity AS BIGINT)"
                " * CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
                f" div {_SP_BUCKET_CENTS}"
            ).alias("y"),
        )
        .groupBy("flag", "x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def marginal(col: str, dr: str) -> DataFrame:
        w = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            cells.groupBy("flag", col)
            .agg(F.sum("c").alias("cm"))
            .select(
                "flag",
                col,
                (
                    2 * F.coalesce(F.sum("cm").over(w), F.lit(0))
                    + F.col("cm")
                    + 1
                ).alias(dr),
            )
        )

    xm = marginal("x", "drx")
    ym = marginal("y", "dry")
    c38 = F.col("c").cast(_D38)
    s = (
        cells.join(xm, ["flag", "x"])
        .join(ym, ["flag", "y"])
        .groupBy("flag")
        .agg(
            F.sum("c").cast(_D38).alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(c38 * F.col("drx")).cast(_D38).alias("sdx"),
            F.sum(c38 * F.col("dry")).cast(_D38).alias("sdy"),
            F.sum(c38 * F.col("drx") * F.col("drx")).cast(_D38).alias("sdxx"),
            F.sum(c38 * F.col("dry") * F.col("dry")).cast(_D38).alias("sdyy"),
            F.sum(c38 * F.col("drx") * F.col("dry")).cast(_D38).alias("sdxy"),
        )
    )
    num = (F.col("n") * F.col("sdxy") - F.col("sdx") * F.col("sdy")).cast(
        "double"
    )
    varx = (F.col("n") * F.col("sdxx") - F.col("sdx") * F.col("sdx")).cast(
        "double"
    )
    vary = (F.col("n") * F.col("sdyy") - F.col("sdy") * F.col("sdy")).cast(
        "double"
    )
    return s.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("long").alias("n"),
        "n_cells",
        F.round(num / (F.sqrt(varx) * F.sqrt(vary)), 6).alias(
            "spearman_rho"
        ),
    ).orderBy("l_returnflag")


@register(
    "agg_kendall_tau",
    # Kendall tau-b between monthly order count and monthly revenue:
    # the month rollup is calendar-bounded (~80 rows), so the pair grid
    # (~3.2k pairs) is enumerable exactly; concordant / discordant /
    # tie counts are integers and tau-b is ONE IEEE tree over them.
    oracle="""
    WITH m AS (
        SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
               CAST(COUNT(*) AS BIGINT) AS no,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ), p AS (
        SELECT SUM(CASE WHEN (a.no - b.no) * (a.rev - b.rev) > 0
                        THEN 1 ELSE 0 END) AS concordant,
               SUM(CASE WHEN (a.no - b.no) * (a.rev - b.rev) < 0
                        THEN 1 ELSE 0 END) AS discordant,
               SUM(CASE WHEN a.no = b.no THEN 1 ELSE 0 END) AS ties_x,
               SUM(CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END) AS ties_y,
               COUNT(*) AS n_pairs
        FROM m a JOIN m b ON a.mon < b.mon
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_months,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CAST(ties_x AS BIGINT) AS ties_x,
           CAST(ties_y AS BIGINT) AS ties_y,
           ROUND(CAST(concordant - discordant AS DOUBLE)
                 / (sqrt(CAST(n_pairs - ties_x AS DOUBLE))
                    * sqrt(CAST(n_pairs - ties_y AS DOUBLE))), 6) AS tau_b
    FROM p
    """,
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank association between monthly order volume and
    monthly revenue — the trend-agreement readout that, unlike Pearson,
    is invariant to any monotone transform of either series.  The month
    rollup is CALENDAR-bounded, so the exact O(m²) pair enumeration
    (~3.2k pairs at every corpus size) is deliberate: concordant,
    discordant, and per-axis tie counts are exact integers, and tau-b =
    (C−D)/√((n₀−t_x)(n₀−t_y)) is ONE fixed IEEE tree over them.

    Scale notes: corpus-grain work is ONE hash aggregate to the month
    rollup; the pair grid is a broadcast self-join of that ≤~100-row
    frame (reviewed BNL — both sides calendar-bounded, the
    `agg_theilsen_trend` posture) and the result is a reviewed SINGLE
    1-row frame.  A per-event Kendall would be O(n²) — rank-correlating
    the bounded rollup is the 100 TB design, not a shortcut."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("mon")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("no"),
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            )
            .cast("long")
            .alias("rev"),
        )
    )
    a = m.alias("a")
    b = m.alias("b")
    prod = (F.col("a.no") - F.col("b.no")) * (
        F.col("a.rev") - F.col("b.rev")
    )
    p = (
        a.join(F.broadcast(b), F.col("a.mon") < F.col("b.mon"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("concordant"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("discordant"),
            F.sum(
                F.when(F.col("a.no") == F.col("b.no"), 1).otherwise(0)
            ).alias("ties_x"),
            F.sum(
                F.when(F.col("a.rev") == F.col("b.rev"), 1).otherwise(0)
            ).alias("ties_y"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    n_months = m.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return (
        p.join(F.broadcast(n_months))
        .select(
            "n_months",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("concordant").cast("long").alias("concordant"),
            F.col("discordant").cast("long").alias("discordant"),
            F.col("ties_x").cast("long").alias("ties_x"),
            F.col("ties_y").cast("long").alias("ties_y"),
            F.round(
                (F.col("concordant") - F.col("discordant")).cast("double")
                / (
                    F.sqrt(
                        (F.col("n_pairs") - F.col("ties_x")).cast("double")
                    )
                    * F.sqrt(
                        (F.col("n_pairs") - F.col("ties_y")).cast("double")
                    )
                ),
                6,
            ).alias("tau_b"),
        )
    )


#: Channel → coalition bit for the Shapley game (the 4 non-conversion
#: event types; 'purchase' is the conversion itself).
_SHAP_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))

#: |T|! · (n−1−|T|)! Shapley weights for n=4 (denominator 4! = 24).
_SHAP_W = {0: 6, 1: 2, 2: 2, 3: 6}


@register(
    "events_shapley_attribution",
    # Exact Shapley-value channel attribution over the 4-channel
    # any-touch conversion game: per-converter pre-purchase channel
    # bitmask → 16-row mask rollup; v(T) = converters with mask∩T≠∅
    # over all 16 coalitions; Shapley numerators ×4! are exact
    # integers and Σ_c φ_c = v(full) by construction.
    oracle=f"""
    WITH fp AS (
        SELECT user_id, MIN(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), masks AS (
        SELECT fp.user_id,
               {" + ".join(f"COALESCE(MAX(CASE WHEN e.event_type = '{ch}' THEN {bit} END), 0)" for ch, bit in _SHAP_CHANNELS)}
                   AS mask
        FROM fp LEFT JOIN events e
          ON e.user_id = fp.user_id AND e.ts < fp.first_purchase
         AND e.event_type <> 'purchase'
        GROUP BY 1
    ), mc AS (
        SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM masks GROUP BY 1
    ), v AS (
        SELECT t.T,
               COALESCE(SUM(CASE WHEN (mc.mask & t.T) <> 0
                                 THEN mc.cnt ELSE 0 END), 0) AS v
        FROM (SELECT CAST(range AS BIGINT) AS T FROM range(16)) t, mc
        GROUP BY 1
    ), ch AS (
        SELECT * FROM (VALUES
            {", ".join(f"('{ch}', CAST({bit} AS BIGINT))" for ch, bit in _SHAP_CHANNELS)}
        ) c(channel, bit)
    ), shap AS (
        SELECT ch.channel, ch.bit,
               SUM((CASE ((vt.T // 1) % 2) + ((vt.T // 2) % 2)
                        + ((vt.T // 4) % 2) + ((vt.T // 8) % 2)
                    WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
                    ELSE 6 END)
                   * (vc.v - vt.v)) AS shapley_x24
        FROM ch
        JOIN v vt ON (vt.T & ch.bit) = 0
        JOIN v vc ON vc.T = (vt.T | ch.bit)
        GROUP BY 1, 2
    )
    SELECT channel, bit,
           CAST(shapley_x24 AS BIGINT) AS shapley_x24,
           ROUND(CAST(shapley_x24 AS DOUBLE) / 24.0, 6) AS shapley,
           (SELECT CAST(v AS BIGINT) FROM v WHERE T = 15) AS converters_any,
           (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) FROM mc
            WHERE mask = 0) AS unattributed
    FROM shap ORDER BY channel
    """,
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value marketing attribution over the four
    non-conversion channels: each converter's pre-first-purchase
    channel set is a 4-bit mask, the coalition value v(T) counts
    converters reachable through T alone (any-touch), and each
    channel's Shapley value φ_c = Σ_T |T|!(3−|T|)!/4! · (v(T∪c)−v(T))
    is computed EXACTLY — the ×24-scaled numerators are integers, and
    efficiency (Σφ_c = v(all channels)) holds by construction, which
    the pytest asserts.  Unlike the heuristic last-touch / linear
    models in `events_attribution`, this is the game-theoretic
    allocation — tractable here because the channel set is small
    (2⁴ coalitions), which is exactly how production Shapley
    attribution is run.

    Scale notes: corpus-grain work is the purchase-time aggregate and
    ONE user-keyed conditional-max aggregate to the 16-row mask
    rollup; everything after (coalition grid, v sums, Shapley joins)
    is 16×16-row broadcast arithmetic (reviewed BNL/SINGLE — literal
    coalition dims, never event-grain)."""
    e = load_table(spark, sf_dir, "events")
    fp = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    pre = fp.join(
        e.where(F.col("event_type") != "purchase").select(
            F.col("user_id").alias("uid"), "ts", "event_type"
        ),
        (F.col("uid") == F.col("user_id"))
        & (F.col("ts") < F.col("first_purchase")),
        "left",
    )
    mask_expr = sum(
        F.coalesce(
            F.max(F.when(F.col("event_type") == ch, F.lit(bit))), F.lit(0)
        )
        for ch, bit in _SHAP_CHANNELS
    )
    masks = pre.groupBy("user_id").agg(mask_expr.alias("mask"))
    mc = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("cnt"))
    t = spark.range(16).select(F.col("id").cast("long").alias("T"))
    v = (
        F.broadcast(t)
        .join(F.broadcast(mc))
        .groupBy("T")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.expr("(mask & T) <> 0"), F.col("cnt")
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("v")
        )
    )
    ch = spark.createDataFrame(
        [(c, b) for c, b in _SHAP_CHANNELS], "channel string, bit long"
    )
    popcnt = F.expr(
        "(vt.T div 1) % 2 + (vt.T div 2) % 2"
        " + (vt.T div 4) % 2 + (vt.T div 8) % 2"
    )
    w = (
        F.when(popcnt == 0, 6)
        .when(popcnt == 1, 2)
        .when(popcnt == 2, 2)
        .otherwise(6)
    )
    shap = (
        F.broadcast(ch)
        .join(F.broadcast(v.alias("vt")), F.expr("(vt.T & bit) = 0"))
        .join(
            F.broadcast(v.alias("vc")), F.expr("vc.T = (vt.T | bit)")
        )
        .groupBy("channel", "bit")
        .agg(
            F.sum(w * (F.col("vc.v") - F.col("vt.v"))).alias("shapley_x24")
        )
    )
    conv = v.where(F.col("T") == 15).select(
        F.col("v").cast("long").alias("converters_any")
    )
    unattr = mc.where(F.col("mask") == 0).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("unattributed")
    )
    return (
        shap.join(F.broadcast(conv))
        .join(F.broadcast(unattr))
        .select(
            "channel",
            "bit",
            F.col("shapley_x24").cast("long").alias("shapley_x24"),
            F.round(F.col("shapley_x24").cast("double") / 24.0, 6).alias(
                "shapley"
            ),
            "converters_any",
            "unattributed",
        )
        .orderBy("channel")
    )
